"""Magic-byte container detection for BINARY media columns (round 9;
§2.2-K multimodal plumbing). The first operation a 100 TB multimodal
crawl runs on raw bytes — before any decode is dispatched — is a
file-type sniff over leading magic numbers. Pure Column algebra (hex of
the first bytes + a CASE chain, whole-stage-codegen friendly, no UDF),
so a petabyte of BLOBs classifies at scan speed and the expression is
replayable in ANSI SQL for the oracle.

Detected families mirror `multimodal/media._decode_payload`'s dispatch
(BMP, PNG, GIF, JPEG, TIFF II/MM, FLAC, RIFF-subtyped WAV/AVI/WEBP)
plus the archive sources' ZIP/GZIP and WARC; everything else is
'unknown' — the quarantine lane, never a guess.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def detect_container(col: Column) -> Column:
    """Container family of a binary column by magic bytes."""
    head4 = F.hex(F.substring(col, 1, 4))
    head8 = F.hex(F.substring(col, 1, 8))
    riff_sub = F.hex(F.substring(col, 9, 4))
    return (
        F.when(head8 == "89504E470D0A1A0A", F.lit("png"))
        .when(head4.startswith("424D"), F.lit("bmp"))
        .when(head4 == "47494638", F.lit("gif"))
        .when(head4.startswith("FFD8"), F.lit("jpeg"))
        .when(head4 == "664C6143", F.lit("flac"))
        .when(head4 == "49492A00", F.lit("tiff"))
        .when(head4 == "4D4D002A", F.lit("tiff"))
        .when(
            head4 == "52494646",
            F.when(riff_sub == "57415645", F.lit("wav"))
            .when(riff_sub == "41564920", F.lit("avi"))
            .when(riff_sub == "57454250", F.lit("webp"))
            .otherwise(F.lit("riff")),
        )
        .when(head4.startswith("504B0304"), F.lit("zip"))
        .when(head4.startswith("504B0506"), F.lit("zip"))
        .when(head4.startswith("1F8B"), F.lit("gzip"))
        .when(
            F.hex(F.substring(col, 1, 5)) == "574152432F", F.lit("warc")
        )
        .otherwise(F.lit("unknown"))
    )


#: the identical classification as ANSI SQL. DuckDB cannot substring a
#: BLOB, so the twin slices the HEX RENDERING instead (2 hex chars per
#: byte) — same decision table, byte for byte.
DETECT_CONTAINER_SQL = """
CASE
  WHEN substring(hex({c}), 1, 16) = '89504E470D0A1A0A' THEN 'png'
  WHEN substring(hex({c}), 1, 4) = '424D' THEN 'bmp'
  WHEN substring(hex({c}), 1, 8) = '47494638' THEN 'gif'
  WHEN substring(hex({c}), 1, 4) = 'FFD8' THEN 'jpeg'
  WHEN substring(hex({c}), 1, 8) = '664C6143' THEN 'flac'
  WHEN substring(hex({c}), 1, 8) IN ('49492A00', '4D4D002A') THEN 'tiff'
  WHEN substring(hex({c}), 1, 8) = '52494646' THEN
    CASE substring(hex({c}), 17, 8)
      WHEN '57415645' THEN 'wav'
      WHEN '41564920' THEN 'avi'
      WHEN '57454250' THEN 'webp'
      ELSE 'riff'
    END
  WHEN substring(hex({c}), 1, 8) IN ('504B0304', '504B0506') THEN 'zip'
  WHEN substring(hex({c}), 1, 4) = '1F8B' THEN 'gzip'
  WHEN substring(hex({c}), 1, 10) = '574152432F' THEN 'warc'
  ELSE 'unknown'
END"""
