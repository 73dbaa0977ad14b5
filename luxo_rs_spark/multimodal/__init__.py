from luxo_rs_spark.multimodal.media import (
    MEDIA_SCHEMA,
    decode_media,
    extract_features,
    sample_frames,
    synth_media_table,
)

__all__ = [
    "MEDIA_SCHEMA",
    "decode_media",
    "extract_features",
    "sample_frames",
    "synth_media_table",
]
