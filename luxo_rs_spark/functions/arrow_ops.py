"""Arrow-native batch processing via ``mapInArrow`` (SURVEY.md §2.2-J):
the zero-copy tier below pandas UDFs. Batches arrive as
``pyarrow.RecordBatch`` and are transformed with pyarrow.compute
kernels only — no Arrow->pandas->numpy conversion round-trip, no
object-dtype strings. For string-heavy per-row metrics (the common
LLM-corpus profiling shape) this skips the most expensive part of a
pandas UDF: materializing Python str objects.

Scale notes: mapInArrow is a pure map — no shuffle, runs inside the
scan stage's Python worker with Arrow IPC both ways; batch size is
bounded by spark.sql.execution.arrow.maxRecordsPerBatch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyarrow as pa
import pyarrow.compute as pc

from pyspark.sql import DataFrame

#: output schema of :func:`arrow_doc_stats`
DOC_STATS_SCHEMA = (
    "doc_id long, n_chars bigint, n_bytes bigint, n_words bigint"
)


def _doc_stats_batches(
    batches: Iterator[pa.RecordBatch],
) -> Iterator[pa.RecordBatch]:
    for batch in batches:
        text = batch.column("text")
        n_words = pc.list_value_length(
            pc.split_pattern(text, pattern=" ")
        )
        yield pa.RecordBatch.from_arrays(
            [
                batch.column("doc_id"),
                pc.cast(pc.utf8_length(text), pa.int64()),
                pc.cast(pc.binary_length(text), pa.int64()),
                pc.cast(n_words, pa.int64()),
            ],
            names=["doc_id", "n_chars", "n_bytes", "n_words"],
        )


def arrow_doc_stats(docs: DataFrame) -> DataFrame:
    """(doc_id, n_chars, n_bytes, n_words) computed entirely with
    pyarrow.compute kernels — codepoint length, UTF-8 byte length, and
    space-separated word count — without materializing Python strings."""
    return docs.select("doc_id", "text").mapInArrow(
        _doc_stats_batches, DOC_STATS_SCHEMA
    )
