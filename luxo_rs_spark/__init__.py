"""luxo_rs_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities the
reference (`houthacker/luxo-rs`, pre-alpha) declares: "a database engine
that sheds light on any query" (reference src/main.rs:3), re-expressed
Spark-first. The logical plan is always declared through the DataFrame /
SQL API so Catalyst + Tungsten pick the physical strategy; Python UDFs
exist only where built-ins genuinely cannot express the semantics
(the reference-exact fnv1a64 hash, reference src/algo/fnv1a.rs).

Layout
------
- engine        : SparkSession bootstrap + table registry + query logging
                  (the reference main.rs:12-22 "tracing" equivalent)
- sources       : parquet/csv/json readers with schema normalization, sinks
- functions     : fnv1a64 (bit-exact vs reference golden vectors), text
                  analysis, vector math
- operators     : as-of join, dedup (exact/minhash/simhash/ngram),
                  similarity search, top-k
- plans         : the declared query contract (SURVEY.md §2.3) + DuckDB
                  oracle SQL
- streaming     : Structured Streaming windows / watermark / stateful ops
- multimodal    : opaque binary media columns + mapInPandas plumbing
"""

from luxo_rs_spark.engine import Engine

__version__ = "0.1.0"

__all__ = ["Engine", "__version__"]
