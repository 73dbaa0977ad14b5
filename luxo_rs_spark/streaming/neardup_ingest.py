"""Streaming incremental near-dup ingest (SURVEY.md §2.2-K x §2.2-I):
continuous corpus ingestion that drops documents near-duplicating
ANYTHING already admitted — the production shape of MinHash-LSH dedup
when the corpus arrives as a stream instead of a batch.

Per micro-batch (foreachBatch):

1. MinHash signatures for the batch docs (the same 128-perm
   ``operators/dedup.minhash_signatures`` machinery as batch q32).
2. Candidates = batch band buckets equi-joined against the ACCUMULATED
   band store plus the within-batch band self-join — never all-pairs.
3. Verify candidates on SIGNATURE agreement (fraction of equal minhash
   components estimates jaccard, Broder 1997): a doc is dropped when
   its estimated similarity to any earlier-admitted doc — store docs,
   or batch docs with a smaller id — reaches the threshold.
4. Survivors' rows, signatures, and band buckets land in the store
   under a per-batch ``ingest_batch=N`` subdirectory written with
   overwrite — a foreachBatch REPLAY of the same batch rewrites the
   same paths (and candidate reads exclude the replaying batch's own
   attempt), so at-least-once delivery cannot duplicate or self-drop
   docs. Dropped docs never enter the store.

The store keeps 128 longs + 32 bucket rows per admitted doc — bounded
state that never re-reads raw text, which is what makes the pattern
viable at 100 TB of history: the per-batch work is |batch| x (band
collisions), and the band join against history is an equi-join on
(band, bucket) a real deployment partitions the store by.

Determinism: the drop rule is pure (no RNG, seeded permutations), so
any arrival split of the same ordered corpus admits the same set —
pinned in tests against a pure-numpy replay of the same rule.
"""

from __future__ import annotations

import posixpath

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from luxo_rs_spark.operators.dedup import (
    NUM_PERM,
    lsh_band_array,
    minhash_signatures,
)

_SIG_COLS = [f"m{i}" for i in range(NUM_PERM)]


def band_buckets(signatures: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, band, bucket): one row per LSH band — the equi-join key
    space for candidate generation. Uses the SAME band-array builder as
    the batch ``lsh_candidate_pairs`` (operators/dedup.lsh_band_array),
    so batch and incremental hashing cannot drift apart."""
    return signatures.select(
        F.col(id_col), F.posexplode(lsh_band_array()).alias("band", "bucket")
    )


def _sig_agreement() -> F.Column:
    """Estimated jaccard between two aliased signature rows `a` and
    `b`: fraction of agreeing minhash components."""
    eq = sum(
        F.when(F.col(f"a.{c}") == F.col(f"b.{c}"), 1).otherwise(0)
        for c in _SIG_COLS
    )
    return eq / F.lit(float(NUM_PERM))


class NearDupIngest:
    """foreachBatch handler holding the admitted-doc store under
    ``store_dir`` (parquet: docs/, sigs/, bands/)."""

    def __init__(
        self,
        store_dir: str,
        threshold: float = 0.7,
        id_col: str = "doc_id",
        text_col: str = "text",
        n: int = 3,
    ) -> None:
        self.store_dir = store_dir
        self.threshold = threshold
        self.id_col = id_col
        self.text_col = text_col
        self.n = n

    def _path(self, part: str) -> str:
        return posixpath.join(self.store_dir, part)

    @staticmethod
    def _list_batch_dirs(spark: SparkSession, path: str) -> list[str]:
        """List ``ingest_batch=N`` subdirectories of ``path`` through
        the Hadoop FileSystem API, so the store can live on ANY
        Spark-reachable filesystem (file://, hdfs://, s3a://, ...) —
        a driver-local os.listdir would silently see nothing on a
        remote store and skip history dedup entirely."""
        jvm = spark._jvm
        jsc = spark.sparkContext._jsc
        hconf = jsc.hadoopConfiguration()
        jpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = jpath.getFileSystem(hconf)
        if not fs.exists(jpath):
            return []
        out = []
        for st in fs.listStatus(jpath):
            name = st.getPath().getName()
            if st.isDirectory() and name.startswith("ingest_batch="):
                out.append(st.getPath().toString())
        return out

    def _read_store(
        self,
        spark: SparkSession,
        part: str,
        before_batch: int | None = None,
    ) -> DataFrame | None:
        """Store reads for candidate generation pass ``before_batch``
        so a foreachBatch REPLAY of batch N never sees batch N's own
        partially-written attempt (each batch writes into its own
        ``ingest_batch=N`` subdirectory with overwrite — the idempotent
        at-least-once layout, same convention as ``upsert_sink``)."""
        path = self._path(part)
        subdirs = self._list_batch_dirs(spark, path)
        if before_batch is not None:
            subdirs = [
                d
                for d in subdirs
                if int(d.rsplit("=", 1)[1]) < before_batch
            ]
        if not subdirs:
            return None
        return spark.read.option("basePath", path).parquet(
            *subdirs
        ).drop("ingest_batch")

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        idc = self.id_col
        batch = batch.localCheckpoint(eager=True)
        sigs = minhash_signatures(
            batch, idc, self.text_col, self.n
        ).localCheckpoint(eager=True)
        bands = band_buckets(sigs, idc)

        # phase 1 — against HISTORY: a doc matching any admitted store
        # doc is dropped outright (store docs are all admitted)
        store_bands = self._read_store(spark, "bands", before_batch=batch_id)
        dropped_ids = None
        if store_bands is not None:
            store_sigs = self._read_store(spark, "sigs", before_batch=batch_id)
            cand = (
                bands.alias("nb")
                .join(store_bands.alias("ob"), ["band", "bucket"])
                .select(
                    F.col(f"nb.{idc}").alias("new_id"),
                    F.col(f"ob.{idc}").alias("old_id"),
                )
                .distinct()
            )
            dropped_ids = (
                cand.join(sigs.alias("a"), cand.new_id == F.col(f"a.{idc}"))
                .join(
                    store_sigs.alias("b"),
                    cand.old_id == F.col(f"b.{idc}"),
                )
                .filter(_sig_agreement() >= self.threshold)
                .select(F.col("new_id").alias(idc))
                .distinct()
            )

        undecided = sigs.select(idc)
        if dropped_ids is not None:
            undecided = undecided.join(dropped_ids, idc, "left_anti")

        # phase 2 — WITHIN the batch: sequential-greedy admission
        # (a doc is dropped only by an ADMITTED earlier doc), computed
        # distributed as the iterative lexicographic greedy MIS: each
        # round admits the docs with no surviving smaller-id match,
        # then removes the docs those admissions kill. Progress per
        # round is guaranteed (the smallest undecided id never has a
        # smaller partner), so the loop terminates in <= chain-depth
        # rounds with EVERY doc decided. This makes admission INVARIANT
        # to how the corpus is split into micro-batches — pinned in
        # tests.
        pairs = (
            bands.alias("x")
            .join(bands.alias("y"), ["band", "bucket"])
            .filter(F.col(f"y.{idc}") < F.col(f"x.{idc}"))
            .select(
                F.col(f"x.{idc}").alias("new_id"),
                F.col(f"y.{idc}").alias("old_id"),
            )
            .distinct()
        )
        pairs = (
            pairs.join(sigs.alias("a"), pairs.new_id == F.col(f"a.{idc}"))
            .join(sigs.alias("b"), pairs.old_id == F.col(f"b.{idc}"))
            .filter(_sig_agreement() >= self.threshold)
            .select("new_id", "old_id")
            .join(
                undecided.withColumnRenamed(idc, "new_id"), "new_id"
            )
            .join(
                undecided.withColumnRenamed(idc, "old_id"), "old_id"
            )
            .localCheckpoint(eager=True)
        )
        admitted = None
        undecided = undecided.localCheckpoint(eager=True)
        while True:
            blocked = pairs.select(F.col("new_id").alias(idc)).distinct()
            minimal = undecided.join(blocked, idc, "left_anti")
            admitted = (
                minimal
                if admitted is None
                else admitted.unionByName(minimal)
            ).localCheckpoint(eager=True)
            killed = (
                pairs.join(
                    minimal.withColumnRenamed(idc, "old_id"), "old_id"
                )
                .select(F.col("new_id").alias(idc))
                .distinct()
            )
            undecided = (
                undecided.join(minimal, idc, "left_anti")
                .join(killed, idc, "left_anti")
                .localCheckpoint(eager=True)
            )
            if undecided.isEmpty():
                break
            pairs = (
                pairs.join(
                    undecided.withColumnRenamed(idc, "new_id"), "new_id"
                )
                .join(
                    undecided.withColumnRenamed(idc, "old_id"), "old_id"
                )
                .localCheckpoint(eager=True)
            )
        # docs too short to shingle have no signature and therefore no
        # similarity evidence — they are ADMITTED (they carry no bands
        # into the store either; an exact content-hash path would be
        # the right extra guard for a production ingest)
        no_sig = batch.join(sigs.select(idc), idc, "left_anti").select(idc)
        survivors = batch.join(
            admitted.unionByName(no_sig), idc, "left_semi"
        )
        surv_sigs = sigs.join(admitted, idc, "left_semi")

        surv_bands = bands.join(admitted, idc, "left_semi")
        for frame, part in (
            (survivors, "docs"),
            (surv_sigs, "sigs"),
            (surv_bands, "bands"),
        ):
            frame.write.mode("overwrite").parquet(
                posixpath.join(self._path(part), f"ingest_batch={batch_id}")
            )

    def admitted(self, spark: SparkSession) -> DataFrame:
        """The admitted corpus so far."""
        out = self._read_store(spark, "docs")
        if out is None:
            raise ValueError(f"no admitted docs yet under {self.store_dir}")
        return out


def neardup_ingest_sink(
    docs_stream: DataFrame,
    store_dir: str,
    checkpoint: str,
    threshold: float = 0.7,
    **kwargs,
):
    """Wire a streaming docs source into the incremental near-dup
    store; returns the started StreamingQuery."""
    ingest = NearDupIngest(store_dir, threshold, **kwargs)
    return (
        docs_stream.writeStream.foreachBatch(ingest.process_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
