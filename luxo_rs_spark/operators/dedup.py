"""Deduplication operators (SURVEY.md §2.2-K): exact, n-gram Jaccard,
MinHash-LSH, SimHash.

Algorithms follow the published formulations: MinHash resemblance
sketches (Broder, "On the resemblance and containment of documents",
1997) with banded LSH (Indyk & Motwani 1998; banding analysis as in
Rajaraman & Ullman, "Mining of Massive Datasets" ch. 3), and SimHash
random-projection fingerprints (Charikar, "Similarity estimation
techniques from rounding algorithms", STOC 2002) with the pigeonhole
Hamming-band join (Manku, Jain & Sarma, "Detecting near-duplicates for
web crawling", WWW 2007).

All four tiers of the training-data dedup ladder, Spark-first:

- **exact**: content-hash groupBy using the reference-exact ``fnv1a64``
  (hashing text is FNV1a's classic job, reference src/algo.rs:3).
- **n-gram Jaccard**: the exact near-dup ground truth — shingle-explode
  + equi-join on shingle + per-pair intersection counts. This IS the
  scalable formulation (one shuffle on shingle, one on pair); what makes
  it expensive at 100 TB is the candidate-pair blowup on hot shingles,
  which is exactly what MinHash-LSH fixes.
- **MinHash-LSH**: 128 seeded permutations (seeded ``create_init``
  construction, reference src/algo/fnv1a.rs:26-28) -> 32 bands x 4 rows
  -> band-bucket equi-join for candidates -> exact Jaccard verify on
  candidates only. With s=0.8, P(miss) = (1-0.8^4)^32 ~ 5e-8, so the
  verified output equals the exact operator's with near-certainty while
  doing ~|candidates| << N^2 work.
- **SimHash**: 64-bit sign-aggregated fingerprint; near-dup pairs by
  Hamming distance <= k via the Manku block-permutation band join
  (6 blocks, keys = every 3-block combination, ~32 bits each: any pair
  with Hamming <= 3 leaves >= 3 blocks intact, so some enumerated combo
  matches exactly — and random collisions need a 32-bit agreement,
  which keeps the candidate stage sub-quadratic far past the 2^16
  birthday wall the old 16-bit chunks hit; BENCH_SCALING_R7.json).

Scale notes: every stage is joins/aggs on (doc_id | shingle | band)
keys — AQE-skew-joinable shuffles, no driver-side state. The only
Python is the vectorized hash UDFs (Arrow batches, numpy uint64).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from luxo_rs_spark.functions.fnv1a import (
    FNV_OFFSET_BASIS,
    FNV_PRIME,
    fnv1a64_col,
    fnv1a64_int_py,
)
from luxo_rs_spark.functions.spread import spread
from luxo_rs_spark.functions.text import shingles

_U64_PRIME = np.uint64(FNV_PRIME)
_MASK64 = 0xFFFFFFFFFFFFFFFF

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup_stats(
    df: DataFrame, text_col: str = "text", by: str | None = None
) -> DataFrame:
    """Per-group document counts vs distinct-content counts (content
    identity = fnv1a64 of the text)."""
    h = fnv1a64_col(text_col).alias("__h")
    keys = [by] if by else []
    return (
        _spread(df)
        .select(*keys, h)
        .groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("__h").alias("n_unique"),
        )
    )


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep one deterministic survivor (min id) per distinct content."""
    h = fnv1a64_col(text_col).alias("__h")
    survivors = (
        _spread(df, id_col)
        .select(F.col(id_col), h)
        .groupBy("__h")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return df.join(survivors, id_col, "left_semi")


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact near-dup ground truth)
# ---------------------------------------------------------------------------


def _spread(df: DataFrame, *keys) -> DataFrame:
    """Guarded keyed spread — see functions/spread.py. The documents
    fixture arrives as ONE parquet file -> one partition; without this
    every downstream transform runs single-task. At 100 TB the scan has
    thousands of splits and the guard makes this a literal no-op (round
    11: previously an unconditional repartition, which at scale would
    have been a full network pass over the text payloads)."""
    return spread(df, *keys)


def shingle_table(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """(id, shingle) rows, distinct shingles per doc.

    The words array is materialized in its own projection BEFORE the
    shingle transform references it: inlining ``split()`` into the
    transform lambda would re-split the text once per element access
    (measured ~10x slower). Catalyst's CollapseProject keeps the barrier
    because split is not duplication-cheap.
    """
    from luxo_rs_spark.functions.text import words

    w = F.col("__w")
    # slice+array_join is ~14x faster than per-position element_at
    # inside the transform lambda (measured at sf0.1)
    idx = F.sequence(F.lit(1), F.size(w) - F.lit(n - 1))
    gram = F.transform(idx, lambda i: F.array_join(F.slice(w, i, n), " "))
    sh = F.when(F.size(w) >= n, F.array_distinct(gram)).otherwise(
        F.array().cast("array<string>")
    )
    return (
        _spread(df, id_col)
        .select(F.col(id_col).alias("doc_id"), words(text_col).alias("__w"))
        .select("doc_id", F.explode(sh).alias("shingle"))
    )


def jaccard_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    candidates: DataFrame | None = None,
    shingles_df: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram-Jaccard near-dup pairs (da < db, jac >= threshold).

    When `candidates` (da, db) is given, the pair space is restricted to
    it — the MinHash-LSH path; otherwise all pairs sharing >= 1 shingle
    are scored (exact path).
    Returns (da, db, jac DOUBLE) — jac is exact-rational int division,
    bit-identical across engines.
    """
    sh = shingles_df if shingles_df is not None else shingle_table(
        df, id_col, text_col, n
    ).cache()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    if candidates is not None:
        # candidate-DRIVEN intersection: expand each (da, db) pair by
        # da's shingles, then probe db's shingle set — work is
        # O(|candidates| * shingles/doc), NOT the all-pairs
        # shared-shingle blowup. This is the whole point of LSH at
        # scale: the exact verify must not recompute what LSH pruned.
        a = sh.select(F.col("doc_id").alias("da"), "shingle")
        b = sh.select(F.col("doc_id").alias("db"), "shingle")
        pairs = candidates.join(a, "da").join(b, ["db", "shingle"])
    else:
        a = sh.select(F.col("doc_id").alias("da"), "shingle")
        b = sh.select(F.col("doc_id").alias("db"), "shingle")
        pairs = a.join(b, ["shingle"]).filter(F.col("da") < F.col("db"))
    inter = pairs.groupBy("da", "db").agg(F.count(F.lit(1)).alias("n_inter"))
    na = sizes.select(F.col("doc_id").alias("da"), F.col("n_sh").alias("n_a"))
    nb = sizes.select(F.col("doc_id").alias("db"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(na, "da")
        .join(nb, "db")
        .withColumn(
            "jac",
            F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
        )
        .filter(F.col("jac") >= threshold)
        .select("da", "db", "jac")
    )


# ---------------------------------------------------------------------------
# MinHash-LSH
# ---------------------------------------------------------------------------

NUM_PERM = 128
LSH_BANDS = 32
LSH_ROWS = NUM_PERM // LSH_BANDS  # 4

#: permutation seeds: seed_i = fnv1a64(i as i64) — the seeded-hasher
#: construction the reference exposes via create_init (fnv1a.rs:26-28)
_PERM_SEEDS = np.array(
    [fnv1a64_int_py(i, 8) for i in range(NUM_PERM)], dtype=np.uint64
)


from pyspark.sql.types import ArrayType, LongType


def _perm_partial_mins(batches):
    """mapInPandas hook: per Arrow batch, hash each shingle (base
    FNV-1a over the utf-8 bytes) and compute each doc's per-permutation
    minimum in numpy (a map-side combine in Python). For each base
    shingle hash h, the permuted family is the seeded FNV-1a re-hash of
    h's LE bytes: h_i = fnv1a64(le_bytes(h), seed=seed_i). The base
    hash is fused here rather than a separate pandas-UDF projection —
    one Python stage and one Arrow round-trip instead of two.
    Emits one partial row per (doc x batch); with the doc_id
    repartition upstream that is ~one row per doc, which the JVM then
    min-aggregates."""
    from luxo_rs_spark.functions.fnv1a import _hash_bytes_batch, _U64_OFFSET

    for pdf in batches:
        doc = pdf["doc_id"].to_numpy(dtype=np.int64)
        vals = [s.encode("utf-8") for s in pdf["shingle"]]
        states = np.full(len(vals), _U64_OFFSET, dtype=np.uint64)
        v = _hash_bytes_batch(states, vals, np.ones(len(vals), dtype=bool))
        order = np.argsort(doc, kind="stable")
        doc, v = doc[order], v[order]
        # permute UNIQUE base hashes only: near-dup corpora repeat
        # shingles heavily (that's the point), so the (rows x 128)
        # xor-mul fold collapses to (uniques x 128) + one gather —
        # kernel measures 1.2-6x faster depending on repetition (never
        # slower; the unique sort is cheap next to the fold)
        uniq, inv = np.unique(v, return_inverse=True)
        states = np.broadcast_to(_PERM_SEEDS, (len(uniq), NUM_PERM)).copy()
        for k in range(8):
            byte = ((uniq >> np.uint64(8 * k)) & np.uint64(0xFF))[:, None]
            states = (states ^ byte) * _U64_PRIME
        signed = states.view(np.int64)[inv]
        starts = np.flatnonzero(np.r_[True, doc[1:] != doc[:-1]])
        mins = np.minimum.reduceat(signed, starts, axis=0)
        out = pd.DataFrame(mins, columns=[f"m{i}" for i in range(NUM_PERM)])
        out.insert(0, "doc_id", doc[starts])
        yield out


_SIG_SCHEMA = ", ".join(
    ["doc_id long"] + [f"m{i} long" for i in range(NUM_PERM)]
)


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    shingles_df: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, m0..m127): per-doc minimum of each permuted shingle hash.

    Two-phase min: numpy partial mins per Arrow batch (mapInPandas),
    then 128 JVM MIN aggregates — the same partial/final split
    HashAggregateExec uses, with the partial phase vectorized in numpy
    because that's where the permuted hashes are materialized.
    """
    sh = shingles_df if shingles_df is not None else shingle_table(
        df, id_col, text_col, n
    )
    # Hash-partition by doc_id BEFORE the Python stage: each doc's
    # shingles land in one partition, so the partial-min emits ~one row
    # per doc (vs one per doc x partition under round-robin input — a
    # ~P-fold blowup of the Arrow->JVM transfer and shuffle, measured
    # 165 MB -> 5 MB at sf0.1/32 cores). The final JVM MIN agg stays for
    # the docs whose shingles straddle an Arrow batch boundary.
    # This shuffle is algorithmic (colocate each doc's shingles), so it
    # fires at every scale — but it must never force a wide input DOWN
    # to defaultParallelism, so the width is max(default, current)
    # (round-11 scale-safety audit).
    par = max(
        df.sparkSession.sparkContext.defaultParallelism,
        sh.rdd.getNumPartitions(),
    )
    base = sh.repartition(par, "doc_id")
    partial = base.mapInPandas(_perm_partial_mins, _SIG_SCHEMA)
    mins = [F.min(f"m{i}").alias(f"m{i}") for i in range(NUM_PERM)]
    return partial.groupBy("doc_id").agg(*mins)


def lsh_band_array() -> "F.Column":
    """The 32-element band-bucket hash array over signature columns
    m0..m127 — THE single definition of LSH banding, shared by the
    batch candidate join below and the streaming ingest store
    (streaming/neardup_ingest.py), so batch and incremental candidate
    generation cannot drift apart."""
    return F.array(
        *[
            F.xxhash64(
                F.lit(b), *[F.col(f"m{b * LSH_ROWS + r}") for r in range(LSH_ROWS)]
            )
            for b in range(LSH_BANDS)
        ]
    )


def lsh_candidate_pairs(signatures: DataFrame) -> DataFrame:
    """Candidate (da, db) pairs sharing at least one LSH band bucket.

    Band bucket = xxhash64 over the band's 4 signature slots (engine-
    internal hashing may use Spark built-ins per SURVEY.md §2.1 R4 —
    fnv1a is only required where the reference contract pins it).
    """
    bands = lsh_band_array()
    exploded = signatures.select(
        "doc_id", F.posexplode(bands).alias("band", "bucket")
    )
    a = exploded.select(F.col("doc_id").alias("da"), "band", "bucket")
    b = exploded.select(F.col("doc_id").alias("db"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("da") < F.col("db"))
        .select("da", "db")
        .distinct()
    )


def minhash_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """LSH candidates -> exact-Jaccard verification (same output contract
    as the exact operator; recall ~ 1 - (1-t^4)^32).

    The shingle table is computed ONCE and cached — the signature stage
    and the verification stage both read it (at cluster scale this is a
    persisted intermediate, not a recompute of the text scan)."""
    sh = shingle_table(df, id_col, text_col, n).cache()
    # the LSH band join reads the signature table through TWO plan
    # branches (pair sides a and b); without a materialization barrier
    # each branch re-runs the whole 128-permutation signature pipeline
    # (measured: the perm-mins stage appears twice with identical
    # shuffle bytes and dominates q32's profile — ~60% of executor
    # time). The lazy checkpoint computes signatures once and serves
    # both branches from blocks (~1 KB/doc — the q270 materialization
    # pattern; blocks are ContextCleaner-collected on GC).
    sig = minhash_signatures(
        df, id_col, text_col, n, shingles_df=sh
    ).cache()
    cands = lsh_candidate_pairs(sig)
    return jaccard_pairs(
        df, threshold, id_col, text_col, n, candidates=cands, shingles_df=sh
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 64


def simhash(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """(doc_id, simhash BIGINT): sign-aggregate of shingle hash bits.

    Bit votes are 64 JVM-side conditional-SUM aggregates (one per bit)
    assembled back into a BIGINT — all whole-stage codegen with map-side
    partial aggregation; the only Python is the base shingle hash.
    (An applyInPandas formulation pays one Arrow group per doc — measured
    ~6x slower at 5k docs.)
    """
    sh = shingle_table(df, id_col, text_col, n)
    base = sh.select("doc_id", fnv1a64_col("shingle").alias("h"))
    bit = lambda i: F.shiftrightunsigned("h", i).bitwiseAND(F.lit(1))
    votes = base.groupBy("doc_id").agg(
        *[
            F.sum(F.when(bit(i) == 1, 1).otherwise(-1)).alias(f"v{i}")
            for i in range(SIMHASH_BITS)
        ]
    )
    assembled = None
    for i in range(SIMHASH_BITS):
        # bit 63 of a signed long contributes -(2^63) (two's complement)
        weight = F.lit(1 << i).cast("long") if i < 63 else F.lit(-(1 << 63)).cast("long")
        term = F.when(F.col(f"v{i}") > 0, weight).otherwise(F.lit(0).cast("long"))
        assembled = term if assembled is None else assembled + term
    return votes.select("doc_id", assembled.alias("simhash"))


def simhash_neardup_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Pairs with Hamming(simhash) <= max_hamming via the Manku et al.
    (WWW 2007, "Detecting Near-Duplicates for Web Crawling") block-
    permutation band join. Returns (da, db, hamming BIGINT) — the SAME
    relation as an all-pairs scan (exact recall), so the q33/q446
    oracles never depend on the banding.

    Round-7 scaling fix: the previous 4x16-bit single-chunk join is
    birthday-QUADRATIC once N >> 2^16 (measured candidates_alpha=1.91
    in BENCH_SCALING_R7.json — 16-bit keys only have 65k buckets).
    Manku's scheme splits the 64-bit signature into 6 blocks
    (11/11/11/11/10/10 bits) and joins on every C(6,3)=20 combination
    of THREE blocks concatenated into one ~32-bit key: hamming <= 3
    touches at most 3 blocks, so at least one enumerated 3-block combo
    is intact on both sides (pigeonhole => exact recall), while random
    collisions now need a 32-bit agreement — candidate mass drops from
    ~N^2/2^16 to ~20*N^2/2^32. Each side emits 20 rows/doc; keys are
    (combo_id, packed key), the same equi-join shape as before."""
    blocks = [(0, 11), (11, 11), (22, 11), (33, 11), (44, 10), (54, 10)]
    # pigeonhole: d errors touch <= d blocks; we key on 3-block combos,
    # so exact recall needs >= 3 intact blocks, i.e. d <= 6 - 3
    if max_hamming > len(blocks) - 3:
        raise ValueError("max_hamming must be <= 3 for 6-block/3-combo keys")
    from itertools import combinations

    sig = simhash(df, id_col, text_col, n)

    def block(c: int) -> F.Column:
        ofs, width = blocks[c]
        return F.shiftrightunsigned("simhash", ofs).bitwiseAND(
            F.lit((1 << width) - 1)
        )

    keys = []
    for i, j, k in combinations(range(len(blocks)), 3):
        keys.append(
            (block(i) * F.lit(1 << 22))
            + (block(j) * F.lit(1 << 11))
            + block(k)
        )
    exploded = sig.select(
        "doc_id",
        "simhash",
        F.posexplode(F.array(*keys)).alias("combo", "key"),
    )
    a = exploded.select(
        F.col("doc_id").alias("da"), F.col("simhash").alias("sa"),
        "combo", "key",
    )
    b = exploded.select(
        F.col("doc_id").alias("db"), F.col("simhash").alias("sb"),
        "combo", "key",
    )
    return (
        a.join(b, ["combo", "key"])
        .filter(F.col("da") < F.col("db"))
        .select(
            "da",
            "db",
            F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
        .select("da", "db", F.col("hamming").cast("bigint").alias("hamming"))
    )


# ---------------------------------------------------------------------------
# near-dup clustering (connected components) + survivor selection
# ---------------------------------------------------------------------------


def ppjoin_candidates(sh: DataFrame, t: float) -> DataFrame:
    """PPJoin candidate stage over a hashed shingle table ``sh``
    (doc_id, sid) — the prefix filter + length filter of the exact
    set-similarity join (q270), extracted so the scaling harness
    (tools/scale_bench.py) can measure candidate growth directly.

    Returns (da, db, sza, szb): pairs sharing at least one
    ascending-global-frequency prefix element, da < db, already
    length-filtered (jaccard >= t forces t*max <= min). The exact
    intersection verify over these candidates is what q270 adds on
    top.
    """
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    dfreq = sh.groupBy("sid").agg(F.count(F.lit(1)).alias("df"))
    pos_w = Window.partitionBy("doc_id").orderBy("df", "sid")
    ranked = (
        sh.join(dfreq, "sid")
        .withColumn("pos", F.row_number().over(pos_w))
        .join(F.broadcast(sizes), "doc_id")
    )
    prefix = ranked.filter(
        F.col("pos") <= F.col("sz") - F.ceil(F.lit(t) * F.col("sz")) + 1
    ).select("doc_id", "sid")
    cand = (
        prefix.alias("a")
        .join(
            prefix.alias("b"),
            (F.col("a.sid") == F.col("b.sid"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db")
        )
        .distinct()
    )
    szs = sizes.select("doc_id", "sz")
    return (
        cand.join(
            F.broadcast(
                szs.select(F.col("doc_id").alias("da"), F.col("sz").alias("sza"))
            ),
            "da",
        )
        .join(
            F.broadcast(
                szs.select(F.col("doc_id").alias("db"), F.col("sz").alias("szb"))
            ),
            "db",
        )
        .filter(
            F.least("sza", "szb") >= F.lit(t) * F.greatest("sza", "szb")
        )
    )


def neardup_clusters(
    df: DataFrame,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    pairs: DataFrame | None = None,
    max_iters: int = 20,
    algorithm: str = "label_prop",
) -> DataFrame:
    """(doc_id, cluster_id): connected components of the near-dup pair
    graph; cluster_id = min doc_id in the component, singletons are
    their own cluster. This is the step that turns PAIRS into the
    actual dedup decision (keep one representative per component).

    Two distributed fixpoints, same output:

    - ``algorithm="label_prop"`` (default): iterative min-label
      propagation — each round every node takes the min of its own and
      its neighbors' labels (one equi-join + one agg per round),
      terminating when no label changes. Rounds needed = graph
      DIAMETER; near-dup components are tiny cliques (diameter 1-2),
      so this converges in 2-3 rounds and each round is two broadcast
      map-side joins.
    - ``algorithm="star"``: alternating large-star/small-star
      (Kiveris et al., "Connected Components in MapReduce and Beyond",
      SOCC 2014) — O(log n) rounds on ANY shape, including adversarial
      long chains where label propagation needs thousands of rounds.
      Use for graphs whose diameter is unknown.
    """
    if pairs is None:
        pairs = minhash_neardup_pairs(df, threshold, id_col, text_col, n)
    nodes = _spread(df, id_col).select(F.col(id_col).alias("node"))
    if algorithm == "star":
        labels = _cc_star(pairs.select(F.col("da").alias("a"), F.col("db").alias("b")), nodes)
        return labels.select(
            F.col("node").alias(id_col), F.col("label").alias("cluster_id")
        )
    if algorithm != "label_prop":
        raise ValueError(f"unknown algorithm: {algorithm!r} (label_prop|star)")
    # symmetrize in ONE pass via explode — a unionByName of two selects
    # over the (uncached) pair pipeline would execute the whole MinHash
    # DAG twice inside a single job
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col("da").alias("a"), F.col("db").alias("b")),
                    F.struct(F.col("db").alias("a"), F.col("da").alias("b")),
                )
            ).alias("e")
        )
        .select("e.a", "e.b")
        .cache()
    )
    labels = nodes.select("node", F.col("node").alias("label")).cache()
    for _ in range(max_iters):
        # the edge list and per-node neighbor minima are tiny relative
        # to the corpus (|near-dup pairs| << |docs|) — broadcast them so
        # each round is two map-side joins over the cached labels, no
        # label shuffle
        nbr_min = (
            F.broadcast(edges).join(labels, edges.b == labels.node)
            .groupBy("a")
            .agg(F.min("label").alias("nbr_min"))
        )
        # carry the incoming label alongside the update so convergence
        # is read out of the SAME action that fills the cache: the
        # conditional-sum agg below scans every partition of new_labels
        # (populating the cache blocks) and returns the changed count —
        # exactly ONE Spark job per round in the UI. A LongAccumulator
        # bumped in the label map was considered (round-2 verdict) and
        # rejected on correctness grounds: accumulator updates from
        # non-action stages double-count under task retry/speculation,
        # which can report "changed > 0" forever on a flaky executor,
        # and bumping from Python task code would push the label table
        # through an Arrow round-trip each round. The JVM conditional
        # agg is retry-exact and stays in whole-stage codegen.
        new_labels = (
            labels.join(F.broadcast(nbr_min), labels.node == nbr_min.a, "left")
            .select(
                "node",
                F.col("label").alias("__old"),
                F.least(
                    F.col("label"), F.coalesce("nbr_min", F.col("label"))
                ).alias("label"),
            )
            .cache()
        )
        changed = new_labels.agg(
            F.sum(
                F.when(F.col("label") != F.col("__old"), 1).otherwise(0)
            ).alias("n")
        ).head()["n"]
        labels.unpersist()
        labels = new_labels.select("node", "label")
        if changed == 0:
            break
    edges.unpersist()
    return labels.select(
        F.col("node").alias(id_col), F.col("label").alias("cluster_id")
    )


def _cc_star(pairs: DataFrame, nodes: DataFrame, max_rounds: int = 40) -> DataFrame:
    """Connected components by alternating large-star/small-star
    (Kiveris et al., SOCC 2014). Returns (node, label) with label =
    min node id of the component.

    Each round is two grouped self-joins over the current edge set:

    - LARGE-STAR: per node u, m = min(N(u) + {u}); every neighbor
      v > u re-attaches to m. Shrinks tall chains geometrically.
    - SMALL-STAR: per node u over its SMALLER neighbors (edges kept as
      (hi, lo)), all of them plus u attach to the minimum. Flattens
      partial stars.

    Convergence (provable O(log n) rounds) is detected by an edge-set
    fingerprint — count + sum of xxhash64(a, b) — computed in the same
    action that materializes the round's edges, so each round costs
    exactly one job. At 100 TB the edge set is |near-dup pairs|-sized
    (orders of magnitude under the corpus), every join is keyed, and no
    stage depends on graph diameter.
    """
    # each round references the previous edge set several times (the
    # symmetric union + two star joins), so lineage would grow
    # EXPONENTIALLY across rounds; localCheckpoint truncates the plan
    # every round (materialized block storage, O(|edges|)). A durable
    # HDFS checkpoint would be the production choice for fault
    # tolerance; block-local is right for an in-session fixpoint.
    edges = (
        pairs.filter(F.col("a") != F.col("b"))
        .select(
            F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    last_fp = None
    for _ in range(max_rounds):
        # large-star over the symmetric view: m(u) = min(N(u) u {u})
        sym = edges.select("u", "v").unionByName(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        large = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
        )
        # small-star on (hi, lo) orientation: attach u and all smaller
        # neighbors to the neighborhood min
        e2 = (
            large.filter(F.col("a") != F.col("b"))
            .select(
                F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
            )
            .distinct()
        )
        smins = e2.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            e2.join(smins, "u")
            .select(
                F.explode(
                    F.array(
                        F.struct(F.col("v").alias("a"), F.col("m").alias("b")),
                        F.struct(F.col("u").alias("a"), F.col("m").alias("b")),
                    )
                ).alias("e")
            )
            .select("e.a", "e.b")
            .filter(F.col("a") != F.col("b"))
            .select(
                F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
        # fingerprint over the just-materialized checkpoint blocks
        fp = small.agg(
            F.count(F.lit(1)).alias("n"),
            # decimal sum: long would overflow under ANSI mode
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("chk"),
        ).head()
        edges = small
        if (fp.n, fp.chk) == last_fp:
            break
        last_fp = (fp.n, fp.chk)
    # at the fixpoint every edge is (member, component_min)
    labels = edges.groupBy(F.col("u").alias("node")).agg(
        F.min("v").alias("label")
    )
    return (
        nodes.join(labels, "node", "left")
        .select("node", F.coalesce("label", F.col("node")).alias("label"))
    )


def neardup_survivors(
    df: DataFrame,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Rows of `df` that survive near-dup dedup: the min-id
    representative of each connected component."""
    clusters = neardup_clusters(df, threshold, id_col, text_col, n)
    keep = clusters.filter(F.col(id_col) == F.col("cluster_id")).select(id_col)
    return df.join(keep, id_col, "left_semi")


def deletion_neighborhood(col, max_len: int = 64):
    """Array column of all strings reachable from `col` by deleting at
    most TWO characters (SymSpell, Garbe 2012): any pair of strings
    within Levenshtein distance 2 shares at least one common member
    across their depth-2 deletion neighborhoods, so equi-joining on
    neighborhood members generates edit-distance candidates WITHOUT the
    all-pairs blowup. Pure higher-order column expressions — no UDF,
    stays in codegen. Neighborhood size is 1 + n + C(n,2) (~79 for
    n=12)."""
    s = F.col(col) if isinstance(col, str) else col
    n = F.length(s)
    d1 = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.concat(
            F.substring(s, 1, i - 1), F.substring(s, i + 1, F.lit(max_len))
        ),
    )
    # i < j deletions; outer loop stops at n-1 so the inner sequence is
    # never descending (the round-1 ADVICE crash class)
    d2 = F.flatten(
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.transform(
                F.sequence(i + 1, n),
                lambda j: F.concat(
                    F.substring(s, 1, i - 1),
                    F.substring(s, i + 1, j - i - 1),
                    F.substring(s, j + 1, F.lit(max_len)),
                ),
            ),
        )
    )
    return F.array_distinct(
        F.concat(F.array(s), d1, d2)
    )


def editdistance_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str | None = None,
) -> DataFrame:
    """Candidate id pairs (ida < idb) whose `text_col` values are
    within Levenshtein distance <= 2 — generated by the deletion-
    neighborhood equi-join (100% recall for dist <= 2), NOT verified:
    follow with ``levenshtein(a, b, 2) >= 0`` on the pair. Neighborhood
    members are xxhash64-narrowed so the join shuffles 8-byte keys."""
    base = df.select(
        F.col(id_col).alias("__id"),
        *( [F.col(block_col).alias("__blk")] if block_col else [] ),
        F.explode(deletion_neighborhood(text_col)).alias("__v"),
    ).select(
        "__id",
        *( ["__blk"] if block_col else [] ),
        F.xxhash64("__v").alias("__vh"),
    ).distinct()
    keys = ["__vh", "__blk"] if block_col else ["__vh"]
    a = base.alias("a")
    b = base.alias("b")
    cond = (F.col("a.__vh") == F.col("b.__vh")) & (
        F.col("a.__id") < F.col("b.__id")
    )
    if block_col:
        cond = cond & (F.col("a.__blk") == F.col("b.__blk"))
    return (
        a.join(b, cond)
        .select(
            F.col("a.__id").alias("ida"), F.col("b.__id").alias("idb")
        )
        .distinct()
    )


# ---------------------------------------------------------------------------
# segment-level boilerplate dedup (CCNet / RefinedWeb "line-level"
# dedup, generalized to fixed token windows because the fixture corpus
# is single-line). Reference parity note: the reference engine has no
# corpus operators at all (its surface is src/algo/{fnv1a,search}.rs);
# this is part of the declared LLM-pipeline extension surface.
# ---------------------------------------------------------------------------


def segment_table(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seg_tokens: int = 3,
) -> DataFrame:
    """Explode each document into NON-overlapping `seg_tokens`-token
    segments: (id, seg_idx, seg). Single-space tokenization so the
    DuckDB oracle (string_split on ' ') is bit-identical. Pure
    map-side: one scan, one explode, no shuffle."""
    toks = F.split(F.col(text_col), " ")
    nseg = F.greatest(
        F.ceil(F.size(toks) / F.lit(seg_tokens)).cast("int"), F.lit(1)
    )
    segs = F.transform(
        F.sequence(F.lit(0), nseg - F.lit(1)),
        lambda i: F.concat_ws(
            " ", F.slice(toks, i * seg_tokens + 1, seg_tokens)
        ),
    )
    return _spread(df, id_col).select(
        F.col(id_col), F.posexplode(segs).alias("seg_idx", "seg")
    )


def segment_boilerplate(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seg_tokens: int = 3,
    min_docs: int = 2,
) -> DataFrame:
    """Per-document boilerplate profile: a segment is boilerplate when
    it occurs in >= `min_docs` DISTINCT documents (the CCNet line-dedup
    rule). Returns (id, n_seg, n_boiler, boiler_frac, clean_md5) where
    clean_md5 fingerprints the document with boilerplate segments
    REMOVED (order preserved) — the actual dedup rewrite, not just a
    score.

    100 TB shape: segments are md5-narrowed before the document-
    frequency aggregate (map-side partial on a 32-byte key), the
    boilerplate set joins back on that key (AQE broadcasts it when
    small, shuffle-join otherwise — web-scale boilerplate sets are NOT
    assumed driver-sized), and the per-doc rollup collects only one
    doc's segments per group. No window, no cartesian."""
    segs = segment_table(df, id_col, text_col, seg_tokens).withColumn(
        "__h", F.md5("seg")
    )
    boiler = (
        segs.groupBy("__h")
        .agg(F.countDistinct(id_col).alias("__df"))
        .filter(F.col("__df") >= min_docs)
        .select("__h", F.lit(True).alias("__b"))
    )
    flagged = segs.join(boiler, "__h", "left").withColumn(
        "__is_b", F.coalesce("__b", F.lit(False))
    )
    clean = F.concat_ws(
        " ",
        F.transform(
            F.filter(
                F.array_sort(
                    F.collect_list(F.struct("seg_idx", "seg", "__is_b"))
                ),
                lambda s: ~s["__is_b"],
            ),
            lambda s: s["seg"],
        ),
    )
    return (
        flagged.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_seg"),
            F.sum(F.col("__is_b").cast("long")).alias("n_boiler"),
            F.md5(clean).alias("clean_md5"),
        )
        .withColumn(
            "boiler_frac",
            F.round(F.col("n_boiler") / F.col("n_seg"), 4),
        )
        .select(id_col, "n_seg", "n_boiler", "boiler_frac", "clean_md5")
    )


def substring_dup_spans(
    docs: DataFrame,
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """EXACT duplicated-substring span inventory (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): a
    character k-gram occurring >= 2 times ANYWHERE in the corpus
    (other documents or the same one) marks its span duplicated;
    overlapping/adjacent marked positions merge into maximal spans.

    The paper builds one giant suffix array; the Spark-native
    equivalent is relational: explode each doc into its (pos, md5
    k-gram) stream, count grams globally (one map-side-combinable
    shuffle — the suffix array's "find repeats" collapses to
    count >= 2), semi-join the duplicated grams back onto positions,
    and merge positions into islands with a per-doc window (positions
    <= k apart overlap). Per doc: span count, duplicated chars, and
    the duplicated fraction — the statistics that drive the paper's
    cut-or-keep rewrite. Every output but the ratio is an exact
    integer; the window is partitioned by doc (bounded).

    At 100 TB the gram stream is |corpus| rows of 16-byte hashes;
    count + semi-join is the same shape as MinHash-LSH candidate
    generation and shares its linear-scaling argument."""
    n = F.greatest(F.length(text_col) - k + 1, F.lit(0))
    grams = docs.select(
        id_col,
        F.explode(
            F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
                F.array().cast("array<int>")
            )
        ).alias("pos"),
        text_col,
    ).select(
        id_col,
        "pos",
        F.md5(F.substr(F.col(text_col), F.col("pos"), F.lit(k))).alias("g"),
    )
    dup = (
        grams.groupBy("g")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 2)
        .select("g")
    )
    marked = grams.join(dup, "g", "semi")
    w = Window.partitionBy(id_col).orderBy("pos")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    islands = (
        marked.withColumn(
            "new_span",
            F.when(
                F.lag("pos").over(w).isNull()
                | (F.col("pos") - F.lag("pos").over(w) > k),
                1,
            ).otherwise(0),
        )
        .withColumn("island", F.sum("new_span").over(run))
        .groupBy(id_col, "island")
        .agg(
            F.min("pos").alias("s"),
            (F.max("pos") + k - 1).alias("e"),
        )
    )
    per_doc = islands.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_dup_spans"),
        F.sum(F.col("e") - F.col("s") + 1).cast("bigint").alias("dup_chars"),
    )
    return (
        docs.select(id_col, F.length(text_col).alias("n_chars"))
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_dup_spans", F.lit(0)).cast("bigint").alias(
                "n_dup_spans"
            ),
            F.coalesce("dup_chars", F.lit(0)).cast("bigint").alias(
                "dup_chars"
            ),
            F.when(F.col("n_chars") > 0,
                   F.round(
                       F.coalesce("dup_chars", F.lit(0)) / F.col("n_chars"),
                       4,
                   ))
            .otherwise(F.lit(0.0))
            .alias("dup_frac"),
        )
    )
