"""Similarity-search operator tests: exact top-k and ANN-LSH recall."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from luxo_rs_spark.operators.similarity import (
    ann_lsh_topk,
    cosine_topk,
    embedding_neardup_pairs,
)
from luxo_rs_spark.sources.registry import load_table

from conftest import SF_DIR, SF_DIR_01


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings").cache()


def test_cosine_topk_matches_numpy(spark, emb):
    rows = emb.collect()
    mat = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in rows}
    q = mat[1]
    sims = {
        vid: float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q)))
        for vid, v in mat.items()
        if vid != 1
    }
    expected = sorted(sims.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    got = [(r.vec_id, r.sim) for r in cosine_topk(emb, 1, 5).collect()]
    assert [g[0] for g in got] == [e[0] for e in expected]
    for (gv, gs), (_, es) in zip(got, expected):
        assert math.isclose(gs, es, rel_tol=1e-9)


def test_ann_lsh_finds_planted_neighbor(spark):
    """LSH must recover a planted near-duplicate (sim ~0.99). On
    uniformly random data (fixture max sim ~0.4) hyperplane buckets
    can't discriminate — true near-dups are what LSH is for."""
    rng = np.random.default_rng(7)
    base = rng.standard_normal((100, 64)).astype(np.float32)
    q = base[0]
    planted = q + 0.05 * rng.standard_normal(64).astype(np.float32)
    rows = [(0, q.tolist()), (999, planted.tolist())] + [
        (i, base[i].tolist()) for i in range(1, 100)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    approx = [r.vec_id for r in ann_lsh_topk(df, 0, 3, dim=64).collect()]
    assert approx[0] == 999


def test_ann_lsh_shape_on_fixture(spark, emb):
    """Machinery check on fixture data: k ordered rows, target excluded."""
    rows = ann_lsh_topk(emb, 1, 5, dim=64).collect()
    assert len(rows) == 5
    assert all(r.vec_id != 1 for r in rows)
    sims = [r.sim for r in rows]
    assert sims == sorted(sims, reverse=True)


@pytest.mark.slow
def test_neardup_pairs_symmetric_bound(spark, emb):
    pairs = embedding_neardup_pairs(emb, 0.3, block_col="label").collect()
    assert all(r.va < r.vb for r in pairs)
    assert all(r.sim >= 0.3 for r in pairs)


@pytest.mark.slow
def test_neardup_blocking_restricts_pairs(spark, emb):
    labels = {r.vec_id: r.label for r in emb.collect()}
    pairs = embedding_neardup_pairs(emb, 0.3, block_col="label").collect()
    assert pairs, "expected at least one pair at threshold 0.3"
    assert all(labels[r.va] == labels[r.vb] for r in pairs)


def test_ivf_topk_recall_vs_exact(spark, emb):
    """IVF with 4/16 probes must recover most of the exact top-5; with
    all clusters probed it must equal the exact operator."""
    from luxo_rs_spark.operators.similarity import ann_ivf_topk

    exact = [r.vec_id for r in cosine_topk(emb, 1, 5).collect()]
    approx = [
        r.vec_id
        for r in ann_ivf_topk(emb, 1, 5, n_centroids=16, n_probe=4).collect()
    ]
    assert len(set(exact) & set(approx)) >= 2  # recall floor on random data
    full = [
        r.vec_id
        for r in ann_ivf_topk(emb, 1, 5, n_centroids=16, n_probe=16).collect()
    ]
    assert full == exact  # probing everything == exact scan


def test_ivf_deterministic(spark, emb):
    from luxo_rs_spark.operators.similarity import ann_ivf_topk

    a = [(r.vec_id, round(r.sim, 6)) for r in ann_ivf_topk(emb, 1, 5).collect()]
    b = [(r.vec_id, round(r.sim, 6)) for r in ann_ivf_topk(emb, 1, 5).collect()]
    assert a == b


def test_knn_join_matches_single_query_topk(spark, emb):
    from luxo_rs_spark.operators.similarity import knn_join

    got = (
        knn_join(emb, emb.filter(F.col("vec_id") == 1), k=5)
        .orderBy("rn")
        .collect()
    )
    single = cosine_topk(emb, 1, 5).collect()
    assert [r.nbr for r in got] == [r.vec_id for r in single]
    for g, s in zip(got, single):
        assert abs(g.sim - s.sim) < 1e-12


def test_label_centroids_two_point_cluster(spark):
    from luxo_rs_spark.operators.similarity import label_centroids

    rows = [
        (1, [1.0, 0.0], "a"),
        (2, [0.0, 1.0], "a"),
        (3, [2.0, 0.0], "b"),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label string")
    out = {r.label: r for r in label_centroids(df).collect()}
    # label a: centroid (0.5, 0.5), norm sqrt(0.5); members' cos = cos(45deg)
    assert out["a"].n_vectors == 2 and out["a"].dims == 2
    assert out["a"].cnorm == pytest.approx(0.5**0.5)
    assert out["a"].avg_cos == pytest.approx(2**-0.5)
    # label b: singleton cluster -> centroid is the member, cos = 1
    assert out["b"].cnorm == pytest.approx(2.0)
    assert out["b"].avg_cos == pytest.approx(1.0)


def test_neardup_lsh_recall_on_planted_dups(spark):
    """Banded-LSH near-dup (the q35 scale path) must recall planted
    near-duplicates (sim ~0.98) at high rate, and every emitted pair
    must exactly verify (sim from the exact operator, same contract)."""
    from luxo_rs_spark.operators.similarity import embedding_neardup_lsh

    rng = np.random.default_rng(11)
    base = rng.standard_normal((120, 64)).astype(np.float32)
    rows = [(i, base[i].tolist(), 0) for i in range(120)]
    # plant 20 near-dups: id 1000+i ~ id i with small noise
    planted = set()
    for i in range(20):
        noisy = base[i] + 0.08 * rng.standard_normal(64).astype(np.float32)
        rows.append((1000 + i, noisy.tolist(), 0))
        planted.add((i, 1000 + i))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")

    got = embedding_neardup_lsh(df, threshold=0.9, dim=64).collect()
    got_pairs = {(r.va, r.vb) for r in got}
    # every emitted pair really is >= threshold (exact verify step)
    assert all(r.sim >= 0.9 for r in got)
    # recall of the planted pairs: 8 bands x 8 bits at sim~0.98 ->
    # expected ~0.98; demand >= 0.8 to stay flake-proof
    assert len(got_pairs & planted) >= 16


def test_neardup_lsh_subset_of_exact(spark, emb):
    """On the fixture, LSH pairs must be a subset of the exact
    corpus-wide pairs with identical sims (the verify step is exact)."""
    from luxo_rs_spark.operators.similarity import embedding_neardup_lsh

    one_block = emb.withColumn("label", F.lit(0))
    exact = {
        (r.va, r.vb): r.sim
        for r in embedding_neardup_pairs(one_block, 0.4, block_col="label").collect()
    }
    lsh = embedding_neardup_lsh(emb, 0.4, n_bands=16, band_bits=4).collect()
    assert lsh, "expected candidates at threshold 0.4"
    for r in lsh:
        assert (r.va, r.vb) in exact
        assert abs(r.sim - exact[(r.va, r.vb)]) < 1e-9


@pytest.mark.slow
def test_neardup_pairs_matches_bruteforce_numpy(spark, emb):
    """The grid/BLAS rewrite of embedding_neardup_pairs must equal a
    driver-side numpy brute force within each label block."""
    rows = emb.collect()
    by_label: dict[int, list] = {}
    for r in rows:
        by_label.setdefault(r.label, []).append(
            (r.vec_id, np.array(r.embedding, dtype=np.float64))
        )
    want = {}
    for members in by_label.values():
        for i in range(len(members)):
            for j in range(len(members)):
                va, ea = members[i]
                vb, eb = members[j]
                if va >= vb:
                    continue
                sim = float(
                    ea @ eb / (np.linalg.norm(ea) * np.linalg.norm(eb))
                )
                if sim >= 0.3:
                    want[(va, vb)] = sim
    got = {
        (r.va, r.vb): r.sim
        for r in embedding_neardup_pairs(emb, 0.3, block_col="label").collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert math.isclose(got[k], want[k], rel_tol=1e-9)


def test_ivf_adc_recall_vs_exact(spark):
    """IVF-ADC (coarse prune + quantized asymmetric distances + exact
    re-rank) recalls most of the exact top-5 — and every similarity it
    reports is a TRUE cosine (exact re-rank), so precision of the
    returned sims is 1 by construction."""
    from luxo_rs_spark.operators.similarity import cosine_topk, ivf_adc_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    exact = {r.vec_id for r in cosine_topk(emb, target_id=1, k=5).collect()}
    approx = {r.vec_id for r in ivf_adc_topk(emb, target_id=1, k=5).collect()}
    assert len(approx) == 5
    assert len(exact & approx) >= 3  # recall@5 >= 0.6 on the fixture


def test_semantic_dedup_survivor_rule(spark):
    """SemDeDup semantics: a vector is dropped iff a LOWER-id vector in
    the same cluster is cosine-similar above threshold — so every
    duplicate has a surviving witness, and no surviving pair within a
    cluster exceeds the threshold... unless their witness chain differs
    (A~B and B~C but A!~C keeps A, drops B and C iff C~A or C~B). We
    pin the two hard guarantees: (1) min-id of every cluster always
    survives; (2) flagged dups always have a lower-id similar witness."""
    from luxo_rs_spark.functions.vectors import cosine
    from luxo_rs_spark.operators.similarity import semantic_dedup

    emb = load_table(spark, SF_DIR, "embeddings")
    flags = semantic_dedup(emb, threshold=0.9).cache()
    # (1) the lowest id in every cluster is never a dup
    firsts = flags.groupBy("cluster").agg(F.min("id").alias("first_id"))
    joined = flags.join(
        firsts, (flags.id == firsts.first_id) & (flags.cluster == firsts.cluster)
    )
    assert joined.filter(F.col("is_dup")).count() == 0
    # (2) every dup has a lower-id same-cluster witness with sim >= t
    dups = flags.filter(F.col("is_dup")).select("id", "cluster")
    vecs = emb.select(F.col("vec_id").alias("id"), "embedding")
    pairs = (
        dups.join(vecs, "id")
        .alias("d")
        .join(
            flags.join(vecs, "id").alias("w"),
            (F.col("w.cluster") == F.col("d.cluster"))
            & (F.col("w.id") < F.col("d.id")),
        )
        .withColumn("sim", cosine(F.col("d.embedding"), F.col("w.embedding")))
        .filter(F.col("sim") >= 0.9)
        .select(F.col("d.id").alias("id"))
        .distinct()
    )
    assert pairs.count() == dups.count()


def test_random_projection_distortion_and_determinism(spark):
    """JL projection (64->32): deterministic in the seed, and the
    empirical squared-distance distortion stays inside the JL envelope
    for the overwhelming majority of sampled pairs."""
    import numpy as np

    from luxo_rs_spark.operators.similarity import random_projection

    emb = load_table(spark, SF_DIR_01, "embeddings").limit(100)
    red1 = random_projection(emb, 64, 32).select("vec_id", "embedding_rp")
    red2 = random_projection(emb, 64, 32).select("vec_id", "embedding_rp")
    p1 = {r["vec_id"]: r["embedding_rp"] for r in red1.collect()}
    p2 = {r["vec_id"]: r["embedding_rp"] for r in red2.collect()}
    assert p1 == p2  # same seed -> bit-identical

    orig = {r["vec_id"]: np.array(r["embedding"]) for r in emb.collect()}
    ids = sorted(orig)[:40]
    ratios = []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            d0 = float(np.sum((orig[ids[i]] - orig[ids[j]]) ** 2))
            dr = float(
                np.sum(
                    (np.array(p1[ids[i]]) - np.array(p1[ids[j]])) ** 2
                )
            )
            if d0 > 0:
                ratios.append(dr / d0)
    ratios = np.array(ratios)
    # mean ratio ~1 (unbiased), and >=95% of pairs within +/-60% at k=32
    assert 0.8 < ratios.mean() < 1.2
    assert (np.abs(ratios - 1) < 0.6).mean() >= 0.95


def test_random_projection_topk_quality(spark):
    """Effective quality of reduced-space top-k. The fixture embeddings
    are near-orthogonal (best cosine ~0.37, top-50 packed within 0.2),
    so exact ID recall after any 2x compression is weak BY CONSTRUCTION
    — what JL guarantees is distance preservation, so the gate is (a)
    overlap with the exact top-50 (near-equivalent neighbors) and (b)
    the true-cosine quality of the approx picks staying far above the
    corpus mean (~0). Both are deterministic (seeded projection)."""
    from luxo_rs_spark.operators.similarity import (
        cosine_topk,
        random_projection,
    )

    emb = load_table(spark, SF_DIR_01, "embeddings")
    exact50 = cosine_topk(emb, target_id=0, k=50).collect()
    exact_ids = {r["vec_id"] for r in exact50}
    sims = {
        r["vec_id"]: r["sim"]
        for r in cosine_topk(emb, target_id=0, k=499).collect()
    }
    red = random_projection(emb, 64, 32)
    approx = [
        r["vec_id"]
        for r in cosine_topk(
            red, target_id=0, k=10, vec_col="embedding_rp"
        ).collect()
    ]
    overlap = len(set(approx) & exact_ids) / 10
    quality = sum(sims[v] for v in approx) / 10
    assert overlap >= 0.3, overlap  # measured 0.5 on the fixture
    assert quality >= 0.10, quality  # measured 0.158; corpus mean ~0


def test_embedding_neardup_grid_independent(spark):
    """The exact pair set must not depend on the grid decomposition:
    forced grid=1, grid=5, and the adaptive default all agree (the
    round-4 adaptive grid only changes task sizing, never results)."""
    import numpy as np

    from luxo_rs_spark.operators.similarity import embedding_neardup_pairs

    rng = np.random.default_rng(11)
    rows = [
        (i, int(i % 3), [float(x) for x in rng.normal(size=8)])
        for i in range(60)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    )

    def pairs(**kw):
        return {
            (r.va, r.vb, round(r.sim, 9))
            for r in embedding_neardup_pairs(
                emb, 0.2, block_col="label", **kw
            ).collect()
        }

    p_auto, p1, p5 = pairs(), pairs(grid=1), pairs(grid=5)
    assert p_auto == p1 == p5
    assert p_auto  # non-degenerate


def test_xxh64_long_matches_spark(spark):
    """The pure-Python XXH64 the oracles use to replicate the strided
    kmeans sample must equal Spark's xxhash64 bit-for-bit."""
    from pyspark.sql import functions as F

    from luxo_rs_spark.functions.xxh64 import xxh64_long_signed

    vals = list(range(-300, 300, 7)) + [
        2**62, -(2**62), 2**63 - 1, -(2**63), 12345678901234567,
    ]
    rows = (
        spark.createDataFrame([(v,) for v in vals], "x long")
        .select("x", F.xxhash64("x").alias("h"))
        .collect()
    )
    for r in rows:
        assert r["h"] == xxh64_long_signed(r["x"]), r["x"]


def test_ivf_pruned_probe_matches_inline_ivf(spark, tmp_path):
    """The persisted-index probe returns exactly the inline
    ann_ivf_topk result (same centroids, probes, tie-breaks) — the
    index is a layout change, not a semantics change."""
    import numpy as np
    from pyspark.sql import functions as F

    from luxo_rs_spark.operators.similarity import (
        ann_ivf_topk,
        ivf_partition_pruned_probe,
        kmeans_centroids,
        write_ivf_index,
    )
    from luxo_rs_spark.sources.registry import load_table

    from conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings")
    cent = kmeans_centroids(emb, n_centroids=16, seed=42)
    path = str(tmp_path / "ivf_idx")
    write_ivf_index(emb, path, cent)
    qvec = emb.filter(F.col("vec_id") == 2).select("embedding").head()[0]
    got = ivf_partition_pruned_probe(
        spark, path, cent, qvec, n_probe=4, k=5, exclude_id=2
    ).collect()
    want = ann_ivf_topk(emb, target_id=2, k=5, n_centroids=16, n_probe=4).collect()
    assert [(r.vec_id, round(r.sim, 9)) for r in got] == [
        (r.vec_id, round(r.sim, 9)) for r in want
    ]
    # the probe's clusters are a subset of the centroid space and every
    # returned row carries its posting-list key
    q = np.asarray(qvec, dtype=np.float64)
    q /= max(np.linalg.norm(q), 1e-12)
    probes = set(np.argsort(-(cent @ q))[:4].tolist())
    assert {r.ivf_cluster for r in got} <= probes


def test_ivf_adc_pruned_probe_matches_inline_adc(spark, tmp_path):
    """The persisted IVF+ADC probe returns exactly the inline
    ivf_adc_topk result when the grid/probe/shortlist params line up —
    storing codes next to the vectors is a layout change, not a
    semantics change — and its shortlist really is code-driven: the
    codes roundtrip c -> (c+128) reconstructs q278's raw grid code."""
    import numpy as np
    from pyspark.sql import functions as F

    from luxo_rs_spark.operators.similarity import (
        ivf_adc_pruned_probe,
        ivf_adc_topk,
        kmeans_centroids,
        write_ivf_adc_index,
    )
    from luxo_rs_spark.sources.registry import load_table

    from conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings")
    cent = kmeans_centroids(emb, n_centroids=16, seed=42)
    path = str(tmp_path / "ivf_adc_idx")
    # n_codes=16 so the inline ivf_adc_topk (fixed 16-code grid) is a
    # directly comparable reference
    write_ivf_adc_index(emb, path, cent, n_codes=16)
    qvec = emb.filter(F.col("vec_id") == 1).select("embedding").head()[0]
    got = ivf_adc_pruned_probe(
        spark, path, cent, qvec, n_probe=4, k=5, shortlist=32, exclude_id=1
    ).collect()
    want = ivf_adc_topk(
        emb, target_id=1, k=5, n_centroids=16, n_probe=4,
        n_codes=16, shortlist=32,
    ).collect()
    assert [(r.vec_id, round(r.sim, 9)) for r in got] == [
        (r.vec_id, round(r.sim, 9)) for r in want
    ]
    # stored codes are the center-shifted q278 grid codes
    row = spark.read.parquet(path).filter(F.col("vec_id") == 1).head()
    meta = spark.read.parquet(path + "/_adc_meta").head()
    vec = np.asarray(row.embedding, dtype=np.float64)
    import math

    want_codes = [
        min(15, math.floor((x - meta.lo) / (meta.hi - meta.lo) * 16)) - 128
        for x in vec
    ]
    assert list(row.codes) == want_codes


def test_ivf_pq_trained_probe_recall_vs_grid(spark, tmp_path):
    """Round-8 verdict item 1 — the recall-vs-grid comparison for the
    trained-PQ index. Three claims, each pinned:

    1. TRAINING WORKS: 8 Lloyd iterations strictly reduce codebook
       quantization error vs the seeded init (k-means' monotonic
       objective), measured on the actual training residuals.
    2. BYTES ECONOMY: PQ stores m=8 code bytes per 64-dim vector where
       the q439 grid stores 64 — 8x fewer — verified on disk.
    3. RECALL PER BYTE: at the same n_probe/shortlist, PQ recall@8 vs
       the exact top-8 stays within one neighbor of the 8x-bigger grid
       codes' recall (both recalls printed for the record)."""
    import numpy as np
    from pyspark.sql import functions as F

    from luxo_rs_spark.operators.similarity import (
        cosine_topk,
        ivf_adc_pruned_probe,
        ivf_pq_pruned_probe,
        kmeans_centroids,
        kmeans_euclidean_numpy,
        strided_sample_matrix,
        train_pq_codebooks,
        write_ivf_adc_index,
        write_ivf_pq_index,
    )
    from luxo_rs_spark.sources.registry import load_table

    from conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings").cache()
    n_rows = emb.count()
    cent = kmeans_centroids(emb, n_centroids=16, seed=42, n_rows=n_rows)

    # (1) training monotonicity on the real residual sample
    X = strided_sample_matrix(emb, n_rows=n_rows)
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    R = X - cent[np.argmax(Xn @ cent.T, axis=1)]

    def mse(book: np.ndarray, sub: np.ndarray) -> float:
        d = ((sub[:, None, :] - book[None, :, :]) ** 2).sum(axis=2)
        return float(d.min(axis=1).mean())

    sub0 = np.ascontiguousarray(R[:, :8])
    trained = kmeans_euclidean_numpy(sub0, 64, seed=42, iters=8)
    init = kmeans_euclidean_numpy(sub0, 64, seed=42, iters=0)
    assert mse(trained, sub0) < mse(init, sub0), (
        "Lloyd iterations must reduce quantization MSE vs seeded init"
    )

    books = train_pq_codebooks(emb, cent, m=8, n_codes=256, n_rows=n_rows)
    pq_path = str(tmp_path / "pq_idx")
    grid_path = str(tmp_path / "grid_idx")
    write_ivf_pq_index(emb, pq_path, cent, books)
    write_ivf_adc_index(emb, grid_path, cent, n_codes=256)

    # (2) bytes economy on disk: 8 code bytes vs 64
    pq_row = spark.read.parquet(pq_path).head()
    grid_row = spark.read.parquet(grid_path).head()
    assert len(pq_row.codes) == 8
    assert len(grid_row.codes) == 64

    # (3) recall@8 vs exact, same probe budget
    qvec = emb.filter(F.col("vec_id") == 3).select("embedding").head()[0]
    exact = {
        r.vec_id for r in cosine_topk(emb, 3, 8).collect()
    }
    pq_hits = {
        r.vec_id
        for r in ivf_pq_pruned_probe(
            spark, pq_path, cent, books, qvec,
            n_probe=4, k=8, shortlist=32, exclude_id=3,
        ).collect()
    }
    grid_hits = {
        r.vec_id
        for r in ivf_adc_pruned_probe(
            spark, grid_path, cent, qvec,
            n_probe=4, k=8, shortlist=32, exclude_id=3,
        ).collect()
    }
    recall_pq = len(pq_hits & exact) / 8
    recall_grid = len(grid_hits & exact) / 8
    print(f"recall@8: pq(8B)={recall_pq:.3f} grid(64B)={recall_grid:.3f}")
    assert recall_pq >= recall_grid - 1 / 8, (
        f"8-byte trained PQ fell more than one neighbor behind the "
        f"64-byte grid: pq={recall_pq} grid={recall_grid}"
    )
    assert recall_pq >= 0.5


def test_ivf_pq_model_roundtrip_and_append_equals_rebuild(spark, tmp_path):
    """The persisted model (centroids + codebooks) reads back
    bit-exactly, and incremental ivf_pq_append over a split corpus
    produces an index whose probe results equal a from-scratch
    write_ivf_pq_index over the union — the maintenance contract the
    streaming twin (tests/test_streaming.py) runs through
    foreachBatch."""
    import numpy as np
    from pyspark.sql import functions as F

    from luxo_rs_spark.operators.similarity import (
        ivf_pq_append,
        ivf_pq_pruned_probe,
        kmeans_centroids,
        read_ivf_pq_model,
        train_pq_codebooks,
        write_ivf_pq_index,
    )
    from luxo_rs_spark.sources.registry import load_table

    from conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings").cache()
    n_rows = emb.count()
    cent = kmeans_centroids(emb, n_centroids=16, seed=42, n_rows=n_rows)
    books = train_pq_codebooks(emb, cent, m=8, n_codes=256, n_rows=n_rows)

    full_path = str(tmp_path / "full_idx")
    write_ivf_pq_index(emb, full_path, cent, books)
    r_cent, r_books = read_ivf_pq_model(spark, full_path)
    assert np.array_equal(r_cent, cent)
    assert np.array_equal(r_books, books)

    inc_path = str(tmp_path / "inc_idx")
    base = emb.filter(F.col("vec_id") % 3 != 2)
    write_ivf_pq_index(base, inc_path, cent, books)
    increment = emb.filter(F.col("vec_id") % 3 == 2)
    ivf_pq_append(increment, inc_path, cent, books)

    qvec = emb.filter(F.col("vec_id") == 3).select("embedding").head()[0]
    got = ivf_pq_pruned_probe(
        spark, inc_path, cent, books, qvec,
        n_probe=4, k=8, shortlist=32, exclude_id=3,
    ).collect()
    want = ivf_pq_pruned_probe(
        spark, full_path, cent, books, qvec,
        n_probe=4, k=8, shortlist=32, exclude_id=3,
    ).collect()
    assert [(r.vec_id, r.ivf_cluster, round(r.sim, 12)) for r in got] == [
        (r.vec_id, r.ivf_cluster, round(r.sim, 12)) for r in want
    ]


def test_opq_rotation_improves_quantization_and_keeps_recall(
    spark, tmp_path
):
    """Round-9 verdict item 7 — OPQ (Ge et al.): the learned rotation

    1. is ORTHOGONAL (R R^T = I to machine precision), so rotated-space
       ADC distances are original-space distances;
    2. does not increase the training objective: corpus-wide PQ
       quantization error with (rotation, its codebooks) <= plain PQ's
       (the alternation minimizes exactly this);
    3. round-trips through the persisted index (read_opq_rotation);
    4. probe recall@8 >= plain-PQ parity at the same budget.
    """
    import numpy as np
    from pyspark.sql import functions as F

    from luxo_rs_spark.operators.similarity import (
        cosine_topk,
        ivf_pq_pruned_probe,
        kmeans_centroids,
        pq_encode_numpy,
        read_opq_rotation,
        strided_sample_matrix,
        train_opq,
        train_pq_codebooks,
        write_ivf_pq_index,
    )
    from luxo_rs_spark.sources.registry import load_table

    from conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings").cache()
    n_rows = emb.count()
    cent = kmeans_centroids(emb, n_centroids=16, seed=42, n_rows=n_rows)
    books_pq = train_pq_codebooks(emb, cent, m=8, n_codes=256, n_rows=n_rows)
    rot, books_opq = train_opq(emb, cent, m=8, n_codes=256, n_rows=n_rows)

    # (1) orthogonality
    assert np.allclose(rot @ rot.T, np.eye(rot.shape[0]), atol=1e-9)

    # (2) corpus-wide quantization error: OPQ <= PQ (on the training
    # sample, which is the alternation's objective)
    X = strided_sample_matrix(emb, n_rows=n_rows)
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    assign = np.argmax(Xn @ cent.T, axis=1)
    resid = X - cent[assign]

    def qerr(R, books, rotation):
        Z = R if rotation is None else R @ rotation
        codes = pq_encode_numpy(
            Z, np.zeros(len(Z), dtype=np.int64),
            np.zeros((1, Z.shape[1])), books,
        )
        Y = np.concatenate(
            [books[j][codes[:, j]] for j in range(books.shape[0])], axis=1
        )
        return float(((Z - Y) ** 2).sum())

    err_pq = qerr(resid, books_pq, None)
    err_opq = qerr(resid, books_opq, rot)
    print(f"quantization error: pq={err_pq:.4f} opq={err_opq:.4f}")
    assert err_opq <= err_pq * 1.0001, (err_opq, err_pq)

    # (3) persisted round-trip
    path = str(tmp_path / "opq_idx")
    write_ivf_pq_index(emb, path, cent, books_opq, rotation=rot)
    rot_back = read_opq_rotation(spark, path)
    assert np.array_equal(rot_back, rot) or np.allclose(rot_back, rot)
    # a plain index has no rotation side table
    plain_path = str(tmp_path / "pq_idx")
    write_ivf_pq_index(emb, plain_path, cent, books_pq)
    assert read_opq_rotation(spark, plain_path) is None

    # (4) recall parity at the same probe budget
    qvec = emb.filter(F.col("vec_id") == 3).select("embedding").head()[0]
    exact = {r.vec_id for r in cosine_topk(emb, 3, 8).collect()}
    opq_hits = {
        r.vec_id
        for r in ivf_pq_pruned_probe(
            spark, path, cent, books_opq, qvec,
            n_probe=4, k=8, shortlist=32, exclude_id=3, rotation=rot,
        ).collect()
    }
    pq_hits = {
        r.vec_id
        for r in ivf_pq_pruned_probe(
            spark, plain_path, cent, books_pq, qvec,
            n_probe=4, k=8, shortlist=32, exclude_id=3,
        ).collect()
    }
    recall_opq = len(opq_hits & exact) / 8
    recall_pq = len(pq_hits & exact) / 8
    print(f"recall@8: opq={recall_opq:.3f} pq={recall_pq:.3f}")
    assert recall_opq >= recall_pq, (recall_opq, recall_pq)
