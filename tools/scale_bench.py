"""Scale-stress harness for the near-dup / similarity family
(round-2 verdict item #1): measure how q32 (MinHash-LSH), q237
(embedding banded-LSH), q270 (PPJoin exact set-similarity) and q288
(SemDeDup) actually scale — wall time AND candidate-pair counts vs
corpus size — instead of arguing from plan shape.

Corpus construction (documents + embeddings, derived from the sf0.1
fixtures; written under .scaledata/, gitignored):

- replica k of a document suffixes every word with "·rk" — identical
  length/frequency structure to the original corpus, ZERO shingle
  overlap across replicas, so the intra-corpus near-dup density stays
  constant while distinct content scales linearly (the healthy-corpus
  shape; replicating verbatim would instead grow quadratic near-dup
  cliques and poison the measurement);
- replica k of an embedding cyclically shifts the vector by 7k
  dimensions — norms and within-replica geometry preserved, cross-
  replica cosines near zero.

For each scale we record wall seconds (MEDIAN of `runs` timed
passes after one warm-up, with min/max recorded alongside — round-8
verdict item 6: single-shot stage timings on this shared VM swung
0.0->4.2 s and made time exponents unusable; a median of 3 absorbs
one stall and the recorded spread shows when a number is too noisy
to lean on), result rows, and the candidate-pair
count of the stage that would blow up if the design were quadratic:
`lsh_candidate_pairs` (q32), `embedding_lsh_candidates` (q237),
`ppjoin_candidates` (q270). For those three lanes the candidate
STAGE is additionally timed on its own (build + enumerate, min of
`runs`), so `sec - candidates_sec` splits out the verify+agg tail —
the round-4 verdict's x4->x8 time-curvature question is exactly
"which stage curved". The fitted log-log slope (alpha in t ~
n^alpha) is reported per query over the whole sweep AND for the
LAST DOUBLING alone (the scale-trend detector; target <= 1.3).
Sub-quadratic means alpha well under 2 on candidates AND time.

Usage:
  PYTHONPATH=/root/repo python tools/scale_bench.py
      [--scales 1,2,4,8,16] [--runs 3] [--out BENCH_SCALING.json]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import time

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASE = os.environ.get("SCALE_BASE_SF_DIR", "/root/testdata/sf0.1")
OUT_BASE = os.path.join(REPO, ".scaledata")
ID_STRIDE = 10_000_000


def build_scale(r: int) -> str:
    """Materialize the x{r} corpus (r replicas of the base tables);
    idempotent."""
    out = os.path.join(OUT_BASE, f"x{r}")
    docs_p = os.path.join(out, "documents.parquet")
    emb_p = os.path.join(out, "embeddings.parquet")
    if os.path.exists(docs_p) and os.path.exists(emb_p):
        return out
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    doc_parts = []
    emb_parts = []
    for k in range(r):
        if k == 0:
            doc_parts.append(
                f"SELECT doc_id, text, lang, source, n_chars "
                f"FROM '{BASE}/documents.parquet'"
            )
            emb_parts.append(
                f"SELECT vec_id, embedding, label "
                f"FROM '{BASE}/embeddings.parquet'"
            )
        else:
            # suffix every word: same token count/lengths, disjoint
            # shingle space per replica
            doc_parts.append(
                f"SELECT doc_id + {k * ID_STRIDE} AS doc_id, "
                f"regexp_replace(text, '(\\S+)', '\\1·r{k}', 'g') AS text, "
                f"lang, source, n_chars "
                f"FROM '{BASE}/documents.parquet'"
            )
            shift = (7 * k) % 64
            emb_parts.append(
                f"SELECT vec_id + {k * ID_STRIDE} AS vec_id, "
                f"embedding[{shift + 1}:] || embedding[1:{shift}] AS embedding, "
                f"label FROM '{BASE}/embeddings.parquet'"
            )
    con.execute(
        f"COPY ({' UNION ALL '.join(doc_parts)}) TO '{docs_p}' (FORMAT PARQUET)"
    )
    con.execute(
        f"COPY ({' UNION ALL '.join(emb_parts)}) TO '{emb_p}' (FORMAT PARQUET)"
    )
    con.close()
    return out


def median(xs: list[float]) -> float:
    ss = sorted(xs)
    n = len(ss)
    return ss[n // 2] if n % 2 else (ss[n // 2 - 1] + ss[n // 2]) / 2


def fit_alpha(ns: list[int], ys: list[float]) -> float:
    """Least-squares slope of log y vs log n."""
    pts = [
        (math.log(n), math.log(y)) for n, y in zip(ns, ys) if y and y > 0
    ]
    if len(pts) < 2:
        return float("nan")
    mx = sum(p[0] for p in pts) / len(pts)
    my = sum(p[1] for p in pts) / len(pts)
    denom = sum((x - mx) ** 2 for x, _ in pts)
    if denom == 0:
        return float("nan")
    return sum((x - mx) * (y - my) for x, y in pts) / denom


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1,2,4,8,16")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument(
        "--out", default=os.path.join(REPO, "BENCH_SCALING.json")
    )
    ap.add_argument(
        "--queries",
        default=None,
        help="comma-separated substrings: re-measure only matching "
        "lanes and MERGE into --out (other lanes keep their recorded "
        "numbers; exponents recomputed over the merged table)",
    )
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]
    only = args.queries.split(",") if args.queries else None

    def lane_on(name: str) -> bool:
        return only is None or any(sub in name for sub in only)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .appName("scale-bench")
        .getOrCreate()
    )

    from luxo_rs_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        ppjoin_candidates,
        shingle_table,
    )
    from luxo_rs_spark.operators.similarity import (
        derive_lsh_bands,
        embedding_lsh_candidates,
        lsh_partition_pruned_probe,
        write_banded_signature_table,
    )
    from luxo_rs_spark.plans.queries import QUERIES

    QNAMES = [
        "q32_minhash_lsh_neardup",
        "q237_embedding_neardup_lsh",
        "q270_setsim_prefix_join",
        "q288_semantic_dedup",
        "q397_segment_boilerplate",
        "q413_ngram_lm_perplexity",
        "q415_substring_dup_spans",
        "q434_mixed_media_decode",
        # round-7 lanes: the composed near-dup x split audit (its
        # candidate stage is q33's pigeonhole-banded simhash join) and
        # the bounded-archive zip round-trip (map + one bounded-group
        # shuffle; archives capped at 512 members regardless of scale)
        "q446_split_leakage_audit",
        "q444_zip_roundtrip",
        # round-8 lane: winnowing near-dup join — candidate mass is the
        # fp equi-join pair count AFTER the stop-fingerprint cut
        # (df <= 32 bounds per-fp fanout at C(32,2), so candidates must
        # stay ~linear) and BEFORE the containment gate
        "q465_winnowing_neardup_join",
    ]

    def lane_query(name: str, sf_dir: str):
        """Most lanes are the QUERIES entries verbatim; q415's query
        caps doc_id < 400 (fine against the fixtures, but the cap
        would pin the lane to replica 0 here), so its lane runs the
        operator over the WHOLE scaled corpus."""
        if name == "q415_substring_dup_spans":
            from luxo_rs_spark.operators.dedup import substring_dup_spans

            docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
            return substring_dup_spans(docs, k=20)
        if name == "q444_zip_roundtrip":
            # uncapped (the query caps doc_id < 400 against the
            # fixtures) and with the 100 TB shape: archives bounded at
            # 512 members via the salted group key
            from luxo_rs_spark.sources.archive import (
                read_zip_members,
                zip_documents,
            )

            docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
            return read_zip_members(
                zip_documents(docs, group_col="source", docs_per_archive=512)
            )
        if name == "q434_mixed_media_decode":
            # the round-6 codec family's lane: synth + sniff + decode
            # five container formats over the WHOLE scaled corpus (the
            # query caps doc_id < 300 against the fixtures) — map-only
            # by construction, so the lane pins alpha ~ 1
            from luxo_rs_spark.multimodal.media import (
                decode_mixed_media,
                synth_mixed_media_table,
            )

            docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
            return decode_mixed_media(synth_mixed_media_table(docs))
        return QUERIES[name](spark, sf_dir)

    def candidate_frame(name: str, sf_dir: str):
        """The candidate STAGE of each curvature-suspect lane as a
        DataFrame — counted for the growth exponent and timed alone so
        time curvature can be attributed to a stage."""
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        if name == "q32_minhash_lsh_neardup":
            return lsh_candidate_pairs(
                minhash_signatures(docs, "doc_id", "text", 3)
            )
        if name == "q237_embedding_neardup_lsh":
            return embedding_lsh_candidates(emb)
        if name == "q270_setsim_prefix_join":
            sh = shingle_table(docs, "doc_id", "text", 3).select(
                "doc_id", F.xxhash64("shingle").alias("sid")
            ).distinct().localCheckpoint(eager=True)
            return ppjoin_candidates(sh, 0.7)
        if name == "q446_split_leakage_audit":
            # candidate mass = the Manku 6-block/3-combo band join's
            # distinct id pairs (BEFORE the hamming cut) — mirrors
            # simhash_neardup_pairs' (combo, 32-bit key) keys exactly
            # (the round-7 fix for the 16-bit chunks' alpha=1.91)
            from itertools import combinations

            from luxo_rs_spark.operators.dedup import simhash

            sig = simhash(docs, "doc_id", "text", 3)
            blocks = [(0, 11), (11, 11), (22, 11), (33, 11), (44, 10), (54, 10)]

            def block(c):
                ofs, width = blocks[c]
                return F.shiftrightunsigned("simhash", ofs).bitwiseAND(
                    F.lit((1 << width) - 1)
                )

            keys = [
                (block(i) * F.lit(1 << 22)) + (block(j) * F.lit(1 << 11))
                + block(k)
                for i, j, k in combinations(range(6), 3)
            ]
            ex = sig.select(
                "doc_id", F.posexplode(F.array(*keys)).alias("combo", "key")
            )
            a = ex.select(F.col("doc_id").alias("da"), "combo", "key")
            b = ex.select(F.col("doc_id").alias("db"), "combo", "key")
            return (
                a.join(b, ["combo", "key"])
                .filter(F.col("da") < F.col("db"))
                .select("da", "db")
                .distinct()
            )
        return None

    def candidates(name: str, sf_dir: str) -> int | None:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        if name == "q465_winnowing_neardup_join":
            from luxo_rs_spark.plans.queries import _winnow_fps

            par = spark.sparkContext.defaultParallelism
            fps0 = (
                _winnow_fps(docs.select("doc_id", "text"))
                .repartition(par)  # round-robin barrier before explode
                .select("doc_id", F.explode_outer("fps").alias("fp"))
            )
            ok = (
                fps0.groupBy("fp")
                .agg(F.count(F.lit(1)).alias("df"))
                .filter(F.col("df") <= 32)
                .select("fp")
            )
            fps = fps0.join(ok, on="fp")
            return (
                fps.alias("a")
                .join(fps.alias("b"), on="fp")
                .filter(F.col("a.doc_id") < F.col("b.doc_id"))
                .count()
            )
        cf = candidate_frame(name, sf_dir)
        if cf is not None:
            return cf.count()
        if name == "q413_ngram_lm_perplexity":
            # candidate mass = scored bigram occurrences of the
            # held-out split (the explode the joins fan over) —
            # linear in corpus tokens by construction
            from luxo_rs_spark.functions.ngram_lm import bigrams, tokens

            return (
                docs.filter(F.col("doc_id") % 5 == 0)
                .select(F.explode(bigrams(tokens(F.col("text")))))
                .count()
            )
        if name == "q415_substring_dup_spans":
            # candidate mass = positions whose k-gram is globally
            # duplicated (the semi-join output feeding the island
            # merge)
            k = 20
            n = F.greatest(F.length("text") - k + 1, F.lit(0))
            grams = docs.select(
                F.col("doc_id"),
                F.explode(
                    F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
                        F.array().cast("array<int>")
                    )
                ).alias("pos"),
                "text",
            ).select(
                "doc_id",
                F.md5(F.substr(F.col("text"), F.col("pos"), F.lit(k))).alias(
                    "g"
                ),
            )
            dup = (
                grams.groupBy("g")
                .agg(F.count(F.lit(1)).alias("c"))
                .filter(F.col("c") >= 2)
                .select("g")
            )
            return grams.join(dup, "g", "semi").count()
        if name == "q397_segment_boilerplate":
            # candidate mass = flagged segment occurrences joining back
            # (linear in corpus segments by construction: one DF agg on
            # a 32-byte key, no pair enumeration)
            from luxo_rs_spark.operators.dedup import segment_table

            segs = segment_table(docs).withColumn("__h", F.md5("seg"))
            boiler = (
                segs.groupBy("__h")
                .agg(F.countDistinct("doc_id").alias("df"))
                .filter(F.col("df") >= 2)
            )
            return segs.join(boiler, "__h", "left_semi").count()
        return None  # q288: blocked all-pairs is the algorithm itself

    results = []
    for r in scales:
        sf_dir = build_scale(r)
        n_docs = (
            duckdb.sql(
                f"SELECT count(*) FROM '{sf_dir}/documents.parquet'"
            ).fetchone()[0]
        )
        row = {"scale": r, "n_docs": n_docs, "queries": {}}
        for name in QNAMES:
            if not lane_on(name):
                continue
            df = lane_query(name, sf_dir)
            df.write.format("noop").mode("overwrite").save()  # warm-up
            times = []
            for _ in range(args.runs):
                spark.catalog.clearCache()
                # construction is INSIDE the timing: q237/q288 do their
                # sizing count + driver kmeans at construction, which is
                # exactly the work whose scaling is under test
                t0 = time.perf_counter()
                d = lane_query(name, sf_dir)
                d.write.format("noop").mode("overwrite").save()
                times.append(time.perf_counter() - t0)
            n_out = lane_query(name, sf_dir).count()
            n_cand = candidates(name, sf_dir)
            lane = {
                "sec": round(median(times), 3),
                "sec_min": round(min(times), 3),
                "sec_max": round(max(times), 3),
                "result_rows": n_out,
                "candidate_pairs": n_cand,
            }
            # per-stage split for the curvature-suspect lanes: time the
            # candidate stage alone (build + enumerate), min of runs;
            # the verify/agg tail is the remainder of the full pass
            if candidate_frame(name, sf_dir) is not None:
                ctimes = []
                for _ in range(args.runs):
                    spark.catalog.clearCache()
                    t0 = time.perf_counter()
                    candidate_frame(name, sf_dir).write.format(
                        "noop"
                    ).mode("overwrite").save()
                    ctimes.append(time.perf_counter() - t0)
                lane["candidates_sec"] = round(median(ctimes), 3)
                lane["candidates_sec_min"] = round(min(ctimes), 3)
                lane["candidates_sec_max"] = round(max(ctimes), 3)
                lane["verify_agg_sec"] = round(
                    max(lane["sec"] - lane["candidates_sec"], 0.0), 3
                )
            row["queries"][name] = lane
            print(
                f"x{r} {name}: {row['queries'][name]}", flush=True
            )

        # q396 probe: the signature table is written ONCE per corpus
        # snapshot (its ~linear build cost reported separately); each
        # timed pass is one single-vector probe at the ADAPTIVE band
        # config a 100 TB deployment would use (derive_lsh_bands keeps
        # expected bucket occupancy constant), so probe wall time
        # should stay ~flat while the corpus grows — the point of the
        # partitioned/sorted layout.
        if not lane_on("q396_lsh_bucketed_probe"):
            results.append(row)
            continue
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        n_vec = emb.count()
        nb, bb = derive_lsh_bands(n_vec, None, None)
        sig_path = os.path.join(sf_dir, "lsh_sigs_bench")
        t0 = time.perf_counter()
        write_banded_signature_table(
            emb, sig_path, n_bands=nb, band_bits=bb
        )
        build_sec = time.perf_counter() - t0

        def probe() -> int:
            return lsh_partition_pruned_probe(
                spark, sig_path, emb, 0, 0.1, n_bands=nb, band_bits=bb
            ).count()

        probe()  # warm-up
        ptimes = []
        n_hits = 0
        for _ in range(args.runs):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            n_hits = probe()
            ptimes.append(time.perf_counter() - t0)
        row["queries"]["q396_lsh_bucketed_probe"] = {
            "sec": round(median(ptimes), 3),
            "sec_min": round(min(ptimes), 3),
            "sec_max": round(max(ptimes), 3),
            "result_rows": n_hits,
            "candidate_pairs": None,
            "sig_build_sec": round(build_sec, 3),
            "n_bands": nb,
            "band_bits": bb,
        }
        print(
            f"x{r} q396_lsh_bucketed_probe: "
            f"{row['queries']['q396_lsh_bucketed_probe']}",
            flush=True,
        )
        results.append(row)

    ns = [row["n_docs"] for row in results]
    if only is not None and os.path.exists(args.out):
        # selective re-measurement: merge fresh lanes into the
        # recorded table, keep everything else
        with open(args.out) as fh:
            prev = json.load(fh)
        prev_by_scale = {r["scale"]: r["queries"] for r in prev["results"]}
        for row in results:
            merged = dict(prev_by_scale.get(row["scale"], {}))
            merged.update(row["queries"])
            row["queries"] = merged

    def last_doubling_alpha(ys: list[float]) -> float | None:
        if len(ns) < 2 or not ys[-1] or not ys[-2]:
            return None
        try:
            return round(
                math.log(ys[-1] / ys[-2]) / math.log(ns[-1] / ns[-2]), 3
            )
        except (ValueError, ZeroDivisionError):
            return None

    exponents = {}
    for name in QNAMES + ["q396_lsh_bucketed_probe"]:
        if any(name not in row["queries"] for row in results):
            continue
        lanes = [row["queries"][name] for row in results]
        secs = [q["sec"] for q in lanes]
        cands = [q.get("candidate_pairs") for q in lanes]
        exponents[name] = {
            "time_alpha": round(fit_alpha(ns, secs), 3),
            "time_alpha_last_doubling": last_doubling_alpha(secs),
            "candidates_alpha": (
                round(fit_alpha(ns, cands), 3)
                if all(c is not None for c in cands)
                else None
            ),
        }
        if all("candidates_sec" in q for q in lanes):
            cs = [q["candidates_sec"] for q in lanes]
            vs = [q["verify_agg_sec"] for q in lanes]
            exponents[name]["candidates_time_alpha"] = round(
                fit_alpha(ns, cs), 3
            )
            exponents[name]["candidates_time_alpha_last_doubling"] = (
                last_doubling_alpha(cs)
            )
            exponents[name]["verify_agg_time_alpha"] = round(
                fit_alpha(ns, vs), 3
            )

    out = {
        "base": BASE,
        "scales": scales,
        "results": results,
        "exponents": exponents,
    }
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(exponents))


if __name__ == "__main__":
    main()
