"""Streaming near-dup ingest scale-stress (round-3 verdict item #7):
feed the x4 replica corpus (tools/scale_bench.py fixtures) through
``streaming/neardup_ingest.NearDupIngest`` in FIXED-SIZE batches and
measure per-batch wall time + state growth as history accumulates.

The claim under test: per-batch cost is a function of BATCH size and
band-collision counts, not of history size — history participates only
through a keyed (band, bucket) equi-join against the accumulated band
store, and the store holds signatures/buckets (128 longs + 32 rows per
admitted doc), never raw text. If per-batch time grew with batch index,
the pattern would be unusable for continuous 100 TB ingestion.

Usage:
  PYTHONPATH=/root/repo python tools/stream_scale_bench.py
      [--scale 4] [--batch-size 2000] [--out BENCH_STREAM_SCALING.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import time

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=4)
    ap.add_argument("--batch-size", type=int, default=2000)
    ap.add_argument(
        "--out", default=os.path.join(REPO, "BENCH_STREAM_SCALING.json")
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from tools.scale_bench import build_scale

    sf_dir = build_scale(args.scale)
    docs_p = os.path.join(sf_dir, "documents.parquet")
    ids = [
        r[0]
        for r in duckdb.sql(
            f"SELECT doc_id FROM '{docs_p}' ORDER BY doc_id"
        ).fetchall()
    ]
    n_batches = -(-len(ids) // args.batch_size)
    bounds = [
        (
            ids[b * args.batch_size],
            ids[min((b + 1) * args.batch_size, len(ids)) - 1],
        )
        for b in range(n_batches)
    ]

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .appName("stream-scale-bench")
        .getOrCreate()
    )

    from luxo_rs_spark.streaming.neardup_ingest import NearDupIngest

    store = os.path.join(REPO, ".scaledata", f"ingest_store_x{args.scale}")
    shutil.rmtree(store, ignore_errors=True)
    ingest = NearDupIngest(store, threshold=0.7)
    docs = spark.read.parquet(docs_p)

    def du(path: str) -> int:
        total = 0
        for root, _dirs, files in os.walk(path):
            total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
        return total

    batches = []
    for b, (lo, hi) in enumerate(bounds):
        batch = docs.filter(
            (docs.doc_id >= lo) & (docs.doc_id <= hi)
        )
        t0 = time.perf_counter()
        ingest.process_batch(batch, b)
        sec = time.perf_counter() - t0
        try:
            n_admitted = ingest.admitted(spark).count()
        except ValueError:
            n_admitted = 0
        row = {
            "batch": b,
            "docs_in": len(
                ids[b * args.batch_size : (b + 1) * args.batch_size]
            ),
            "sec": round(sec, 3),
            "admitted_total": n_admitted,
            "store_bytes": du(store),
        }
        batches.append(row)
        print(row, flush=True)

    secs = [r["sec"] for r in batches]
    # flatness: mean of the last 3 batches vs batches 1..3 (batch 0 has
    # no history join and JVM warmup makes it unrepresentative)
    early = sum(secs[1:4]) / len(secs[1:4])
    late = sum(secs[-3:]) / 3
    out = {
        "scale": args.scale,
        "batch_size": args.batch_size,
        "n_batches": n_batches,
        "batches": batches,
        "early_mean_sec": round(early, 3),
        "late_mean_sec": round(late, 3),
        "late_over_early": round(late / early, 3),
    }
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps({k: out[k] for k in ("early_mean_sec", "late_mean_sec", "late_over_early")}))


if __name__ == "__main__":
    main()
