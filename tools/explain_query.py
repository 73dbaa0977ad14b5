"""Capture .explain('formatted') for named queries into plans/r10/.

Usage:
    PYTHONPATH=/root/repo python3 tools/explain_query.py <suffix> <query_substr> [...]

Writes plans/r10/<query>_<suffix>.txt for every registry query whose name
contains any of the given substrings. The session mirrors bench.py
(Engine defaults, local[$SPARK_GRAFT_CPUS], shuffle.partitions = cpus) so
the captured plan is the one the bench executes. Queries that do eager
driver-side work during construction (lifecycle lanes) still produce the
plan of their final returned frame.
"""

from __future__ import annotations

import os
import sys


def main() -> int:
    suffix = sys.argv[1]
    pats = sys.argv[2:]
    out_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "plans", "r10"
    )
    os.makedirs(out_dir, exist_ok=True)

    from luxo_rs_spark.engine import Engine
    from luxo_rs_spark.plans.queries import QUERIES

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    engine = Engine(
        app_name="explain-capture",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_confs={"spark.ui.enabled": "false"},
    )
    names = [n for n in sorted(QUERIES) if any(p in n for p in pats)]
    for name in names:
        df = QUERIES[name](engine.spark, sf_dir)
        plan = engine.explain_str(df, "formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    engine.spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
