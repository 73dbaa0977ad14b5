"""Materialize an sf1-scale fixture set (round-4 verdict item 2:
promote the oracle gate one decade past sf0.1).

/root/testdata is read-only and stops at sf0.1, so sf1 is DERIVED:
10 disjoint-key replicas of every sf0.1 table, written under
.scaledata/sfgen/sf1 (gitignored). The replication preserves exactly
what the correctness gate needs:

- referential integrity: fact keys (custkey, orderkey, partkey,
  suppkey, user_id) shift by k*STRIDE in lockstep, so every join path
  (orders->customer, lineitem->orders/part/supplier, events->users)
  lands inside its own replica; region/nation are FK targets shared by
  all replicas and stay verbatim;
- distribution shape: all measures, dates, categories are verbatim, so
  aggregates grow linearly and group cardinalities stay realistic;
- corpus health (same trick as tools/scale_bench.py): replica k of a
  document suffixes every word with ·rk (disjoint shingle space — the
  near-dup density stays constant instead of growing quadratic clone
  cliques; n_chars is recomputed to keep the invariant n_chars =
  length(text)); replica k of an embedding cyclically shifts the
  vector by 7k dims (norms preserved, cross-replica cosines ~0).

The oracle gate then runs the FULL query battery against this dir:

  SPARK_GRAFT_SF_DIR=$PWD/.scaledata/sfgen/sf1 \
  REPLICA_SF_DIR=$PWD/.scaledata/sfgen/sf1 \
  PYTHONPATH=$PWD python tools/replica_check.py

(SPARK_GRAFT_SF_DIR makes install_precomputed_oracles() scan the sf1
dir itself, so the md5-text-keyed and corpus-keyed VALUES oracles are
recomputed for this corpus — the mechanism is scale-agnostic.)

Usage: PYTHONPATH=/root/repo python tools/make_sf1.py [--replicas 10]
"""

from __future__ import annotations

import argparse
import os

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASE = os.environ.get("SF1_BASE_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(REPO, ".scaledata", "sfgen", "sf1")
STRIDE = 10_000_000

#: per-table replica-k SELECT template; {k} = replica index, {s} = shift
REPLICA_SQL = {
    "region": "SELECT * FROM base",  # shared dimension, one copy
    "nation": "SELECT * FROM base",  # shared dimension, one copy
    "customer": (
        "SELECT c_custkey + {off} AS c_custkey, c_name, c_nationkey,"
        " c_acctbal, c_mktsegment FROM base"
    ),
    "supplier": (
        "SELECT s_suppkey + {off} AS s_suppkey, s_name, s_nationkey,"
        " s_acctbal FROM base"
    ),
    "part": (
        "SELECT p_partkey + {off} AS p_partkey, p_name, p_brand, p_type,"
        " p_size, p_retailprice FROM base"
    ),
    "orders": (
        "SELECT o_orderkey + {off} AS o_orderkey,"
        " o_custkey + {off} AS o_custkey, o_orderstatus, o_totalprice,"
        " o_orderdate, o_orderpriority FROM base"
    ),
    "lineitem": (
        "SELECT l_orderkey + {off} AS l_orderkey,"
        " l_partkey + {off} AS l_partkey,"
        " l_suppkey + {off} AS l_suppkey, l_linenumber, l_quantity,"
        " l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,"
        " l_shipdate FROM base"
    ),
    "events": (
        "SELECT event_id + {off} AS event_id, ts,"
        " user_id + {off} AS user_id, event_type, value, props FROM base"
    ),
    "documents": (
        "SELECT doc_id + {off} AS doc_id,"
        " {text} AS text, lang, source,"
        " CAST(length({text}) AS BIGINT) AS n_chars FROM base"
    ),
    "embeddings": (
        "SELECT vec_id + {off} AS vec_id, {emb} AS embedding, label"
        " FROM base"
    ),
}


def replica_select(table: str, k: int) -> str:
    tpl = REPLICA_SQL[table]
    if k == 0:
        # replica 0 is the base corpus verbatim
        if table == "documents":
            return (
                "SELECT doc_id, text, lang, source, n_chars FROM base"
            )
        if table == "embeddings":
            return "SELECT vec_id, embedding, label FROM base"
        return tpl.format(off=0, text="text", emb="embedding")
    text = f"regexp_replace(text, '(\\S+)', '\\1·r{k}', 'g')"
    shift = (7 * k) % 64
    emb = (
        f"embedding[{shift + 1}:] || embedding[1:{shift}]"
        if shift
        else "embedding"
    )
    return tpl.format(off=k * STRIDE, text=text, emb=emb)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--out", default=OUT)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()
    tables = list(REPLICA_SQL)
    for t in tables:
        dst = os.path.join(args.out, f"{t}.parquet")
        if os.path.exists(dst):
            print(f"{t}: exists, skipped")
            continue
        con.execute(
            f"CREATE OR REPLACE VIEW base AS"
            f" SELECT * FROM '{BASE}/{t}.parquet'"
        )
        if t in ("region", "nation"):
            parts = [replica_select(t, 0)]
        else:
            parts = [
                replica_select(t, k) for k in range(args.replicas)
            ]
        con.execute(
            f"COPY ({' UNION ALL '.join(parts)}) TO '{dst}'"
            " (FORMAT PARQUET)"
        )
        n = con.sql(f"SELECT count(*) FROM '{dst}'").fetchone()[0]
        print(f"{t}: {n} rows")
    con.close()


if __name__ == "__main__":
    main()
