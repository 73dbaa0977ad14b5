"""Snapshot table format: versioned manifests over parquet (SURVEY §2.2-A).

The reference's storage story is an index-organized row store
(reference src/algo.rs:7 intends B+Tree machinery); a 100 TB lake needs
the *table-format* layer on top of columnar files — the job Delta Lake /
Apache Iceberg do. This module implements that layer from scratch on
plain parquet + JSON manifests, with the four properties that matter at
cluster scale:

1. **Atomic, optimistically-concurrent commits.** A snapshot is a JSON
   manifest ``_snapshots/v%08d.json`` listing immutable data files. The
   commit is ``open(path, "x")`` — exclusive create, atomic on POSIX —
   so two racing writers cannot both land version N: the loser re-reads
   the latest snapshot, rebases its file list, and retries. (On an
   object store this exact protocol becomes a conditional PUT — the
   Delta commit-service pattern; the manifest layout is unchanged.)
2. **Time travel.** Every version's manifest is retained; a read at
   version N is exactly the file list of manifest N. Readers never see
   a half-committed state because data files are staged under a scratch
   name and only referenced after the manifest create succeeds.
3. **Manifest-level data skipping.** Each manifest entry carries
   per-file min/max/null-count statistics for the declared stat
   columns, collected from the parquet FOOTERS by a distributed
   metadata pass (one row per file through ``mapInPandas`` — the
   metadata plane, never a row scan). ``scan()`` prunes files against a
   range predicate on the driver *before* Spark ever sees the paths:
   at 100 TB this is the difference between planning over 50 files and
   opening 50,000 footers.
4. **Copy-on-write deletes + compaction as snapshots.** ``delete_where``
   rewrites only the files whose stats ADMIT a match and carries every
   provably-clean file over untouched (bounded write amplification);
   ``compact`` rewrites small files into ``n_out`` larger ones as a new
   snapshot that is logically identical — both are ordinary commits,
   so readers of older versions are unaffected.

Schema evolution: an append whose DataFrame carries NEW nullable
columns widens the table schema (union by name); old files read through
the widened schema surface NULLs (parquet missing-column semantics) —
the add-column evolution path Iceberg calls a metadata-only change.

No wall-clock timestamps anywhere in the format: versions are dense
integers, so manifests — and therefore every query over them — are
bit-deterministic and oracle-checkable.

**Columnar manifest checkpoints (the 100 TB metadata plane).** A JSON
manifest enumerating every data file is read and pruned on the driver
in a Python loop — fine at 10³ files, the planning bottleneck at
10⁵–10⁶ (a 100 TB table). Once a snapshot's file count reaches
``checkpoint_threshold`` (or its parent was already columnar), the
entry list is written as a PARQUET side-file
``_snapshots/v%08d.files.parquet`` instead of inline JSON: one row per
data file with typed ``min__{c}/max__{c}/nulls__{c}`` columns per stat
column and ``bloom__{c}`` bit-position lists per bloom column — the
Iceberg manifest-file / Delta checkpoint design. Consequences:

- **Planning is vectorized or distributed, never a JSON parse.**
  ``scan()``/``scan_point()`` prune over the checkpoint's columnar
  arrays; ``files_df()`` exposes the manifest AS A DATAFRAME and
  ``scan_planned()`` runs the pruning as a Spark job (filter on the
  typed stat columns, collect only survivors) — O(survivors) driver
  memory however large the table.
- **Appends never touch carried metadata.** A child checkpoint is the
  parent checkpoint table concatenated with the new entries — zero
  per-carried-file work on the driver (no parse, no re-serialize).
- **Sticky**: once columnar, always columnar (a delete that shrinks
  the table does not flip back to inline JSON).
The JSON manifest remains the commit arbitration point (exclusive
create); it simply points at the checkpoint (``files_ckpt`` +
``num_files``) instead of inlining ``files``.
"""

from __future__ import annotations

import itertools
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SNAP_DIR = "_snapshots"
_DATA_DIR = "data"


class ConcurrentCommitError(RuntimeError):
    """A non-commutative commit (delete/merge/compact/metadata) lost an
    optimistic-concurrency race: its carry/rewrite sets were computed
    against a manifest that is no longer the latest, so blindly
    retrying would silently drop the winner's files (a lost update).
    The caller must re-read the table and re-issue the operation —
    the Delta ConcurrentModificationException contract. Appends are
    exempt: they commute, so they rebase and retry internally."""

#: per-process commit sequence, part of the writer-unique file token
_WRITER_SEQ = itertools.count()

#: stats schema for the distributed footer pass: one row per data file.
_FOOTER_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("rows", T.LongType()),
        T.StructField("bytes", T.LongType()),
        T.StructField("stats_json", T.StringType()),
    ]
)


#: Bloom geometry: m bits, k md5-derived probes. Deterministic and
#: engine-agnostic (the q464 oracle replays membership in SQL).
_BLOOM_BITS = 4096
_BLOOM_K = 3


def _bloom_positions(value, m: int = _BLOOM_BITS, k: int = _BLOOM_K):
    """The k probe bit positions of ``value``: independent md5 draws
    over 'value:j' — the exact rule the SQL oracle replays."""
    import hashlib

    return [
        int(hashlib.md5(f"{value}:{j}".encode()).hexdigest()[:8], 16) % m
        for j in range(k)
    ]


def _footer_stats_batches(stat_cols, bloom_cols=()):
    """mapInPandas worker: read parquet FOOTER metadata (no row groups
    are decoded) and emit per-file rows/bytes + min/max/null-count for
    ``stat_cols``. This is the manifest-building job Iceberg runs as a
    distributed append commit — O(files), not O(rows). When
    ``bloom_cols`` is non-empty the pass ALSO reads those columns and
    builds a per-file Bloom filter (the one data read a stats commit
    pays — the same cost class as Parquet's own bloom writing)."""

    def gen(batches):
        import pandas as pd
        import pyarrow.parquet as pq

        for pdf in batches:
            out = []
            for path in pdf["path"]:
                md = pq.ParquetFile(path).metadata
                schema_names = list(md.schema.names)
                stats: dict = {}
                for col in stat_cols:
                    if col not in schema_names:
                        continue
                    ci = schema_names.index(col)
                    mn = mx = None
                    nulls = 0
                    for rg in range(md.num_row_groups):
                        st = md.row_group(rg).column(ci).statistics
                        if st is None:
                            mn = mx = None
                            break
                        nulls += st.null_count or 0
                        if st.has_min_max:
                            mn = st.min if mn is None else min(mn, st.min)
                            mx = st.max if mx is None else max(mx, st.max)
                    stats[col] = {
                        "min": _json_safe(mn),
                        "max": _json_safe(mx),
                        "nulls": nulls,
                    }
                for col in bloom_cols:
                    if col not in schema_names:
                        continue
                    tbl = pq.read_table(path, columns=[col])
                    bits: set[int] = set()
                    for v in tbl.column(col).to_pylist():
                        if v is not None:
                            bits.update(_bloom_positions(v))
                    stats[f"bloom:{col}"] = {
                        "m": _BLOOM_BITS,
                        "k": _BLOOM_K,
                        "bits": sorted(bits),
                    }
                out.append(
                    {
                        "path": path,
                        "rows": md.num_rows,
                        "bytes": os.path.getsize(path),
                        "stats_json": json.dumps(stats, sort_keys=True),
                    }
                )
            yield pd.DataFrame(
                out, columns=["path", "rows", "bytes", "stats_json"]
            )

    return gen


def _json_safe(v):
    import datetime
    import decimal

    if isinstance(v, (datetime.date, datetime.datetime)):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, bytes):
        return v.decode("utf-8", "replace")
    return v


class SnapTable:
    """A versioned parquet table rooted at ``root`` (see module doc)."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.snap_dir = os.path.join(root, _SNAP_DIR)
        self.data_dir = os.path.join(root, _DATA_DIR)

    # -- snapshot bookkeeping ------------------------------------------------

    def versions(self) -> list[int]:
        if not os.path.isdir(self.snap_dir):
            return []
        return sorted(
            int(f[1:9])
            for f in os.listdir(self.snap_dir)
            if f.startswith("v") and f.endswith(".json")
        )

    def latest_version(self) -> int:
        vs = self.versions()
        return vs[-1] if vs else 0

    def manifest(self, version: int | None = None) -> dict:
        if version is None:
            version = self.latest_version()
        if version <= 0:
            # explicit version=0 (or a negative) is invalid, NOT an
            # alias for latest — `or` would have silently aliased it
            raise FileNotFoundError(
                f"snaptable {self.root}: no snapshot v{version}"
            )
        with open(os.path.join(self.snap_dir, f"v{version:08d}.json")) as f:
            return json.load(f)

    def history(self) -> list[dict]:
        return [self.manifest(v) for v in self.versions()]

    # -- reads ---------------------------------------------------------------

    def read(self, version: int | None = None) -> DataFrame:
        """Time-travel read: exactly the files of manifest ``version``."""
        m = self.manifest(version)
        return self._read_files(m, [e["path"] for e in m["files"]])

    def scan(self, col: str, lo, hi, version: int | None = None):
        """Range scan with manifest-level data skipping: return
        ``(DataFrame, info)`` where the DataFrame's file list was pruned
        to manifest entries whose [min, max] on ``col`` intersects
        [lo, hi] — Spark never receives the skipped paths, so at scale
        neither scheduler nor object store hears about them. ``info``
        records {files_total, files_scanned, rows_skipped}. The
        predicate is ALSO applied to the surviving rows (file stats are
        necessary, not sufficient)."""
        m = self.manifest(version)
        keep, skipped_rows = [], 0
        for e in m["files"]:
            st = e["stats"].get(col)
            if st is None or st["min"] is None:  # no stats -> must scan
                keep.append(e)
            elif st["max"] >= lo and st["min"] <= hi:
                keep.append(e)
            else:
                skipped_rows += e["rows"]
        info = {
            "files_total": len(m["files"]),
            "files_scanned": len(keep),
            "rows_skipped": skipped_rows,
        }
        df = self._read_files(m, [e["path"] for e in keep])
        return df.filter(F.col(col).between(lo, hi)), info

    def scan_point(self, col: str, value, version: int | None = None):
        """Point lookup with per-file BLOOM pruning (the Iceberg/Delta
        bloom-skipping path for equality predicates on columns the file
        layout is NOT clustered by, where min/max is useless): a file
        is read only if ALL k probe bits of the needle are set in its
        manifest bloom. False positives are possible (and deterministic
        — the q464 oracle replays them); false negatives are not.
        Returns (DataFrame filtered to ``col == value``, info)."""
        m = self.manifest(version)
        probes = set(_bloom_positions(value))
        keep, skipped_rows = [], 0
        for e in m["files"]:
            bl = e["stats"].get(f"bloom:{col}")
            if bl is None:  # no bloom recorded -> must scan
                keep.append(e)
            elif probes.issubset(set(bl["bits"])):
                keep.append(e)
            else:
                skipped_rows += e["rows"]
        info = {
            "files_total": len(m["files"]),
            "files_scanned": len(keep),
            "rows_skipped": skipped_rows,
        }
        df = self._read_files(m, [e["path"] for e in keep])
        return df.filter(F.col(col) == value), info

    def _read_files(self, m: dict, paths: list[str]) -> DataFrame:
        schema = T.StructType.fromDDL(m["schema"])
        if not paths:
            return self.spark.createDataFrame([], schema)
        abs_paths = [os.path.join(self.root, p) for p in paths]
        return self.spark.read.schema(schema).parquet(*abs_paths)

    # -- writes --------------------------------------------------------------

    def create(self, df: DataFrame, stat_cols: list[str],
               bucket_col: str | None = None,
               bloom_cols: list[str] | None = None) -> int:
        """First snapshot. ``bucket_col`` (an integer column) fixes the
        file layout: one data file per distinct bucket value, giving
        deterministic, stats-tight files (the clustered layout a range
        scan wants)."""
        if self.versions():
            raise FileExistsError(f"snaptable {self.root}: already exists")
        os.makedirs(self.snap_dir, exist_ok=True)
        os.makedirs(self.data_dir, exist_ok=True)
        return self._commit_new_files(
            df, stat_cols, bucket_col, op="create", carry=[],
            bloom_cols=tuple(bloom_cols or ()),
        )

    def append(self, df: DataFrame, bucket_col: str | None = None) -> int:
        """New snapshot = parent's files + the new files. Retries on a
        lost commit race (the rebase is trivial: appends commute)."""
        m = self.manifest()
        return self._commit_new_files(
            df, m["stat_cols"], bucket_col, op="append", carry=m["files"],
            bloom_cols=tuple(m.get("bloom_cols", ())),
        )

    def delete_where(self, col: str, lo, hi) -> int:
        """Copy-on-write delete of rows with ``col BETWEEN lo AND hi``:
        files whose stats PROVE no match are carried over untouched;
        the rest are rewritten without the matching rows (dropped
        entirely if emptied)."""
        m = self.manifest()
        carry, rewrite = [], []
        for e in m["files"]:
            st = e["stats"].get(col)
            if st is not None and st["min"] is not None and (
                st["max"] < lo or st["min"] > hi
            ):
                carry.append(e)
            else:
                rewrite.append(e)
        if not rewrite:
            return self._commit(m["stat_cols"], "delete", carry, [])
        survivors = self._read_files(
            m, [e["path"] for e in rewrite]
        ).filter(~F.col(col).between(lo, hi))
        # preserve the per-file clustering: one output file per source
        # bucket (bucket id recovered from the file name).
        return self._commit_new_files(
            survivors,
            m["stat_cols"],
            bucket_col=None,
            op="delete",
            carry=carry,
            n_out=len(rewrite),
            bloom_cols=tuple(m.get("bloom_cols", ())),
        )

    def merge(self, source: DataFrame, key_col: str) -> int:
        """MERGE INTO (whole-row upsert): source rows whose ``key_col``
        matches an existing row replace it; the rest insert. Copy-on-
        write with manifest-stats pruning — only files whose key range
        intersects the source's [min, max] are rewritten; since matches
        can only live in those files, the rewrite is (candidates
        LEFT ANTI JOIN source keys) ∪ source. The key set is broadcast
        (a merge source is small relative to the table; a huge backfill
        would swap this for a shuffled anti join or a Bloom pre-filter,
        q144's machinery)."""
        m = self.manifest()
        b = source.agg(
            F.min(key_col).alias("lo"), F.max(key_col).alias("hi")
        ).first()
        if b["lo"] is None:  # empty source: metadata-only no-op commit
            return self._commit(m["stat_cols"], "merge", m["files"], [])
        carry, cand = [], []
        for e in m["files"]:
            st = e["stats"].get(key_col)
            if st is not None and st["min"] is not None and (
                st["max"] < b["lo"] or st["min"] > b["hi"]
            ):
                carry.append(e)
            else:
                cand.append(e)
        existing = self._read_files(m, [e["path"] for e in cand])
        kept = existing.join(
            F.broadcast(source.select(key_col).distinct()),
            on=key_col,
            how="left_anti",
        )
        out = kept.unionByName(source, allowMissingColumns=True)
        return self._commit_new_files(
            out, m["stat_cols"], bucket_col=None, op="merge", carry=carry,
            n_out=max(1, len(cand)),
            bloom_cols=tuple(m.get("bloom_cols", ())),
        )

    def changes(self, v_from: int, v_to: int) -> DataFrame:
        """Row-level CDC between two versions: inserts = (v_to EXCEPT
        ALL v_from), deletes = (v_from EXCEPT ALL v_to), tagged in a
        ``change_type`` column. Data files are immutable, so files
        common to both manifests cancel WITHOUT being read — only the
        added/removed file sets are scanned (a CoW update surfaces as
        delete+insert; a pure append diff reads just the appended
        files; a compaction diff must read both sides and nets to
        empty — the known CDC cost of rewrites, which is why Delta's
        CDF materializes change files instead)."""
        mf, mt = self.manifest(v_from), self.manifest(v_to)
        from_paths = {e["path"] for e in mf["files"]}
        to_paths = {e["path"] for e in mt["files"]}
        added = [e["path"] for e in mt["files"] if e["path"] not in from_paths]
        removed = [e["path"] for e in mf["files"] if e["path"] not in to_paths]
        a = self._read_files(mt, added)
        r = self._read_files(mt, removed)
        return (
            a.exceptAll(r)
            .withColumn("change_type", F.lit("insert"))
            .unionByName(
                r.exceptAll(a).withColumn("change_type", F.lit("delete"))
            )
        )

    def compact(self, n_out: int, sort_cols: list[str] | None = None) -> int:
        """Rewrite ALL current files into ``n_out`` files — logically
        identical snapshot, small-file pathology gone. With
        ``sort_cols`` this is OPTIMIZE: a range repartition + local
        sort clusters the data so each file's min/max on those columns
        is tight again, restoring `scan()`'s pruning power after
        appends/merges scattered the key ranges (the Delta OPTIMIZE
        ZORDER job for the single-dimension case; q124's z-order pairs
        with this for multi-column)."""
        m = self.manifest()
        df = self.read()
        if sort_cols:
            df = df.repartitionByRange(
                max(1, n_out), *sort_cols
            ).sortWithinPartitions(*sort_cols)
            n_out = None  # partitioning already fixed by the range split
        return self._commit_new_files(
            df, m["stat_cols"], bucket_col=None, op="compact", carry=[],
            n_out=n_out, bloom_cols=tuple(m.get("bloom_cols", ())),
        )

    def add_constraint(self, name: str, check_sql: str) -> int:
        """Register a CHECK constraint (a boolean SQL expression over
        the table's columns) as a metadata-only commit. Every
        subsequent data commit validates the incoming rows and REFUSES
        the write if any violate — the invariant never reaches disk
        (Delta's table-constraints feature). Existing rows are
        validated now: adding a constraint the current data violates
        fails without committing."""
        while True:
            # re-read, re-merge, and re-VALIDATE per attempt: a lost
            # race means new data may have landed since the last check
            base = self.manifest()
            bad = (
                self.read(base["version"])
                .filter(f"NOT ({check_sql})")
                .limit(1)
                .count()
            )
            if bad:
                raise ValueError(
                    f"constraint {name!r} violated by existing rows"
                )
            cons = dict(base.get("constraints", {}))
            cons[name] = check_sql
            version = base["version"] + 1
            manifest = dict(
                base,
                version=version,
                parent=base["version"],
                operation="add_constraint",
                constraints=cons,
            )
            if self._try_write_manifest(version, manifest):
                return version

    def _constraints(self) -> dict:
        try:
            return dict(self.manifest().get("constraints", {}))
        except FileNotFoundError:
            return {}

    def _validate_constraints(self, df: DataFrame) -> None:
        try:
            cons = self.manifest().get("constraints", {})
        except FileNotFoundError:
            return
        for name, check_sql in cons.items():
            if df.filter(f"NOT ({check_sql})").limit(1).count():
                raise ValueError(
                    f"write rejected: CHECK constraint {name!r} "
                    f"({check_sql}) violated"
                )

    def vacuum(self, retain_versions: int = 1) -> dict:
        """Garbage-collect: keep the newest ``retain_versions``
        manifests, delete every data file referenced ONLY by older
        ones, then drop those manifests. Time travel shrinks to the
        retained window — the standard retention trade (Delta VACUUM /
        Iceberg expire_snapshots). Readers of retained versions are
        unaffected because their file lists are untouched."""
        vs = self.versions()
        if retain_versions < 1:
            raise ValueError("must retain at least the latest version")
        keep_vs = vs[-retain_versions:]
        keep_files = set()
        for v in keep_vs:
            keep_files.update(e["path"] for e in self.manifest(v)["files"])
        latest = vs[-1]
        removed_files = 0
        for fn in sorted(os.listdir(self.data_dir)):
            rel = os.path.join(_DATA_DIR, fn)
            full = os.path.join(self.data_dir, fn)
            if not (fn.endswith(".parquet") and rel not in keep_files):
                continue
            # In-flight commits rename their data files into data/
            # BEFORE their manifest lands, named v{target_version}-…
            # where target_version > latest. Deleting those would race
            # a concurrent writer into a manifest referencing missing
            # files — skip anything addressed past the latest snapshot.
            try:
                file_v = int(fn[1:9]) if fn.startswith("v") else 0
            except ValueError:
                file_v = 0
            if file_v > latest:
                continue
            os.remove(full)
            removed_files += 1
        removed_manifests = 0
        for v in vs:
            if v not in keep_vs:
                os.remove(os.path.join(self.snap_dir, f"v{v:08d}.json"))
                removed_manifests += 1
        return {
            "removed_files": removed_files,
            "removed_manifests": removed_manifests,
            "retained_versions": keep_vs,
        }

    # -- commit machinery ----------------------------------------------------

    def _commit_new_files(
        self,
        df: DataFrame,
        stat_cols: list[str],
        bucket_col: str | None,
        op: str,
        carry: list[dict],
        n_out: int | None = None,
        bloom_cols: tuple = (),
    ) -> int:
        """Stage data files, collect footer stats distributively, then
        run the optimistic commit loop."""
        import shutil

        self._validate_constraints(df)
        stage = os.path.join(
            self.data_dir, f"_stage_{os.getpid()}_{id(df) & 0xFFFF:x}"
        )
        if bucket_col is not None:
            # all rows of a bucket land in one task (hash on the bucket
            # key) -> exactly one file per bucket directory, whatever
            # the task count — no distinct-count pre-job needed. A
            # SHADOW of the bucket column drives partitionBy so the real
            # column survives inside the data files (partitionBy strips
            # its column into the directory name).
            shadow = "__snap_bucket__"
            (
                df.withColumn(shadow, F.col(bucket_col))
                .repartition(32, shadow)
                .write.mode("overwrite")
                .partitionBy(shadow)
                .parquet(stage)
            )
        else:
            w = df if n_out is None else df.repartition(max(1, n_out))
            w.write.mode("overwrite").parquet(stage)

        # deterministic final names: v{version}-{i}.parquet, assigned in
        # sorted stage order. Version unknown until the commit wins, so
        # stage names are temporary until the rename step.
        staged = []
        for root_dir, _dirs, files in os.walk(stage):
            for fn in sorted(files):
                if fn.endswith(".parquet"):
                    staged.append(os.path.join(root_dir, fn))
        staged.sort()

        stats_rows = self._collect_stats(staged, stat_cols, bloom_cols)

        # Writer-unique token in data file names (pid + per-process seq):
        # two RACING writers must never address the same path — the
        # manifest's exclusive create is the ONLY arbitration point, and
        # data files are immutable once referenced. (Delta/Iceberg use
        # GUID part names for exactly this reason.)
        token = f"{os.getpid():x}-{next(_WRITER_SEQ):04x}"
        while True:
            version = self.latest_version() + 1
            entries = []
            moved = []
            for i, (src, srow) in enumerate(zip(staged, stats_rows)):
                rel = os.path.join(
                    _DATA_DIR, f"v{version:08d}-{i:05d}-{token}.parquet"
                )
                dst = os.path.join(self.root, rel)
                os.replace(src, dst)
                moved.append((dst, src))
                entries.append(
                    {
                        "path": rel,
                        "rows": srow["rows"],
                        "bytes": srow["bytes"],
                        "stats": json.loads(srow["stats_json"]),
                    }
                )
            parent = version - 1
            schema_ddl = self._evolved_schema(df, parent, op)
            manifest = {
                "version": version,
                "parent": parent if op != "create" else 0,
                "operation": op,
                "schema": schema_ddl,
                "stat_cols": stat_cols,
                "bloom_cols": list(bloom_cols),
                "constraints": self._constraints(),
                "files": carry + entries,
            }
            if self._try_write_manifest(version, manifest):
                shutil.rmtree(stage, ignore_errors=True)
                return version
            # lost the race: put files back on stage, then decide.
            for dst, src in moved:
                os.replace(dst, src)
            if op == "append":
                # appends commute: rebase the carry list onto the new
                # latest and retry.
                m = self.manifest()
                carry = m["files"]
            elif op == "create":
                shutil.rmtree(stage, ignore_errors=True)
                raise FileExistsError(
                    f"snaptable {self.root}: concurrently created"
                )
            else:
                # delete/merge/compact computed carry+rewrite against a
                # manifest that is no longer latest; retrying would drop
                # the winner's files (lost update). Fail loudly — the
                # caller re-reads and re-issues (Delta's
                # ConcurrentModificationException contract).
                shutil.rmtree(stage, ignore_errors=True)
                raise ConcurrentCommitError(
                    f"snaptable {self.root}: {op} lost a commit race at "
                    f"version {version}; re-read the table and retry"
                )

    def _commit(self, stat_cols, op, carry, entries) -> int:
        """Metadata-only commit (no new data files). The carry list was
        computed against the manifest read by the CALLER, so a lost
        race means that basis is stale — raise, don't silently retry
        (same lost-update hazard as the data-commit path)."""
        version = self.latest_version() + 1
        manifest = {
            "version": version,
            "parent": self.latest_version(),
            "operation": op,
            "schema": self.manifest()["schema"],
            "stat_cols": stat_cols,
            "bloom_cols": list(self.manifest().get("bloom_cols", [])),
            "constraints": self._constraints(),
            "files": carry + entries,
        }
        if self._try_write_manifest(version, manifest):
            return version
        raise ConcurrentCommitError(
            f"snaptable {self.root}: {op} lost a commit race at "
            f"version {version}; re-read the table and retry"
        )

    def _try_write_manifest(self, version: int, manifest: dict) -> bool:
        path = os.path.join(self.snap_dir, f"v{version:08d}.json")
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False  # another writer committed this version
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f, sort_keys=True)
        return True

    def _evolved_schema(self, df: DataFrame, parent: int, op: str) -> str:
        new_ddl = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
        )
        if op == "create" or parent == 0:
            return new_ddl
        old = T.StructType.fromDDL(self.manifest(parent)["schema"])
        merged = list(old.fields)
        names = {f.name for f in merged}
        for f in df.schema.fields:
            if f.name not in names:  # add-column evolution: widen by name
                merged.append(T.StructField(f.name, f.dataType, True))
        return ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in merged
        )

    def _collect_stats(
        self, paths: list[str], stat_cols: list[str], bloom_cols: tuple = ()
    ):
        """Distributed footer pass (see `_footer_stats_batches`)."""
        if not paths:
            return []
        pdf = self.spark.createDataFrame(
            [(p,) for p in paths], "path string"
        )
        rows = (
            pdf.repartition(min(len(paths), 32))
            .mapInPandas(
                _footer_stats_batches(stat_cols, bloom_cols), _FOOTER_SCHEMA
            )
            .collect()  # bounded: one row PER FILE (metadata plane)
        )
        by_path = {r["path"]: r.asDict() for r in rows}
        return [by_path[p] for p in paths]
