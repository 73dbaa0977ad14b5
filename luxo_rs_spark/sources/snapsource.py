"""SnapTable as a Spark DataSource ("snaptable" format): the snapshot
table format (sources/snaptable.py) plugged into Spark's own reader
protocols via the Spark 4 ``pyspark.sql.datasource`` API — so a user
can say ``spark.read.format("snaptable").load(root)`` or
``spark.readStream.format("snaptable")`` instead of going through the
SnapTable class.

Three integration points:

- **Batch**: one InputPartition per manifest data file; rows are read
  executor-side with pyarrow. Time travel via ``.option("version", N)``.
- **Filter pushdown** (opt-in ``.option("pushdown", "true")``, same
  convention as synthdocs — defining pushFilters forces
  ``spark.sql.python.filterPushdown.enabled``): range/equality
  predicates on stat columns prune FILE PARTITIONS against the
  manifest min/max before Spark schedules them — manifest-level data
  skipping expressed through Spark's own pushdown protocol. Filters
  are also returned unhandled so Spark re-applies them row-level
  (pruning is an optimization, never a semantics change).
- **Streaming**: a micro-batch tail of the table where the OFFSET IS
  THE SNAPSHOT VERSION — each batch emits the rows of files ADDED
  between the committed version and the current latest (the Delta
  streaming-source shape; rewrite outputs surface like Delta's
  ignoreChanges). Offsets replay deterministically because manifests
  are retained. The Simple reader reads driver-side (fine at
  micro-batch granularity; the partition-parallel variant would ship
  one file per InputPartition exactly like the batch reader).
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

_SNAP_DIR = "_snapshots"


def _versions(root: str) -> list[int]:
    snap = os.path.join(root, _SNAP_DIR)
    if not os.path.isdir(snap):
        return []
    return sorted(
        int(f[1:9])
        for f in os.listdir(snap)
        if f.startswith("v") and f.endswith(".json")
    )


def _manifest(root: str, version: int | None = None) -> dict:
    vs = _versions(root)
    v = version if version is not None else (vs[-1] if vs else 0)
    if v <= 0:
        raise FileNotFoundError(f"snaptable {root}: no snapshot v{v}")
    with open(os.path.join(root, _SNAP_DIR, f"v{v:08d}.json")) as f:
        return json.load(f)


def _entry_paths(root: str, m: dict) -> list[str]:
    """Data-file paths of a manifest — reads just the ``path`` column
    of the columnar checkpoint when the manifest is checkpointed."""
    if "files_ckpt" not in m:
        return [e["path"] for e in m["files"]]
    import pyarrow.parquet as pq

    return (
        pq.read_table(
            os.path.join(root, m["files_ckpt"]), columns=["path"]
        )
        .column("path")
        .to_pylist()
    )


def _prune_paths(root: str, m: dict, bounds: dict) -> list[str]:
    """File paths surviving {col: [lo, hi]} range bounds (either end
    may be None). Inline manifests walk the dict list; columnar ones
    compare the checkpoint's typed min__/max__ arrays — no JSON parse
    however many files the table has (mirrors SnapTable._prune_range,
    restated here because the DataSource face must stay importable
    without the SnapTable class)."""
    if "files_ckpt" not in m:
        keep = []
        for e in m["files"]:
            ok = True
            for col, (lo, hi) in bounds.items():
                st = e["stats"].get(col)
                if st is None or st["min"] is None:
                    continue  # no stats: cannot prune
                if (hi is not None and st["min"] > hi) or (
                    lo is not None and st["max"] < lo
                ):
                    ok = False
                    break
            if ok:
                keep.append(e["path"])
        return keep
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    tbl = pq.read_table(os.path.join(root, m["files_ckpt"]))
    names = set(tbl.column_names)
    mask = None
    for col, (lo, hi) in bounds.items():
        if f"min__{col}" not in names:
            continue
        mn, mx = tbl.column(f"min__{col}"), tbl.column(f"max__{col}")
        ok = pc.is_null(mn)
        inb = None
        if hi is not None:
            inb = pc.less_equal(mn, hi)
        if lo is not None:
            ge = pc.greater_equal(mx, lo)
            inb = ge if inb is None else pc.and_(inb, ge)
        if inb is not None:
            ok = pc.or_kleene(ok, inb)
        ok = pc.fill_null(ok, False)
        mask = ok if mask is None else pc.and_(mask, ok)
    if mask is None:
        return tbl.column("path").to_pylist()
    return tbl.filter(mask).column("path").to_pylist()


def _entries(root: str, m: dict) -> list[dict]:
    """Entry dicts (path/rows/stats) for any manifest representation."""
    if "files_ckpt" not in m:
        return m["files"]
    import pyarrow.parquet as pq

    tbl = pq.read_table(os.path.join(root, m["files_ckpt"]))
    paths = tbl.column("path").to_pylist()
    rows = tbl.column("rows").to_pylist()
    stats = tbl.column("stats_json").to_pylist()
    return [
        {"path": p, "rows": r, "stats": json.loads(s)}
        for p, r, s in zip(paths, rows, stats)
    ]


def _dv_map(root: str, m: dict) -> dict:
    """{data path -> deletion-vector rel path} (see snaptable.py)."""
    if "files_ckpt" not in m:
        return {e["path"]: e["dv"] for e in m["files"] if e.get("dv")}
    import pyarrow.parquet as pq

    tbl = pq.read_table(os.path.join(root, m["files_ckpt"]))
    if "dv" not in tbl.column_names:
        return {}
    return {
        p: d
        for p, d in zip(
            tbl.column("path").to_pylist(), tbl.column("dv").to_pylist()
        )
        if d
    }


def _dv_positions(root: str, dv_rel: str, fname: str) -> set:
    """Deleted row positions recorded for one data file."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    tbl = pq.read_table(os.path.join(root, dv_rel))
    hit = tbl.filter(pc.equal(tbl.column("fname"), fname))
    return set(hit.column("pos").to_pylist())


def _phys_names(m: dict, names: list[str]) -> list[str]:
    """Logical -> physical column translation (column mapping): data
    files store PHYSICAL names; manifests carry the mapping."""
    mapping = {f["name"]: f["physical"] for f in m.get("fields", [])}
    return [mapping.get(n, n) for n in names]


def _file_rows(
    root: str, rel_path: str, field_names: list[str],
    dv_rel: str | None = None,
):
    """Read one data file (pyarrow, executor- or driver-side) and yield
    tuples aligned to the table schema — absent columns (older files
    under add-column evolution) fill with None; rows whose position is
    recorded in the file's deletion vector are skipped (merge-on-read)."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(os.path.join(root, rel_path))
    dead = (
        _dv_positions(root, dv_rel, os.path.basename(rel_path))
        if dv_rel
        else None
    )
    cols = {}
    n = tbl.num_rows
    for name in field_names:
        if name in tbl.column_names:
            cols[name] = tbl.column(name).to_pylist()
        else:
            cols[name] = [None] * n
    for i in range(n):
        if dead and i in dead:
            continue
        yield tuple(cols[name][i] for name in field_names)


class _FilePartition(InputPartition):
    def __init__(self, rel_path: str, dv_rel: str | None = None):
        self.rel_path = rel_path
        self.dv_rel = dv_rel


class _SnapTableReader(DataSourceReader):
    def __init__(self, options, schema: StructType):
        self.root = options["path"]
        self.version = (
            int(options["version"]) if options.get("version") else None
        )
        self.field_names = _phys_names(
            _manifest(self.root, self.version),
            [f.name for f in schema.fields],
        )
        self.manifest = _manifest(self.root, self.version)
        self._entry_list = _entry_paths(self.root, self.manifest)
        self._dv = _dv_map(self.root, self.manifest)

    def partitions(self):
        return [
            _FilePartition(p, self._dv.get(p)) for p in self._entry_list
        ] or [_FilePartition("")]

    def read(self, partition: _FilePartition):
        if not partition.rel_path:
            return iter(())
        return _file_rows(
            self.root, partition.rel_path, self.field_names,
            getattr(partition, "dv_rel", None),
        )


class _SnapTablePushdownReader(_SnapTableReader):
    """Manifest data skipping through Spark's pushFilters protocol:
    stat-column constraints drop file partitions before scheduling."""

    def pushFilters(self, filters):
        bounds: dict[str, list] = {}  # col -> [lo, hi]
        for f in filters:
            if isinstance(
                f, (EqualTo, GreaterThan, GreaterThanOrEqual,
                    LessThan, LessThanOrEqual)
            ) and len(f.attribute) == 1 and isinstance(
                f.value, (int, str)
            ):
                col = f.attribute[0]
                b = bounds.setdefault(col, [None, None])
                if isinstance(f, EqualTo):
                    b[0] = f.value if b[0] is None else max(b[0], f.value)
                    b[1] = f.value if b[1] is None else min(b[1], f.value)
                elif isinstance(f, (GreaterThan, GreaterThanOrEqual)):
                    b[0] = f.value if b[0] is None else max(b[0], f.value)
                else:
                    b[1] = f.value if b[1] is None else min(b[1], f.value)
            yield f  # always re-applied by Spark: pruning only

        # filters arrive on LOGICAL names; stats are keyed PHYSICAL
        # (column mapping) — translate, dropping bounds on columns the
        # manifest cannot resolve (no pruning, never wrong pruning)
        mapping = {
            fld["name"]: fld["physical"]
            for fld in self.manifest.get("fields", [])
        }
        bounds = {
            mapping.get(col, col): b for col, b in bounds.items()
        }
        self._entry_list = _prune_paths(self.root, self.manifest, bounds)


class _SnapTableStreamReader(SimpleDataSourceStreamReader):
    """Tail the table: offset = snapshot version; a batch is the rows
    of files ADDED between two versions. With
    ``.option("skipChangeCommits", "true")`` (the Delta option of the
    same name) rewrite commits — compact/OPTIMIZE/delete/merge — are
    SKIPPED instead of re-delivered: the batch walks version-by-version
    and emits only files added by create/append commits, so a
    mid-stream OPTIMIZE neither duplicates rows nor stalls the tail and
    every appended row is delivered exactly once."""

    def __init__(self, options, schema: StructType):
        self.root = options["path"]
        self.field_names = [f.name for f in schema.fields]
        self.skip_change = (
            str(options.get("skipchangecommits", "")).lower() == "true"
        )

    def initialOffset(self):
        return {"v": 0}

    def _added_rows(self, v_from: int, v_to: int):
        if v_to <= v_from:
            return iter(())
        rows = []  # materialized: Spark copy.copy()s the iterator,
        # so it must be list-backed (same as the synthdocs reader)
        if not self.skip_change:
            old = (
                set(_entry_paths(self.root, _manifest(self.root, v_from)))
                if v_from > 0
                else set()
            )
            m_to = _manifest(self.root, v_to)
            new = _entry_paths(self.root, m_to)
            names = _phys_names(m_to, self.field_names)
            for p in new:
                if p not in old:
                    rows.extend(_file_rows(self.root, p, names))
            return iter(rows)
        prev_paths = (
            set(_entry_paths(self.root, _manifest(self.root, v_from)))
            if v_from > 0
            else set()
        )
        for v in range(max(v_from, 0) + 1, v_to + 1):
            m = _manifest(self.root, v)
            cur_paths = set(_entry_paths(self.root, m))
            if m["operation"] in ("create", "append"):
                names = _phys_names(m, self.field_names)
                for p in _entry_paths(self.root, m):
                    if p not in prev_paths:
                        rows.extend(_file_rows(self.root, p, names))
            prev_paths = cur_paths
        return iter(rows)

    def read(self, start):
        vs = _versions(self.root)
        cur = vs[-1] if vs else 0
        return self._added_rows(start["v"], cur), {"v": cur}

    def readBetweenOffsets(self, start, end):
        # deterministic replay: manifests are retained, so the same
        # version pair always yields the same added-file rows
        return self._added_rows(start["v"], end["v"])


class _SnapTableCDFStreamReader(SimpleDataSourceStreamReader):
    """Change-feed tail (``.option("readChangeFeed", "true")`` — the
    Delta CDF shape): each micro-batch is the ROW-LEVEL diff between
    the committed version and the current latest, every row tagged
    ``change_type`` 'insert' or 'delete' (a CoW update surfaces as the
    delete+insert pair). The diff is a multiset subtraction over only
    the added/removed files — immutable common files cancel unread."""

    def __init__(self, options, schema: StructType):
        self.root = options["path"]
        # schema = (change_type, *table columns)
        self.field_names = [f.name for f in schema.fields[1:]]

    def initialOffset(self):
        return {"v": 0}

    @staticmethod
    def _freeze(v):
        """Hashable stand-in for a row value: pyarrow's to_pylist()
        yields Python lists for array columns and dicts for maps —
        unhashable, so they cannot key the multiset Counter directly.
        Tag-wrapped so thaw is unambiguous (a genuine 2-tuple value in
        the data can never collide with the tags)."""
        if isinstance(v, list):
            return ("__snap_list__", tuple(
                _SnapTableCDFStreamReader._freeze(x) for x in v
            ))
        if isinstance(v, dict):
            return ("__snap_map__", tuple(sorted(
                (k, _SnapTableCDFStreamReader._freeze(x))
                for k, x in v.items()
            )))
        if isinstance(v, tuple):
            # pyarrow renders MAP cells as list-of-(key, value) tuples;
            # a tuple may therefore nest further lists — recurse.
            return tuple(_SnapTableCDFStreamReader._freeze(x) for x in v)
        return v

    @staticmethod
    def _thaw(v):
        if isinstance(v, tuple) and len(v) == 2 and v[0] == "__snap_list__":
            return [_SnapTableCDFStreamReader._thaw(x) for x in v[1]]
        if isinstance(v, tuple) and len(v) == 2 and v[0] == "__snap_map__":
            return {k: _SnapTableCDFStreamReader._thaw(x) for k, x in v[1]}
        if isinstance(v, tuple):
            return tuple(_SnapTableCDFStreamReader._thaw(x) for x in v)
        return v

    def _diff_rows(self, v_from: int, v_to: int):
        from collections import Counter

        if v_to <= v_from:
            return iter([])
        m_to = _manifest(self.root, v_to)
        new_entries = _entry_paths(self.root, m_to)
        names = _phys_names(m_to, self.field_names)
        old_entries = (
            _entry_paths(self.root, _manifest(self.root, v_from))
            if v_from > 0
            else []
        )
        new_paths = set(new_entries)
        old_paths = set(old_entries)
        freeze, thaw = self._freeze, self._thaw

        def rows_of(entries, skip):
            c: Counter = Counter()
            for p in entries:
                if p not in skip:
                    for r in _file_rows(self.root, p, names):
                        c[tuple(freeze(v) for v in r)] += 1
            return c

        added = rows_of(new_entries, old_paths)
        removed = rows_of(old_entries, new_paths)
        out = []
        for r, n in (added - removed).items():
            out.extend([("insert",) + tuple(thaw(v) for v in r)] * n)
        for r, n in (removed - added).items():
            out.extend([("delete",) + tuple(thaw(v) for v in r)] * n)
        return iter(out)

    def read(self, start):
        vs = _versions(self.root)
        cur = vs[-1] if vs else 0
        return self._diff_rows(start["v"], cur), {"v": cur}

    def readBetweenOffsets(self, start, end):
        return self._diff_rows(start["v"], end["v"])


class SnapTableDataSource(DataSource):
    """spark.read.format("snaptable").load(root)
    [.option("version", N)] [.option("pushdown", "true")];
    spark.readStream.format("snaptable").load(root)"""

    @classmethod
    def name(cls):
        return "snaptable"

    def _cdf(self) -> bool:
        return str(
            self.options.get("readchangefeed", "")
        ).lower() == "true"

    def schema(self):
        m = _manifest(
            self.options["path"],
            int(self.options["version"])
            if self.options.get("version")
            else None,
        )
        if self._cdf():
            return "change_type string, " + m["schema"]
        return m["schema"]

    def reader(self, schema):
        if str(self.options.get("pushdown", "")).lower() == "true":
            return _SnapTablePushdownReader(self.options, schema)
        return _SnapTableReader(self.options, schema)

    def simpleStreamReader(self, schema):
        if self._cdf():
            return _SnapTableCDFStreamReader(self.options, schema)
        return _SnapTableStreamReader(self.options, schema)


def register(spark) -> None:
    """Idempotently register the snaptable source on a session."""
    spark.dataSource.register(SnapTableDataSource)
