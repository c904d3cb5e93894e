"""Custom Python Data Source (Spark 4 DataSource API): a deterministic
synthetic-events generator, registered as format "synthetic_events".

This is the Spark-4-native answer to "write a connector in Python" —
the reference's ingest side is a Kafka consumer [REF?, SURVEY.md §1.1];
a production twin of this class would wrap any system with a Python
client. The key scale property is partition-parallel reads: the
planner calls partitions() once on the driver, then each executor
reads ONLY its InputPartition — generation (or fetching) never funnels
through the driver.

Determinism contract: row content is a pure function of (event_id), so
any partitioning yields the same relation — asserted in
tests/test_python_source.py by reading with different partition counts.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

EVENT_TYPES = ("click", "view", "purchase", "signup", "error")

SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


def _row(i: int):
    # Pure function of i — cheap multiplicative hashing, stable across
    # partitionings and runs (no RNG state).
    h = (i * 2654435761) % (1 << 32)
    return (
        i,
        h % 1000,
        EVENT_TYPES[h % len(EVENT_TYPES)],
        round((h % 100_000) / 100.0, 2),
    )


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 4))

    def partitions(self):
        p = max(1, min(self.n_parts, self.n_rows))
        bounds = [round(i * self.n_rows / p) for i in range(p + 1)]
        return [_Range(a, b) for a, b in zip(bounds, bounds[1:])]

    def read(self, partition: _Range):
        for i in range(partition.start, partition.end):
            yield _row(i)


class SyntheticEventsSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self):
        return SCHEMA

    def reader(self, schema):
        return SyntheticEventsReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(SyntheticEventsSource)


# ---------------------------------------------------------------------------
# Write side (Spark 4 DataSourceWriter): a JSON-lines directory sink
# with MANIFEST-COMMIT atomicity — executors write uniquely-named data
# files and return commit messages; only the driver's commit() makes
# them visible by writing the manifest. A failed/aborted write leaves
# data files orphaned but NEVER manifested, so readers (which resolve
# the manifest, not the directory listing) see all-or-nothing — the
# same protocol every lake table format builds on.
#
# Commits are VERSIONED SNAPSHOTS (the Delta/Iceberg log model, which
# this sink is the environment-blocked stand-in for — SURVEY §7.3):
# every commit writes an immutable _MANIFEST.v{N}.json whose file set
# is previous-snapshot ∪ new files under mode("append") or just the
# new files under mode("overwrite"), then atomically repoints the
# latest-pointer _MANIFEST.json via os.replace. manifest_files(path,
# version=N) is TIME TRAVEL: readers resolve any retained snapshot,
# and a snapshot's file list never mutates after commit.
# ---------------------------------------------------------------------------

import dataclasses

from pyspark.sql.datasource import DataSourceArrowWriter, WriterCommitMessage


@dataclasses.dataclass
class _FileCommit(WriterCommitMessage):
    file: str
    rows: int
    # per-column [min, max] ZONE MAP for this file (numeric + string
    # columns, None-safe) — the data-skipping statistic every lake
    # format stores per file so readers can prune files from the
    # manifest alone, without opening them
    stats: dict | None = None


class JsonlDirWriter(DataSourceArrowWriter):
    def __init__(self, options, overwrite: bool = True):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_dir sink requires option 'path'")
        self.fail = options.get("simulate_failure", "false") == "true"
        self.overwrite = overwrite
        # Optional stream-writer provenance: a foreachBatch CDC caller
        # stamps the micro-batch id into the snapshot so a REPLAYED
        # batch (at-least-once delivery after a crash between manifest
        # commit and checkpoint commit) is detectable and skippable —
        # the idempotence hook of every lake-format streaming sink.
        bid = options.get("batch_id")
        self.batch_id = int(bid) if bid is not None else None

    def write(self, iterator):
        """Arrow-batch write path (round-12, guide §4: the row-at-a-
        time form pickled every Row out of the JVM, dict-ified and
        json.dumps'ed it one row at a time, and updated the zone map
        with a per-row Python loop — measured 10.4 s for one 600 k-row
        snapshot, the dominant cost of every CDC/manifest stream).
        Batches now cross as Arrow; to_pylist() gives the SAME
        schema-ordered dicts asDict() produced (ints/floats/strings/
        None/lists — identical json.dumps bytes), and the zone map is
        computed per column with pyarrow.compute. Stats semantics are
        unchanged: bools skipped, nulls skipped, a column with ANY
        NaN/±inf float carries no stats at all (NaN as the first value
        would freeze [lo, hi] at [NaN, NaN], which the pruner would
        read as 'nothing in range' — pruning files that DO contain
        matches; conservative absence keeps pruning honest)."""
        import json
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        fname = f"{self.path}/part-{uuid.uuid4().hex}.jsonl"
        n = 0
        lo: dict = {}
        hi: dict = {}
        nonfinite: set = set()  # columns with any NaN/inf: no stats at all
        with open(fname, "w") as f:
            for batch in iterator:
                if self.fail:
                    raise RuntimeError("simulated task failure")
                rows = batch.to_pylist()
                f.writelines(json.dumps(d) + "\n" for d in rows)
                n += len(rows)
                _arrow_stats_update(batch, lo, hi, nonfinite)
        stats = {k: [lo[k], hi[k]] for k in lo} if n else {}
        return _FileCommit(file=fname, rows=n, stats=stats)

    def commit(self, messages):
        import json
        import os

        new_files = sorted(m.file for m in messages if m is not None)
        new_rows = sum(m.rows for m in messages if m is not None)
        new_stats = {
            m.file: m.stats
            for m in messages
            if m is not None and getattr(m, "stats", None)
        }
        prev = latest_manifest(self.path)
        # .get(): manifests written by the pre-versioning sink have no
        # "version"/"rows" keys — appending to a legacy dir must not raise
        version = (prev.get("version", 0) + 1) if prev else 1
        if self.overwrite or prev is None:
            files, rows, fstats = new_files, new_rows, new_stats
        else:  # append: new snapshot = previous snapshot ∪ new files
            files = sorted(set(prev["files"]) | set(new_files))
            rows = prev.get("rows", 0) + new_rows
            fstats = {**prev.get("file_stats", {}), **new_stats}
        manifest = {
            "version": version,
            "files": files,
            "rows": rows,
            # zone maps keyed by file; "files" stays a plain path list
            # so every pre-stats consumer keeps working unchanged
            "file_stats": fstats,
        }
        if self.batch_id is not None:
            manifest["batch_id"] = self.batch_id
        # versioned snapshot gets the same tmp+os.replace dance as the
        # latest pointer: an explicit time-travel reader resolving v{N}
        # must never observe a torn/partial snapshot file
        vtmp = f"{self.path}/_MANIFEST.v{version}.json.tmp"
        with open(vtmp, "w") as f:
            json.dump(manifest, f)
        os.replace(vtmp, f"{self.path}/_MANIFEST.v{version}.json")
        # latest pointer flips atomically: a reader sees the old
        # snapshot or the new one, never a torn manifest
        tmp = f"{self.path}/_MANIFEST.json.tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, f"{self.path}/_MANIFEST.json")

    def abort(self, messages):
        import os

        for m in messages:
            if m is not None and os.path.exists(m.file):
                os.remove(m.file)


class JsonlDirSink(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jsonl_dir"

    def writer(self, schema, overwrite: bool):
        return JsonlDirWriter(self.options, overwrite=overwrite)


def _arrow_stats_update(batch, lo: dict, hi: dict, nonfinite: set) -> None:
    """Fold one Arrow RecordBatch into a running [lo, hi] zone map —
    the single implementation of the writer stats contract (bools
    skipped, nulls skipped, any NaN/±inf in a float column drops that
    column's stats entirely; only int/float/string columns carry
    stats). Shared by the jsonl_dir Python DataSource writer and the
    one-job fast_snapshot_write task function."""
    import pyarrow as pa
    import pyarrow.compute as pc

    for k, col in zip(batch.schema.names, batch.columns):
        t = col.type
        if (
            pa.types.is_boolean(t)
            or k in nonfinite
            or col.null_count == len(col)
        ):
            continue
        if pa.types.is_floating(t):
            finite = pc.is_finite(col)
            if not pc.min(finite).as_py():  # any NaN/±inf
                lo.pop(k, None)
                hi.pop(k, None)
                nonfinite.add(k)
                continue
        elif not (pa.types.is_integer(t) or pa.types.is_string(t)):
            continue
        mm = pc.min_max(col)
        bl, bh = mm["min"].as_py(), mm["max"].as_py()
        if k not in lo or bl < lo[k]:
            lo[k] = bl
        if k not in hi or bh > hi[k]:
            hi[k] = bh


def _commit_manifest(
    path: str,
    version: int,
    files: list[str],
    rows: int,
    fstats: dict,
    batch_id: int | None,
) -> None:
    """Write OVERWRITE snapshot manifest ``version`` under the exact
    jsonl_dir protocol: immutable _MANIFEST.v{N}.json history,
    tmp+os.replace atomic pointers."""
    import json
    import os

    manifest = {
        "version": version,
        "files": files,
        "rows": rows,
        "file_stats": fstats,
    }
    if batch_id is not None:
        manifest["batch_id"] = batch_id
    vtmp = f"{path}/_MANIFEST.v{version}.json.tmp"
    with open(vtmp, "w") as fh:
        json.dump(manifest, fh)
    os.replace(vtmp, f"{path}/_MANIFEST.v{version}.json")
    tmp = f"{path}/_MANIFEST.json.tmp"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, f"{path}/_MANIFEST.json")


def fast_snapshot_write(
    df,
    path: str,
    batch_id: int | None = None,
    n_files: int = 8,
    pre_persisted: bool = False,
) -> None:
    """Commit one OVERWRITE snapshot of ``df`` under the SAME
    versioned-manifest protocol as the jsonl_dir Python sink —
    identical manifest schema (version / files / rows / file_stats
    [/ batch_id], tmp+os.replace atomic pointers, immutable
    _MANIFEST.v{N}.json history) and the identical reader surface
    (schema'd spark.read.json over manifest_files()).

    Round-12 optimization (guide §4): the Python DataSource write path
    costs ~0.45 s PER SAVE even for 10 rows (per-query Python planner
    + writer workers) and ~8 s for a 600 k-row store (row-at-a-time
    serialization); the CDC/snapshot streams pay that 1-3× per
    micro-batch. This helper keeps the protocol but writes the data
    files through the JVM json writer (~0.13 s fixed, ~0.4 s at 600 k
    rows) and computes the per-file zone maps with ONE aggregation job
    keyed by spark_partition_id() — partition i maps to part-{i:05d}-*
    under the FileOutputCommitter naming contract. Stats semantics
    match the Python writer: bools skipped, nulls ignored, a column
    with any NaN/±inf in a file carries no stats for that file
    (conservative pruning). JSON value bytes may differ in
    non-semantic ways (whitespace, \\uXXXX vs raw UTF-8, float
    exponent spelling) — every reader parses, none byte-compares.

    The jsonl_dir Python DataSource itself is unchanged (it is the
    certified b_source_* surface and supports append/time-travel
    writers); this is the hot-loop twin for overwrite snapshots.

    Round-12, second pass (guide §1.2 measured: the first cut — JVM
    json write job + zone-map aggregation job over a persisted copy —
    still cost 0.3–1.4 s PER STORE PER BATCH in the fk-join stream,
    ~15 s of its 19.5 s total, nearly all fixed per-job overhead ×
    3 jobs). Now ONE job: ``mapInArrow`` tasks write their partition's
    jsonl file AND fold its zone map in the same pass (Arrow batches,
    the shared ``_arrow_stats_update``), yielding one
    (file, rows, stats) row each — the collect is bounded by
    ``n_files``, never data-sized. json.dumps per row produces the
    IDENTICAL bytes the certified Python writer emits (repr-shortest
    doubles, NaN/Infinity literals, raw UTF-8). A task retry can leave
    an orphan file not referenced by any manifest — harmless under the
    manifest-reader contract (same property as the DataSource's abort
    path leaving nothing referenced).

    ``pre_persisted``: the caller already coalesced and persisted the
    frame (and keeps using it — the fk-join emit reuse); the one-task
    write then reads the cache instead of recomputing the merge. A
    JVM-writer twin (write job + spark_partition_id zone-map job) was
    A/B'd here in round 12: it wins isolated microbenches at 600 k
    rows (1.1 s vs 4.4 s) but LOST end-to-end in the fk-join stream
    (49.7 s vs 34.9 s stream total) — the second pass over the just-
    written store and the commit-protocol renames cost more than the
    Python serialization saves at micro-batch cadence."""
    import json as _json
    import os

    os.makedirs(path, exist_ok=True)
    prev = latest_manifest(path)
    version = (prev.get("version", 0) + 1) if prev else 1
    snap = f"{path}/snap-v{version}"
    os.makedirs(snap, exist_ok=True)

    def _write_part(batches):
        import json
        import uuid

        import pyarrow as pa

        # orjson when present (round-12, guide §4.2: C-speed
        # serialization — measured ~6x on the 150 k-row CDC stores;
        # shortest-round-trip float repr, so re-parsed values are
        # identical). Per-batch fallback to json.dumps for payloads
        # orjson rejects (NaN/Infinity literals, big ints): same
        # parsed values, only whitespace/spelling differ — and no fsw
        # reader byte-compares (docstring contract).
        try:
            import orjson
        except ImportError:
            orjson = None

        fname = None
        fh = None
        n = 0
        lo: dict = {}
        hi: dict = {}
        nonfinite: set = set()
        for batch in batches:
            if batch.num_rows and fh is None:
                fname = f"{snap}/part-{uuid.uuid4().hex}.jsonl"
                fh = open(fname, "wb")
            if batch.num_rows:
                rows = batch.to_pylist()
                if orjson is not None:
                    try:
                        fh.write(
                            b"\n".join(orjson.dumps(d) for d in rows)
                            + b"\n"
                        )
                    except (TypeError, ValueError):
                        fh.writelines(
                            json.dumps(d).encode() + b"\n" for d in rows
                        )
                else:
                    fh.writelines(
                        json.dumps(d).encode() + b"\n" for d in rows
                    )
                n += len(rows)
                _arrow_stats_update(batch, lo, hi, nonfinite)
        if fh is not None:
            fh.close()
        stats = {k: [lo[k], hi[k]] for k in lo} if n else {}
        yield pa.RecordBatch.from_pylist(
            [{"file": fname or "", "rows": n, "stats": json.dumps(stats)}]
        )

    commits = df.coalesce(n_files).mapInArrow(
        _write_part, "file string, rows long, stats string"
    ).collect()
    files = sorted(c["file"] for c in commits if c["rows"])
    rows = sum(c["rows"] for c in commits)
    if not files:  # 0-row snapshot: keep >=1 schema-less empty file
        empty = f"{snap}/part-00000-empty.jsonl"
        open(empty, "w").close()
        files = [empty]
    fstats = {
        c["file"]: _json.loads(c["stats"]) for c in commits
        if c["rows"] and _json.loads(c["stats"])
    }
    _commit_manifest(path, version, files, rows, fstats, batch_id)


def snapshot_write_local(df, path: str, batch_id: int | None = None) -> None:
    """Driver-side OVERWRITE snapshot commit for GRID-BOUNDED state
    tables (streaming monitor/count snapshots whose row count is
    bounded by construction — PSI grid ≤ types×2×bins, NB buckets,
    DSIR cells, logreg profiles, bloom words: ≤ a few hundred rows at
    ANY corpus scale, the same bound that already justifies the
    *_stream readout collects). Identical manifest protocol and jsonl
    bytes as the certified Python writer (row.asDict() in schema
    order + json.dumps; same stats contract via per-row updates).

    Round-12 optimization (guide §4/§1.2): the per-batch Python
    DataSource save cost ~0.3–0.5 s of planner + worker round-trips
    even for a 10-row snapshot; complete-mode twins pay it every
    micro-batch. Collecting ≤ a few hundred rows and writing the file
    in the driver is one job (the collect — unavoidable anyway to
    surface the snapshot) and microseconds of I/O. NOT for data-sized
    tables — use fast_snapshot_write there."""
    import json
    import math
    import os
    import uuid

    rows = [r.asDict() for r in df.collect()]
    os.makedirs(path, exist_ok=True)
    prev = latest_manifest(path)
    version = (prev.get("version", 0) + 1) if prev else 1
    snap = f"{path}/snap-v{version}"
    os.makedirs(snap, exist_ok=True)
    fname = f"{snap}/part-{uuid.uuid4().hex}.jsonl"
    lo: dict = {}
    hi: dict = {}
    nonfinite: set = set()
    with open(fname, "w") as f:
        for d in rows:
            f.write(json.dumps(d) + "\n")
            for k, v in d.items():
                if v is None or isinstance(v, bool) or k in nonfinite:
                    continue
                if isinstance(v, float) and not math.isfinite(v):
                    lo.pop(k, None)
                    hi.pop(k, None)
                    nonfinite.add(k)
                    continue
                if isinstance(v, (int, float, str)):
                    if k not in lo or v < lo[k]:
                        lo[k] = v
                    if k not in hi or v > hi[k]:
                        hi[k] = v
    stats = {k: [lo[k], hi[k]] for k in lo} if rows else {}
    _commit_manifest(
        path,
        version,
        [fname],
        len(rows),
        {fname: stats} if stats else {},
        batch_id,
    )


def latest_manifest(path: str) -> dict | None:
    import json
    import os

    mf = f"{path}/_MANIFEST.json"
    if not os.path.exists(mf):
        return None
    with open(mf) as f:
        return json.load(f)


def manifest_files(path: str, version: int | None = None) -> list[str]:
    """Resolve a committed snapshot's file set (what a reader must
    use). version=None -> latest pointer; version=N -> TIME TRAVEL to
    the immutable _MANIFEST.v{N}.json snapshot."""
    import json
    import os

    if version is None:
        m = latest_manifest(path)
        return m["files"] if m else []
    mf = f"{path}/_MANIFEST.v{version}.json"
    if not os.path.exists(mf):
        raise FileNotFoundError(f"no snapshot v{version} at {path}")
    with open(mf) as f:
        return json.load(f)["files"]


def manifest_files_pruned(
    path: str,
    predicates: list[tuple[str, str, object]],
    version: int | None = None,
) -> list[str]:
    """DATA SKIPPING over the manifest's per-file zone maps: return
    only the snapshot files whose [min, max] range can possibly
    satisfy EVERY predicate — the reader-side half of the lake-format
    stats story (Delta/Iceberg file pruning, parquet row-group
    min/max skipping, one level up). A predicate is (col, op, value)
    with op in {'<', '<=', '>', '>=', '='}. Conservative by
    construction: a file with no stats (legacy manifest, all-null
    column) is always kept, so pruning can only SKIP provably-empty
    files, never drop a match — the same contract as parquet
    PushedFilters. At 100 TB the manifest read costs O(files) on the
    driver and replaces opening every file."""
    import json
    import os

    if version is None:
        m = latest_manifest(path)
    else:
        mf = f"{path}/_MANIFEST.v{version}.json"
        if not os.path.exists(mf):
            raise FileNotFoundError(f"no snapshot v{version} at {path}")
        with open(mf) as f:
            m = json.load(f)
    if not m:
        return []
    fstats = m.get("file_stats", {})

    def may_match(fname: str) -> bool:
        st = fstats.get(fname)
        if not st:
            return True
        for col, op, val in predicates:
            rng = st.get(col)
            if rng is None:
                continue
            lo, hi = rng
            # JSON round-trips stats as heterogeneous int/float/str; a
            # numeric predicate against a string column's [min, max]
            # raises TypeError in Python 3. The conservative contract
            # (never drop a possible match) means an incomparable
            # predicate must KEEP the file, not raise.
            try:
                if (
                    (op == "<" and not lo < val)
                    or (op == "<=" and not lo <= val)
                    or (op == ">" and not hi > val)
                    or (op == ">=" and not hi >= val)
                    or (op == "=" and not lo <= val <= hi)
                ):
                    return False
            except TypeError:
                continue
        return True

    return [f for f in m["files"] if may_match(f)]


def expire_snapshots(path: str, retain: int) -> dict:
    """SNAPSHOT EXPIRY / VACUUM for the versioned manifest table —
    the retention sibling of compaction (Iceberg `expire_snapshots`,
    Delta `VACUUM`): drop every versioned manifest except the newest
    ``retain``, then delete the data files NO retained snapshot
    references. Two-phase on purpose: the reachability set is computed
    from the retained manifests alone (manifest-sized driver work, no
    data scan — at 100 TB this is O(files) metadata, exactly like the
    writers), and a file is only unlinked when it is provably
    unreachable from every surviving snapshot, so time travel within
    the retention window keeps working and the latest pointer is never
    touched (it always names the newest — retained — version).
    Returns accounting: ``versions_removed`` (sorted list),
    ``files_removed``, ``files_live``."""
    import json
    import os
    import re

    versions = sorted(
        int(m.group(1))
        for f in os.listdir(path)
        if (m := re.fullmatch(r"_MANIFEST\.v(\d+)\.json", f))
    )
    if retain < 1:
        raise ValueError("retain must be >= 1 (the latest pointer's "
                         "snapshot must survive)")
    keep = set(versions[-retain:])
    live: set = set()
    for v in keep:
        with open(f"{path}/_MANIFEST.v{v}.json") as f:
            live |= set(json.load(f)["files"])
    removed_versions = [v for v in versions if v not in keep]
    for v in removed_versions:
        os.unlink(f"{path}/_MANIFEST.v{v}.json")
    files_removed = 0
    for f in sorted(os.listdir(path)):
        if f.startswith("_MANIFEST"):
            continue
        full = f"{path}/{f}"
        if full not in live:
            os.unlink(full)
            files_removed += 1
    return {
        "versions_removed": removed_versions,
        "files_removed": files_removed,
        "files_live": len(live),
    }


def manifest_diff(path: str, v_from: int, v_to: int) -> dict:
    """SNAPSHOT DIFF between two committed versions — the metadata half
    of CDC-reading a lake table (Delta CDF / Iceberg incremental scan,
    file granularity): files present in ``v_to`` but not ``v_from``
    were added, files present in ``v_from`` but not ``v_to`` were
    removed (an overwrite commit shows up as remove-all + add). Because
    snapshots are immutable file LISTS, the diff is pure set algebra
    over two manifests — O(files) driver work, no data scan — and a
    reader materializes the change by scanning ONLY the added/removed
    files, never the table."""
    added = sorted(set(manifest_files(path, v_to))
                   - set(manifest_files(path, v_from)))
    removed = sorted(set(manifest_files(path, v_from))
                     - set(manifest_files(path, v_to)))
    return {"added": added, "removed": removed}


def register_sink(spark) -> None:
    spark.dataSource.register(JsonlDirSink)
