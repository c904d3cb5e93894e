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

from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage


@dataclasses.dataclass
class _FileCommit(WriterCommitMessage):
    file: str
    rows: int


class JsonlDirWriter(DataSourceWriter):
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
        import json
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        fname = f"{self.path}/part-{uuid.uuid4().hex}.jsonl"
        n = 0
        with open(fname, "w") as f:
            for row in iterator:
                if self.fail:
                    raise RuntimeError("simulated task failure")
                f.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _FileCommit(file=fname, rows=n)

    def commit(self, messages):
        import json
        import os

        new_files = sorted(m.file for m in messages if m is not None)
        new_rows = sum(m.rows for m in messages if m is not None)
        prev = latest_manifest(self.path)
        # .get(): manifests written by the pre-versioning sink have no
        # "version"/"rows" keys — appending to a legacy dir must not raise
        version = (prev.get("version", 0) + 1) if prev else 1
        if self.overwrite or prev is None:
            files, rows = new_files, new_rows
        else:  # append: new snapshot = previous snapshot ∪ new files
            files = sorted(set(prev["files"]) | set(new_files))
            rows = prev.get("rows", 0) + new_rows
        manifest = {"version": version, "files": files, "rows": rows}
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


def register_sink(spark) -> None:
    spark.dataSource.register(JsonlDirSink)
