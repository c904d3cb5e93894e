"""Snapshot expiry / VACUUM semantics over the versioned manifest
sink: retained time travel must keep working bit-for-bit, expired
versions must become unreadable, shared files must survive, and the
reachability rule must delete exactly the orphans."""

from __future__ import annotations

import json
import os
import shutil
import uuid

import pytest

from demo_segmenter_spark.sources.python_source import (
    expire_snapshots,
    manifest_diff,
    manifest_files,
    register_sink,
)


@pytest.fixture()
def table(spark):
    base = f"/tmp/dss_expire_test/{uuid.uuid4().hex[:8]}"
    tbl = f"{base}/t"
    register_sink(spark)
    for i, (lo, mode) in enumerate(
        [(0, "overwrite"), (10, "append"), (20, "overwrite"),
         (30, "append"), (40, "append")]
    ):
        df = spark.range(lo, lo + 10).selectExpr("id", "id * 2 AS v")
        df.coalesce(1).write.format("jsonl_dir").option("path", tbl).mode(
            mode
        ).save()
    yield tbl
    shutil.rmtree(base, ignore_errors=True)


def _ids(spark, tbl, version=None):
    return sorted(
        r.id
        for r in spark.read.schema("id long, v long")
        .json(manifest_files(tbl, version))
        .collect()
    )


def test_expire_keeps_retained_time_travel(spark, table):
    before_v4 = _ids(spark, table, 4)
    before_v5 = _ids(spark, table, 5)
    acct = expire_snapshots(table, retain=2)
    assert acct == {
        "versions_removed": [1, 2, 3],
        "files_removed": 2,
        "files_live": 3,
    }
    # retained snapshots read back bit-identically (v4's files are a
    # subset shared with v5 — reachability kept them)
    assert _ids(spark, table, 4) == before_v4 == list(range(20, 40))
    assert _ids(spark, table, 5) == before_v5 == list(range(20, 50))
    # latest pointer untouched and still consistent with v5
    assert _ids(spark, table) == before_v5


def test_expired_versions_unreadable_and_files_gone(spark, table):
    expire_snapshots(table, retain=2)
    for v in (1, 2, 3):
        with pytest.raises(FileNotFoundError):
            manifest_files(table, v)
    data_files = [
        f for f in os.listdir(table) if not f.startswith("_MANIFEST")
    ]
    assert len(data_files) == 3
    live = set(manifest_files(table, 5))
    assert {f"{table}/{f}" for f in data_files} == live


def test_expire_is_idempotent_and_retain_validates(spark, table):
    expire_snapshots(table, retain=2)
    again = expire_snapshots(table, retain=2)
    assert again == {
        "versions_removed": [],
        "files_removed": 0,
        "files_live": 3,
    }
    with pytest.raises(ValueError):
        expire_snapshots(table, retain=0)


def test_manifest_diff_appends_and_overwrites(spark, table):
    # v1(ovw) -> v2(app): exactly one file added, nothing removed, and
    # reading ONLY the added files yields exactly v2's new rows
    d12 = manifest_diff(table, 1, 2)
    assert len(d12["added"]) == 1 and d12["removed"] == []
    added_ids = sorted(
        r.id
        for r in spark.read.schema("id long, v long")
        .json(d12["added"])
        .collect()
    )
    assert added_ids == list(range(10, 20))
    # v2(app) -> v3(OVERWRITE): remove-all + add — the overwrite signature
    d23 = manifest_diff(table, 2, 3)
    assert len(d23["added"]) == 1 and len(d23["removed"]) == 2
    # a diff is antisymmetric: reversing swaps added/removed
    d32 = manifest_diff(table, 3, 2)
    assert d32["added"] == d23["removed"]
    assert d32["removed"] == d23["added"]
    # identity diff is empty
    assert manifest_diff(table, 4, 4) == {"added": [], "removed": []}


def test_retain_one_collapses_to_latest(spark, table):
    acct = expire_snapshots(table, retain=1)
    assert acct["versions_removed"] == [1, 2, 3, 4]
    assert acct["files_live"] == 3  # v5 references all three live files
    assert _ids(spark, table, 5) == list(range(20, 50))
    with open(f"{table}/_MANIFEST.json") as f:
        assert json.load(f)["version"] == 5
