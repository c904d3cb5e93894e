"""Spark 4 custom Python Data Source: partition-parallel deterministic
ingest via sources/python_source.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from demo_segmenter_spark.sources.python_source import register


def _read(spark, rows, parts):
    register(spark)
    return (
        spark.read.format("synthetic_events")
        .option("rows", rows)
        .option("partitions", parts)
        .load()
    )


def test_reads_expected_rows_and_schema(spark):
    df = _read(spark, 500, 4)
    assert df.columns == ["event_id", "user_id", "event_type", "value"]
    assert df.count() == 500
    assert df.select("event_id").distinct().count() == 500


def test_partitioning_does_not_change_relation(spark):
    # Content is a pure function of event_id: 2 partitions and 7
    # partitions must produce the identical relation.
    a = _read(spark, 300, 2)
    b = _read(spark, 300, 7)
    assert a.rdd.getNumPartitions() == 2
    assert b.rdd.getNumPartitions() == 7
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_composes_with_engine_operators(spark):
    # The custom source is a first-class relation: aggregate it.
    agg = (
        _read(spark, 1000, 4)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
    )
    rows = {r["event_type"]: r["n"] for r in agg.collect()}
    assert sum(rows.values()) == 1000
    assert set(rows) <= {"click", "view", "purchase", "signup", "error"}


def _sink_dir(tag):
    import hashlib
    import os
    import shutil

    d = f"/tmp/dss_pysink/{hashlib.md5(tag.encode()).hexdigest()[:8]}"
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    return d


def test_python_sink_round_trip(spark):
    from demo_segmenter_spark.sources.python_source import (
        manifest_files,
        register_sink,
    )

    register_sink(spark)
    d = _sink_dir("roundtrip")
    src = _read(spark, 400, 4)
    src.write.format("jsonl_dir").option("path", d).mode("append").save()
    files = manifest_files(d)
    assert files, "no manifest written"
    back = spark.read.schema(src.schema).json(files)
    assert back.count() == 400
    assert back.exceptAll(src).count() == 0 and src.exceptAll(back).count() == 0


def test_python_sink_failure_leaves_no_manifest(spark):
    import pytest as _pytest

    from demo_segmenter_spark.sources.python_source import (
        manifest_files,
        register_sink,
    )

    register_sink(spark)
    d = _sink_dir("failure")
    src = _read(spark, 100, 2)
    with _pytest.raises(Exception):
        (
            src.write.format("jsonl_dir")
            .option("path", d)
            .option("simulate_failure", "true")
            .mode("append")
            .save()
        )
    # atomicity: the failed write is invisible to manifest readers
    assert manifest_files(d) == []


def test_append_onto_legacy_unversioned_manifest(spark):
    # Round-6 ADVICE: manifests written by the pre-versioning sink have
    # no "version"/"rows" keys — appending onto such a directory must
    # not KeyError, and the legacy snapshot's files must survive into
    # the new versioned one.
    import json

    from demo_segmenter_spark.sources.python_source import (
        latest_manifest,
        manifest_files,
        register_sink,
    )

    register_sink(spark)
    d = _sink_dir("legacy")
    # fabricate a legacy sink dir: data file + version-less manifest
    legacy_file = f"{d}/part-legacy.jsonl"
    with open(legacy_file, "w") as f:
        f.write('{"event_id": -1, "user_id": 0, "event_type": "view", "value": 1.0}\n')
    with open(f"{d}/_MANIFEST.json", "w") as f:
        json.dump({"files": [legacy_file]}, f)  # NO version / rows keys

    src = _read(spark, 40, 2)
    src.write.format("jsonl_dir").option("path", d).mode("append").save()
    m = latest_manifest(d)
    assert m["version"] == 1  # legacy treated as v0
    files = manifest_files(d)
    assert legacy_file in files and len(files) >= 2
    back = spark.read.schema(src.schema).json(files)
    assert back.count() == 41  # legacy row + 40 appended


def test_manifest_snapshots_time_travel(spark):
    # Versioned-snapshot commits (the Delta/Iceberg log model on the
    # manifest protocol): overwrite -> v1, append -> v2 = v1 ∪ new,
    # overwrite -> v3 = new only. Every retained snapshot stays
    # readable (time travel), the latest pointer tracks v3, and a
    # FAILED append between snapshots must not mint a version.
    import uuid

    import pytest

    from demo_segmenter_spark.sources.python_source import (
        latest_manifest,
        manifest_files,
        register,
        register_sink,
    )

    register(spark)
    register_sink(spark)
    d = f"/tmp/dss_sink/tt_{uuid.uuid4().hex[:8]}"

    def write(rows, mode, **opts):
        src = spark.read.format("synthetic_events").option("rows", rows).load()
        w = src.write.format("jsonl_dir").option("path", d)
        for k, v in opts.items():
            w = w.option(k, v)
        w.mode(mode).save()

    write(100, "overwrite")
    write(50, "append")
    write(20, "overwrite")
    try:
        write(10, "append", simulate_failure="true")
    except Exception:
        pass
    assert latest_manifest(d)["version"] == 3  # failed write minted nothing

    def n_rows(version=None):
        return (
            spark.read.json(manifest_files(d, version=version))
            .count()
        )

    assert n_rows(version=1) == 100
    assert n_rows(version=2) == 150  # append stacked on v1
    assert n_rows(version=3) == 20   # overwrite replaced the set
    assert n_rows() == 20            # latest pointer -> v3
    with pytest.raises(FileNotFoundError):
        manifest_files(d, version=9)


def test_manifest_zone_map_pruning(spark):
    # Data skipping: files written from range-partitioned tasks carry
    # disjoint per-file [min,max] event_id zone maps in the manifest;
    # a range predicate must (a) prune files and (b) lose no rows vs
    # the unpruned read + filter.
    import uuid

    from demo_segmenter_spark.sources.python_source import (
        latest_manifest,
        manifest_files,
        manifest_files_pruned,
        register,
        register_sink,
    )

    register(spark)
    register_sink(spark)
    d = f"/tmp/dss_sink/zm_{uuid.uuid4().hex[:8]}"
    src = (
        spark.read.format("synthetic_events").option("rows", 1000).load()
        .repartitionByRange(8, "event_id")
    )
    src.write.format("jsonl_dir").option("path", d).mode("overwrite").save()

    m = latest_manifest(d)
    assert len(m["files"]) == 8
    assert len(m["file_stats"]) == 8  # every file has a zone map

    all_files = manifest_files(d)
    kept = manifest_files_pruned(d, [("event_id", ">=", 900)])
    assert len(kept) < len(all_files), "predicate should prune files"

    full = (
        spark.read.json(all_files).filter("event_id >= 900").count()
    )
    pruned = (
        spark.read.json(kept).filter("event_id >= 900").count()
    )
    assert pruned == full == 100

    # equality + band predicates, and the conservative no-stats path
    assert len(manifest_files_pruned(d, [("event_id", "=", 5)])) == 1
    band = manifest_files_pruned(
        d, [("event_id", ">=", 200), ("event_id", "<", 300)]
    )
    assert spark.read.json(band).filter(
        "event_id >= 200 and event_id < 300"
    ).count() == 100
    # unknown column never prunes
    assert manifest_files_pruned(d, [("nope", ">=", 1)]) == all_files


def test_zone_map_nan_column_gets_no_stats(spark):
    # A column containing any non-finite float must carry NO zone map at
    # all (NaN-poisoned [NaN, NaN] stats would make the pruner drop
    # files that DO contain matches — the never-drop-a-match contract),
    # and the manifest must stay strict JSON (no bare NaN literal).
    import json
    import math
    import uuid

    from demo_segmenter_spark.sources.python_source import (
        latest_manifest,
        manifest_files,
        manifest_files_pruned,
        register_sink,
    )

    register_sink(spark)
    d = f"/tmp/dss_sink/nan_{uuid.uuid4().hex[:8]}"
    rows = [
        # NaN FIRST in the partition — the historical poisoning order
        (1, float("nan"), 5.0),
        (2, 3.5, 6.0),
        (3, 9.5, float("inf")),
        (4, 1.5, 7.0),
    ]
    df = spark.createDataFrame(
        rows, "id long, bad double, also_bad double"
    ).coalesce(1)
    df.write.format("jsonl_dir").option("path", d).mode("overwrite").save()

    m = latest_manifest(d)
    (stats,) = m["file_stats"].values()
    assert "bad" not in stats and "also_bad" not in stats
    assert stats["id"] == [1, 4]
    # strict JSON round-trip (json.loads with default parse_constant
    # still accepts NaN; assert the raw text has none)
    import pathlib

    raw = pathlib.Path(d, "_MANIFEST.json").read_text()
    assert "NaN" not in raw and "Infinity" not in raw
    json.loads(raw)
    assert not any(
        isinstance(v, float) and not math.isfinite(v)
        for rng in stats.values()
        for v in rng
    )
    # stats-free column never prunes: the file with the 3.5 row is kept
    assert manifest_files_pruned(d, [("bad", ">=", 3.0)]) == manifest_files(d)


def test_zone_map_incomparable_predicate_keeps_file(spark):
    # A numeric predicate against a string column's [min, max] is
    # incomparable in Python 3; the pruner must keep the file
    # (conservative contract), not raise TypeError.
    import uuid

    from demo_segmenter_spark.sources.python_source import (
        manifest_files,
        manifest_files_pruned,
        register_sink,
    )

    register_sink(spark)
    d = f"/tmp/dss_sink/tym_{uuid.uuid4().hex[:8]}"
    df = spark.createDataFrame(
        [(1, "alpha"), (2, "omega")], "id long, name string"
    ).coalesce(1)
    df.write.format("jsonl_dir").option("path", d).mode("overwrite").save()

    # numeric predicate on the string column: keep, don't raise
    assert manifest_files_pruned(d, [("name", ">=", 42)]) == manifest_files(d)
    # string predicate on the numeric column: keep, don't raise
    assert manifest_files_pruned(d, [("id", "<", "zzz")]) == manifest_files(d)
    # comparable predicates still prune as before
    assert manifest_files_pruned(d, [("id", ">", 99)]) == []
