"""bench.py is a driver-contract file (the per-round BENCH_r{N}.json
comes from running it); a bitrotten bench is a silent round failure.
Smoke it end-to-end at sf0.001 with one timed run and no warm-up pass,
and pin the JSON shape the driver and BASELINE.md protocol rely on."""

from __future__ import annotations

import json
import os
import subprocess
import sys


def test_bench_runs_and_emits_contract_json():
    env = dict(os.environ)
    env.update(
        {
            "SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.001",
            "SPARK_GRAFT_CPUS": "4",
            "SPARK_GRAFT_MEM": "4g",
            "SPARK_GRAFT_BENCH_RUNS": "1",
            "SPARK_GRAFT_BENCH_WARM": "0",
        }
    )
    out = subprocess.run(
        [sys.executable, "bench.py"],
        cwd="/root/repo",
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    # ONE JSON line on stdout (the driver parses the last line).
    d = json.loads(out.stdout.strip().splitlines()[-1])
    assert d["metric"] == "headline_total_wall"
    assert d["unit"] == "sec"
    assert d["sf"] == 0.001
    assert d["value"] > 0
    assert d["queries"] and all(v >= 0 for v in d["queries"].values())
    assert abs(sum(d["queries"].values()) - d["value"]) < 0.01 * len(d["queries"])
    # machine stamps present (contended-run adjudication from artifact)
    assert len(d["machine_before"]["loadavg"]) == 3
    assert len(d["machine_after"]["loadavg"]) == 3
    assert d["warmed"] is False and d["runs"] == 1
    # drift self-adjudication block (round-8): always present; at
    # sf0.001 no committed artifact matches the sf, so ratios are
    # empty and median is None — the shape contract still holds
    drift = d["drift"]
    assert set(drift) >= {"ratios", "median_ratio", "outliers"}
    assert isinstance(drift["ratios"], dict)
