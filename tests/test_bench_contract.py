"""bench.py driver contract: exactly ONE stdout line, valid JSON, required
keys. Round 1 lost its whole bench score to this contract not being met —
guard it at the smallest fixture with minimal runs."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_emits_single_json_line_with_contract_keys():
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="8",
        SPARK_BENCH_TIMED_RUNS="1",
        SPARK_BENCH_WARMUPS="0",
        SPARK_BENCH_CACHE_PARTITIONS="4",
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        timeout=600,
        check=True,
    )
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, f"stdout must be ONE JSON line, got {len(lines)}"
    payload = json.loads(lines[0])
    for key in ("metric", "value", "unit", "queries", "sf", "fixed_overhead_sec"):
        assert key in payload, key
    assert payload["unit"] == "sec"
    assert payload["sf"] == 0.001
    # Every headline query must have produced a number (none silently failed).
    assert payload["n_queries"] == len(payload["queries"]) == 12
    assert all(v >= 0 for v in payload["queries"].values())
    # Same-host DuckDB provenance (r10): every headline query carries a
    # same-run oracle timing so per-query ratios are weather-attributable.
    assert set(payload["duckdb_same_host"]) == set(payload["queries"])
    assert all(v > 0 for v in payload["duckdb_same_host"].values())
    assert payload["duckdb_same_host_total"] > 0


def test_bench_query_subset_env_knob():
    """SPARK_BENCH_QUERIES (r11, the scale-audit tool's hook) restricts
    the timed set; unknown names exit loudly instead of silently timing
    the wrong thing."""
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="8",
        SPARK_BENCH_TIMED_RUNS="1",
        SPARK_BENCH_WARMUPS="0",
        SPARK_BENCH_CACHE_PARTITIONS="4",
        SPARK_BENCH_QUERIES="q_filter_agg,q_wordcount",
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, env=env, timeout=600, check=True,
    )
    payload = json.loads(proc.stdout.strip().splitlines()[-1])
    assert set(payload["queries"]) == {"q_filter_agg", "q_wordcount"}

    env["SPARK_BENCH_QUERIES"] = "q_definitely_not_a_query"
    bad = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert bad.returncode != 0
    assert "q_definitely_not_a_query" in bad.stderr + bad.stdout
