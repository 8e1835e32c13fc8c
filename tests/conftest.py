"""Shared pytest fixtures: one SparkSession for the whole run."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SMOKE_SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from machinelearningalgomapreduce_spark.session import ensure_query_conf, get_spark

    s = get_spark(app_name="pytest", master="local[8]", shuffle_partitions=8)
    ensure_query_conf(s)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SMOKE_SF_DIR


def drain(q, timeout: int = 420) -> None:
    """awaitTermination with the boolean ASSERTED (r15, VERDICT r14 item 3).

    Every capped ``q.awaitTermination(N)`` in this tree is an
    availableNow-style drain (or a post-stop() flush) that the test then
    asserts state on; ``awaitTermination`` returning False means the drain
    did NOT finish — asserting on sink/index state at that point reports a
    partial-state diff instead of the real problem (test_ivf_pq failed a
    slow-host battery exactly this way at r14 while the operator was
    correct). This helper turns a slow host into a clear TimeoutError and
    a real hang into a hang report, never a wrong-state assertion.
    """
    if not q.awaitTermination(timeout):
        try:
            status = q.status
        except Exception:  # noqa: BLE001 - best-effort diagnostics only
            status = "<status unavailable>"
        try:
            q.stop()
        except Exception:  # noqa: BLE001 - the raise below is the signal
            pass
        raise TimeoutError(
            f"stream did not terminate within {timeout}s (host too slow or "
            f"a real hang): {status}"
        )
