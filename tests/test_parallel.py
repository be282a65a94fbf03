"""Multi-chip sharding suite, isolated in a child pytest process.

The actual tests live in ``parallel_cases.py`` (excluded from default
collection) and run here via a subprocess. Rationale: XLA:CPU's in-process
collective rendezvous can LOG(FATAL) the entire process when its worker
threads starve or cross-block on a 1-core host (root cause + repro:
scripts/repro_cpu_mesh_abort.py, NOTES_NEXT_ROUND.md "Known flake").
Isolation converts that abort into a retried child run, so the full suite
cannot be killed by it.

Retry policy: only ABNORMAL child exits are retried — death by signal
(negative returncode: SIGABRT from the rendezvous fatal) or a timeout (the
cross-collective deadlock mode). An ordinary test failure (rc=1) is
deterministic and fails immediately."""

import os
import subprocess
import sys
from pathlib import Path

CASES = Path(__file__).parent / "parallel_cases.py"


def _run_child():
    try:
        return subprocess.run(
            [sys.executable, "-m", "pytest", "-q", "-p", "no:cacheprovider",
             str(CASES)],
            capture_output=True, text=True, env=os.environ.copy(),
            timeout=1800)
    except subprocess.TimeoutExpired as e:
        # deadlock mode: treat like an abnormal exit so it is retried
        return subprocess.CompletedProcess(
            e.cmd, returncode=-99,
            stdout=(e.stdout or b"").decode(errors="replace")
            if isinstance(e.stdout, bytes) else (e.stdout or ""),
            stderr="child timed out after 1800s (collective deadlock?)")


def test_mesh_suite_isolated():
    # Three attempts: one retry proved insufficient when the REST of the
    # suite keeps the single core loaded for the whole child run (observed
    # 2026-08-21: both attempts SIGABRT'd in a full-suite pass, then the
    # identical child passed standalone). Abnormal exits only — a real
    # test failure still fails on the first try.
    last = None
    for attempt in (1, 2, 3):
        last = _run_child()
        if last.returncode == 0:
            return
        if last.returncode > 0:
            break  # deterministic pytest failure: do not retry
        sys.stderr.write(
            f"mesh suite attempt {attempt} died abnormally "
            f"(rc={last.returncode}); retrying\n")
    raise AssertionError(
        f"mesh suite failed (rc={last.returncode}):\n" +
        (last.stdout or "")[-3000:] + (last.stderr or "")[-2000:])
