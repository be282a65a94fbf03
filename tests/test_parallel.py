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
deterministic and fails immediately.

Resume-on-abort (round-4 VERDICT weak #6): the child logs every completed
case to MMQG_CASE_LOG (conftest.pytest_runtest_logreport), so a retry
``--deselect``s the cases that already PASSED and re-runs only the
in-flight case and what follows — an abort costs minutes, not the whole
~35-minute child. A case logged as failed/errored is a deterministic
failure and stops the retries."""

import os
import subprocess
import sys
import tempfile
from pathlib import Path

CASES = Path(__file__).parent / "parallel_cases.py"


def _run_child(deselect, log_path):
    cmd = [sys.executable, "-m", "pytest", "-q", "-p", "no:cacheprovider",
           str(CASES)]
    for nid in sorted(deselect):
        cmd += ["--deselect", nid]
    env = os.environ.copy()
    env["MMQG_CASE_LOG"] = str(log_path)
    try:
        return subprocess.run(cmd, capture_output=True, text=True, env=env,
                              timeout=1800)
    except subprocess.TimeoutExpired as e:
        # deadlock mode: treat like an abnormal exit so it is retried
        return subprocess.CompletedProcess(
            e.cmd, returncode=-99,
            stdout=(e.stdout or b"").decode(errors="replace")
            if isinstance(e.stdout, bytes) else (e.stdout or ""),
            stderr="child timed out after 1800s (collective deadlock?)")


def _read_log(log_path):
    """(passed_or_skipped_nodeids, failed_nodeids) from the case log."""
    ok, bad = set(), set()
    if log_path.exists():
        for line in log_path.read_text().splitlines():
            outcome, _, nodeid = line.partition(" ")
            (ok if outcome in ("passed", "skipped") else bad).add(nodeid)
    return ok, bad


def test_mesh_suite_isolated():
    # Four attempts, resuming past completed cases each time. An abnormal
    # exit with zero NEW completions twice in a row means one case keeps
    # killing the child — stop and report rather than spin.
    log_path = Path(tempfile.mkdtemp(prefix="mesh_case_log_")) / "cases.txt"
    done: set = set()
    last = None
    no_progress = 0
    for attempt in (1, 2, 3, 4):
        last = _run_child(done, log_path)
        ok, bad = _read_log(log_path)
        if bad:
            break  # deterministic case failure: do not retry
        if last.returncode == 0:
            return
        if last.returncode == 5 and done:
            # "no tests ran": a resumed attempt deselected every case —
            # meaning the previous child completed ALL cases (all passed,
            # bad is empty) and then died in teardown. The suite passed.
            return
        if last.returncode > 0:
            break  # deterministic pytest failure: do not retry
        no_progress = no_progress + 1 if ok == done else 0
        done = ok
        sys.stderr.write(
            f"mesh suite attempt {attempt} died abnormally "
            f"(rc={last.returncode}); {len(done)} cases completed, "
            f"resuming with the rest\n")
        if no_progress >= 2:
            break
    raise AssertionError(
        f"mesh suite failed (rc={last.returncode}):\n" +
        (last.stdout or "")[-3000:] + (last.stderr or "")[-2000:])
