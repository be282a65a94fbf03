"""Multi-chip sharding suite, isolated in a child pytest process.

The actual tests live in ``parallel_cases.py`` (excluded from default
collection) and run here via a subprocess with one retry. Rationale:
XLA:CPU's in-process collective rendezvous can LOG(FATAL) the entire
process when its worker threads starve or cross-block on a 1-core host
(root cause + repro: scripts/repro_cpu_mesh_abort.py, NOTES_NEXT_ROUND.md
"Known flake"). Isolation converts that abort into a retried child run, so
the full suite cannot be killed by it."""

import os
import subprocess
import sys
from pathlib import Path

CASES = Path(__file__).parent / "parallel_cases.py"


def test_mesh_suite_isolated():
    last = None
    for attempt in (1, 2):
        last = subprocess.run(
            [sys.executable, "-m", "pytest", "-q", "-p", "no:cacheprovider",
             str(CASES)],
            capture_output=True, text=True, env=os.environ.copy(),
            timeout=1800)
        if last.returncode == 0:
            return
        sys.stderr.write(
            f"mesh suite attempt {attempt} failed "
            f"(rc={last.returncode}); retrying\n")
    raise AssertionError(
        "mesh suite failed twice:\n" + (last.stdout or "")[-3000:] +
        (last.stderr or "")[-2000:])
