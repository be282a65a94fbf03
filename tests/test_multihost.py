"""Multi-PROCESS (multi-host) runtime test: the DCN leg of SURVEY.md §5's
distributed-communication design, exercised with two real OS processes
joined by jax.distributed over gloo CPU collectives — no hardware needed
(the in-process 8-device mesh suite covers the ICI leg;
tests/parallel_cases.py).

Spawns two children (tests/multihost_child.py), each with 4 virtual CPU
devices, forming one global 8-device data axis; children verify
cross-process gradient psum, a full train step, production batch assembly,
and the host all-gather. One retry absorbs rendezvous flake on this 1-core
box (same policy as the mesh child suite)."""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _child_env() -> dict:
    env = dict(os.environ)
    # children pick their own platform/device flags (4 virtual CPU devices
    # each); the parent suite's 8-device XLA_FLAGS must not leak through
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = os.pathsep.join(
        [str(REPO)] + [p for p in (env.get("PYTHONPATH") or "").split(
            os.pathsep) if p])
    return env


def _run_once(config_path: str, timeout: float = 600.0):
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    env = _child_env()
    procs = [
        subprocess.Popen(
            [sys.executable, str(REPO / "tests" / "multihost_child.py"),
             coordinator, "2", str(i), config_path],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=str(REPO))
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            try:
                out, _ = p.communicate(timeout=timeout)
            except subprocess.TimeoutExpired:
                # hung rendezvous (the deadlock flavour of the known
                # XLA:CPU flake): kill and report like an abnormal exit so
                # the caller's retry covers it too
                p.kill()
                out, _ = p.communicate()
                out = (out or "") + "\n[child timed out]"
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    return [(p.returncode, out) for p, out in zip(procs, outs)]


@pytest.fixture(scope="module")
def corpus_config(tiny_config, tiny_corpus):
    """Reuse the session tiny corpus; persist its config for the children."""
    path = tiny_config.output_path / "multihost_config.json"
    tiny_config.save(path)
    return str(path)


def test_two_process_runtime_matches_single_device(corpus_config):
    results = _run_once(corpus_config)
    if any(rc != 0 for rc, _ in results):  # one retry: rendezvous flake
        results = _run_once(corpus_config)
    for i, (rc, out) in enumerate(results):
        assert rc == 0, f"child {i} failed (rc={rc}):\n{out[-4000:]}"
        assert "MULTIHOST_OK" in out, f"child {i}:\n{out[-4000:]}"
    assert "primary=True" in results[0][1]
    assert "primary=False" in results[1][1]
