"""Virtual-device bootstrap shared by tests/conftest.py and
__graft_entry__.dryrun_multichip.

Multi-chip sharding logic must be exercisable without N real TPU chips
(SURVEY.md §4): JAX's CPU backend can present N virtual devices via
``--xla_force_host_platform_device_count``.  Getting that to stick in this
image has three traps, all handled here in ONE place so the test harness and
the driver's dryrun gate cannot diverge (round-1 VERDICT.md item 1 — the gate
was red because dryrun_multichip skipped this bootstrap and saw the single
real 'axon' TPU):

  1. The flag only takes effect if set before the CPU backend initialises.
  2. The axon sitecustomize registers a TPU backend in every process and wins
     over ``JAX_PLATFORMS`` from the environment, so the platform must also be
     pinned through ``jax.config`` after import.
  3. XLA:CPU's in-process collective rendezvous LOG(FATAL)s the whole process
     if a participant thread is starved past a 40 s default — routine on a
     1-core box during compiles — so the termination timeouts are raised to
     degrade starvation to a warning (repro: scripts/repro_cpu_mesh_abort.py).

This module must stay importable WITHOUT importing jax at module scope —
callers import it before jax exists in the process.
"""

from __future__ import annotations

import os


def set_virtual_cpu_env(n_devices: int = 8) -> None:
    """Env-only half of the bootstrap: platform pin, device count, and the
    collective-timeout mitigations (trap #3), with NO jax import or backend
    initialisation. Split out for the multi-process runtime
    (parallel/multihost.py), which must call ``jax.distributed.initialize``
    BEFORE anything touches the backend — so it cannot use the validating
    ``force_virtual_cpu_devices`` below (whose ``jax.device_count()``
    initialises it) and validates per-process device count itself."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        flags = (flags +
                 f" --xla_force_host_platform_device_count={n_devices}").strip()
    if "collective_call_terminate_timeout" not in flags:
        flags += (" --xla_cpu_collective_call_terminate_timeout_seconds=300"
                  " --xla_cpu_collective_call_warn_stuck_timeout_seconds=60"
                  " --xla_cpu_collective_timeout_seconds=300")
    if "concurrency_optimized_scheduler" not in flags:
        # Mesh-suite deadlock mitigation #1 (round 5): the concurrency-
        # optimized thunk scheduler reorders independent collectives per
        # partition — one of the two ingredients of the cross-collective
        # deadlock that LOG(FATAL)s at the 300 s terminate timeout.
        # A/B'd on a then-reliable repro ((4,2)-mesh FSDP case): =true
        # aborted, =false passed — but the knife edge then moved to the
        # ZeRO-1 (4,2) case, so this alone is insufficient (see #2).
        flags += " --xla_cpu_enable_concurrency_optimized_scheduler=false"
    if "multi_thread_eigen" not in flags:
        # Mitigation #2, the load-bearing one: on this 1-core box the
        # shared intra-op Eigen pool has ONE thread; a collective's
        # blocking rendezvous wait scheduled onto it starves every other
        # partition's work — the "blocked rendezvous waits exhaust the
        # 1-core pool" deadlock (NOTES_NEXT_ROUND.md "Known flake").
        # Single-threaded Eigen keeps partition work on the per-partition
        # execution threads, which can all block at a rendezvous
        # concurrently. With both flags the two previously deterministic
        # aborts (FSDP and ZeRO-1 on the (4,2) mesh) pass 4/4 in ~100 s
        # each. Virtual-CPU testing only — TPU paths never see these.
        flags += " --xla_cpu_multi_thread_eigen=false"
    os.environ["XLA_FLAGS"] = flags


def force_virtual_cpu_devices(n_devices: int = 8) -> None:
    """Make this process see ``n_devices`` virtual CPU jax devices.

    Idempotent. Must run before jax initialises its backends (importing jax
    is fine; calling ``jax.devices()`` first is not). Raises RuntimeError if
    the backend already initialised with too few devices.
    """
    set_virtual_cpu_env(n_devices)

    import jax

    jax.config.update("jax_platforms", "cpu")
    have = jax.device_count()
    if have < n_devices:
        raise RuntimeError(
            f"virtual-device bootstrap failed: wanted {n_devices} devices, "
            f"backend initialised with {have} on platform "
            f"{jax.devices()[0].platform!r}. force_virtual_cpu_devices() must "
            "be called before any jax.devices()/jit call in the process.")
