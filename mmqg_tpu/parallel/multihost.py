"""Multi-process (multi-host) execution: data parallelism across hosts/slices.

SURVEY.md §5 "Distributed communication backend": within a slice the GSPMD
collectives ride ICI; *across* hosts or slices they ride DCN. JAX's runtime
covers that second leg with ``jax.distributed`` — every process calls
``initialize_multihost`` with the same coordinator, the global device list
then spans all processes, and the exact same ``make_mesh``/``shard_params``
rules (parallel/mesh.py) produce a cross-host mesh. No NCCL/MPI analogue is
written by hand (reference has none either — SURVEY §2 C28): XLA emits the
collectives; on CPU they run over gloo (TCP), which is also how this module
is CI-tested without hardware (tests/test_multihost.py spawns real
processes).

The one genuinely new concern vs single-process meshes is ARRAY ASSEMBLY:
a process can only device_put onto its own (addressable) devices, so global
batches must be built from per-process shards —
``assemble_global_batch`` below wraps
``jax.make_array_from_process_local_data``. Conversely, reading a
batch-sharded global array back needs an all-gather across processes
(``to_host``).

Scope (documented contract): cross-host DATA parallelism — params/opt-state
replicated across hosts, batch rows sharded. Tensor-parallel axes stay
*within* a host's addressable devices (exactly how real TPU pods are laid
out: TP over ICI inside a slice, DP over DCN between slices). Checkpoint
writes happen on process 0 only (shared-filesystem assumption, standard for
TPU pods).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None,
                         *,
                         virtual_cpu_devices_per_process: Optional[int] = None
                         ) -> None:
    """Join this process to a multi-process JAX runtime.

    Must run before jax initialises its backends. On real TPU pods all three
    arguments may stay None — jax auto-detects them from the pod metadata /
    scheduler environment; for hardware-free CI pass
    ``virtual_cpu_devices_per_process`` to give every process N virtual CPU
    devices (the multi-host analogue of bootstrap.force_virtual_cpu_devices).
    """
    if virtual_cpu_devices_per_process:
        # env-only half of the shared bootstrap: also raises the XLA:CPU
        # collective timeouts (trap #3 — the rendezvous LOG(FATAL) on a
        # starved 1-core box applies to cross-process gloo runs too). The
        # validating full bootstrap can't be used here: its device_count()
        # would initialise the backend before jax.distributed.initialize.
        from mmqg_tpu.parallel.bootstrap import set_virtual_cpu_env
        set_virtual_cpu_env(virtual_cpu_devices_per_process)

    import jax

    if virtual_cpu_devices_per_process:
        jax.config.update("jax_platforms", "cpu")  # axon sitecustomize wins
        # over the env var otherwise (parallel/bootstrap.py trap #2)
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    if virtual_cpu_devices_per_process:
        have = len(jax.local_devices())
        if have != virtual_cpu_devices_per_process:
            raise RuntimeError(
                f"multihost virtual-CPU bootstrap failed: wanted "
                f"{virtual_cpu_devices_per_process} local devices, got "
                f"{have} (platform {jax.devices()[0].platform!r}). An "
                "inherited xla_force_host_platform_device_count in XLA_FLAGS "
                "wins over the requested count — scrub it from the "
                "environment first, and call this before any jax.devices()/"
                "jit in the process.")


def is_primary() -> bool:
    """True on the process that owns filesystem side effects (checkpoints,
    stats.json); trivially True single-process."""
    import jax
    return jax.process_index() == 0


def _local_row_block(sharding, global_rows: int):
    """[start, stop) of the global batch rows this process's devices own
    under ``sharding`` (leading dim sharded over 'data'). Data-parallel
    row blocks are contiguous per process because the default device order
    is process-major."""
    idx_map = sharding.addressable_devices_indices_map((global_rows,))
    # distinct row slices (tensor-parallel devices replicate a row block, so
    # several devices may own the same slice)
    blocks = sorted({(s[0].start or 0,
                      s[0].stop if s[0].stop is not None else global_rows)
                     for s in idx_map.values()})
    start, stop = blocks[0][0], blocks[-1][1]
    prev = start
    for s, e in blocks:
        if s != prev:
            raise ValueError(
                "process-local batch rows are not one contiguous block; use "
                "a process-major data axis (default device order)")
        prev = e
    return start, stop


def local_row_range(mesh, global_rows: int) -> tuple:
    """[start, stop) of the global batch rows THIS process contributes under
    batch-over-data sharding on ``mesh``.

    This is the contract a sharded loader needs to materialise only its own
    rows (data/streaming.py ``local_rows``): ``assemble_global_batch`` takes
    exactly this block from each process, so media payloads for other
    processes' rows never have to leave their disks. Single-process:
    (0, global_rows)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec

    if jax.process_count() == 1:
        return 0, global_rows
    return _local_row_block(NamedSharding(mesh, PartitionSpec("data")),
                            global_rows)


def loader_local_rows(mesh, batch_size: int) -> Optional[tuple]:
    """``local_rows`` a sharded loader should pack for a ``batch_size``-row
    host batch that will go through ``pad_and_shard_batch`` on ``mesh``.

    The batch is padded up to a data-axis multiple before sharding, so the
    row block is computed on the PADDED size and clipped back to the real
    batch (padded rows are synthesized zeros — never loaded from disk).
    None when every row should be loaded (single-process or no mesh)."""
    import jax

    if mesh is None or jax.process_count() == 1:
        return None
    dp = mesh.devices.shape[0]
    padded = -(-batch_size // dp) * dp
    lo, hi = local_row_range(mesh, padded)
    return (min(lo, batch_size), min(hi, batch_size))


def global_max_int(value: int) -> int:
    """Max of a host-side integer across processes (one tiny collective over
    DCN/gloo); identity single-process.

    Host-side COMPILE decisions must be identical on every process or their
    programs (and therefore their collectives) diverge and the runtime
    deadlocks. With per-process sharded loading each process only sees its
    own rows' AV lengths, so bucket caps (Trainer._step_for) reduce the
    local need through this before choosing a step variant."""
    import jax

    if jax.process_count() == 1:
        return int(value)
    from jax.experimental import multihost_utils
    arr = multihost_utils.process_allgather(np.asarray([int(value)], np.int64))
    return int(np.max(arr))


def assemble_global_batch(batch: Dict[str, Any], mesh) -> Dict[str, Any]:
    """Multi-process replacement for ``shard_batch``: every process passes a
    full-shape host batch (deterministic loader order); each contributes
    only its own row block and the result is one global jax.Array per field.
    Only the ``local_row_range`` block of each array need hold real data —
    a sharded loader (data/streaming.py ``local_rows``) leaves the other
    rows zeroed and they never reach a device.

    Single-process it defers to plain ``shard_batch`` (identical layout), so
    callers can use it unconditionally.
    """
    import jax
    from mmqg_tpu.parallel.mesh import batch_sharding, shard_batch

    if jax.process_count() == 1:
        return shard_batch(batch, mesh)
    sb = batch_sharding(mesh)
    out = {}
    for k, v in batch.items():
        if not hasattr(v, "ndim"):
            continue
        sharding = sb(v)
        if v.ndim == 0:
            out[k] = jax.make_array_from_process_local_data(sharding, v)
            continue
        start, stop = _local_row_block(sharding, v.shape[0])
        out[k] = jax.make_array_from_process_local_data(
            sharding, np.ascontiguousarray(v[start:stop]), v.shape)
    return out


def shard_params_global(params, mesh):
    """Cross-process ``shard_params``: place a host-resident param/opt pytree
    onto a mesh that spans processes.

    Works for the documented multihost scope — leaves replicated over the
    (cross-host) data axis, TP shards contained within each host's devices —
    where every process's addressable view of a leaf is the FULL array, so
    each process contributes its whole host copy and the runtime keeps the
    shards it owns."""
    import jax
    from mmqg_tpu.parallel.mesh import param_shardings, shard_params

    if jax.process_count() == 1:
        return shard_params(params, mesh)
    shardings = param_shardings(params, mesh)

    def put(x, s):
        if not hasattr(x, "ndim"):
            return x
        return jax.make_array_from_process_local_data(s, np.asarray(x),
                                                      np.shape(x))

    return jax.tree.map(
        put, params, shardings,
        is_leaf=lambda x: hasattr(x, "ndim")
        or not isinstance(x, (dict, list, tuple)))


def place_global(tree, shardings):
    """Place a host-resident pytree onto arbitrary (possibly cross-process)
    ``shardings`` — the general form of ``shard_params_global``, needed when
    a leaf's shards span processes (ZeRO-1 optimizer moments over a
    cross-host data axis: parallel/mesh.zero1_shardings). Each process
    fulfils its addressable shards from its full host copy via
    ``jax.make_array_from_callback``; single-process it is a plain
    device_put."""
    import jax

    if jax.process_count() == 1:
        return jax.tree.map(
            lambda x, s: jax.device_put(x, s) if hasattr(x, "ndim") else x,
            tree, shardings,
            is_leaf=lambda x: hasattr(x, "ndim")
            or not isinstance(x, (dict, list, tuple)))

    def put(x, s):
        if not hasattr(x, "ndim"):
            return x
        host = np.asarray(x)
        return jax.make_array_from_callback(np.shape(host), s,
                                            lambda idx: host[idx])

    return jax.tree.map(
        put, tree, shardings,
        is_leaf=lambda x: hasattr(x, "ndim")
        or not isinstance(x, (dict, list, tuple)))


def replicate_global(tree, mesh):
    """Place a pytree fully replicated on a (possibly cross-process) mesh."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec

    repl = NamedSharding(mesh, PartitionSpec())
    if jax.process_count() == 1:
        return jax.device_put(tree, repl)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            repl, np.asarray(x), np.shape(x)) if hasattr(x, "ndim") else x,
        tree)


def to_host(x) -> np.ndarray:
    """Materialise a (possibly cross-process-sharded) array on every host.

    Fully-addressable arrays (replicated params, scalar metrics, anything
    single-process) take the plain ``np.asarray`` path; batch-sharded global
    arrays all-gather over the runtime (DCN/gloo)."""
    if hasattr(x, "is_fully_addressable") and not x.is_fully_addressable:
        from jax.experimental import multihost_utils
        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)
