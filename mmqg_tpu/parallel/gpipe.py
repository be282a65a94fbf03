"""Pipeline parallelism: a GPipe microbatch schedule over a mesh axis.

The reference has no parallelism of any kind (SURVEY.md §2 C26-C28), and its
model has no pipeline depth to split — three-layer LSTMs whose layers have
heterogeneous input dims (reference model/decoder.py:49-125: layer 0 consumes
the 1452-wide attention concat, layers 1-2 consume 512), ~30M params total.
That is why the flagship drivers default to DP/TP/SP/FSDP and not PP. This
module supplies the capability itself — the missing SURVEY §2 C27 entry — as
a generic, tested runner for the regime PP is actually for: deep stacks of
shape-homogeneous blocks that exceed one chip's HBM.

Design (TPU-native, scaling-book shape):

* The pipeline is S = mesh.shape[axis] stages; device s on the axis holds
  ONLY stage s's parameters (the stacked param tree is sharded on its
  leading stage dim — a real 1/S parameter-memory split, the point of PP).
* The schedule is GPipe: the batch is split into M microbatches; at tick t
  device s computes stage s of microbatch (t - s). One ``lax.scan`` runs the
  T = M + S - 1 ticks; a single ``lax.ppermute`` per tick moves activations
  to the next stage over ICI (neighbour hops — the cheapest collective).
  Bubble fraction is the textbook (S-1)/T, amortised by raising M.
* Everything is differentiable: the ppermute/psum transposes are themselves
  ppermute/psum, so ``jax.grad`` through a gpipe'd forward IS pipeline-
  parallel BPTT with the reverse schedule. Forward and parameter-gradient
  agreement with the sequential stack is asserted in
  tests/parallel_cases.py (test_gpipe_*), on the (4,2) and (2,4) virtual
  meshes, including the DP×PP composition.
* Composes with data parallelism: the microbatch BATCH dim shards over the
  "data" axis of the same mesh, giving DP×PP on one 2-D mesh.

Exactness contract: device s applies exactly the ops the sequential stack
applies to microbatch m = t - s, in the same order; outputs are collected
from the last stage only, and the warmup/drain garbage slots are never
read. The agreement is NUMERICAL, not bitwise: the scan-internal fusion
reassociates the stage matmuls, so f32 forward differs from the sequential
stack at the reassociation-noise level (~1e-7 rel measured) and parameter
gradients at ~1e-6 rel. The tests assert tight f32 allclose (atol/rtol
1e-5), far below any real scheduling bug (a dropped/duplicated microbatch
or off-by-one warmup slot shifts results at O(1)).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax import lax

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def microbatch(x: jnp.ndarray, num_microbatches: int) -> jnp.ndarray:
    """(B, ...) -> (M, B/M, ...) microbatched view for ``gpipe``."""
    b = x.shape[0]
    if b % num_microbatches:
        raise ValueError(
            f"batch {b} not divisible into {num_microbatches} microbatches")
    return x.reshape((num_microbatches, b // num_microbatches) + x.shape[1:])


def unmicrobatch(y: jnp.ndarray) -> jnp.ndarray:
    """Inverse of ``microbatch``: (M, mb, ...) -> (M*mb, ...)."""
    return y.reshape((y.shape[0] * y.shape[1],) + y.shape[2:])


def stack_stage_params(stage_params: list) -> Any:
    """[params_0, ..., params_{S-1}] (identical pytree structure/shapes) ->
    one pytree whose every leaf gains a leading stage dim S. This is the
    layout ``gpipe`` shards 1/S per device."""
    return jax.tree.map(lambda *ls: jnp.stack(ls), *stage_params)


def gpipe(stage_fn: Callable[[Any, jnp.ndarray], jnp.ndarray],
          stacked_params: Any,
          xs: jnp.ndarray,
          *,
          mesh: Mesh,
          axis: str = "model",
          data_axis: str = "data") -> jnp.ndarray:
    """Apply S pipeline stages to M microbatches with a GPipe schedule.

    Args:
      stage_fn: ``(params_s, x) -> y`` for ONE stage. Must preserve the
        activation shape and dtype (the homogeneous-stack contract — the
        same activation buffer is what ppermute forwards between stages).
      stacked_params: pytree whose every leaf has leading dim S ==
        ``mesh.shape[axis]``; leaf[s] belongs to stage s. Build it with
        ``stack_stage_params``. Lives sharded 1/S on the axis.
      xs: ``(M, mb, ...)`` microbatched inputs (``microbatch`` helper).
        The mb dim is sharded over ``data_axis`` when the mesh has it.
      mesh / axis: the pipeline axis. ``data_axis``: optional DP axis.

    Returns ``(M, mb, ...)`` outputs equal to running every microbatch
    through all S stages sequentially.
    """
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    if axis not in sizes:
        raise ValueError(f"mesh has no axis {axis!r}: {mesh.axis_names}")
    s_stages = sizes[axis]
    for path, leaf in jax.tree_util.tree_leaves_with_path(stacked_params):
        if leaf.shape[:1] != (s_stages,):
            raise ValueError(
                f"stage param {jax.tree_util.keystr(path)} leading dim "
                f"{leaf.shape} != {s_stages} stages (mesh axis {axis!r})")
    n_micro = xs.shape[0]
    dp = data_axis if data_axis in sizes else None

    def run(local_params, xs_local):
        # this device's stage params: the size-1 stage slice, squeezed
        p = jax.tree.map(lambda l: l[0], local_params)
        idx = lax.axis_index(axis)
        mb_shape = xs_local.shape[1:]
        # feed stream for stage 0, zero-padded through the drain ticks
        feed = jnp.concatenate(
            [xs_local, jnp.zeros((s_stages - 1,) + mb_shape, xs_local.dtype)])

        def tick(buf, x_t):
            # stage 0 reads the feed; every other stage reads what its
            # predecessor ppermuted to it on the previous tick
            x_in = jnp.where(idx == 0, x_t, buf)
            y = stage_fn(p, x_in)
            if y.shape != x_in.shape or y.dtype != x_in.dtype:
                raise ValueError(
                    f"stage_fn must preserve activation shape/dtype: "
                    f"{x_in.shape}/{x_in.dtype} -> {y.shape}/{y.dtype}")
            out = jnp.where(idx == s_stages - 1, y, jnp.zeros_like(y))
            y_next = lax.ppermute(
                y, axis, [(i, (i + 1) % s_stages) for i in range(s_stages)])
            return y_next, out

        # the carry produced by tick() varies over the pipeline axis (params
        # differ per stage) and over the data axis when present; the zero
        # init must carry the same varying-manual-axes type or lax.scan
        # rejects the carry under shard_map's VMA checking (jax>=0.9)
        vary = (axis,) + ((dp,) if dp else ())
        init = lax.pcast(jnp.zeros(mb_shape, xs_local.dtype), vary,
                         to="varying")
        _, outs = lax.scan(tick, init, feed)
        # the last stage finishes microbatch m at tick m + S - 1; every
        # other device contributed zeros, so a psum replicates the result
        return lax.psum(outs[s_stages - 1:], axis)

    xs_spec = P(None, dp, *([None] * (xs.ndim - 2)))
    return shard_map(
        run, mesh=mesh,
        in_specs=(P(axis), xs_spec),
        out_specs=xs_spec,
    )(stacked_params, xs)
