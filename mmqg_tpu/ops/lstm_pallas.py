"""Pallas TPU kernel: full-sequence LSTM layer.

Replaces ``lax.scan`` over ``mmqg_tpu.models.layers._cell`` on the inference
path. Why a kernel: the scan re-streams the (In,4H)/(H,4H) weight matrices
from HBM every timestep and bounces h/c through HBM between iterations. Here
the grid dimension IS time: weights use a constant index_map so Mosaic keeps
them resident in VMEM for all T steps, and h/c live in VMEM scratch across
grid iterations (TPU grids execute sequentially). Per step the kernel does
two MXU matmuls + the gate elementwise block, nothing else touches HBM except
streaming x_t in and h_t out.

Also fused in-kernel (both would be separate HBM passes in the XLA path):
  * output masking: out[t] = 0 for t >= length  (the reference wrote into a
    zero buffer, train.py:160-166);
  * final-state latching: (h, c) at each sample's length-1 is captured into
    dedicated outputs — no (T, L, B, H) state materialisation.

Forward-only: training uses the XLA scan (autodiff); serving/eval dispatch
here. Numerics: gates accumulate in f32; state kept f32; matmul inputs bf16.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(len_ref, x_ref, wx_ref, wh_ref, b_ref, h0_ref, c0_ref,
            out_ref, hT_ref, cT_ref, h_scr, c_scr, lh_scr, lc_scr,
            *, T: int, mask_output: bool, dtype):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_scr[:] = h0_ref[:]
        c_scr[:] = c0_ref[:]
        lh_scr[:] = h0_ref[:]
        lc_scr[:] = c0_ref[:]

    x = x_ref[0]                                     # (B, In)
    h = h_scr[:]
    gates = (
        jnp.dot(x.astype(dtype), wx_ref[:].astype(dtype),
                preferred_element_type=jnp.float32)
        + jnp.dot(h.astype(dtype), wh_ref[:].astype(dtype),
                  preferred_element_type=jnp.float32)
        + b_ref[0]
    )
    H = h.shape[-1]
    i = jax.nn.sigmoid(gates[:, :H])
    f = jax.nn.sigmoid(gates[:, H:2 * H])
    g = jnp.tanh(gates[:, 2 * H:3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H:])
    c_new = f * c_scr[:] + i * g
    h_new = o * jnp.tanh(c_new)
    h_scr[:] = h_new
    c_scr[:] = c_new

    lens = len_ref[:]                                # (B, 1) int32
    if mask_output:
        live = (lens > t)                            # (B, 1)
        out_ref[0] = jnp.where(live, h_new, 0.0)
    else:
        out_ref[0] = h_new

    is_last = (lens - 1 == t)
    lh_scr[:] = jnp.where(is_last, h_new, lh_scr[:])
    lc_scr[:] = jnp.where(is_last, c_new, lc_scr[:])

    @pl.when(t == T - 1)
    def _():
        hT_ref[:] = lh_scr[:]
        cT_ref[:] = lc_scr[:]


def lstm_layer_pallas(
    layer: dict,                   # {"wx": (In, 4H), "wh": (H, 4H), "b": (4H,)}
    xs: jnp.ndarray,               # (B, T, In)
    h0: jnp.ndarray,               # (B, H)
    c0: jnp.ndarray,               # (B, H)
    lengths: Optional[jnp.ndarray] = None,  # (B,) int32; None -> full length
    *,
    mask_output: bool = False,
    dtype=jnp.bfloat16,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Run one LSTM layer over a whole sequence.
    Returns (outputs (B, T, H), h_at_length (B, H), c_at_length (B, H))."""
    B, T, In = xs.shape
    H = h0.shape[-1]
    if lengths is None:
        lengths = jnp.full((B,), T, jnp.int32)
    xs_t = jnp.swapaxes(xs, 0, 1)                    # (T, B, In)

    out_t, hT, cT = pl.pallas_call(
        functools.partial(_kernel, T=T, mask_output=mask_output, dtype=dtype),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((B, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, In), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((In, 4 * H), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 4 * H), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * H), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, B, H), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
        interpret=interpret,
    )(lengths[:, None].astype(jnp.int32), xs_t, layer["wx"], layer["wh"],
      layer["b"][None, :], h0, c0)
    return jnp.swapaxes(out_t, 0, 1), hT, cT


def lstm_stack_pallas(
    params: dict,                  # {"layers": [...]}
    xs: jnp.ndarray,               # (B, T, In)
    state: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,  # (L, B, H) each
    lengths: Optional[jnp.ndarray] = None,
    *,
    mask_output: bool = False,
    dtype=jnp.bfloat16,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """Multi-layer sequence LSTM. Matches layers.lstm_scan's contract but the
    returned (h, c) are the per-sample states AT ``lengths`` (latched), and
    outputs can be zero-masked past the length.
    Dropout-free (inference path)."""
    layers = params["layers"]
    L = len(layers)
    B, T, _ = xs.shape
    H = layers[0]["wh"].shape[0]
    if state is None:
        z = jnp.zeros((L, B, H), jnp.float32)
        state = (z, z)
    seq = xs
    hs, cs = [], []
    for li, layer in enumerate(layers):
        # only the top layer's outputs need masking; inner layers feed the
        # next layer and padded steps are dropped by the latch anyway —
        # but masking keeps numerics identical to the XLA path, so mask all.
        seq, hT, cT = lstm_layer_pallas(
            layer, seq, state[0][li], state[1][li], lengths,
            mask_output=mask_output, dtype=dtype, interpret=interpret)
        hs.append(hT)
        cs.append(cT)
    return seq, (jnp.stack(hs), jnp.stack(cs))
