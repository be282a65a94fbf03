"""Pallas TPU LSTM layer with a fused custom-VJP backward (training kernel).

Forward: same VMEM-resident-weights sequence kernel as ops/lstm_pallas.py,
additionally emitting the BPTT residuals (post-activation gates and the cell
sequence) so nothing is recomputed in the backward pass.

Backward: one kernel sweeping the grid in REVERSE time order. Per step it
runs the standard LSTM BPTT cell math on the VPU, two MXU matmuls for
``dx_t = da wx^T`` / ``dh_{t-1} = da wh^T``, and accumulates the weight
gradients ``dwx += x_t^T da`` / ``dwh += h_{t-1}^T da`` in f32 VMEM scratch —
the (In,4H)/(H,4H) gradient tiles never round-trip HBM during the sweep
(the XLA scan transpose materialises per-step partials).

Semantics match ``layers.lstm_scan`` for a single layer (no masking/latching;
callers gather states at lengths outside — the cell sequence is an output
precisely so that gather stays differentiable).

Public entry: ``lstm_layer_train(wx, wh, b, xs, h0, c0)`` with custom VJP;
``lstm_stack_train`` composes layers (autodiff chains the VJPs).

Status (measured, PERF.md "Round-3 TPU measurement batch"): at reference
scale (H=512, B=32, T=283) fwd+bwd matches the XLA scan (71.6 vs 70.4 ms —
both per-step latency-bound); at H=2048 this backend's remote compiler
REJECTS the kernel (HTTP 500), so the "wins at larger hidden sizes"
hypothesis is closed as unverifiable here and the XLA scan is the training
path at every size (it scales fine: 104 ms fwd+bwd at H=2048). This module
stays as a tested, interpret+compiled-verified reference implementation of
fused-BPTT Pallas kernels; it is deliberately NOT wired into loss_fn.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False  # flipped by tests on CPU


def _fwd_kernel(x_ref, wx_ref, wh_ref, b_ref, h0_ref, c0_ref,
                out_ref, cseq_ref, gates_ref, hT_ref, cT_ref,
                h_scr, c_scr, *, T: int, dtype):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_scr[:] = h0_ref[:]
        c_scr[:] = c0_ref[:]

    x = x_ref[0]
    h = h_scr[:]
    pre = (jnp.dot(x.astype(dtype), wx_ref[:].astype(dtype),
                   preferred_element_type=jnp.float32)
           + jnp.dot(h.astype(dtype), wh_ref[:].astype(dtype),
                     preferred_element_type=jnp.float32)
           + b_ref[0])
    H = h.shape[-1]
    i = jax.nn.sigmoid(pre[:, :H])
    f = jax.nn.sigmoid(pre[:, H:2 * H])
    g = jnp.tanh(pre[:, 2 * H:3 * H])
    o = jax.nn.sigmoid(pre[:, 3 * H:])
    c_new = f * c_scr[:] + i * g
    h_new = o * jnp.tanh(c_new)
    h_scr[:] = h_new
    c_scr[:] = c_new
    out_ref[0] = h_new
    cseq_ref[0] = c_new
    gates_ref[0] = jnp.concatenate([i, f, g, o], axis=1)

    @pl.when(t == T - 1)
    def _():
        hT_ref[:] = h_new
        cT_ref[:] = c_new


def _bwd_kernel(x_ref, hprev_ref, cprev_ref, c_ref, gates_ref,
                wx_ref, wh_ref, dout_ref, dcseq_ref, dhT_ref, dcT_ref,
                dx_ref, dwx_ref, dwh_ref, db_ref, dh0_ref, dc0_ref,
                dh_scr, dc_scr, dwx_scr, dwh_scr, db_scr,
                *, T: int, dtype):
    s = pl.program_id(0)          # reverse sweep: s=0 is t=T-1

    @pl.when(s == 0)
    def _():
        dh_scr[:] = dhT_ref[:]
        dc_scr[:] = dcT_ref[:]
        dwx_scr[:] = jnp.zeros_like(dwx_scr)
        dwh_scr[:] = jnp.zeros_like(dwh_scr)
        db_scr[:] = jnp.zeros_like(db_scr)

    H = dh_scr.shape[-1]
    gates = gates_ref[0]
    i, f, g, o = (gates[:, :H], gates[:, H:2 * H],
                  gates[:, 2 * H:3 * H], gates[:, 3 * H:])
    c_t = c_ref[0]
    c_prev = cprev_ref[0]
    tanh_c = jnp.tanh(c_t)

    dh = dout_ref[0] + dh_scr[:]
    dc = dc_scr[:] + dcseq_ref[0] + dh * o * (1.0 - tanh_c * tanh_c)
    da_o = dh * tanh_c * o * (1.0 - o)
    da_i = dc * g * i * (1.0 - i)
    da_g = dc * i * (1.0 - g * g)
    da_f = dc * c_prev * f * (1.0 - f)
    da = jnp.concatenate([da_i, da_f, da_g, da_o], axis=1)   # (B, 4H)

    # dx_t = da @ wx^T ; dh_prev = da @ wh^T  (contract the 4H dim)
    dx_ref[0] = lax.dot_general(
        da.astype(dtype), wx_ref[:].astype(dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dh_scr[:] = lax.dot_general(
        da.astype(dtype), wh_ref[:].astype(dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dc_scr[:] = dc * f

    # weight-grad accumulation in VMEM: dwx += x_t^T @ da, dwh += h_prev^T @ da
    dwx_scr[:] += lax.dot_general(
        x_ref[0].astype(dtype), da.astype(dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dwh_scr[:] += lax.dot_general(
        hprev_ref[0].astype(dtype), da.astype(dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db_scr[:] += jnp.sum(da, axis=0, keepdims=True)

    @pl.when(s == T - 1)
    def _():
        dwx_ref[:] = dwx_scr[:]
        dwh_ref[:] = dwh_scr[:]
        db_ref[:] = db_scr[:]
        dh0_ref[:] = dh_scr[:]
        dc0_ref[:] = dc_scr[:]


def _forward(wx, wh, b, xs, h0, c0, dtype):
    B, T, In = xs.shape
    H = h0.shape[-1]
    xs_t = jnp.swapaxes(xs, 0, 1)
    outs = pl.pallas_call(
        functools.partial(_fwd_kernel, T=T, dtype=dtype),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, B, In), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((In, 4 * H), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 4 * H), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * H), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, B, H), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, H), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, 4 * H), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),   # h sequence
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),   # c sequence
            jax.ShapeDtypeStruct((T, B, 4 * H), jnp.float32),  # gates
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32),
                        pltpu.VMEM((B, H), jnp.float32)],
        interpret=_INTERPRET,
    )(xs_t, wx, wh, b[None, :], h0, c0)
    h_seq_t, c_seq_t, gates_t, hT, cT = outs
    return h_seq_t, c_seq_t, gates_t, hT, cT


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def lstm_layer_train(wx, wh, b, xs, h0, c0, dtype_name: str = "bfloat16"):
    """One LSTM layer over a sequence, trainable (fused Pallas fwd+bwd).
    Returns (out_seq (B,T,H), c_seq (B,T,H), hT (B,H), cT (B,H))."""
    dtype = jnp.dtype(dtype_name).type
    h_seq_t, c_seq_t, _, hT, cT = _forward(wx, wh, b, xs, h0, c0, dtype)
    return (jnp.swapaxes(h_seq_t, 0, 1), jnp.swapaxes(c_seq_t, 0, 1), hT, cT)


def _fwd_rule(wx, wh, b, xs, h0, c0, dtype_name):
    dtype = jnp.dtype(dtype_name).type
    h_seq_t, c_seq_t, gates_t, hT, cT = _forward(wx, wh, b, xs, h0, c0, dtype)
    out = (jnp.swapaxes(h_seq_t, 0, 1), jnp.swapaxes(c_seq_t, 0, 1), hT, cT)
    res = (wx, wh, xs, h0, c0, h_seq_t, c_seq_t, gates_t)
    return out, res


def _bwd_rule(dtype_name, res, cot):
    dtype = jnp.dtype(dtype_name).type
    wx, wh, xs, h0, c0, h_seq_t, c_seq_t, gates_t = res
    d_out, d_cseq, d_hT, d_cT = cot
    B, T, In = xs.shape
    H = h0.shape[-1]
    xs_t = jnp.swapaxes(xs, 0, 1)
    # previous-step state sequences: index t holds state at t-1 (t=0 -> init)
    h_prev_t = jnp.concatenate([h0[None], h_seq_t[:-1]], axis=0)
    c_prev_t = jnp.concatenate([c0[None], c_seq_t[:-1]], axis=0)

    rev = lambda t: (T - 1 - t, 0, 0)  # noqa: E731 — reverse-time sweep
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, T=T, dtype=dtype),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, B, In), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, 4 * H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((In, 4 * H), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 4 * H), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, B, In), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((In, 4 * H), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 4 * H), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * H), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, In), jnp.float32),
            jax.ShapeDtypeStruct((In, 4 * H), jnp.float32),
            jax.ShapeDtypeStruct((H, 4 * H), jnp.float32),
            jax.ShapeDtypeStruct((1, 4 * H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((In, 4 * H), jnp.float32),
            pltpu.VMEM((H, 4 * H), jnp.float32),
            pltpu.VMEM((1, 4 * H), jnp.float32),
        ],
        interpret=_INTERPRET,
    )(xs_t, h_prev_t, c_prev_t, c_seq_t, gates_t, wx, wh,
      jnp.swapaxes(d_out, 0, 1), jnp.swapaxes(d_cseq, 0, 1), d_hT, d_cT)
    dx_t, dwx, dwh, db, dh0, dc0 = outs
    return (dwx, dwh, db[0], jnp.swapaxes(dx_t, 0, 1), dh0, dc0)


lstm_layer_train.defvjp(_fwd_rule, _bwd_rule)


def lstm_stack_train(params: dict, xs: jnp.ndarray,
                     state: Tuple[jnp.ndarray, jnp.ndarray] = None,
                     *, dtype_name: str = "bfloat16"):
    """Multi-layer trainable Pallas LSTM matching layers.lstm_scan (no
    dropout). Returns (outputs (B,T,H), (hT, cT) each (L,B,H))."""
    layers = params["layers"]
    B, T, _ = xs.shape
    H = layers[0]["wh"].shape[0]
    L = len(layers)
    if state is None:
        z = jnp.zeros((L, B, H), jnp.float32)
        state = (z, z)
    seq = xs
    hs, cs = [], []
    for li, layer in enumerate(layers):
        seq, _, hT, cT = lstm_layer_train(
            layer["wx"], layer["wh"], layer["b"], seq,
            state[0][li], state[1][li], dtype_name)
        hs.append(hT)
        cs.append(cT)
    return seq, (jnp.stack(hs), jnp.stack(cs))
