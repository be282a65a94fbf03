"""Pallas TPU kernel: fused tri-modal location attention.

One kernel per decoder step fuses what the XLA path runs as ~8 ops with HBM
round-trips between them: the concatenated three-head score matmul, three
segment-wise masked softmaxes (f32, in registers), and the three per-sample
context matvecs.

Layout strategy: all length axes are zero-padded to lane multiples once in
the wrapper (text 283->384, av 101->128; the pads are masked by the true
lengths inside the kernel, so padding is invisible). The grid tiles the batch;
weights/bias use constant index_maps so Mosaic keeps them VMEM-resident
across batch tiles.

See mmqg_tpu/ops/attention.py for the op contract and the XLA reference
implementation this kernel is oracle-tested against.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(lens_ref, q_ref, w_ref, b_ref, et_ref, ev_ref, ea_ref,
            ctx_t_ref, ctx_a_ref, ctx_v_ref, maps_ref,
            *, Lt: int, La: int, dtype):
    q = q_ref[:]                                       # (Bt, Dq)
    scores = (jnp.dot(q.astype(dtype), w_ref[:].astype(dtype),
                      preferred_element_type=jnp.float32) + b_ref[0])

    Bt = q.shape[0]
    lens = lens_ref[:]                                 # (Bt, 4) int32

    def seg_softmax(seg, length_col, L):
        col = jax.lax.broadcasted_iota(jnp.int32, (Bt, L), 1)
        mask = col < lens[:, length_col][:, None]
        s = jnp.where(mask, seg, _NEG_INF)
        m = jnp.max(s, axis=1, keepdims=True)
        e = jnp.exp(s - m)
        e = jnp.where(mask, e, 0.0)
        return e / jnp.sum(e, axis=1, keepdims=True)

    a_t = seg_softmax(scores[:, :Lt], 0, Lt)                     # (Bt, Lt)
    a_v = seg_softmax(scores[:, Lt:Lt + La], 1, La)              # (Bt, La)
    a_a = seg_softmax(scores[:, Lt + La:Lt + 2 * La], 2, La)     # (Bt, La)

    # batched matvec: (Bt, L) x (Bt, L, H) -> (Bt, H). Mosaic cannot lower a
    # batched dot_general, so use broadcast-multiply + reduce on the VPU —
    # at (8, 384, 512) this is a few microseconds and stays in registers.
    def ctx(alpha, mem):
        return jnp.sum(alpha[:, :, None].astype(jnp.float32)
                       * mem.astype(jnp.float32), axis=1)

    ctx_t_ref[:] = ctx(a_t, et_ref[:])
    ctx_v_ref[:] = ctx(a_v, ev_ref[:])
    ctx_a_ref[:] = ctx(a_a, ea_ref[:])
    maps_ref[:] = jnp.concatenate([a_t, a_v, a_a], axis=1)


@functools.partial(jax.jit, static_argnames=("dtype_name", "interpret"))
def _fused(params_padded, q, enc_text, enc_video, enc_audio, lens,
           dtype_name: str = "bfloat16", interpret: bool = False):
    dtype = jnp.dtype(dtype_name).type
    w_pad, b_pad = params_padded
    B, Dq = q.shape
    Lt = enc_text.shape[1]
    La = enc_video.shape[1]
    Ht = enc_text.shape[2]
    Hv = enc_video.shape[2]
    Ha = enc_audio.shape[2]
    Bt = next(b for b in (8, 4, 2, 1) if B % b == 0)
    grid = (B // Bt,)

    return pl.pallas_call(
        functools.partial(_kernel, Lt=Lt, La=La, dtype=dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((Bt, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Bt, Dq), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Dq, Lt + 2 * La), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lt + 2 * La), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bt, Lt, Ht), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bt, La, Hv), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bt, La, Ha), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((Bt, Ht), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Bt, Ha), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Bt, Hv), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Bt, Lt + 2 * La), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Ht), jnp.float32),
            jax.ShapeDtypeStruct((B, Ha), jnp.float32),
            jax.ShapeDtypeStruct((B, Hv), jnp.float32),
            jax.ShapeDtypeStruct((B, Lt + 2 * La), jnp.float32),
        ],
        interpret=interpret,
    )(lens, q, w_pad, b_pad, enc_text, enc_video, enc_audio)


def trimodal_attention_pallas(params, query, enc_text, enc_video, enc_audio,
                              text_len, video_len, audio_len, *,
                              dtype=jnp.bfloat16, interpret: bool = False):
    """Fused-TPU implementation of mmqg_tpu.ops.attention.trimodal_attention.

    Pads lengths/dims to lane multiples (loop-invariant — XLA hoists the pads
    out of the decode scan), launches the fused kernel, and slices the
    attention maps back to true sizes.
    """
    B, Dq = query.shape
    Lt = params.w_text.shape[1]
    La = params.w_video.shape[1]
    Lt_p = _round_up(Lt, 128)
    La_p = _round_up(La, 128)

    def pad_w(w, Lp):
        return jnp.pad(w, ((0, 0), (0, Lp - w.shape[1])))

    w_pad = jnp.concatenate([pad_w(params.w_text, Lt_p),
                             pad_w(params.w_video, La_p),
                             pad_w(params.w_audio, La_p)], axis=1)
    b_pad = jnp.concatenate([
        jnp.pad(params.b_text, (0, Lt_p - Lt)),
        jnp.pad(params.b_video, (0, La_p - La)),
        jnp.pad(params.b_audio, (0, La_p - La))])[None, :]

    # memories/query/weights enter the kernel in compute dtype: with f32
    # blocks + Pallas double-buffering the VMEM working set overflows at
    # Bt=8 (observed: 19 MB > 16 MB); bf16 halves it. Softmax and the
    # context accumulation still run in f32 inside the kernel.
    def pad_mem(m, Lp):
        return jnp.pad(m, ((0, 0), (0, Lp - m.shape[1]), (0, 0))).astype(dtype)

    et = pad_mem(enc_text, Lt_p)
    ev = pad_mem(enc_video, La_p)
    ea = pad_mem(enc_audio, La_p)
    w_pad = w_pad.astype(dtype)
    query = query.astype(dtype)
    lens = jnp.stack([text_len, video_len, audio_len,
                      jnp.zeros_like(text_len)], axis=1).astype(jnp.int32)

    ctx_t, ctx_a, ctx_v, maps = _fused(
        (w_pad, b_pad), query, et, ev, ea, lens,
        dtype_name=jnp.dtype(dtype).name, interpret=interpret)
    attn = {
        "text": maps[:, :Lt],
        "video": maps[:, Lt_p:Lt_p + La],
        "audio": maps[:, Lt_p + La_p:Lt_p + La_p + La],
    }
    return ctx_t, ctx_a, ctx_v, attn
