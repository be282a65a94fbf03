"""Sequence-parallel tri-modal attention: exact distributed softmax over a
context-sharded text memory — without ever gathering the memory.

The default SP path (`parallel.mesh.sequence_constraint`) annotates the
(B, Lt, Ht) text memory as sharded over the model axis and lets GSPMD place
the collectives; at attention-consumption sites GSPMD is free to all-gather
the memory (O(B·Lt·Ht) bytes over ICI per step). This op is the explicit
alternative and the ring-attention building block SURVEY.md §5 names for
when contexts outgrow the reference's 283 tokens: each model-axis rank owns
Lt/tp score columns and memory rows, computes its local masked partial
max / exp-sum / weighted context, and combines with `pmax` + `psum` —
communication per decode step drops to O(B·Ht), independent of Lt.

Exact vs the unsharded softmax by construction (the global max is subtracted
before exponentiation, so this is the standard two-pass stable softmax with
the passes distributed); equality is asserted on the virtual mesh in
tests/parallel_cases.py::test_attention_sp_matches_xla. At the reference's
lengths the memory all-gather is a few hundred KB and GSPMD's placement is
fine — this op is priced for long-context corpora, kept as a tested
capability alongside the default path (same policy as the Pallas kernels,
PERF.md "Kernel notes").

Semantics match ops/attention.trimodal_attention_xla (the reference's
location attention, model/decoder.py:74-99, masking bugs fixed): the video
and audio heads attend over replicated AV memories (101 steps — never worth
sharding, SURVEY.md §5); only the text head is distributed.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from jax import lax
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from mmqg_tpu.ops.attention import _NEG_INF, AttnParams, _masked_softmax


def trimodal_attention_sp(
    params: AttnParams,
    query: jnp.ndarray,        # (B, Dq)
    enc_text: jnp.ndarray,     # (B, Lt, Ht) — sharded (data, model, -) on mesh
    enc_video: jnp.ndarray,    # (B, La, Hv) — replicated over model
    enc_audio: jnp.ndarray,    # (B, La, Ha) — replicated over model
    text_len: jnp.ndarray,     # (B,)
    video_len: jnp.ndarray,    # (B,)
    audio_len: jnp.ndarray,    # (B,)
    mesh: Mesh,
    *,
    dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, dict]:
    """Returns (ctx_text, ctx_audio, ctx_video, attn maps) like
    ``trimodal_attention_xla``; the text context is computed from per-rank
    partials combined with pmax/psum instead of a gathered memory.

    Any ``Lt`` works (the reference's own 283 is prime): the text axis is
    zero-padded inside to the next model-axis multiple — padded columns sit
    at global positions >= Lt >= text_len, so the length mask zeroes them
    out of every partial, and the returned text map is sliced back to Lt.
    The BATCH axis must divide the data axis (callers' batches arrive
    mesh-padded via ``parallel.pad_and_shard_batch``)."""
    tp = dict(zip(mesh.axis_names, mesh.devices.shape)).get("model", 1)
    lt = params.w_text.shape[1]
    pad = (-lt) % tp
    w_text, b_text = params.w_text, params.b_text
    if pad:
        w_text = jnp.pad(w_text, ((0, 0), (0, pad)))
        b_text = jnp.pad(b_text, (0, pad))
        enc_text = jnp.pad(enc_text, ((0, 0), (0, pad), (0, 0)))

    def local(w_t, b_t, w_v, b_v, w_a, b_a, q, et, ev, ea, tl, vl, al):
        qd = q.astype(dtype)
        # ---- text head: this rank's Lt/tp score columns + memory rows ----
        s_t = jnp.dot(qd, w_t.astype(dtype),
                      preferred_element_type=jnp.float32) + b_t
        l_shard = s_t.shape[-1]
        offset = lax.axis_index("model") * l_shard
        mask = (offset + jnp.arange(l_shard))[None, :] < tl[:, None]
        s_t = jnp.where(mask, s_t, _NEG_INF)
        # two-pass stable softmax, passes distributed over the model axis:
        # global max via pmax, exp-sum and weighted context via psum.
        # stop_gradient on the max: softmax is invariant to the shift, so
        # its gradient contribution cancels exactly — and pmax has no
        # differentiation rule (this is what makes the op trainable,
        # config.sp_gather_free)
        m = lax.pmax(lax.stop_gradient(s_t).max(axis=-1), "model")  # (B,)
        e = jnp.exp(s_t - m[:, None])                        # f32, <= 1
        denom = lax.psum(e.sum(axis=-1), "model")            # (B,)
        denom = jnp.maximum(denom, 1e-30)
        ctx_t = lax.psum(
            jnp.einsum("bl,blh->bh", e.astype(dtype), et.astype(dtype),
                       preferred_element_type=jnp.float32),
            "model") / denom[:, None]
        a_t = e / denom[:, None]          # this rank's slice of the map
        # ---- video/audio heads: replicated inputs, local softmax ----
        s_v = jnp.dot(qd, w_v.astype(dtype),
                      preferred_element_type=jnp.float32) + b_v
        s_a = jnp.dot(qd, w_a.astype(dtype),
                      preferred_element_type=jnp.float32) + b_a
        a_v = _masked_softmax(s_v, vl)
        a_a = _masked_softmax(s_a, al)
        ctx_v = jnp.einsum("bl,blh->bh", a_v.astype(dtype), ev.astype(dtype),
                           preferred_element_type=jnp.float32)
        ctx_a = jnp.einsum("bl,blh->bh", a_a.astype(dtype), ea.astype(dtype),
                           preferred_element_type=jnp.float32)
        return ctx_t, ctx_a, ctx_v, a_t, a_a, a_v

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(None, "model"), P("model"),        # w_text, b_text
                  P(None, None), P(None),              # w_video, b_video
                  P(None, None), P(None),              # w_audio, b_audio
                  P("data", None),                     # query
                  P("data", "model", None),            # enc_text
                  P("data", None, None),               # enc_video
                  P("data", None, None),               # enc_audio
                  P("data"), P("data"), P("data")),    # lengths
        out_specs=(P("data", None),                    # ctx_text
                   P("data", None),                    # ctx_audio
                   P("data", None),                    # ctx_video
                   P("data", "model"),                 # text map (sharded)
                   P("data", None),                    # audio map
                   P("data", None)),                   # video map
    )
    ctx_t, ctx_a, ctx_v, a_t, a_a, a_v = fn(
        w_text, b_text, params.w_video, params.b_video,
        params.w_audio, params.b_audio, query, enc_text, enc_video,
        enc_audio, text_len, video_len, audio_len)
    return ctx_t, ctx_a, ctx_v, {"text": a_t[:, :lt], "audio": a_a,
                                 "video": a_v}
