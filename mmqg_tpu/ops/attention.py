"""Tri-modal location-based attention — the decoder's hot op.

Semantics (reference model/decoder.py:74-99, with its bugs fixed):
for query q = [word_emb; h_top] (B, Dq):
  scores_m = q @ W_m + b_m                         (B, L_m)   3 modalities
  scores_m[j >= len_m] = -inf                      (the reference's masking
        indexed the batch dim of a (1, L) tensor — a no-op; fixed here, and
        the audio head is masked by its own length, not ``enc_frames``)
  alpha_m = softmax(scores_m)
  ctx_m   = alpha_m @ memory_m                     (B, D_m)

The XLA path is three dense matmuls + masked softmaxes + batched matvecs —
XLA fuses these well already. The Pallas path (``attention_pallas``) fuses all
three heads into one kernel: one fused (B, Dq) x (Dq, L_t+L_v+L_a) score
matmul, in-register masked softmax, and the three context matvecs, with a
custom VJP so the backward pass is fused too (see mmqg_tpu/ops/README in
docstrings). Numerics: scores accumulate in f32; softmax in f32.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from mmqg_tpu.models import layers as L

_NEG_INF = -1e30  # finite -inf stand-in: keeps masked softmax NaN-free


class AttnParams(NamedTuple):
    """Weights of the three location heads. w_*: (Dq, L_*), b_*: (L_*,)."""
    w_text: jnp.ndarray
    b_text: jnp.ndarray
    w_video: jnp.ndarray
    b_video: jnp.ndarray
    w_audio: jnp.ndarray
    b_audio: jnp.ndarray


def init(rng, *, query_dim: int, text_len: int, av_len: int) -> AttnParams:
    """Xavier weights + N(0,1) biases (reference model/decoder.py:118-123)."""
    ks = jax.random.split(rng, 6)
    return AttnParams(
        w_text=L.xavier_uniform(ks[0], (query_dim, text_len)),
        b_text=L.normal(ks[1], (text_len,)),
        w_video=L.xavier_uniform(ks[2], (query_dim, av_len)),
        b_video=L.normal(ks[3], (av_len,)),
        w_audio=L.xavier_uniform(ks[4], (query_dim, av_len)),
        b_audio=L.normal(ks[5], (av_len,)),
    )


def _masked_softmax(scores: jnp.ndarray, length: jnp.ndarray) -> jnp.ndarray:
    """(B, L) scores, (B,) lengths -> (B, L) attention weights."""
    Lax = scores.shape[-1]
    mask = jnp.arange(Lax)[None, :] < length[:, None]
    scores = jnp.where(mask, scores, _NEG_INF)
    return jax.nn.softmax(scores.astype(jnp.float32), axis=-1)


def trimodal_attention_xla(
    params: AttnParams,
    query: jnp.ndarray,        # (B, Dq) = [word_emb; h_top]
    enc_text: jnp.ndarray,     # (B, Lt, Ht)
    enc_video: jnp.ndarray,    # (B, La, Hv)
    enc_audio: jnp.ndarray,    # (B, La, Ha)
    text_len: jnp.ndarray,     # (B,)
    video_len: jnp.ndarray,    # (B,)
    audio_len: jnp.ndarray,    # (B,)
    *,
    dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Returns (ctx_text (B,Ht), ctx_audio (B,Ha), ctx_video (B,Hv), attn maps)."""
    q = query.astype(dtype)
    # one fused score matmul across all three heads
    w_all = jnp.concatenate([params.w_text, params.w_video, params.w_audio],
                            axis=1).astype(dtype)
    b_all = jnp.concatenate([params.b_text, params.b_video, params.b_audio])
    scores = jnp.dot(q, w_all, preferred_element_type=jnp.float32) + b_all
    Lt = params.w_text.shape[1]
    La = params.w_video.shape[1]
    s_t, s_v, s_a = (scores[:, :Lt], scores[:, Lt:Lt + La], scores[:, Lt + La:])

    a_t = _masked_softmax(s_t, text_len)
    a_v = _masked_softmax(s_v, video_len)
    a_a = _masked_softmax(s_a, audio_len)

    ctx_t = jnp.einsum("bl,blh->bh", a_t.astype(dtype), enc_text.astype(dtype),
                       preferred_element_type=jnp.float32)
    ctx_v = jnp.einsum("bl,blh->bh", a_v.astype(dtype), enc_video.astype(dtype),
                       preferred_element_type=jnp.float32)
    ctx_a = jnp.einsum("bl,blh->bh", a_a.astype(dtype), enc_audio.astype(dtype),
                       preferred_element_type=jnp.float32)
    maps = {"text": a_t, "audio": a_a, "video": a_v}
    return ctx_t, ctx_a, ctx_v, maps


def trimodal_attention(params, query, enc_text, enc_video, enc_audio,
                       text_len, video_len, audio_len, *,
                       use_pallas: bool = True, dtype=jnp.bfloat16):
    """Backend dispatcher. The Pallas kernel is used on TPU when available;
    CPU (tests, virtual meshes) always takes the XLA path."""
    if use_pallas and jax.default_backend() not in ("cpu",):
        from mmqg_tpu.ops.attention_pallas import trimodal_attention_pallas
        return trimodal_attention_pallas(
            params, query, enc_text, enc_video, enc_audio,
            text_len, video_len, audio_len, dtype=dtype)
    return trimodal_attention_xla(
        params, query, enc_text, enc_video, enc_audio,
        text_len, video_len, audio_len, dtype=dtype)
