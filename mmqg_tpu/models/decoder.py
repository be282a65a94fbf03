"""Decoders: tri-modal attention LSTM (flagship) and non-attention LSTM.

Attention decoder parity (reference ``AttnDecoder`` model/decoder.py:49-125):
  step(word, memories, state):
    emb   = E[word]                                  (B, 300)
    q     = [emb; h_top]                             (B, 812)
    ctx_{t,a,v} = location-attention per modality    (mmqg_tpu.ops.attention)
    x     = [emb; ctx_text; ctx_audio; ctx_video]    (B, 1452)
             (concat order per reference model/decoder.py:99)
    h,c   = LSTM_3x512(x, (h,c))  -> logits = W_o h_top + b_o
Initial state = text encoder final state (reference train.py:169).

TPU-first: teacher-forced training runs the whole target in one ``lax.scan``
(``teacher_forced_logits``) with the vocab projection batched over all steps
after the scan — one (B*T, 512) x (512, V) MXU matmul instead of T small ones.

Non-attention decoder parity (reference ``Decoder`` model/decoder.py:7-47):
conditions every step on a single fused AV vector. The reference's av_emb_dim
528 (= 128 + 400, config.py:66) never matched any produced tensor — its
driver is syntax-broken (non_attn_train.py:91). Here the AV vector is
[mean audio emb (128); final video hidden (512)] = 640 by default; the dim is
a parameter so the 528-compat shape remains constructible.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from mmqg_tpu.models import layers as L
from mmqg_tpu.ops import attention as A


class Memories(NamedTuple):
    """Static-shape attention memories + true lengths."""
    enc_text: jnp.ndarray    # (B, Lt, Ht)
    enc_video: jnp.ndarray   # (B, La, Hv)
    enc_audio: jnp.ndarray   # (B, La, Ha)
    text_len: jnp.ndarray    # (B,)
    video_len: jnp.ndarray   # (B,)
    audio_len: jnp.ndarray   # (B,)


# --------------------------------------------------------------- attention dec

def init(rng, *, n_vocab: int, word_emb_dim: int = 300,
         hidden_dim: int = 512, num_layers: int = 3, dropout: float = 0.2,
         video_emb_dim: int = 512, audio_emb_dim: int = 128,
         text_max_length: int = 283, av_max_length: int = 101) -> Dict:
    """The embedding table is shared with the text encoder and owned by the
    top-level model (reference train.py:236,245,255)."""
    k_attn, k_lstm, k_out = jax.random.split(rng, 3)
    lstm_in = word_emb_dim + hidden_dim + audio_emb_dim + video_emb_dim
    return {
        "attn": A.init(k_attn, query_dim=word_emb_dim + hidden_dim,
                       text_len=text_max_length, av_len=av_max_length),
        "lstm": L.lstm_init(k_lstm, lstm_in, hidden_dim, num_layers),
        "out": L.dense_init(k_out, hidden_dim, n_vocab),
    }


def step(
    params: Dict,
    emb_table: jnp.ndarray,             # (V, D) shared embedding table
    word: jnp.ndarray,                  # (B,) int32
    mem: Memories,
    state: Tuple[jnp.ndarray, jnp.ndarray],
    *,
    train: bool = False,
    dropout: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    use_pallas: bool = True,
    dtype=jnp.bfloat16,
    project: bool = True,
    attn_fn=None,
) -> Tuple[jnp.ndarray, Tuple, Dict[str, jnp.ndarray]]:
    """One decode step. Returns (logits (B,V) — or top hidden if
    ``project=False`` — , new state, attention maps).

    ``attn_fn``: alternative attention implementation with the
    ``trimodal_attention_xla`` signature minus ``use_pallas`` — e.g.
    ``ops.attention_sp.trimodal_attention_sp`` partial-bound to a mesh for
    gather-free sequence-parallel decoding (``mesh.sp_greedy_decode``)."""
    emb = jnp.take(emb_table, word, axis=0)                # (B, D)
    h_top = state[0][-1]                                   # (B, H)
    query = jnp.concatenate([emb, h_top], axis=-1)
    if attn_fn is None:
        attn_fn = partial(A.trimodal_attention, use_pallas=use_pallas)
    ctx_t, ctx_a, ctx_v, maps = attn_fn(
        params["attn"], query, mem.enc_text, mem.enc_video, mem.enc_audio,
        mem.text_len, mem.video_len, mem.audio_len, dtype=dtype)
    x = jnp.concatenate([emb, ctx_t, ctx_a, ctx_v], axis=-1)
    top, new_state = L.lstm_step(params["lstm"], x, state,
                                 dropout_rate=dropout,
                                 dropout_rng=dropout_rng, train=train,
                                 dtype=dtype)
    out = L.dense(params["out"], top, dtype=dtype) if project else top
    return out, new_state, maps


def teacher_forced_logits(
    params: Dict,
    emb_table: jnp.ndarray,             # (V, D) shared embedding table
    inputs: jnp.ndarray,                # (B, T) int32 — [<start>, tgt[:-1]]
    mem: Memories,
    init_state: Tuple[jnp.ndarray, jnp.ndarray],
    *,
    train: bool = False,
    dropout: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    use_pallas: bool = True,
    dtype=jnp.bfloat16,
    attn_fn=None,
) -> jnp.ndarray:
    """All-step teacher forcing (reference train.py:171-175) under one scan.
    Returns logits (B, T, V)."""
    def body(carry, tok_t):
        state, t = carry
        rng_t = (jax.random.fold_in(dropout_rng, t)
                 if dropout_rng is not None else None)
        top, new_state, _ = step(params, emb_table, tok_t, mem, state,
                                 train=train, dropout=dropout,
                                 dropout_rng=rng_t,
                                 use_pallas=use_pallas, dtype=dtype,
                                 project=False, attn_fn=attn_fn)
        return (new_state, t + 1), top

    (_, _), tops = lax.scan(body, (init_state, 0), jnp.swapaxes(inputs, 0, 1))
    tops = jnp.swapaxes(tops, 0, 1)                        # (B, T, H)
    B, T, H = tops.shape
    logits = L.dense(params["out"], tops.reshape(B * T, H), dtype=dtype)
    return logits.reshape(B, T, -1)


# ----------------------------------------------------------- non-attention dec

def init_non_attn(rng, *, n_vocab: int, word_emb_dim: int = 300,
                  av_emb_dim: int = 640, hidden_dim: int = 512,
                  num_layers: int = 3, dropout: float = 0.2) -> Dict:
    k_lstm, k_out = jax.random.split(rng)
    return {
        "lstm": L.lstm_init(k_lstm, word_emb_dim + av_emb_dim, hidden_dim,
                            num_layers),
        "out": L.dense_init(k_out, hidden_dim, n_vocab),
    }


def non_attn_step(params: Dict, emb_table: jnp.ndarray, word: jnp.ndarray,
                  av_vec: jnp.ndarray, state, *, train: bool = False,
                  dropout: float = 0.0,
                  dropout_rng=None, dtype=jnp.bfloat16):
    """One step of the AV-conditioned decoder (reference model/decoder.py:25-33)."""
    emb = jnp.take(emb_table, word, axis=0)
    x = jnp.concatenate([emb, av_vec], axis=-1)
    top, new_state = L.lstm_step(params["lstm"], x, state,
                                 dropout_rate=dropout,
                                 dropout_rng=dropout_rng, train=train,
                                 dtype=dtype)
    return L.dense(params["out"], top, dtype=dtype), new_state


def non_attn_teacher_forced(params: Dict, emb_table: jnp.ndarray,
                            inputs: jnp.ndarray,
                            av_vec: jnp.ndarray, init_state, *,
                            train: bool = False, dropout: float = 0.0,
                            dropout_rng=None,
                            dtype=jnp.bfloat16) -> jnp.ndarray:
    """(B, T) inputs -> (B, T, V) logits, one scan."""
    def body(carry, tok_t):
        state, t = carry
        rng_t = (jax.random.fold_in(dropout_rng, t)
                 if dropout_rng is not None else None)
        emb = jnp.take(emb_table, tok_t, axis=0)
        x = jnp.concatenate([emb, av_vec], axis=-1)
        top, new_state = L.lstm_step(params["lstm"], x, state,
                                     dropout_rate=dropout,
                                     dropout_rng=rng_t, train=train,
                                     dtype=dtype)
        return (new_state, t + 1), top

    (_, _), tops = lax.scan(body, (init_state, 0), jnp.swapaxes(inputs, 0, 1))
    tops = jnp.swapaxes(tops, 0, 1)
    B, T, H = tops.shape
    logits = L.dense(params["out"], tops.reshape(B * T, H), dtype=dtype)
    return logits.reshape(B, T, -1)
