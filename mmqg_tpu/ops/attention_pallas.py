"""Pallas TPU kernel for tri-modal location attention.

See mmqg_tpu/ops/attention.py for the op contract. This module provides the
fused-TPU implementation; until the fused kernel lands (kernel phase of the
build), it delegates to the XLA implementation so the dispatcher is always
correct. The fused kernel design (implemented below in `fused` when ready):

  grid over batch tiles; per program:
    scores = q_tile @ W_all (one MXU pass over the concatenated heads)
    three in-register masked softmaxes (f32)
    ctx_m = alpha_m @ memory_m tile (MXU)
  with a custom VJP mirroring the same fusion for the backward pass.
"""

from __future__ import annotations

import jax.numpy as jnp


def trimodal_attention_pallas(params, query, enc_text, enc_video, enc_audio,
                              text_len, video_len, audio_len, *,
                              dtype=jnp.bfloat16):
    from mmqg_tpu.ops.attention import trimodal_attention_xla
    return trimodal_attention_xla(params, query, enc_text, enc_video,
                                  enc_audio, text_len, video_len, audio_len,
                                  dtype=dtype)
