"""Text encoder: shared embedding -> 3-layer LSTM over the context.

Parity target: reference ``TextEncoder`` (model/encoder.py:80-111) — GloVe
embedding (shared with the decoder, reference train.py:236,245,255), LSTM
hidden 512 x 3 layers, dropout 0.2 between layers, zero initial state.

TPU-first difference: the whole padded context (B, 283) runs in one
``lax.scan`` (reference stepped one token at a time from the driver,
train.py:164-166). The returned per-step outputs are the decoder's text
attention memory; the final (h, c) seeds the decoder state
(reference train.py:169: ``dec_hidden = text_enc_hidden``).

Padding note: scanning past ``context_len`` pollutes the *final* state with
pad steps, which the reference (exact-length loop) never did. We therefore
collect per-step states and gather each sample's state at ``context_len - 1``
— bitwise the same semantics as the reference's dynamic loop, with static
shapes.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from mmqg_tpu.models import layers as L


def init(rng, *, emb_dim: int = 300, hidden_dim: int = 512,
         num_layers: int = 3, dropout: float = 0.2) -> Dict:
    """The embedding table is NOT owned here: it is shared with the decoder
    and lives once at the model top level (reference train.py:236,245,255
    passed one Embedding into both modules)."""
    return {"lstm": L.lstm_init(rng, emb_dim, hidden_dim, num_layers)}


def apply(
    params: Dict,
    emb_table: jnp.ndarray,         # (V, D) shared embedding table
    context_ids: jnp.ndarray,       # (B, Lc) int32
    context_len: jnp.ndarray,       # (B,) int32
    *,
    train: bool = False,
    dropout: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    use_pallas: bool = False,
    dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """Returns (enc_outputs (B, Lc, H) zero-masked past length,
    state-at-length (h, c) each (L, B, H))."""
    B, Lc = context_ids.shape
    lstm = params["lstm"]
    nl, H = L.lstm_dims(lstm)
    emb = jnp.take(emb_table, context_ids, axis=0)           # (B, Lc, D)

    if use_pallas and not train and jax.default_backend() not in ("cpu",):
        # fused Pallas sequence kernel: weights stay VMEM-resident across all
        # Lc steps; masking + final-state latching happen in-kernel
        from mmqg_tpu.ops.lstm_pallas import lstm_stack_pallas
        return lstm_stack_pallas(lstm, emb, lengths=context_len,
                                 mask_output=True, dtype=dtype)

    # Single scan over time. The per-sample final state (at context_len-1) is
    # LATCHED inside the carry instead of materialising every step's stacked
    # state (which would write Lc*L*B*H*2 floats of HBM just to gather B rows).
    def body(carry, inp):
        (h, c, lh, lc) = carry
        x_t, t = inp
        # fold the step index into the dropout rng: every timestep must get
        # an independent between-layer mask (torch per-step dropout; the
        # decoder scan does the same, decoder.py teacher_forced_logits)
        step_rng = (jax.random.fold_in(dropout_rng, t)
                    if dropout_rng is not None else None)
        top, (h2, c2) = L.lstm_step(lstm, x_t, (h, c),
                                    dropout_rate=dropout,
                                    dropout_rng=step_rng, train=train,
                                    dtype=dtype)
        is_last = (context_len - 1 == t)[None, :, None]      # (1, B, 1)
        lh = jnp.where(is_last, h2, lh)
        lc = jnp.where(is_last, c2, lc)
        return (h2, c2, lh, lc), top

    z = L.lstm_zero_state(nl, B, H)
    init = (z[0], z[1], z[0], z[1])
    (_, _, lh, lc), tops = lax.scan(
        body, init, (jnp.swapaxes(emb, 0, 1), jnp.arange(Lc)))
    enc_outputs = jnp.swapaxes(tops, 0, 1)                   # (B, Lc, H)

    # mask outputs past the true length (reference wrote into a zero buffer —
    # train.py:160-166 — so padded positions were exactly zero)
    mask = (jnp.arange(Lc)[None, :] < context_len[:, None])[..., None]
    enc_outputs = jnp.where(mask, enc_outputs, 0.0)
    return enc_outputs, (lh, lc)
