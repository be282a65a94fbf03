"""Core layers as pure functions over explicit param pytrees.

LSTM semantics match the reference's torch modules so capability/quality
carries over (gate order i,f,g,o; two bias vectors; per-layer dropout on all
but the last layer — reference model/encoder.py:91, model/decoder.py:69), but
the *execution* is TPU-native: whole sequences run under ``lax.scan`` with
batched (B, 4H) gate matmuls on the MXU instead of per-token Python loops
(reference train.py:164-166 stepped the LSTM one token at a time).

Weight init parity: orthogonal for >=2-D LSTM params, N(0,1) for biases
(reference model/encoder.py:102-107); xavier-uniform + N(0,1) bias for output
projections (reference model/decoder.py:116-117).

Dtype policy: parameters live in float32; matmul inputs are cast to
``compute_dtype`` (bfloat16 by default) and accumulation stays float32 via
``preferred_element_type`` — the standard TPU mixed-precision recipe.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

Params = Dict[str, Any]


# ----------------------------------------------------------------- initialisers

def orthogonal(rng, shape, dtype=jnp.float32, scale=1.0):
    return jax.nn.initializers.orthogonal(scale)(rng, shape, dtype)


def xavier_uniform(rng, shape, dtype=jnp.float32):
    return jax.nn.initializers.xavier_uniform()(rng, shape, dtype)


def normal(rng, shape, dtype=jnp.float32, stddev=1.0):
    return jax.random.normal(rng, shape, dtype) * stddev


# ----------------------------------------------------------------------- dense

def dense_init(rng, in_dim: int, out_dim: int, *, init="xavier") -> Params:
    kw, kb = jax.random.split(rng)
    if init == "xavier":
        w = xavier_uniform(kw, (in_dim, out_dim))
    else:
        w = normal(kw, (in_dim, out_dim), stddev=1.0 / math.sqrt(in_dim))
    # reference initialises Linear biases ~ N(0,1) (model/decoder.py:117)
    return {"w": w, "b": normal(kb, (out_dim,))}


def dense(params: Params, x: jnp.ndarray, *, dtype=jnp.bfloat16) -> jnp.ndarray:
    y = jnp.dot(x.astype(dtype), params["w"].astype(dtype),
                preferred_element_type=jnp.float32)
    return y + params["b"]


# ------------------------------------------------------------------- embedding

def embedding_init(weights) -> Params:
    """Embedding from a pre-built (V, D) matrix (GloVe slice).
    Stored float32 — the reference's ``.long()`` cast (train.py:227) truncated
    it to integers; that bug is deliberately not reproduced."""
    return {"table": jnp.asarray(weights, jnp.float32)}


def embed(params: Params, ids: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(params["table"], ids, axis=0)


# ------------------------------------------------------------------------ LSTM
# Single fused weight layout per layer:
#   wx: (In, 4H)   wh: (H, 4H)   b: (4H,)  (= torch b_ih + b_hh)
# Gate order i, f, g, o (torch convention).

def lstm_init(rng, input_dim: int, hidden_dim: int, num_layers: int) -> Params:
    layers = []
    for layer in range(num_layers):
        in_d = input_dim if layer == 0 else hidden_dim
        rng, kx, kh, kb1, kb2 = jax.random.split(rng, 5)
        # orthogonal per reference model/encoder.py:102-107 (gate blocks
        # individually orthogonal, matching torch's (4H, In) param treated as
        # one matrix is impossible for non-square; per-gate is the sane analog)
        wx = jnp.concatenate([orthogonal(k, (in_d, hidden_dim))
                              for k in jax.random.split(kx, 4)], axis=1)
        wh = jnp.concatenate([orthogonal(k, (hidden_dim, hidden_dim))
                              for k in jax.random.split(kh, 4)], axis=1)
        b = normal(kb1, (4 * hidden_dim,)) + normal(kb2, (4 * hidden_dim,))
        layers.append({"wx": wx, "wh": wh, "b": b})
    # array-only pytree: layer count / width are derived from shapes so the
    # whole params tree is differentiable and optax-compatible
    return {"layers": layers}


def lstm_dims(params: Params) -> Tuple[int, int]:
    """(num_layers, hidden_dim) derived from parameter shapes."""
    return len(params["layers"]), params["layers"][0]["wh"].shape[0]


def lstm_zero_state(num_layers: int, batch: int, hidden_dim: int,
                    dtype=jnp.float32) -> Tuple[jnp.ndarray, jnp.ndarray]:
    z = jnp.zeros((num_layers, batch, hidden_dim), dtype)
    return z, z


def _cell(layer: Params, x, h, c, *, dtype=jnp.bfloat16):
    gates = (
        jnp.dot(x.astype(dtype), layer["wx"].astype(dtype),
                preferred_element_type=jnp.float32)
        + jnp.dot(h.astype(dtype), layer["wh"].astype(dtype),
                  preferred_element_type=jnp.float32)
        + layer["b"]
    )
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, c_new


def lstm_step(
    params: Params,
    x: jnp.ndarray,                       # (B, In)
    state: Tuple[jnp.ndarray, jnp.ndarray],  # each (L, B, H)
    *,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    train: bool = False,
    dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """One time step through the full stack. Returns (top h, new state)."""
    h_all, c_all = state
    hs, cs = [], []
    inp = x
    n = len(params["layers"])
    for li, layer in enumerate(params["layers"]):
        h_new, c_new = _cell(layer, inp, h_all[li], c_all[li], dtype=dtype)
        hs.append(h_new)
        cs.append(c_new)
        inp = h_new
        if train and dropout_rate > 0.0 and li < n - 1 and dropout_rng is not None:
            keep = jax.random.bernoulli(
                jax.random.fold_in(dropout_rng, li), 1.0 - dropout_rate, inp.shape)
            inp = jnp.where(keep, inp / (1.0 - dropout_rate), 0.0)
    return inp, (jnp.stack(hs), jnp.stack(cs))


def lstm_scan(
    params: Params,
    xs: jnp.ndarray,                      # (B, T, In)
    state: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    *,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    train: bool = False,
    dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """Whole-sequence LSTM via ``lax.scan`` over time. Returns
    (outputs (B, T, H), final (h, c)). Layer-by-layer scan (layer li consumes
    the full output sequence of li-1) so each scan body is one big (B,4H)
    matmul pair — better MXU utilisation than stacking layers inside one body."""
    B, T, _ = xs.shape
    L, H = lstm_dims(params)
    if state is None:
        state = lstm_zero_state(L, B, H)
    h0_all, c0_all = state

    seq = xs
    final_h, final_c = [], []
    for li, layer in enumerate(params["layers"]):
        def body(carry, x_t, layer=layer):
            h, c = carry
            h_new, c_new = _cell(layer, x_t, h, c, dtype=dtype)
            return (h_new, c_new), h_new

        (h_f, c_f), outs = lax.scan(body, (h0_all[li], c0_all[li]),
                                    jnp.swapaxes(seq, 0, 1))
        seq = jnp.swapaxes(outs, 0, 1)  # (B, T, H)
        final_h.append(h_f)
        final_c.append(c_f)
        if train and dropout_rate > 0.0 and li < L - 1 and dropout_rng is not None:
            keep = jax.random.bernoulli(
                jax.random.fold_in(dropout_rng, li), 1.0 - dropout_rate, seq.shape)
            seq = jnp.where(keep, seq / (1.0 - dropout_rate), 0.0)
    return seq, (jnp.stack(final_h), jnp.stack(final_c))


# ------------------------------------------------------------------------ conv

def conv_init(rng, in_ch: int, out_ch: int, kernel: int) -> Params:
    kw, kb = jax.random.split(rng)
    fan_in = in_ch * kernel * kernel
    bound = 1.0 / math.sqrt(fan_in)  # torch Conv2d default init
    w = jax.random.uniform(kw, (kernel, kernel, in_ch, out_ch),
                           jnp.float32, -bound, bound)
    b = jax.random.uniform(kb, (out_ch,), jnp.float32, -bound, bound)
    return {"w": w, "b": b}


def conv2d(params: Params, x: jnp.ndarray, *, stride: int = 1,
           padding: str = "VALID", dtype=jnp.bfloat16,
           out_dtype=jnp.float32) -> jnp.ndarray:
    """NHWC conv (TPU-native layout; the reference used NCHW torch convs).

    Runs natively in ``dtype`` (mixing bf16 operands with
    ``preferred_element_type=f32`` breaks the conv transpose (grad) rule in
    jax, and TPU conv hardware accumulates in f32 internally regardless).
    ``out_dtype`` controls the materialised activation dtype: conv->pool
    boundaries cannot fuse, so wide activation stacks (the VGGish audio
    encoder: ~10 GB of f32 intermediates per large batch) should keep bf16
    activations to halve HBM traffic."""
    y = lax.conv_general_dilated(
        x.astype(dtype), params["w"].astype(dtype),
        window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y.astype(out_dtype) + params["b"].astype(out_dtype)


def maxpool2d(x: jnp.ndarray, window: int, stride: Optional[int] = None) -> jnp.ndarray:
    stride = stride or window
    N, H, W, C = x.shape
    if stride == window:
        # Non-overlapping pool as crop + reshape-max — bit-identical to
        # reduce_window VALID (whose windows also stop at the last full
        # multiple), but the BACKWARD is a compare/select mask instead of
        # reduce_window's SelectAndScatter, which XLA:TPU lowers
        # catastrophically (the VGGish backward was 8x its forward; the fix
        # measured 1.44x on the trimodal train step).
        Hc, Wc = (H // window) * window, (W // window) * window
        x = x[:, :Hc, :Wc]
        return x.reshape(N, Hc // window, window, Wc // window, window,
                         C).max(axis=(2, 4))
    return lax.reduce_window(
        x, -jnp.inf, lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding="VALID",
    )


# -------------------------------------------------------------------- batchnorm

def batchnorm_init(ch: int) -> Tuple[Params, Params]:
    """Returns (trainable params, running state)."""
    return (
        {"scale": jnp.ones((ch,)), "bias": jnp.zeros((ch,))},
        {"mean": jnp.zeros((ch,)), "var": jnp.ones((ch,)), "count": jnp.zeros(())},
    )


def batchnorm(params: Params, state: Params, x: jnp.ndarray, *, train: bool,
              momentum: float = 0.1, eps: float = 1e-5):
    """Channel-last batchnorm (reference used torch BatchNorm2d,
    model/encoder.py:41-49). Returns (y, new_state).

    Statistics and the normalisation run in f32 regardless of the
    activation dtype; the output is cast back to ``x.dtype`` so bf16
    activation stacks stay bf16 across the conv->bn->pool boundaries
    (the f32 maths fuses into the surrounding elementwise chain — no f32
    buffer is materialised)."""
    xf = x.astype(jnp.float32)
    if train:
        axes = tuple(range(x.ndim - 1))
        mean = jnp.mean(xf, axes)
        var = jnp.var(xf, axes)
        # torch updates running_var with the UNBIASED variance (n/(n-1))
        # while normalising with the biased one — match both
        n = float(math.prod(x.shape[:-1]))
        var_unbiased = var * (n / max(n - 1.0, 1.0))
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * var_unbiased,
            "count": state["count"] + 1,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    y = (xf - mean) * lax.rsqrt(var + eps) * params["scale"] + params["bias"]
    return y.astype(x.dtype), new_state
