"""Pallas TPU kernels: fused VGGish convolutional feature extractor.

The VGGish conv stack dominates serving compute (PERF.md) and XLA runs it at
~40-55% MXU: every conv->pool boundary materialises activation tensors to
HBM. These kernels keep an example tile's activations in VMEM through whole
runs of the stack; each 3x3 SAME conv is expressed as shifted GEMMs with the
contraction over C_in (MXU-shaped for every layer past the first — the first
layer, C_in=1, uses a 9-tap im2col GEMM instead of nine rank-1 updates),
with relu fused and pooling as reshape-max on registers.

VMEM (~16 MB/core) cannot hold all six convs' weights (~9 MB bf16) plus the
large stage-1 activations, and this backend's Mosaic rejects the C_in=1 first
layer's lane-dim pad/shift at full 96x64 size, so the stack splits three
ways:

* conv64-pool stays in XLA: 7 MFLOP/example (0.4% of the stack), C_in=1 is
  MXU-hostile however expressed, and XLA's lowering handles it fine.
* stage A (Pallas): conv128-pool, conv256 x2-pool        (weights ~1.9 MB)
  (E, 48, 32, 64) -> (E, 12, 8, 256)
* stage B (Pallas): conv512 x2-pool                      (weights ~7.1 MB)
  (E, 12, 8, 256) -> (E, 6*4*512) features

The stage boundaries are bf16 HBM round-trips (~250 KB/example total —
small next to the multi-MB per-example traffic XLA's layer-by-layer
schedule pays on the 512-channel blocks).

The fc head (12288->4096->4096->128, ~100 MB of weights) stays outside in
XLA — a plain large GEMM XLA already runs well, and its weights don't fit
VMEM.

Forward-only (serving path; loss_fn keeps the XLA path, the repo-wide
convention for inference kernels). Oracle: mmqg_tpu.models.audio_encoder
embed_examples conv stack (tests/test_vggish_pallas.py).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False

# Mosaic requires the (examples, features) output block's sublane dim to be a
# multiple of 8; it is also the IO tile both kernels grid over.
E_TILE = 8


def _conv3x3_relu(x, w, b, dtype):
    """x (E, H, W, Cin), w (3, 3, Cin, Cout), b (Cout,) -> relu(conv SAME)."""
    E, H, W, Cin = x.shape
    Cout = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((E * H * W, Cout), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            tap = xp[:, ky:ky + H, kx:kx + W, :].reshape(E * H * W, Cin)
            acc = acc + jnp.dot(tap.astype(dtype), w[ky, kx].astype(dtype),
                                preferred_element_type=jnp.float32)
    y = jnp.maximum(acc + b, 0.0)
    return y.reshape(E, H, W, Cout).astype(dtype)


def _pool2(x):
    E, H, W, C = x.shape
    return x.reshape(E, H // 2, 2, W // 2, 2, C).max(axis=(2, 4))


def _kernel_a(x_ref, w2_ref, b2_ref, w3_ref, b3_ref,
              w4_ref, b4_ref, out_ref, *, dtype, sub: int):
    # stage-A activations are the big ones: process ``sub`` examples per
    # unrolled sub-step so live ranges stay small while the IO block stays
    # Mosaic-aligned at E_TILE.
    E = x_ref.shape[0]
    for s in range(E // sub):
        x = x_ref[s * sub:(s + 1) * sub]                    # (sub, 48, 32, 64)
        x = _conv3x3_relu(x, w2_ref[:], b2_ref[0], dtype)
        x = _pool2(x)                                       # (sub, 24, 16, 128)
        x = _conv3x3_relu(x, w3_ref[:], b3_ref[0], dtype)
        x = _conv3x3_relu(x, w4_ref[:], b4_ref[0], dtype)
        x = _pool2(x)                                       # (sub, 12, 8, 256)
        out_ref[s * sub:(s + 1) * sub] = x.astype(out_ref.dtype)


def _kernel_b(mid_ref, w5_ref, b5_ref, w6_ref, b6_ref, out_ref,
              *, dtype, sub: int):
    E = mid_ref.shape[0]
    for s in range(E // sub):
        x = mid_ref[s * sub:(s + 1) * sub].astype(dtype)    # (sub, 12, 8, 256)
        x = _conv3x3_relu(x, w5_ref[:], b5_ref[0], dtype)
        x = _conv3x3_relu(x, w6_ref[:], b6_ref[0], dtype)
        x = _pool2(x)                                       # (sub, 6, 4, 512)
        out_ref[s * sub:(s + 1) * sub] = x.reshape(sub, -1).astype(jnp.float32)


def _weight_args_specs(convs, lo, hi, dtype):
    args, specs = [], []
    for c in convs[lo:hi]:
        args.append(c["w"].astype(dtype))
        args.append(c["b"][None, :].astype(jnp.float32))
        specs.append(pl.BlockSpec(c["w"].shape, lambda i: (0, 0, 0, 0),
                                  memory_space=pltpu.VMEM))
        specs.append(pl.BlockSpec((1, c["b"].shape[0]), lambda i: (0, 0),
                                  memory_space=pltpu.VMEM))
    return args, specs


def vggish_features_pallas(params: Dict, mel: jnp.ndarray, *,
                           dtype=jnp.bfloat16, sub_a: int = 2,
                           sub_b: int = 4, interpret=None) -> jnp.ndarray:
    """(N, 96, 64) log-mel examples -> (N, 6*4*512) conv features.
    ``params`` is the audio_encoder pytree (uses params['convs'])."""
    from mmqg_tpu.models import layers as L

    if interpret is None:
        interpret = _INTERPRET
    for name, sub in (("sub_a", sub_a), ("sub_b", sub_b)):
        if E_TILE % sub:
            raise ValueError(f"E_TILE={E_TILE} not divisible by {name}={sub}")
    N = mel.shape[0]
    pad = (-N) % E_TILE
    if pad:
        mel = jnp.pad(mel, ((0, pad), (0, 0), (0, 0)))
    Np = mel.shape[0]
    convs = params["convs"]

    # conv1 + pool in XLA (see module docstring)
    x1 = jax.nn.relu(L.conv2d(convs[0], mel[..., None], padding="SAME",
                              dtype=dtype, out_dtype=dtype))
    x1 = L.maxpool2d(x1, 2)                                # (Np, 48, 32, 64)

    a_args, a_specs = _weight_args_specs(convs, 1, 4, dtype)
    mid = pl.pallas_call(
        functools.partial(_kernel_a, dtype=dtype, sub=sub_a),
        grid=(Np // E_TILE,),
        in_specs=[pl.BlockSpec((E_TILE, 48, 32, 64), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)] + a_specs,
        out_specs=pl.BlockSpec((E_TILE, 12, 8, 256), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Np, 12, 8, 256), dtype),
        interpret=interpret,
    )(x1, *a_args)

    b_args, b_specs = _weight_args_specs(convs, 4, 6, dtype)
    flat = 6 * 4 * 512
    out = pl.pallas_call(
        functools.partial(_kernel_b, dtype=dtype, sub=sub_b),
        grid=(Np // E_TILE,),
        in_specs=[pl.BlockSpec((E_TILE, 12, 8, 256), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)] + b_specs,
        out_specs=pl.BlockSpec((E_TILE, flat), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Np, flat), jnp.float32),
        interpret=interpret,
    )(mid, *b_args)
    return out[:N]


def embed_examples_pallas(params: Dict, mel: jnp.ndarray, *,
                          dtype=jnp.bfloat16, interpret=None) -> jnp.ndarray:
    """Drop-in for audio_encoder.embed_examples: fused conv features +
    XLA fc head."""
    from mmqg_tpu.models import layers as L

    x = vggish_features_pallas(params, mel, dtype=dtype, interpret=interpret)
    x = jax.nn.relu(L.dense(params["fc1"], x, dtype=dtype))
    x = jax.nn.relu(L.dense(params["fc2"], x, dtype=dtype))
    return jax.nn.relu(L.dense(params["fc3"], x, dtype=dtype))
