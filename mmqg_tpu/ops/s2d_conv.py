"""Space-to-depth conv reformulation: 3x3 SAME conv as a 2x2 coarse conv.

Why: on TPU this compiler's conv rate is set by input-channel depth (measured
34/59/141 Tops/s at Cin=64/128/256 — scripts/probe_int8_conv2.py), so the
VGGish stack's shallow-Cin layers run at a fraction of the MXU rate. A 3x3
stride-1 SAME conv on an even-sized (H, W) input is EXACTLY a 2x2 VALID conv
on the 2x2-space-to-depth'd (pad-shifted) input with rearranged weights:

    y_fine = conv3x3_SAME(x_fine, W)                   (N, H, W, Cout)
  = d2s( conv2x2_VALID( s2d(pad(x_fine, 1)), W' ) )    W': (2,2,4Cin,4Cout)

16/9 the MACs (the scatter leaves zero blocks the MXU multiplies anyway) but
every dimension is 4x deeper, which more than pays at these shapes. The
rearrangement: coarse input cell p,q holds padded fine rows 2(I+p)+di, so a
fine kernel tap u = 2p + di - a (and v = 2q + dj - b) contributes where
0 <= u,v < 3 — everything else is zero.

As a bonus, a 2x2 fine max-pool after the conv never needs the fine layout:
it is a max over the (a, b) channel groups of the coarse output
(``group_max``), eliminating the pool's spatial reshuffle entirely.

All ops here are plain XLA (differentiable, shardable); parameters keep the
reference's fine (3,3,Cin,Cout) layout (reference model/encoder.py dims) and
are rearranged on the fly inside jit — checkpoints are unaffected.

STATUS — measured, NOT the default path (scripts/probe_s2d_conv.py, v5e):
the full fine-layout VGGish conv stack already runs at ~107 Tops/s (~54% of
bf16 peak) once XLA fuses relu/pool into the convs — the per-layer Cin
scaling that motivated this file does not compound to the full stack — and
2x2 coarse convs lower WORSE than 3x3 fine convs at equal depth (56-109
Tops/s). End-to-end: s2d stack 39.3 ms vs fine stack 30.4 ms at N=2048.
Kept as a tested exact reformulation for shapes where it does win (very
shallow Cin with no following pool to fuse).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def s2d(x: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, C) -> (N, H/2, W/2, 4C), channel order (di, dj, c)."""
    n, h, w, c = x.shape
    return x.reshape(n, h // 2, 2, w // 2, 2, c).transpose(
        0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)


def d2s(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`s2d`: (N, h, w, 4C) -> (N, 2h, 2w, C)."""
    n, h, w, c4 = x.shape
    c = c4 // 4
    return x.reshape(n, h, w, 2, 2, c).transpose(
        0, 1, 3, 2, 4, 5).reshape(n, 2 * h, 2 * w, c)


def group_max(x: jnp.ndarray) -> jnp.ndarray:
    """2x2 fine max-pool of a coarse (a, b, k)-channel tensor: a max over
    the 4-channel groups. Output is the FINE layout of the pooled map (the
    pooled fine grid coincides with the coarse grid)."""
    n, h, w, c4 = x.shape
    return x.reshape(n, h, w, 4, c4 // 4).max(axis=3)


def coarsen_weights(w: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, Cin, Cout) fine kernel -> (2, 2, 4Cin, 4Cout) coarse kernel.

    Pure gather/scatter of the fine taps (zero elsewhere); runs fine inside
    jit (it is tiny next to the conv) and is linear, so gradients flow back
    to the fine layout untouched."""
    kh, kw, cin, cout = w.shape
    assert (kh, kw) == (3, 3), "only 3x3 fine kernels are reformulated"
    wc = jnp.zeros((2, 2, 4 * cin, 4 * cout), w.dtype)
    for p in range(2):
        for q in range(2):
            for di in range(2):
                for dj in range(2):
                    for a in range(2):
                        for b in range(2):
                            u = 2 * p + di - a
                            v = 2 * q + dj - b
                            if 0 <= u < 3 and 0 <= v < 3:
                                ci = (di * 2 + dj) * cin
                                co = (a * 2 + b) * cout
                                wc = wc.at[p, q, ci:ci + cin,
                                           co:co + cout].set(w[u, v])
    return wc


def coarsen_bias(b: jnp.ndarray) -> jnp.ndarray:
    """(Cout,) fine bias -> (4Cout,) coarse bias (same bias per (a, b))."""
    return jnp.tile(b, 4)


def conv3x3_s2d(x_fine: jnp.ndarray, w_coarse: jnp.ndarray, *,
                dtype=jnp.bfloat16) -> jnp.ndarray:
    """3x3 SAME conv on fine (N, H, W, Cin), H, W even, computed coarse.

    Returns the COARSE output (N, H/2, W/2, 4Cout) with (a, b, k) channels
    — feed :func:`group_max` (when a 2x2 pool follows) or :func:`d2s` (when
    the fine layout is needed)."""
    xp = jnp.pad(x_fine, ((0, 0), (1, 1), (1, 1), (0, 0)))
    xc = s2d(xp)
    return lax.conv_general_dilated(
        xc.astype(dtype), w_coarse.astype(dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
