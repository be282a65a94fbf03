"""R(2+1)D-18 video encoder — the reference's alternative backbone.

Parity target: reference ``VideoResnetEncoder`` (model/encoder.py:21-29)
wrapped torchvision's ``r2plus1d_18`` (constructed but unused by the drivers;
kept in the inventory per SURVEY.md §2 C14). This is the architecture built
TPU-native: every 3-D conv is decomposed into a spatial (1, k, k) conv and a
temporal (k, 1, 1) conv with the standard midplane count
M = floor(t*d^2*Cin*Cout / (d^2*Cin + t*Cout)), BN+ReLU between them —
the R(2+1)D factorisation (Tran et al., CVPR 2018).

Layout: NDHWC (channels-last; TPU-native), all convs via
``lax.conv_general_dilated`` with 3-D dimension numbers.

Structure (r2plus1d_18):
  stem: (2+1)D 3->64, spatial stride 2
  4 stages x 2 basic blocks: 64, 128, 256, 512 (stages 2-4 stride 2 in T,H,W)
  global avg pool -> (B, 512) embedding; optional fc head.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from mmqg_tpu.models import layers as L

_STAGES = (64, 128, 256, 512)


def _conv3d_init(rng, cin: int, cout: int, kt: int, kh: int, kw: int) -> Dict:
    fan_in = cin * kt * kh * kw
    bound = 1.0 / math.sqrt(fan_in)
    w = jax.random.uniform(rng, (kt, kh, kw, cin, cout), jnp.float32,
                           -bound, bound)
    return {"w": w}


def _conv3d(params: Dict, x: jnp.ndarray, stride: Tuple[int, int, int],
            dtype=jnp.bfloat16) -> jnp.ndarray:
    kt, kh, kw = params["w"].shape[:3]
    pad = [(kt // 2, kt // 2), (kh // 2, kh // 2), (kw // 2, kw // 2)]
    return lax.conv_general_dilated(
        x.astype(dtype), params["w"].astype(dtype),
        window_strides=stride, padding=pad,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    ).astype(jnp.float32)


def _midplanes(cin: int, cout: int, kt: int = 3, ks: int = 3) -> int:
    return (kt * ks * ks * cin * cout) // (ks * ks * cin + kt * cout)


def _conv2plus1d_init(rng, cin: int, cout: int, *, kt=3, ks=3) -> Tuple[Dict, Dict, Dict]:
    m = _midplanes(cin, cout, kt, ks)
    k1, k2 = jax.random.split(rng)
    spatial = _conv3d_init(k1, cin, m, 1, ks, ks)
    temporal = _conv3d_init(k2, m, cout, kt, 1, 1)
    bn_mid_p, bn_mid_s = L.batchnorm_init(m)
    return ({"spatial": spatial, "temporal": temporal, "bn_mid": bn_mid_p},
            {"bn_mid": bn_mid_s}, {"mid": m})


def _conv2plus1d(params: Dict, state: Dict, x: jnp.ndarray,
                 stride: Tuple[int, int, int], *, train: bool,
                 dtype=jnp.bfloat16):
    st, sh, sw = stride
    y = _conv3d(params["spatial"], x, (1, sh, sw), dtype=dtype)
    y, bn_s = L.batchnorm(params["bn_mid"], state["bn_mid"], y, train=train)
    y = jax.nn.relu(y)
    y = _conv3d(params["temporal"], y, (st, 1, 1), dtype=dtype)
    return y, {"bn_mid": bn_s}


def _block_init(rng, cin: int, cout: int, downsample: bool):
    ks = jax.random.split(rng, 3)
    c1p, c1s, _ = _conv2plus1d_init(ks[0], cin, cout)
    c2p, c2s, _ = _conv2plus1d_init(ks[1], cout, cout)
    bn1p, bn1s = L.batchnorm_init(cout)
    bn2p, bn2s = L.batchnorm_init(cout)
    params = {"conv1": c1p, "conv2": c2p, "bn1": bn1p, "bn2": bn2p}
    state = {"conv1": c1s, "conv2": c2s, "bn1": bn1s, "bn2": bn2s}
    if downsample:
        params["down"] = _conv3d_init(ks[2], cin, cout, 1, 1, 1)
        dp, dsb = L.batchnorm_init(cout)
        params["down_bn"] = dp
        state["down_bn"] = dsb
    return params, state


def _block(params, state, x, stride, *, train, dtype=jnp.bfloat16):
    y, s1 = _conv2plus1d(params["conv1"], state["conv1"], x, stride,
                         train=train, dtype=dtype)
    y, b1 = L.batchnorm(params["bn1"], state["bn1"], y, train=train)
    y = jax.nn.relu(y)
    y, s2 = _conv2plus1d(params["conv2"], state["conv2"], y, (1, 1, 1),
                         train=train, dtype=dtype)
    y, b2 = L.batchnorm(params["bn2"], state["bn2"], y, train=train)
    if "down" in params:
        sc = _conv3d(params["down"], x, stride, dtype=dtype)
        sc, db = L.batchnorm(params["down_bn"], state["down_bn"], sc,
                             train=train)
        new_state = {"conv1": s1, "conv2": s2, "bn1": b1, "bn2": b2,
                     "down_bn": db}
    else:
        sc = x
        new_state = {"conv1": s1, "conv2": s2, "bn1": b1, "bn2": b2}
    return jax.nn.relu(y + sc), new_state


def init(rng, *, in_channels: int = 3, embed_dim: Optional[int] = None):
    """Returns (params, state). ``embed_dim`` adds a linear head (the
    torchvision model's fc-400); None returns pooled 512-d features."""
    ks = jax.random.split(rng, 11)
    stem_s = _conv3d_init(ks[0], in_channels, 45, 1, 7, 7)
    stem_t = _conv3d_init(ks[1], 45, 64, 3, 1, 1)
    stem_bn_p, stem_bn_s = L.batchnorm_init(45)
    stem_bn2_p, stem_bn2_s = L.batchnorm_init(64)
    params = {"stem_s": stem_s, "stem_t": stem_t, "stem_bn": stem_bn_p,
              "stem_bn2": stem_bn2_p, "stages": []}
    state = {"stem_bn": stem_bn_s, "stem_bn2": stem_bn2_s, "stages": []}
    ki = 2
    cin = 64
    for si, cout in enumerate(_STAGES):
        blocks_p, blocks_s = [], []
        for bi in range(2):
            down = (bi == 0 and (si > 0))
            bp, bs = _block_init(ks[ki], cin if bi == 0 else cout, cout, down)
            blocks_p.append(bp)
            blocks_s.append(bs)
            ki += 1
            cin = cout
        params["stages"].append(blocks_p)
        state["stages"].append(blocks_s)
    if embed_dim is not None:
        params["fc"] = L.dense_init(ks[10], 512, embed_dim)
    return params, state


# Stages 2-4 each stride the temporal axis by 2 (stem is (1, 2, 2)):
TEMPORAL_DOWNSAMPLE = 8


def temporal_out_len(n_frames):
    """Frame count -> trunk temporal length (SAME padding, three stride-2
    temporal convs: ceil(n/8)). Works on ints and integer arrays."""
    return -(-n_frames // TEMPORAL_DOWNSAMPLE)


def _trunk(params, state, clips: jnp.ndarray, *, train: bool,
           dtype=jnp.bfloat16):
    """Shared stem+stages: clips (B, T, H, W, 3) float ->
    ((B, T', H', W', 512) features, new_state), T' = ceil(T/8)."""
    x = clips
    x = _conv3d(params["stem_s"], x, (1, 2, 2), dtype=dtype)
    x, sbn = L.batchnorm(params["stem_bn"], state["stem_bn"], x, train=train)
    x = jax.nn.relu(x)
    x = _conv3d(params["stem_t"], x, (1, 1, 1), dtype=dtype)
    x, sbn2 = L.batchnorm(params["stem_bn2"], state["stem_bn2"], x,
                          train=train)
    x = jax.nn.relu(x)
    new_state = {"stem_bn": sbn, "stem_bn2": sbn2, "stages": []}
    for si, blocks in enumerate(params["stages"]):
        stage_state = []
        for bi, bp in enumerate(blocks):
            stride = (2, 2, 2) if (bi == 0 and si > 0) else (1, 1, 1)
            x, bs = _block(bp, state["stages"][si][bi], x, stride,
                           train=train, dtype=dtype)
            stage_state.append(bs)
        new_state["stages"].append(stage_state)
    return x, new_state


def apply(params, state, clips: jnp.ndarray, *, train: bool = False,
          dtype=jnp.bfloat16):
    """clips (B, T, H, W, 3) float -> (B, 512) or (B, embed_dim) embeddings.
    Returns (embeddings, new_state)."""
    x, new_state = _trunk(params, state, clips, train=train, dtype=dtype)
    emb = x.mean(axis=(1, 2, 3))                       # global avg pool
    if "fc" in params:
        emb = L.dense(params["fc"], emb, dtype=dtype)
    return emb, new_state


def apply_temporal(params, state, clips: jnp.ndarray, *, train: bool = False,
                   dtype=jnp.bfloat16):
    """Per-timestep features for attention memories: clips (B, T, H, W, 3)
    float -> ((B, ceil(T/8), 512-or-embed_dim), new_state) — the trunk's
    temporal axis with H/W average-pooled, fc (if any) applied per step.

    The reference never wired its ``VideoResnetEncoder`` into a driver
    (constructed-but-unused, reference model/encoder.py:21-29), so there is
    no reference semantics for the attention memory; averaging only space and
    keeping the native temporal stride is the natural TPU-first choice (the
    decoder attends over ceil(T/8) steps instead of T). Time-pooling these
    features reproduces ``apply`` exactly (fc is linear; tested)."""
    x, new_state = _trunk(params, state, clips, train=train, dtype=dtype)
    feats = x.mean(axis=(2, 3))                        # (B, T', 512)
    if "fc" in params:
        feats = L.dense(params["fc"], feats, dtype=dtype)
    return feats, new_state
