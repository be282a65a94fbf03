"""Video encoder: per-frame CNN pyramid -> LSTM over frames.

Parity target: reference ``VideoConvLstmEncoder`` (model/encoder.py:31-78):
  conv(3->4,k3,valid) relu bn -> conv(4->6) relu bn -> maxpool3
  conv(6->8) relu bn -> conv(8->10) relu bn -> maxpool3
  flatten (10 x 10 x 10 = 1000, the ``flatten_dim`` contract of
  reference config.py:77) -> LSTM(1000 -> 512, 1 layer) over frames.

TPU-first: all B*T frames go through the CNN as **one** batched NHWC conv
stack (the reference convolved T frames of one sample at a time,
model/encoder.py:58-71), then one ``lax.scan`` LSTM over T. BN statistics are
computed over valid frames only (padding frames would poison them).

An ``r2plus1d``-style 3-D ResNet alternative (reference VideoResnetEncoder,
model/encoder.py:21-29 — present but unused by the drivers) is provided in
``video_resnet.py``.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from mmqg_tpu.models import layers as L

_CHANNELS = (4, 6, 8, 10)  # reference model/encoder.py:40-50


def flatten_dim_for(frame_size: int, kernel: int = 3) -> int:
    """Flattened CNN feature size for a square input. 112 -> 1000, matching
    the reference ``flatten_dim`` contract (reference config.py:77)."""
    s = frame_size
    s = s - (kernel - 1)          # conv1 valid
    s = s - (kernel - 1)          # conv2 valid
    s = s // 3                    # maxpool 3
    s = s - (kernel - 1)          # conv3
    s = s - (kernel - 1)          # conv4
    s = s // 3                    # maxpool 3
    return s * s * _CHANNELS[-1]


def init(rng, *, in_channels: int = 3, kernel: int = 3,
         hidden_dim: int = 512, flatten_dim: int = 1000) -> Dict:
    ks = jax.random.split(rng, 5)
    convs, bns, bn_state = [], [], []
    c_in = in_channels
    for i, c_out in enumerate(_CHANNELS):
        convs.append(L.conv_init(ks[i], c_in, c_out, kernel))
        p, s = L.batchnorm_init(c_out)
        bns.append(p)
        bn_state.append(s)
        c_in = c_out
    return {
        "convs": convs,
        "bns": bns,
        "lstm": L.lstm_init(ks[4], flatten_dim, hidden_dim, 1),
    }, {"bns": bn_state}


def fold_normalization(conv1: Dict, mean, std) -> Dict:
    """Absorb ``(u8/255 - mean)/std`` into the first conv's weights+bias so
    raw uint8 frames feed the conv directly — the whole host/device transform
    stage (reference utils/custom_transforms.py:14-21) becomes free.
    conv(x*scale + shift, W) = conv(x, W*scale) + sum(W*shift)."""
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    scale = 1.0 / (255.0 * std)                       # (3,)
    shift = -mean / std                               # (3,)
    w = conv1["w"]                                    # (k, k, 3, C)
    w2 = w * scale[None, None, :, None]
    b2 = conv1["b"] + (w * shift[None, None, :, None]).sum((0, 1, 2))
    return {"w": w2, "b": b2}


def cnn_features(params: Dict, state: Dict, frames: jnp.ndarray, *,
                 train: bool, frame_mask: Optional[jnp.ndarray] = None,
                 normalization: Optional[Tuple] = None,
                 dtype=jnp.bfloat16) -> Tuple[jnp.ndarray, Dict]:
    """(N, H, W, 3) frames -> (N, flatten_dim) features. Frames may be uint8
    with ``normalization=(mean, std)`` (folded into conv1, see
    fold_normalization) or pre-normalised float.
    ``frame_mask`` (N,) bool selects frames contributing to BN statistics."""
    x = frames
    convs = list(params["convs"])
    if normalization is not None:
        convs[0] = fold_normalization(convs[0], *normalization)
    new_bn_state = []
    for i, (conv, bn, bn_s) in enumerate(zip(convs, params["bns"],
                                             state["bns"])):
        # bf16 activations end-to-end: the conv pyramid over B*T frames is
        # the widest buffer stack of the train step (an f32 variant OOMed
        # the accumulated B=128 step — 2.3 GB for ONE pool-backward temp);
        # BN stats/normalisation still run in f32 inside the fusion
        x = jax.nn.relu(L.conv2d(conv, x, dtype=dtype, out_dtype=dtype))
        if train and frame_mask is not None:
            # masked batch statistics over valid frames (f32)
            xf = x.astype(jnp.float32)
            m = frame_mask[:, None, None, None].astype(jnp.float32)
            denom = jnp.maximum(m.sum() * x.shape[1] * x.shape[2], 1.0)
            mean = (xf * m).sum(axis=(0, 1, 2)) / denom
            var = (((xf - mean) ** 2) * m).sum(axis=(0, 1, 2)) / denom
            momentum = 0.1
            # torch updates running_var with the UNBIASED variance while
            # normalising with the biased one (same rule as layers.batchnorm);
            # here n = number of valid frames * H * W
            var_unbiased = var * (denom / jnp.maximum(denom - 1.0, 1.0))
            new_bn_state.append({
                "mean": (1 - momentum) * bn_s["mean"] + momentum * mean,
                "var": (1 - momentum) * bn_s["var"] + momentum * var_unbiased,
                "count": bn_s["count"] + 1,
            })
            x = ((xf - mean) * jax.lax.rsqrt(var + 1e-5) * bn["scale"]
                 + bn["bias"]).astype(x.dtype)
        else:
            x, s2 = L.batchnorm(bn, bn_s, x, train=False)
            new_bn_state.append(s2)
        if i in (1, 3):  # after 2nd and 4th conv blocks (reference :44,:50)
            x = L.maxpool2d(x, 3)
    n = x.shape[0]
    return x.reshape(n, -1), {"bns": new_bn_state}


def apply(
    params: Dict,
    state: Dict,
    frames: jnp.ndarray,             # (B, T, H, W, 3) uint8 or prepared float
    frames_len: jnp.ndarray,         # (B,) int32
    *,
    train: bool = False,
    normalization: Optional[Tuple] = None,  # (mean, std) when frames are uint8
    use_pallas: bool = False,
    dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, Dict]:
    """Returns (video_emb (B, T, hidden) zero-masked past length, new_state)."""
    B, T = frames.shape[:2]
    flat = frames.reshape((B * T,) + frames.shape[2:])
    mask = (jnp.arange(T)[None, :] < frames_len[:, None]).reshape(-1)  # (B*T,)
    feats, new_state = cnn_features(params, state, flat, train=train,
                                    frame_mask=mask,
                                    normalization=normalization, dtype=dtype)
    feats = feats.reshape(B, T, -1)
    if use_pallas and not train and jax.default_backend() not in ("cpu",):
        from mmqg_tpu.ops.lstm_pallas import lstm_stack_pallas
        outs, _ = lstm_stack_pallas(params["lstm"], feats,
                                    lengths=frames_len, mask_output=True,
                                    dtype=dtype)
        return outs, new_state
    outs, _ = L.lstm_scan(params["lstm"], feats, dtype=dtype)
    mask2 = mask.reshape(B, T)[..., None]
    return jnp.where(mask2, outs, 0.0), new_state
