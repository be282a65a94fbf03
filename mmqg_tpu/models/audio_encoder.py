"""Audio encoder: VGGish-architecture convnet over log-mel examples.

The reference downloaded pretrained VGGish from torch.hub at model-construction
time (reference model/encoder.py:12 — a network fetch inside __init__) and ran
it on CPU per wav file. This rebuild owns the architecture: the standard
VGGish topology (conv64-pool, conv128-pool, conv256x2-pool, conv512x2-pool,
fc4096 x2, fc128 over a 96x64 log-mel patch), jit-batched over all examples of
all samples at once, producing one 128-d embedding per 0.96 s audio example —
the same feature contract the reference's hub model exposed
(``postprocess=False`` -> raw 128-d float embeddings).

Weight porting: a converter for released VGGish checkpoints can load weights
into this pytree (same layer shapes); with no checkpoint available the encoder
trains from scratch with the rest of the model.

Output shape: (B, max_examples, 128), zero-masked past each sample's true
example count — the padded (101, 128) attention memory the decoder expects
(reference intent of train.py:156; the reference's own pad call was shape-
buggy, see SURVEY.md §2 C18 notes).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from mmqg_tpu.models import layers as L

# (out_channels, n_convs) per VGG block
_BLOCKS = ((64, 1), (128, 1), (256, 2), (512, 2))
EMBEDDING_DIM = 128


def init(rng, *, mel_frames: int = 96, mel_bins: int = 64,
         embedding_dim: int = EMBEDDING_DIM) -> Dict:
    n_convs = sum(n for _, n in _BLOCKS)
    ks = jax.random.split(rng, n_convs + 3)
    convs = []
    c_in, ki = 1, 0
    h, w = mel_frames, mel_bins
    for c_out, reps in _BLOCKS:
        for _ in range(reps):
            convs.append(L.conv_init(ks[ki], c_in, c_out, 3))
            c_in = c_out
            ki += 1
        h, w = h // 2, w // 2
    flat = h * w * c_in  # 6*4*512 = 12288 for 96x64 input
    return {
        "convs": convs,
        "fc1": L.dense_init(ks[ki], flat, 4096),
        "fc2": L.dense_init(ks[ki + 1], 4096, 4096),
        "fc3": L.dense_init(ks[ki + 2], 4096, embedding_dim),
    }


def embed_examples(params: Dict, mel: jnp.ndarray, *, dtype=jnp.bfloat16) -> jnp.ndarray:
    """(N, 96, 64) log-mel examples -> (N, 128) embeddings.

    Activations stay in ``dtype`` through the conv stack: the conv->pool
    boundaries materialise to HBM, and f32 intermediates double the traffic
    (measured ~1.5x slower end-to-end at batch 128)."""
    x = mel[..., None]  # NHWC with 1 channel
    ci = 0
    for _, reps in _BLOCKS:
        for _ in range(reps):
            x = jax.nn.relu(L.conv2d(params["convs"][ci], x, padding="SAME",
                                     dtype=dtype, out_dtype=dtype))
            ci += 1
        x = L.maxpool2d(x, 2)
    x = x.reshape(x.shape[0], -1)
    x = jax.nn.relu(L.dense(params["fc1"], x, dtype=dtype))
    x = jax.nn.relu(L.dense(params["fc2"], x, dtype=dtype))
    # torchvggish's embedding head ends in ReLU (its ``embeddings``
    # Sequential: Linear/ReLU x3) — the reference's audio features
    # (reference model/encoder.py:16-19, postprocess=False) are therefore
    # non-negative; match so ported weights reproduce them exactly
    return jax.nn.relu(L.dense(params["fc3"], x, dtype=dtype))


def calibrate_int8_scales(params: Dict, mel: jnp.ndarray, *,
                          margin: float = 1.1) -> tuple:
    """Run the float conv stack on a calibration batch and record each
    quantized conv's input max -> static activation scales for
    ``embed_examples_int8``.

    Static scales are jit-static Python floats: the quantize step becomes a
    pure elementwise epilogue XLA fuses into the producing conv, removing
    the dynamic per-layer max pass. ``margin`` head-rooms the observed max
    (activations above it saturate at 127, the standard post-training-quant
    trade)."""
    x = mel[..., None].astype(jnp.float32)
    x = jax.nn.relu(L.conv2d(params["convs"][0], x, padding="SAME",
                             dtype=jnp.float32, out_dtype=jnp.float32))
    x = L.maxpool2d(x, 2)
    scales = []
    ci = 1
    for _, reps in _BLOCKS[1:]:
        for _ in range(reps):
            scales.append(float(jnp.max(x)) * margin / 127.0)
            x = jax.nn.relu(L.conv2d(params["convs"][ci], x, padding="SAME",
                                     dtype=jnp.float32,
                                     out_dtype=jnp.float32))
            ci += 1
        x = L.maxpool2d(x, 2)
    return tuple(max(s, 1e-6) for s in scales)


def embed_examples_int8(params: Dict, mel: jnp.ndarray, *,
                        dtype=jnp.bfloat16, act_scales=None) -> jnp.ndarray:
    """int8-quantized serving variant of ``embed_examples``.

    The MXU runs int8 at 2x its bf16 rate; conv2..conv6 (99.6% of the conv
    FLOPs) run as int8 x int8 -> int32 convs with per-output-channel weight
    scales and dynamic per-EXAMPLE activation scales (activations are
    post-relu, so a max/127 scale loses no sign bit; per-example scales keep
    each embedding independent of what else shares the batch). conv1 stays
    in ``dtype``: C_in=1 is MXU-hostile however expressed and its input is
    signed log-mel. The fc head stays in ``dtype`` (bandwidth-bound on its
    100 MB of weights, not MXU-bound).

    ``act_scales`` (from ``calibrate_int8_scales``) switches to static
    per-layer scales: no per-layer max pass, quantization fuses into the
    previous conv's epilogue, activations saturate at the calibrated max.

    The weight quantize (abs-max + round over ~19 MB) re-runs per call —
    params are traced jit args, so XLA cannot fold it — but it is pure
    bandwidth: ~0.1 ms against the ~69 ms conv stack at B=128. Caching wq
    would mean carrying int8 shadows in the params pytree (breaking the
    checkpoint/grad template); deliberately not done.

    Serving-only (no VJP path needed — training always uses
    ``embed_examples``).
    """
    x = mel[..., None]
    x = jax.nn.relu(L.conv2d(params["convs"][0], x, padding="SAME",
                             dtype=dtype, out_dtype=dtype))
    x = L.maxpool2d(x, 2)
    ci = 1
    for _, reps in _BLOCKS[1:]:
        for _ in range(reps):
            c = params["convs"][ci]
            w = c["w"]
            sw = jnp.max(jnp.abs(w), axis=(0, 1, 2)) / 127.0    # (Cout,)
            wq = jnp.round(w / jnp.maximum(sw, 1e-12)).astype(jnp.int8)
            if act_scales is not None:
                sx = act_scales[ci - 1]
                xq = jnp.round(jnp.clip(x.astype(jnp.float32) / sx,
                                        0.0, 127.0)).astype(jnp.int8)
            else:
                sx = jnp.maximum(
                    jnp.max(x, axis=(1, 2, 3),
                            keepdims=True).astype(jnp.float32),
                    1e-6) / 127.0                               # (N,1,1,1)
                xq = jnp.round(x.astype(jnp.float32) / sx).astype(jnp.int8)
            yi = jax.lax.conv_general_dilated(
                xq, wq, window_strides=(1, 1), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            y = yi.astype(jnp.float32) * (sx * sw) + c["b"]
            x = jax.nn.relu(y).astype(dtype)
            ci += 1
        x = L.maxpool2d(x, 2)
    x = x.reshape(x.shape[0], -1)
    x = jax.nn.relu(L.dense(params["fc1"], x, dtype=dtype))
    x = jax.nn.relu(L.dense(params["fc2"], x, dtype=dtype))
    return jax.nn.relu(L.dense(params["fc3"], x, dtype=dtype))


# torchvggish state_dict layout -> our pytree. Conv weights are (O, I, H, W)
# in torch and (H, W, I, O) here; fc weights are (O, I) -> (I, O).
_VGGISH_CONV_KEYS = ("features.0", "features.3", "features.6", "features.8",
                     "features.11", "features.13")
_VGGISH_FC_KEYS = ("embeddings.0", "embeddings.2", "embeddings.4")


def load_vggish_state_dict(params: Dict, state_dict: Dict) -> Dict:
    """Port released VGGish weights (the torch.hub checkpoint the reference
    downloaded at model build time, reference model/encoder.py:12) into this
    encoder's pytree. ``state_dict`` maps torch names to numpy arrays.
    Returns a new params dict; shapes are validated."""
    import numpy as np

    new = {"convs": [], "fc1": None, "fc2": None, "fc3": None}
    for i, key in enumerate(_VGGISH_CONV_KEYS):
        w = np.asarray(state_dict[f"{key}.weight"])     # (O, I, H, W)
        b = np.asarray(state_dict[f"{key}.bias"])
        w = np.transpose(w, (2, 3, 1, 0))               # -> (H, W, I, O)
        old = params["convs"][i]
        if w.shape != old["w"].shape:
            raise ValueError(f"{key}: shape {w.shape} != {old['w'].shape}")
        new["convs"].append({"w": jnp.asarray(w), "b": jnp.asarray(b)})
    for name, key in zip(("fc1", "fc2", "fc3"), _VGGISH_FC_KEYS):
        w = np.asarray(state_dict[f"{key}.weight"]).T   # (O, I) -> (I, O)
        b = np.asarray(state_dict[f"{key}.bias"])
        if w.shape != params[name]["w"].shape:
            raise ValueError(f"{key}: shape {w.shape} != {params[name]['w'].shape}")
        new[name] = {"w": jnp.asarray(w), "b": jnp.asarray(b)}
    return new


def apply(
    params: Dict,
    mel_examples: jnp.ndarray,        # (B, E, 96, 64)
    audio_examples_len: jnp.ndarray,  # (B,) int32 — valid example count
    *,
    dtype=jnp.bfloat16,
    int8: bool = False,
    int8_scales=None,
    use_pallas: bool = False,
) -> jnp.ndarray:
    """Returns (B, E, 128) zero-masked past each sample's example count.

    ``int8`` routes the conv stack through ``embed_examples_int8`` (2x MXU
    rate; serving only — callers pass train=False paths here).
    ``use_pallas`` routes it through the fused VMEM-resident kernel
    (ops/vggish_pallas.py) — measured slower than XLA's conv lowering on
    v5e, kept as the documented alternative; inference only, repo
    convention: loss_fn always takes the XLA path (no VJP)."""
    B, E = mel_examples.shape[:2]
    flat = mel_examples.reshape((B * E,) + mel_examples.shape[2:])
    if int8:
        emb = embed_examples_int8(params, flat, dtype=dtype,
                                  act_scales=int8_scales).reshape(B, E, -1)
    elif use_pallas and jax.default_backend() not in ("cpu",):
        from mmqg_tpu.ops.vggish_pallas import embed_examples_pallas
        emb = embed_examples_pallas(params, flat, dtype=dtype).reshape(B, E, -1)
    else:
        emb = embed_examples(params, flat, dtype=dtype).reshape(B, E, -1)
    mask = (jnp.arange(E)[None, :] < audio_examples_len[:, None])[..., None]
    return jnp.where(mask, emb, 0.0)
