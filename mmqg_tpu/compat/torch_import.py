"""Import reference torch checkpoints into mmqg_tpu parameter pytrees.

The reference saved ``state_dict()`` files for its three modules + the shared
embedding (reference train.py:197-214: av_model.pth, text_enc_model.pth,
dec_model.pth, learned_weight.pt). These converters map those tensors into
this framework's pytrees so reference-trained models can be served/evaluated
here — and so numerical parity is testable module-by-module
(tests/test_torch_import.py drives live torch modules as the oracle).

Layout translations:
* torch LSTM: ``weight_ih_l{k}`` (4H, In), gate order i,f,g,o ->
  ``wx`` (In, 4H); bias = b_ih + b_hh.
* torch Conv2d: (O, I, kH, kW) -> NHWC kernel (kH, kW, I, O).
* video CNN flatten: torch flattens NCHW features c-major
  (reference model/encoder.py:67 ``Flatten()`` on (T, C, H, W)), we flatten
  NHWC h-major — the frame-LSTM's input rows are permuted accordingly.
* Linear: (O, I) -> (I, O).

All functions take ``state_dict``-like mappings of name -> numpy array
(call ``.numpy()`` on torch tensors first; torch itself is not imported here).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _np(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def import_lstm(sd: Dict, prefix: str, num_layers: int) -> Dict:
    """torch nn.LSTM state_dict -> layers.lstm params pytree."""
    layers = []
    for k in range(num_layers):
        wx = _np(sd[f"{prefix}weight_ih_l{k}"]).T           # (In, 4H)
        wh = _np(sd[f"{prefix}weight_hh_l{k}"]).T           # (H, 4H)
        b = _np(sd[f"{prefix}bias_ih_l{k}"]) + _np(sd[f"{prefix}bias_hh_l{k}"])
        layers.append({"wx": wx, "wh": wh, "b": b})
    return {"layers": layers}


def _conv(sd: Dict, name: str) -> Dict:
    w = _np(sd[f"{name}.weight"])                           # (O, I, kH, kW)
    return {"w": np.transpose(w, (2, 3, 1, 0)),
            "b": _np(sd[f"{name}.bias"])}


def _bn(sd: Dict, name: str) -> Tuple[Dict, Dict]:
    return ({"scale": _np(sd[f"{name}.weight"]),
             "bias": _np(sd[f"{name}.bias"])},
            {"mean": _np(sd[f"{name}.running_mean"]),
             "var": _np(sd[f"{name}.running_var"]),
             "count": np.zeros(())})


def _linear(sd: Dict, name: str) -> Dict:
    return {"w": _np(sd[f"{name}.weight"]).T,
            "b": _np(sd[f"{name}.bias"])}


def flatten_permutation(h: int, w: int, c: int) -> np.ndarray:
    """perm such that ours_flat[i] corresponds to torch_flat[perm[i]]:
    ours iterates (h, w, c) row-major, torch iterates (c, h, w)."""
    hh, ww, cc = np.meshgrid(np.arange(h), np.arange(w), np.arange(c),
                             indexing="ij")
    return (cc * (h * w) + hh * w + ww).reshape(-1)


def import_video_encoder(sd: Dict, *, feat_hw: int = 10,
                         channels: int = 10) -> Tuple[Dict, Dict]:
    """Reference VideoConvLstmEncoder state_dict (model/encoder.py:31-78) ->
    (params, state) for mmqg_tpu.models.video_encoder."""
    convs = [_conv(sd, f"conv{i}") for i in range(1, 5)]
    bns, bn_states = zip(*[_bn(sd, f"bn{i}") for i in range(1, 5)])
    lstm = import_lstm(sd, "lstm.", 1)
    # permute flatten ordering on the frame-LSTM input rows
    perm = flatten_permutation(feat_hw, feat_hw, channels)
    lstm["layers"][0]["wx"] = lstm["layers"][0]["wx"][perm]
    params = {"convs": convs, "bns": list(bns), "lstm": lstm}
    state = {"bns": list(bn_states)}
    return params, state


def import_text_encoder(sd: Dict, num_layers: int = 3) -> Dict:
    """Reference TextEncoder state_dict (model/encoder.py:80-111) -> params.
    The shared embedding is saved separately (learned_weight.pt)."""
    return {"lstm": import_lstm(sd, "lstm.", num_layers)}


def import_attn_decoder(sd: Dict, num_layers: int = 3) -> Dict:
    """Reference AttnDecoder state_dict (model/decoder.py:49-125) -> params.
    Concat orders match ([emb; text_ctx; audio_ctx; video_ctx] — reference
    model/decoder.py:99), so LSTM input rows map 1:1."""
    from mmqg_tpu.ops.attention import AttnParams

    t = _linear(sd, "text_attn")
    v = _linear(sd, "vid_attn")
    a = _linear(sd, "audio_attn")
    return {
        "attn": AttnParams(w_text=t["w"], b_text=t["b"],
                           w_video=v["w"], b_video=v["b"],
                           w_audio=a["w"], b_audio=a["b"]),
        "lstm": import_lstm(sd, "lstm.", num_layers),
        "out": _linear(sd, "out_layer"),
    }


def import_embedding(weight) -> Dict:
    """learned_weight.pt tensor -> embedding params (float32 — the
    reference's int64 cast bug is not reproduced)."""
    return {"table": _np(weight)}
