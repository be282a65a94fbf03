"""Export mmqg_tpu parameter pytrees back to reference-layout torch
state_dicts — the exact inverse of ``torch_import`` (see its module doc for
the layout translations). Lets a model trained here be loaded by the
reference's evaluate.py (after its crash bugs are patched) or by any torch
consumer of the reference's checkpoint files (reference train.py:197-214:
av_model.pth, text_enc_model.pth, dec_model.pth, learned_weight.pt).

Outputs are plain dicts of name -> numpy float32 arrays; call
``torch.save({k: torch.from_numpy(v) for ...})`` to produce ``.pth`` files
(torch itself is not imported here). The summed LSTM bias is exported as
``bias_ih`` with ``bias_hh = 0`` — functionally identical in torch.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from mmqg_tpu.compat.torch_import import flatten_permutation


def _np(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def export_lstm(params: Dict, prefix: str, out: Dict) -> Dict:
    """layers.lstm params pytree -> torch nn.LSTM state_dict entries."""
    for k, layer in enumerate(params["layers"]):
        out[f"{prefix}weight_ih_l{k}"] = _np(layer["wx"]).T      # (4H, In)
        out[f"{prefix}weight_hh_l{k}"] = _np(layer["wh"]).T      # (4H, H)
        out[f"{prefix}bias_ih_l{k}"] = _np(layer["b"])
        out[f"{prefix}bias_hh_l{k}"] = np.zeros_like(_np(layer["b"]))
    return out


def _conv_out(params: Dict, name: str, out: Dict) -> None:
    out[f"{name}.weight"] = np.transpose(_np(params["w"]), (3, 2, 0, 1))
    out[f"{name}.bias"] = _np(params["b"])


def _bn_out(bn: Dict, bn_state: Dict, name: str, out: Dict) -> None:
    out[f"{name}.weight"] = _np(bn["scale"])
    out[f"{name}.bias"] = _np(bn["bias"])
    out[f"{name}.running_mean"] = _np(bn_state["mean"])
    out[f"{name}.running_var"] = _np(bn_state["var"])
    out[f"{name}.num_batches_tracked"] = np.asarray(
        bn_state.get("count", 0.0)).astype(np.int64)


def _linear_out(params: Dict, name: str, out: Dict) -> None:
    out[f"{name}.weight"] = _np(params["w"]).T
    out[f"{name}.bias"] = _np(params["b"])


def export_video_encoder(params: Dict, state: Dict, *, feat_hw: int = 10,
                         channels: int = 10) -> Dict:
    """(params, state) of mmqg_tpu.models.video_encoder -> reference
    VideoConvLstmEncoder state_dict (model/encoder.py:31-78)."""
    out: Dict = {}
    for i, conv in enumerate(params["convs"], start=1):
        _conv_out(conv, f"conv{i}", out)
    for i, (bn, bn_s) in enumerate(zip(params["bns"], state["bns"]),
                                   start=1):
        _bn_out(bn, bn_s, f"bn{i}", out)
    # undo the flatten-order permutation on the frame-LSTM input rows:
    # import set ours_wx[i] = torch_wx[perm[i]], so torch_wx = ours_wx[argsort]
    lstm = {"layers": [dict(l) for l in params["lstm"]["layers"]]}
    inv = np.argsort(flatten_permutation(feat_hw, feat_hw, channels))
    lstm["layers"][0]["wx"] = _np(lstm["layers"][0]["wx"])[inv]
    export_lstm(lstm, "lstm.", out)
    return out


def export_text_encoder(params: Dict) -> Dict:
    """params -> reference TextEncoder state_dict (model/encoder.py:80-111)."""
    return export_lstm(params["lstm"], "lstm.", {})


def export_attn_decoder(params: Dict) -> Dict:
    """params -> reference AttnDecoder state_dict (model/decoder.py:49-125)."""
    out: Dict = {}
    attn = params["attn"]
    _linear_out({"w": attn.w_text, "b": attn.b_text}, "text_attn", out)
    _linear_out({"w": attn.w_video, "b": attn.b_video}, "vid_attn", out)
    _linear_out({"w": attn.w_audio, "b": attn.b_audio}, "audio_attn", out)
    export_lstm(params["lstm"], "lstm.", out)
    _linear_out(params["out"], "out_layer", out)
    return out


def export_embedding(params: Dict) -> np.ndarray:
    """embedding params -> the learned_weight.pt tensor (float32)."""
    return _np(params["table"])


# inverse of torch_import's vggish key tables (audio_encoder.py layout docs)
_VGGISH_CONV_KEYS = ("features.0", "features.3", "features.6", "features.8",
                     "features.11", "features.13")
_VGGISH_FC_KEYS = ("embeddings.0", "embeddings.2", "embeddings.4")


def export_audio_encoder(params: Dict) -> Dict:
    """audio_encoder params -> torchvggish-layout state_dict (the torch.hub
    module the reference embedded as ``audio_enc.vggish``,
    reference model/encoder.py:8-19)."""
    out: Dict = {}
    for conv, key in zip(params["convs"], _VGGISH_CONV_KEYS):
        out[f"{key}.weight"] = np.transpose(_np(conv["w"]), (3, 2, 0, 1))
        out[f"{key}.bias"] = _np(conv["b"])
    for name, key in zip(("fc1", "fc2", "fc3"), _VGGISH_FC_KEYS):
        out[f"{key}.weight"] = _np(params[name]["w"]).T
        out[f"{key}.bias"] = _np(params[name]["b"])
    return out


def export_checkpoint(params: Dict, model_state: Dict) -> Tuple[Dict, Dict,
                                                                Dict,
                                                                np.ndarray]:
    """Full model params -> (av_sd, text_sd, dec_sd, embedding) matching the
    reference's four checkpoint artifacts (reference train.py:197-214).

    ``av_sd`` follows the AudioVideoEncoder state_dict layout exactly:
    ``video_enc.*`` keys for the conv-LSTM tower and ``audio_enc.vggish.*``
    keys for the VGGish weights (the reference module registered the frozen
    hub model, so its state_dict carries them). ``text_sd``/``dec_sd``
    include the shared embedding copies torch would save
    (``word_embeddings.weight`` / ``emb_layer.weight``,
    reference model/encoder.py:87 and model/decoder.py:62)."""
    vp = params["video_enc"]
    channels = int(np.shape(vp["convs"][-1]["w"])[-1])
    in_dim = int(np.shape(vp["lstm"]["layers"][0]["wx"])[0])
    feat_hw = int(round((in_dim / channels) ** 0.5))
    vid_sd = export_video_encoder(vp,
                                  {"bns": model_state["video_enc"]["bns"]},
                                  feat_hw=feat_hw, channels=channels)
    av_sd = {f"video_enc.{k}": v for k, v in vid_sd.items()}
    if "audio_enc" in params:
        for k, v in export_audio_encoder(params["audio_enc"]).items():
            av_sd[f"audio_enc.vggish.{k}"] = v
    emb = export_embedding(params["embedding"])
    text_sd = export_text_encoder(params["text_enc"])
    text_sd["word_embeddings.weight"] = emb
    dec_sd = export_attn_decoder(params["decoder"])
    dec_sd["emb_layer.weight"] = emb
    return av_sd, text_sd, dec_sd, emb
