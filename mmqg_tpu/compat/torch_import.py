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


def _conv3d_w(sd: Dict, key: str) -> Dict:
    """torch Conv3d weight (O, I, kT, kH, kW) -> NDHWC kernel
    (kT, kH, kW, I, O); torchvision video convs are bias-free."""
    return {"w": np.transpose(_np(sd[f"{key}.weight"]), (2, 3, 4, 1, 0))}


def import_video_resnet(sd: Dict, *, embed_dim: int = None) -> Tuple[Dict, Dict]:
    """torchvision ``r2plus1d_18`` state_dict -> (params, state) for
    mmqg_tpu.models.video_resnet (the reference's alternative backbone,
    model/encoder.py:21-29, constructed with ``pretrained=True``).

    torchvision layout (videoresnet.py): ``stem.{0,3}`` spatial/temporal
    convs with ``stem.{1,4}`` BNs; ``layer{1..4}.{0,1}`` BasicBlocks whose
    ``conv{1,2}`` are Sequential(Conv2Plus1D, BN[, ReLU]) with Conv2Plus1D =
    Sequential(spatial conv, mid BN, ReLU, temporal conv) — i.e. keys
    ``convN.0.0`` (spatial), ``convN.0.1`` (mid BN), ``convN.0.3``
    (temporal), ``convN.1`` (post BN); ``layer{2,3,4}.0.downsample.{0,1}``;
    ``fc``. The midplane formula matches (Tran et al. CVPR 2018), so shapes
    line up 1:1. Pass ``embed_dim=400`` to keep the Kinetics-400 fc head,
    None to drop it (pooled 512-d features, what the reference's wrapper
    consumed)."""
    params: Dict = {
        "stem_s": _conv3d_w(sd, "stem.0"),
        "stem_t": _conv3d_w(sd, "stem.3"),
        "stages": [],
    }
    state: Dict = {"stages": []}
    params["stem_bn"], state["stem_bn"] = _bn(sd, "stem.1")
    params["stem_bn2"], state["stem_bn2"] = _bn(sd, "stem.4")
    for si in range(4):
        blocks_p, blocks_s = [], []
        for bi in range(2):
            pre = f"layer{si + 1}.{bi}"
            bp: Dict = {}
            bs: Dict = {}
            for cn in ("conv1", "conv2"):
                mid_bn_p, mid_bn_s = _bn(sd, f"{pre}.{cn}.0.1")
                bp[cn] = {"spatial": _conv3d_w(sd, f"{pre}.{cn}.0.0"),
                          "temporal": _conv3d_w(sd, f"{pre}.{cn}.0.3"),
                          "bn_mid": mid_bn_p}
                bs[cn] = {"bn_mid": mid_bn_s}
            bp["bn1"], bs["bn1"] = _bn(sd, f"{pre}.conv1.1")
            bp["bn2"], bs["bn2"] = _bn(sd, f"{pre}.conv2.1")
            if f"{pre}.downsample.0.weight" in sd:
                bp["down"] = _conv3d_w(sd, f"{pre}.downsample.0")
                bp["down_bn"], bs["down_bn"] = _bn(sd, f"{pre}.downsample.1")
            blocks_p.append(bp)
            blocks_s.append(bs)
        params["stages"].append(blocks_p)
        state["stages"].append(blocks_s)
    if embed_dim is not None:
        params["fc"] = _linear(sd, "fc")
    return params, state


def load_pretrained_video_resnet(params: Dict, state: Dict,
                                 sd: Dict) -> Tuple[Dict, Dict]:
    """Drop torchvision ``r2plus1d_18`` pretrained weights into a FULL model
    built with ``video_encoder: "resnet"`` — the workflow the reference's
    ``pretrained=True`` construction implies (model/encoder.py:21-29, it
    downloaded Kinetics-400 weights at init). Returns new (params, state)
    with ``video_enc`` replaced; every other subtree (text encoder, decoder,
    embedding, audio) is untouched.

    The Kinetics fc head is dropped or kept to match the model: a model
    whose ``video_enc`` has an ``fc`` (video_hidden_dim != 512) requires a
    matching-width head in ``sd``; the common 512-wide model imports
    headless, exactly what the reference wrapper consumed."""
    target = params["video_enc"]
    if "fc" in target:
        want = target["fc"]["w"].shape[1]
        if "fc.weight" not in sd:
            raise ValueError(
                f"model expects a {want}-wide video head but the state_dict "
                "has no fc at all (trunk-only export); retrain the head or "
                "set video_hidden_dim: 512 to use the trunk features "
                "directly")
        have = _np(sd["fc.weight"]).shape[0]
        if want != have:
            raise ValueError(
                f"model expects a {want}-wide video head but the state_dict "
                f"fc is {have}-wide; retrain the head or set "
                "video_hidden_dim: 512 to use the trunk features directly")
        vp, vs = import_video_resnet(sd, embed_dim=want)
    else:
        vp, vs = import_video_resnet(sd)
    new_params = dict(params)
    new_params["video_enc"] = vp
    new_state = dict(state)
    new_state["video_enc"] = vs
    return new_params, new_state


def import_embedding(weight) -> Dict:
    """learned_weight.pt tensor -> embedding params (float32 — the
    reference's int64 cast bug is not reproduced)."""
    return {"table": _np(weight)}


def _strip_prefix(sd: Dict, prefix: str) -> Dict:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def import_checkpoint(av_sd: Dict, text_sd: Dict, dec_sd: Dict, emb_weight,
                      mc) -> Tuple[Dict, Dict]:
    """Compose the reference's FOUR checkpoint artifacts into one qg_model
    (params, state) pytree — the full-model import the reference's
    evaluate.py performs (reference evaluate.py:168-212 loads av_model.pth /
    text_enc_model.pth / dec_model.pth / learned_weight.pt and rebuilds the
    three modules around the shared embedding).

    ``av_sd`` is the AudioVideoEncoder state_dict: ``video_enc.*`` keys
    (VideoConvLstmEncoder) and — when present — ``audio_enc.vggish.*`` keys
    (the torch.hub VGGish the reference froze, model/encoder.py:8-19).
    ``text_sd``/``dec_sd`` may contain the shared embedding under torch's
    ``word_embeddings.weight`` / ``emb_layer.weight`` names; those copies are
    ignored — ``emb_weight`` (learned_weight.pt) is the single source.
    ``mc`` is the qg_model.ModelConfig matching the checkpoint's dims.
    """
    if mc.decoder != "attn":
        raise ValueError("reference checkpoints are attention-decoder models "
                         "(reference train.py:248-258)")
    params: Dict = {
        "embedding": import_embedding(emb_weight),
        "text_enc": import_text_encoder(text_sd, mc.text_layers),
        "decoder": import_attn_decoder(dec_sd, mc.dec_layers),
    }
    state: Dict = {}
    if mc.mode in ("text_video", "trimodal"):
        vid_sd = _strip_prefix(av_sd, "video_enc.")
        channels = 10                       # reference conv4 out channels
        feat_hw = int(round((mc.flatten_dim / channels) ** 0.5))
        vparams, vstate = import_video_encoder(vid_sd, feat_hw=feat_hw,
                                               channels=channels)
        params["video_enc"] = vparams
        state["video_enc"] = vstate
    if mc.mode == "trimodal":
        import jax
        from mmqg_tpu.models import audio_encoder
        template = audio_encoder.init(
            jax.random.PRNGKey(0), mel_frames=mc.mel_frames,
            mel_bins=mc.mel_bins, embedding_dim=mc.audio_emb_dim)
        aud_sd = _strip_prefix(av_sd, "audio_enc.vggish.")
        if aud_sd:
            params["audio_enc"] = audio_encoder.load_vggish_state_dict(
                template, aud_sd)
        else:
            # reference checkpoints made with a hub download at load time
            # may omit the frozen VGGish weights; fall back to fresh init
            params["audio_enc"] = template
    return params, state
