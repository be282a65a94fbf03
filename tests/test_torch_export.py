"""Round-trip: export to reference-layout torch state_dicts, re-import, and
recover the exact parameter pytrees (torch_export is the inverse of
torch_import; reference artifact contract at reference train.py:197-214)."""

import numpy as np
import pytest

import jax

from mmqg_tpu.compat import torch_export as TE
from mmqg_tpu.compat import torch_import as TI
from mmqg_tpu.models import qg_model
from mmqg_tpu.models.video_encoder import flatten_dim_for


@pytest.fixture(scope="module")
def flagship_params():
    mc = qg_model.ModelConfig(
        n_vocab=50, word_emb_dim=8, hidden_dim=16, text_layers=3,
        dec_layers=3, video_hidden_dim=16, audio_emb_dim=8,
        flatten_dim=flatten_dim_for(32), context_max_length=12,
        av_max_length=3, target_steps=7, mode="trimodal", frame_size=32,
        mel_frames=16, mel_bins=16, sample_rate=1600, stft_window=64,
        stft_hop=32)
    emb = np.random.RandomState(0).randn(50, 8).astype(np.float32)
    params, state = qg_model.init(jax.random.PRNGKey(0), mc, emb)
    params = jax.tree.map(np.asarray, params)
    state = jax.tree.map(np.asarray, state)
    return mc, params, state


def _assert_trees_equal(a, b):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x, np.float32),
                                   np.asarray(y, np.float32), atol=1e-6)


def test_video_encoder_round_trip(flagship_params):
    mc, params, state = flagship_params
    # tiny frame size 32 -> feature map 1x1, 10 channels (flatten_dim_for)
    sd = TE.export_video_encoder(params["video_enc"],
                                 {"bns": state["video_enc"]["bns"]},
                                 feat_hw=1, channels=10)
    p2, s2 = TI.import_video_encoder(sd, feat_hw=1, channels=10)
    _assert_trees_equal(params["video_enc"], p2)
    for bn_a, bn_b in zip(state["video_enc"]["bns"], s2["bns"]):
        np.testing.assert_allclose(bn_a["mean"], bn_b["mean"], atol=1e-6)
        np.testing.assert_allclose(bn_a["var"], bn_b["var"], atol=1e-6)


def test_text_encoder_round_trip(flagship_params):
    mc, params, state = flagship_params
    sd = TE.export_text_encoder(params["text_enc"])
    p2 = TI.import_text_encoder(sd, num_layers=mc.text_layers)
    _assert_trees_equal(params["text_enc"], p2)


def test_attn_decoder_round_trip(flagship_params):
    mc, params, state = flagship_params
    sd = TE.export_attn_decoder(params["decoder"])
    p2 = TI.import_attn_decoder(sd, num_layers=mc.dec_layers)
    _assert_trees_equal(params["decoder"], p2)


def test_embedding_round_trip(flagship_params):
    mc, params, state = flagship_params
    w = TE.export_embedding(params["embedding"])
    _assert_trees_equal(params["embedding"], TI.import_embedding(w))


def test_export_checkpoint_shapes(flagship_params):
    mc, params, state = flagship_params
    av, text, dec, emb = TE.export_checkpoint(params, state)
    assert "video_enc.conv1.weight" in av and "video_enc.lstm.weight_ih_l0" in av
    assert "audio_enc.vggish.features.0.weight" in av
    assert "audio_enc.vggish.embeddings.4.weight" in av
    assert "lstm.weight_ih_l2" in text and "word_embeddings.weight" in text
    assert "out_layer.weight" in dec and "text_attn.weight" in dec
    assert "emb_layer.weight" in dec
    assert emb.shape == (50, 8) and emb.dtype == np.float32


def test_full_checkpoint_round_trip_fixpoint(flagship_params):
    """export -> import -> export must be a fixpoint (and import must recover
    the exact pytrees) — the composed contract of reference train.py:197-214
    and evaluate.py:168-212."""
    mc, params, state = flagship_params
    av, text, dec, emb = TE.export_checkpoint(params, state)
    p2, s2 = TI.import_checkpoint(av, text, dec, emb, mc)
    for key in ("embedding", "text_enc", "decoder", "video_enc", "audio_enc"):
        _assert_trees_equal(params[key], p2[key])
    for bn_a, bn_b in zip(state["video_enc"]["bns"], s2["video_enc"]["bns"]):
        np.testing.assert_allclose(bn_a["mean"], bn_b["mean"], atol=1e-6)
        np.testing.assert_allclose(bn_a["var"], bn_b["var"], atol=1e-6)
    av2, text2, dec2, emb2 = TE.export_checkpoint(p2, s2)
    assert set(av2) == set(av) and set(text2) == set(text) and set(dec2) == set(dec)
    for sd1, sd2 in ((av, av2), (text, text2), (dec, dec2)):
        for k in sd1:
            np.testing.assert_allclose(sd1[k], sd2[k], atol=1e-6, err_msg=k)
    np.testing.assert_allclose(emb, emb2, atol=1e-6)
