import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmqg_tpu.data.dataset import QGDataset
from mmqg_tpu.models import qg_model
from mmqg_tpu.train import batch_arrays


@pytest.fixture(scope="module")
def setup(tiny_config, tiny_corpus):
    ds = QGDataset(tiny_config, tiny_config.train_file)
    emb = np.load(tiny_config.weights_matrix_file).astype(np.float32)
    return tiny_config, ds, emb


def _mc(config, n_vocab, mode):
    return qg_model.ModelConfig.from_config(config, n_vocab=n_vocab, mode=mode)


@pytest.mark.parametrize("mode", list(qg_model.MODES))
def test_loss_finite_all_modes(setup, mode):
    config, ds, emb = setup
    mc = _mc(config, len(ds.vocab), mode)
    params, state = qg_model.init(jax.random.PRNGKey(0), mc, emb)
    batch = batch_arrays(next(ds.batches(config.batch_size)))
    loss, aux = qg_model.loss_fn(params, state, mc, batch, train=False)
    assert np.isfinite(float(loss))
    assert float(aux["loss_per_sample"]) > 0


def test_encode_shapes(setup):
    config, ds, emb = setup
    mc = _mc(config, len(ds.vocab), "trimodal")
    params, state = qg_model.init(jax.random.PRNGKey(0), mc, emb)
    batch = batch_arrays(next(ds.batches(config.batch_size)))
    mem, dec_state, _ = qg_model.encode(params, state, mc, batch)
    B = config.batch_size
    assert mem.enc_text.shape == (B, mc.context_max_length, mc.hidden_dim)
    assert mem.enc_video.shape == (B, mc.av_max_length, mc.video_hidden_dim)
    assert mem.enc_audio.shape == (B, mc.av_max_length, mc.audio_emb_dim)
    assert dec_state[0].shape == (mc.text_layers, B, mc.hidden_dim)


def test_shared_embedding_is_single_param(setup):
    config, ds, emb = setup
    mc = _mc(config, len(ds.vocab), "text")
    params, _ = qg_model.init(jax.random.PRNGKey(0), mc, emb)
    tables = [p for path, p in
              [(str(k), v) for k, v in params.items()] if "embedding" in path]
    assert len(tables) == 1  # reference shares ONE Embedding (train.py:236-255)
    assert "embedding" not in params["text_enc"]
    assert "embedding" not in params["decoder"]


def test_padding_invariance(setup):
    """Changing frames/audio/context beyond the true lengths must not change
    the loss (the reference's masking was a no-op; ours must be airtight)."""
    config, ds, emb = setup
    mc = _mc(config, len(ds.vocab), "trimodal")
    params, state = qg_model.init(jax.random.PRNGKey(0), mc, emb)
    batch = batch_arrays(next(ds.batches(config.batch_size)))
    loss1, _ = qg_model.loss_fn(params, state, mc, batch, train=False)

    corrupted = dict(batch)
    ids = batch["context_ids"].copy()
    for i, n in enumerate(batch["context_len"]):
        ids[i, n:] = 3  # garbage token past length
    corrupted["context_ids"] = ids
    frames = batch["frames"].copy()
    for i, n in enumerate(batch["frames_len"]):
        frames[i, n:] = 255
    corrupted["frames"] = frames
    loss2, _ = qg_model.loss_fn(params, state, mc, corrupted, train=False)
    assert float(loss1) == pytest.approx(float(loss2), rel=1e-5)


def test_grads_cover_all_params(setup):
    config, ds, emb = setup
    mc = _mc(config, len(ds.vocab), "trimodal")
    params, state = qg_model.init(jax.random.PRNGKey(0), mc, emb)
    batch = batch_arrays(next(ds.batches(config.batch_size)))

    grads = jax.grad(
        lambda p: qg_model.loss_fn(p, state, mc, batch, train=False)[0])(params)
    flat = jax.tree.leaves(jax.tree.map(
        lambda g: float(jnp.abs(g).sum()) if hasattr(g, "ndim") else 0.0, grads))
    # every leaf gets gradient signal (shared emb, all encoders, decoder)
    n_zero = sum(1 for v in flat if v == 0.0)
    assert n_zero == 0, f"{n_zero}/{len(flat)} parameter leaves have zero grad"
