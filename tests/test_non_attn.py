"""Non-attention decoder configuration end-to-end (reference C17/C22: the
non_attn_train.py path, which was syntax-broken in the reference)."""

import jax
import numpy as np
import pytest

from mmqg_tpu import decode as DEC
from mmqg_tpu.data.dataset import QGDataset
from mmqg_tpu.models import qg_model
from mmqg_tpu.train import Trainer, batch_arrays


@pytest.fixture(scope="module")
def setup(tiny_config, tiny_corpus):
    ds = QGDataset(tiny_config, tiny_config.train_file)
    emb = np.load(tiny_config.weights_matrix_file).astype(np.float32)
    mc = qg_model.ModelConfig.from_config(tiny_config, n_vocab=len(ds.vocab),
                                          mode="trimodal", dec="non_attn")
    return tiny_config, ds, emb, mc


def test_loss_and_grads(setup):
    config, ds, emb, mc = setup
    params, state = qg_model.init(jax.random.PRNGKey(0), mc, emb)
    assert "attn" not in params["decoder"]  # non-attn has no location heads
    batch = batch_arrays(next(ds.batches(config.batch_size)))
    loss, aux = qg_model.loss_fn(params, state, mc, batch, train=False)
    assert np.isfinite(float(loss))
    grads = jax.grad(lambda p: qg_model.loss_fn(p, state, mc, batch,
                                                train=False)[0])(params)
    gsum = sum(float(np.abs(np.asarray(g)).sum())
               for g in jax.tree.leaves(grads))
    assert np.isfinite(gsum) and gsum > 0


def test_decode_runs(setup):
    config, ds, emb, mc = setup
    params, state = qg_model.init(jax.random.PRNGKey(0), mc, emb)
    batch = batch_arrays(next(ds.batches(config.batch_size)))
    toks = DEC.decode_batch(params, state, mc, batch, jax.random.PRNGKey(0),
                            strategy="greedy", max_len=6, use_pallas=False)
    assert toks.shape == (config.batch_size, 6)


def test_trainer_learns(setup, tiny_config):
    config, ds, emb, mc = setup
    val_ds = QGDataset(tiny_config, tiny_config.val_file)
    cfg = tiny_config.replace(lr=5e-3,
                              output_path=tiny_config.output_path / "na")
    cfg.ensure_dirs()
    tr = Trainer(cfg, mc, emb, ds, val_ds, log_fn=lambda *a: None)
    stats, _ = tr.fit(epochs=3)
    losses = stats["train"]["loss"]
    assert losses[-1] < losses[0]
