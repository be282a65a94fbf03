import numpy as np
import pytest

from mmqg_tpu.data.dataset import QGDataset
from mmqg_tpu.models import qg_model
from mmqg_tpu.train import Trainer


@pytest.fixture(scope="module")
def trainer(tiny_config, tiny_corpus):
    train_ds = QGDataset(tiny_config, tiny_config.train_file)
    val_ds = QGDataset(tiny_config, tiny_config.val_file)
    emb = np.load(tiny_config.weights_matrix_file).astype(np.float32)
    mc = qg_model.ModelConfig.from_config(
        tiny_config, n_vocab=len(train_ds.vocab), mode="text")
    return Trainer(tiny_config.replace(lr=5e-3), mc, emb, train_ds, val_ds,
                   log_fn=lambda *a: None)


def test_loss_decreases_over_epochs(trainer):
    stats, best_epoch = trainer.fit(epochs=4)
    losses = stats["train"]["loss"]
    assert len(losses) == 4
    assert losses[-1] < losses[0], f"no learning: {losses}"
    assert best_epoch >= 0
    # reference stats schema (train.py:132)
    assert set(stats["val"]) == {"loss", "bleu", "bleu_1", "bleu_2",
                                 "bleu_3", "bleu_4"}


def test_checkpoints_written(trainer, tiny_config):
    assert (tiny_config.checkpoint_dir / "best.msgpack").exists()
    assert (tiny_config.checkpoint_dir / "last.msgpack").exists()
    assert tiny_config.stats_json_path.exists()


def test_resume_restores_progress(trainer, tiny_config):
    from mmqg_tpu.data.dataset import QGDataset
    train_ds = QGDataset(tiny_config, tiny_config.train_file)
    val_ds = QGDataset(tiny_config, tiny_config.val_file)
    emb = np.load(tiny_config.weights_matrix_file).astype(np.float32)
    mc = trainer.mc
    fresh = Trainer(tiny_config.replace(lr=5e-3), mc, emb, train_ds, val_ds,
                    log_fn=lambda *a: None)
    assert fresh.resume("last")
    assert fresh.start_epoch == 4
    # restored params match the trained ones
    import jax
    diff = jax.tree.map(
        lambda a, b: float(abs(np.asarray(a) - np.asarray(b)).max()),
        fresh.train_state["params"], trainer.train_state["params"])
    assert max(jax.tree.leaves(diff)) == 0.0


def test_validate_returns_bleu_suite(trainer):
    val = trainer.validate()
    for k in ("loss", "bleu", "bleu_1", "bleu_2", "bleu_3"):
        assert k in val and np.isfinite(val[k])
