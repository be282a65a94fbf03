import json

import numpy as np
import pytest

from mmqg_tpu.utils import audit, plotting


def test_plot_results_and_best_epoch(tmp_path):
    stats = {"train": {"loss": [3.0, 2.0, 2.5]},
             "val": {"loss": [3.1, 2.2, 2.6], "bleu": [0.1, 0.3, 0.2]}}
    p = tmp_path / "stats.json"
    p.write_text(json.dumps(stats))
    report = plotting.plot_results(p)
    assert report["best_train_epoch"] == 1
    assert report["best_val_epoch"] == 1
    assert report["best_val_bleu"] == 0.3
    assert (tmp_path / "train_loss.png").exists()
    assert (tmp_path / "val_bleu.png").exists()


def test_grad_norms_by_layer():
    grads = {"a": {"w": np.ones((2, 2)), "b": np.full((2,), 2.0)},
             "list": [np.zeros((3,))]}
    pairs = dict(plotting.grad_norms_by_layer(grads))
    assert pairs["a/w"] == 1.0
    assert pairs["a/b"] == 2.0
    assert pairs["list/0"] == 0.0


def test_plot_grad_flow(tmp_path):
    grads = {"x": {"w": np.ones((4, 4)) * 0.5, "b": np.ones((4,))}}
    out = plotting.plot_grad_flow(grads, tmp_path / "gf.png")
    assert out.exists()


def test_audit_corpus(tiny_config, tiny_corpus):
    report = audit.audit_corpus(tiny_config)
    # context <= configured max (fixtures guarantee it)
    assert report["context"][0] <= tiny_config.context_max_length
    assert report["question"][0] >= 1
    assert report["frames"][0] <= tiny_config.av_max_length


def test_trainer_profile_dir_writes_trace(tiny_config, tiny_corpus, tmp_path):
    """Trainer(profile_dir=...) must dump a perfetto/tensorboard trace of a
    warm train step (SURVEY.md §5 tracing; CLI --profile-dir)."""
    import numpy as np
    from mmqg_tpu.data.dataset import QGDataset
    from mmqg_tpu.models import qg_model
    from mmqg_tpu.train import Trainer

    train_ds = QGDataset(tiny_config, tiny_config.train_file,
                         load_media=False)
    val_ds = QGDataset(tiny_config, tiny_config.val_file, load_media=False)
    emb = np.load(tiny_config.weights_matrix_file).astype(np.float32)
    mc = qg_model.ModelConfig.from_config(
        tiny_config, n_vocab=len(train_ds.vocab), mode="text")
    tr = Trainer(tiny_config.replace(batch_size=4), mc, emb, train_ds,
                 val_ds, profile_dir=tmp_path / "trace",
                 log_fn=lambda *a, **k: None)
    tr.run_epoch(0)
    dumped = list((tmp_path / "trace").rglob("*"))
    assert any(f.is_file() for f in dumped), dumped


def test_param_mem_and_device_memory_report():
    """Parity with the reference's get_mem_usage (train.py:49-53) plus the
    live-buffer report."""
    import numpy as np
    from mmqg_tpu.utils import profiling

    tree = {"a": np.zeros((1024, 1024), np.float32),  # 4 MB
            "b": [np.zeros((512,), np.float32)]}
    mb = profiling.param_mem_mb(tree)
    assert mb == pytest.approx(4.0 + 512 * 4 / 1024 / 1024)

    report = profiling.device_memory_report()
    assert len(report) >= 1
    for stats in report.values():
        assert "bytes_in_use_mb" in stats
