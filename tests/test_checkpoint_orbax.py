"""Orbax checkpoint backend: round-trip parity with the msgpack backend."""

import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mmqg_tpu import checkpoint as ckpt


@pytest.fixture()
def state():
    params = {"w": jnp.arange(12.0).reshape(3, 4), "b": jnp.zeros((4,))}
    opt_state = optax.adam(1e-3).init(params)
    return {"params": params, "opt": opt_state,
            "step": jnp.asarray(7, jnp.int32)}


def _zeros_like(tree):
    import jax
    return jax.tree.map(lambda x: jnp.zeros_like(x), tree)


def test_orbax_round_trip(tmp_path, state):
    ckpt.save_checkpoint(tmp_path, "best", state, metadata={"epoch": 3},
                         backend="orbax")
    assert ckpt.has_checkpoint(tmp_path, "best")
    assert (tmp_path / "best.orbax").is_dir()
    restored, meta = ckpt.load_checkpoint(tmp_path, "best",
                                          _zeros_like(state))
    assert meta["epoch"] == 3
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.asarray(state["params"]["w"]))
    assert int(restored["step"]) == 7
    # optax NamedTuple structure survives (same as msgpack backend)
    assert type(restored["opt"]) is type(state["opt"])


def test_orbax_overwrite_alias(tmp_path, state):
    ckpt.save_checkpoint(tmp_path, "last", state, backend="orbax")
    state2 = {**state, "step": jnp.asarray(9, jnp.int32)}
    ckpt.save_checkpoint(tmp_path, "last", state2, backend="orbax")
    restored, _ = ckpt.load_checkpoint(tmp_path, "last", _zeros_like(state))
    assert int(restored["step"]) == 9


def test_unknown_backend_rejected(tmp_path, state):
    with pytest.raises(ValueError):
        ckpt.save_checkpoint(tmp_path, "x", state, backend="pickle")


def test_msgpack_preferred_when_both_exist(tmp_path, state):
    """If BOTH artifacts somehow coexist (save_checkpoint normally deletes
    the other backend's — so plant the orbax one directly), auto-detecting
    load must pick msgpack (checkpoint.py load_checkpoint doc)."""
    state2 = {**state, "step": jnp.asarray(11, jnp.int32)}
    ckpt.save_checkpoint(tmp_path, "best", state2, backend="msgpack")
    # plant a DIFFERENT orbax state via the internal writer, bypassing the
    # stale-artifact cleanup
    ckpt._save_orbax(tmp_path, "best", state)
    assert (tmp_path / "best.msgpack").exists()
    assert ckpt._orbax_path(tmp_path, "best").exists()
    restored, _ = ckpt.load_checkpoint(tmp_path, "best", _zeros_like(state))
    assert int(restored["step"]) == 11  # the msgpack one


def test_async_save_roundtrip(tmp_path):
    """async_save must publish the same bytes as a sync save, in submission
    order, and wait_for_pending must drain before reads."""
    import jax
    import numpy as np
    from mmqg_tpu import checkpoint as ckpt

    state = {"params": {"w": np.arange(12, dtype=np.float32).reshape(3, 4)},
             "step": np.int32(7)}
    ckpt.save_checkpoint(tmp_path, "a", state, metadata={"epoch": 1},
                         async_save=True)
    state2 = {"params": {"w": state["params"]["w"] * 2},
              "step": np.int32(8)}
    ckpt.save_checkpoint(tmp_path, "a", state2, metadata={"epoch": 2},
                         async_save=True)  # later submission must win
    ckpt.wait_for_pending()
    tmpl = {"params": {"w": np.zeros((3, 4), np.float32)},
            "step": np.int32(0)}
    restored, meta = ckpt.load_checkpoint(tmp_path, "a", tmpl)
    np.testing.assert_array_equal(restored["params"]["w"],
                                  state2["params"]["w"])
    assert int(restored["step"]) == 8
    assert meta["epoch"] == 2


def test_trainer_async_checkpointing(tiny_config, tiny_corpus):
    """checkpoint_async=True end-to-end: fit() returns with both aliases
    published and resumable."""
    import numpy as np
    from mmqg_tpu.data.dataset import QGDataset
    from mmqg_tpu.models import qg_model
    from mmqg_tpu.train import Trainer

    cfg = tiny_config.replace(checkpoint_async=True, epochs=1)
    train_ds = QGDataset(cfg, cfg.train_file, load_media=False)
    val_ds = QGDataset(cfg, cfg.val_file, load_media=False)
    emb = np.load(cfg.weights_matrix_file).astype(np.float32)
    mc = qg_model.ModelConfig.from_config(
        cfg, n_vocab=len(train_ds.vocab), mode="text")
    tr = Trainer(cfg, mc, emb, train_ds, val_ds,
                 log_fn=lambda *a, **k: None)
    tr.fit(1)
    fresh = Trainer(cfg, mc, emb, train_ds, val_ds,
                    log_fn=lambda *a, **k: None)
    assert fresh.resume("last")
    assert fresh.start_epoch == 1


def test_backend_switch_drops_stale_artifact(tmp_path):
    """Saving an alias under a new backend must remove the other backend's
    stale artifact — otherwise auto-detecting load resumes old weights
    against fresh metadata."""
    import numpy as np
    from mmqg_tpu import checkpoint as ckpt

    s1 = {"w": np.ones((2, 2), np.float32)}
    s2 = {"w": np.full((2, 2), 7.0, np.float32)}
    ckpt.save_checkpoint(tmp_path, "last", s1, metadata={"epoch": 4},
                         backend="msgpack")
    ckpt.save_checkpoint(tmp_path, "last", s2, metadata={"epoch": 9},
                         backend="orbax")
    assert not (tmp_path / "last.msgpack").exists()
    restored, meta = ckpt.load_checkpoint(
        tmp_path, "last", {"w": np.zeros((2, 2), np.float32)})
    np.testing.assert_array_equal(restored["w"], s2["w"])
    assert meta["epoch"] == 9


def test_copy_checkpoint_aliases_without_reserialising(tmp_path):
    import numpy as np
    from mmqg_tpu import checkpoint as ckpt

    s = {"w": np.arange(4, dtype=np.float32)}
    ckpt.save_checkpoint(tmp_path, "last", s, metadata={"epoch": 3},
                         async_save=True)
    ckpt.copy_checkpoint(tmp_path, "last", "best", async_copy=True)
    ckpt.wait_for_pending()
    restored, meta = ckpt.load_checkpoint(
        tmp_path, "best", {"w": np.zeros((4,), np.float32)})
    np.testing.assert_array_equal(restored["w"], s["w"])
    assert meta["epoch"] == 3
