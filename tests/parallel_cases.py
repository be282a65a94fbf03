"""Multi-chip sharding exercised on the 8-device virtual CPU mesh
(SURVEY.md §4: pjit logic must be CI-testable without hardware)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmqg_tpu.data.dataset import QGDataset
from mmqg_tpu.models import qg_model
from mmqg_tpu.parallel import make_mesh, param_shardings, shard_batch, shard_params
from mmqg_tpu.train import batch_arrays, init_train_state, make_optimizer, make_train_step


def test_virtual_devices_present():
    assert len(jax.devices()) == 8


@pytest.fixture(scope="module")
def setup(tiny_config, tiny_corpus):
    ds = QGDataset(tiny_config, tiny_config.train_file)
    emb = np.load(tiny_config.weights_matrix_file).astype(np.float32)
    mc = qg_model.ModelConfig.from_config(tiny_config, n_vocab=len(ds.vocab),
                                          mode="trimodal")
    config = tiny_config.replace(batch_size=8)
    optimizer = make_optimizer(config)
    ts0 = init_train_state(jax.random.PRNGKey(0), mc, emb, optimizer)
    # host copy: the train step donates its input buffers, so each test run
    # must start from fresh device arrays
    ts_host = jax.tree.map(
        lambda x: np.asarray(x) if hasattr(x, "ndim") else x, ts0)
    batch = batch_arrays(next(ds.batches(8)))

    def fresh_ts():
        return jax.tree.map(
            lambda x: jnp.asarray(np.array(x)) if hasattr(x, "ndim") else x,
            ts_host)

    return config, mc, optimizer, fresh_ts, batch


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2), (2, 4)])
def test_train_step_on_mesh(setup, mesh_shape):
    config, mc, optimizer, fresh_ts, batch = setup
    ts = fresh_ts()
    mesh = make_mesh(mesh_shape)
    ts_sharded = {
        "params": shard_params(ts["params"], mesh),
        "model_state": jax.tree.map(jnp.asarray, ts["model_state"]),
        "opt_state": shard_params(ts["opt_state"], mesh),
        "step": ts["step"],
    }
    sbatch = shard_batch(batch, mesh)
    step_fn = make_train_step(mc, optimizer, use_pallas=False)
    new_ts, metrics = step_fn(ts_sharded, sbatch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["grad_norm"]))


def test_dp_matches_single_device(setup):
    """Data-parallel gradients must equal single-device gradients."""
    config, mc, optimizer, fresh_ts, batch = setup
    step_fn = make_train_step(mc, optimizer, use_pallas=False)

    new1, m1 = step_fn(fresh_ts(), batch, jax.random.PRNGKey(2))

    mesh = make_mesh((8, 1))
    ts = fresh_ts()
    ts8 = {
        "params": shard_params(ts["params"], mesh),
        "model_state": jax.tree.map(jnp.asarray, ts["model_state"]),
        "opt_state": shard_params(ts["opt_state"], mesh),
        "step": ts["step"],
    }
    new8, m8 = step_fn(ts8, shard_batch(batch, mesh), jax.random.PRNGKey(2))
    assert float(m1["loss"]) == pytest.approx(float(m8["loss"]), rel=2e-2)


def test_tp_sharding_rules_shard_big_matrices(setup):
    config, mc, optimizer, fresh_ts, batch = setup
    mesh = make_mesh((4, 2))
    sh = param_shardings(fresh_ts()["params"], mesh)
    # decoder vocab projection sharded over model axis
    spec = sh["decoder"]["out"]["w"].spec
    assert "model" in str(spec)
    # biases replicated
    spec_b = sh["decoder"]["out"]["b"].spec
    assert "model" not in str(spec_b)


def test_sequence_parallel_constraint(setup):
    """Context-axis (sequence-parallel) sharding of attention memories
    compiles and preserves numerics on a (2, 4) mesh."""
    from mmqg_tpu.parallel.mesh import sp_greedy_decode
    from mmqg_tpu import decode as DEC

    config, mc, optimizer, fresh_ts, batch = setup
    mesh = make_mesh((2, 4))
    ts = fresh_ts()
    sbatch = shard_batch(batch, mesh)
    toks_sp = np.asarray(sp_greedy_decode(
        ts["params"], ts["model_state"], mc, sbatch, mesh,
        max_len=4, rng_seed=0))

    toks_ref = np.asarray(DEC.decode_batch(
        ts["params"], ts["model_state"], mc, batch, jax.random.PRNGKey(0),
        strategy="greedy", max_len=4, use_pallas=False))
    np.testing.assert_array_equal(toks_sp, toks_ref)


def test_trainer_data_parallel_matches_single_device(tiny_config, tiny_corpus):
    """The Trainer's mesh path (CLI --data-parallel) must reproduce
    single-device training: same epoch loss, working validate/BLEU, and
    correct trimming of mesh-padding rows (batch 4 pads to the 8-device
    data axis)."""
    from mmqg_tpu.data.dataset import QGDataset
    from mmqg_tpu.train import Trainer

    def build(mesh):
        train_ds = QGDataset(tiny_config, tiny_config.train_file,
                             load_media=False)
        val_ds = QGDataset(tiny_config, tiny_config.val_file,
                           load_media=False)
        emb = np.load(tiny_config.weights_matrix_file).astype(np.float32)
        mc = qg_model.ModelConfig.from_config(
            tiny_config, n_vocab=len(train_ds.vocab), mode="text")
        return Trainer(tiny_config, mc, emb, train_ds, val_ds, mesh=mesh,
                       log_fn=lambda *a, **k: None)

    loss_1 = build(None).run_epoch(0)

    dp = build(make_mesh((8, 1)))
    loss_8 = dp.run_epoch(0)
    assert loss_1 == pytest.approx(loss_8, rel=2e-2)

    val = dp.validate()
    assert np.isfinite(val["loss"])
    assert 0.0 <= val["bleu"] <= 1.0


def test_trainer_rejects_indivisible_mesh_accum(tiny_config, tiny_corpus):
    """batch 12 pads to 16 on an 8-way data axis; accum 3 cannot split it —
    the Trainer must fail at construction, not at trace time."""
    from mmqg_tpu.data.dataset import QGDataset
    from mmqg_tpu.train import Trainer

    train_ds = QGDataset(tiny_config, tiny_config.train_file,
                         load_media=False)
    val_ds = QGDataset(tiny_config, tiny_config.val_file, load_media=False)
    emb = np.load(tiny_config.weights_matrix_file).astype(np.float32)
    mc = qg_model.ModelConfig.from_config(
        tiny_config, n_vocab=len(train_ds.vocab), mode="text")
    cfg = tiny_config.replace(batch_size=12, grad_accum_steps=3)
    with pytest.raises(ValueError, match="grad_accum_steps"):
        Trainer(cfg, mc, emb, train_ds, val_ds, mesh=make_mesh((8, 1)))
