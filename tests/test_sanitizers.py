"""Sanitizer-grade checks (SURVEY §5): buffer-donation audit and NaN debug
toggle — the TPU-native analogues of the reference's (commented-out)
torch anomaly detection (non_attn_train.py:104)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmqg_tpu.data.dataset import QGDataset
from mmqg_tpu.models import qg_model
from mmqg_tpu.train import batch_arrays, init_train_state, make_optimizer, make_train_step
from mmqg_tpu.utils.profiling import nan_debugging


def test_train_step_donates_buffers(tiny_config, tiny_corpus):
    """The train step declares donate_argnums=(0,): the previous train state's
    buffers must be consumed (accessing them afterwards raises) — donation is
    what keeps two full optimizer states from coexisting in HBM."""
    ds = QGDataset(tiny_config, tiny_config.train_file, load_media=False)
    emb = np.load(tiny_config.weights_matrix_file).astype(np.float32)
    mc = qg_model.ModelConfig.from_config(tiny_config, n_vocab=len(ds.vocab),
                                          mode="text")
    config = tiny_config
    opt = make_optimizer(config)
    ts = jax.tree.map(jnp.asarray,
                      init_train_state(jax.random.PRNGKey(0), mc, emb, opt))
    old_table = ts["params"]["embedding"]["table"]
    step = make_train_step(mc, opt)
    batch = batch_arrays(next(ds.batches(config.batch_size)))
    new_ts, _ = step(ts, batch, jax.random.PRNGKey(1))
    jax.block_until_ready(new_ts["params"]["embedding"]["table"])
    assert old_table.is_deleted(), "donated input buffer still alive"


def test_nan_debugging_toggle():
    with nan_debugging(True):  # entering the context must not raise
        with pytest.raises(FloatingPointError):
            jax.jit(lambda x: x / 0.0)(jnp.zeros((4,)))
    # toggle restored: same computation passes silently outside
    out = jax.jit(lambda x: x / 0.0)(jnp.zeros((4,)))
    assert np.isnan(np.asarray(out)).all()
