import jax
import jax.numpy as jnp
import numpy as np

from mmqg_tpu.models import layers as L
from mmqg_tpu.models import text_encoder


def test_final_state_is_at_true_length():
    """The latched final state must equal running the LSTM on the truncated
    sequence alone (the reference's exact-length loop semantics,
    train.py:164-169)."""
    B, Lc, D, H, NL = 3, 7, 4, 6, 2
    rng = np.random.RandomState(0)
    emb_table = jnp.asarray(rng.randn(20, D), jnp.float32)
    params = text_encoder.init(jax.random.PRNGKey(0), emb_dim=D, hidden_dim=H,
                               num_layers=NL)
    ids = rng.randint(3, 20, (B, Lc)).astype(np.int32)
    lens = np.asarray([3, 7, 1], np.int32)

    outs, (h, c) = text_encoder.apply(params, emb_table, jnp.asarray(ids),
                                      jnp.asarray(lens), dtype=jnp.float32)
    assert outs.shape == (B, Lc, H)
    assert h.shape == (NL, B, H)

    # oracle per sample: scan only the true-length prefix
    for b in range(B):
        prefix = jnp.take(emb_table, jnp.asarray(ids[b:b+1, :lens[b]]), axis=0)
        _, (h_ref, c_ref) = L.lstm_scan(params["lstm"], prefix,
                                        dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(h[:, b]), np.asarray(h_ref[:, 0]),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(c[:, b]), np.asarray(c_ref[:, 0]),
                                   atol=1e-5)
        # outputs past length are zero-masked
        np.testing.assert_array_equal(np.asarray(outs[b, lens[b]:]), 0.0)
