"""Pallas LSTM sequence kernel vs the XLA scan oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmqg_tpu.models import layers as L
from mmqg_tpu.ops.lstm_pallas import lstm_layer_pallas, lstm_stack_pallas


def test_single_layer_matches_scan():
    B, T, In, H = 4, 6, 8, 8
    params = L.lstm_init(jax.random.PRNGKey(0), In, H, 1)
    xs = jnp.asarray(np.random.RandomState(0).randn(B, T, In), jnp.float32)
    ref_out, (ref_h, ref_c) = L.lstm_scan(params, xs, dtype=jnp.float32)

    layer = params["layers"][0]
    out, hT, cT = lstm_layer_pallas(layer, xs, jnp.zeros((B, H)),
                                    jnp.zeros((B, H)), dtype=jnp.float32,
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=1e-5)
    np.testing.assert_allclose(np.asarray(hT), np.asarray(ref_h[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(cT), np.asarray(ref_c[0]), atol=1e-5)


def test_latched_state_and_masking():
    B, T, In, H = 3, 5, 4, 8
    params = L.lstm_init(jax.random.PRNGKey(1), In, H, 1)
    xs = jnp.asarray(np.random.RandomState(1).randn(B, T, In), jnp.float32)
    lens = jnp.asarray([2, 5, 1], jnp.int32)
    out, hT, cT = lstm_layer_pallas(params["layers"][0], xs,
                                    jnp.zeros((B, H)), jnp.zeros((B, H)),
                                    lens, mask_output=True,
                                    dtype=jnp.float32, interpret=True)
    # outputs zero past length
    np.testing.assert_array_equal(np.asarray(out[0, 2:]), 0.0)
    np.testing.assert_array_equal(np.asarray(out[2, 1:]), 0.0)
    # latched state equals scanning the prefix only
    for b, n in enumerate([2, 5, 1]):
        _, (h_ref, c_ref) = L.lstm_scan(params, xs[b:b+1, :n],
                                        dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(hT[b]), np.asarray(h_ref[0, 0]),
                                   atol=1e-5)


def test_stack_matches_text_encoder_path():
    B, T, In, H, NL = 2, 5, 4, 8, 3
    params = {"lstm": L.lstm_init(jax.random.PRNGKey(2), In, H, NL)}
    xs = jnp.asarray(np.random.RandomState(2).randn(B, T, In), jnp.float32)
    lens = jnp.asarray([3, 5], jnp.int32)

    out, (h, c) = lstm_stack_pallas(params["lstm"], xs, lengths=lens,
                                    mask_output=True, dtype=jnp.float32,
                                    interpret=True)
    assert out.shape == (B, T, H)
    assert h.shape == (NL, B, H)
    # oracle: per-sample prefix scan
    for b, n in enumerate([3, 5]):
        ref_out, (h_ref, c_ref) = L.lstm_scan(params["lstm"], xs[b:b+1, :n],
                                              dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(out[b, :n]),
                                   np.asarray(ref_out[0]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(h[:, b]), np.asarray(h_ref[:, 0]),
                                   atol=1e-5)
