"""Exactness of the space-to-depth conv reformulation (ops/s2d_conv.py)
against lax.conv SAME, including pool fusion and gradients."""

import jax
import jax.numpy as jnp
import numpy as np

from mmqg_tpu.ops import s2d_conv as S


def _fine_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def test_s2d_d2s_roundtrip():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 6, 3), jnp.float32)
    np.testing.assert_array_equal(np.asarray(S.d2s(S.s2d(x))), np.asarray(x))


def test_conv3x3_s2d_matches_fine_conv():
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(2, 12, 8, 5), jnp.float32)
    w = jnp.asarray(rs.randn(3, 3, 5, 7), jnp.float32)
    ref = _fine_conv(x, w)
    got = S.d2s(S.conv3x3_s2d(x, S.coarsen_weights(w), dtype=jnp.float32))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_group_max_is_fine_pool():
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(2, 8, 6, 4), jnp.float32)
    w = jnp.asarray(rs.randn(3, 3, 4, 6), jnp.float32)
    y_fine = _fine_conv(x, w)
    ref = y_fine.reshape(2, 4, 2, 3, 2, 6).max(axis=(2, 4))  # 2x2 pool
    got = S.group_max(S.conv3x3_s2d(x, S.coarsen_weights(w),
                                    dtype=jnp.float32))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_coarsen_bias_matches():
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.randn(1, 4, 4, 2), jnp.float32)
    w = jnp.asarray(rs.randn(3, 3, 2, 3), jnp.float32)
    b = jnp.asarray(rs.randn(3), jnp.float32)
    ref = _fine_conv(x, w) + b
    got = S.d2s(S.conv3x3_s2d(x, S.coarsen_weights(w), dtype=jnp.float32)
                + S.coarsen_bias(b))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_gradients_flow_to_fine_weights():
    """coarsen_weights is linear: grads wrt the FINE kernel through the s2d
    path must equal grads through the fine conv."""
    rs = np.random.RandomState(4)
    x = jnp.asarray(rs.randn(2, 8, 6, 3), jnp.float32)
    w = jnp.asarray(rs.randn(3, 3, 3, 4), jnp.float32)

    def loss_fine(w):
        return jnp.sum(_fine_conv(x, w) ** 2)

    def loss_s2d(w):
        y = S.d2s(S.conv3x3_s2d(x, S.coarsen_weights(w), dtype=jnp.float32))
        return jnp.sum(y ** 2)

    g_ref = jax.grad(loss_fine)(w)
    g_got = jax.grad(loss_s2d)(w)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-4)
