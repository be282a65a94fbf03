"""Custom-VJP Pallas LSTM vs jax.grad through the XLA scan (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mmqg_tpu.ops.lstm_train_pallas as K
from mmqg_tpu.models import layers as L


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(K, "_INTERPRET", True)


def _setup(B=2, T=5, In=4, H=8, seed=0):
    params = L.lstm_init(jax.random.PRNGKey(seed), In, H, 1)
    layer = params["layers"][0]
    xs = jnp.asarray(np.random.RandomState(seed).randn(B, T, In), jnp.float32)
    h0 = jnp.zeros((B, H))
    c0 = jnp.zeros((B, H))
    return params, layer, xs, h0, c0


def test_forward_matches_scan():
    params, layer, xs, h0, c0 = _setup()
    out, c_seq, hT, cT = K.lstm_layer_train(
        layer["wx"], layer["wh"], layer["b"], xs, h0, c0, "float32")
    ref_out, (ref_h, ref_c) = L.lstm_scan(params, xs, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=1e-5)
    np.testing.assert_allclose(np.asarray(hT), np.asarray(ref_h[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(cT), np.asarray(ref_c[0]), atol=1e-5)


@pytest.mark.parametrize("loss_kind", ["outputs", "final_state", "mixed"])
def test_gradients_match_xla(loss_kind):
    params, layer, xs, h0, c0 = _setup(seed=1)
    w_out = jnp.asarray(np.random.RandomState(9).randn(8, 3), jnp.float32)

    def loss_pallas(wx, wh, b, xs_):
        out, c_seq, hT, cT = K.lstm_layer_train(wx, wh, b, xs_, h0, c0,
                                                "float32")
        if loss_kind == "outputs":
            return ((out @ w_out) ** 2).sum()
        if loss_kind == "final_state":
            return (hT ** 2).sum() + (cT ** 2).sum()
        return ((out @ w_out) ** 2).sum() + (hT * cT).sum() + c_seq.sum()

    def loss_xla(wx, wh, b, xs_):
        p = {"layers": [{"wx": wx, "wh": wh, "b": b}]}
        out, (hT, cT) = L.lstm_scan(p, xs_, dtype=jnp.float32)
        if loss_kind == "outputs":
            return ((out @ w_out) ** 2).sum()
        if loss_kind == "final_state":
            return (hT[0] ** 2).sum() + (cT[0] ** 2).sum()
        # c_seq equivalent: rebuild via scan? use pallas fwd parity instead:
        out_p, c_seq, hT2, cT2 = K.lstm_layer_train(
            wx, wh, b, xs_, h0, c0, "float32")
        del out_p, hT2, cT2
        return ((out @ w_out) ** 2).sum() + (hT[0] * cT[0]).sum() + jax.lax.stop_gradient(c_seq).sum()

    args = (layer["wx"], layer["wh"], layer["b"], xs)
    g_p = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(*args)

    if loss_kind == "mixed":
        # oracle for the c_seq term: finite differences on a few coords
        def f(wx):
            return loss_pallas(wx, layer["wh"], layer["b"], xs)
        eps = 1e-3
        rng = np.random.RandomState(3)
        for _ in range(3):
            i, j = rng.randint(layer["wx"].shape[0]), rng.randint(layer["wx"].shape[1])
            wp = layer["wx"].at[i, j].add(eps)
            wm = layer["wx"].at[i, j].add(-eps)
            fd = (f(wp) - f(wm)) / (2 * eps)
            assert abs(float(g_p[0][i, j]) - float(fd)) < 5e-2 * max(1.0, abs(float(fd)))
        return

    g_x = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(*args)
    for a, b_, name in zip(g_p, g_x, ("wx", "wh", "b", "xs")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4,
                                   err_msg=name)


def test_stack_matches_multilayer_scan_grads():
    B, T, In, H, NL = 2, 4, 4, 8, 2
    params = L.lstm_init(jax.random.PRNGKey(2), In, H, NL)
    xs = jnp.asarray(np.random.RandomState(2).randn(B, T, In), jnp.float32)

    def loss_pallas(p):
        out, (hT, cT) = K.lstm_stack_train(p, xs, dtype_name="float32")
        return (out ** 2).sum() + (hT ** 2).sum()

    def loss_xla(p):
        out, (hT, cT) = L.lstm_scan(p, xs, dtype=jnp.float32)
        return (out ** 2).sum() + (hT ** 2).sum()

    g_p = jax.grad(loss_pallas)(params)
    g_x = jax.grad(loss_xla)(params)
    for li in range(NL):
        for key in ("wx", "wh", "b"):
            np.testing.assert_allclose(
                np.asarray(g_p["layers"][li][key]),
                np.asarray(g_x["layers"][li][key]), atol=1e-4,
                err_msg=f"layer{li}/{key}")
