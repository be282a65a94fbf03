"""Layer numerics vs a torch oracle (torch is CPU-only here and used ONLY as a
test oracle, never in the framework)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from mmqg_tpu.models import layers as L


def _lstm_to_torch(params, input_dim, hidden, layers):
    """Copy our fused (In,4H) i,f,g,o weights into a torch.nn.LSTM."""
    m = torch.nn.LSTM(input_dim, hidden, layers)
    sd = {}
    for li, layer in enumerate(params["layers"]):
        wx = np.asarray(layer["wx"])  # (In, 4H) i f g o
        wh = np.asarray(layer["wh"])
        b = np.asarray(layer["b"])
        sd[f"weight_ih_l{li}"] = torch.tensor(wx.T)
        sd[f"weight_hh_l{li}"] = torch.tensor(wh.T)
        sd[f"bias_ih_l{li}"] = torch.tensor(b)
        sd[f"bias_hh_l{li}"] = torch.zeros(len(b))
    m.load_state_dict(sd)
    return m


@pytest.mark.parametrize("layers", [1, 3])
def test_lstm_scan_matches_torch(layers):
    B, T, In, H = 2, 5, 6, 8
    rng = jax.random.PRNGKey(0)
    params = L.lstm_init(rng, In, H, layers)
    xs = np.random.RandomState(0).randn(B, T, In).astype(np.float32)

    outs, (h, c) = L.lstm_scan(params, jnp.asarray(xs), dtype=jnp.float32)

    m = _lstm_to_torch(params, In, H, layers)
    with torch.no_grad():
        t_out, (t_h, t_c) = m(torch.tensor(xs).transpose(0, 1))
    np.testing.assert_allclose(np.asarray(outs),
                               t_out.transpose(0, 1).numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h), t_h.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c), t_c.numpy(), atol=1e-5)


def test_lstm_step_equals_scan():
    B, T, In, H = 3, 4, 5, 8
    params = L.lstm_init(jax.random.PRNGKey(1), In, H, 2)
    xs = jnp.asarray(np.random.RandomState(1).randn(B, T, In), jnp.float32)
    outs, final = L.lstm_scan(params, xs, dtype=jnp.float32)
    state = L.lstm_zero_state(2, B, H)
    for t in range(T):
        top, state = L.lstm_step(params, xs[:, t], state, dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(top), np.asarray(outs[:, t]),
                                   atol=1e-5)
    np.testing.assert_allclose(np.asarray(state[0]), np.asarray(final[0]),
                               atol=1e-5)


def test_conv2d_matches_torch():
    B, H, W, Cin, Cout, K = 2, 9, 9, 3, 4, 3
    params = L.conv_init(jax.random.PRNGKey(2), Cin, Cout, K)
    x = np.random.RandomState(2).randn(B, H, W, Cin).astype(np.float32)
    y = L.conv2d(params, jnp.asarray(x), dtype=jnp.float32)

    m = torch.nn.Conv2d(Cin, Cout, K)
    with torch.no_grad():
        m.weight.copy_(torch.tensor(np.transpose(np.asarray(params["w"]),
                                                 (3, 2, 0, 1))))
        m.bias.copy_(torch.tensor(np.asarray(params["b"])))
        t_y = m(torch.tensor(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(y), t_y.numpy(), atol=1e-4)


def test_maxpool_matches_torch():
    x = np.random.RandomState(3).randn(2, 9, 9, 4).astype(np.float32)
    y = L.maxpool2d(jnp.asarray(x), 3)
    t_y = torch.nn.functional.max_pool2d(
        torch.tensor(x).permute(0, 3, 1, 2), 3).permute(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(y), t_y.numpy(), atol=1e-6)


def test_batchnorm_train_and_eval():
    p, s = L.batchnorm_init(4)
    x = jnp.asarray(np.random.RandomState(4).randn(8, 5, 5, 4), jnp.float32)
    y, s2 = L.batchnorm(p, s, x, train=True)
    # normalised output: ~zero mean, ~unit var per channel
    np.testing.assert_allclose(np.asarray(y.mean((0, 1, 2))), 0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(y.std((0, 1, 2))), 1, atol=1e-2)
    assert float(s2["count"]) == 1
    # eval mode normalises with the RUNNING stats and leaves state alone
    y2, s3 = L.batchnorm(p, s2, x, train=False)
    assert float(s3["count"]) == 1
    np.testing.assert_allclose(np.asarray(s3["mean"]), np.asarray(s2["mean"]))
    np.testing.assert_allclose(np.asarray(s3["var"]), np.asarray(s2["var"]))
    expect = ((np.asarray(x) - np.asarray(s2["mean"]))
              / np.sqrt(np.asarray(s2["var"]) + 1e-5)
              * np.asarray(p["scale"]) + np.asarray(p["bias"]))
    np.testing.assert_allclose(np.asarray(y2), expect, atol=1e-5)


def test_dense_shapes_and_grad():
    params = L.dense_init(jax.random.PRNGKey(5), 6, 3)
    x = jnp.ones((2, 6))
    y = L.dense(params, x, dtype=jnp.float32)
    assert y.shape == (2, 3)
    g = jax.grad(lambda p: L.dense(p, x, dtype=jnp.float32).sum())(params)
    assert g["w"].shape == (6, 3)
