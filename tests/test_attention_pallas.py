"""Fused Pallas attention kernel vs the XLA oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from mmqg_tpu.ops import attention as A
from mmqg_tpu.ops.attention_pallas import trimodal_attention_pallas


def _setup(B=8, Dq=12, Lt=10, La=6, Ht=16, Hv=16, Ha=8, seed=0):
    rng = np.random.RandomState(seed)
    params = A.init(jax.random.PRNGKey(seed), query_dim=Dq, text_len=Lt,
                    av_len=La)
    q = jnp.asarray(rng.randn(B, Dq), jnp.float32)
    et = jnp.asarray(rng.randn(B, Lt, Ht), jnp.float32)
    ev = jnp.asarray(rng.randn(B, La, Hv), jnp.float32)
    ea = jnp.asarray(rng.randn(B, La, Ha), jnp.float32)
    tl = jnp.asarray(rng.randint(1, Lt + 1, (B,)), jnp.int32)
    vl = jnp.asarray(rng.randint(1, La + 1, (B,)), jnp.int32)
    al = jnp.asarray(rng.randint(1, La + 1, (B,)), jnp.int32)
    return params, q, et, ev, ea, tl, vl, al


def test_matches_xla_oracle():
    params, q, et, ev, ea, tl, vl, al = _setup()
    ref = A.trimodal_attention_xla(params, q, et, ev, ea, tl, vl, al,
                                   dtype=jnp.float32)
    got = trimodal_attention_pallas(params, q, et, ev, ea, tl, vl, al,
                                    dtype=jnp.float32, interpret=True)
    for r, g, name in [(ref[0], got[0], "ctx_t"), (ref[1], got[1], "ctx_a"),
                       (ref[2], got[2], "ctx_v")]:
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=1e-5,
                                   err_msg=name)
    for k in ("text", "video", "audio"):
        np.testing.assert_allclose(np.asarray(got[3][k]),
                                   np.asarray(ref[3][k]), atol=1e-5,
                                   err_msg=k)


def test_padding_is_invisible():
    """Corrupting memory past the true lengths must not change contexts."""
    params, q, et, ev, ea, tl, vl, al = _setup(seed=1)
    tl = jnp.full_like(tl, 4)
    out1 = trimodal_attention_pallas(params, q, et, ev, ea, tl, vl, al,
                                     dtype=jnp.float32, interpret=True)
    et2 = np.asarray(et).copy()
    et2[:, 4:] = 1e6
    out2 = trimodal_attention_pallas(params, q, jnp.asarray(et2), ev, ea,
                                     tl, vl, al, dtype=jnp.float32,
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(out1[0]), np.asarray(out2[0]),
                               atol=1e-5)


def test_odd_batch_sizes():
    for B in (2, 4):
        params, q, et, ev, ea, tl, vl, al = _setup(B=B, seed=B)
        ref = A.trimodal_attention_xla(params, q, et, ev, ea, tl, vl, al,
                                       dtype=jnp.float32)
        got = trimodal_attention_pallas(params, q, et, ev, ea, tl, vl, al,
                                        dtype=jnp.float32, interpret=True)
        np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                                   atol=1e-5)
