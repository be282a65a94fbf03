import jax
import jax.numpy as jnp
import numpy as np

from mmqg_tpu.ops import attention as A


def _setup(B=2, Dq=10, Lt=6, La=4, Ht=8, Hv=8, Ha=4, seed=0):
    rng = np.random.RandomState(seed)
    params = A.init(jax.random.PRNGKey(seed), query_dim=Dq, text_len=Lt,
                    av_len=La)
    q = rng.randn(B, Dq).astype(np.float32)
    et = rng.randn(B, Lt, Ht).astype(np.float32)
    ev = rng.randn(B, La, Hv).astype(np.float32)
    ea = rng.randn(B, La, Ha).astype(np.float32)
    return params, q, et, ev, ea


def test_masking_is_real():
    """The reference's length mask was a no-op bug (model/decoder.py:79,85,93);
    ours must actually zero attention past the length."""
    params, q, et, ev, ea = _setup()
    tl = jnp.asarray([3, 6])
    vl = jnp.asarray([2, 4])
    al = jnp.asarray([1, 4])
    *_, maps = A.trimodal_attention_xla(
        params, jnp.asarray(q), jnp.asarray(et), jnp.asarray(ev),
        jnp.asarray(ea), tl, vl, al, dtype=jnp.float32)
    a_t = np.asarray(maps["text"])
    assert np.all(a_t[0, 3:] == 0)
    np.testing.assert_allclose(a_t.sum(-1), 1.0, atol=1e-6)
    a_a = np.asarray(maps["audio"])
    np.testing.assert_allclose(a_a[0], [1, 0, 0, 0], atol=1e-6)


def test_context_is_weighted_memory():
    params, q, et, ev, ea = _setup()
    tl = jnp.asarray([6, 6]); vl = jnp.asarray([4, 4]); al = jnp.asarray([4, 4])
    ctx_t, ctx_a, ctx_v, maps = A.trimodal_attention_xla(
        params, jnp.asarray(q), jnp.asarray(et), jnp.asarray(ev),
        jnp.asarray(ea), tl, vl, al, dtype=jnp.float32)
    ref = np.einsum("bl,blh->bh", np.asarray(maps["text"]), et)
    np.testing.assert_allclose(np.asarray(ctx_t), ref, atol=1e-5)
    assert ctx_a.shape == (2, 4) and ctx_v.shape == (2, 8)


def test_memory_past_length_cannot_leak():
    """Corrupt memory beyond the mask; context must not change."""
    params, q, et, ev, ea = _setup()
    tl = jnp.asarray([3, 3]); vl = jnp.asarray([2, 2]); al = jnp.asarray([2, 2])
    args = (jnp.asarray(q), jnp.asarray(et), jnp.asarray(ev), jnp.asarray(ea))
    out1 = A.trimodal_attention_xla(params, *args, tl, vl, al, dtype=jnp.float32)
    et2 = et.copy(); et2[:, 3:] = 1e6
    out2 = A.trimodal_attention_xla(
        params, jnp.asarray(q), jnp.asarray(et2), jnp.asarray(ev),
        jnp.asarray(ea), tl, vl, al, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out1[0]), np.asarray(out2[0]),
                               atol=1e-5)


def test_gradients_flow():
    params, q, et, ev, ea = _setup()
    tl = jnp.asarray([6, 6]); vl = jnp.asarray([4, 4]); al = jnp.asarray([4, 4])

    def loss(p):
        ctx_t, ctx_a, ctx_v, _ = A.trimodal_attention_xla(
            p, jnp.asarray(q), jnp.asarray(et), jnp.asarray(ev),
            jnp.asarray(ea), tl, vl, al, dtype=jnp.float32)
        return (ctx_t ** 2).sum() + (ctx_a ** 2).sum() + (ctx_v ** 2).sum()

    g = jax.grad(loss)(params)
    assert float(jnp.abs(g.w_text).sum()) > 0
    assert float(jnp.abs(g.w_audio).sum()) > 0
    assert float(jnp.abs(g.w_video).sum()) > 0  # a dead video head is a bug
