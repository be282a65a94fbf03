import jax
import jax.numpy as jnp
import numpy as np

from mmqg_tpu.models import video_resnet


def test_shapes_and_finite():
    params, state = video_resnet.init(jax.random.PRNGKey(0))
    clips = jnp.asarray(np.random.RandomState(0).rand(1, 4, 32, 32, 3),
                        jnp.float32)
    emb, new_state = video_resnet.apply(params, state, clips,
                                        dtype=jnp.float32)
    assert emb.shape == (1, 512)
    assert np.isfinite(np.asarray(emb)).all()


def test_fc_head():
    params, state = video_resnet.init(jax.random.PRNGKey(1), embed_dim=64)
    clips = jnp.zeros((2, 2, 16, 16, 3), jnp.float32)
    emb, _ = video_resnet.apply(params, state, clips, dtype=jnp.float32)
    assert emb.shape == (2, 64)


def test_midplanes_formula():
    # r2plus1d midplane count (Tran et al.): 3*3*3*64*64/(3*3*64+3*64) = 144
    assert video_resnet._midplanes(64, 64) == 144
