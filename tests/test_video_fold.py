import jax
import jax.numpy as jnp
import numpy as np

from mmqg_tpu.models import frontends, video_encoder


def test_folded_normalization_matches_explicit():
    """uint8 -> conv1(folded) must equal prepare_frames -> conv1."""
    mean = (0.43216, 0.394666, 0.37645)
    std = (0.22803, 0.22145, 0.216989)
    params, state = video_encoder.init(jax.random.PRNGKey(0), hidden_dim=8,
                                       flatten_dim=video_encoder.flatten_dim_for(32))
    u8 = np.random.RandomState(0).randint(0, 256, (2, 3, 32, 32, 3), np.uint8)
    lens = jnp.asarray([3, 2])

    out_fast, _ = video_encoder.apply(params, state, jnp.asarray(u8), lens,
                                      normalization=(mean, std),
                                      dtype=jnp.float32)
    prepared = frontends.prepare_frames(jnp.asarray(u8), size=32, mean=mean,
                                        std=std, normalize=True)
    out_ref, _ = video_encoder.apply(params, state, prepared, lens,
                                     dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out_fast), np.asarray(out_ref),
                               atol=1e-4)


def test_fold_identity_scale():
    """normalize=False fold is exactly the /255 transform."""
    params, state = video_encoder.init(jax.random.PRNGKey(1), hidden_dim=8,
                                       flatten_dim=video_encoder.flatten_dim_for(32))
    u8 = np.random.RandomState(1).randint(0, 256, (1, 2, 32, 32, 3), np.uint8)
    lens = jnp.asarray([2])
    out_fast, _ = video_encoder.apply(
        params, state, jnp.asarray(u8), lens,
        normalization=((0., 0., 0.), (1., 1., 1.)), dtype=jnp.float32)
    out_ref, _ = video_encoder.apply(
        params, state, jnp.asarray(u8, jnp.float32) / 255.0, lens,
        dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out_fast), np.asarray(out_ref),
                               atol=1e-4)
