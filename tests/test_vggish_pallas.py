"""Fused VGGish conv kernel vs the XLA conv-stack oracle (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmqg_tpu.models import audio_encoder
from mmqg_tpu.ops.vggish_pallas import embed_examples_pallas, vggish_features_pallas


@pytest.fixture(scope="module")
def setup():
    params = audio_encoder.init(jax.random.PRNGKey(0))  # full 96x64 VGGish
    mel = jnp.asarray(np.random.RandomState(0).randn(3, 96, 64) * 0.5,
                      jnp.float32)
    return params, mel


def _xla_features(params, mel):
    """The conv stack of audio_encoder.embed_examples, stopped pre-fc."""
    from mmqg_tpu.models import layers as L

    x = mel[..., None]
    ci = 0
    for _, reps in audio_encoder._BLOCKS:
        for _ in range(reps):
            x = jax.nn.relu(L.conv2d(params["convs"][ci], x, padding="SAME",
                                     dtype=jnp.float32,
                                     out_dtype=jnp.float32))
            ci += 1
        x = L.maxpool2d(x, 2)
    return x.reshape(x.shape[0], -1)


def test_features_match_xla(setup):
    params, mel = setup
    ref = np.asarray(_xla_features(params, mel))
    got = np.asarray(vggish_features_pallas(params, mel, dtype=jnp.float32,
                                            interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=1e-3)


def test_odd_example_count_padding(setup):
    params, mel = setup
    # E_TILE=8 with N=3 -> internal pad; output must still be exact N rows
    got = vggish_features_pallas(params, mel, dtype=jnp.float32,
                                 interpret=True)
    assert got.shape == (3, 6 * 4 * 512)
    ref = np.asarray(_xla_features(params, mel))
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-3, rtol=1e-3)


def test_full_embedding_matches(setup):
    params, mel = setup
    ref = audio_encoder.embed_examples(params, mel, dtype=jnp.float32)
    got = embed_examples_pallas(params, mel, dtype=jnp.float32,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-2,
                               rtol=2e-2)
