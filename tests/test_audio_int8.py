"""int8-quantized VGGish serving path: numerical proximity to the f32 oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmqg_tpu.models import audio_encoder


@pytest.fixture(scope="module")
def setup():
    params = audio_encoder.init(jax.random.PRNGKey(0))
    mel = jnp.asarray(np.random.RandomState(0).randn(4, 96, 64) * 0.5,
                      jnp.float32)
    return params, mel


def test_int8_close_to_f32(setup):
    params, mel = setup
    ref = np.asarray(audio_encoder.embed_examples(params, mel,
                                                  dtype=jnp.float32))
    got = np.asarray(audio_encoder.embed_examples_int8(params, mel,
                                                       dtype=jnp.float32))
    assert got.shape == ref.shape
    assert np.all(np.isfinite(got))
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.05, f"int8 quantization error too large: rel={rel:.4f}"


def test_int8_zero_input_defined(setup):
    """All-zero mel (fully padded slots) must not divide by a zero scale."""
    params, _ = setup
    out = np.asarray(audio_encoder.embed_examples_int8(
        params, jnp.zeros((2, 96, 64)), dtype=jnp.float32))
    assert np.all(np.isfinite(out))


def test_int8_batch_composition_independent(setup):
    """Per-example activation scales: an example's embedding must not depend
    on what else shares the batch."""
    params, mel = setup
    solo = np.asarray(audio_encoder.embed_examples_int8(
        params, mel[:1], dtype=jnp.float32))
    batched = np.asarray(audio_encoder.embed_examples_int8(
        params, mel, dtype=jnp.float32))[:1]
    np.testing.assert_allclose(solo, batched, atol=1e-5, rtol=1e-5)


def test_static_calibrated_scales(setup):
    """Static (calibrated) activation scales: same accuracy class as dynamic
    per-example scales on in-distribution data."""
    params, mel = setup
    scales = audio_encoder.calibrate_int8_scales(params, mel)
    assert len(scales) == 5 and all(s > 0 for s in scales)
    ref = np.asarray(audio_encoder.embed_examples(params, mel,
                                                  dtype=jnp.float32))
    got = np.asarray(audio_encoder.embed_examples_int8(
        params, mel, dtype=jnp.float32, act_scales=scales))
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.05, f"static int8 error too large: rel={rel:.4f}"
