import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmqg_tpu.models import audio_encoder


def test_shapes_and_masking():
    params = audio_encoder.init(jax.random.PRNGKey(0), mel_frames=16,
                                mel_bins=16, embedding_dim=8)
    mel = jnp.asarray(np.random.RandomState(0).randn(2, 3, 16, 16), jnp.float32)
    lens = jnp.asarray([2, 3])
    out = audio_encoder.apply(params, mel, lens, dtype=jnp.float32)
    assert out.shape == (2, 3, 8)
    np.testing.assert_array_equal(np.asarray(out[0, 2:]), 0.0)
    assert np.abs(np.asarray(out[1])).sum() > 0


def test_vggish_weight_port():
    """Round-trip released-checkpoint layout into our pytree."""
    params = audio_encoder.init(jax.random.PRNGKey(1))  # full 96x64 VGGish
    rng = np.random.RandomState(0)
    sd = {}
    chans = [(1, 64), (64, 128), (128, 256), (256, 256), (256, 512), (512, 512)]
    for key, (ci, co) in zip(audio_encoder._VGGISH_CONV_KEYS, chans):
        sd[f"{key}.weight"] = rng.randn(co, ci, 3, 3).astype(np.float32)
        sd[f"{key}.bias"] = rng.randn(co).astype(np.float32)
    dims = [(12288, 4096), (4096, 4096), (4096, 128)]
    for key, (di, do) in zip(audio_encoder._VGGISH_FC_KEYS, dims):
        sd[f"{key}.weight"] = rng.randn(do, di).astype(np.float32)
        sd[f"{key}.bias"] = rng.randn(do).astype(np.float32)

    ported = audio_encoder.load_vggish_state_dict(params, sd)
    # conv kernel transposed correctly: (O,I,H,W) -> (H,W,I,O)
    np.testing.assert_array_equal(
        np.asarray(ported["convs"][0]["w"])[..., 0, 5],
        sd["features.0.weight"][5, 0])
    np.testing.assert_array_equal(
        np.asarray(ported["fc3"]["w"])[:, 7], sd["embeddings.4.weight"][7])

    # shape mismatch raises
    bad = dict(sd)
    bad["features.0.weight"] = rng.randn(64, 2, 3, 3).astype(np.float32)
    with pytest.raises(ValueError):
        audio_encoder.load_vggish_state_dict(params, bad)
