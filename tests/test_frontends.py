import jax.numpy as jnp
import numpy as np

from mmqg_tpu.models import frontends as F


def test_mel_filterbank_shape_and_coverage():
    fb = F.mel_filterbank(64, 257, 16000, 125.0, 7500.0)
    assert fb.shape == (257, 64)
    assert fb.min() >= 0
    # every mel bin has some support
    assert (fb.sum(axis=0) > 0).all()
    assert fb[0].sum() == 0  # DC excluded


def test_log_mel_matches_numpy_stft_oracle():
    """STFT-as-conv must equal an explicit numpy frame+rfft pipeline."""
    rng = np.random.RandomState(0)
    sr, win, hop, n_mel, fpe, max_ex = 1600, 64, 32, 16, 8, 2
    S = (max_ex * fpe - 1) * hop + win
    pcm = rng.randn(1, S).astype(np.float32) * 0.1

    out = F.log_mel_examples(jnp.asarray(pcm), sample_rate=sr, window=win,
                             hop=hop, mel_bins=n_mel, frames_per_example=fpe,
                             max_examples=max_ex, dtype=jnp.float32)
    assert out.shape == (1, max_ex, fpe, n_mel)

    # numpy oracle
    fft_len = 64
    n = np.arange(win)
    hann = 0.5 - 0.5 * np.cos(2 * np.pi * n / win)
    frames = np.stack([pcm[0, i * hop:i * hop + win] * hann
                       for i in range(max_ex * fpe)])
    mag = np.abs(np.fft.rfft(frames, fft_len, axis=-1))
    fb = F.mel_filterbank(n_mel, fft_len // 2 + 1, sr, 125.0, 7500.0)
    ref = np.log(mag @ fb + 0.01).reshape(max_ex, fpe, n_mel)
    np.testing.assert_allclose(np.asarray(out[0]), ref, atol=2e-3)


def test_audio_num_examples():
    sr, win, hop, fpe = 1600, 64, 32, 16
    # one full example needs (fpe-1)*hop + win samples
    need = (fpe - 1) * hop + win
    lens = jnp.asarray([0, need - 1, need, 3 * need])
    out = F.audio_num_examples(lens, sample_rate=sr, hop=hop, window=win,
                               frames_per_example=fpe, max_examples=4)
    assert out.tolist() == [0, 0, 1, 3]


def test_prepare_frames_scaling_and_norm():
    x = np.full((1, 2, 16, 16, 3), 255, np.uint8)
    out = F.prepare_frames(jnp.asarray(x), size=16, normalize=False)
    np.testing.assert_allclose(np.asarray(out), 1.0)
    out2 = F.prepare_frames(jnp.asarray(x), size=16, normalize=True,
                            mean=(0.5, 0.5, 0.5), std=(0.25, 0.25, 0.25))
    np.testing.assert_allclose(np.asarray(out2), 2.0, atol=1e-6)


def test_prepare_frames_resize():
    x = np.zeros((1, 1, 32, 48, 3), np.uint8)
    out = F.prepare_frames(jnp.asarray(x), size=16, normalize=False)
    # min side 32 -> 16, scale 0.5 applied to both dims
    assert out.shape == (1, 1, 16, 24, 3)


def test_log_mel_bf16_spec_close_to_f32():
    """The serving-path bf16 spectrogram (``spec_dtype``) must stay within
    bf16 rounding of the f32 intermediate path (the log output is f32 in
    both)."""
    rng = np.random.RandomState(1)
    sr, win, hop, n_mel, fpe, max_ex = 1600, 64, 32, 16, 8, 2
    S = (max_ex * fpe - 1) * hop + win
    pcm = rng.randn(2, S).astype(np.float32) * 0.1
    kw = dict(sample_rate=sr, window=win, hop=hop, mel_bins=n_mel,
              frames_per_example=fpe, max_examples=max_ex, dtype=jnp.float32)
    ref = np.asarray(F.log_mel_examples(jnp.asarray(pcm), **kw))
    alt = np.asarray(F.log_mel_examples(jnp.asarray(pcm),
                                        spec_dtype=jnp.bfloat16, **kw))
    assert alt.dtype == ref.dtype == np.float32
    # log-mel values are O(log 0.01)..O(1); bf16 magnitudes give ~1e-2 abs
    np.testing.assert_allclose(alt, ref, atol=5e-2)
    assert np.abs(alt - ref).mean() < 1e-2
