import numpy as np

from mmqg_tpu.data import wav as wavio


def test_wav_roundtrip(tmp_path):
    rate = 8000
    t = np.linspace(0, 1, rate, endpoint=False)
    sig = 0.5 * np.sin(2 * np.pi * 440 * t).astype(np.float32)
    p = tmp_path / "a.wav"
    wavio.write_wav(p, sig, rate)
    back, r2 = wavio.read_wav(p)
    assert r2 == rate
    assert back.shape == (rate, 1)
    np.testing.assert_allclose(back[:, 0], sig, atol=1e-4)


def test_stereo_to_mono(tmp_path):
    rate = 4000
    left = np.ones(rate, np.float32) * 0.5
    right = np.zeros(rate, np.float32)
    stereo = np.stack([left, right], axis=1)
    p = tmp_path / "s.wav"
    wavio.write_wav(p, stereo, rate)
    back, _ = wavio.read_wav(p)
    assert back.shape == (rate, 2)
    mono = wavio.to_mono(back)
    np.testing.assert_allclose(mono, 0.25, atol=1e-3)


def test_resample_preserves_tone():
    rate, dst = 44100, 16000
    t = np.arange(rate) / rate
    sig = np.sin(2 * np.pi * 100 * t).astype(np.float32)
    out = wavio.resample_linear(sig, rate, dst)
    assert abs(len(out) - dst) <= 1
    # a 100 Hz tone survives linear resampling nearly unchanged
    t2 = np.arange(len(out)) / dst
    expected = np.sin(2 * np.pi * 100 * t2)
    assert np.corrcoef(out, expected)[0, 1] > 0.999


def test_clip_span():
    rate = 1000
    sig = np.arange(10 * rate, dtype=np.float32)
    clip = wavio.clip_span(sig, rate, 2.0, 3.5)
    assert len(clip) == 1500
    assert clip[0] == 2000.0


def test_wav_reader_survives_garbage(tmp_path):
    """Truncated/corrupt wav files must raise a clean error or return data,
    never crash the process or loop forever."""
    import random

    from mmqg_tpu.data import wav as wavio

    rng = random.Random(0)
    # a valid file, then progressively truncated copies + pure garbage
    good = tmp_path / "good.wav"
    wavio.write_wav(good, (np.arange(2000) % 321).astype(np.int16), 16000)
    blob = good.read_bytes()
    cases = [blob[:k] for k in (0, 4, 11, 12, 20, 44, 45, len(blob) // 2)]
    cases += [bytes(rng.randrange(256) for _ in range(n))
              for n in (0, 3, 30, 100)]
    cases += [b"RIFF" + blob[4:20]]  # header-only
    for i, payload in enumerate(cases):
        p = tmp_path / f"c{i}.wav"
        p.write_bytes(payload)
        try:
            samples, rate = wavio.read_wav(p)
            assert rate >= 0 and samples.ndim in (1, 2)
        except (ValueError, EOFError, OSError):
            pass  # clean rejection is fine
