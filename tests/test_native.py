"""C++ host-ingest runtime vs the Python implementations."""

import numpy as np
import pytest

from mmqg_tpu.data import native
from mmqg_tpu.data import wav as wavio

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib unavailable (no g++?)")


def test_wav_decode_matches_python(tmp_path):
    rate = 44100
    t = np.arange(rate) / rate
    sig = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    stereo = np.stack([sig, sig * 0.5], axis=1)
    p = tmp_path / "a.wav"
    wavio.write_wav(p, stereo, rate)

    py = wavio.load_mono_16k(p, 16000)
    nat = native.load_wav_mono(p, 16000, 64000)
    assert nat is not None
    assert abs(len(nat) - len(py)) <= 2
    n = min(len(nat), len(py))
    # int16 quantisation + same linear resampler -> tight agreement
    np.testing.assert_allclose(nat[:n] / 32767.0, py[:n], atol=2e-3)


def test_frames_load_matches_numpy(tmp_path):
    fr = np.random.RandomState(0).randint(0, 256, (5, 16, 16, 3), np.uint8)
    p = tmp_path / "f.npy"
    np.save(p, fr)
    out = native.load_frames(p, 8, 16, 16)
    assert out is not None
    assert out.shape[0] == 5
    np.testing.assert_array_equal(out, fr)
    # t_max clamps
    out2 = native.load_frames(p, 3, 16, 16)
    np.testing.assert_array_equal(out2, fr[:3])


def test_frames_load_rejects_mismatch(tmp_path):
    fr = np.zeros((2, 8, 8, 3), np.uint8)
    p = tmp_path / "g.npy"
    np.save(p, fr)
    assert native.load_frames(p, 4, 16, 16) is None  # wrong H/W


def test_pack_batch_async(tmp_path):
    n, t_max, h, w, s_max = 3, 4, 16, 16, 32000
    frame_paths, wav_paths = [], []
    rng = np.random.RandomState(1)
    truth_frames = []
    for i in range(n):
        fr = rng.randint(0, 256, (i + 1, h, w, 3), np.uint8)
        truth_frames.append(fr)
        fp = tmp_path / f"f{i}.npy"
        np.save(fp, fr)
        frame_paths.append(str(fp))
        sig = 0.3 * np.sin(np.linspace(0, 50, 16000 * (i + 1)))
        wp = tmp_path / f"a{i}.wav"
        wavio.write_wav(wp, sig.astype(np.float32), 16000)
        wav_paths.append(str(wp))

    frames = np.zeros((n, t_max, h, w, 3), np.uint8)
    audio = np.zeros((n, s_max), np.int16)
    frames_len = np.zeros((n,), np.int32)
    audio_len = np.zeros((n,), np.int32)
    handle = native.pack_batch_async(frame_paths, wav_paths, frames, audio,
                                     frames_len, audio_len, n_threads=2)
    assert handle is not None
    assert handle.wait() == 0
    for i in range(n):
        assert frames_len[i] == i + 1
        np.testing.assert_array_equal(frames[i, :i + 1], truth_frames[i])
        assert abs(audio_len[i] - min(16000 * (i + 1), s_max)) <= 2


def test_pack_reports_errors(tmp_path):
    frames = np.zeros((1, 2, 8, 8, 3), np.uint8)
    audio = np.zeros((1, 1000), np.int16)
    fl = np.zeros((1,), np.int32)
    al = np.zeros((1,), np.int32)
    handle = native.pack_batch_async([str(tmp_path / "missing.npy")],
                                     [str(tmp_path / "missing.wav")],
                                     frames, audio, fl, al)
    assert handle is not None
    assert handle.wait() == 2  # both modalities failed


def test_truncated_npy_rejected(tmp_path):
    """A .npy whose payload is shorter than its shape implies must be
    rejected, not overread (the header's shape is untrusted input)."""
    arr = np.arange(5 * 8 * 8 * 3, dtype=np.uint8).reshape(5, 8, 8, 3)
    p = tmp_path / "f.npy"
    np.save(p, arr)
    blob = p.read_bytes()
    p.write_bytes(blob[: len(blob) // 2])  # cut the payload mid-frame
    assert native.load_frames(str(p), 5, 8, 8) is None

    frames = np.zeros((1, 5, 8, 8, 3), np.uint8)
    audio = np.zeros((1, 100), np.int16)
    fl = np.zeros((1,), np.int32)
    al = np.zeros((1,), np.int32)
    handle = native.pack_batch_async([str(p)], [None], frames, audio, fl, al)
    assert handle is not None
    assert handle.wait() == 1
    assert fl[0] == 0
    assert not frames.any()


def test_garbage_npy_version_rejected(tmp_path):
    p = tmp_path / "bad.npy"
    p.write_bytes(b"\x93NUMPY\x07\x00\xff\xff")  # bogus version, 10 bytes
    assert native.load_frames(str(p), 2, 8, 8) is None
