"""Native in-process media decode (native/mmqg_media.cpp via system libav*):
the binary-free replacement for the reference's ffmpeg-subprocess contract
(reference dataset/get_audio.py:6-13, get_salient_audioclips.py:6-17).

Fixtures are SELF-GENERATED: the library also encodes test mp4s (AAC tone,
optional MPEG-4 video), so the mp4 demux path is exercised against real
streams without shipping binaries or requiring the ffmpeg CLI. Skipped
entirely when the media lib can't build (no libav dev packages)."""

from pathlib import Path

import numpy as np
import pytest

from mmqg_tpu.data import native
from mmqg_tpu.data import wav as wavio

pytestmark = pytest.mark.skipif(not native.media_available(),
                                reason="native media lib unavailable")


def _dominant_hz(x: np.ndarray, rate: int) -> float:
    x = np.asarray(x, np.float32)
    return float(np.fft.rfftfreq(len(x), 1.0 / rate)[
        np.argmax(np.abs(np.fft.rfft(x)))])


@pytest.fixture(scope="module")
def sine_wav(tmp_path_factory):
    """1.5 s of 300 Hz at 22050 Hz — wav goes through the same libavformat
    demux as mp4, validating resample + span logic with exact input."""
    path = tmp_path_factory.mktemp("media") / "sine.wav"
    t = np.arange(int(22050 * 1.5)) / 22050.0
    # write_wav takes float [-1, 1]; 0.366 ~ 12000/32768 peak
    wavio.write_wav(path, np.sin(2 * np.pi * 300 * t) * 0.366, 22050)
    return path


def test_decode_wav_resampled_mono(sine_wav):
    pcm = native.decode_audio(sine_wav, 16000)
    assert pcm is not None and pcm.dtype == np.int16 and pcm.ndim == 1
    assert abs(len(pcm) - 1.5 * 16000) <= 64  # resampler delay only
    assert abs(_dominant_hz(pcm, 16000) - 300) < 2
    rms = np.sqrt(np.mean(pcm.astype(np.float32) ** 2))
    assert 7000 < rms < 10000  # sine rms = amp/sqrt(2) ~ 8485


def test_decode_wav_stereo_upmix(sine_wav):
    pcm = native.decode_audio(sine_wav, 44100, channels=2)
    assert pcm is not None and pcm.shape[1] == 2
    np.testing.assert_array_equal(pcm[:, 0], pcm[:, 1])  # mono upmix
    assert abs(len(pcm) - 1.5 * 44100) <= 128


def test_decode_span_is_sample_accurate(tmp_path):
    """First second silence, second second tone: a [1.0, 1.5) span decode
    must return exactly the tone part."""
    rate = 16000
    sig = np.zeros(2 * rate, np.float32)
    t = np.arange(rate) / rate
    sig[rate:] = np.sin(2 * np.pi * 200 * t) * 0.31
    path = tmp_path / "half.wav"
    wavio.write_wav(path, sig, rate)

    span = native.decode_audio(path, rate, start=1.0, end=1.5)
    assert span is not None
    assert abs(len(span) - rate // 2) <= 16
    assert np.sqrt(np.mean(span.astype(np.float32) ** 2)) > 5000  # tone, not silence
    head = native.decode_audio(path, rate, start=0.0, end=0.5)
    assert np.abs(head).max() == 0  # silence, not tone


def test_decode_audio_spans_bit_identical_wav(sine_wav):
    """One-open multi-span decode == per-span fresh-open decode, byte for
    byte: the reuse path must be a pure cost optimisation (each span
    seeks+flushes — native decode_audio_span fresh=false)."""
    if not hasattr(native.get_media_lib(), "mmqg_decode_audio_spans"):
        pytest.skip("stale media build without span entry point")
    spans = [(0.0, 0.5), (1.0, 1.4), (0.3, 0.9),  # incl. start=0, backwards
             (1.2, None)]                          # and to-EOF
    batched = native.decode_audio_spans(sine_wav, 16000, spans)
    assert batched is not None and len(batched) == len(spans)
    for (a, b), got in zip(spans, batched):
        ref = native.decode_audio(sine_wav, 16000, start=a, end=b)
        np.testing.assert_array_equal(got, ref)


def test_decode_audio_spans_bit_identical_mp4(tmp_path):
    """Same contract through a real AAC stream (priming/seek semantics are
    codec-dependent; the mp4 path is what serving uses)."""
    if not hasattr(native.get_media_lib(), "mmqg_decode_audio_spans"):
        pytest.skip("stale media build without span entry point")
    path = tmp_path / "tone.mp4"
    if not native.write_test_tone_mp4(path, seconds=3.0, freq=440):
        pytest.skip("AAC encoder not built into system libavcodec")
    spans = [(0.5, 1.5), (2.0, 2.75), (0.0, 0.25), (1.0, 1.8)]
    batched = native.decode_audio_spans(path, 16000, spans, channels=2)
    assert batched is not None
    for (a, b), got in zip(spans, batched):
        ref = native.decode_audio(path, 16000, start=a, end=b, channels=2)
        np.testing.assert_array_equal(got, ref)


def test_decode_audio_spans_edge_cases(tmp_path, sine_wav):
    if not hasattr(native.get_media_lib(), "mmqg_decode_audio_spans"):
        pytest.skip("stale media build without span entry point")
    assert native.decode_audio_spans(sine_wav, 16000, []) == []
    assert native.decode_audio_spans(tmp_path / "nope.mp4", 16000,
                                     [(0.0, 1.0)]) is None
    cv2 = pytest.importorskip("cv2")
    silent = tmp_path / "silent.mp4"
    vw = cv2.VideoWriter(str(silent), cv2.VideoWriter_fourcc(*"mp4v"), 10,
                         (32, 32))
    for _ in range(10):
        vw.write(np.zeros((32, 32, 3), np.uint8))
    vw.release()
    with pytest.raises(ValueError, match="no audio stream"):
        native.decode_audio_spans(silent, 16000, [(0.0, 0.5)])


def test_media_duration(sine_wav):
    d = native.media_duration(sine_wav)
    assert d is not None and abs(d - 1.5) < 0.05


def test_mp4_tone_roundtrip(tmp_path):
    path = tmp_path / "tone.mp4"
    if not native.write_test_tone_mp4(path, seconds=2.0, freq=440):
        pytest.skip("AAC encoder not built into system libavcodec")
    d = native.media_duration(path)
    assert d is not None and abs(d - 2.0) < 0.1
    pcm = native.decode_audio(path, 16000)
    assert pcm is not None
    # AAC priming/padding adds a codec-delay tail; bound it
    assert abs(len(pcm) - 2 * 16000) < 1600
    assert abs(_dominant_hz(pcm, 16000) - 440) < 2


def test_no_audio_stream_raises(tmp_path):
    cv2 = pytest.importorskip("cv2")
    path = tmp_path / "silent.mp4"
    vw = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 10,
                         (32, 32))
    for _ in range(10):
        vw.write(np.zeros((32, 32, 3), np.uint8))
    vw.release()
    with pytest.raises(ValueError, match="no audio stream"):
        native.decode_audio(path, 16000)


def test_missing_file_returns_none(tmp_path):
    assert native.decode_audio(tmp_path / "nope.mp4", 16000,
                               max_seconds=1.0) is None
    assert native.media_duration(tmp_path / "nope.mp4") is None


def test_extract_audio_uses_native_decoder(tmp_path, monkeypatch):
    """saliency.extract_audio (reference get_audio.py contract: 44.1 kHz
    stereo wav under audio_path) must work with NO ffmpeg binary when the
    native decoder is present."""
    import shutil as _shutil

    from mmqg_tpu.data import saliency

    video_dir = tmp_path / "vids"
    video_dir.mkdir()
    if not native.write_test_tone_mp4(video_dir / "v1.mp4", seconds=1.0,
                                      freq=330):
        pytest.skip("AAC encoder not built into system libavcodec")

    class Cfg:
        video_path = video_dir
        audio_path = tmp_path / "audio"

    monkeypatch.setattr(_shutil, "which", lambda *_: None)  # hide any ffmpeg
    out = saliency.extract_audio(Cfg, "v1")
    samples, rate = wavio.read_wav(out)  # float32 [-1, 1]
    assert rate == 44100 and samples.shape[1] == 2
    assert abs(len(samples) - 44100) < 4500  # 1 s +- codec delay
    assert abs(_dominant_hz(samples[:, 0], 44100) - 330) < 3
    rms = np.sqrt(np.mean(samples[:, 0] ** 2))
    assert 0.2 < rms < 0.5  # 0.5-amplitude tone ~ 0.35 rms, not clipped


def test_prep_pipeline_extracts_audio_natively(tiny_config, tmp_path,
                                               monkeypatch):
    """run_prep_pipeline's audio stage (reference README order: audio before
    clips) must demux the question video's mp4 in-process — wav artifact,
    salient clip, and frames all materialise from ONE A/V mp4 with no
    ffmpeg binary."""
    import json
    import shutil as _shutil

    pytest.importorskip("cv2")
    from mmqg_tpu.data.saliency import run_prep_pipeline

    config = tiny_config.replace(
        dataset_path=tmp_path / "dataset", data_path=tmp_path / "data")
    config.ensure_dirs()
    for d in (config.video_path, config.subs_path):
        Path(d).mkdir(parents=True, exist_ok=True)
    if not native.write_test_av_mp4(Path(config.video_path) / "vid7.mp4",
                                    seconds=5.0, freq=440, fps=10):
        pytest.skip("AAC/MPEG-4 encoders not built into system libavcodec")
    (Path(config.subs_path) / "vid7.srt").write_text(
        "1\n00:00:00,000 --> 00:00:05,000\nthe process of the system\n\n")
    with open(config.questions_file, "w") as f:
        json.dump([{"video_id": "vid7", "question": "what is it",
                    "answer_start": "0:01", "answer_end": "0:03",
                    "option_1": "the process", "question_id": 0}], f)

    monkeypatch.setattr(_shutil, "which", lambda *_: None)  # no ffmpeg
    stats = run_prep_pipeline(config)
    assert stats["audio"] == 1 and stats["clips"] == 1 and stats["frames"] == 1
    samples, rate = wavio.read_wav(Path(config.audio_path) / "vid7.wav")
    assert rate == 44100 and abs(_dominant_hz(samples[:, 0], rate) - 440) < 3
    clip, crate = wavio.read_wav(
        Path(config.salient_audio_path) / "v_vid7_q_0_.wav")
    assert abs(len(clip) / crate - 2.0) < 0.1  # the 0:01-0:03 span
    frames = np.load(Path(config.salient_frames_path) / "v_vid7_q_0_.npy")
    assert frames.ndim == 4 and frames.shape[0] >= 1


def test_decode_frames_by_index(tmp_path):
    """Index-addressed frame decode: exact frame selection (brightness ramp
    identifies frames), order-independence, EOF reported missing, pts grid."""
    path = tmp_path / "av.mp4"
    if not native.write_test_av_mp4(path, seconds=12.0, freq=440, fps=10):
        pytest.skip("AAC/MPEG-4 encoders not built into system libavcodec")
    frames, found, pts, tick = native.decode_frames(path, [0, 10, 50, 110, 500], 32)
    assert found.tolist() == [True, True, True, True, False]
    assert frames.shape == (5, 32, 32, 3) and frames.dtype == np.uint8
    np.testing.assert_allclose(pts[:4], [0.0, 1.0, 5.0, 11.0], atol=1e-6)
    assert abs(tick - 0.1) < 1e-6
    # fixture frame i has Y=(i*3)%255; mp4 YUV is limited-range, so BGR ≈
    # clip((Y-16)*255/219) — check the ramp identifies the right frames
    for fi, fr in zip([0, 10, 50, 110], frames):
        expect = np.clip(((fi * 3) % 255 - 16) * 255.0 / 219.0, 0, 255)
        assert abs(float(fr.mean()) - expect) < 10, (fi, fr.mean(), expect)
    # any input order, same frames
    f2, fd2, p2, _ = native.decode_frames(path, [50, 0], 32)
    assert fd2.all() and np.array_equal(f2[0], frames[2]) and p2[0] == 5.0
    # past EOF slot stays zeros
    assert frames[4].max() == 0


def test_native_salient_frames_match_cv2(tmp_path):
    """The seek-decode fast path must select the SAME frame set as the cv2
    linear path (including cv2's one-frame POS_MSEC lag — the reference's
    frame_time semantics, get_salient_frames.py:27) with near-identical
    pixels (SWS_AREA accurate-rounding vs INTER_AREA)."""
    cv2 = pytest.importorskip("cv2")
    import mmqg_tpu.data.saliency as S

    v = tmp_path / "c.mp4"
    vw = cv2.VideoWriter(str(v), cv2.VideoWriter_fourcc(*"mp4v"), 24,
                         (160, 120))
    rng = np.random.RandomState(0)
    base = rng.randint(0, 255, (120, 160, 3), np.uint8)
    for i in range(24 * 30):
        vw.write(np.roll(base, i * 7, axis=1))
    vw.release()

    spans = [(0, 2000), (1500, 3500), (10000, 10500), (25000, 29900),
             (29000, 45000)]
    nat = S._native_salient_frames(v, spans, (32, 32))
    assert nat is not None
    # force the cv2 path for the reference result
    orig = S._native_salient_frames
    S._native_salient_frames = lambda *a: None
    try:
        ref = S.extract_salient_frames_for_video(v, spans, (32, 32))
    finally:
        S._native_salient_frames = orig
    for a, b in zip(nat, ref):
        assert a.shape == b.shape  # identical frame SELECTION
        if len(a):
            d = np.abs(a.astype(int) - b.astype(int))
            assert d.mean() < 3 and d.max() <= 16  # resize/CSC rounding only


def test_native_salient_frames_property_random_spans(tmp_path):
    """Property check over random fps/duration/span patterns: the native
    seek path must select exactly the same frame COUNT per span as the cv2
    linear path (selection parity), including overlapping, boundary-touching,
    empty, and past-EOF spans."""
    cv2 = pytest.importorskip("cv2")
    import mmqg_tpu.data.saliency as S

    rng = np.random.RandomState(42)
    for case, (fps, seconds) in enumerate([(7, 19), (24, 11), (13, 23)]):
        v = tmp_path / f"p{case}.mp4"
        vw = cv2.VideoWriter(str(v), cv2.VideoWriter_fourcc(*"mp4v"), fps,
                             (64, 48))
        for i in range(fps * seconds):
            vw.write(np.full((48, 64, 3), (i * 5) % 255, np.uint8))
        vw.release()

        spans = []
        for _ in range(6):
            a = int(rng.uniform(0, seconds * 1200))      # some past EOF
            b = a + int(rng.uniform(0, 6000))
            spans.append((a, b))
        nat = S._native_salient_frames(v, spans, (32, 32))
        assert nat is not None
        orig = S._native_salient_frames
        S._native_salient_frames = lambda *a: None
        try:
            ref = S.extract_salient_frames_for_video(v, spans, (32, 32))
        finally:
            S._native_salient_frames = orig
        assert len(nat) == len(ref) == len(spans)
        for i, (a, b) in enumerate(zip(nat, ref)):
            assert a.shape == b.shape, (
                f"case {case} fps={fps} span {i} {spans[i]}: "
                f"native {a.shape} != cv2 {b.shape}")


def test_vfr_stream_falls_back_to_cv2(tmp_path, monkeypatch):
    """A stream whose frames are off the CFR grid (decode_frames reports an
    in-bounds index missing) must NOT ship a silently-wrong frame set — the
    helper returns None and extract_salient_frames_for_video takes the exact
    linear cv2 path."""
    cv2 = pytest.importorskip("cv2")
    import mmqg_tpu.data.saliency as S

    v = tmp_path / "v.mp4"
    vw = cv2.VideoWriter(str(v), cv2.VideoWriter_fourcc(*"mp4v"), 10,
                         (32, 32))
    for i in range(40):
        vw.write(np.full((32, 32, 3), (i * 3) % 255, np.uint8))
    vw.release()

    real = native.decode_frames

    def fake_decode(path, indices, size, **kw):
        frames, found, pts, tick = real(path, indices, size, **kw)
        found = found.copy()
        found[0] = False  # simulate a CFR-grid miss on an in-bounds index
        return frames, found, pts, tick

    monkeypatch.setattr(native, "decode_frames", fake_decode)
    assert S._native_salient_frames(v, [(0, 3000)], (32, 32)) is None
    out = S.extract_salient_frames_for_video(v, [(0, 3000)], (32, 32))
    assert len(out) == 1 and out[0].shape[0] >= 2  # cv2 path still delivers


def test_native_frames_disable_env(tmp_path, monkeypatch):
    monkeypatch.setenv("MMQG_NATIVE_FRAMES", "0")
    from mmqg_tpu.data import saliency as S
    assert S._native_salient_frames(tmp_path / "x.mp4", [(0, 1000)],
                                    (32, 32)) is None


def test_av_fixture_has_both_streams(tmp_path):
    cv2 = pytest.importorskip("cv2")
    path = tmp_path / "av.mp4"
    if not native.write_test_av_mp4(path, seconds=3.0, freq=440, fps=10):
        pytest.skip("AAC/MPEG-4 encoders not built into system libavcodec")
    cap = cv2.VideoCapture(str(path))
    assert cap.isOpened()
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    cap.release()
    assert abs(n - 30) <= 2
    pcm = native.decode_audio(path, 16000)
    assert pcm is not None and abs(_dominant_hz(pcm, 16000) - 440) < 2


def test_decode_frames_skip_modes_bit_identical(tmp_path):
    """Adaptive decoder-level frame skipping (mmqg_media.cpp
    mmqg_decode_frames_idx2, skip_mode=1) must return BYTES IDENTICAL to the
    skip-free decode for both keyframe-aligned targets (the NONKEY fast
    path: gop == fps and ~1 fps sampling) and misaligned targets (the sticky
    NONKEY->NONREF->none downgrade retry) — skipping only elides frames that
    are never emitted and never referenced by emitted ones."""
    cv2 = pytest.importorskip("cv2")
    v = tmp_path / "m.mp4"
    vw = cv2.VideoWriter(str(v), cv2.VideoWriter_fourcc(*"mp4v"), 24,
                         (160, 120))
    rng = np.random.RandomState(1)
    base = rng.randint(0, 255, (120, 160, 3), np.uint8)
    for i in range(24 * 20):
        vw.write(np.roll(base, i * 5, axis=1))
    vw.release()

    for targets in ([0, 24, 48, 240, 456],      # the ~1 fps sampling grid
                    [5, 100, 250, 377],         # off-grid: forces downgrade
                    [0, 7, 24, 100, 101, 456]):  # mixed
        legs = {}
        a = native.decode_frames(v, targets, 32, skip=True, legs=legs)
        b = native.decode_frames(v, targets, 32, skip=False)
        assert a is not None and b is not None
        fa, fnda, ptsa, ticka = a
        fb, fndb, ptsb, tickb = b
        assert fnda.tolist() == fndb.tolist() and fnda.all()
        assert np.array_equal(fa, fb), f"skip changed bytes for {targets}"
        np.testing.assert_allclose(ptsa, ptsb, atol=1e-9)
        assert ticka == tickb
        assert set(legs) == {"open_s", "seek_s", "decode_s", "sws_s"}
        assert legs["decode_s"] > 0


def test_decode_frames_skip_env_disable(tmp_path, monkeypatch):
    """MMQG_FRAME_SKIP=0 pins the skip-free decode path globally."""
    monkeypatch.setenv("MMQG_FRAME_SKIP", "0")
    path = tmp_path / "av.mp4"
    if not native.write_test_av_mp4(path, seconds=4.0, freq=330, fps=10):
        pytest.skip("AAC/MPEG-4 encoders not built into system libavcodec")
    frames, found, _, _ = native.decode_frames(path, [0, 15], 32)
    assert found.all() and frames.shape == (2, 32, 32, 3)
