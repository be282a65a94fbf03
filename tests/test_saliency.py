"""Offline saliency extraction over a synthetic mp4 (cv2 round trip)."""

import json

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from mmqg_tpu.data import saliency, wav as wavio
from mmqg_tpu.data.subtitles import assign_question_ids


def _write_video(path, n_seconds=6, fps=10, size=(64, 48)):
    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    vw = cv2.VideoWriter(str(path), fourcc, fps, size)
    assert vw.isOpened(), "cv2 VideoWriter failed to open"
    for i in range(n_seconds * fps):
        frame = np.full((size[1], size[0], 3), (i * 3) % 255, np.uint8)
        vw.write(frame)
    vw.release()


def test_extract_salient_frames_single_decode(tmp_path):
    video = tmp_path / "v.mp4"
    _write_video(video)
    spans = [(1000, 3000), (4000, 5000)]  # ms
    per_span = saliency.extract_salient_frames_for_video(video, spans, (32, 32))
    # ~1 fps inside each span
    assert 1 <= per_span[0].shape[0] <= 4
    assert 1 <= per_span[1].shape[0] <= 3
    assert per_span[0].shape[1:] == (32, 32, 3)


def test_save_salient_frames_and_clips(tmp_path, tiny_config):
    config = tiny_config.replace(dataset_path=tmp_path / "ds",
                                 frame_size=32)
    (config.video_path).mkdir(parents=True)
    (config.audio_path).mkdir(parents=True)
    _write_video(config.video_path / "vidA.mp4")
    # wav for the same video
    rate = 8000
    sig = 0.1 * np.sin(np.linspace(0, 100, rate * 6)).astype(np.float32)
    wavio.write_wav(config.audio_path / "vidA.wav", sig, rate)

    questions = assign_question_ids(0, [
        {"video_id": "vidA", "question": "what ?", "answer_start": "0:01",
         "answer_end": "0:03"},
        {"video_id": "vidA", "question": "why ?", "answer_start": "0:04",
         "answer_end": "0:05"},
    ])
    n = saliency.save_salient_frames(config, questions)
    assert n == 2
    fr = np.load(config.salient_frames_path / "v_vidA_q_0_.npy")
    assert fr.dtype == np.uint8 and fr.shape[1:] == (32, 32, 3)

    n2 = saliency.clip_salient_audio(config, questions)
    assert n2 == 2
    clip, r = wavio.read_wav(config.salient_audio_path / "v_vidA_q_0_.wav")
    assert r == rate
    assert abs(len(clip) - 2 * rate) < 10  # 0:01..0:03 span


def test_assign_question_ids():
    qs = [{"a": 1}, {"a": 2}]
    out = assign_question_ids(5, qs)
    assert [q["question_id"] for q in out] == [5, 6]


def test_extract_audio_fails_loudly_without_decoder(tiny_config, monkeypatch):
    """C3 (SURVEY.md §2): mp4 demux needs a host decoder. With the native
    libav decoder present, a bad FILE must raise a file-decode error; with
    neither decoder available, the error must name both options — never a
    silent skip."""
    import shutil as _shutil

    from mmqg_tpu.data import native, saliency

    monkeypatch.setattr(_shutil, "which", lambda name: None)
    if native.media_available():
        with pytest.raises(RuntimeError, match="cannot decode"):
            saliency.extract_audio(tiny_config, "vid001")  # missing mp4
    monkeypatch.setattr(native, "media_available", lambda: False)
    with pytest.raises(RuntimeError, match="ffmpeg"):
        saliency.extract_audio(tiny_config, "vid001")
