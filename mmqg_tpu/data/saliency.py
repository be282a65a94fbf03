"""Offline saliency extraction: frames, audio, clips (reference dataset/*.py).

Design changes vs the reference, driven by throughput (this stage dominated
reference prep cost — SURVEY.md §3.4):

* **one decode pass per video**, not per question: the reference re-decoded
  the full mp4 once for every question on that video
  (reference dataset/get_salient_frames.py:26-43 called per question);
  ``extract_salient_frames_for_video`` decodes once and serves all spans;
* frames are stored exactly as the reference stored them — uint8
  ``(T, 112, 112, 3)`` .npy at ~1 fps inside the answer span, INTER_AREA
  resize (reference get_salient_frames.py:28,39-41) — so artifacts
  interoperate;
* audio clipping slices wav arrays directly instead of spawning ffmpeg per
  question (reference get_salient_audioclips.py:13).
"""

from __future__ import annotations

import json
import math
import os
import shutil
import subprocess
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from mmqg_tpu.data import wav as wavio
from mmqg_tpu.data.subtitles import span_seconds


def parse_span_ms(answer_start: str, answer_end: str) -> Tuple[int, int]:
    """'M:SS' strings -> (start_ms, end_ms) (reference get_salient_frames.py:14-19)."""
    return span_seconds(answer_start) * 1000, span_seconds(answer_end) * 1000


def is_salient(frame_time: float, start_time: float, end_time: float) -> bool:
    """Reference dataset/get_salient_frames.py:8-11."""
    return start_time <= frame_time <= end_time


def _native_salient_frames(
    video_file: Path,
    spans_ms: Sequence[Tuple[int, int]],
    frame_dim: Tuple[int, int],
) -> Optional[List[np.ndarray]]:
    """Seek-decode ONLY the sampled frames via the native libav decoder
    (native/mmqg_media.cpp): each span costs one keyframe seek plus the
    decode of its own neighbourhood, instead of a linear decode of the whole
    file — the prep win for sparse spans in long videos. Same sampling rule
    and BGR uint8 artifact bytes as the cv2 path below (SWS_AREA ≈
    INTER_AREA up to rounding). Returns None when unavailable (caller falls
    back to cv2)."""
    from mmqg_tpu.data import native

    if os.environ.get("MMQG_NATIVE_FRAMES", "1") == "0":
        return None  # bit-exact cv2/INTER_AREA artifacts on demand
    if frame_dim[0] != frame_dim[1]:
        return None  # native resize path is square-only; cv2 covers the rest
    try:
        info = native.video_info(video_file)
    except ValueError:
        return None  # readable container, no video stream: let cv2 decide
    if not info or not info["fps"] or info["fps"] <= 0:
        return None
    fps = info["fps"]  # the container rate — the same value cv2 reports
    step = math.ceil(fps)  # sample every ceil(fps)-th frame ≈ 1 fps

    # CANDIDATE indices: multiples of `step` whose estimated time falls in a
    # span widened by 2 sample periods — the container's avg_frame_rate can
    # be skewed vs true pts (nb_frames/duration counts one interval less),
    # so estimates drift ~a frame per hundreds of frames. The exact in-span
    # test below uses each frame's TRUE pts, identical to the cv2 path's
    # CAP_PROP_POS_MSEC check.
    slack_ms = 2 * step * 1000.0 / fps
    n_frames = info["n_frames"] or 0
    # The recorded frame count is a hard bound; an ESTIMATED one (duration ×
    # fps, e.g. mkv/webm without nb_frames) can undercount by a frame or
    # two, so pad it — over-asking is safe (past-EOF indices just come back
    # missing), under-asking would silently drop tail frames the cv2 path
    # keeps.
    bound = n_frames if info.get("n_frames_exact") else (
        n_frames + 2 * step if n_frames else 0)
    wanted: set = set()
    for start_ms, end_ms in spans_ms:
        f = max(0, math.floor((start_ms - slack_ms) * fps / 1000.0
                              / step)) * step
        while f * 1000.0 / fps <= end_ms + slack_ms:
            if bound and f >= bound:
                break
            wanted.add(f)
            f += step
    order = sorted(wanted)
    if not order:
        return [np.zeros((0,) + frame_dim + (3,), np.uint8) for _ in spans_ms]

    res = native.decode_frames(video_file, order, frame_dim[0])
    if res is None:
        return None
    frames, found, pts_s, tick_s = res
    if not found.all():
        if info.get("n_frames_exact"):
            # indices inside the declared frame count failed to decode on
            # the CFR grid (VFR stream, drops): use the exact linear path
            return None
        # inexact bound: only a SUFFIX of misses (indices past the real
        # EOF) is expected; an interior miss means an off-grid stream
        miss = np.flatnonzero(~found)
        if found[miss[0]:].any():
            return None

    # cv2's CAP_PROP_POS_MSEC — the reference's frame_time (reference
    # get_salient_frames.py:27) — is read BEFORE grab() and therefore lags
    # one frame: frame k is tested against pts(k-1), and frame 0 against
    # 0.0. Reproduce that exactly so both paths (and the reference) select
    # identical frame sets.
    lag_ms = [(pts_s[i] - tick_s) * 1000.0 if order[i] > 0 else 0.0
              for i in range(len(order))]
    out = []
    for start_ms, end_ms in spans_ms:
        kept = [frames[i] for i in range(len(order))
                if found[i] and is_salient(lag_ms[i], start_ms, end_ms)]
        out.append(np.asarray(kept, np.uint8) if kept
                   else np.zeros((0,) + frame_dim + (3,), np.uint8))
    return out


def extract_salient_frames_for_video(
    video_file: Path,
    spans_ms: Sequence[Tuple[int, int]],
    frame_dim: Tuple[int, int] = (112, 112),
) -> List[np.ndarray]:
    """Decode ``video_file`` once; for each (start_ms, end_ms) span return the
    ~1 fps salient frames resized to ``frame_dim`` as uint8 (T, H, W, 3).

    Sampling rule matches reference get_salient_frames.py:28,38-41:
    keep frames with ``frame_id % ceil(fps) == 0`` whose timestamp lies in the
    span; resize with INTER_AREA (cv2 path) / SWS_AREA (native path).

    Decode order: (1) the native seek-decoder — touches only the spans'
    keyframe neighbourhoods; (2) cv2 linear decode with grab()+retrieve()
    materialising only the sampled frames.
    """
    if Path(video_file).exists():
        native_out = _native_salient_frames(video_file, spans_ms, frame_dim)
        if native_out is not None:
            return native_out

    import cv2  # local import: cv2 is only needed for offline prep

    cap = cv2.VideoCapture(str(video_file))
    if not cap.isOpened():
        raise FileNotFoundError(f"cannot open video: {video_file}")
    frame_rate = math.ceil(cap.get(cv2.CAP_PROP_FPS))
    per_span: List[List[np.ndarray]] = [[] for _ in spans_ms]
    while True:
        frame_id = cap.get(cv2.CAP_PROP_POS_FRAMES)
        frame_time = cap.get(cv2.CAP_PROP_POS_MSEC)
        # grab() advances the decoder without the BGR convert + frame copy
        # that read() pays; retrieve() materialises ONLY the ~1 fps samples
        # we keep (reference get_salient_frames.py:26-43 read() every frame).
        if not cap.grab():
            break
        if frame_id % frame_rate != 0:
            continue
        wanted = any(is_salient(frame_time, s, e) for s, e in spans_ms)
        if not wanted:
            continue
        ok, image = cap.retrieve()
        if not ok:
            break
        resized = cv2.resize(image, frame_dim, interpolation=cv2.INTER_AREA)
        for i, (start_ms, end_ms) in enumerate(spans_ms):
            if is_salient(frame_time, start_ms, end_ms):
                per_span[i].append(resized)
    cap.release()
    return [
        np.asarray(frames, dtype=np.uint8)
        if frames else np.zeros((0,) + frame_dim + (3,), np.uint8)
        for frames in per_span
    ]


def save_salient_frames(config, questions: List[Dict],
                        workers: Optional[int] = None) -> int:
    """Batch frame extraction for a labelled-questions corpus, grouped by
    video (single decode per video). Writes the reference's artifact layout:
    ``salient_frames/v_{video_id}_q_{question_id}_.npy``
    (reference get_salient_frames.py:47).

    ``workers``: videos decode concurrently on a thread pool (cv2's decoder
    releases the GIL); default = os.cpu_count(), capped by the video count.
    Decode is the prep bottleneck (SURVEY.md §3.4) and is per-video
    independent, so throughput scales ~linearly with host cores."""
    out_dir = Path(config.salient_frames_path)
    out_dir.mkdir(parents=True, exist_ok=True)
    by_video: Dict[str, List[Dict]] = {}
    for q in questions:
        if len(q.get("question", "")) == 0:
            break  # reference stops at first empty record (get_salient_frames.py:67-68)
        by_video.setdefault(str(q["video_id"]), []).append(q)

    size = (config.frame_size, config.frame_size)

    def one_video(item) -> int:
        video_id, qs = item
        video_file = Path(config.video_path) / f"{video_id}.mp4"
        spans = [parse_span_ms(q["answer_start"], q["answer_end"]) for q in qs]
        frames_per_q = extract_salient_frames_for_video(video_file, spans, size)
        for q, frames in zip(qs, frames_per_q):
            np.save(out_dir / f"v_{video_id}_q_{q['question_id']}_.npy", frames)
        return len(qs)

    items = list(by_video.items())
    n_workers = min(workers or os.cpu_count() or 1, max(len(items), 1))
    if n_workers <= 1:
        return sum(one_video(it) for it in items)
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(max_workers=n_workers) as pool:
        return sum(pool.map(one_video, items))


def extract_audio(config, video_id: str) -> Path:
    """mp4 -> 44.1 kHz stereo wav (reference dataset/get_audio.py:6-13).

    Demux order PER FILE: (1) the native in-process decoder
    (native/mmqg_media.cpp, system libav* — no subprocess per video),
    (2) the ffmpeg binary (the reference's exact contract) for files the
    native build cannot decode, (3) a loud error naming both. A file with
    no audio stream raises ValueError from either path (ffmpeg is not
    retried — it cannot invent a stream). Artifact layout and format
    (44.1 kHz stereo wav under audio_path) match the reference either
    way."""
    from mmqg_tpu.data import native

    out = Path(config.audio_path) / f"{video_id}.wav"
    out.parent.mkdir(parents=True, exist_ok=True)
    src = Path(config.video_path) / f"{video_id}.mp4"

    if native.media_available():
        pcm = native.decode_audio(src, 44100, channels=2)  # no-stream raises
        if pcm is not None:
            wavio.write_wav(out, pcm, 44100)  # int16 passthrough, bit-exact
            return out
        # fall through: missing/corrupt file OR a codec this libav build
        # lacks — the (typically more codec-complete) ffmpeg binary may
        # still decode it

    ffmpeg = shutil.which("ffmpeg")
    if ffmpeg is None:
        if native.media_available():
            raise RuntimeError(f"cannot decode audio from {src} "
                               f"(native libav decoder; no ffmpeg binary "
                               f"on PATH to fall back to)")
        raise RuntimeError(
            "no host audio decoder: the native libav decoder is unavailable "
            "(native/mmqg_media.cpp needs the libav* dev packages) and no "
            "ffmpeg binary is on PATH (reference get_audio.py used the "
            "binary). Frame/text/clip stages and training run without it."
        )
    cmd = [ffmpeg, "-hide_banner", "-loglevel", "panic", "-y",
           "-i", str(src),
           "-ab", "160k", "-ac", "2", "-ar", "44100", "-vn", str(out)]
    subprocess.run(cmd, check=True)
    return out


def extract_all_audio(config) -> int:
    """videos.json-driven audio extraction (reference dataset/get_audio.py
    main loop :15-38): mp4 -> wav for every listed video. Stops at the first
    empty-url record like the reference (:31-32). Uses the native libav
    decoder, falling back to the ffmpeg binary (see extract_audio)."""
    with open(config.videos_file) as f:
        videos = json.load(f)
    n = 0
    for video in videos:
        if len(video.get("video_url", "")) == 0:
            break
        extract_audio(config, str(video["id"]))
        n += 1
    return n


def clip_salient_audio(config, questions: List[Dict]) -> int:
    """Cut each question's answer span from its video's wav
    (reference dataset/get_salient_audioclips.py:6-17), as array slicing.
    Output layout: ``salient_audio_clip/v_{vid}_q_{qid}_.wav``."""
    out_dir = Path(config.salient_audio_path)
    out_dir.mkdir(parents=True, exist_ok=True)
    cache: Dict[str, Tuple[np.ndarray, int]] = {}
    n = 0
    for q in questions:
        if len(q.get("question", "")) == 0:
            break
        vid = str(q["video_id"])
        if vid not in cache:
            cache.clear()  # bound memory: one decoded wav at a time
            cache[vid] = wavio.read_wav(Path(config.audio_path) / f"{vid}.wav")
        samples, rate = cache[vid]
        start_s = span_seconds(q["answer_start"])
        end_s = span_seconds(q["answer_end"])
        clip = wavio.clip_span(samples, rate, start_s, end_s)
        wavio.write_wav(out_dir / f"v_{vid}_q_{q['question_id']}_.wav", clip, rate)
        n += 1
    return n


def run_prep_pipeline(config, workers: Optional[int] = None) -> Dict[str, int]:
    """End-to-end offline prep (reference dataset/README order:
    assign ids -> audio -> clips -> frames -> text). The audio stage runs
    for every question video whose wav is missing but whose mp4 exists
    (native libav decoder or ffmpeg binary, see extract_audio); with neither
    decoder available it is skipped — clips then only cover pre-extracted
    wavs, as before."""
    from mmqg_tpu.data.subtitles import assign_question_ids, build_salient_text_list

    with open(config.questions_file) as f:
        questions = json.load(f)
    if questions and "question_id" not in questions[0]:
        questions = assign_question_ids(0, questions)

    def _audio_one(vid: str) -> int:
        try:
            extract_audio(config, vid)
            return 1
        except (RuntimeError, ValueError, subprocess.CalledProcessError):
            # no host decoder, undecodable file (either decoder), or a
            # video-only mp4: the clip stage below still covers any
            # pre-staged wavs (the old behaviour when audio couldn't be
            # extracted)
            return 0

    pending = sorted(
        vid for vid in {str(q["video_id"]) for q in questions
                        if q.get("question")}
        if not (Path(config.audio_path) / f"{vid}.wav").exists()
        and (Path(config.video_path) / f"{vid}.mp4").exists())
    stats = {}
    if len(pending) > 1:
        # per-video independent; libav decode releases the GIL like cv2's.
        # Capped at 4 workers: unlike the frame stage (a few hundred small
        # frames live at once), each audio worker holds a full decoded
        # track in RAM (~1 GB per 90-minute lecture at 44.1 kHz stereo
        # int16), so cpu_count workers on a 100-core host would be a
        # multi-hundred-GB peak.
        from concurrent.futures import ThreadPoolExecutor
        n_workers = min(os.cpu_count() or 1, len(pending), 4)
        with ThreadPoolExecutor(max_workers=n_workers) as pool:
            stats["audio"] = sum(pool.map(_audio_one, pending))
    else:
        stats["audio"] = sum(_audio_one(v) for v in pending)
    stats["frames"] = save_salient_frames(config, questions, workers=workers)
    stats["clips"] = clip_salient_audio(config, questions)
    texts = build_salient_text_list(questions, config.subs_path)
    Path(config.salient_text_file).parent.mkdir(parents=True, exist_ok=True)
    with open(config.salient_text_file, "w") as f:
        json.dump(texts, f)
    stats["texts"] = len(texts)
    return stats
