"""JOINT mp4 -> questions benchmark with host/device overlap (round-2
VERDICT missing #1 / next-round #2).

The north-star metric (BASELINE.json) prices "preproc+decode" END TO END:
what the reference ran strictly in sequence — a full video decode PER
QUESTION (dataset/get_salient_frames.py:26-43), ffmpeg audio extraction
(get_audio.py:6-13), then evaluate.py:34-127 — this measures as ONE
overlapped pipeline: QGPipeline.generate_from_videos (thread-pool host
prep, completion-order async dispatch to the device).

Three timed runs over the same N synthetic lecture videos:
  host_only   — prep on the pool, nothing dispatched (the host ceiling)
  device_only — decode pre-prepped batches back-to-back (the device floor)
  joint       — generate_from_videos, the real path
and reports videos/s, questions/s, the device-idle fraction
(1 - device_only/joint) and the overlap efficiency
((host_only + device_only) / joint — 1.0 means zero overlap, values near
max(host,device)/joint mean the smaller half is fully hidden).

Model: flagship trimodal at reference dims (frame 112, context 283), random
params (throughput does not depend on weight values). Synthesis time is
excluded. Videos carry REAL AAC audio + MPEG-4 video streams written by
the native in-process muxer (no ffmpeg binary in this image).

Usage:
  python scripts/bench_joint_video.py [n_videos] [video_seconds] [spans_per_video]
  python bench.py --from-video          # same, one JSON line
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def build_pipeline(frame_size=112, n_vocab=2000):
    """Flagship trimodal QGPipeline at reference dims with random params —
    no checkpoint needed for throughput (same discipline as bench.py)."""
    import jax

    from mmqg_tpu.config import Config
    from mmqg_tpu.models import qg_model
    from mmqg_tpu.models.video_encoder import flatten_dim_for
    from mmqg_tpu.pipeline import QGPipeline

    config = Config(frame_size=frame_size,
                    flatten_dim=flatten_dim_for(frame_size))
    mc = qg_model.ModelConfig.from_config(config, n_vocab=n_vocab,
                                          mode="trimodal")
    rng = np.random.RandomState(0)
    emb = rng.randn(n_vocab, mc.word_emb_dim).astype(np.float32)
    params, state = qg_model.init(jax.random.PRNGKey(0), mc, emb)
    words = [f"w{i}" for i in range(n_vocab)]
    vocab = {w: i for i, w in enumerate(words)}
    index_to_word = {str(i): w for i, w in enumerate(words)}
    return QGPipeline(config, mc, params, state, vocab, index_to_word)


def synthesize_videos(out_dir: Path, n_videos: int, seconds: float,
                      spans_per_video: int):
    """Lecture-shaped fixtures: AAC tone + MPEG-4 motion video, one srt-less
    job per video with explicit contexts (context extraction is measured by
    the prep suite already; the joint bench prices decode/sample/slice)."""
    from mmqg_tpu.data import native

    if not native.media_available():
        raise SystemExit("native media lib unavailable (make -C native media)")
    jobs = []
    span_len = 8.0  # corpus median span (PERF.md prep benchmarks)
    gap = (seconds - spans_per_video * span_len) / (spans_per_video + 1)
    if gap < 0:
        raise SystemExit(f"{spans_per_video} spans of {span_len}s do not fit "
                         f"in {seconds}s")
    for v in range(n_videos):
        path = out_dir / f"lecture{v:02d}.mp4"
        if not native.write_test_av_mp4(path, seconds=seconds,
                                        freq=220 + 40 * v, width=320,
                                        height=240, fps=24):
            raise SystemExit("AAC/MPEG-4 encoders not in system libavcodec")
        spans, t = [], gap
        for _ in range(spans_per_video):
            spans.append((t, t + span_len))
            t += span_len + gap
        ctx = ["what is the process of the system"] * spans_per_video
        jobs.append({"video_path": path, "spans": spans, "contexts": ctx})
    return jobs


def reference_style_videos_per_s(job, pipe, seconds: float) -> float:
    """The reference's joint cost on ONE of this bench's videos, from its
    own measured pieces: a FULL linear decode PER QUESTION for frames
    (dataset/get_salient_frames.py:26-43 — timed here with the same cv2
    read_all loop scripts/bench_prep_video.py oracles), plus the measured
    batch-1 torch CPU serve rate (BASELINE_MEASURED.json, 0.296 q/s —
    scripts/measure_baseline.py). Audio extraction (one ffmpeg pass,
    get_audio.py) is omitted — charity to the baseline."""
    import json as _json

    from bench_prep_video import read_all_extract

    spans_ms = [(int(a * 1000), int(b * 1000)) for a, b in job["spans"]]
    fs = pipe.mc.frame_size
    t0 = time.perf_counter()
    for s in spans_ms:
        read_all_extract(job["video_path"], [s], (fs, fs))
    prep_s = time.perf_counter() - t0
    base = Path(__file__).resolve().parents[1] / "BASELINE_MEASURED.json"
    qps_cpu = 0.2956
    if base.exists():
        qps_cpu = float(_json.loads(base.read_text())
                        ["questions_per_sec_cpu_reference"])
    serve_s = len(spans_ms) / qps_cpu
    return 1.0 / (prep_s + serve_s)


def run(n_videos=8, seconds=90.0, spans_per_video=8, workers=4,
        out_json=False, with_reference=True):
    import tempfile

    pipe = build_pipeline()
    tmp = Path(tempfile.mkdtemp(prefix="joint_bench_"))
    t0 = time.perf_counter()
    jobs = synthesize_videos(tmp, n_videos, seconds, spans_per_video)
    synth_s = time.perf_counter() - t0
    n_questions = n_videos * spans_per_video

    # warmup: compile the decode programs + touch every host path once
    warm = [dict(jobs[0])]
    pipe.generate_from_videos(warm, workers=1)

    # --- host_only: prep on the pool, no dispatch
    from concurrent.futures import ThreadPoolExecutor
    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=workers) as ex:
        preps = list(ex.map(
            lambda j: pipe._prep_video(j["video_path"], j["spans"],
                                       contexts=j["contexts"]), jobs))
    host_s = time.perf_counter() - t0

    # --- device_only: decode the pre-prepped requests back-to-back
    # (dispatch all, then finalize — the FIFO device queue discipline)
    t0 = time.perf_counter()
    fins = [pipe.generate_async(c, f, a) for c, f, a in preps]
    outs_dev = [fin() for fin in fins]
    device_s = time.perf_counter() - t0

    # --- joint: the real overlapped path
    t0 = time.perf_counter()
    outs = pipe.generate_from_videos(jobs, workers=workers)
    joint_s = time.perf_counter() - t0
    assert [o for o in outs] == outs_dev, "joint != staged decode output"

    videos_per_s = n_videos / joint_s
    questions_per_s = n_questions / joint_s
    device_idle = max(0.0, 1.0 - device_s / joint_s)
    overlap_eff = (host_s + device_s) / joint_s
    result = {
        "metric": "videos/sec joint mp4->questions (host prep overlapped "
                  "with device decode)",
        "value": round(videos_per_s, 4),
        "unit": "videos/sec",
        "questions_per_s": round(questions_per_s, 2),
        "n_videos": n_videos,
        "video_seconds": seconds,
        "spans_per_video": spans_per_video,
        "workers": workers,
        "host_only_s": round(host_s, 2),
        "device_only_s": round(device_s, 2),
        "joint_s": round(joint_s, 2),
        "device_idle_frac": round(device_idle, 3),
        "overlap_efficiency": round(overlap_eff, 2),
        "synthesis_s_excluded": round(synth_s, 2),
    }
    if with_reference:
        ref_vps = reference_style_videos_per_s(jobs[0], pipe, seconds)
        result["reference_videos_per_s"] = round(ref_vps, 4)
        result["vs_baseline"] = round(videos_per_s / ref_vps, 1)
    if out_json:
        print(json.dumps(result))
    else:
        for k, v in result.items():
            print(f"{k:24s} {v}")
    return result


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    run(n_videos=int(args[0]) if len(args) > 0 else 8,
        seconds=float(args[1]) if len(args) > 1 else 90.0,
        spans_per_video=int(args[2]) if len(args) > 2 else 8,
        out_json="--json" in sys.argv)
