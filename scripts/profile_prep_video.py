"""Host-prep leg profile for the joint mp4->questions path (round-3 VERDICT
missing #2 / next-round #2): break QGPipeline._prep_video into its stages —
demux open / seek / video decode / swscale (from mmqg_decode_frames_idx2's
nanosecond leg counters), audio decode+resample, context normalisation, and
request packing — at both the DENSE bench shape (90 s x 8 spans of 8 s) and
the CORPUS shape (sparse spans in a long video), with the decoder-level
frame-skip lever A/B'd.

Pure host work: runs on the CPU backend (no TPU programs), minutes not tens
of minutes. Results land in PERF.md "Host-prep leg profile".

Usage: python scripts/profile_prep_video.py
"""

from __future__ import annotations

import math
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from mmqg_tpu.data import native, saliency  # noqa: E402
from mmqg_tpu.data.text_prep import preprocess_text  # noqa: E402


def sample_indices(info, spans_s):
    """The ~1 fps sampling grid _native_salient_frames asks the decoder for
    (saliency.py:69-95, minus the slack-widening — close enough to profile)."""
    fps = info["fps"]
    step = math.ceil(fps)
    wanted = set()
    for a, b in spans_s:
        f = max(0, math.floor(a * fps / step)) * step
        while f * 1000.0 / fps <= b * 1000:
            wanted.add(f)
            f += step
    return sorted(wanted)


def profile_shape(name, seconds, spans_s, reps=3):
    tmp = Path(tempfile.mkdtemp(prefix="prep_profile_"))
    v = tmp / "v.mp4"
    assert native.write_test_av_mp4(v, seconds=seconds, freq=220, width=320,
                                    height=240, fps=24)
    info = native.video_info(v)
    wanted = sample_indices(info, spans_s)
    spans_ms = [(int(a * 1000), int(b * 1000)) for a, b in spans_s]

    rows = []
    for skip in (False, True):
        best = None
        for _ in range(reps):
            legs = {}
            t0 = time.perf_counter()
            out = native.decode_frames(v, wanted, 112, skip=skip, legs=legs)
            wall = time.perf_counter() - t0
            if best is None or wall < best[0]:
                best = (wall, legs, out)
        wall, legs, out = best
        rows.append((skip, wall, legs, int(out[1].sum())))

    # full saliency selection wrapper (adds candidate arithmetic + python)
    t0 = time.perf_counter()
    frames = saliency.extract_salient_frames_for_video(v, spans_ms,
                                                       (112, 112))
    t_saliency = time.perf_counter() - t0

    # audio: per-span seek decode at the model rate — the pre-round-4
    # _span_audio path (one demux open PER SPAN), kept as the A side
    t_audio = None
    for _ in range(reps):
        t0 = time.perf_counter()
        audio = [native.decode_audio(v, 16000, start=a, end=b)
                 for a, b in spans_s]
        t_audio = min(t_audio or 1e9, time.perf_counter() - t0)

    # audio lever (round 4): ONE demux open serves every span
    # (native.decode_audio_spans — what _span_audio now uses); bytes must
    # match the per-span path exactly
    t_audio_b = None
    for _ in range(reps):
        t0 = time.perf_counter()
        audio_b = native.decode_audio_spans(v, 16000, spans_s)
        t_audio_b = min(t_audio_b or 1e9, time.perf_counter() - t0)
    if audio_b is None:
        # stale build without the batched symbol: profile the per-span
        # path alone instead of crashing the whole profiler (ADVICE r4)
        print("  (decode_audio_spans unavailable — stale native build; "
              "batched-audio leg skipped)")
        t_audio_b = float("nan")
    else:
        assert all(np.array_equal(x, y) for x, y in zip(audio_b, audio))

    t0 = time.perf_counter()
    ctx = [preprocess_text("what is the process of the system")
           for _ in spans_s]
    t_ctx = time.perf_counter() - t0

    # pack: the host batch assembly generate_async pays (flagship dims)
    from bench_joint_video import build_pipeline
    global _PIPE
    if "_PIPE" not in globals():
        _PIPE = build_pipeline()
    t0 = time.perf_counter()
    _PIPE._pack(ctx, frames, audio)
    t_pack = time.perf_counter() - t0

    span_total = sum(b - a for a, b in spans_s)
    print(f"\n== {name}: {seconds:.0f}s video, {len(spans_s)} spans "
          f"({span_total:.0f}s span seconds, "
          f"{100 * span_total / seconds:.0f}% of the file), "
          f"{len(wanted)} sampled frames ==")
    for skip, wall, legs, found in rows:
        print(f"  frames decode skip={int(skip)}: {1000 * wall:7.1f} ms  "
              f"(open {1000 * legs['open_s']:.1f}, "
              f"seek {1000 * legs['seek_s']:.1f}, "
              f"decode {1000 * legs['decode_s']:.1f}, "
              f"sws {1000 * legs['sws_s']:.1f})  found {found}")
    print(f"  saliency wrapper total:   {1000 * t_saliency:7.1f} ms")
    print(f"  audio per-span opens:     {1000 * t_audio:7.1f} ms")
    print(f"  audio one-open batched:   {1000 * t_audio_b:7.1f} ms "
          f"({t_audio / t_audio_b:.2f}x)")
    print(f"  context normalise:        {1000 * t_ctx:7.1f} ms")
    print(f"  pack (flagship dims):     {1000 * t_pack:7.1f} ms")
    total = t_saliency + t_audio_b + t_ctx + t_pack
    print(f"  TOTAL _prep_video-equiv:  {1000 * total:7.1f} ms "
          f"({seconds / total:.0f}x realtime)")
    return total


def main():
    dense_spans = []
    gap = (90 - 8 * 8.0) / 9
    t = gap
    for _ in range(8):
        dense_spans.append((t, t + 8.0))
        t += 8.0 + gap
    profile_shape("DENSE (bench fixture)", 90.0, dense_spans)
    profile_shape("CORPUS-ish sparse", 300.0, [(42.0, 50.0), (200.0, 219.0)])
    profile_shape("LONG sparse (p90 video)", 600.0, [(123.0, 131.0)])


if __name__ == "__main__":
    main()
