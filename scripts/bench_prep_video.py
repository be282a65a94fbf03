"""Prep-path throughput: videos/sec for salient-frame extraction.

Measures mmqg_tpu.data.saliency.extract_salient_frames_for_video (one decode
per video, grab/retrieve — only ~1 fps sampled frames are materialised)
against two reference-style baselines on the same synthetic video:

  * read-all: one pass with cap.read() on every frame (our round-1 code);
  * reference: a FULL decode pass PER QUESTION with cap.read()
    (reference dataset/get_salient_frames.py:26-43 is called per question).

Synthetic video: 120 s @ 24 fps, 640x360 (lecture-ish), 4 question spans.

Usage: python scripts/bench_prep_video.py [seconds] [fps]
"""

import math
import sys
import time
from pathlib import Path

sys.path.insert(0, ".")

import cv2
import numpy as np

from mmqg_tpu.data import saliency


def write_video(path, seconds, fps, size=(640, 360)):
    vw = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), fps, size)
    assert vw.isOpened()
    rng = np.random.RandomState(0)
    base = rng.randint(0, 255, (size[1], size[0], 3), np.uint8)
    for i in range(seconds * fps):
        # cheap deterministic motion so frames aren't trivially compressible
        frame = np.roll(base, i * 7, axis=1)
        vw.write(frame)
    vw.release()


def read_all_extract(video_file, spans_ms, frame_dim):
    """Round-1 implementation: cap.read() every frame, resize salient ones."""
    cap = cv2.VideoCapture(str(video_file))
    frame_rate = math.ceil(cap.get(cv2.CAP_PROP_FPS))
    per_span = [[] for _ in spans_ms]
    while True:
        frame_id = cap.get(cv2.CAP_PROP_POS_FRAMES)
        frame_time = cap.get(cv2.CAP_PROP_POS_MSEC)
        ok, image = cap.read()
        if not ok:
            break
        if frame_id % frame_rate != 0:
            continue
        resized = None
        for i, (s, e) in enumerate(spans_ms):
            if s <= frame_time <= e:
                if resized is None:
                    resized = cv2.resize(image, frame_dim,
                                         interpolation=cv2.INTER_AREA)
                per_span[i].append(resized)
    cap.release()
    return per_span


def main():
    seconds = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    fps = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    video = Path("/tmp/bench_prep.mp4")
    print(f"synthesizing {seconds}s @ {fps}fps 640x360 ...")
    write_video(video, seconds, fps)
    mb = video.stat().st_size / 1e6
    if "--sparse" in sys.argv:
        # the real corpus' span distribution (labelled_questions.json):
        # median 8 s — most of a lecture is NOT inside any span, which is
        # where the native seek-decode path wins
        spans_ms = [(10_000, 18_000), (40_000, 48_000),
                    (70_000, 78_000), (100_000, 108_000)]
    else:
        spans_ms = [(5_000, 25_000), (30_000, 50_000),
                    (60_000, 80_000), (90_000, 110_000)]
    dim = (112, 112)

    def cv2_grab_retrieve():
        # force the linear cv2 path (the round-2 pre-native implementation)
        orig = saliency._native_salient_frames
        saliency._native_salient_frames = lambda *a: None
        try:
            return saliency.extract_salient_frames_for_video(
                video, spans_ms, dim)
        finally:
            saliency._native_salient_frames = orig

    from mmqg_tpu.data import native
    variants = []
    if native.media_available():
        variants.append(("native_seek(ours)", lambda: saliency.
                         extract_salient_frames_for_video(video, spans_ms,
                                                          dim)))
    variants += [
        ("grab_retrieve(cv2)", cv2_grab_retrieve),
        ("read_all(round1)", lambda: read_all_extract(video, spans_ms, dim)),
        ("per_question(ref)", lambda: [read_all_extract(video, [s], dim)[0]
                                       for s in spans_ms]),
    ]
    results = {}
    for name, fn in variants:
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        n_frames = sum(len(f) for f in out)
        results[name] = dt
        print(f"{name:22s} {dt:7.2f}s  {seconds / dt:6.2f} video-s/s "
              f"{1 / dt:7.3f} videos/s  ({n_frames} salient frames, {mb:.1f} MB)")

    ours = results.get("native_seek(ours)", results["grab_retrieve(cv2)"])
    ref = results["per_question(ref)"]
    print(f"speedup vs reference per-question decode: {ref / ours:.1f}x "
          f"(vs round-1 read-all: {results['read_all(round1)'] / ours:.1f}x, "
          f"vs cv2 grab_retrieve: {results['grab_retrieve(cv2)'] / ours:.1f}x)")


if __name__ == "__main__":
    main()
