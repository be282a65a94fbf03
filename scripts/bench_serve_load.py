"""Serving daemon under load (round-3 VERDICT weak #2 / next-round #4):
drive mmqg_tpu.serve's loop with Poisson arrivals at several rates and
price the batching knobs — client-observed p50/p99 latency and achieved
questions/s as a function of linger_ms x max_batch.

In-process: the SAME serve() loop the daemon runs (reader thread, bounded
queue, linger batching, async dispatch with previous-batch flush), driven
through its inp/out seams — a generator that yields JSONL request lines on
a Poisson clock (recording each send time) and a writer that timestamps
each response line. Client latency = response written - request sent,
which includes queueing, linger, packing, device decode and host
materialisation.

Requests are the staged-media form (frames_npy + audio_wav at the corpus'
8 s median span) so every cell hits one AV bucket pair and the program
count stays bounded; batch buckets 1..max_batch are warmed before timing
(every distinct batch shape is its own XLA program on this backend).

Usage: python scripts/bench_serve_load.py          # full sweep (TPU)
       python scripts/bench_serve_load.py --quick  # one cell smoke (CPU ok)
"""

from __future__ import annotations

import json
import random
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

from bench_joint_video import build_pipeline


class PoissonSource:
    """Iterable of JSONL lines released on a Poisson arrival clock."""

    def __init__(self, lines, rate_per_s: float, send_times: dict,
                 seed: int = 0):
        self.lines = lines
        self.rate = rate_per_s
        self.send_times = send_times
        self.seed = seed

    def __iter__(self):
        rng = random.Random(self.seed)
        sched = time.monotonic()
        for i, line in enumerate(self.lines):
            sched += rng.expovariate(self.rate)
            now = time.monotonic()
            if sched > now:
                time.sleep(sched - now)
            self.send_times[json.loads(line)["id"]] = time.monotonic()
            yield line


class Recorder:
    """stdout stand-in: timestamps every response line as it is written."""

    def __init__(self):
        self.responses = []

    def write(self, s: str):
        t = time.monotonic()
        for line in s.splitlines():
            if line.strip():
                self.responses.append((t, json.loads(line)))

    def flush(self):
        pass


def make_requests(tmp: Path, n: int, frame_size: int, span_s: float = 8.0,
                  rate: int = 16000):
    """Staged-media requests: K distinct frames/wav files cycled over n ids
    (distinct files so per-request host IO is real, same shapes so the AV
    buckets — and therefore the XLA programs — are shared)."""
    from mmqg_tpu.data import wav as wavio

    rng = np.random.RandomState(0)
    K = 8
    files = []
    for k in range(K):
        f = tmp / f"f{k}.npy"
        np.save(f, rng.randint(0, 256,
                               (int(span_s), frame_size, frame_size, 3),
                               np.uint8))
        w = tmp / f"a{k}.wav"
        wavio.write_wav(w, (rng.randn(int(span_s * rate)) * 3000)
                        .astype(np.int16), rate)
        files.append((f, w))
    ctx = "what is the process of the system"
    return [json.dumps({"id": i, "context": ctx,
                        "frames_npy": str(files[i % K][0]),
                        "audio_wav": str(files[i % K][1])})
            for i in range(n)]


def make_raw_video_requests(tmp: Path, n: int, span_s: float = 8.0,
                            n_videos: int = 8, video_s: float = 60.0):
    """Raw-video requests — the north-star request form: {"video", "span"}.
    Each request seek-decodes its OWN 8 s span (frames at the model rate +
    span audio) in-process at serve time; K distinct mp4s cycled over n ids
    with varying span offsets, all spans the same length so the AV buckets
    — and the XLA programs — are shared."""
    from mmqg_tpu.data import native

    if not native.media_available():
        raise SystemExit("native media lib unavailable (make -C native media)")
    videos = []
    for k in range(n_videos):
        v = tmp / f"load{k}.mp4"
        if not native.write_test_av_mp4(v, seconds=video_s, freq=220 + 30 * k,
                                        width=320, height=240, fps=24):
            raise SystemExit("AAC/MPEG-4 encoders not in system libavcodec")
        videos.append(v)
    ctx = "what is the process of the system"
    reqs = []
    for i in range(n):
        start = 2.0 + (i % 6) * ((video_s - span_s - 4.0) / 6)
        reqs.append(json.dumps({"id": i, "video": str(videos[i % n_videos]),
                                "span": [start, start + span_s],
                                "context": ctx}))
    return reqs


def make_mixed_requests(tmp: Path, n: int, frame_size: int,
                        short_s: float = 1.0, long_s: float = 32.0,
                        rate: int = 16000):
    """Half short-span, half long-span staged requests, interleaved — the
    heterogeneous mix that exposes batch-max bucketing (a 1 s request
    batched with a 32 s companion pays the long program + its padding)."""
    from mmqg_tpu.data import wav as wavio

    rng = np.random.RandomState(0)
    files = {}
    for name, span in (("short", short_s), ("long", long_s)):
        f = tmp / f"mx_{name}.npy"
        np.save(f, rng.randint(0, 256,
                               (max(1, int(span)), frame_size, frame_size, 3),
                               np.uint8))
        w = tmp / f"mx_{name}.wav"
        wavio.write_wav(w, (rng.randn(int(span * rate)) * 3000)
                        .astype(np.int16), rate)
        files[name] = (f, w)
    ctx = "what is the process of the system"
    out = []
    for i in range(n):
        name = "short" if i % 2 == 0 else "long"
        out.append(json.dumps({"id": f"{name}{i}", "context": ctx,
                               "frames_npy": str(files[name][0]),
                               "audio_wav": str(files[name][1])}))
    return out


def warm_buckets(pipe, lines, max_batch: int, **serve_kw):
    """Compile every batch bucket 1..max_batch by forming exact-size
    batches: b instantly-available requests with max_batch=b."""
    from mmqg_tpu.serve import serve

    b = 1
    while b <= max_batch:
        src = iter(lines[:b])
        serve(pipe, strategy="greedy", max_batch=b, linger_ms=300,
              inp=src, out=Recorder(), **serve_kw)
        b <<= 1


def run_cell(pipe, lines, rate: float, linger_ms: float, max_batch: int,
             seed: int = 0, **serve_kw):
    from mmqg_tpu.serve import serve

    send_times: dict = {}
    rec = Recorder()
    src = PoissonSource(lines, rate, send_times, seed=seed)
    t0 = time.monotonic()
    serve(pipe, strategy="greedy", max_batch=max_batch,
          linger_ms=linger_ms, inp=src, out=rec, **serve_kw)
    lat, sizes = [], []
    by_class: dict = {}
    last = t0
    for t, resp in rec.responses:
        if "question" not in resp:
            continue
        el = t - send_times[resp["id"]]
        lat.append(el)
        cls = (resp["id"].rstrip("0123456789")
               if isinstance(resp["id"], str) else None)
        if cls:
            by_class.setdefault(cls, []).append(el)
        sizes.append(resp["batch_size"])
        last = max(last, t)
    lat = np.array(lat)
    first_send = min(send_times.values())
    cell = {
        "rate_req_s": rate,
        "linger_ms": linger_ms,
        "max_batch": max_batch,
        "n": len(lat),
        "achieved_q_s": round(len(lat) / (last - first_send), 1),
        "p50_ms": round(1000 * float(np.percentile(lat, 50)), 1),
        "p90_ms": round(1000 * float(np.percentile(lat, 90)), 1),
        "p99_ms": round(1000 * float(np.percentile(lat, 99)), 1),
        "mean_batch": round(float(np.mean(sizes)), 1),
    }
    for cls, els in sorted(by_class.items()):
        cell[f"p50_ms_{cls}"] = round(1000 * float(np.percentile(els, 50)), 1)
        cell[f"p99_ms_{cls}"] = round(1000 * float(np.percentile(els, 99)), 1)
    return cell


def _table(cells):
    print("\n| max_batch | linger_ms | rate req/s | achieved q/s | p50 ms "
          "| p90 ms | p99 ms | mean batch |")
    print("|---|---|---|---|---|---|---|---|")
    for c in cells:
        print(f"| {c['max_batch']} | {c['linger_ms']:.0f} | "
              f"{c['rate_req_s']} | {c['achieved_q_s']} | {c['p50_ms']} | "
              f"{c['p90_ms']} | {c['p99_ms']} | {c['mean_batch']} |")


def main():
    quick = "--quick" in sys.argv
    raw = "--raw" in sys.argv
    mixed = "--mixed" in sys.argv
    pipe = build_pipeline()
    tmp = Path(tempfile.mkdtemp(prefix="serve_load_"))

    if mixed:
        # bucket-grouping A/B on the heterogeneous span mix (round-4
        # VERDICT weak #2): short requests' latency with and without the
        # per-bucket batch split, same Poisson stream
        n = 24 if quick else 128
        lines = make_mixed_requests(tmp, n, pipe.mc.frame_size)
        cells = []
        for bucket_group in (False, True):
            print(f"warming (bucket_group={bucket_group}) ...", flush=True)
            warm_buckets(pipe, lines, 32, bucket_group=bucket_group)
            for rate in ([16] if quick else [8, 32]):
                cell = run_cell(pipe, lines, rate, 25.0, 32,
                                bucket_group=bucket_group)
                cell["bucket_group"] = bucket_group
                cells.append(cell)
                print(json.dumps(cell), flush=True)
        _table(cells)
        return

    if raw:
        # the north-star request form under load (round-4 VERDICT missing
        # #3): every request seek-decodes its own span at serve time on the
        # prep pool
        n = 16 if quick else 128
        print("synthesizing load videos ...", flush=True)
        lines = make_raw_video_requests(tmp, n)
        max_batches = [8] if quick else [8, 32]
        print("warming batch buckets ...", flush=True)
        warm_buckets(pipe, lines, max(max_batches))
        cells = []
        rates = [8] if quick else [4, 8, 16, 32]
        for mb in max_batches:
            for rate in rates:
                cell = run_cell(pipe, lines, rate, 25.0, mb)
                cells.append(cell)
                print(json.dumps(cell), flush=True)
        _table(cells)
        return

    n = 24 if quick else 192
    lines = make_requests(tmp, n, pipe.mc.frame_size)

    max_batches = [32] if quick else [8, 32]
    print("warming batch buckets ...", flush=True)
    warm_buckets(pipe, lines, max(max_batches))

    cells = []
    rates = [16] if quick else [8, 32, 128]
    lingers = [25.0] if quick else [0.0, 25.0, 100.0]
    for mb in max_batches:
        for linger in lingers:
            for rate in rates:
                cell = run_cell(pipe, lines, rate, linger, mb)
                cells.append(cell)
                print(json.dumps(cell), flush=True)
    _table(cells)


if __name__ == "__main__":
    main()
