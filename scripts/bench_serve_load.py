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


def warm_buckets(pipe, lines, max_batch: int):
    """Compile every batch bucket 1..max_batch by forming exact-size
    batches: b instantly-available requests with max_batch=b."""
    from mmqg_tpu.serve import serve

    b = 1
    while b <= max_batch:
        src = iter(lines[:b])
        serve(pipe, strategy="greedy", max_batch=b, linger_ms=300,
              inp=src, out=Recorder())
        b <<= 1


def run_cell(pipe, lines, rate: float, linger_ms: float, max_batch: int,
             seed: int = 0):
    from mmqg_tpu.serve import serve

    send_times: dict = {}
    rec = Recorder()
    src = PoissonSource(lines, rate, send_times, seed=seed)
    t0 = time.monotonic()
    serve(pipe, strategy="greedy", max_batch=max_batch,
          linger_ms=linger_ms, inp=src, out=rec)
    lat, sizes = [], []
    last = t0
    for t, resp in rec.responses:
        if "question" not in resp:
            continue
        lat.append(t - send_times[resp["id"]])
        sizes.append(resp["batch_size"])
        last = max(last, t)
    lat = np.array(lat)
    first_send = min(send_times.values())
    return {
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


def main():
    quick = "--quick" in sys.argv
    pipe = build_pipeline()
    tmp = Path(tempfile.mkdtemp(prefix="serve_load_"))
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

    print("\n| max_batch | linger_ms | rate req/s | achieved q/s | p50 ms "
          "| p90 ms | p99 ms | mean batch |")
    print("|---|---|---|---|---|---|---|---|")
    for c in cells:
        print(f"| {c['max_batch']} | {c['linger_ms']:.0f} | "
              f"{c['rate_req_s']} | {c['achieved_q_s']} | {c['p50_ms']} | "
              f"{c['p90_ms']} | {c['p99_ms']} | {c['mean_batch']} |")


if __name__ == "__main__":
    main()
