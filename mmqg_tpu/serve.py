"""JSONL serving daemon: stdin requests -> micro-batched decode -> stdout.

The reference had no serving story at all (its evaluate.py was a test-set
batch job, reference evaluate.py:129-229); ``QGPipeline`` is the Python
API, and this daemon is the process-level surface: newline-delimited JSON
requests on stdin, responses on stdout, with dynamic micro-batching — a
request waits at most ``--linger-ms`` for companions, then the whole bucket
decodes as ONE fixed-shape TPU batch (the jit programs are shared with the
evaluate CLI, so the first request pays the compile and the rest are hot).

Request (staged media):
          {"id": <any>, "context": "...", "frames_npy": "path.npy"?,
           "audio_wav": "path.wav"?}
Request (raw video — the full north-star path, one span per request;
          frames AND audio are seek-decoded in-process from the span only):
          {"id": <any>, "video": "lecture.mp4", "span": ["0:45", "1:10"],
           "subtitles": "lecture.srt"?, "context": "..."?}
Response: {"id": <any>, "question": "...", "batch_size": N,
           "latency_ms": F}   (or {"id", "error"} per bad request)

Usage:
  python -m mmqg_tpu.serve -c results/config.json --best -s beam \
      --mode trimodal --max-batch 32 --linger-ms 25
"""

from __future__ import annotations

import argparse
import json
import queue
import sys
import threading
import time
from typing import List, Optional

import numpy as np


def _load_media(req: dict, pipe):
    """Resolve one request to (context, frames, audio) host-side.

    The raw-video form runs the same prep as QGPipeline.generate_from_video
    (salient-frame seek-decode, span audio via pipe._span_audio, subtitle
    context extraction) for a single span."""
    mc = pipe.mc
    context = req.get("context", "")
    frames = audio = None
    if req.get("video"):
        from mmqg_tpu.data import saliency
        from mmqg_tpu.data.subtitles import (extract_context,
                                             parse_subtitle_file,
                                             span_seconds)
        from mmqg_tpu.data.text_prep import preprocess_text

        def _sec(v):
            return float(span_seconds(v)) if isinstance(v, str) else float(v)

        a, b = (_sec(v) for v in req["span"])
        frames = saliency.extract_salient_frames_for_video(
            req["video"], [(int(a * 1000), int(b * 1000))],
            frame_dim=(mc.frame_size, mc.frame_size))[0]
        if not context and req.get("subtitles"):
            caps = parse_subtitle_file(req["subtitles"])
            context = extract_context(caps, a, b) or ""
        context = preprocess_text(context) or ""
        spans_audio = pipe._span_audio(req["video"], [(a, b)])
        audio = spans_audio[0] if spans_audio else None
    if req.get("frames_npy"):
        frames = np.load(req["frames_npy"])
    if req.get("audio_wav"):
        from mmqg_tpu.data import wav as wavio
        audio = wavio.load_mono_16k(req["audio_wav"],
                                    target_rate=mc.sample_rate)
    return context, frames, audio


def serve(pipe, *, strategy: str, max_batch: int, linger_ms: float,
          topk: int = 1, top_p: float = 0.9, seed: int = 0,
          inp=None, out=None) -> int:
    """Run the serve loop until EOF on ``inp``; returns requests served.

    Sampling strategies draw from a per-BATCH stream (seed + batch index),
    so identical requests in different batches get independent draws."""
    n_batches = 0
    inp = inp if inp is not None else sys.stdin
    out = out if out is not None else sys.stdout
    # bounded: a producer faster than the device back-pressures on stdin
    # instead of growing an unbounded request queue in memory
    q: "queue.Queue[Optional[dict]]" = queue.Queue(maxsize=8 * max_batch)

    def reader():
        try:
            for line in inp:
                line = line.strip()
                if not line:
                    continue
                try:
                    q.put(json.loads(line))
                except json.JSONDecodeError as e:
                    q.put({"_parse_error": str(e)})
        finally:
            q.put(None)  # EOF sentinel — even if the read loop raised

    threading.Thread(target=reader, daemon=True).start()
    served = 0
    done = False
    in_flight = None  # previous batch: dispatched to device, not yet flushed

    def flush(infl):
        """Block on a dispatched batch and write its responses."""
        try:
            questions = infl["finalize"]()
        except Exception as e:  # runtime failure: error every request in it
            for rid in infl["ids"]:
                out.write(json.dumps({"id": rid, "error": str(e)}) + "\n")
            questions = []
        # latency the client experiences: measured AFTER finalize() has
        # materialised the result (finalize blocks on the device)
        ms = (time.monotonic() - infl["t0"]) * 1000.0
        for rid, question in zip(infl["ids"], questions):
            if question is None:
                continue  # per-request failure: its error is in errs
            out.write(json.dumps({"id": rid, "question": question,
                                  "batch_size": infl["n"],
                                  "latency_ms": round(ms, 1)}) + "\n")
        for rid, err in infl["errs"]:
            out.write(json.dumps({"id": rid, "error": err}) + "\n")
        out.flush()

    while not done:
        # idle: flush the in-flight batch before blocking for new work, so
        # its responses aren't held hostage to the next request arriving
        if in_flight is not None and q.empty():
            flush(in_flight)
            in_flight = None
        first = q.get()
        if first is None:
            break
        pending: List[dict] = [first]
        # Drain whatever is ALREADY queued without waiting: a backed-up
        # queue means the device fell behind the arrival rate, and shipping
        # the backlog as one batch amortises the per-program dispatch floor
        # — with linger_ms=0 the deadline loop below never batches at all,
        # which saturated at ~1/(2 programs x dispatch floor) q/s under
        # load (PERF.md "Serving daemon under load").
        while len(pending) < max_batch:
            try:
                nxt = q.get_nowait()
            except queue.Empty:
                break
            if nxt is None:
                done = True
                break
            pending.append(nxt)
        # then linger for companions only if there is budget and room
        deadline = time.monotonic() + linger_ms / 1000.0
        while not done and len(pending) < max_batch:
            timeout = deadline - time.monotonic()
            if timeout <= 0:
                break
            try:
                nxt = q.get(timeout=timeout)
            except queue.Empty:
                break
            if nxt is None:
                done = True
                break
            pending.append(nxt)

        t0 = time.monotonic()
        contexts, frames, audio, ids, errs = [], [], [], [], []
        for req in pending:
            try:
                if "_parse_error" in req:
                    raise ValueError(req["_parse_error"])
                c, f, a = _load_media(req, pipe)
                contexts.append(c)
                frames.append(f)
                audio.append(a)
                ids.append(req.get("id"))
            except Exception as e:  # bad request must not kill the batch
                errs.append((req.get("id") if isinstance(req, dict)
                             else None, str(e)))

        finalize = None
        if contexts:
            try:
                # async dispatch: the device decodes THIS batch while the
                # loop goes back to gathering/packing the next one
                finalize = pipe.generate_async(contexts, frames, audio,
                                               strategy=strategy, topk=topk,
                                               top_p=top_p,
                                               seed=seed + n_batches)
                n_batches += 1
            except Exception:
                # a request that loaded fine can still break batch packing
                # (e.g. wrong frame geometry); degrade to per-request calls
                # so one poisoned input errors alone, not the whole batch
                def finalize(contexts=contexts, frames=frames, audio=audio,
                             ids=ids, infl_errs=errs):
                    qs = []
                    for j, ctx in enumerate(contexts):
                        try:
                            qs.append(pipe.generate(
                                [ctx], [frames[j]], [audio[j]],
                                strategy=strategy, topk=topk, top_p=top_p,
                                seed=seed + n_batches + j)[0])
                        except Exception as e:
                            infl_errs.append((ids[j], str(e)))
                            qs.append(None)  # placeholder keeps id alignment
                    return qs

        # overlap: the PREVIOUS batch flushes while this one decodes
        if in_flight is not None:
            flush(in_flight)
            in_flight = None
        if finalize is not None:
            # the SAME list the fallback finalize appends per-request
            # errors into — flush reads it after finalize() returns
            in_flight = {"finalize": finalize, "ids": ids,
                         "n": len(contexts), "errs": errs, "t0": t0}
        elif errs:
            for rid, err in errs:
                out.write(json.dumps({"id": rid, "error": err}) + "\n")
            out.flush()
        served += len(pending)

    if in_flight is not None:
        flush(in_flight)
    return served


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="JSONL QG serving daemon")
    parser.add_argument("-c", "--config_path", type=str, required=True)
    parser.add_argument("-b", "--best", action="store_true")
    parser.add_argument("-l", "--last", action="store_true")
    parser.add_argument("-s", "--strategy", type=str, default="beam",
                        choices=["greedy", "sampling", "topk", "topp",
                                 "beam"])
    parser.add_argument("--mode", type=str, default="trimodal",
                        choices=["text", "text_video", "trimodal"])
    parser.add_argument("--decoder", type=str, default="attn",
                        choices=["attn", "non_attn"])
    parser.add_argument("--top-k", type=int, default=1,
                        help="k for -s topk")
    parser.add_argument("--top-p", type=float, default=0.9,
                        help="nucleus mass for -s topp")
    parser.add_argument("--seed", type=int, default=0,
                        help="base PRNG seed for sampling strategies")
    parser.add_argument("--max-batch", type=int, default=32)
    parser.add_argument("--linger-ms", type=float, default=25.0)
    parser.add_argument("--data-parallel", action="store_true",
                        help="shard serving over all devices (QGPipeline."
                             "shard); each chip decodes its slice")
    parser.add_argument("--compile-cache", type=str, default=None,
                        help="persistent XLA compilation-cache directory "
                             "(also config compilation_cache_dir or "
                             "MMQG_COMPILE_CACHE); a restarted daemon skips "
                             "recompiling its decode-bucket programs")
    args = parser.parse_args(argv)

    from mmqg_tpu.config import Config
    from mmqg_tpu.pipeline import QGPipeline
    from mmqg_tpu.utils.compilation_cache import maybe_enable_from

    config = Config.load(args.config_path)
    maybe_enable_from(args.compile_cache, config)
    alias = "last" if args.last and not args.best else "best"
    pipe = QGPipeline.from_checkpoint(config, alias=alias, mode=args.mode,
                                      decoder=args.decoder)
    if args.data_parallel:
        import jax
        if len(jax.devices()) > 1:
            shape = tuple(config.mesh_shape)
            pipe = pipe.shard(shape=None if shape == (1, 1) else shape)
            print(f"serving data-parallel over {len(jax.devices())} devices",
                  file=sys.stderr)
        else:
            print("warning: --data-parallel requested but only one device "
                  "is visible", file=sys.stderr)
    print(f"ready alias={alias} strategy={args.strategy} "
          f"max_batch={args.max_batch}", file=sys.stderr, flush=True)
    n = serve(pipe, strategy=args.strategy, max_batch=args.max_batch,
              topk=args.top_k, top_p=args.top_p, seed=args.seed,
              linger_ms=args.linger_ms)
    print(f"served {n} requests", file=sys.stderr)


if __name__ == "__main__":
    main()
