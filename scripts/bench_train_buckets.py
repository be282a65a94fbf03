"""Training AV-bucket granularity A/B on TPU (round-1 VERDICT item 8).

Serving moved to eighth-granularity AV buckets (decode._bucket) — worth +37%
on a mid-length batch (PERF.md) — while training stayed at quarters. This
script decides the training default with a measurement instead of an analogy:

1. Read the REAL span-length distribution from the reference corpus
   (/root/reference/dataset/labelled_questions.json answer_start/answer_end,
   1 fps -> frames, reference get_salient_frames.py sampling rule); fall back
   to a synthetic short-skewed distribution if the file is absent.
2. Simulate shuffled training epochs at the production batch size and record,
   per granularity g in {4 (quarters), 8 (eighths)}: the sequence of
   (audio_cap, frames_cap) bucket keys -> distinct compile variants + how
   often each is hit.
3. On TPU, compile + steady-state-time the REAL jitted train step
   (make_train_step, trimodal, Adam) once per distinct cap pair that occurs.
4. Report expected ms/step per granularity (frequency-weighted), compile
   counts, and compile-amortisation break-even in epochs.

Timing convention: queued iterations, one np.asarray sync at the end
(block_until_ready does not block on the tunnel backend).
"""

import json
import sys
import time
from pathlib import Path

import jax
import numpy as np

sys.path.insert(0, "/root/repo")
import __graft_entry__ as entry_mod  # noqa: E402
from mmqg_tpu import decode as DEC
from mmqg_tpu.config import Config
from mmqg_tpu.train import init_train_state, make_optimizer, make_train_step

REF_JSON = Path("/root/reference/dataset/labelled_questions.json")
B = 32          # production train batch (config.batch_size default)
EPOCHS_SIM = 200  # simulated epochs for stable bucket-hit frequencies
SR = 16000


def _span_seconds():
    """Per-question answer-span seconds from the reference corpus."""
    if REF_JSON.exists():
        def sec(s):
            p = s.split(":")
            if len(p) == 2:
                return int(p[0]) * 60 + int(p[1])
            return int(p[0]) * 3600 + int(p[1]) * 60 + int(p[2])
        spans = []
        for r in json.loads(REF_JSON.read_text()):
            try:
                spans.append(max(1, sec(r["answer_end"]) - sec(r["answer_start"])))
            except (ValueError, KeyError):
                continue  # 9 records have blank ":" timestamps
        if spans:
            return np.array(spans)
    rng = np.random.default_rng(0)
    return np.clip(rng.lognormal(2.1, 0.6, 250).astype(int), 2, 101)


def _simulate(spans, mc, g):
    """One pass over EPOCHS_SIM shuffled epochs -> {capkey: hit_count}."""
    av = mc.av_max_length
    rng = np.random.default_rng(42)
    hits = {}
    for _ in range(EPOCHS_SIM):
        order = rng.permutation(len(spans))
        for i in range(0, len(spans) - B + 1, B):
            batch_spans = spans[order[i:i + B]]
            frames_need = int(np.minimum(batch_spans, av).max())
            audio_len = np.minimum(batch_spans, av) * SR
            audio_need = DEC.audio_examples_needed(mc, audio_len)
            fcap = DEC._bucket(max(1, frames_need), av, granularity=g)
            acap = DEC._bucket(max(1, min(audio_need, av)), av, granularity=g)
            hits[(acap, fcap)] = hits.get((acap, fcap), 0) + 1
    return hits


def main():
    print("devices:", jax.devices(), flush=True)
    spans = _span_seconds()
    print(f"spans: n={len(spans)} med={np.median(spans):.0f}s "
          f"p90={np.percentile(spans, 90):.0f}s max={spans.max()}s", flush=True)

    mc, _, _, arrays = entry_mod._flagship(batch=B, audio_seconds=32)
    sims = {g: _simulate(spans, mc, g) for g in (4, 8)}
    todo = sorted(set(sims[4]) | set(sims[8]))
    print(f"distinct cap pairs to measure: {todo}", flush=True)

    emb = np.zeros((mc.n_vocab, mc.word_emb_dim), np.float32)
    optimizer = make_optimizer(Config())
    arrays["target_len"] = np.maximum(arrays["target_len"], 1)

    measured = {}
    # the FIRST variant a process times runs ~2-3x slow (backend warmup:
    # measured (25,25) 229.9 ms cold vs 78.5-79.5 ms after any other variant
    # had run) — time a throwaway variant first, then the real grid
    for j, (acap, fcap) in enumerate([todo[-1]] + todo):
        warmup_only = (j == 0)
        # shrink the batch's true lengths under the caps so the step is valid
        arr = dict(arrays)
        arr["frames_len"] = np.full((B,), fcap, np.int32)
        arr["audio_len"] = np.full(
            (B,), min(arr["audio_pcm"].shape[1],
                      acap * mc.mel_frames * mc.stft_hop + mc.stft_window),
            np.int32)
        dev = {k: jax.device_put(v) for k, v in arr.items()}
        ts = jax.device_put(init_train_state(jax.random.PRNGKey(0), mc, emb,
                                             optimizer))
        step = make_train_step(mc, optimizer, use_pallas=False,
                               audio_cap=acap, frames_cap=fcap)
        rng = jax.random.PRNGKey(1)
        t0 = time.perf_counter()
        ts, m = step(ts, dev, rng)
        np.asarray(m["loss"])
        compile_s = time.perf_counter() - t0
        n = 6
        t0 = time.perf_counter()
        for i in range(n):
            ts, m = step(ts, dev, jax.random.fold_in(rng, i))
        np.asarray(m["loss"])
        ms = (time.perf_counter() - t0) / n * 1e3
        if warmup_only:
            print(f"warmup variant acap={acap} fcap={fcap}: {ms:.1f} ms "
                  f"(discarded)", flush=True)
        else:
            measured[(acap, fcap)] = (ms, compile_s)
            print(f"acap={acap:3d} fcap={fcap:3d}: {ms:8.1f} ms/step "
                  f"(compile {compile_s:.1f}s)", flush=True)
        del ts, dev, step

    steps_per_epoch = (len(spans) // B)
    result = {}
    for g, hits in sims.items():
        total = sum(hits.values())
        exp_ms = sum(measured[k][0] * c for k, c in hits.items()) / total
        compiles = len(hits)
        compile_total = sum(measured[k][1] for k in hits)
        result[g] = (exp_ms, compiles, compile_total)
        print(f"granularity {g}: expected {exp_ms:8.1f} ms/step, "
              f"{compiles} variants, {compile_total:.0f}s total compile, "
              f"variants hit: {dict(sorted(hits.items()))}", flush=True)

    q_ms, _, q_comp = result[4]
    e_ms, _, e_comp = result[8]
    if e_ms < q_ms:
        extra_compile = max(0.0, e_comp - q_comp)
        saved_per_epoch = (q_ms - e_ms) * steps_per_epoch / 1e3
        be = extra_compile / saved_per_epoch if saved_per_epoch > 0 else float("inf")
        print(f"VERDICT: eighths win {q_ms:.1f} -> {e_ms:.1f} ms/step "
              f"({(q_ms / e_ms - 1) * 100:.0f}% faster); extra compile "
              f"{extra_compile:.0f}s amortises in {be:.1f} epochs", flush=True)
    else:
        print(f"VERDICT: quarters win ({q_ms:.1f} vs {e_ms:.1f} ms/step) — "
              f"keep granularity 4", flush=True)


if __name__ == "__main__":
    main()
