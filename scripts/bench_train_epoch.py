"""Loader-fed trimodal training epoch at B=64 (round-3 VERDICT weak #5 /
next-round #5): the streaming loader + native C++ pack pool feeding the real
jitted train step on TPU, measured as EPOCH WALL-CLOCK — the training
analogue of the joint serving bench — against the staged-step ceiling
(PERF.md training table: ~273 samples/s/chip), with a device-idle fraction.

Three measured legs over the same on-disk corpus (1024 corpus-shaped
samples: 4-12 frames + ~8 s PCM each, reference model dims):
  loader_only — iterate StreamingLoader batches, no device work (host ceiling)
  staged      — one device-resident batch stepped back-to-back (device floor)
  epoch       — Trainer.run_epoch with the streaming loader (the real path)

Usage: python scripts/bench_train_epoch.py [n_samples] [epochs]
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def build_corpus(config, n: int, seed: int = 0):
    """Corpus-shaped artifacts at reference dims: frames T~U[4,12] (span
    p50 8 s at ~1 fps), audio ~T s 16 kHz — written through the same
    fixture builder the tests use, with av_max temporarily clamped so the
    SAMPLED lengths are corpus-shaped while the training config keeps the
    reference's av_max=101 padding contract."""
    from tests.fixtures import build_tiny_corpus

    build_cfg = config.replace(av_max_length=12)
    return build_tiny_corpus(build_cfg, n_questions=n, seed=seed)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from mmqg_tpu.config import Config
    from mmqg_tpu.models import qg_model
    from mmqg_tpu.models.video_encoder import flatten_dim_for

    root = Path(tempfile.mkdtemp(prefix="epoch_bench_"))
    config = Config(
        output_path=root / "results", dataset_path=root / "dataset",
        data_path=root / "data", glove_path=root / "glove",
        frame_size=112, flatten_dim=flatten_dim_for(112),
        batch_size=64, eval_batch_size=64, audio_sample_rate=16000,
    ).ensure_dirs()
    t0 = time.perf_counter()
    build_corpus(config, n)
    print(f"corpus: {n} samples built in {time.perf_counter() - t0:.0f}s "
          f"(excluded)", flush=True)

    from mmqg_tpu.data.streaming import StreamingLoader
    from mmqg_tpu.train import Trainer, batch_arrays

    train_ds = StreamingLoader(config, config.train_file,
                               batch_size=config.batch_size)
    val_ds = StreamingLoader(config, config.val_file,
                             batch_size=config.eval_batch_size)
    emb = np.load(config.weights_matrix_file).astype(np.float32)
    mc = qg_model.ModelConfig.from_config(config, n_vocab=len(train_ds.vocab),
                                          mode="trimodal")
    trainer = Trainer(config, mc, emb, train_ds, val_ds,
                      log_fn=lambda *a: None)

    # --- loader_only: host ceiling (no device) ---
    rng_np = np.random.default_rng(0)
    t0 = time.perf_counter()
    n_rows = 0
    for batch in train_ds.batches(config.batch_size, shuffle=True,
                                  rng=rng_np):
        arrays = batch_arrays(batch)
        n_rows += int(arrays["valid"].sum())
    loader_s = time.perf_counter() - t0
    print(f"loader_only: {loader_s:.2f}s for {n_rows} samples "
          f"({n_rows / loader_s:.0f} samples/s host ceiling)", flush=True)

    # --- warm epoch: compiles every AV-bucket step variant ---
    t0 = time.perf_counter()
    loss = trainer.run_epoch(0)
    print(f"warm epoch (compiles): {time.perf_counter() - t0:.1f}s "
          f"loss={loss:.4f}", flush=True)

    # --- staged: one device-resident batch back-to-back (device floor) ---
    import jax
    rng_np = np.random.default_rng(1)
    batch = next(iter(train_ds.batches(config.batch_size, shuffle=True,
                                       rng=rng_np)))
    arrays = {k: jax.device_put(v) for k, v in batch_arrays(batch).items()}
    step_fn = trainer._step_for(batch_arrays(batch))
    ts = trainer.train_state
    rng = jax.random.PRNGKey(0)
    ts, m = step_fn(ts, arrays, rng)          # warm this exact variant
    np.asarray(m["loss"])
    N = 10
    t0 = time.perf_counter()
    for s in range(N):
        ts, m = step_fn(ts, arrays, jax.random.fold_in(rng, s))
    np.asarray(m["loss"])
    staged_s = (time.perf_counter() - t0) / N
    staged_rate = config.batch_size / staged_s
    trainer.train_state = ts
    print(f"staged step: {1000 * staged_s:.0f} ms/step "
          f"({staged_rate:.0f} samples/s device floor)", flush=True)

    # --- timed epochs: the real loader-fed path ---
    for e in range(1, epochs + 1):
        t0 = time.perf_counter()
        loss = trainer.run_epoch(e)
        wall = time.perf_counter() - t0
        steps = -(-n_rows // config.batch_size)
        device_s = steps * staged_s
        print(f"epoch {e}: {wall:.2f}s, {n_rows / wall:.0f} samples/s "
              f"({100 * n_rows / wall / staged_rate:.0f}% of staged), "
              f"device_idle_frac={max(0.0, 1 - device_s / wall):.3f}, "
              f"loss={loss:.4f}", flush=True)


if __name__ == "__main__":
    main()
