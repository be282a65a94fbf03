"""Measure the Trainer epoch's per-step metric-sync overhead on TPU.

Trainer.run_epoch used to call float(metrics["loss"]) after every step — a
device->host round trip (~30 ms on this tunnel backend) that serialises the
host loop with device compute. The fix holds a 2-step lag of pending metric
scalars (train.py run_epoch). This probe A/Bs the two disciplines on the
same jitted donated train step with a staged batch, isolating the sync cost
from data loading.

Run on TPU:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_epoch_sync_lag.py
"""

import time
from collections import deque

import jax
import numpy as np

from mmqg_tpu.models import qg_model
from mmqg_tpu.train import init_train_state, make_optimizer, make_train_step
from mmqg_tpu.config import Config

B = 64
STEPS = 20


def staged_text_batch(rng, n_vocab, ctx, tgt):
    return {
        "context_ids": jax.device_put(
            rng.randint(3, n_vocab, (B, ctx)).astype(np.int32)),
        "context_len": jax.device_put(np.full((B,), ctx, np.int32)),
        "target_ids": jax.device_put(
            rng.randint(3, n_vocab, (B, tgt)).astype(np.int32)),
        "target_len": jax.device_put(np.full((B,), tgt, np.int32)),
        "valid": jax.device_put(np.ones((B,), bool)),
    }


def run(step_fn, ts0, batch, lag: int) -> float:
    """One 'epoch' of STEPS steps with a metric-read lag; returns s/step."""
    ts = ts0()
    pending = deque()
    # warm (compile) outside the clock
    ts, m = step_fn(ts, batch, jax.random.PRNGKey(0))
    np.asarray(m["loss"])
    t0 = time.monotonic()
    for i in range(STEPS):
        ts, m = step_fn(ts, batch, jax.random.PRNGKey(i))
        pending.append(m["loss"])
        while len(pending) > lag:
            float(np.asarray(pending.popleft()))
    while pending:
        float(np.asarray(pending.popleft()))
    return (time.monotonic() - t0) / STEPS


def main():
    config = Config(batch_size=B)
    n_vocab = 2000
    mc = qg_model.ModelConfig(n_vocab=n_vocab, mode="text")
    rngn = np.random.RandomState(0)
    emb = rngn.randn(n_vocab, mc.word_emb_dim).astype(np.float32)
    optimizer = make_optimizer(config)
    ts_host = jax.tree.map(
        lambda x: np.asarray(x) if hasattr(x, "ndim") else x,
        init_train_state(jax.random.PRNGKey(0), mc, emb, optimizer))

    def fresh():
        return jax.tree.map(
            lambda x: jax.device_put(np.array(x)) if hasattr(x, "ndim") else x,
            ts_host)

    batch = staged_text_batch(rngn, n_vocab, mc.context_max_length,
                              mc.target_steps)
    step_fn = make_train_step(mc, optimizer, use_pallas=False)

    for name, lag in [("sync_every_step", 0), ("lag2", 2), ("lag2_again", 2),
                      ("sync_again", 0)]:
        s = run(step_fn, fresh, batch, lag)
        print(f"{name}: {s*1e3:.1f} ms/step ({B/s:.0f} samples/s)")


if __name__ == "__main__":
    main()
