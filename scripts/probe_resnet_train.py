"""R(2+1)D backbone training-step cost at reference dims on TPU.

Full text_video train step (teacher-forced CE + Adam) with
video_encoder="resnet" at B in argv (default 8), 101-frame 112x112 clips.
Catches RESOURCE_EXHAUSTED per batch size so one process maps the HBM
ceiling (remote compiles are minutes each — batch the sweep).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from mmqg_tpu.models import qg_model
from mmqg_tpu.train import init_train_state, make_optimizer, make_train_step
from mmqg_tpu.config import Config


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [8]
    cfg = Config(video_encoder="resnet")
    rng = np.random.RandomState(0)
    n_vocab = 2000
    emb = rng.rand(n_vocab, 300).astype(np.float32)
    mc = qg_model.ModelConfig.from_config(cfg, n_vocab=n_vocab,
                                          mode="text_video")
    optimizer = make_optimizer(cfg)
    step = make_train_step(mc, optimizer, use_pallas=False)
    for B in sizes:
        batch = {
            "context_ids": jnp.asarray(
                rng.randint(3, n_vocab, (B, mc.context_max_length), np.int32)),
            "context_len": jnp.full((B,), mc.context_max_length, jnp.int32),
            "target_ids": jnp.asarray(
                rng.randint(3, n_vocab, (B, mc.target_steps), np.int32)),
            "target_len": jnp.full((B,), mc.target_steps, jnp.int32),
            "frames": jnp.asarray(
                rng.randint(0, 256, (B, mc.av_max_length, 112, 112, 3),
                            np.uint8)),
            "frames_len": jnp.full((B,), mc.av_max_length, jnp.int32),
            "valid": jnp.ones((B,), bool),
        }
        try:
            ts = init_train_state(jax.random.PRNGKey(0), mc, emb, optimizer)
            ts, metrics = step(ts, batch, jax.random.PRNGKey(1))
            print(f"B={B} compile-step loss={float(metrics['loss']):.3f}",
                  flush=True)
            t0 = time.monotonic()
            iters = 3
            for i in range(iters):
                ts, metrics = step(ts, batch, jax.random.PRNGKey(2 + i))
            np.asarray(metrics["loss"])
            dt = (time.monotonic() - t0) / iters
            print(f"B={B} {dt*1e3:.1f} ms/step ({B/dt:.1f} samples/s)",
                  flush=True)
        except Exception as e:  # noqa: BLE001 - map the OOM ceiling
            msg = str(e).splitlines()[0][:200]
            print(f"B={B} FAILED: {type(e).__name__}: {msg}", flush=True)


if __name__ == "__main__":
    main()
