"""A/B: reduce_window (SelectAndScatter backward) vs reshape-max pooling in
the trimodal train step, same everything else."""

import time

import jax
import jax.numpy as jnp
from jax import lax
import numpy as np

import __graft_entry__ as entry_mod
from mmqg_tpu.config import Config
from mmqg_tpu.models import layers as L
from mmqg_tpu.train import init_train_state, make_optimizer, make_train_step


def reduce_window_pool(x, window, stride=None):
    stride = stride or window
    return lax.reduce_window(
        x, -jnp.inf, lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding="VALID")


def run(label):
    B = 32
    mc, params, state, arrays = entry_mod._flagship(batch=B, audio_seconds=32)
    emb = np.zeros((mc.n_vocab, mc.word_emb_dim), np.float32)
    optimizer = make_optimizer(Config())
    ts = jax.device_put(init_train_state(jax.random.PRNGKey(0), mc, emb,
                                         optimizer))
    dev = {k: jax.device_put(v) for k, v in arrays.items()}
    step = make_train_step(mc, optimizer, use_pallas=False)
    rng = jax.random.PRNGKey(1)
    ts, m = step(ts, dev, rng)
    np.asarray(m["loss"])
    n = 6
    t0 = time.perf_counter()
    for i in range(n):
        ts, m = step(ts, dev, jax.random.fold_in(rng, i))
    np.asarray(m["loss"])
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"{label:24s} trimodal step {ms:8.1f} ms  "
          f"{B / ms * 1e3:7.1f} samples/s")


def main():
    print("devices:", jax.devices())
    orig = L.maxpool2d
    L.maxpool2d = reduce_window_pool
    try:
        run("reduce_window pool")
    finally:
        L.maxpool2d = orig
    run("reshape-max pool")


if __name__ == "__main__":
    main()
