"""Microbench: XLA VGGish conv stack vs fused Pallas kernel on real TPU.

Runs everything in one process (remote-compile queue is slow; batch the
experiments). Prints ms per call for each variant. Params are jit ARGS
(HTTP 413 on big constants). Timing materialises via np.asarray (the axon
backend's block_until_ready does not block).
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from mmqg_tpu.models import audio_encoder
from mmqg_tpu.ops import vggish_pallas


def timeit(fn, *args, iters=8):
    out = fn(*args)
    np.asarray(out)  # warmup + compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    print("devices:", jax.devices())
    params = audio_encoder.init(jax.random.PRNGKey(0))
    rs = np.random.RandomState(0)

    for N in (512, 2048):
        mel = jnp.asarray(rs.randn(N, 96, 64).astype(np.float32) * 0.5)

        xla_fn = jax.jit(functools.partial(audio_encoder.embed_examples,
                                           dtype=jnp.bfloat16))
        ms = timeit(xla_fn, params, mel)
        print(f"N={N:5d} XLA embed_examples          {ms:8.2f} ms")

        try:
            i8_fn = jax.jit(functools.partial(
                audio_encoder.embed_examples_int8, dtype=jnp.bfloat16))
            ms = timeit(i8_fn, params, mel)
            ref = np.asarray(xla_fn(params, mel)).astype(np.float64)
            got = np.asarray(i8_fn(params, mel)).astype(np.float64)
            rel = (np.linalg.norm(got - ref) /
                   max(np.linalg.norm(ref), 1e-9))
            print(f"N={N:5d} XLA int8 conv               {ms:8.2f} ms  "
                  f"rel_err={rel:.4f}")
        except Exception as e:  # noqa: BLE001
            print(f"N={N:5d} XLA int8 conv FAILED: "
                  f"{type(e).__name__}: {str(e)[:200]}")

        try:
            scales = audio_encoder.calibrate_int8_scales(params, mel[:64])
            i8s_fn = jax.jit(functools.partial(
                audio_encoder.embed_examples_int8, dtype=jnp.bfloat16,
                act_scales=scales))
            ms = timeit(i8s_fn, params, mel)
            ref = np.asarray(xla_fn(params, mel)).astype(np.float64)
            got = np.asarray(i8s_fn(params, mel)).astype(np.float64)
            rel = (np.linalg.norm(got - ref) /
                   max(np.linalg.norm(ref), 1e-9))
            print(f"N={N:5d} XLA int8 static scales      {ms:8.2f} ms  "
                  f"rel_err={rel:.4f}")
        except Exception as e:  # noqa: BLE001
            print(f"N={N:5d} XLA int8 static FAILED: "
                  f"{type(e).__name__}: {str(e)[:200]}")

        for sub_a, sub_b in ((1, 4), (2, 8)):
            try:
                fn = jax.jit(functools.partial(_embed, sa=sub_a, sb=sub_b))
                ms = timeit(fn, params, mel)
                print(f"N={N:5d} pallas sub_a={sub_a} sub_b={sub_b}   "
                      f"{ms:8.2f} ms")
            except Exception as e:  # noqa: BLE001
                print(f"N={N:5d} pallas sub_a={sub_a} sub_b={sub_b} FAILED: "
                      f"{type(e).__name__}: {str(e)[:300]}")


def _embed(p, m, *, sa, sb):
    from mmqg_tpu.models import layers as L
    x = vggish_pallas.vggish_features_pallas(p, m, dtype=jnp.bfloat16,
                                             sub_a=sa, sub_b=sb)
    x = jax.nn.relu(L.dense(p["fc1"], x, dtype=jnp.bfloat16))
    x = jax.nn.relu(L.dense(p["fc2"], x, dtype=jnp.bfloat16))
    return L.dense(p["fc3"], x, dtype=jnp.bfloat16)


if __name__ == "__main__":
    main()
