"""Probe: where does XLA's int8 conv lowering lose vs int8-GEMM ideal?

VGGish conv2..6 is ~70% of serving compute and runs ~2.3x slower than the
int8-ideal GEMM time (NOTES_NEXT_ROUND.md #1). Before attempting a Pallas
kernel, measure XLA-level reformulations in ONE process (remote compiles are
slow; batch everything):

  conv_int8      current path: lax.conv_general_dilated int8 NHWC
  conv_bf16      the bf16 conv stack (pre-int8 baseline)
  im2col_int8    pad + concat 9 shifted slices (9x act bytes, int8) ->
                 ONE int8 dot per layer with K=9*Cin (full MXU tiles)
  gemm_ideal     pre-materialised int8 GEMMs of identical M/K/N per layer
                 (no patch construction): compute+weight-read lower bound
  gemm_kcin      same but K=Cin per tap (the shifted-GEMM ideal; K=64 for
                 conv2 underfills the MXU)

All stacks share the structure of audio_encoder.embed_examples_int8:
static act scales (quantize fuses into the previous epilogue), relu+pool
between blocks. Timing: warmup, then queue iters back-to-back and sync once
via np.asarray (block_until_ready does not block on this backend).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

# conv2..6: (Cin, Cout, H, W, pool_after)
LAYERS = (
    (64, 128, 48, 32, True),
    (128, 256, 24, 16, False),
    (256, 256, 24, 16, True),
    (256, 512, 12, 8, False),
    (512, 512, 12, 8, True),
)
N = 2048
SCALE = 0.05  # static act scale; numerics irrelevant for timing


def _pool(x):
    n, h, w, c = x.shape
    return x.reshape(n, h // 2, 2, w // 2, 2, c).max(axis=(2, 4))


def stack_conv_int8(x, ws):
    for (cin, cout, h, w_, pool), w in zip(LAYERS, ws):
        xq = jnp.round(jnp.clip(x.astype(jnp.float32) / SCALE, 0, 127)
                       ).astype(jnp.int8)
        wq = jnp.round(w / (jnp.max(jnp.abs(w), axis=(0, 1, 2)) / 127.0)
                       ).astype(jnp.int8)
        y = jax.lax.conv_general_dilated(
            xq, wq, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        x = jax.nn.relu(y.astype(jnp.float32) * SCALE).astype(jnp.bfloat16)
        if pool:
            x = _pool(x)
    return jnp.sum(x.astype(jnp.float32))


def stack_conv_bf16(x, ws):
    for (cin, cout, h, w_, pool), w in zip(LAYERS, ws):
        y = jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = jax.nn.relu(y).astype(jnp.bfloat16)
        if pool:
            x = _pool(x)
    return jnp.sum(x.astype(jnp.float32))


def stack_im2col_int8(x, ws):
    for (cin, cout, h, w_, pool), w in zip(LAYERS, ws):
        xq = jnp.round(jnp.clip(x.astype(jnp.float32) / SCALE, 0, 127)
                       ).astype(jnp.int8)
        wq = jnp.round(w / (jnp.max(jnp.abs(w), axis=(0, 1, 2)) / 127.0)
                       ).astype(jnp.int8)                      # (3,3,Cin,Cout)
        xp = jnp.pad(xq, ((0, 0), (1, 1), (1, 1), (0, 0)))
        taps = [xp[:, dh:dh + h, dw:dw + w_, :]
                for dh in range(3) for dw in range(3)]
        patches = jnp.concatenate(taps, axis=-1)               # (N,H,W,9Cin)
        y = jax.lax.dot_general(
            patches.reshape(-1, 9 * cin), wq.reshape(9 * cin, cout),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        x = jax.nn.relu(y.astype(jnp.float32) * SCALE).astype(jnp.bfloat16)
        x = x.reshape(xq.shape[0], h, w_, cout)
        if pool:
            x = _pool(x)
    return jnp.sum(x.astype(jnp.float32))


def gemm_ideal(xs, ws):
    acc = jnp.zeros((), jnp.float32)
    for xg, wg in zip(xs, ws):
        y = jax.lax.dot_general(xg, wg, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        acc = acc + jnp.sum(y.astype(jnp.float32))
    return acc


def time_fn(name, fn, *args, iters=6, warmup=2):
    f = jax.jit(fn)
    try:
        for _ in range(warmup):
            np.asarray(f(*args))
        t0 = time.perf_counter()
        outs = [f(*args) for _ in range(iters)]
        for o in outs:
            np.asarray(o)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:18s} {dt * 1000:8.2f} ms")
        return dt
    except Exception as e:  # noqa: BLE001
        print(f"{name:18s} FAIL {type(e).__name__}: {str(e)[:160]}")
        return None


def main():
    print("backend:", jax.default_backend(), "N =", N)
    rs = np.random.RandomState(0)
    x0 = jnp.asarray(rs.rand(N, 48, 32, 64), jnp.bfloat16)
    ws = [jnp.asarray(rs.randn(3, 3, cin, cout) * 0.05, jnp.float32)
          for cin, cout, _, _, _ in LAYERS]

    macs = sum(h * w_ * cin * cout * 9 for cin, cout, h, w_, _ in LAYERS) * N
    print(f"conv2..6 MACs at N={N}: {macs / 1e9:.1f} G "
          f"(int8 ideal @394TOPS = {macs * 2 / 394e12 * 1e3:.1f} ms, "
          f"bf16 ideal @197TF = {macs * 2 / 197e12 * 1e3:.1f} ms)")

    # ideal-GEMM operand sets (pre-materialised; args, not constants)
    xs_k9 = [jnp.asarray(rs.randint(0, 127, (N * h * w_, 9 * cin)), jnp.int8)
             for cin, cout, h, w_, _ in LAYERS]
    ws_k9 = [jnp.asarray(rs.randint(-127, 127, (9 * cin, cout)), jnp.int8)
             for cin, cout, h, w_, _ in LAYERS]
    xs_k1 = [jnp.asarray(rs.randint(0, 127, (N * h * w_, cin)), jnp.int8)
             for cin, cout, h, w_, _ in LAYERS]
    ws_k1 = [jnp.asarray(rs.randint(-127, 127, (cin, cout)), jnp.int8)
             for cin, cout, h, w_, _ in LAYERS]

    time_fn("conv_bf16", stack_conv_bf16, x0, ws)
    time_fn("conv_int8", stack_conv_int8, x0, ws)
    time_fn("im2col_int8", stack_im2col_int8, x0, ws)
    time_fn("gemm_ideal_k9", gemm_ideal, xs_k9, ws_k9)

    def gemm_kcin(xs, ws):
        acc = jnp.zeros((), jnp.float32)
        for xg, wg in zip(xs, ws):
            for _ in range(9):
                y = jax.lax.dot_general(xg, wg, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.int32)
                acc = acc + jnp.sum(y.astype(jnp.float32))
        return acc
    time_fn("gemm_kcin_x9", gemm_kcin, xs_k1, ws_k1)


if __name__ == "__main__":
    main()
