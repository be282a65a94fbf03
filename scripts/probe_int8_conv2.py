"""Probe 2: clean compute-bound measurements (probe_int8_conv.py's "ideal"
GEMMs were bandwidth-corrupted by int32 outputs + full-array sums).

  gemm_chain_bf16 / _int8   8 chained (8192,4096)x(4096,4096) dots, each
                            link's output cast down and fed to the next, so
                            nothing can be narrowed or skipped -> the
                            machine's achievable MXU rate and whether int8
                            dots run at 2x bf16 on this compiler at all.
  convN_bf16 / _int8        each VGGish layer type repeated 5x in a chain
                            (outputs channel-folded back to Cin so XLA can't
                            narrow) -> per-layer %MXU and int8 benefit.

Chain sink: mean of the final tensor (depends on every element).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

N = 2048
LINKS, M, K = 8, 8192, 4096
REPS = 5
# (name, Cin, Cout, H, W)
CONVS = (
    ("conv2_48x32_64to128", 64, 128, 48, 32),
    ("conv3a_24x16_128to256", 128, 256, 24, 16),
    ("conv3b_24x16_256to256", 256, 256, 24, 16),
    ("conv4a_12x8_256to512", 256, 512, 12, 8),
    ("conv4b_12x8_512to512", 512, 512, 12, 8),
)


def time_fn(name, fn, *args, iters=6, warmup=2, flops=None):
    f = jax.jit(fn)
    try:
        for _ in range(warmup):
            np.asarray(f(*args))
        t0 = time.perf_counter()
        outs = [f(*args) for _ in range(iters)]
        for o in outs:
            np.asarray(o)
        dt = (time.perf_counter() - t0) / iters
        extra = ""
        if flops:
            extra = f"  {flops / dt / 1e12:7.1f} Tops/s"
        print(f"{name:26s} {dt * 1000:8.2f} ms{extra}", flush=True)
        return dt
    except Exception as e:  # noqa: BLE001
        print(f"{name:26s} FAIL {type(e).__name__}: {str(e)[:140]}", flush=True)
        return None


def gemm_chain_bf16(x, ws):
    for w in ws:
        y = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        x = (y * 1e-2).astype(jnp.bfloat16)
    return jnp.mean(x.astype(jnp.float32))


def gemm_chain_int8(x, ws):
    for w in ws:
        y = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        x = jnp.clip(y // 1024, -127, 127).astype(jnp.int8)
    return jnp.mean(x.astype(jnp.float32))


def conv_chain_bf16(cin, cout, h, w_):
    def fn(x, w):
        for _ in range(REPS):
            y = jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            # fold Cout back to Cin over all channels: un-narrowable
            x = (y.reshape(y.shape[:3] + (cin, cout // cin)).mean(-1)
                 * 0.1).astype(jnp.bfloat16)
        return jnp.mean(x.astype(jnp.float32))
    return fn


def conv_chain_int8(cin, cout, h, w_):
    def fn(x, w):
        for _ in range(REPS):
            y = jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            xf = y.reshape(y.shape[:3] + (cin, cout // cin)).mean(-1)
            x = jnp.clip(xf // 64, -127, 127).astype(jnp.int8)
        return jnp.mean(x.astype(jnp.float32))
    return fn


def main():
    print("backend:", jax.default_backend(), flush=True)
    rs = np.random.RandomState(0)

    gflops_link = 2 * M * K * K * LINKS
    xb = jnp.asarray(rs.randn(M, K), jnp.bfloat16)
    wsb = [jnp.asarray(rs.randn(K, K) * 0.02, jnp.bfloat16)
           for _ in range(LINKS)]
    time_fn("gemm_chain_bf16", gemm_chain_bf16, xb, wsb, flops=gflops_link)

    xi = jnp.asarray(rs.randint(-127, 127, (M, K)), jnp.int8)
    wsi = [jnp.asarray(rs.randint(-4, 4, (K, K)), jnp.int8)
           for _ in range(LINKS)]
    time_fn("gemm_chain_int8", gemm_chain_int8, xi, wsi, flops=gflops_link)

    for name, cin, cout, h, w_ in CONVS:
        flops = 2 * N * h * w_ * cin * cout * 9 * REPS
        xb = jnp.asarray(rs.rand(N, h, w_, cin), jnp.bfloat16)
        wb = jnp.asarray(rs.randn(3, 3, cin, cout) * 0.05, jnp.bfloat16)
        time_fn(f"{name}_bf16", conv_chain_bf16(cin, cout, h, w_), xb, wb,
                flops=flops)
        xq = jnp.asarray(rs.randint(0, 127, (N, h, w_, cin)), jnp.int8)
        wq = jnp.asarray(rs.randint(-8, 8, (3, 3, cin, cout)), jnp.int8)
        time_fn(f"{name}_int8", conv_chain_int8(cin, cout, h, w_), xq, wq,
                flops=flops)


if __name__ == "__main__":
    main()
