"""Probe 3: space-to-depth reformulation of the VGGish conv stack.

probe_int8_conv2.py showed conv MXU rate is set by Cin (34/59/141 Tops/s at
Cin=64/128/256; int8 is rate-identical to bf16 on this compiler). A 3x3
stride-1 conv on a 2x-space-to-depth'd input is exactly a 2x2 conv with
4*Cin in / 4*Cout out channels (16/9 the MACs, all-K>=256 shapes), and the
2x2 max-pools become channel-group maxes (no spatial op at all).

Measures (bf16, N=2048 examples):
  conv1 as-is                is the Cin=1 layer a real cost?
  conv1_im2col9              (M,9)@(9,64) formulation of conv1
  per-layer s2d equivalents  2x2 convs at the coarse shapes
  stack_base vs stack_s2d    full conv1..conv4b+pools, both layouts
Random weights: timing only; the exact weight rearrangement is implemented
with parity tests in ops/s2d_conv.py if this probe wins.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

N = 2048


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
        extra = f"  {flops / dt / 1e12:7.1f} Tops/s" if flops else ""
        print(f"{name:26s} {dt * 1000:8.2f} ms{extra}", flush=True)
        return dt
    except Exception as e:  # noqa: BLE001
        print(f"{name:26s} FAIL {type(e).__name__}: {str(e)[:140]}", flush=True)
        return None


def conv(x, w, pad="SAME"):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), pad, dimension_numbers=("NHWC", "HWIO", "NHWC"))


def s2d(x):
    n, h, w, c = x.shape
    return x.reshape(n, h // 2, 2, w // 2, 2, c).transpose(
        0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)


def d2s(x):
    n, h, w, c = x.shape
    return x.reshape(n, h, w, 2, 2, c // 4).transpose(
        0, 1, 3, 2, 4, 5).reshape(n, 2 * h, 2 * w, c // 4)


def group_max(x):
    """2x2 fine max-pool when channels are (di, dj, c)-ordered."""
    n, h, w, c = x.shape
    return x.reshape(n, h, w, 4, c // 4).max(axis=3)


def pool(x):
    n, h, w, c = x.shape
    return x.reshape(n, h // 2, 2, w // 2, 2, c).max(axis=(2, 4))


def main():
    print("backend:", jax.default_backend(), flush=True)
    rs = np.random.RandomState(0)

    def mk(shape, scale=0.05):
        return jnp.asarray(rs.randn(*shape) * scale, jnp.bfloat16)

    # ---- conv1 in isolation (chained 5x via channel-mean back to 1ch)
    x1 = mk((N, 96, 64, 1), 1.0)
    w1 = mk((3, 3, 1, 64))
    fl1 = 2 * N * 96 * 64 * 1 * 64 * 9 * 5

    def conv1_chain(x, w):
        for _ in range(5):
            y = conv(x, w)
            x = (y.mean(-1, keepdims=True) * 0.5).astype(jnp.bfloat16)
        return jnp.mean(x.astype(jnp.float32))
    time_fn("conv1_as_is", conv1_chain, x1, w1, flops=fl1)

    w1g = mk((9, 64))

    def conv1_im2col(x, w):
        for _ in range(5):
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
            taps = jnp.concatenate(
                [xp[:, dh:dh + 96, dw:dw + 64, :]
                 for dh in range(3) for dw in range(3)], axis=-1)
            y = jnp.dot(taps.reshape(-1, 9), w,
                        preferred_element_type=jnp.float32)
            y = y.reshape(N, 96, 64, 64)
            x = (y.mean(-1, keepdims=True) * 0.5).astype(jnp.bfloat16)
        return jnp.mean(x.astype(jnp.float32))
    time_fn("conv1_im2col9", conv1_im2col, x1, w1g, flops=fl1)

    # conv1 on s2d(2) input: 2x2 4->256
    x1c = mk((N, 48, 32, 4), 1.0)
    w1c = mk((2, 2, 4, 256))
    fl1c = 2 * N * 48 * 32 * 4 * 256 * 4 * 5

    def conv1_s2d(x, w):
        for _ in range(5):
            y = conv(x, w)
            x = (y.reshape(N, 48, 32, 4, 64).mean(-1) * 0.5
                 ).astype(jnp.bfloat16)
        return jnp.mean(x.astype(jnp.float32))
    time_fn("conv1_s2d_2x2_4to256", conv1_s2d, x1c, w1c, flops=fl1c)

    # ---- per-layer s2d equivalents (2x2 convs, chained, channel-fold)
    for name, h, w_, cin, cout in (
            ("s2d_conv2_24x16_256to512", 24, 16, 256, 512),
            ("s2d_conv3a_12x8_512to1024", 12, 8, 512, 1024),
            ("s2d_conv4a_6x4_1024to2048", 6, 4, 1024, 2048)):
        x = mk((N, h, w_, cin), 1.0)
        w = mk((2, 2, cin, cout))
        fl = 2 * N * h * w_ * cin * cout * 4 * 5

        def ch(x, w, cin=cin, cout=cout):
            for _ in range(5):
                y = conv(x, w)
                x = (y.reshape(y.shape[:3] + (cin, cout // cin)).mean(-1)
                     * 0.1).astype(jnp.bfloat16)
            return jnp.mean(x.astype(jnp.float32))
        time_fn(name, ch, x, w, flops=fl)

    # ---- s2d reshuffle alone (the inter-layer boundary cost)
    xb = mk((N, 48, 32, 64), 1.0)
    time_fn("s2d_reshuffle_48x32x64", lambda x: jnp.mean(
        s2d(x).astype(jnp.float32)), xb)

    # ---- full stacks
    ws_base = {
        "c1": w1, "c2": mk((3, 3, 64, 128)), "c3a": mk((3, 3, 128, 256)),
        "c3b": mk((3, 3, 256, 256)), "c4a": mk((3, 3, 256, 512)),
        "c4b": mk((3, 3, 512, 512)),
    }
    mel = mk((N, 96, 64, 1), 1.0)
    macs = N * 9 * (96 * 64 * 64 + 48 * 32 * 64 * 128 + 24 * 16 * 128 * 256
                    + 24 * 16 * 256 * 256 + 12 * 8 * 256 * 512
                    + 12 * 8 * 512 * 512)

    def stack_base(x, ws):
        x = jax.nn.relu(conv(x, ws["c1"])).astype(jnp.bfloat16)
        x = pool(x)
        x = jax.nn.relu(conv(x, ws["c2"])).astype(jnp.bfloat16)
        x = pool(x)
        x = jax.nn.relu(conv(x, ws["c3a"])).astype(jnp.bfloat16)
        x = jax.nn.relu(conv(x, ws["c3b"])).astype(jnp.bfloat16)
        x = pool(x)
        x = jax.nn.relu(conv(x, ws["c4a"])).astype(jnp.bfloat16)
        x = jax.nn.relu(conv(x, ws["c4b"])).astype(jnp.bfloat16)
        x = pool(x)
        return jnp.mean(x.astype(jnp.float32))
    time_fn("stack_base", stack_base, mel, ws_base, flops=2 * macs)

    ws_s2d = {
        "c1": mk((2, 2, 4, 256)), "c2": mk((2, 2, 256, 512)),
        "c3a": mk((2, 2, 512, 1024)), "c3b": mk((3, 3, 256, 256)),
        "c4a": mk((2, 2, 1024, 2048)), "c4b": mk((3, 3, 512, 512)),
    }
    macs_s2d = N * (48 * 32 * 4 * 4 * 256 + 24 * 16 * 4 * 256 * 512
                    + 12 * 8 * 4 * 512 * 1024 + 24 * 16 * 9 * 256 * 256
                    + 6 * 4 * 4 * 1024 * 2048 + 12 * 8 * 9 * 512 * 512)

    def stack_s2d(x, ws):
        x = s2d(x)                                     # (48,32,4)
        x = jax.nn.relu(conv(x, ws["c1"])).astype(jnp.bfloat16)
        x = group_max(x)                               # pool1 -> (48,32,64)
        x = s2d(x)                                     # (24,16,256)
        x = jax.nn.relu(conv(x, ws["c2"])).astype(jnp.bfloat16)
        x = group_max(x)                               # pool2 -> (24,16,128)
        x = s2d(x)                                     # (12,8,512)
        x = jax.nn.relu(conv(x, ws["c3a"])).astype(jnp.bfloat16)
        x = d2s(x)                                     # (24,16,256)
        x = jax.nn.relu(conv(x, ws["c3b"])).astype(jnp.bfloat16)
        x = pool(x)                                    # (12,8,256)
        x = s2d(x)                                     # (6,4,1024)
        x = jax.nn.relu(conv(x, ws["c4a"])).astype(jnp.bfloat16)
        x = d2s(x)                                     # (12,8,512)
        x = jax.nn.relu(conv(x, ws["c4b"])).astype(jnp.bfloat16)
        x = pool(x)                                    # (6,4,512)
        return jnp.mean(x.astype(jnp.float32))
    time_fn("stack_s2d", stack_s2d, mel, ws_s2d, flops=2 * macs_s2d)
    print(f"base MACs {macs/1e9:.0f} G, s2d MACs {macs_s2d/1e9:.0f} G "
          f"({macs_s2d/macs:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
