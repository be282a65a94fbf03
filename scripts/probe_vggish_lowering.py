"""Bisect which kernel constructs lower on the real TPU Mosaic compiler.

Each probe is a minimal pallas_call compiled (and run once) in isolation with
try/except, so one remote-compile run answers all questions. Keep shapes tiny
to make remote compiles fast.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, kernel, out_shape, *args, in_specs=None, out_specs=None):
    try:
        kw = {}
        if in_specs is not None:
            kw["in_specs"] = in_specs
        if out_specs is not None:
            kw["out_specs"] = out_specs
        fn = pl.pallas_call(kernel, out_shape=out_shape, **kw)
        r = np.asarray(jax.jit(fn)(*args))
        print(f"OK   {name}  out={r.shape} sum={r.sum():.3f}")
    except Exception as e:  # noqa: BLE001
        msg = str(e).replace("\n", " ")[:200]
        print(f"FAIL {name}: {type(e).__name__}: {msg}")


def main():
    print("devices:", jax.devices())
    E, H, W, C = 2, 16, 16, 64
    x = jnp.asarray(np.random.RandomState(0).randn(E, H, W, C), jnp.float32)

    # 1. 6D reshape-max pooling
    def pool6(x_ref, o_ref):
        v = x_ref[:]
        o_ref[:] = v.reshape(E, H // 2, 2, W // 2, 2, C).max(axis=(2, 4))
    run("pool_6d_reshape", pool6,
        jax.ShapeDtypeStruct((E, H // 2, W // 2, C), jnp.float32), x)

    # 2. two 5D reshape-maxes
    def pool5(x_ref, o_ref):
        v = x_ref[:]
        v = v.reshape(E, H // 2, 2, W, C).max(axis=2)
        o_ref[:] = v.reshape(E, H // 2, W // 2, 2, C).max(axis=3)
    run("pool_5d_twice", pool5,
        jax.ShapeDtypeStruct((E, H // 2, W // 2, C), jnp.float32), x)

    # 3. strided-slice max pooling
    def pools(x_ref, o_ref):
        v = x_ref[:]
        v = jnp.maximum(v[:, 0::2], v[:, 1::2])
        o_ref[:] = jnp.maximum(v[:, :, 0::2], v[:, :, 1::2])
    run("pool_strided", pools,
        jax.ShapeDtypeStruct((E, H // 2, W // 2, C), jnp.float32), x)

    # 4. pad + shifted-tap conv reshape (the _conv3x3_relu core), bf16 dot
    w = jnp.asarray(np.random.RandomState(1).randn(3, 3, C, 128), jnp.float32)

    def conv(x_ref, w_ref, o_ref):
        v = x_ref[:]
        xp = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = jnp.zeros((E * H * W, 128), jnp.float32)
        for ky in range(3):
            for kx in range(3):
                tap = xp[:, ky:ky + H, kx:kx + W, :].reshape(E * H * W, C)
                acc = acc + jnp.dot(tap.astype(jnp.bfloat16),
                                    w_ref[ky, kx].astype(jnp.bfloat16),
                                    preferred_element_type=jnp.float32)
        o_ref[:] = jnp.maximum(acc, 0.0).reshape(E, H, W, 128)
    run("conv3x3_shifted_gemm", conv,
        jax.ShapeDtypeStruct((E, H, W, 128), jnp.float32), x, w)

    # 5. conv with Cin=1 (the first layer): 4D with lane dim 1
    x1 = x[..., :1]
    w1 = w[:, :, :1, :]

    def conv1(x_ref, w_ref, o_ref):
        v = x_ref[:]
        xp = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = jnp.zeros((E * H * W, 128), jnp.float32)
        for ky in range(3):
            for kx in range(3):
                tap = xp[:, ky:ky + H, kx:kx + W, :].reshape(E * H * W, 1)
                acc = acc + jnp.dot(tap, w_ref[ky, kx],
                                    preferred_element_type=jnp.float32)
        o_ref[:] = acc.reshape(E, H, W, 128)
    run("conv_cin1", conv1,
        jax.ShapeDtypeStruct((E, H, W, 128), jnp.float32), x1, w1)

    # 6. conv1 as a 3D input (E,H,W) with channel created in-kernel
    x3 = x[..., 0]

    def conv1b(x_ref, w_ref, o_ref):
        v = x_ref[:][..., None]
        xp = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0)))
        taps = [xp[:, ky:ky + H, kx:kx + W, 0].reshape(E * H * W, 1)
                for ky in range(3) for kx in range(3)]
        tapm = jnp.concatenate(taps, axis=1)          # (EHW, 9)
        wm = w_ref[:].reshape(9, 128)
        acc = jnp.dot(tapm, wm, preferred_element_type=jnp.float32)
        o_ref[:] = acc.reshape(E, H, W, 128)
    run("conv_cin1_im2col9", conv1b,
        jax.ShapeDtypeStruct((E, H, W, 128), jnp.float32), x3, w1)


if __name__ == "__main__":
    main()
