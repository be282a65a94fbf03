"""Bisect the VGGish kernel compile crash: run each stage / prefix of the
real kernels at real shapes in isolation on the TPU."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mmqg_tpu.models import audio_encoder
from mmqg_tpu.ops import vggish_pallas as V

E = V.E_TILE  # 8


def run(name, fn, *args):
    try:
        r = np.asarray(jax.jit(fn)(*args))
        print(f"OK   {name}  out={r.shape} mean={r.mean():.4f}")
    except Exception as e:  # noqa: BLE001
        print(f"FAIL {name}: {type(e).__name__}: "
              f"{str(e).replace(chr(10), ' ')[:160]}")


def kernel_a_prefix(mel_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                    w4_ref, b4_ref, out_ref, *, dtype, sub, depth):
    for s in range(E // sub):
        x = mel_ref[s * sub:(s + 1) * sub]
        x = V._conv3x3_relu_cin1(x, w1_ref[:], b1_ref[0], dtype)
        x = V._pool2(x)
        if depth >= 2:
            x = V._conv3x3_relu(x, w2_ref[:], b2_ref[0], dtype)
            x = V._pool2(x)
        if depth >= 3:
            x = V._conv3x3_relu(x, w3_ref[:], b3_ref[0], dtype)
        if depth >= 4:
            x = V._conv3x3_relu(x, w4_ref[:], b4_ref[0], dtype)
            x = V._pool2(x)
        out_ref[s * sub:(s + 1) * sub] = (
            x.reshape(sub, -1).astype(out_ref.dtype))


def main():
    print("devices:", jax.devices())
    params = audio_encoder.init(jax.random.PRNGKey(0))
    convs = params["convs"]
    mel = jnp.asarray(np.random.RandomState(0).randn(E, 96, 64), jnp.float32)
    dtype = jnp.bfloat16

    shapes = {1: (48, 32, 64), 2: (24, 16, 128), 3: (24, 16, 256),
              4: (12, 8, 256)}
    for depth in (1, 2, 3, 4):
        for sub in ((1,) if depth < 4 else (1, 2)):
            h, w, c = shapes[depth]
            a_args, a_specs = V._weight_args_specs(convs, 0, 4, dtype)
            flat = h * w * c
            fn = pl.pallas_call(
                functools.partial(kernel_a_prefix, dtype=dtype, sub=sub,
                                  depth=depth),
                grid=(1,),
                in_specs=[pl.BlockSpec((E, 96, 64), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM)] + a_specs,
                out_specs=pl.BlockSpec((E, flat), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((E, flat), dtype),
            )
            run(f"kernelA depth={depth} sub={sub}",
                lambda m, *wa: fn(m, *wa), mel.astype(dtype), *a_args)

    # kernel B alone at real shapes
    mid = jnp.asarray(np.random.RandomState(1).randn(E, 12, 8, 256) * 0.1,
                      dtype)
    for sub_b in (4, 8):
        b_args, b_specs = V._weight_args_specs(convs, 4, 6, dtype)
        fnb = pl.pallas_call(
            functools.partial(V._kernel_b, dtype=dtype, sub=sub_b),
            grid=(1,),
            in_specs=[pl.BlockSpec((E, 12, 8, 256), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM)] + b_specs,
            out_specs=pl.BlockSpec((E, 6 * 4 * 512), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((E, 6 * 4 * 512), jnp.float32),
        )
        run(f"kernelB sub={sub_b}", lambda m, *wa: fnb(m, *wa), mid, *b_args)


if __name__ == "__main__":
    main()
