"""Measure the R(2+1)D-18 video backbone (video_encoder="resnet") on TPU at
reference dims, next to the conv-LSTM main path.

Serving: encode-only throughput for the video tower at B and full 101-frame
112x112 clips (the backbone is the only thing that changed; decode/text are
identical between backbones). Training: one full text_video train step.

Measurement discipline per PERF.md: outputs sunk to a scalar on device,
materialised with np.asarray (block_until_ready is a no-op on the axon
backend), params passed as jit args, timings exclude the compile call.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from mmqg_tpu.models import qg_model, video_encoder, video_resnet


def sink(fn):
    @jax.jit
    def wrapped(*a):
        out = fn(*a)
        return jax.tree.map(lambda x: jnp.sum(x.astype(jnp.float32)),
                            out)
    return wrapped


def timeit(fn, *args, iters=5):
    np.asarray(fn(*args))                       # compile + warm
    t0 = time.monotonic()
    for _ in range(iters):
        r = fn(*args)
    np.asarray(r)
    return (time.monotonic() - t0) / iters


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    T, S = 101, 112
    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.randint(0, 256, (B, T, S, S, 3), np.uint8))
    frames_len = jnp.full((B,), T, jnp.int32)

    # --- serving encode: conv-LSTM main path (fold-into-conv1 fast path)
    vp, vs = video_encoder.init(jax.random.PRNGKey(0), hidden_dim=512,
                                flatten_dim=1000)
    def conv_lstm(vp, vs, f, fl):
        out, _ = video_encoder.apply(vp, vs, f, fl, train=False,
                                     normalization=((0.43216, 0.394666, 0.37645),
                                                    (0.22803, 0.22145, 0.216989)),
                                     use_pallas=False, dtype=jnp.bfloat16)
        return out
    t_lstm = timeit(sink(conv_lstm), vp, vs, frames, frames_len)

    # --- serving encode: R(2+1)D-18 temporal memory
    rp, rs = video_resnet.init(jax.random.PRNGKey(1))
    from mmqg_tpu.models import frontends
    def resnet(rp, rs, f, fl):
        x = frontends.prepare_frames(f, size=S)
        mask = (jnp.arange(T)[None, :] < fl[:, None])
        x = x * mask[:, :, None, None, None].astype(x.dtype)
        out, _ = video_resnet.apply_temporal(rp, rs, x, train=False,
                                             dtype=jnp.bfloat16)
        return out
    t_res = timeit(sink(resnet), rp, rs, frames, frames_len)

    print(f"B={B} conv_lstm encode {t_lstm*1e3:.1f} ms/batch "
          f"({B/t_lstm:.0f} clips/s)  "
          f"r2plus1d encode {t_res*1e3:.1f} ms/batch ({B/t_res:.0f} clips/s) "
          f"ratio {t_res/t_lstm:.1f}x", flush=True)


if __name__ == "__main__":
    main()
