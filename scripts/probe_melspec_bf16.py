"""Measure the bf16-spectrogram log-mel path (NOTES_NEXT_ROUND.md perf #3):
timing at serving scale and embedding deviation through the VGGish encoder.

Run on TPU (no env overrides). Timings sink outputs to a device scalar
(axon: block_until_ready does not block; fetching big outputs times the
tunnel)."""

import time
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from mmqg_tpu.models import audio_encoder, frontends

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
SECONDS = 32
SR = 16000
CAP = 37  # serving bucket for 32 s audio (34 examples -> eighth bucket 37)

rng = np.random.RandomState(0)
pcm = (rng.randn(B, SECONDS * SR) * 3000).astype(np.int16)
params = audio_encoder.init(jax.random.PRNGKey(0))


def make_fn(spec_dtype, sink):
    @jax.jit
    def f(pcm_dev, params_dev):
        mel = frontends.log_mel_examples(
            pcm_dev, max_examples=CAP, spec_dtype=spec_dtype)
        if sink == "mel":
            return jnp.sum(mel.astype(jnp.float32) ** 2)
        emb = audio_encoder.apply(params_dev, mel,
                                  jnp.full((B,), CAP, jnp.int32),
                                  dtype=jnp.bfloat16, int8=True)
        return jnp.sum(emb.astype(jnp.float32) ** 2), emb
    return f


def timeit(f, *args, reps=20):
    out = f(*args)
    np.asarray(jax.tree.leaves(out)[0])  # materialise = sync
    t0 = time.time()
    for _ in range(reps):
        out = f(*args)
    np.asarray(jax.tree.leaves(out)[0])
    return (time.time() - t0) / reps * 1000


pcm_dev = jnp.asarray(pcm)
params_dev = jax.tree.map(jnp.asarray, params)

for name, dt in [("f32", jnp.float32), ("bf16", jnp.bfloat16)]:
    ms_mel = timeit(make_fn(dt, "mel"), pcm_dev, params_dev)
    print(f"log-mel only  spec={name}: {ms_mel:7.2f} ms/batch{B}")

embs = {}
for name, dt in [("f32", jnp.float32), ("bf16", jnp.bfloat16)]:
    f = make_fn(dt, "emb")
    ms = timeit(f, pcm_dev, params_dev)
    _, emb = f(pcm_dev, params_dev)
    embs[name] = np.asarray(emb, np.float32)
    print(f"mel+VGGish(int8) spec={name}: {ms:7.2f} ms/batch{B}")

ref, alt = embs["f32"], embs["bf16"]
rel = np.linalg.norm(alt - ref) / (np.linalg.norm(ref) + 1e-9)
print(f"embedding rel-error bf16 vs f32 spec: {rel:.2e}")
