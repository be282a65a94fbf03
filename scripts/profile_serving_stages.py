"""Per-stage timing of the serving pipeline at bench shapes (B=128).

Each stage is timed as its own jitted program with queued iterations
(matching bench.py's regime) to find where the batch's wall-clock goes.
"""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

import __graft_entry__ as entry_mod
from mmqg_tpu import decode as DEC
from mmqg_tpu.models import audio_encoder, frontends, qg_model


@jax.jit
def _sink(t):
    """Reduce any output pytree to one scalar on device: materialising the
    full output of a big stage would time the ~45 MB/s D2H tunnel, not the
    stage."""
    return sum(x.ravel()[0].astype(jnp.float32) for x in jax.tree.leaves(t))


def timeit(fn, *args, n=8, warmup=2):
    for _ in range(warmup):
        np.asarray(_sink(fn(*args)))
    t0 = time.perf_counter()
    outs = [_sink(fn(*args)) for _ in range(n)]
    for o in outs:
        np.asarray(o)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    print("devices:", jax.devices())
    B = 128
    mc, params, state, arrays = entry_mod._flagship(batch=B, audio_seconds=32)
    params = jax.device_put(params)
    state = jax.device_put(state)
    cap = DEC.audio_bucket(mc, arrays["audio_len"])
    fcap = DEC.frames_bucket(mc, arrays["frames_len"])
    dev = {k: jax.device_put(v) for k, v in arrays.items()}
    rng = jax.random.PRNGKey(0)
    print(f"B={B} audio_cap={cap} frames_cap={fcap} "
          f"mel N={B * cap} examples")

    # 1. log-mel frontend alone
    @partial(jax.jit, static_argnames=())
    def mel_fn(pcm):
        return frontends.log_mel_examples(
            pcm, sample_rate=mc.sample_rate, window=mc.stft_window,
            hop=mc.stft_hop, mel_bins=mc.mel_bins,
            frames_per_example=mc.mel_frames, max_examples=cap,
            dtype=jnp.bfloat16)
    ms = timeit(mel_fn, dev["audio_pcm"])
    print(f"log_mel                 {ms:8.1f} ms")
    mel = jax.device_put(np.asarray(mel_fn(dev["audio_pcm"])))

    # 2. VGGish (XLA) on the real mel
    @jax.jit
    def aud_fn(p, m, ln):
        return audio_encoder.apply(p["audio_enc"], m, ln, dtype=jnp.bfloat16)
    audio_len = jnp.maximum(frontends.audio_num_examples(
        dev["audio_len"], sample_rate=mc.sample_rate, hop=mc.stft_hop,
        window=mc.stft_window, frames_per_example=mc.mel_frames,
        max_examples=cap), 1)
    ms = timeit(aud_fn, params, mel, audio_len)
    print(f"vggish apply (XLA)      {ms:8.1f} ms")

    # 3. full encode
    def enc_fn():
        return DEC.encode_jit(params, state, mc, dev, True, cap, fcap)
    ms = timeit(enc_fn)
    print(f"encode_jit (full)       {ms:8.1f} ms")
    mem, dec_state = enc_fn()
    mem = jax.tree.map(jax.device_put, mem)

    # 4. decode from memories
    def dec_fn():
        return DEC.decode_from_memories(params, mem, dec_state, rng,
                                        strategy="greedy", max_len=21,
                                        use_pallas=True, dec_kind=mc.decoder)
    ms = timeit(dec_fn)
    print(f"decode_from_memories    {ms:8.1f} ms")

    # 5. whole pipeline (reference point)
    def full():
        return DEC.decode_batch(params, state, mc, dev, rng,
                                strategy="greedy", max_len=21,
                                use_pallas=True, audio_cap=cap,
                                frames_cap=fcap)
    ms = timeit(full)
    print(f"decode_batch (e2e)      {ms:8.1f} ms")


if __name__ == "__main__":
    main()
