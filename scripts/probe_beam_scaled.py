"""(1) Beam-4 decode at serving scale B=128; (2) scaled-model (hidden 1024)
trimodal train step — framework-at-larger-dims evidence."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, numpy as np
import __graft_entry__ as entry_mod
from mmqg_tpu import decode as DEC
from mmqg_tpu.config import Config
from mmqg_tpu.models import qg_model
from mmqg_tpu.train import init_train_state, make_optimizer, make_train_step

# ---- beam-4 at B=128 ----
B = 128
mc, params, state, arrays = entry_mod._flagship(batch=B, audio_seconds=32)
params = jax.device_put(params); state = jax.device_put(state)
cap = DEC.audio_bucket(mc, arrays["audio_len"])
fcap = DEC.frames_bucket(mc, arrays["frames_len"])
dev = {k: jax.device_put(v) for k, v in arrays.items()}

def run_beam():
    return DEC.beam_decode_batch(params, state, mc, dev, max_len=21,
                                 beam_size=4, use_pallas=True,
                                 audio_cap=cap, frames_cap=fcap)
np.asarray(run_beam())
N = 8
t0 = time.perf_counter()
outs = [run_beam() for _ in range(N)]
for o in outs:
    np.asarray(o)
per = (time.perf_counter() - t0) / N
print(f"beam-4 B={B}: {per*1e3:.1f} ms/batch -> {B/per:.0f} q/s/chip", flush=True)
del params, state, dev

# ---- scaled model: hidden 1024, vocab 20000, B=16 ----
from mmqg_tpu.models.video_encoder import flatten_dim_for
mc2, params2, state2, arrays2 = entry_mod._flagship(
    n_vocab=20000, batch=16, audio_seconds=32)
mc2 = mc2._replace(hidden_dim=1024, video_hidden_dim=1024)
rng_np = np.random.RandomState(0)
emb2 = rng_np.randn(20000, mc2.word_emb_dim).astype(np.float32)
cfg = Config()
opt = make_optimizer(cfg)
ts = jax.device_put(init_train_state(jax.random.PRNGKey(0), mc2, emb2, opt))
n_params = sum(x.size for x in jax.tree.leaves(ts["params"]))
print(f"scaled model params: {n_params/1e6:.1f}M", flush=True)
arrays2["target_len"] = np.maximum(arrays2["target_len"], 1)
dev2 = {k: jax.device_put(v) for k, v in arrays2.items()}
need = min(DEC.audio_examples_needed(mc2, arrays2["audio_len"]), mc2.av_max_length)
acap = DEC._bucket(max(1, need), mc2.av_max_length)
fcap2 = DEC.frames_bucket(mc2, arrays2["frames_len"])
step = make_train_step(mc2, opt, use_pallas=False, audio_cap=acap, frames_cap=fcap2)
rng = jax.random.PRNGKey(1)
ts, m = step(ts, dev2, rng)
print("scaled first loss", float(np.asarray(m["loss"])), flush=True)
n = 6
t0 = time.perf_counter()
for i in range(n):
    ts, m = step(ts, dev2, jax.random.fold_in(rng, i))
np.asarray(m["loss"])
ms = (time.perf_counter() - t0) / n * 1e3
print(f"scaled trimodal B=16 hidden=1024 V=20k: {ms:.1f} ms/step "
      f"{16/ms*1e3:.1f} samples/s", flush=True)
