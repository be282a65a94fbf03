"""mmqg_tpu — a TPU-native multi-modal question-generation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
``ksg14/multi-modal-qg`` pipeline (lecture videos + subtitles + labelled
question spans -> tri-modal encoder -> attention LSTM decoder -> questions),
re-designed TPU-first:

* every model is a **batched**, statically-shaped, jit-compiled function
  (the reference ran per-sample Python loops on CPU, batch_size=1 —
  reference train.py:144-175);
* LSTMs run under ``lax.scan``; attention / LSTM cells have fused Pallas
  TPU kernels (``mmqg_tpu.ops``) with XLA fallbacks;
* scaling is expressed with ``jax.sharding.Mesh`` + named-axis partition
  specs (``mmqg_tpu.parallel``) — data parallel over batch, optional tensor
  parallel over hidden/vocab dims; XLA emits the ICI collectives;
* host-side media ingest (WAV decode, staging, prefetch) lives in a small
  C++ runtime (``native/``) with pure-Python fallbacks.

Package layout:
  config.py        typed config, JSON round-trip (reference config.py:5-115)
  data/            tokenizer, vocab, GloVe, subtitles, saliency, batched dataset
  models/          encoders (text/video/audio), decoders (attn + non-attn)
  ops/             pallas kernels + XLA reference impls (attention, lstm, mel, resize)
  parallel/        mesh construction, sharding rules, pjit'd train/eval steps
  train.py         batched teacher-forced trainer (reference train.py:131-218)
  evaluate.py      batched greedy/sampling/topk/topp/beam decode (reference evaluate.py:34-127)
  checkpoint.py    best/last checkpoints + resume (reference train.py:197-214 had save-only)
  metrics.py       standard BLEU + reference-compat mode (reference train.py:115-119)
"""

__version__ = "0.1.0"

from mmqg_tpu.config import Config  # noqa: F401
