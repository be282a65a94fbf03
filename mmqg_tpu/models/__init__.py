"""Model zoo: tri-modal encoders + attention/non-attention decoders.

All models are pure functions over explicit parameter pytrees (nested dicts of
``jnp`` arrays) — no module framework. That keeps every array visible to
``jax.sharding`` partition rules (mmqg_tpu.parallel) and makes the whole train
step one jit-compiled function.

Members (reference parity map):
  layers.py          LSTM (scan + step), dense, conv, batchnorm, initialisers
  text_encoder.py    3-layer LSTM over GloVe embeddings   (reference model/encoder.py:80-111)
  video_encoder.py   4-conv CNN -> frame LSTM             (reference model/encoder.py:31-78)
                     + 3D-resnet-style alternative        (reference model/encoder.py:21-29)
  audio_encoder.py   VGGish-style convnet over log-mel    (reference model/encoder.py:8-19)
  frontends.py       on-device log-mel + frame transforms (reference utils/custom_transforms.py)
  decoder.py         tri-modal attention decoder          (reference model/decoder.py:49-125)
                     + non-attention decoder              (reference model/decoder.py:7-47)
  qg_model.py        assembled flagship model: init/encode/decode/loss
"""
