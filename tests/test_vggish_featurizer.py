"""VGGish featuriser + weight-port parity at REAL VGGish dims.

The reference's audio features came from the torch.hub VGGish
(reference model/encoder.py:8-19, postprocess=False): 16 kHz mono ->
25 ms/10 ms periodic-Hann STFT -> 64 mel bins 125-7500 Hz (HTK scale) ->
log(mel + 0.01) -> 96-frame examples -> VGG convnet -> ReLU'd 128-d
embeddings. Two proofs here:

1. The featuriser constants: an INDEPENDENT numpy re-derivation of the
   torchvggish ``mel_features.py`` pipeline (framing, periodic Hann,
   rfft magnitude, ``spectrogram_to_mel_matrix`` triangular weights) —
   written from the published constants, deliberately NOT importing
   ``frontends.mel_filterbank`` — must match ``frontends.log_mel_examples``.
   Round 1's oracle reused the repo's own filterbank, which could not catch
   a constants error (VERDICT.md round 1, item 3).

2. The weight port: a live torch module with the exact torchvggish topology
   and state_dict layout (``features.*``/``embeddings.*``), ported through
   ``audio_encoder.load_vggish_state_dict`` at the released checkpoint's
   real shapes (96x64 mel, 4096-wide fc, 128-d output), must produce
   identical embeddings — including the NCHW->NHWC flatten order of fc1's
   input (feature map 6x4x512) and the final ReLU.
"""

import jax.numpy as jnp
import numpy as np
import torch
from torch import nn

from mmqg_tpu.models import audio_encoder, frontends

RATE, WIN, HOP, FFT = 16000, 400, 160, 512
MEL_BINS, LO_HZ, HI_HZ, LOG_OFFSET = 64, 125.0, 7500.0, 0.01
FRAMES_PER_EX = 96


# ------------------------------------------------------------------ oracle
# Independent re-derivation of torchvggish mel_features.py. Everything below
# is written from the published algorithm, not from mmqg_tpu code.

def _oracle_hz_to_mel(hz):
    return 1127.0 * np.log(1.0 + np.asarray(hz, np.float64) / 700.0)


def _oracle_mel_matrix():
    """spectrogram_to_mel_matrix: triangular weights on FFT-bin freqs."""
    n_spec = FFT // 2 + 1
    spec_mel = _oracle_hz_to_mel(np.linspace(0.0, RATE / 2.0, n_spec))
    edges = np.linspace(_oracle_hz_to_mel(LO_HZ), _oracle_hz_to_mel(HI_HZ),
                        MEL_BINS + 2)
    w = np.zeros((n_spec, MEL_BINS))
    for i in range(MEL_BINS):
        lower = (spec_mel - edges[i]) / (edges[i + 1] - edges[i])
        upper = (edges[i + 2] - spec_mel) / (edges[i + 2] - edges[i + 1])
        w[:, i] = np.maximum(0.0, np.minimum(lower, upper))
    w[0, :] = 0.0  # DC bin carries no mel energy
    return w


def _oracle_log_mel(pcm_f32: np.ndarray) -> np.ndarray:
    """waveform -> (n_frames, 64) log-mel, torchvggish pipeline order."""
    n_frames = 1 + (len(pcm_f32) - WIN) // HOP
    idx = np.arange(WIN)[None, :] + HOP * np.arange(n_frames)[:, None]
    sig = pcm_f32[idx]
    hann = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(WIN) / WIN)  # periodic
    mag = np.abs(np.fft.rfft(sig * hann, FFT))
    return np.log(mag @ _oracle_mel_matrix() + LOG_OFFSET)


def test_log_mel_matches_independent_oracle():
    rng = np.random.RandomState(0)
    seconds = 2.5
    pcm = (rng.randn(int(RATE * seconds)) * 0.1).astype(np.float32)
    max_ex = 2  # 2.5 s -> 249 frames -> 2 whole 96-frame examples

    ours = np.asarray(frontends.log_mel_examples(
        jnp.asarray(pcm)[None], sample_rate=RATE, window=WIN, hop=HOP,
        mel_bins=MEL_BINS, lower_hz=LO_HZ, upper_hz=HI_HZ,
        log_offset=LOG_OFFSET, frames_per_example=FRAMES_PER_EX,
        max_examples=max_ex, dtype=jnp.float32))[0]
    ref = _oracle_log_mel(pcm)[:max_ex * FRAMES_PER_EX].reshape(
        max_ex, FRAMES_PER_EX, MEL_BINS)
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_int16_pcm_scaling():
    """PCM16 wire format decodes as x/32768 before the STFT."""
    rng = np.random.RandomState(1)
    pcm16 = (rng.randn(RATE) * 3000).astype(np.int16)
    a = np.asarray(frontends.log_mel_examples(
        jnp.asarray(pcm16)[None], max_examples=1, dtype=jnp.float32))
    b = np.asarray(frontends.log_mel_examples(
        jnp.asarray(pcm16.astype(np.float32) / 32768.0)[None],
        max_examples=1, dtype=jnp.float32))
    np.testing.assert_allclose(a, b, atol=1e-6)


# ------------------------------------------------------------- weight port

class TorchVGGishFull(nn.Module):
    """Exact torchvggish VGG topology + state_dict layout at released-
    checkpoint shapes (12288 -> 4096 -> 4096 -> 128, ReLU throughout)."""

    def __init__(self):
        super().__init__()
        layers, c_in = [], 1
        for v in (64, "M", 128, "M", 256, 256, "M", 512, 512, "M"):
            if v == "M":
                layers.append(nn.MaxPool2d(2, 2))
            else:
                layers += [nn.Conv2d(c_in, v, 3, padding=1), nn.ReLU(True)]
                c_in = v
        self.features = nn.Sequential(*layers)
        self.embeddings = nn.Sequential(
            nn.Linear(512 * 6 * 4, 4096), nn.ReLU(True),
            nn.Linear(4096, 4096), nn.ReLU(True),
            nn.Linear(4096, 128), nn.ReLU(True))

    def forward(self, x):                      # (N, 1, 96, 64)
        x = self.features(x)
        x = x.permute(0, 2, 3, 1).contiguous().view(x.size(0), -1)
        return self.embeddings(x)


def test_vggish_weight_port_embedding_parity():
    torch.manual_seed(0)
    m = TorchVGGishFull().eval()
    sd = {k: v.numpy() for k, v in m.state_dict().items()}

    import jax
    params = audio_encoder.init(jax.random.PRNGKey(0), mel_frames=96,
                                mel_bins=64, embedding_dim=128)
    ported = audio_encoder.load_vggish_state_dict(params, sd)

    # fixture audio -> shared featuriser -> both conv stacks
    rng = np.random.RandomState(2)
    pcm = (rng.randn(RATE * 2) * 0.05).astype(np.float32)
    mel = np.asarray(frontends.log_mel_examples(
        jnp.asarray(pcm)[None], max_examples=2, dtype=jnp.float32))[0]

    ours = np.asarray(audio_encoder.embed_examples(
        ported, jnp.asarray(mel), dtype=jnp.float32))
    with torch.no_grad():
        ref = m(torch.tensor(mel).unsqueeze(1)).numpy()
    assert ref.min() >= 0.0            # ReLU'd head — the hub contract
    np.testing.assert_allclose(ours, ref, atol=2e-4)
