"""Hermetic WAV I/O + resampling.

The reference shelled out to the ``ffmpeg`` binary for audio extraction and
span clipping (reference dataset/get_audio.py:8, get_salient_audioclips.py:13)
and let the torch.hub VGGish model decode wavs (reference model/encoder.py:17).
This environment has no ffmpeg and no soundfile, so the framework owns its
audio I/O:

* RIFF/WAVE PCM16 + PCM32 + float32 reader/writer (numpy, vectorised);
* span clipping = array slicing (the reference's ``ffmpeg -ss -to -c copy``);
* polyphase-free resampling to mono 16 kHz via linear interpolation — adequate
  for mel features that are 10 ms-hop averages; a C++ fast path lives in
  ``native/`` for bulk ingest.

mp4 -> wav extraction (reference get_audio.py:6-13) requires a demuxer; we use
the ffmpeg binary when present and raise a clear error otherwise (cv2 has no
audio API). See mmqg_tpu/data/saliency.py:extract_audio.
"""

from __future__ import annotations

import struct
from pathlib import Path
from typing import Tuple

import numpy as np


def read_wav(path: Path) -> Tuple[np.ndarray, int]:
    """Read a RIFF/WAVE file -> (float32 samples in [-1,1] shaped (n, ch), rate)."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError(f"{path}: not a RIFF/WAVE file")
    pos = 12
    fmt = None
    samples = None
    while pos + 8 <= len(data):
        chunk_id = data[pos:pos + 4]
        size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        body = data[pos + 8:pos + 8 + size]
        if chunk_id == b"fmt ":
            if len(body) < 16:
                raise ValueError(f"{path}: truncated fmt chunk")
            (audio_fmt, channels, rate, _br, _ba, bits) = struct.unpack("<HHIIHH", body[:16])
            if channels < 1:
                raise ValueError(f"{path}: zero channels")
            fmt = (audio_fmt, channels, rate, bits)
        elif chunk_id == b"data":
            samples = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or samples is None:
        raise ValueError(f"{path}: missing fmt/data chunk")
    audio_fmt, channels, rate, bits = fmt
    if audio_fmt == 1 and bits == 16:
        arr = np.frombuffer(samples, dtype="<i2").astype(np.float32) / 32768.0
    elif audio_fmt == 1 and bits == 32:
        arr = np.frombuffer(samples, dtype="<i4").astype(np.float32) / 2147483648.0
    elif audio_fmt == 3 and bits == 32:
        arr = np.frombuffer(samples, dtype="<f4").astype(np.float32)
    else:
        raise ValueError(f"{path}: unsupported wav format {audio_fmt}/{bits}bit")
    n = len(arr) // channels
    return arr[: n * channels].reshape(n, channels), rate


def write_wav(path: Path, samples: np.ndarray, rate: int) -> None:
    """Write (n,) or (n,ch) samples as PCM16 WAV.

    float input is [-1,1] and scaled by 32767; int16 input is written
    bit-exact (no float round-trip — the native decoder already yields
    PCM16, and scaling it through floats would cost two full-size copies
    and a 32767/32768 LSB rescale)."""
    samples = np.asarray(samples)
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.dtype == np.int16:
        pcm = samples.astype("<i2", copy=False)
    else:
        pcm = np.clip(samples.astype(np.float32) * 32767.0,
                      -32768, 32767).astype("<i2")
    n, ch = pcm.shape
    body = pcm.tobytes()
    byte_rate = rate * ch * 2
    hdr = b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 1, ch, rate, byte_rate, ch * 2, 16)
    hdr += b"data" + struct.pack("<I", len(body))
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as f:
        f.write(hdr + body)


def to_mono(samples: np.ndarray) -> np.ndarray:
    return samples.mean(axis=1) if samples.ndim == 2 else samples


def resample_linear(x: np.ndarray, src_rate: int, dst_rate: int) -> np.ndarray:
    """Linear-interpolation resample of a mono signal."""
    if src_rate == dst_rate:
        return x
    n_out = int(round(len(x) * dst_rate / src_rate))
    t_out = np.arange(n_out, dtype=np.float64) * (src_rate / dst_rate)
    return np.interp(t_out, np.arange(len(x), dtype=np.float64), x).astype(np.float32)


def load_mono_16k(path: Path, target_rate: int = 16000) -> np.ndarray:
    samples, rate = read_wav(path)
    return resample_linear(to_mono(samples), rate, target_rate)


def clip_span(samples: np.ndarray, rate: int, start_s: float, end_s: float) -> np.ndarray:
    """Array-slicing equivalent of ``ffmpeg -ss <start> -to <end> -c copy``
    (reference dataset/get_salient_audioclips.py:13)."""
    a = max(0, int(round(start_s * rate)))
    b = min(len(samples), int(round(end_s * rate)))
    return samples[a:b]
