"""ctypes bindings for the C++ host-ingest runtime (native/mmqg_host.cpp).

Builds the shared library on first use (g++ is in the image; pybind11 is
not, hence the C ABI + ctypes). Every entry point has a pure-Python fallback
so the framework works without a toolchain — the native path is the
production ingest (threaded batch packing overlapping TPU compute).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np

_REPO = Path(__file__).resolve().parents[2]
_NATIVE_DIR = _REPO / "native"
_LIB_PATH = _NATIVE_DIR / "libmmqg_host.so"
_lib = None
_lib_tried = False
# One lock for both lazy build+load paths: the prep thread pools hit
# get_lib/get_media_lib concurrently on first use, and without the lock a
# second thread sees _*_tried=True mid-build and silently degrades to the
# fallback path (or two `make`s race on the same .so).
_load_lock = threading.Lock()


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                       capture_output=True, timeout=120)
        return _LIB_PATH.exists()
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    with _load_lock:
        return _get_lib_locked()


def _get_lib_locked() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:  # built while we waited on the lock
        return _lib
    _lib_tried = True
    if not _LIB_PATH.exists() and not _build():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    lib.mmqg_load_wav_mono.restype = ctypes.c_long
    lib.mmqg_load_wav_mono.argtypes = [
        ctypes.c_char_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int16), ctypes.c_long]
    lib.mmqg_load_frames.restype = ctypes.c_long
    lib.mmqg_load_frames.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.mmqg_pack_submit.restype = ctypes.c_void_p
    lib.mmqg_pack_submit.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int16), ctypes.c_long, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int]
    lib.mmqg_pack_wait.restype = ctypes.c_int
    lib.mmqg_pack_wait.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


# --------------------------------------------------------------- media lib
# Separate shared object (native/mmqg_media.cpp): container demux + audio
# decode via the SYSTEM libav* libraries — the in-process replacement for the
# reference's ffmpeg-binary contract (reference dataset/get_audio.py:6-13).
# Built/loaded independently of libmmqg_host.so because it needs the libav
# dev packages; callers degrade to the ffmpeg binary when it is unavailable.

_MEDIA_LIB_PATH = _NATIVE_DIR / "libmmqg_media.so"
_media_lib = None
_media_tried = False


def get_media_lib() -> Optional[ctypes.CDLL]:
    global _media_lib, _media_tried
    if _media_lib is not None or _media_tried:
        return _media_lib
    with _load_lock:
        return _get_media_lib_locked()


def _get_media_lib_locked() -> Optional[ctypes.CDLL]:
    global _media_lib, _media_tried
    if _media_lib is not None or _media_tried:
        return _media_lib
    _media_tried = True
    src = _NATIVE_DIR / "mmqg_media.cpp"
    makefile = _NATIVE_DIR / "Makefile"
    # staleness keys on the source AND the Makefile: flag/rule changes must
    # also trigger a rebuild (ADVICE r4)
    newest_src = max((p.stat().st_mtime for p in (src, makefile)
                      if p.exists()), default=0.0)
    stale = (_MEDIA_LIB_PATH.exists()
             and newest_src > _MEDIA_LIB_PATH.stat().st_mtime)
    if not _MEDIA_LIB_PATH.exists() or stale:
        try:
            subprocess.run(["make", "-C", str(_NATIVE_DIR), "media"],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            if not _MEDIA_LIB_PATH.exists():
                return None
            # stale-but-loadable is still usable (hasattr guards below skip
            # symbols the old build lacks) — but say so, or a failed rebuild
            # silently serves old native code
            import warnings
            warnings.warn(
                "native media lib rebuild failed; using the STALE "
                f"{_MEDIA_LIB_PATH.name} (run `make -C native media` to see "
                "the compile error)", RuntimeWarning)
        if not _MEDIA_LIB_PATH.exists():
            return None
    try:
        lib = ctypes.CDLL(str(_MEDIA_LIB_PATH))
    except OSError:
        return None
    lib.mmqg_media_duration.restype = ctypes.c_double
    lib.mmqg_media_duration.argtypes = [ctypes.c_char_p]
    lib.mmqg_decode_audio.restype = ctypes.c_long
    lib.mmqg_decode_audio.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_double, ctypes.c_double,
        ctypes.POINTER(ctypes.c_int16), ctypes.c_long]
    if hasattr(lib, "mmqg_decode_audio_spans"):  # absent in stale builds
        lib.mmqg_decode_audio_spans.restype = ctypes.c_long
        lib.mmqg_decode_audio_spans.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_long, ctypes.POINTER(ctypes.c_int16),
            ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_long)]
    lib.mmqg_media_video_info.restype = ctypes.c_long
    lib.mmqg_media_video_info.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_long)]
    lib.mmqg_decode_frames_idx.restype = ctypes.c_long
    lib.mmqg_decode_frames_idx.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_long), ctypes.c_long,
        ctypes.c_int, ctypes.c_int, ctypes.c_double,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double)]
    lib.mmqg_decode_frames_idx2.restype = ctypes.c_long
    lib.mmqg_decode_frames_idx2.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_long), ctypes.c_long,
        ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double)]
    lib.mmqg_write_test_tone_mp4.restype = ctypes.c_long
    lib.mmqg_write_test_tone_mp4.argtypes = [
        ctypes.c_char_p, ctypes.c_double, ctypes.c_int]
    lib.mmqg_write_test_av_mp4.restype = ctypes.c_long
    lib.mmqg_write_test_av_mp4.argtypes = [
        ctypes.c_char_p, ctypes.c_double, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int]
    _media_lib = lib
    return _media_lib


def media_available() -> bool:
    return get_media_lib() is not None


def media_duration(path) -> Optional[float]:
    """Container duration in seconds; None if lib unavailable / unreadable."""
    lib = get_media_lib()
    if lib is None:
        return None
    d = lib.mmqg_media_duration(str(path).encode())
    return None if d < 0 else float(d)


def decode_audio(path, target_rate: int, *, channels: int = 1,
                 start: float = 0.0, end: Optional[float] = None,
                 max_seconds: Optional[float] = None) -> Optional[np.ndarray]:
    """First audio stream of any container -> int16 PCM at ``target_rate``.

    Returns shape (n,) for mono or (n, channels) interleaved-deinterleaved;
    None when the native media lib is unavailable or the file can't be
    decoded (caller falls back to the ffmpeg binary). Raises ValueError for
    a readable file WITHOUT an audio stream — that is a caller error, not a
    missing-capability condition.
    """
    lib = get_media_lib()
    if lib is None:
        return None
    if max_seconds is None:
        if end is not None:
            max_seconds = max(end - start, 0.0)
        else:
            dur = media_duration(path)
            if dur is None:
                return None
            max_seconds = max(dur - start, 0.0)
    # +1 s slack: codec priming/padding can run past the nominal duration
    max_frames = int(max_seconds * target_rate) + target_rate
    out = np.zeros((max_frames * channels,), np.int16)
    n = lib.mmqg_decode_audio(
        str(path).encode(), target_rate, channels,
        float(start), float(end) if end is not None else 0.0,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), max_frames)
    if n == -2:
        raise ValueError(f"{path}: no audio stream")
    if n < 0:
        return None
    pcm = out[: n * channels]
    return pcm if channels == 1 else pcm.reshape(-1, channels)


def decode_audio_spans(path, target_rate: int,
                       spans: Sequence, *,
                       channels: int = 1) -> Optional[List[np.ndarray]]:
    """Decode many [start, end) spans of one file's audio with a SINGLE
    demux+decoder open (native mmqg_decode_audio_spans). Per-span results
    are byte-identical to individual ``decode_audio`` calls — each span
    seeks and flushes — but the ~1.3 ms open cost is paid once per file
    instead of once per span (PERF.md "Host-prep leg profile": the per-span
    open was the top host cost at corpus density).

    ``spans``: (start_s, end_s) pairs; end_s may be None for to-EOF.
    Returns a list of int16 arrays (shape (n,) mono / (n, channels)
    interleaved) or None when the lib/symbol is unavailable or any span
    fails (caller falls back to per-span or ffmpeg paths). Raises
    ValueError for a readable file WITHOUT an audio stream."""
    lib = get_media_lib()
    if lib is None or not hasattr(lib, "mmqg_decode_audio_spans"):
        return None
    spans = list(spans)
    if not spans:
        return []
    dur = None
    max_frames = []
    for start, end in spans:
        if end is None:
            if dur is None:
                dur = media_duration(path)
                if dur is None:
                    return None
            seconds = max(dur - start, 0.0)
        else:
            seconds = max(end - start, 0.0)
        # +1 s slack: codec priming/padding can run past the nominal span
        max_frames.append(int(seconds * target_rate) + target_rate)
    n = len(spans)
    starts = np.array([s for s, _ in spans], np.float64)
    ends = np.array([(e if e is not None else 0.0) for _, e in spans],
                    np.float64)
    caps = np.array(max_frames, np.int64)
    offsets = np.concatenate(([0], np.cumsum(caps)[:-1]))
    written = np.zeros(n, np.int64)
    out = np.zeros((int(caps.sum()) * channels,), np.int16)
    rc = lib.mmqg_decode_audio_spans(
        str(path).encode(), target_rate, channels,
        starts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ends.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        caps.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        written.ctypes.data_as(ctypes.POINTER(ctypes.c_long)))
    if rc == -2:
        raise ValueError(f"{path}: no audio stream")
    if rc != 0:
        return None
    result = []
    for i in range(n):
        lo = int(offsets[i]) * channels
        pcm = out[lo: lo + int(written[i]) * channels].copy()
        result.append(pcm if channels == 1 else pcm.reshape(-1, channels))
    return result


def video_info(path) -> Optional[dict]:
    """Video stream metadata: {fps, duration, n_frames, n_frames_exact,
    width, height}.

    ``n_frames`` is the container's recorded frame count when present
    (``n_frames_exact`` True), else an estimate from duration*fps
    (``n_frames_exact`` False — callers must not treat it as a hard bound:
    the estimate can undercount by a frame or two when the container
    duration covers the audio tail). None when the media lib is unavailable
    or the file is unreadable; ValueError when the file is readable but has
    no video stream."""
    lib = get_media_lib()
    if lib is None:
        return None
    fps = ctypes.c_double()
    dur = ctypes.c_double()
    nf = ctypes.c_long()
    w = ctypes.c_long()
    h = ctypes.c_long()
    rc = lib.mmqg_media_video_info(str(path).encode(), ctypes.byref(fps),
                                   ctypes.byref(dur), ctypes.byref(nf),
                                   ctypes.byref(w), ctypes.byref(h))
    if rc == -2:
        raise ValueError(f"{path}: no video stream")
    if rc != 0:
        return None
    exact = nf.value > 0
    n_frames = nf.value if exact else int(round(dur.value * fps.value))
    return {"fps": fps.value, "duration": dur.value, "n_frames": n_frames,
            "n_frames_exact": exact, "width": w.value, "height": h.value}


def decode_frames(path, indices, size: int, *,
                  seek_ahead_s: float = 0.0, skip: Optional[bool] = None,
                  legs: Optional[dict] = None):
    """Video frames by display index (any order, unique) resized to
    ``size``x``size`` BGR uint8 — the cv2 salient-frame byte layout.

    Seeks to the keyframe at/before each target instead of decoding the
    whole file (native/mmqg_media.cpp mmqg_decode_frames_idx2) — the
    prep-path win for sparse question spans in long videos. Index→pts
    mapping is exact integer tick arithmetic learned from the first two
    frames, immune to the container's skewed avg_frame_rate.

    ``skip`` (default on; ``MMQG_FRAME_SKIP=0`` disables globally) lets the
    DECODER skip reconstructing frames between targets: adaptive
    NONKEY→NONREF→none with per-file sticky downgrade when a target itself
    would be skipped. Emitted bytes are identical in every mode — skipped
    frames are never emitted and never referenced by emitted ones (see
    mmqg_media.cpp). ``legs``: optional dict that receives the per-stage
    wall-clock breakdown {open_s, seek_s, decode_s, sws_s}.

    Returns (frames, found, pts_s, tick_s): frames uint8 (n, size, size, 3),
    found a bool mask (False where the index had no frame: past EOF, or a
    VFR stream off the CFR grid — those rows are zeros), pts_s each frame's
    timestamp in seconds relative to the first frame, and tick_s the frame
    interval in seconds. None when the media lib is unavailable or the file
    is unreadable; ValueError when it has no video stream."""
    lib = get_media_lib()
    if lib is None:
        return None
    if skip is None:
        skip = os.environ.get("MMQG_FRAME_SKIP", "1") != "0"
    idx = np.asarray(indices, np.int64)
    order = np.argsort(idx, kind="stable")  # C side requires ascending
    sorted_idx = np.ascontiguousarray(idx[order])
    out = np.zeros((len(idx), size, size, 3), np.uint8)
    found = np.zeros((len(idx),), np.uint8)
    pts = np.zeros((len(idx),), np.float64)
    tick = ctypes.c_double(0.0)
    leg_arr = np.zeros((4,), np.float64)
    rc = lib.mmqg_decode_frames_idx2(
        str(path).encode(),
        sorted_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        len(idx), size, size, float(seek_ahead_s), 1 if skip else 0,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        found.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.byref(tick),
        leg_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    if legs is not None:
        legs.update(open_s=float(leg_arr[0]), seek_s=float(leg_arr[1]),
                    decode_s=float(leg_arr[2]), sws_s=float(leg_arr[3]))
    if rc == -2:
        raise ValueError(f"{path}: no video stream")
    if rc < 0:
        return None
    inv = np.empty_like(order)
    inv[order] = np.arange(len(order))
    return out[inv], found[inv].astype(bool), pts[inv], tick.value


def write_test_tone_mp4(path, seconds: float = 2.0, freq: int = 440) -> bool:
    """AAC-in-mp4 sine fixture (see mmqg_media.cpp); False if the lib or the
    AAC encoder is unavailable."""
    lib = get_media_lib()
    if lib is None:
        return False
    return lib.mmqg_write_test_tone_mp4(str(path).encode(), float(seconds),
                                        int(freq)) == 0


def write_test_av_mp4(path, seconds: float = 6.0, freq: int = 440, *,
                      width: int = 64, height: int = 48,
                      fps: int = 10) -> bool:
    """mp4 fixture with BOTH an AAC tone and an MPEG-4 video stream
    (per-frame brightness ramp) — exercises the full raw-video serving path
    with no external binary; False if the lib or encoders are unavailable."""
    lib = get_media_lib()
    if lib is None:
        return False
    return lib.mmqg_write_test_av_mp4(str(path).encode(), float(seconds),
                                      int(freq), 1, int(width), int(height),
                                      int(fps)) == 0


# ------------------------------------------------------------- simple calls

def load_wav_mono(path, target_rate: int, max_samples: int) -> Optional[np.ndarray]:
    """Native wav -> mono int16 at target_rate; None if lib unavailable or
    the file fails to parse (caller falls back to the Python reader)."""
    lib = get_lib()
    if lib is None:
        return None
    out = np.zeros((max_samples,), np.int16)
    n = lib.mmqg_load_wav_mono(
        str(path).encode(), target_rate,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), max_samples)
    if n < 0:
        return None
    return out[:n]


def load_frames(path, t_max: int, h: int, w: int) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    out = np.zeros((t_max, h, w, 3), np.uint8)
    n = lib.mmqg_load_frames(
        str(path).encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        t_max, h, w)
    if n < 0:
        return None
    return out[:n]


# ----------------------------------------------------------- async packing

class PackHandle:
    def __init__(self, lib, handle, arrays):
        self._lib = lib
        self._handle = handle
        self._arrays = arrays  # keep alive until wait()

    def wait(self) -> int:
        """Join the pack job; returns the number of failed items."""
        if self._handle is None:
            return 0
        errors = self._lib.mmqg_pack_wait(ctypes.c_void_p(self._handle))
        self._handle = None
        return errors

    def __del__(self):
        # a dropped handle must still join its C++ threads: otherwise they
        # keep writing into buffers the interpreter is freeing at shutdown
        try:
            self.wait()
        except Exception:
            pass


def pack_batch_async(
    frame_paths: Sequence[Optional[str]],
    wav_paths: Sequence[Optional[str]],
    frames: np.ndarray,       # (n, t_max, h, w, 3) uint8, preallocated
    audio: np.ndarray,        # (n, s_max) int16, preallocated
    frames_len: np.ndarray,   # (n,) int32
    audio_len: np.ndarray,    # (n,) int32
    *,
    target_rate: int = 16000,
    n_threads: int = 2,
) -> Optional[PackHandle]:
    """Kick off threaded filling of a batch's media slots; overlap with TPU
    compute and call .wait() before shipping the arrays. None if the native
    lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    # the C++ workers write with C-contiguous stride arithmetic through raw
    # pointers — a view/wrong-dtype array would be silently corrupted
    for name, arr, dt in (("frames", frames, np.uint8),
                          ("audio", audio, np.int16),
                          ("frames_len", frames_len, np.int32),
                          ("audio_len", audio_len, np.int32)):
        if arr.dtype != dt or not arr.flags["C_CONTIGUOUS"]:
            raise ValueError(
                f"{name} must be C-contiguous {np.dtype(dt).name} "
                f"(got {arr.dtype}, contiguous={arr.flags['C_CONTIGUOUS']})")
    n, t_max, h, w, _ = frames.shape
    s_max = audio.shape[1]

    def c_paths(paths):
        arr = (ctypes.c_char_p * n)()
        keep = []
        for i, p in enumerate(paths):
            if p is None:
                arr[i] = None
            else:
                b = str(p).encode()
                keep.append(b)
                arr[i] = b
        return arr, keep

    fp_arr, keep1 = c_paths(frame_paths)
    wp_arr, keep2 = c_paths(wav_paths)
    handle = lib.mmqg_pack_submit(
        fp_arr, wp_arr, n,
        frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), t_max, h, w,
        audio.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), s_max,
        target_rate,
        frames_len.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        audio_len.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n_threads)
    return PackHandle(lib, handle, (frames, audio, frames_len, audio_len,
                                    fp_arr, wp_arr, keep1, keep2))
