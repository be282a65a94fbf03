"""Typed configuration with JSON round-trip.

Replaces the reference's class-attribute ``Config`` (reference config.py:5-115)
with a frozen-by-convention dataclass. Differences, on purpose:

* instances, not mutated class attributes (the reference's ``load_config``
  mutates the *class*, so two configs cannot coexist — config.py:105-115);
* the typo'd key ``context_max_lenth`` (reference config.py:70) is accepted on
  load and emitted on save for artifact compatibility, but the canonical field
  is ``context_max_length``;
* TPU-specific knobs (batch size, mesh shape, dtypes) are new — the reference
  was single-CPU batch-1 (reference train.py:223,233).

Path layout mirrors the reference bit-for-bit so its on-disk artifacts
(vocab.json, weight_matrix.npy, train/val/test splits, salient_* dirs) are
interchangeable (reference config.py:19-59).
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

# Keys whose values are filesystem paths (stored as str in JSON).
_PATH_KEYS = {
    "output_path", "dataset_path", "data_path", "glove_path",
}

# reference config.py:70 spells it "context_max_lenth"; accept + emit both.
_COMPAT_ALIASES = {"context_max_lenth": "context_max_length"}


@dataclass
class Config:
    # ---- results / artifacts (reference config.py:19-25) ----
    output_path: Path = Path("results/test")

    # ---- dataset tree (reference config.py:27-38) ----
    dataset_path: Path = Path("dataset")

    # ---- processed-data tree (reference config.py:40-50) ----
    data_path: Path = Path("data")

    # ---- glove (reference config.py:52-59) ----
    glove_path: Path = Path("glove.6B")
    glove_emb_dim: int = 300

    # ---- optimisation (reference config.py:61-64) ----
    epochs: int = 100
    lr: float = 1e-4
    optim: str = "adam"  # "sgd" | "adam"

    # ---- modality dims (reference config.py:65-71) ----
    audio_emb: int = 128
    vid_mean: Tuple[float, float, float] = (0.43216, 0.394666, 0.37645)
    vid_std: Tuple[float, float, float] = (0.22803, 0.22145, 0.216989)
    question_max_length: int = 21
    context_max_length: int = 283
    av_max_length: int = 101

    # ---- video encoder (reference config.py:72-77) ----
    av_in_channels: int = 3
    av_kernel_sz: int = 3
    av_stride: int = 1
    video_hidden_dim: int = 512
    flatten_dim: int = 1000
    frame_size: int = 112
    video_encoder: str = "conv_lstm"  # "conv_lstm" (reference main path,
    #   model/encoder.py:31-78) | "resnet" (R(2+1)D-18 — the reference's
    #   alternative backbone, model/encoder.py:21-29; models/video_resnet.py)
    remat_video: bool = False  # rematerialise the video tower's activations
    #   in the backward pass (jax.checkpoint): HBM for FLOPs — raises the
    #   resnet backbone's trainable batch size (PERF.md "R(2+1)D backbone")

    # ---- text encoder (reference config.py:78-82) ----
    text_lstm_hidden_dim: int = 512
    text_lstm_layers: int = 3
    text_lstm_dropout: float = 0.2
    text_non_trainable: bool = False

    # ---- decoder (reference config.py:83-86) ----
    dec_lstm_hidden_dim: int = 512
    dec_lstm_layers: int = 3
    dec_lstm_dropout: float = 0.2

    # ---- checkpoints (reference config.py:88-89) ----
    best_epoch: Optional[int] = None

    # ---- TPU-native additions (no reference equivalent) ----
    batch_size: int = 32             # reference: hard-coded 1 (train.py:233)
    eval_batch_size: int = 32
    seed: int = 42                   # reference: sklearn random_state=42 (prepare_data.py:11)
    compute_dtype: str = "bfloat16"  # MXU-friendly compute; params stay f32
    param_dtype: str = "float32"
    mesh_shape: Tuple[int, int] = (1, 1)   # (data, model) axes
    mesh_axis_names: Tuple[str, str] = ("data", "model")
    use_pallas: bool = True          # fused TPU kernels on the DECODE path
    # (serving greedy/beam + validation decode); the training objective
    # always differentiates the XLA path — see qg_model.loss_fn's comment
    grad_clip_norm: float = 0.0      # 0 disables (reference has no clipping)
    grad_accum_steps: int = 1        # microbatches per optimizer update
    checkpoint_backend: str = "msgpack"  # or "orbax" (tensorstore interop)
    checkpoint_async: bool = False   # write checkpoints off the train thread
    donate_buffers: bool = True      # donate train-state buffers (PERF.md)
    zero1: bool = False  # ZeRO-1 optimizer-state sharding: Adam moments
    #   shard 1/dp over the data axis (parallel/mesh.zero1_shardings);
    #   gradients reduce-scatter into the update, only updated params
    #   all-gather back. ~dp x less optimizer memory at equal collective
    #   volume. Needs a mesh with data axis > 1; no-op otherwise.
    lr_schedule: str = "constant"  # "constant" | "cosine" | "linear"
    #   (train.learning_rate_schedule). The reference trains at a fixed
    #   Adam lr (reference train.py:264); these are production knobs on top.
    lr_warmup_steps: int = 0       # linear warmup from 0 over this many updates
    lr_decay_steps: int = 0        # decay horizon in optimizer updates
    #   (warmup included); required > warmup for cosine/linear
    lr_min_ratio: float = 0.0      # final lr = lr * this (cosine/linear)
    weight_decay: float = 0.0      # > 0 turns adam into decoupled adamw
    fsdp: bool = False  # FSDP / ZeRO-3: the PARAMETERS also shard 1/dp over
    #   the data axis (parallel/mesh.fsdp_shardings; implies zero1 for the
    #   moments so the layouts align). GSPMD all-gathers each weight at its
    #   use site and discards it after — ~dp x less parameter+optimizer
    #   memory for one extra params all-gather per use. Needs a mesh with
    #   data axis > 1; no-op otherwise.
    sequence_parallel_train: bool = False  # shard the text-memory context
    #   axis over the model axis inside the TRAIN step (mesh.sequence_
    #   constraint — the training analogue of serving's sp_greedy_decode).
    #   Pure ceremony at the reference's 283 tokens (SURVEY.md §5); exists
    #   for longer corpora. Needs a mesh with model axis > 1.
    sp_gather_free: bool = False  # with sequence_parallel_train: run the
    #   decoder attention as the explicit distributed two-pass softmax
    #   (ops/attention_sp — per-step communication O(B*H) regardless of
    #   context length) instead of letting GSPMD pick where to gather the
    #   sharded memory. Gradient-exact (tested); see DESIGN.md.
    train_av_bucketing: bool = True  # skip padded AV slots in train steps
    train_av_bucket_granularity: int = 8  # shared with serving's decode._bucket.
    #   Measured A/B (scripts/bench_train_buckets.py, PERF.md): eighths are 8%
    #   faster steady-state but double compile count; break-even ~10k steps —
    #   set 4 for short cold-cache runs.
    compilation_cache_dir: str = ""  # persistent XLA compile cache; "" = off
    #   (utils/compilation_cache.py; also --compile-cache / MMQG_COMPILE_CACHE)
    beam_size: int = 4
    # audio frontend (VGGish-compatible framing)
    audio_sample_rate: int = 16000
    mel_bins: int = 64
    mel_frames_per_example: int = 96
    stft_window: int = 400
    stft_hop: int = 160
    mel_min_hz: float = 125.0
    mel_max_hz: float = 7500.0
    log_offset: float = 0.01

    # ------------------------------------------------------------------ paths
    # Derived paths, mirroring reference config.py:19-59 exactly.
    @property
    def av_model_path(self) -> Path: return self.output_path / "av_model.pth"
    @property
    def text_enc_model_path(self) -> Path: return self.output_path / "text_enc_model.pth"
    @property
    def dec_model_path(self) -> Path: return self.output_path / "dec_model.pth"
    @property
    def stats_json_path(self) -> Path: return self.output_path / "stats.json"
    @property
    def stats_pkl_path(self) -> Path: return self.output_path / "stats.pkl"
    @property
    def learned_weight_path(self) -> Path: return self.output_path / "learned_weight.pt"
    @property
    def checkpoint_dir(self) -> Path: return self.output_path / "ckpt"

    @property
    def subs_path(self) -> Path: return self.dataset_path / "subs"
    @property
    def video_path(self) -> Path: return self.dataset_path / "vids"
    @property
    def audio_path(self) -> Path: return self.dataset_path / "audio"
    @property
    def salient_text_path(self) -> Path: return self.dataset_path / "salient_text"
    @property
    def salient_frames_path(self) -> Path: return self.dataset_path / "salient_frames"
    @property
    def salient_audio_path(self) -> Path: return self.dataset_path / "salient_audio_clip"
    @property
    def salient_text_file(self) -> Path: return self.salient_text_path / "salient_text_list.json"
    @property
    def questions_file(self) -> Path: return self.dataset_path / "labelled_questions.json"
    @property
    def videos_file(self) -> Path: return self.dataset_path / "videos.json"

    @property
    def vocab_file(self) -> Path: return self.data_path / "vocab.json"
    @property
    def index_to_word_file(self) -> Path: return self.data_path / "index_to_word.json"
    @property
    def weights_matrix_file(self) -> Path: return self.data_path / "weight_matrix.npy"
    @property
    def preprocessed_text_file(self) -> Path: return self.data_path / "preprocesses_text.json"
    @property
    def train_file(self) -> Path: return self.data_path / "train_questions.json"
    @property
    def val_file(self) -> Path: return self.data_path / "val_questions.json"
    @property
    def test_file(self) -> Path: return self.data_path / "test_questions.json"

    @property
    def glove_file(self) -> Path:
        return self.glove_path / f"glove.6B.{self.glove_emb_dim}d.txt"
    @property
    def glove_words_file(self) -> Path:
        return self.glove_path / f"6B.{self.glove_emb_dim}_words.pkl"
    @property
    def glove_idx_file(self) -> Path:
        return self.glove_path / f"6B.{self.glove_emb_dim}_idx.pkl"
    @property
    def glove_matrix_file(self) -> Path:
        return self.glove_path / f"6B.{self.glove_emb_dim}_matrix.npy"

    # decoder LSTM input dim: [word_emb; text_ctx; audio_ctx; video_ctx]
    # = 300 + 512 + 128 + 512 = 1452 (reference model/decoder.py:69)
    @property
    def dec_input_dim(self) -> int:
        return (self.glove_emb_dim + self.text_lstm_hidden_dim
                + self.audio_emb + self.video_hidden_dim)

    # ------------------------------------------------------------- lifecycle
    def ensure_dirs(self) -> "Config":
        """Create output/data dirs (reference config.py:12-16 ctor side-effect,
        made explicit here)."""
        os.makedirs(self.output_path, exist_ok=True)
        os.makedirs(self.data_path, exist_ok=True)
        return self

    # ---------------------------------------------------------- json io
    def to_dict(self) -> Dict[str, Any]:
        d = {}
        for f in dataclasses.fields(self):
            v = getattr(self, f.name)
            if isinstance(v, Path):
                v = str(v)
            elif isinstance(v, tuple):
                v = list(v)
            d[f.name] = v
        # compat alias for reference artifacts (reference config.py:70)
        d["context_max_lenth"] = d["context_max_length"]
        return d

    def save(self, path: Optional[Path] = None) -> Path:
        """Dump to ``output_path/config.json`` (reference config.py:91-103)."""
        path = Path(path) if path else self.output_path / "config.json"
        path.parent.mkdir(parents=True, exist_ok=True)
        with open(path, "w") as f:
            json.dump(self.to_dict(), f, indent=2)
        return path

    @classmethod
    def load(cls, path) -> "Config":
        """Load from JSON, accepting reference-style configs: unknown keys are
        ignored, the ``context_max_lenth`` typo is honoured, and path-like
        strings become ``Path`` (reference config.py:105-115)."""
        with open(path, "r") as f:
            raw = json.load(f)
        return cls.from_dict(raw)

    @classmethod
    def from_dict(cls, raw: Dict[str, Any]) -> "Config":
        names = {f.name: f for f in dataclasses.fields(cls)}
        kwargs: Dict[str, Any] = {}
        for key, value in raw.items():
            if key in _COMPAT_ALIASES:
                # honour a compat alias (reference's typo'd keys) only when
                # the canonical key is absent — save() emits both, and the
                # alias must not clobber a user's edit to the canonical one
                canonical = _COMPAT_ALIASES[key]
                if canonical in raw:
                    continue
                key = canonical
            if key not in names:
                continue  # tolerate reference-only derived-path keys
            if key in _PATH_KEYS and isinstance(value, str):
                value = Path(value)
            elif isinstance(value, list):
                value = tuple(value)
            kwargs[key] = value
        return cls(**kwargs)

    def replace(self, **kwargs) -> "Config":
        return dataclasses.replace(self, **kwargs)
