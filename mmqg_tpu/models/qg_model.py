"""The assembled flagship model: tri-modal encode -> attention decode.

One parameter pytree, one mutable-state pytree (BN running stats), pure
functions for encode / teacher-forced loss. Modality configurations mirror the
reference's experiment axes (BASELINE.json configs; reference experiments.md):

  mode="text"        text encoder only (AV memories zeroed/masked)
  mode="text_video"  + conv-LSTM video encoder
  mode="trimodal"    + VGGish-style audio encoder (flagship, reference train.py)

The embedding table is a single shared parameter used by both the text encoder
and the decoder (reference train.py:236,245,255 shared one torch Embedding).

Loss semantics (reference train.py:171-181): the training objective per sample
is the **sum** of per-step cross-entropies over the true target length (the
reference backprops the summed loss); the *reported* loss divides by
target_len (reference train.py:184). Batched here with explicit masks; invalid
(padding) examples contribute zero.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from mmqg_tpu.data.vocab import START_ID
from mmqg_tpu.models import (audio_encoder, decoder, frontends, text_encoder,
                             video_encoder, video_resnet)
from mmqg_tpu.models import layers as L

MODES = ("text", "text_video", "trimodal")


class ModelConfig(NamedTuple):
    """Static architecture hyperparameters (hashable -> jit-friendly)."""
    n_vocab: int
    word_emb_dim: int = 300
    hidden_dim: int = 512
    text_layers: int = 3
    dec_layers: int = 3
    dropout: float = 0.2            # decoder LSTM dropout (dec_lstm_dropout)
    text_dropout: float = 0.2       # text encoder LSTM dropout
    video_hidden_dim: int = 512
    audio_emb_dim: int = 128
    flatten_dim: int = 1000
    context_max_length: int = 283
    av_max_length: int = 101
    target_steps: int = 22          # question_max_length + 1 (<end>)
    mode: str = "trimodal"
    decoder: str = "attn"           # "attn" | "non_attn" (reference C18 / C17)
    video_encoder: str = "conv_lstm"  # "conv_lstm" | "resnet" (reference
    #   model/encoder.py:31-78 / :21-29 — the R(2+1)D-18 alternative backbone)
    remat_video: bool = False       # jax.checkpoint the video tower while
    #   training: recompute its activations in the backward pass instead of
    #   holding them in HBM. Raises the resnet backbone's trainable batch
    #   (its 101x112x112 activation stack is the HBM wall; measured in
    #   PERF.md "R(2+1)D backbone") at the cost of a second forward.
    frame_size: int = 112
    mel_frames: int = 96
    mel_bins: int = 64
    sample_rate: int = 16000
    stft_window: int = 400
    stft_hop: int = 160
    mel_min_hz: float = 125.0
    mel_max_hz: float = 7500.0
    log_offset: float = 0.01
    normalize_video: bool = True
    vid_mean: Tuple[float, float, float] = (0.43216, 0.394666, 0.37645)
    vid_std: Tuple[float, float, float] = (0.22803, 0.22145, 0.216989)
    # int8 MXU (2x bf16 rate) for the VGGish convs at inference; measured
    # 1.6x end-to-end on the audio encoder at 0.1% embedding rel-error.
    # Training always runs bf16/f32 (train=True bypasses this).
    audio_int8_serving: bool = True
    # static per-layer activation scales from audio_encoder.
    # calibrate_int8_scales (None -> dynamic per-example scales). A tuple so
    # the config stays hashable/jit-static.
    audio_int8_scales: Optional[Tuple[float, ...]] = None

    @classmethod
    def from_config(cls, config, n_vocab: int, mode: str = "trimodal",
                    dec: str = "attn"):
        # knobs the architecture cannot vary get a LOUD error, not a silent
        # ignore: the decoder's init state IS the text encoder's final state
        # (reference train.py:169), so their hidden dims must match; the
        # video conv pyramid is the fixed reference topology (3->4->6->8->10,
        # k3 s1, model/encoder.py:37-50), which av_in_channels/kernel_sz/
        # stride parameterised without the reference ever varying them.
        if config.dec_lstm_hidden_dim != config.text_lstm_hidden_dim:
            raise ValueError(
                f"dec_lstm_hidden_dim ({config.dec_lstm_hidden_dim}) must "
                f"equal text_lstm_hidden_dim ({config.text_lstm_hidden_dim}):"
                " the decoder is initialised from the text encoder's final "
                "state (reference train.py:169)")
        if (config.av_in_channels, config.av_kernel_sz,
                config.av_stride) != (3, 3, 1):
            raise ValueError(
                "av_in_channels/av_kernel_sz/av_stride must stay (3, 3, 1): "
                "the video conv pyramid is the fixed reference topology "
                "(model/encoder.py:37-50)")
        venc = getattr(config, "video_encoder", "conv_lstm")
        if venc not in ("conv_lstm", "resnet"):
            raise ValueError(
                f"video_encoder={venc!r}: must be 'conv_lstm' (reference "
                "main path) or 'resnet' (R(2+1)D-18 alternative backbone)")
        if getattr(config, "param_dtype", "float32") != "float32":
            raise ValueError(
                "param_dtype: only float32 master params are supported "
                "(activations run bf16 via the step dtype)")
        return cls(
            n_vocab=n_vocab,
            decoder=dec,
            word_emb_dim=config.glove_emb_dim,
            hidden_dim=config.text_lstm_hidden_dim,
            text_layers=config.text_lstm_layers,
            dec_layers=config.dec_lstm_layers,
            dropout=config.dec_lstm_dropout,
            text_dropout=config.text_lstm_dropout,
            video_hidden_dim=config.video_hidden_dim,
            audio_emb_dim=config.audio_emb,
            flatten_dim=config.flatten_dim,
            context_max_length=config.context_max_length,
            av_max_length=config.av_max_length,
            target_steps=config.question_max_length + 1,
            mode=mode,
            video_encoder=venc,
            remat_video=getattr(config, "remat_video", False),
            frame_size=config.frame_size,
            mel_frames=config.mel_frames_per_example,
            mel_bins=config.mel_bins,
            sample_rate=config.audio_sample_rate,
            stft_window=config.stft_window,
            stft_hop=config.stft_hop,
            mel_min_hz=config.mel_min_hz,
            mel_max_hz=config.mel_max_hz,
            log_offset=config.log_offset,
            vid_mean=tuple(config.vid_mean),
            vid_std=tuple(config.vid_std),
            audio_int8_serving=getattr(config, "audio_int8_serving", True),
        )


def init(rng, mc: ModelConfig, emb_weights) -> Tuple[Dict, Dict]:
    """Returns (params, state). ``emb_weights`` is the (V, D) GloVe slice."""
    k_text, k_vid, k_aud, k_dec = jax.random.split(rng, 4)
    if mc.decoder == "attn":
        dec_params = decoder.init(
            k_dec, n_vocab=mc.n_vocab, word_emb_dim=mc.word_emb_dim,
            hidden_dim=mc.hidden_dim, num_layers=mc.dec_layers,
            dropout=mc.dropout, video_emb_dim=mc.video_hidden_dim,
            audio_emb_dim=mc.audio_emb_dim,
            text_max_length=mc.context_max_length,
            av_max_length=mc.av_max_length)
    else:
        # AV-vector-conditioned decoder (reference model/decoder.py:7-47);
        # av vec = [pooled audio; pooled video], see av_vector()
        dec_params = decoder.init_non_attn(
            k_dec, n_vocab=mc.n_vocab, word_emb_dim=mc.word_emb_dim,
            av_emb_dim=mc.audio_emb_dim + mc.video_hidden_dim,
            hidden_dim=mc.hidden_dim, num_layers=mc.dec_layers,
            dropout=mc.dropout)
    params: Dict = {
        "embedding": L.embedding_init(emb_weights),
        "text_enc": text_encoder.init(
            k_text, emb_dim=mc.word_emb_dim, hidden_dim=mc.hidden_dim,
            num_layers=mc.text_layers, dropout=mc.dropout),
        "decoder": dec_params,
    }
    state: Dict = {}
    if mc.mode in ("text_video", "trimodal"):
        if mc.video_encoder == "resnet":
            # trunk features are 512-d; a linear head maps them to the
            # decoder's video_emb_dim when they differ (512 -> no head, the
            # torchvision-import layout)
            vparams, vstate = video_resnet.init(
                k_vid, embed_dim=(None if mc.video_hidden_dim == 512
                                  else mc.video_hidden_dim))
        else:
            vparams, vstate = video_encoder.init(
                k_vid, hidden_dim=mc.video_hidden_dim,
                flatten_dim=mc.flatten_dim)
        params["video_enc"] = vparams
        state["video_enc"] = vstate
    if mc.mode == "trimodal":
        params["audio_enc"] = audio_encoder.init(
            k_aud, mel_frames=mc.mel_frames, mel_bins=mc.mel_bins,
            embedding_dim=mc.audio_emb_dim)
    return params, state


def encode(
    params: Dict,
    state: Dict,
    mc: ModelConfig,
    batch: Dict[str, jnp.ndarray],
    *,
    train: bool = False,
    dropout_rng: Optional[jax.Array] = None,
    use_pallas: bool = True,
    audio_cap: Optional[int] = None,
    frames_cap: Optional[int] = None,
    dtype=jnp.bfloat16,
) -> Tuple[decoder.Memories, Tuple[jnp.ndarray, jnp.ndarray], Dict]:
    """Full tri-modal encode. ``batch`` keys: context_ids, context_len,
    frames (uint8), frames_len, audio_pcm, audio_len.

    ``audio_cap`` / ``frames_cap`` (static) bound the AV step counts the
    audio/video encoders run on: the batch's true max lengths are known
    host-side, so serving buckets them (mmqg_tpu.decode picks the buckets)
    and skips encoder work on guaranteed-padding slots — memories are
    zero-padded back to ``av_max_length`` so attention shapes never change.
    The reference likewise only processed each clip's actual length
    (per-sample, on CPU).

    Returns (memories, decoder init state, new mutable state)."""
    B = batch["context_ids"].shape[0]
    emb_table = params["embedding"]["table"]
    enc_text, text_state = text_encoder.apply(
        params["text_enc"], emb_table, batch["context_ids"],
        batch["context_len"], train=train, dropout=mc.text_dropout,
        dropout_rng=dropout_rng, use_pallas=use_pallas, dtype=dtype)

    new_state = dict(state)
    if mc.mode in ("text_video", "trimodal"):
        frames = batch["frames"]
        frames_len = batch["frames_len"]
        fcap = min(frames_cap or mc.av_max_length, mc.av_max_length)
        if fcap < frames.shape[1]:
            frames = frames[:, :fcap]
            frames_len = jnp.minimum(frames_len, fcap)
        norm = (mc.vid_mean, mc.vid_std) if mc.normalize_video else ((0., 0., 0.), (1., 1., 1.))
        # remat_video: trade a second tower forward for not holding its
        # activations through the decoder/backward (HBM is the training
        # ceiling for the resnet backbone — ModelConfig.remat_video)
        remat = (jax.checkpoint if (train and mc.remat_video)
                 else (lambda f: f))
        if mc.video_encoder == "resnet":
            # R(2+1)D-18 alternative backbone (reference model/encoder.py:
            # 21-29, never driven there — memory semantics documented in
            # video_resnet.apply_temporal). 3-D convs mix time, so padded
            # frames are zeroed on the way in; BN stats run over all
            # positions (torchvision's r2plus1d has no masking either).
            prepared = frontends.prepare_frames(
                frames, size=mc.frame_size, mean=mc.vid_mean, std=mc.vid_std,
                normalize=mc.normalize_video)
            tmask = (jnp.arange(prepared.shape[1])[None, :]
                     < frames_len[:, None])
            prepared = prepared * tmask[:, :, None, None, None].astype(
                prepared.dtype)
            enc_video, vstate = remat(
                lambda p, s, x: video_resnet.apply_temporal(
                    p, s, x, train=train, dtype=dtype))(
                params["video_enc"], state["video_enc"], prepared)
        elif frames.dtype == jnp.uint8 and frames.shape[2] == frames.shape[3] == mc.frame_size:
            # fast path: raw uint8 straight into conv1 with the /255 + mean/std
            # transform folded into its weights (zero preprocessing cost)
            enc_video, vstate = remat(
                lambda p, s, f, fl: video_encoder.apply(
                    p, s, f, fl, train=train, normalization=norm,
                    use_pallas=use_pallas, dtype=dtype))(
                params["video_enc"], state["video_enc"], frames, frames_len)
        else:
            prepared = frontends.prepare_frames(
                frames, size=mc.frame_size, mean=mc.vid_mean, std=mc.vid_std,
                normalize=mc.normalize_video)
            enc_video, vstate = remat(
                lambda p, s, f, fl: video_encoder.apply(
                    p, s, f, fl, train=train, use_pallas=use_pallas,
                    dtype=dtype))(
                params["video_enc"], state["video_enc"], prepared, frames_len)
        if enc_video.shape[1] < mc.av_max_length:
            # pad by the ACTUAL encoded length, not fcap: a caller may ship a
            # frames buffer shorter than the bucket (external loaders), in
            # which case no trim happened above and enc_video.shape[1] < fcap
            enc_video = jnp.pad(
                enc_video,
                ((0, 0), (0, mc.av_max_length - enc_video.shape[1]), (0, 0)))
        new_state["video_enc"] = vstate
        if mc.video_encoder == "resnet":
            # the trunk strides time by 8: ceil(len/8) memory steps
            video_len = jnp.maximum(
                video_resnet.temporal_out_len(frames_len), 1)
        else:
            video_len = frames_len  # capped: attention must not see past fcap
    else:
        enc_video = jnp.zeros((B, mc.av_max_length, mc.video_hidden_dim))
        video_len = jnp.ones((B,), jnp.int32)

    if mc.mode == "trimodal":
        cap = min(audio_cap or mc.av_max_length, mc.av_max_length)
        mel = frontends.log_mel_examples(
            batch["audio_pcm"], sample_rate=mc.sample_rate,
            window=mc.stft_window, hop=mc.stft_hop,
            mel_bins=mc.mel_bins, lower_hz=mc.mel_min_hz,
            upper_hz=mc.mel_max_hz, log_offset=mc.log_offset,
            frames_per_example=mc.mel_frames,
            max_examples=cap, dtype=dtype)
        # reference masked the audio head by the *frame* count
        # (model/decoder.py:93 used enc_frames); we mask by the true audio
        # example count, falling back to >=1 to keep softmax defined.
        audio_len = jnp.maximum(
            frontends.audio_num_examples(
                batch["audio_len"], sample_rate=mc.sample_rate,
                hop=mc.stft_hop, window=mc.stft_window,
                frames_per_example=mc.mel_frames,
                max_examples=cap), 1)
        # int8 only off-CPU: XLA:CPU's int8 conv path intermittently aborts
        # the process in long test sessions (see NOTES_NEXT_ROUND.md flake
        # entry), and the 2x-MXU motivation is TPU-only anyway.
        enc_audio = audio_encoder.apply(
            params["audio_enc"], mel, audio_len, dtype=dtype,
            int8=(mc.audio_int8_serving and not train
                  and jax.default_backend() not in ("cpu",)),
            int8_scales=mc.audio_int8_scales)
        if cap < mc.av_max_length:
            enc_audio = jnp.pad(
                enc_audio, ((0, 0), (0, mc.av_max_length - cap), (0, 0)))
    else:
        enc_audio = jnp.zeros((B, mc.av_max_length, mc.audio_emb_dim))
        audio_len = jnp.ones((B,), jnp.int32)

    mem = decoder.Memories(
        enc_text=enc_text, enc_video=enc_video, enc_audio=enc_audio,
        text_len=batch["context_len"], video_len=video_len,
        audio_len=audio_len)
    # decoder state seeded by the text encoder final state (reference train.py:169)
    return mem, text_state, new_state


def av_vector(mem: decoder.Memories) -> jnp.ndarray:
    """Single fused AV conditioning vector for the non-attention decoder
    (reference model/decoder.py:28 repeated one AV vector per step):
    [masked-mean audio emb (Ha); masked-mean video emb (Hv)]. Absent
    modalities contribute zeros (their memories are zeroed)."""
    def masked_mean(m, ln):
        La = m.shape[1]
        mask = (jnp.arange(La)[None, :] < ln[:, None])[..., None]
        return (m * mask).sum(1) / jnp.maximum(ln, 1)[:, None]

    return jnp.concatenate([masked_mean(mem.enc_audio, mem.audio_len),
                            masked_mean(mem.enc_video, mem.video_len)],
                           axis=-1)


def loss_fn(
    params: Dict,
    state: Dict,
    mc: ModelConfig,
    batch: Dict[str, jnp.ndarray],
    *,
    train: bool = True,
    dropout_rng: Optional[jax.Array] = None,
    dtype=jnp.bfloat16,
    audio_cap: Optional[int] = None,
    frames_cap: Optional[int] = None,
    mem_constraint=None,
    attn_fn=None,
) -> Tuple[jnp.ndarray, Dict]:
    """Teacher-forced masked CE. Returns (objective, aux dict).
    objective = mean over valid samples of per-sample summed CE
    (reference train.py:174-177 backprops the per-sample sum).

    ``audio_cap``/``frames_cap`` (static) bound the AV encoders to the
    batch's real AV lengths, exactly like the serving path: padded slots'
    embeddings are zero-masked before attention, so their gradients are
    identically zero — capping changes compute, not gradients (tested in
    test_train.py::test_bucketed_train_step_matches_uncapped).

    ``mem_constraint`` (optional callable): sequence-parallel sharding
    annotation applied to the text attention memory (B, L, H) — training-side
    SP, the analogue of serving's parallel.mesh.sp_greedy_decode. Pass
    ``parallel.mesh.sequence_constraint(mesh)``; XLA then keeps the context
    axis sharded over the model axis through the teacher-forced decode and
    its backward, inserting the gathers/reduce-scatters where the attention
    consumes/produces it (SURVEY.md §5 long-context).

    ``attn_fn`` (optional callable): alternative decoder attention (see
    decoder.step) — e.g. ops.attention_sp.trimodal_attention_sp bound to a
    mesh, the gather-free companion to ``mem_constraint`` whose autodiff
    reduce-scatters flow through the shard_map."""
    target = batch["target_ids"]                       # (B, T)
    B, T = target.shape
    start = jnp.full((B, 1), START_ID, target.dtype)
    dec_inputs = jnp.concatenate([start, target[:, :-1]], axis=1)

    # This function is what jax.grad differentiates, and it deliberately
    # always takes the XLA path — there is NO use_pallas parameter here, by
    # design: the inference kernels (lstm_pallas, attention_pallas) are
    # forward-only, and the TRAINABLE Pallas LSTM that does exist
    # (ops/lstm_train_pallas.py, custom-VJP fused BPTT) measured equal to
    # the XLA scan at reference scale (both per-step latency-bound; PERF.md
    # "Kernel notes") — it is kept as the documented path for larger hidden
    # sizes where weight re-streaming dominates, not wired here.
    # config.use_pallas governs the SERVING/decode path (greedy/beam decode,
    # validation decode) only.
    use_pallas = False

    mem, dec_state, new_state = encode(
        params, state, mc, batch, train=train, dropout_rng=dropout_rng,
        use_pallas=use_pallas, dtype=dtype, audio_cap=audio_cap,
        frames_cap=frames_cap)
    if mem_constraint is not None:
        mem = mem._replace(enc_text=mem_constraint(mem.enc_text))
    if mc.decoder == "attn":
        logits = decoder.teacher_forced_logits(
            params["decoder"], params["embedding"]["table"], dec_inputs, mem,
            dec_state, train=train, dropout=mc.dropout,
            dropout_rng=dropout_rng, use_pallas=use_pallas, dtype=dtype,
            attn_fn=attn_fn)
    else:
        logits = decoder.non_attn_teacher_forced(
            params["decoder"], params["embedding"]["table"], dec_inputs,
            av_vector(mem), dec_state, train=train, dropout=mc.dropout,
            dropout_rng=dropout_rng, dtype=dtype)       # (B, T, V)

    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tok_ll = jnp.take_along_axis(logp, target[..., None], axis=-1)[..., 0]
    step_mask = (jnp.arange(T)[None, :] < batch["target_len"][:, None])
    valid = batch.get("valid", jnp.ones((B,), bool))
    step_mask = step_mask & valid[:, None]
    ce = -(tok_ll * step_mask)                          # (B, T)

    per_sample_sum = ce.sum(axis=1)                     # (B,)
    n_valid = jnp.maximum(valid.sum(), 1)
    objective = per_sample_sum.sum() / n_valid

    tgt_len = jnp.maximum(batch["target_len"], 1)
    per_sample_mean = per_sample_sum / tgt_len          # reference-style stat
    aux = {
        "state": new_state,
        "loss_per_sample": (per_sample_mean * valid).sum() / n_valid,
        "loss_per_token": ce.sum() / jnp.maximum(step_mask.sum(), 1),
        "n_tokens": step_mask.sum(),
    }
    return objective, aux
