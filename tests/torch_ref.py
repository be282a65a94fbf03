"""Dimension-parametrised live-torch reference build + composed parity checks.

Shared by tests/test_composed_parity.py (scaled dims, runs in CI) and
scripts/composed_parity_full.py (full reference dims, result recorded in
PARITY.md) so the two cannot diverge. See test_composed_parity.py's module
doc for what is being proven and which reference bugs the oracle fixes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F
from torch import nn

from mmqg_tpu import decode as DEC
from mmqg_tpu.compat import torch_import as TI
from mmqg_tpu.data.vocab import END_ID, PAD_ID, START_ID
from mmqg_tpu.models import decoder as D
from mmqg_tpu.models import frontends, qg_model
from mmqg_tpu.models.video_encoder import flatten_dim_for


class Dims(NamedTuple):
    """Composed-model dimensions (defaults = full reference scale,
    reference config.py:53,69-86)."""
    V: int = 2000
    EMB: int = 300
    H: int = 512
    NL: int = 3
    HV: int = 512
    HA: int = 128
    CTX_MAX: int = 283
    AV_MAX: int = 101
    TGT: int = 21
    FRAME: int = 112
    MEL_F: int = 96
    MEL_B: int = 64
    RATE: int = 16000
    WIN: int = 400
    HOP: int = 160

    @property
    def FLAT(self):
        return flatten_dim_for(self.FRAME)


class TorchVGGish(nn.Module):
    """torchvggish topology (the torch.hub model the reference froze,
    reference model/encoder.py:8-19): VGG features, NCHW->NHWC transpose
    before flatten, Linear/ReLU x3 embedding head."""

    def __init__(self, mel_frames, mel_bins, embedding_dim, fc_dim=4096):
        super().__init__()
        layers, c_in = [], 1
        for v in (64, "M", 128, "M", 256, 256, "M", 512, 512, "M"):
            if v == "M":
                layers.append(nn.MaxPool2d(2, 2))
            else:
                layers += [nn.Conv2d(c_in, v, 3, padding=1), nn.ReLU(True)]
                c_in = v
        self.features = nn.Sequential(*layers)
        flat = (mel_frames // 16) * (mel_bins // 16) * 512
        self.embeddings = nn.Sequential(
            nn.Linear(flat, fc_dim), nn.ReLU(True),
            nn.Linear(fc_dim, fc_dim), nn.ReLU(True),
            nn.Linear(fc_dim, embedding_dim), nn.ReLU(True))

    def forward(self, x):                      # (N, 1, mel_frames, mel_bins)
        x = self.features(x)
        x = x.permute(0, 2, 3, 1).contiguous().view(x.size(0), -1)
        return self.embeddings(x)


class RefVideoEncoder(nn.Module):
    """Reference VideoConvLstmEncoder (model/encoder.py:31-78)."""

    def __init__(self, flatten_dim, hidden):
        super().__init__()
        self.conv1, self.bn1 = nn.Conv2d(3, 4, 3), nn.BatchNorm2d(4)
        self.conv2, self.bn2 = nn.Conv2d(4, 6, 3), nn.BatchNorm2d(6)
        self.conv3, self.bn3 = nn.Conv2d(6, 8, 3), nn.BatchNorm2d(8)
        self.conv4, self.bn4 = nn.Conv2d(8, 10, 3), nn.BatchNorm2d(10)
        self.pool = nn.MaxPool2d(3, 3)
        self.lstm = nn.LSTM(flatten_dim, hidden)

    def forward(self, frames):                 # (T, 3, H, W) float
        x = self.pool(self.bn2(F.relu(self.conv2(
            self.bn1(F.relu(self.conv1(frames)))))))
        x = self.pool(self.bn4(F.relu(self.conv4(
            self.bn3(F.relu(self.conv3(x)))))))
        out, _ = self.lstm(x.flatten(1).unsqueeze(1))
        return out[:, 0]                       # (T, hidden)


class RefAttnDecoder(nn.Module):
    """Reference AttnDecoder (model/decoder.py:49-125) with REAL length
    masks (fixed semantics — the reference's masks were no-ops)."""

    def __init__(self, d: Dims):
        super().__init__()
        self.text_attn = nn.Linear(d.EMB + d.H, d.CTX_MAX)
        self.vid_attn = nn.Linear(d.EMB + d.H, d.AV_MAX)
        self.audio_attn = nn.Linear(d.EMB + d.H, d.AV_MAX)
        self.lstm = nn.LSTM(d.EMB + d.H + d.HA + d.HV, d.H, d.NL)
        self.out_layer = nn.Linear(d.H, d.V)

    def forward(self, emb, mems, lens, hidden):
        enc_text, enc_video, enc_audio = mems
        n_ctx, n_frames, n_audio = lens
        q = torch.cat([emb, hidden[0][-1]], dim=1)  # (1, EMB+H)

        def attend(head, memory, n):
            s = head(q)
            s[:, n:] = float("-inf")
            w = F.softmax(s, dim=1)
            return torch.bmm(w.unsqueeze(1), memory).squeeze(1)

        ctx_t = attend(self.text_attn, enc_text, n_ctx)
        ctx_v = attend(self.vid_attn, enc_video, n_frames)
        ctx_a = attend(self.audio_attn, enc_audio, n_audio)
        # concat order [emb; text; audio; video] — reference model/decoder.py:99
        x = torch.cat([emb, ctx_t, ctx_a, ctx_v], dim=1).unsqueeze(0)
        out, hidden = self.lstm(x, hidden)
        return self.out_layer(out[0]), hidden


def build_composed(d: Dims, seed: int = 0, tame_audio: bool = False):
    """Torch reference model + imported jax model + a 2-sample batch.

    ``tame_audio``: re-init the VGGish stack to unit gain (Xavier-normal
    weights, zero biases) BEFORE the state_dicts are exported, so both
    sides stay identical. Torch's default init amplifies ~1e6 through the
    9-layer audio stack at tiny dims — audio memories hit ~1e7, every
    decoder gate saturates to exactly +-1, and the whole model becomes
    insensitive to its other inputs (measured: losses bit-identical under
    wholesale frame/PCM replacement after one optimizer step). The real
    reference runs PRETRAINED hub VGGish (model/encoder.py:12) whose
    output scale is O(1); this flag is the tiny-dims stand-in for that,
    used by the trained-to-convergence checks. Parity/oracle tests keep
    the default (raw torch init) — saturation is irrelevant to them and
    the rawer numbers stress the import path harder."""
    torch.manual_seed(seed)
    emb_layer = nn.Embedding(d.V, d.EMB)
    text_lstm = nn.LSTM(d.EMB, d.H, d.NL)
    video = RefVideoEncoder(d.FLAT, d.HV)
    vggish = TorchVGGish(d.MEL_F, d.MEL_B, d.HA)
    dec = RefAttnDecoder(d)
    if tame_audio:
        with torch.no_grad():
            for p in vggish.parameters():
                if p.dim() >= 2:
                    nn.init.xavier_normal_(p)
                else:
                    p.zero_()
    for m in (video, vggish, dec):
        m.eval()
    with torch.no_grad():
        for bn in (video.bn1, video.bn2, video.bn3, video.bn4):
            bn.running_mean.uniform_(-0.1, 0.1)
            bn.running_var.uniform_(0.9, 1.1)

    # the reference's four checkpoint artifacts (train.py:197-214)
    av_sd = {f"video_enc.{k}": v.numpy()
             for k, v in video.state_dict().items()}
    av_sd.update({f"audio_enc.vggish.{k}": v.numpy()
                  for k, v in vggish.state_dict().items()})
    text_sd = {f"lstm.{k}": v.numpy()
               for k, v in text_lstm.state_dict().items()}
    text_sd["word_embeddings.weight"] = emb_layer.weight.detach().numpy()
    dec_sd = {k: v.numpy() for k, v in dec.state_dict().items()}
    dec_sd["emb_layer.weight"] = emb_layer.weight.detach().numpy()
    emb_w = emb_layer.weight.detach().numpy()

    mc = qg_model.ModelConfig(
        n_vocab=d.V, word_emb_dim=d.EMB, hidden_dim=d.H, text_layers=d.NL,
        dec_layers=d.NL, dropout=0.0, text_dropout=0.0,
        video_hidden_dim=d.HV,
        audio_emb_dim=d.HA, flatten_dim=d.FLAT, context_max_length=d.CTX_MAX,
        av_max_length=d.AV_MAX, target_steps=d.TGT + 1, mode="trimodal",
        frame_size=d.FRAME, mel_frames=d.MEL_F, mel_bins=d.MEL_B,
        sample_rate=d.RATE, stft_window=d.WIN, stft_hop=d.HOP,
        normalize_video=False)  # reference train path skips Normalize
    #                             (reference train.py:229 vs evaluate.py:163)
    params, state = TI.import_checkpoint(av_sd, text_sd, dec_sd, emb_w, mc)

    rng = np.random.RandomState(7)
    B = 2
    ctx_len = np.asarray([d.CTX_MAX, max(1, d.CTX_MAX // 2)], np.int32)
    frames_len = np.asarray([min(4, d.AV_MAX), min(2, d.AV_MAX)], np.int32)
    # 2 and 3 whole mel examples respectively
    audio_len = np.asarray([d.WIN + d.HOP * (2 * d.MEL_F - 1),
                            d.WIN + d.HOP * 3 * d.MEL_F], np.int32)
    S = int(audio_len.max())
    T_frames = int(frames_len.max())
    batch = {
        "context_ids": rng.randint(3, d.V, (B, d.CTX_MAX)).astype(np.int32),
        "context_len": ctx_len,
        "frames": rng.randint(
            0, 255, (B, T_frames, d.FRAME, d.FRAME, 3)).astype(np.uint8),
        "frames_len": frames_len,
        "audio_pcm": (rng.randn(B, S) * 3000).astype(np.int16),
        "audio_len": audio_len,
        "target_ids": rng.randint(3, d.V, (B, d.TGT)).astype(np.int32),
        "target_len": np.full((B,), d.TGT, np.int32),
    }
    modules = dict(emb=emb_layer, text=text_lstm, video=video, vggish=vggish,
                   dec=dec)
    return modules, mc, params, state, batch


def oracle_encode(modules, d: Dims, batch, b, grad: bool = False):
    """Per-sample reference encode (train.py:144-169 semantics, fixed).
    ``grad=True`` keeps the autograd graph (for update-parity checks)."""
    n_ctx = int(batch["context_len"][b])
    n_frames = int(batch["frames_len"][b])
    with torch.set_grad_enabled(grad):
        # text: token-stepped LSTM into a zeros buffer (train.py:160-166);
        # equivalent to one packed run over the true length
        ids = torch.tensor(
            batch["context_ids"][b:b + 1, :n_ctx].astype(np.int64))
        e = modules["emb"](ids)                       # (1, n, EMB)
        out, hidden = modules["text"](e.transpose(0, 1))
        enc_text = torch.zeros(d.CTX_MAX, d.H)
        enc_text[:n_ctx] = out[:, 0]

        # video: float/255 frames (ToFloatTensor, custom_transforms.py:14),
        # valid frames only, zero-padded to av_max (train.py:157)
        fr = torch.tensor(
            batch["frames"][b, :n_frames].astype(np.float32) / 255.0
        ).permute(0, 3, 1, 2)
        v = modules["video"](fr)                      # (n_frames, HV)
        enc_video = torch.zeros(d.AV_MAX, d.HV)
        enc_video[:n_frames] = v

        # audio: shared log-mel frontend (its own torch parity is proved in
        # test_vggish_featurizer.py), valid examples through VGGish
        mel = np.asarray(frontends.log_mel_examples(
            jnp.asarray(batch["audio_pcm"][b:b + 1]), sample_rate=d.RATE,
            window=d.WIN, hop=d.HOP, mel_bins=d.MEL_B,
            frames_per_example=d.MEL_F, max_examples=d.AV_MAX,
            dtype=jnp.float32))[0]
        n_audio = int(np.asarray(frontends.audio_num_examples(
            jnp.asarray(batch["audio_len"][b:b + 1]), sample_rate=d.RATE,
            hop=d.HOP, window=d.WIN, frames_per_example=d.MEL_F,
            max_examples=d.AV_MAX))[0])
        a = modules["vggish"](torch.tensor(mel[:n_audio]).unsqueeze(1))
        enc_audio = torch.zeros(d.AV_MAX, d.HA)
        enc_audio[:n_audio] = a
    mems = (enc_text.unsqueeze(0), enc_video.unsqueeze(0),
            enc_audio.unsqueeze(0))
    return mems, (n_ctx, n_frames, n_audio), hidden


def check_teacher_forced(composed, d: Dims, atol=2e-4, log=lambda *a: None):
    """Per-step teacher-forced logits identical (reference train.py:171-175)."""
    modules, mc, params, state, batch = composed
    mem, dec_state, _ = qg_model.encode(params, state, mc, batch, train=False,
                                        use_pallas=False, dtype=jnp.float32)
    B, T = batch["target_ids"].shape
    dec_inputs = jnp.concatenate(
        [jnp.full((B, 1), START_ID, jnp.int32),
         jnp.asarray(batch["target_ids"][:, :-1])], axis=1)
    ours = np.asarray(D.teacher_forced_logits(
        params["decoder"], params["embedding"]["table"], dec_inputs, mem,
        dec_state, train=False, use_pallas=False, dtype=jnp.float32))

    worst = 0.0
    for b in range(B):
        mems, lens, hidden = oracle_encode(modules, d, batch, b)
        tok = START_ID
        with torch.no_grad():
            for t in range(T):
                e = modules["emb"](torch.tensor([[tok]]))[0]
                logits, hidden = modules["dec"](e, mems, lens, hidden)
                err = float(np.abs(ours[b, t] - logits[0].numpy()).max())
                worst = max(worst, err)
                np.testing.assert_allclose(
                    ours[b, t], logits[0].numpy(), atol=atol,
                    err_msg=f"sample {b} step {t}")
                tok = int(batch["target_ids"][b, t])  # teacher forcing
        log(f"sample {b}: {T} teacher-forced steps match (max |d|={worst:.2e})")
    return worst


def check_gradients(composed, d: Dims, rtol=2e-3, atol=3e-5,
                    log=lambda *a: None):
    """FULL-MODEL gradient parity: torch autodiff through the composed
    reference build vs jax.grad through qg_model.loss_fn, same objective
    (mean over samples of per-sample summed teacher-forced CE — reference
    train.py:174-177 backprops the per-sample sum; batch-mean is our
    batched equivalent). Eval-mode BN/no dropout on both sides so the
    regimes match (the reference trains batch-1, where batch-stats are
    degenerate anyway).

    Torch grads are mapped into our layout by running the SAME
    import_checkpoint used for weights — every weight transform is a pure
    relabeling/permutation (the /255 dequant fold happens functionally at
    call time, so it cancels out of the gradient map), hence grads transform
    identically. This closes the matched-BLEU argument's training leg:
    identical forwards (check_teacher_forced) + identical gradients +
    per-parameter Adam = matched training trajectories."""
    modules, mc, params, state, batch = composed
    B, T = batch["target_ids"].shape

    # ---- jax side
    def lf(p):
        return qg_model.loss_fn(p, state, mc, batch, train=False,
                                dtype=jnp.float32)[0]
    jloss, jgrads = jax.value_and_grad(lf)(params)

    # ---- torch side (same objective)
    for m in modules.values():
        for p in m.parameters():
            p.grad = None
    total = 0.0
    for b in range(B):
        mems, lens, hidden = oracle_encode(modules, d, batch, b, grad=True)
        tok, loss_b = START_ID, 0.0
        for t in range(T):
            e = modules["emb"](torch.tensor([[tok]]))[0]
            logits, hidden = modules["dec"](e, mems, lens, hidden)
            loss_b = loss_b + F.cross_entropy(
                logits, torch.tensor([int(batch["target_ids"][b, t])]))
            tok = int(batch["target_ids"][b, t])
        total = total + loss_b
    tloss = total / B
    tloss.backward()
    np.testing.assert_allclose(float(jloss), float(tloss.detach()),
                               rtol=1e-4)

    # ---- map torch grads into our pytree via the import itself
    def grads_sd(module, prefix=""):
        out = {}
        grads = {n: p.grad for n, p in module.named_parameters()}
        for k, v in module.state_dict().items():
            g = grads.get(k)
            if g is None or "bias_hh" in k:
                # buffers have no grad; torch's redundant second LSTM bias
                # must map to ZERO — the import SUMS b_ih+b_hh into our
                # single b, but the grad pullback of a sum-map is copy
                # (dL/db_ih == dL/db_hh == dL/db), not sum
                out[prefix + k] = np.zeros_like(v.numpy())
            else:
                out[prefix + k] = g.numpy()
        return out

    av_g = grads_sd(modules["video"], "video_enc.")
    av_g.update(grads_sd(modules["vggish"], "audio_enc.vggish."))
    text_g = grads_sd(modules["text"], "lstm.")
    emb_g = modules["emb"].weight.grad.numpy()
    text_g["word_embeddings.weight"] = emb_g
    dec_g = grads_sd(modules["dec"])
    dec_g["emb_layer.weight"] = emb_g
    tgrads, _ = TI.import_checkpoint(av_g, text_g, dec_g, emb_g, mc)

    worst = {}
    flat_j = jax.tree_util.tree_flatten_with_path(jgrads)[0]
    flat_t = dict(jax.tree_util.tree_flatten_with_path(tgrads)[0])
    assert len(flat_j) == len(flat_t)
    for path, gj in flat_j:
        name = jax.tree_util.keystr(path)
        gt = np.asarray(flat_t[path])
        gj = np.asarray(gj)
        np.testing.assert_allclose(gj, gt, rtol=rtol, atol=atol,
                                   err_msg=f"grad mismatch at {name}")
        denom = max(float(np.abs(gt).max()), 1e-12)
        worst[name] = float(np.abs(gj - gt).max()) / denom
    top = sorted(worst.items(), key=lambda kv: -kv[1])[:3]
    log(f"loss {float(jloss):.6f}; {len(flat_j)} grad tensors match; "
        f"worst rel {top}")
    return worst


def check_training_equivalence(composed, d: Dims, steps: int = 12,
                               lr: float = 1e-3, rtol: float = 2e-3,
                               log=lambda *a: None):
    """END-TO-END training-trajectory equivalence: reference-style torch
    training (per-sample loop, teacher-forced summed CE, Adam — reference
    train.py:144-181) and our jitted train step, from the SAME init on the
    SAME sample order, must produce the same per-step losses.

    Two documented reference optimizer-structure quirks are normalised out
    (PARITY.md "optimizer quirks"): (1) the shared embedding registered in
    two optimizers (we register every parameter once); (2) torch LSTM's
    duplicated bias b_ih+b_hh — two tensors with identical gradients each
    taking an Adam step, so the EFFECTIVE bias moves twice as far per step
    as a single-bias parameterisation; b_hh is frozen here so both sides
    step each effective parameter exactly once. Everything else — model
    math, gradients, Adam(lr, 0.9/0.999, eps 1e-8) — is identical and this
    check proves it through ``steps`` real updates."""
    import optax

    from mmqg_tpu.train import make_train_step

    modules, mc, params, state, batch = composed
    B, T = batch["target_ids"].shape

    # ---- jax trainer from the imported (shared) init
    opt = optax.adam(lr)
    ts = {"params": params, "model_state": state,
          "opt_state": opt.init(params), "step": jnp.zeros((), jnp.int32)}
    step_fn = make_train_step(mc, opt, dtype=jnp.float32,
                              donate=False)

    # ---- torch trainer (reference style, quirks normalised)
    for m in modules.values():
        m.train()
    torch_params = list(modules["emb"].parameters())
    for name in ("text", "video", "vggish", "dec"):
        for pname, p in modules[name].named_parameters():
            if "bias_hh" in pname:
                p.requires_grad_(False)  # quirk (2) above
            else:
                torch_params.append(p)
    topt = torch.optim.Adam(torch_params, lr=lr)

    j_losses, t_losses = [], []
    rng = jax.random.PRNGKey(3)
    for s in range(steps):
        b = s % B
        sample = {k: np.asarray(v[b:b + 1]) for k, v in batch.items()}

        ts, metrics = step_fn(ts, jax.device_put(sample),
                              jax.random.fold_in(rng, s))
        j_losses.append(float(metrics["loss"]))

        topt.zero_grad()
        mems, lens, hidden = oracle_encode(modules, d, sample, 0, grad=True)
        tok, loss = START_ID, 0.0
        for t in range(T):
            e = modules["emb"](torch.tensor([[tok]]))[0]
            logits, hidden = modules["dec"](e, mems, lens, hidden)
            loss = loss + F.cross_entropy(
                logits, torch.tensor([int(sample["target_ids"][0, t])]))
            tok = int(sample["target_ids"][0, t])
        loss.backward()
        topt.step()
        # metrics["loss"] is the per-token mean; the torch loop summed
        t_losses.append(float(loss.detach())
                        / float(sample["target_len"][0]))

        log(f"step {s} (sample {b}): jax {j_losses[-1]:.6f} "
            f"torch {t_losses[-1]:.6f}")
    if rtol is not None:  # None: caller applies its own horizon-aware check
        np.testing.assert_allclose(j_losses, t_losses, rtol=rtol)
    return j_losses, t_losses


def check_greedy(composed, d: Dims, log=lambda *a: None):
    """Greedy tokens identical through the real serving path
    (decode.decode_batch; reference evaluate.py:70-103)."""
    modules, mc, params, state, batch = composed
    ours = np.asarray(DEC.decode_batch(
        params, state, mc, batch, jax.random.PRNGKey(0), strategy="greedy",
        max_len=d.TGT, use_pallas=False, dtype=jnp.float32))

    for b in range(ours.shape[0]):
        mems, lens, hidden = oracle_encode(modules, d, batch, b)
        tok, ref_toks = START_ID, []
        with torch.no_grad():
            for _ in range(d.TGT):
                e = modules["emb"](torch.tensor([[tok]]))[0]
                logits, hidden = modules["dec"](e, mems, lens, hidden)
                tok = int(torch.argmax(logits[0]))
                ref_toks.append(tok)
                if tok in (END_ID, PAD_ID):   # evaluate.py:101-103 stop
                    break
        got = list(ours[b][:len(ref_toks)])
        assert got == ref_toks, f"sample {b}: {got} != {ref_toks}"
        # after the stop token the serving path pads (documented contract)
        assert all(t == PAD_ID for t in ours[b][len(ref_toks):])
        log(f"sample {b}: greedy tokens identical ({len(ref_toks)} tokens)")
    return ours


def make_rule_batch(d: Dims, n: int, seed: int):
    """n samples whose question is a DETERMINISTIC function of the context
    (class rule: the shared parity of the context tokens picks which of two
    fixed questions follows — EVERY context token carries the class bit, so
    the rule does not hinge on the tiny text LSTM holding one token in
    memory across CTX_MAX steps). Trainable to convergence in a few hundred
    batch-1 Adam steps at tiny dims, and a held-out batch drawn from the
    same rule measures generalisation — final val loss and BLEU become
    model-quality numbers, not memorisation. (Two rules were tried and
    rejected first: token-copy — both sides track each other to 4 decimals
    for 480+ steps but endpoint BLEU stays 0 on both sides, trajectory-
    equivalent but not a convergence claim; first-token-parity — plateaus
    above loss 1.2 after 3200 steps at lr 3e-3/5e-3 because the class bit
    must survive 12 recurrence steps at H=16.)"""
    rng = np.random.RandomState(seed)
    cls = (np.arange(n) % 2).astype(np.int32)                # 0 or 1
    # every context token's parity encodes the class: ids 3+cls, 5+cls, ...
    half = rng.randint(0, (d.V - 4) // 2, (n, d.CTX_MAX)).astype(np.int32)
    ctx = (3 + cls[:, None] + 2 * half).astype(np.int32)
    body = np.stack([3 + cls + 2 * t for t in range(d.TGT - 1)],
                    axis=1)                                  # class-coded
    tgt = np.concatenate([body, np.full((n, 1), END_ID, np.int32)], axis=1)
    audio_len = np.full((n,), d.WIN + d.HOP * (2 * d.MEL_F - 1), np.int32)
    t_frames = min(2, d.AV_MAX)
    return {
        "context_ids": ctx,
        "context_len": np.full((n,), d.CTX_MAX, np.int32),
        "frames": rng.randint(0, 255, (n, t_frames, d.FRAME, d.FRAME, 3)
                              ).astype(np.uint8),
        "frames_len": np.full((n,), t_frames, np.int32),
        "audio_pcm": (rng.randn(n, int(audio_len.max())) * 3000
                      ).astype(np.int16),
        "audio_len": audio_len,
        "target_ids": tgt,
        "target_len": np.full((n,), d.TGT, np.int32),
    }


def check_convergence_equivalence(composed, d: Dims, *, n_train: int = 8,
                                  n_val: int = 4, max_epochs: int = 60,
                                  lr: float = 5e-3, stop_loss: float = 0.05,
                                  plateau_window: int = 20,
                                  plateau_rtol: float = 0.02,
                                  loss_rtol: float = 0.05,
                                  bleu_atol: float = 0.05,
                                  log=lambda *a: None):
    """TRAINED-TO-CONVERGENCE equivalence (round-2 VERDICT missing #3):
    reference-style torch training (per-sample loop, Adam — train.py:131-218)
    and our jitted trainer, from the SAME init on the SAME sample order over
    a learnable rule corpus, run until CONVERGED — both epoch losses under
    ``stop_loss``, or both plateaued (epoch loss improved < ``plateau_rtol``
    relative over the last ``plateau_window`` epochs; the rule corpus
    reaches exact greedy decodes while per-token CE is still ~0.26 and
    decaying harmonically, so an absolute threshold alone would misread
    "converged") — capped at ``max_epochs``; then FINAL val loss and FINAL
    greedy-decode BLEU on a held-out batch (evaluate.py:107-126 semantics)
    must agree within the stated tolerances. Extends the 12-step trajectory
    proof (check_training_equivalence — same optimizer-quirk
    normalisation) into a measured end-state claim. Returns the numbers for
    PARITY.md."""
    import optax

    from mmqg_tpu import metrics as M
    from mmqg_tpu.train import make_train_step

    modules, mc, params, state, _ = composed
    train_b = make_rule_batch(d, n_train, seed=11)
    val_b = make_rule_batch(d, n_val, seed=13)
    T = d.TGT

    opt = optax.adam(lr)
    ts = {"params": params, "model_state": state,
          "opt_state": opt.init(params), "step": jnp.zeros((), jnp.int32)}
    step_fn = make_train_step(mc, opt, dtype=jnp.float32, donate=False)

    for m in modules.values():
        m.train()
    torch_params = list(modules["emb"].parameters())
    for name in ("text", "video", "vggish", "dec"):
        for pname, p in modules[name].named_parameters():
            if "bias_hh" in pname:
                p.requires_grad_(False)  # torch dual-bias quirk, see
                #                          check_training_equivalence
            else:
                torch_params.append(p)
    topt = torch.optim.Adam(torch_params, lr=lr)

    def torch_step(sample):
        topt.zero_grad()
        mems, lens, hidden = oracle_encode(modules, d, sample, 0, grad=True)
        tok, loss = START_ID, 0.0
        for t in range(T):
            e = modules["emb"](torch.tensor([[tok]]))[0]
            logits, hidden = modules["dec"](e, mems, lens, hidden)
            loss = loss + F.cross_entropy(
                logits, torch.tensor([int(sample["target_ids"][0, t])]))
            tok = int(sample["target_ids"][0, t])
        loss.backward()
        topt.step()
        return float(loss.detach()) / T

    rng = jax.random.PRNGKey(3)
    epochs_run, j_epoch, t_epoch = 0, [], []
    for ep in range(max_epochs):
        j_sum = t_sum = 0.0
        for b in range(n_train):
            sample = {k: np.asarray(v[b:b + 1]) for k, v in train_b.items()}
            ts, mets = step_fn(ts, jax.device_put(sample),
                               jax.random.fold_in(rng, ep * n_train + b))
            j_sum += float(mets["loss"])
            t_sum += torch_step(sample)
        j_epoch.append(j_sum / n_train)
        t_epoch.append(t_sum / n_train)
        epochs_run = ep + 1
        log(f"epoch {ep}: jax {j_epoch[-1]:.4f} torch {t_epoch[-1]:.4f}")
        if t_epoch[-1] < stop_loss and j_epoch[-1] < stop_loss:
            break
        if (ep + 1 > plateau_window
                and t_epoch[-1 - plateau_window] - t_epoch[-1]
                < plateau_rtol * t_epoch[-1]
                and j_epoch[-1 - plateau_window] - j_epoch[-1]
                < plateau_rtol * j_epoch[-1]):
            log(f"plateaued at epoch {ep}")
            break
    assert t_epoch[-1] < max(stop_loss, 0.5 * t_epoch[0]), (
        f"torch side did not converge: {t_epoch[0]:.3f} -> {t_epoch[-1]:.3f}")

    # ---- final VAL loss (mean per-sample summed CE, loss_fn's objective)
    for m in modules.values():
        m.eval()
    jb = {k: jnp.asarray(v) for k, v in val_b.items()}
    jb["valid"] = jnp.ones((n_val,), bool)
    j_val = float(qg_model.loss_fn(ts["params"], ts["model_state"], mc, jb,
                                   train=False, dropout_rng=None,
                                   dtype=jnp.float32)[0])
    t_val = 0.0
    for b in range(n_val):
        sample = {k: np.asarray(v[b:b + 1]) for k, v in val_b.items()}
        with torch.no_grad():
            mems, lens, hidden = oracle_encode(modules, d, sample, 0)
            tok, loss = START_ID, 0.0
            for t in range(T):
                e = modules["emb"](torch.tensor([[tok]]))[0]
                logits, hidden = modules["dec"](e, mems, lens, hidden)
                loss = loss + F.cross_entropy(
                    logits, torch.tensor([int(sample["target_ids"][0, t])]))
                tok = int(sample["target_ids"][0, t])
        t_val += float(loss)
    t_val /= n_val
    assert abs(j_val - t_val) <= loss_rtol * abs(t_val), (
        f"final val loss: jax {j_val:.4f} vs torch {t_val:.4f}")

    # ---- final greedy-decode BLEU on the held-out batch (evaluate.py
    # semantics: decode to END/PAD, corpus BLEU vs the rule targets)
    ours = np.asarray(DEC.decode_batch(
        ts["params"], ts["model_state"], mc, jb, jax.random.PRNGKey(0),
        strategy="greedy", max_len=T, use_pallas=False, dtype=jnp.float32))

    def _trim(toks):
        out = []
        for t in toks:
            if t in (END_ID, PAD_ID):
                break
            out.append(int(t))
        return out

    refs = [[_trim(val_b["target_ids"][b])] for b in range(n_val)]
    hyp_j = [_trim(ours[b]) for b in range(n_val)]
    hyp_t = []
    for b in range(n_val):
        sample = {k: np.asarray(v[b:b + 1]) for k, v in val_b.items()}
        with torch.no_grad():
            mems, lens, hidden = oracle_encode(modules, d, sample, 0)
            tok, toks = START_ID, []
            for _ in range(T):
                e = modules["emb"](torch.tensor([[tok]]))[0]
                logits, hidden = modules["dec"](e, mems, lens, hidden)
                tok = int(torch.argmax(logits[0]))
                if tok in (END_ID, PAD_ID):
                    break
                toks.append(tok)
        hyp_t.append(toks)
    # the reference's full metric family (train.py:112-128 logs BLEU and
    # BLEU-1/2/3 every epoch) — at tiny dims the question bodies are 3
    # tokens, so 4-gram BLEU is degenerate (no 4-grams exist on either
    # side); BLEU-1/2/3 and the exact-match count carry the claim
    out = {"epochs": epochs_run, "train_loss_first": t_epoch[0],
           "train_loss_last_jax": j_epoch[-1],
           "train_loss_last_torch": t_epoch[-1],
           "val_loss_jax": j_val, "val_loss_torch": t_val,
           "exact_match_jax": sum(h == r[0] for h, r in zip(hyp_j, refs)),
           "exact_match_torch": sum(h == r[0] for h, r in zip(hyp_t, refs)),
           "n_val": n_val}
    for key, w in M.BLEU_WEIGHTS.items():
        bleu_j = M.corpus_bleu(refs, hyp_j, weights=w)
        bleu_t = M.corpus_bleu(refs, hyp_t, weights=w)
        assert abs(bleu_j - bleu_t) <= bleu_atol, (
            f"final {key}: jax {bleu_j:.4f} vs torch {bleu_t:.4f}")
        out[f"{key}_jax"], out[f"{key}_torch"] = bleu_j, bleu_t
    return out
