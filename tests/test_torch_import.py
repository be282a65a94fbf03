"""Numerical parity: reference-architecture torch modules -> imported pytrees.

Live torch modules (built exactly like the reference's, small dims) are the
oracle; their state_dicts are imported with mmqg_tpu.compat.torch_import and
the jax forward passes must match to float tolerance. This is the proof that
reference-trained checkpoints can be served by this framework."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F
from torch import nn

from mmqg_tpu.compat import torch_import as TI
from mmqg_tpu.models import decoder as D
from mmqg_tpu.models import layers as L
from mmqg_tpu.models import text_encoder, video_encoder


def _prefix(sd, p):
    return {f"{p}{k}": v.numpy() for k, v in sd.items()}


def test_text_encoder_parity():
    In, H, NL, B, T = 8, 16, 3, 2, 5
    torch_lstm = nn.LSTM(In, H, NL)
    emb = nn.Embedding(20, In)
    params = {"text_enc": TI.import_text_encoder(
        _prefix(torch_lstm.state_dict(), "lstm."), NL)}

    ids = np.random.RandomState(0).randint(0, 20, (B, T)).astype(np.int32)
    lens = np.asarray([T, 3], np.int32)

    outs, (h, c) = text_encoder.apply(
        params["text_enc"], jnp.asarray(emb.weight.detach().numpy()),
        jnp.asarray(ids), jnp.asarray(lens), dtype=jnp.float32)

    with torch.no_grad():
        for b, n in enumerate(lens):
            e = emb(torch.tensor(ids[b:b+1, :n], dtype=torch.long))
            t_out, (t_h, t_c) = torch_lstm(e.transpose(0, 1))
            np.testing.assert_allclose(np.asarray(outs[b, :n]),
                                       t_out[:, 0].numpy(), atol=1e-5)
            np.testing.assert_allclose(np.asarray(h[:, b]),
                                       t_h[:, 0].numpy(), atol=1e-5)
            # the decoder is seeded with (h, c): the cell state matters too
            np.testing.assert_allclose(np.asarray(c[:, b]),
                                       t_c[:, 0].numpy(), atol=1e-5)


class _RefVideo(nn.Module):
    """Reference VideoConvLstmEncoder shapes (model/encoder.py:31-78)."""

    def __init__(self, flatten_dim, hidden):
        super().__init__()
        self.conv1, self.bn1 = nn.Conv2d(3, 4, 3), nn.BatchNorm2d(4)
        self.conv2, self.bn2 = nn.Conv2d(4, 6, 3), nn.BatchNorm2d(6)
        self.conv3, self.bn3 = nn.Conv2d(6, 8, 3), nn.BatchNorm2d(8)
        self.conv4, self.bn4 = nn.Conv2d(8, 10, 3), nn.BatchNorm2d(10)
        self.pool = nn.MaxPool2d(3, 3)
        self.lstm = nn.LSTM(flatten_dim, hidden)

    def forward(self, frames):  # (T, 3, H, W)
        x = self.pool(self.bn2(F.relu(self.conv2(
            self.bn1(F.relu(self.conv1(frames)))))))
        x = self.pool(self.bn4(F.relu(self.conv4(
            self.bn3(F.relu(self.conv3(x)))))))
        x = x.flatten(1)
        out, _ = self.lstm(x.view(x.shape[0], 1, -1))
        return out.squeeze(1)


def test_video_encoder_parity():
    size, hidden = 32, 16
    flat = video_encoder.flatten_dim_for(size)
    m = _RefVideo(flat, hidden).eval()
    # nudge BN running stats off their init so the test is non-trivial
    with torch.no_grad():
        for bn in (m.bn1, m.bn2, m.bn3, m.bn4):
            bn.running_mean.uniform_(-0.1, 0.1)
            bn.running_var.uniform_(0.9, 1.1)

    feat_hw = int(np.sqrt(flat // 10))
    params, state = TI.import_video_encoder(
        {k: v.numpy() for k, v in m.state_dict().items()},
        feat_hw=feat_hw, channels=10)

    T = 3
    frames = np.random.RandomState(1).rand(1, T, size, size, 3).astype(np.float32)
    ours, _ = video_encoder.apply(params, state, jnp.asarray(frames),
                                  jnp.asarray([T]), dtype=jnp.float32)
    with torch.no_grad():
        t_out = m(torch.tensor(frames[0]).permute(0, 3, 1, 2))
    np.testing.assert_allclose(np.asarray(ours[0]), t_out.numpy(), atol=2e-4)


class _RefAttnDecoder(nn.Module):
    """Reference AttnDecoder shapes (model/decoder.py:49-125), with its no-op
    masks dropped (we compare at full lengths where masking is identity)."""

    def __init__(self, emb_dim, hidden, n_vocab, Lt, La, Hv, Ha, NL):
        super().__init__()
        self.text_attn = nn.Linear(emb_dim + hidden, Lt)
        self.vid_attn = nn.Linear(emb_dim + hidden, La)
        self.audio_attn = nn.Linear(emb_dim + hidden, La)
        self.lstm = nn.LSTM(emb_dim + hidden + Ha + Hv, hidden, NL)
        self.out_layer = nn.Linear(hidden, n_vocab)

    def forward(self, emb, enc_text, enc_video, enc_audio, hidden):
        q = torch.cat([emb, hidden[0][-1]], dim=1)
        a_t = F.softmax(self.text_attn(q), dim=1)
        a_v = F.softmax(self.vid_attn(q), dim=1)
        a_a = F.softmax(self.audio_attn(q), dim=1)
        ctx_t = torch.bmm(a_t.unsqueeze(1), enc_text).squeeze(1)
        ctx_v = torch.bmm(a_v.unsqueeze(1), enc_video).squeeze(1)
        ctx_a = torch.bmm(a_a.unsqueeze(1), enc_audio).squeeze(1)
        x = torch.cat([emb, ctx_t, ctx_a, ctx_v], dim=1).unsqueeze(0)
        out, hidden = self.lstm(x, hidden)
        return self.out_layer(out[0]), hidden


def test_attn_decoder_step_parity():
    emb_dim, hidden, V, Lt, La, Hv, Ha, NL, B = 8, 16, 30, 6, 4, 16, 8, 3, 2
    m = _RefAttnDecoder(emb_dim, hidden, V, Lt, La, Hv, Ha, NL).eval()
    params = TI.import_attn_decoder(
        {k: v.numpy() for k, v in m.state_dict().items()}, NL)

    rng = np.random.RandomState(2)
    emb_table = rng.randn(V, emb_dim).astype(np.float32)
    word = np.asarray([3, 7], np.int32)
    et = rng.randn(B, Lt, hidden).astype(np.float32)
    ev = rng.randn(B, La, Hv).astype(np.float32)
    ea = rng.randn(B, La, Ha).astype(np.float32)
    h0 = rng.randn(NL, B, hidden).astype(np.float32)
    c0 = rng.randn(NL, B, hidden).astype(np.float32)

    mem = D.Memories(enc_text=jnp.asarray(et), enc_video=jnp.asarray(ev),
                     enc_audio=jnp.asarray(ea),
                     text_len=jnp.full((B,), Lt, jnp.int32),
                     video_len=jnp.full((B,), La, jnp.int32),
                     audio_len=jnp.full((B,), La, jnp.int32))
    logits, (h1, c1), _ = D.step(params, jnp.asarray(emb_table),
                                 jnp.asarray(word), mem,
                                 (jnp.asarray(h0), jnp.asarray(c0)),
                                 train=False, use_pallas=False,
                                 dtype=jnp.float32)
    with torch.no_grad():
        t_logits, (t_h, t_c) = m(torch.tensor(emb_table[word]),
                                 torch.tensor(et), torch.tensor(ev),
                                 torch.tensor(ea),
                                 (torch.tensor(h0), torch.tensor(c0)))
    np.testing.assert_allclose(np.asarray(logits), t_logits.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(h1), t_h.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c1), t_c.numpy(), atol=1e-5)
