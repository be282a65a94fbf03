"""The complete reference workflow on synthetic raw data:
videos (cv2-encoded mp4) + subtitles (srt) + wavs + labelled questions
-> saliency extraction (frames/clips/text)  [dataset/*.py stages]
-> text normalisation + vocab + splits      [preprocess_text.py, prepare_data.py]
-> training with checkpoints                [train.py]
-> evaluate CLI with predictions JSON       [evaluate.py]
One test = the whole pipeline a reference user runs."""

import json

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from mmqg_tpu.data import wav as wavio
from mmqg_tpu.data.glove import ingest_glove


def _write_video(path, n_seconds, fps=8, size=(32, 32)):
    vw = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), fps, size)
    assert vw.isOpened()
    for i in range(n_seconds * fps):
        vw.write(np.full((size[1], size[0], 3), (i * 7) % 255, np.uint8))
    vw.release()


SRT = """1
00:00:00,500 --> 00:00:03,000
The system processes the data stream.

2
00:00:03,000 --> 00:00:06,500
Then the model computes a result value.
"""


def test_full_reference_workflow(tiny_config, tmp_path):
    config = tiny_config.replace(
        dataset_path=tmp_path / "dataset", data_path=tmp_path / "data",
        output_path=tmp_path / "results", glove_path=tmp_path / "glove",
        epochs=1, lr=1e-3)
    config.ensure_dirs()
    config.glove_path.mkdir(parents=True, exist_ok=True)

    # ---- raw inputs: 2 videos, subs, wavs, labelled questions ----
    config.video_path.mkdir(parents=True)
    config.subs_path.mkdir(parents=True)
    config.audio_path.mkdir(parents=True)
    questions = []
    for vi in range(2):
        vid = f"lecture{vi}"
        _write_video(config.video_path / f"{vid}.mp4", n_seconds=7)
        (config.subs_path / f"{vid}.srt").write_text(SRT)
        rate = 8000
        sig = (0.1 * np.sin(np.linspace(0, 999, rate * 7))).astype(np.float32)
        wavio.write_wav(config.audio_path / f"{vid}.wav", sig, rate)
        for qi in range(3):
            questions.append({
                "video_id": vid,
                "question": f"What does the system process in part {qi}?",
                "answer_start": "0:01", "answer_end": "0:05",
                "option_1": "the data stream",
            })
    with open(config.questions_file, "w") as f:
        json.dump(questions, f)

    # glove artifacts
    words = ("what does the system process in part data stream then model "
             "computes a result value 0 1 2 ?").split()
    config.glove_file.write_text("\n".join(
        f"{w} " + " ".join(str(round(0.01 * (i + j), 3))
                           for j in range(config.glove_emb_dim))
        for i, w in enumerate(words)) + "\n")

    # ---- offline prep: saliency -> glove -> text -> data ----
    from mmqg_tpu.cli import prepare_main
    cfg_path = config.save(tmp_path / "cfg.json")
    prepare_main(["-c", str(cfg_path), "--stages", "saliency,glove,text,data"])

    assert config.salient_text_file.exists()
    assert len(list(config.salient_frames_path.glob("*.npy"))) == 6
    assert len(list(config.salient_audio_path.glob("*.wav"))) == 6
    with open(config.vocab_file) as f:
        vocab = json.load(f)
    assert vocab["<pad>"] == 0 and "system" in vocab

    # ---- train 1 epoch (trimodal) ----
    from mmqg_tpu.cli import train_main
    train_main(["-c", str(cfg_path), "--mode", "trimodal", "--epochs", "1"])
    assert (config.checkpoint_dir / "best.msgpack").exists()

    # ---- evaluate CLI on the test split ----
    from mmqg_tpu.evaluate import main as eval_main
    bleu = eval_main(["-c", str(cfg_path), "-s", "greedy", "--mode",
                      "trimodal", "--best"])
    assert "bleu" in bleu
    preds_file = config.output_path / "best_predictions_greedy.json"
    with open(preds_file) as f:
        preds = json.load(f)
    assert preds and set(preds[0]) == {"question_id", "gt_question",
                                       "pred_question"}
