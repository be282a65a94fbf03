"""End-to-end quickstart on synthetic data — the complete workflow a
reference (ksg14/multi-modal-qg) user runs, in one script:

  raw mp4s (A/V, self-encoded) + subtitles + labelled question spans
  -> mmqg-prepare   (saliency frames/clips/audio, GloVe, text, vocab/splits)
  -> mmqg-train     (tri-modal attention model, 3 epochs)
  -> mmqg-evaluate  (beam decode, predictions JSON + BLEU)
  -> QGPipeline     (serving: questions straight from a NEW raw mp4)

Everything is synthesized on the fly (no downloads, no ffmpeg binary):
videos come from the native libav fixture encoder when available, else cv2.
Runs on CPU in ~2-4 minutes; on a TPU host the same code jit-compiles for
the chip. Usage:  python examples/quickstart.py [workdir]
"""

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SRT = """1
00:00:00,500 --> 00:00:03,000
The system processes the data stream.

2
00:00:03,000 --> 00:00:06,500
Then the model computes a result value.
"""


def write_video(path: Path, seconds: int = 7, fps: int = 8) -> None:
    """A/V mp4 via the native encoder; silent cv2 mp4 as the fallback."""
    from mmqg_tpu.data import native

    if native.media_available() and native.write_test_av_mp4(
            path, seconds=float(seconds), freq=440, fps=fps):
        return
    import cv2

    vw = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), fps,
                         (64, 48))
    for i in range(seconds * fps):
        vw.write(np.full((48, 64, 3), (i * 7) % 255, np.uint8))
    vw.release()


def main() -> None:
    root = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/mmqg_quickstart")
    from mmqg_tpu.config import Config
    from mmqg_tpu.models.video_encoder import flatten_dim_for

    # small dims so the demo compiles in seconds; the defaults are the
    # reference's full scale (hidden 512, context 283, 112^2 frames)
    config = Config(
        output_path=root / "results", dataset_path=root / "dataset",
        data_path=root / "data", glove_path=root / "glove",
        glove_emb_dim=8, epochs=3, batch_size=4, eval_batch_size=4,
        question_max_length=8, context_max_length=16, av_max_length=3,
        frame_size=32, flatten_dim=flatten_dim_for(32), video_hidden_dim=16,
        text_lstm_hidden_dim=16, text_lstm_layers=2, dec_lstm_hidden_dim=16,
        dec_lstm_layers=2, audio_emb=8, audio_sample_rate=1600,
        stft_window=64, stft_hop=32, mel_bins=16, mel_frames_per_example=16,
        use_pallas=False).ensure_dirs()

    # ---- raw inputs: 2 "lectures" with subs + labelled question spans ----
    print("== synthesizing raw corpus (2 videos, subtitles, questions)")
    config.video_path.mkdir(parents=True, exist_ok=True)
    config.subs_path.mkdir(parents=True, exist_ok=True)
    config.audio_path.mkdir(parents=True, exist_ok=True)
    config.glove_path.mkdir(parents=True, exist_ok=True)
    questions = []
    for vi in range(2):
        vid = f"lecture{vi}"
        write_video(config.video_path / f"{vid}.mp4")
        (config.subs_path / f"{vid}.srt").write_text(SRT)
        for qi in range(3):
            questions.append({
                "video_id": vid,
                "question": f"What does the system process in part {qi} ?",
                "answer_start": "0:01", "answer_end": "0:05",
                "option_1": "the data stream",
            })
    config.questions_file.write_text(json.dumps(questions))
    words = ("what does the system process in part data stream then model "
             "computes a result value 0 1 2 ?").split()
    config.glove_file.write_text("\n".join(
        f"{w} " + " ".join(str(round(0.01 * (i + j), 3))
                           for j in range(config.glove_emb_dim))
        for i, w in enumerate(words)) + "\n")
    cfg_path = config.save(root / "config.json")

    # ---- the four CLI stages a reference user runs ----
    print("== mmqg-prepare (saliency -> glove -> text -> vocab/splits)")
    from mmqg_tpu.cli import prepare_main, train_main
    prepare_main(["-c", str(cfg_path)])

    print("== mmqg-train (tri-modal, 3 epochs)")
    train_main(["-c", str(cfg_path), "--mode", "trimodal"])

    print("== mmqg-evaluate (beam)")
    from mmqg_tpu.evaluate import main as eval_main
    eval_main(["-c", str(cfg_path), "-s", "beam", "--mode", "trimodal",
               "--best"])

    # ---- serving: questions straight from a NEW raw video ----
    print("== serving from a fresh raw mp4 (QGPipeline.generate_from_video)")
    from mmqg_tpu.pipeline import QGPipeline

    new_video = root / "new_lecture.mp4"
    write_video(new_video)
    (root / "new_lecture.srt").write_text(SRT)
    pipe = QGPipeline.from_checkpoint(config, alias="best")
    out = pipe.generate_from_video(
        new_video, spans=[("0:01", "0:04"), ("0:03", "0:06")],
        subtitles=root / "new_lecture.srt", strategy="beam")
    for i, q in enumerate(out):
        print(f"   span {i}: {q!r}")
    print(f"done — artifacts under {root}")


if __name__ == "__main__":
    main()
