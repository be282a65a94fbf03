import json
import pickle

import numpy as np

from mmqg_tpu.data.glove import ingest_glove, parse_glove_file


def test_parse_glove(tmp_path):
    txt = tmp_path / "glove.txt"
    txt.write_text("hello 0.1 0.2 0.3\nworld -1 2 3.5\n")
    words, w2i, m = parse_glove_file(txt, 3)
    assert words == ["hello", "world"]
    assert w2i == {"hello": 0, "world": 1}
    np.testing.assert_allclose(m, [[0.1, 0.2, 0.3], [-1, 2, 3.5]])
    assert m.dtype == np.float32


def test_ingest_glove_artifacts(tiny_config, tmp_path):
    config = tiny_config.replace(glove_path=tmp_path, glove_emb_dim=2)
    config.glove_file.write_text("a 1 2\nb 3 4\n")
    m = ingest_glove(config)
    assert m.shape == (2, 2)
    assert np.load(config.glove_matrix_file).shape == (2, 2)
    with open(config.glove_idx_file, "rb") as f:
        assert pickle.load(f) == {"a": 0, "b": 1}


def test_prepare_cli_stages(tiny_config, tiny_corpus, tmp_path):
    """mmqg-prepare text+data stages over an existing salient-text artifact."""
    from mmqg_tpu.cli import prepare_main

    config = tiny_config.replace(data_path=tmp_path / "data")
    config.ensure_dirs()
    # salient-text artifact: raw (pre-normalisation) records
    config.salient_text_file.parent.mkdir(parents=True, exist_ok=True)
    recs = [{"question_id": i, "video_id": "v0",
             "question": f"What is thing-{i}?",
             "context": "it's a thing. really!",
             "answer": "a thing"} for i in range(10)]
    with open(config.salient_text_file, "w") as f:
        json.dump(recs, f)
    cfg_path = config.save(tmp_path / "cfg.json")

    prepare_main(["-c", str(cfg_path), "--stages", "text,data"])
    assert config.preprocessed_text_file.exists()
    assert config.vocab_file.exists()
    with open(config.vocab_file) as f:
        vocab = json.load(f)
    assert vocab["<pad>"] == 0 and "thing" in vocab
    assert config.train_file.exists() and config.test_file.exists()


def test_train_cli_smoke(tiny_config, tiny_corpus, tmp_path):
    from mmqg_tpu.cli import train_main

    config = tiny_config.replace(output_path=tmp_path / "out", epochs=1,
                                 lr=1e-3)
    cfg_path = config.save(tmp_path / "cfg.json")
    train_main(["-c", str(cfg_path), "--mode", "text", "--epochs", "1"])
    assert (config.checkpoint_dir / "last.msgpack").exists()
    assert config.stats_json_path.exists()
