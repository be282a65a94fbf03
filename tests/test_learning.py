"""Learning-capability proof: on a corpus where the question IS a function of
the context (first tokens + '?'), training must drive val BLEU well above
chance — a far stronger check than loss-goes-down."""

import json

import numpy as np
import pytest

from mmqg_tpu.data.dataset import QGDataset
from mmqg_tpu.data.vocab import prepare_data
from mmqg_tpu.models import qg_model
from mmqg_tpu.train import Trainer

_WORDS = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
          "lam mu nu xi omicron pi rho sigma tau").split()


@pytest.fixture(scope="module")
def derivable_config(tiny_config, tmp_path_factory):
    root = tmp_path_factory.mktemp("derivable")
    config = tiny_config.replace(
        output_path=root / "results", data_path=root / "data",
        dataset_path=root / "dataset", glove_path=root / "glove",
        lr=1e-2, batch_size=8)
    config.ensure_dirs()
    config.glove_path.mkdir(parents=True, exist_ok=True)

    rng = np.random.default_rng(7)
    corpus = []
    for qid in range(48):
        ctx_words = list(rng.choice(_WORDS, size=8))
        question = " ".join(ctx_words[:3]) + " ?"
        corpus.append({
            "question_id": qid, "video_id": f"v{qid % 3}",
            "question": question, "context": " ".join(ctx_words),
            "answer": ctx_words[0],
        })
    # glove artifacts (random embeddings for all words)
    import pickle
    glove = rng.normal(size=(len(_WORDS), config.glove_emb_dim)).astype(np.float32)
    np.save(config.glove_matrix_file, glove)
    with open(config.glove_idx_file, "wb") as f:
        pickle.dump({w: i for i, w in enumerate(_WORDS)}, f)
    with open(config.glove_words_file, "wb") as f:
        pickle.dump(_WORDS, f)
    with open(config.preprocessed_text_file, "w") as f:
        json.dump(corpus, f)
    prepare_data(config, corpus)
    return config


def test_model_learns_derivable_mapping(derivable_config):
    config = derivable_config
    train_ds = QGDataset(config, config.train_file, load_media=False)
    val_ds = QGDataset(config, config.val_file, load_media=False)
    emb = np.load(config.weights_matrix_file).astype(np.float32)
    mc = qg_model.ModelConfig.from_config(config, n_vocab=len(train_ds.vocab),
                                          mode="text")
    tr = Trainer(config, mc, emb, train_ds, val_ds, log_fn=lambda *a: None)
    first_val = tr.validate()
    tr.fit(epochs=12)
    last_val = tr.validate()
    # unigram BLEU on copy-the-prefix questions must rise substantially
    assert last_val["bleu_1"] > max(0.35, first_val["bleu_1"] + 0.2), (
        f"no learning: bleu_1 {first_val['bleu_1']:.3f} -> "
        f"{last_val['bleu_1']:.3f}")
    assert last_val["loss"] < first_val["loss"] * 0.7
