"""Learning-capability proof: on a corpus where the question IS a function of
the context (first tokens + '?'), training must drive val BLEU well above
chance — a far stronger check than loss-goes-down. The trained model is also
the fixture for decode-quality checks (beam vs greedy, round-1 VERDICT item
9): beam search is a capability the reference lacks (evaluate.py:70-103 has
only greedy/sampling/topk), so its quality claim needs its own evidence."""

import json

import jax
import numpy as np
import pytest

from mmqg_tpu import decode as DEC
from mmqg_tpu.data.dataset import QGDataset
from mmqg_tpu.data.vocab import prepare_data
from mmqg_tpu.models import qg_model
from mmqg_tpu.train import Trainer, batch_arrays, evaluate_bleu

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


@pytest.fixture(scope="module")
def trained(derivable_config):
    """Train once on the derivable corpus; share across quality tests."""
    config = derivable_config
    train_ds = QGDataset(config, config.train_file, load_media=False)
    val_ds = QGDataset(config, config.val_file, load_media=False)
    emb = np.load(config.weights_matrix_file).astype(np.float32)
    mc = qg_model.ModelConfig.from_config(config, n_vocab=len(train_ds.vocab),
                                          mode="text")
    tr = Trainer(config, mc, emb, train_ds, val_ds, log_fn=lambda *a: None)
    first_val = tr.validate()
    # 30 epochs: enough that model likelihood tracks accuracy (at 12 epochs
    # the ranking beam vs greedy is still noise — measured while writing
    # test_beam_bleu_at_least_greedy)
    tr.fit(epochs=30)
    return config, mc, tr, val_ds, first_val


def test_model_learns_derivable_mapping(trained):
    config, mc, tr, val_ds, first_val = trained
    last_val = tr.validate()
    # unigram BLEU on copy-the-prefix questions must rise substantially
    assert last_val["bleu_1"] > max(0.35, first_val["bleu_1"] + 0.2), (
        f"no learning: bleu_1 {first_val['bleu_1']:.3f} -> "
        f"{last_val['bleu_1']:.3f}")
    assert last_val["loss"] < first_val["loss"] * 0.7


def _corpus_bleu(tokens_per_batch, batches, val_ds):
    sums, n = {}, 0
    for toks, batch in zip(tokens_per_batch, batches):
        suite, k = evaluate_bleu(toks, batch.questions, val_ds.index_to_word,
                                 batch.valid)
        for key, v in suite.items():
            sums[key] = sums.get(key, 0.0) + v * k
        n += k
    return {k: v / max(n, 1) for k, v in sums.items()}


def test_beam_bleu_at_least_greedy(trained):
    """Length-penalty sweep on the trained model (VERDICT r1 item 9): the
    best beam setting must not lose BLEU vs greedy — beam maximises model
    log-likelihood, and on a learnable corpus likelihood tracks accuracy."""
    config, mc, tr, val_ds, _ = trained
    params = tr.train_state["params"]
    state = tr.train_state["model_state"]
    max_len = config.question_max_length

    batches = list(val_ds.batches(config.eval_batch_size))
    arrays = [batch_arrays(b) for b in batches]
    greedy = [np.asarray(DEC.decode_batch(
        params, state, mc, a, jax.random.PRNGKey(0), strategy="greedy",
        max_len=max_len, use_pallas=False)) for a in arrays]
    g_bleu = _corpus_bleu(greedy, batches, val_ds)

    beam_scores = {}
    for lp in (0.0, 0.6, 1.0):
        beam = [np.asarray(DEC.beam_decode_batch(
            params, state, mc, a, max_len=max_len, beam_size=4,
            length_penalty=lp, use_pallas=False)) for a in arrays]
        beam_scores[lp] = (_corpus_bleu(beam, batches, val_ds), beam)

    # at lp=0 beam maximises raw sequence log-prob, so per-row dominance
    # over greedy is a hard guarantee (rescored with the model itself)
    g_lp = np.concatenate([np.asarray(DEC.sequence_logprob(
        params, state, mc, a, t, use_pallas=False, dtype=np.float32))
        for a, t in zip(arrays, greedy)])
    b_lp = np.concatenate([np.asarray(DEC.sequence_logprob(
        params, state, mc, a, t, use_pallas=False, dtype=np.float32))
        for a, t in zip(arrays, beam_scores[0.0][1])])
    assert (b_lp >= g_lp - 1e-3).all(), (
        f"beam-4 lost likelihood vs greedy on rows "
        f"{np.where(b_lp < g_lp - 1e-3)[0]}")

    best_lp = max(beam_scores, key=lambda lp: beam_scores[lp][0]["bleu_1"])
    best = beam_scores[best_lp][0]
    assert best["bleu_1"] >= g_bleu["bleu_1"] - 0.02, (
        f"beam-4 (lp={best_lp}) bleu_1 {best['bleu_1']:.3f} < "
        f"greedy {g_bleu['bleu_1']:.3f}")
    # bigram BLEU must not collapse either
    assert best["bleu_2"] >= g_bleu["bleu_2"] - 0.05
