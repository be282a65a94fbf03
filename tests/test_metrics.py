"""BLEU vs the NLTK oracle (nltk's bleu_score needs no corpus downloads)."""

import numpy as np
import pytest
from nltk.translate.bleu_score import sentence_bleu as nltk_sentence_bleu

from mmqg_tpu import metrics as M


CASES = [
    (["the cat sat on the mat".split()], "the cat sat on the mat".split()),
    (["the cat sat on the mat".split()], "the cat on mat".split()),
    (["a b c d e f g".split(), "a b c d".split()], "a b c d".split()),
    (["what is the answer ?".split()], "what is an answer ?".split()),
]


@pytest.mark.parametrize("refs,hyp", CASES)
@pytest.mark.parametrize("weights", list(M.BLEU_WEIGHTS.values()))
def test_sentence_bleu_matches_nltk(refs, hyp, weights):
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        expected = nltk_sentence_bleu(refs, hyp, weights=weights)
    got = M.sentence_bleu(refs, hyp, weights)
    assert got == pytest.approx(expected, abs=1e-9)


def test_compat_mode_matches_reference_call():
    """reference train.py:115: sentence_bleu(question.split(), pred_words)."""
    import warnings
    question = "what is a tree"
    pred = ["what", "is", "a", "plant"]
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        expected = nltk_sentence_bleu(question.split(), pred,
                                      weights=(1, 0, 0, 0))
    got = M.reference_compat_bleu(question, pred, (1, 0, 0, 0))
    assert got == pytest.approx(expected, abs=1e-9)


def test_corpus_bleu_perfect_match():
    refs = [[h] for h in (c[1] for c in CASES)]
    hyps = [c[1] for c in CASES]
    assert M.corpus_bleu(refs, hyps) == pytest.approx(1.0)


def test_bleu_suite_keys():
    suite = M.bleu_suite("what is x", ["what", "is", "x"])
    assert set(suite) == {"bleu", "bleu_1", "bleu_2", "bleu_3"}
    assert suite["bleu_1"] == pytest.approx(1.0)


def test_empty_hypothesis():
    assert M.sentence_bleu([["a"]], []) == 0.0
    assert M.corpus_bleu([[["a"]]], [[]]) == 0.0
