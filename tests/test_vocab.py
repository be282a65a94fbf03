import numpy as np

from mmqg_tpu.data.vocab import (END_ID, PAD_ID, START_ID, build_vocab,
                                 build_weight_matrix, encode_tokens, pad_to)


def _corpus():
    return [
        {"question": "what is x ?", "context": "x is a thing", "answer": "a thing"},
        {"question": "why y ?", "context": "y because z", "answer": "z"},
    ]


def test_reserved_ids():
    vocab, itow = build_vocab(_corpus())
    assert vocab["<pad>"] == PAD_ID == 0
    assert vocab["<start>"] == START_ID == 1
    assert vocab["<end>"] == END_ID == 2
    assert itow[0] == "<pad>" and itow[1] == "<start>" and itow[2] == "<end>"


def test_first_seen_order():
    # question tokens enter the vocab before context tokens of the same record
    vocab, _ = build_vocab(_corpus())
    assert vocab["what"] == 3
    assert vocab["is"] == 4
    assert vocab["x"] == 5


def test_weight_matrix_semantics():
    vocab, _ = build_vocab(_corpus())
    glove = np.arange(12, dtype=np.float32).reshape(2, 6)
    g_idx = {"what": 0, "thing": 1}
    wm = build_weight_matrix(vocab, glove, g_idx, 6,
                             rng=np.random.RandomState(0))
    assert wm.shape == (len(vocab), 6)
    np.testing.assert_array_equal(wm[vocab["what"]], glove[0])
    np.testing.assert_array_equal(wm[vocab["thing"]], glove[1])
    np.testing.assert_array_equal(wm[PAD_ID], np.zeros(6))  # <pad> stays zero
    assert np.abs(wm[vocab["is"]]).sum() > 0  # OOV got random init


def test_encode_and_pad():
    vocab, _ = build_vocab(_corpus())
    ids = encode_tokens("what is x ? <end>", vocab)
    assert ids.tolist() == [3, 4, 5, 6, END_ID]
    padded = pad_to(ids, 8)
    assert padded.tolist() == [3, 4, 5, 6, END_ID, 0, 0, 0]
    assert pad_to(ids, 3).tolist() == [3, 4, 5]


def test_prepare_data_artifacts(tiny_config, tiny_corpus):
    # splits follow sklearn's 80/10/10 seed-42 contract (reference prepare_data.py:9-24)
    n_train, n_val, n_test = tiny_corpus["splits"]
    assert n_train + n_val + n_test == 12
    assert n_train >= 9
    assert tiny_config.vocab_file.exists()
    assert tiny_config.weights_matrix_file.exists()
    wm = np.load(tiny_config.weights_matrix_file)
    assert wm.shape[0] == len(tiny_corpus["vocab"])
    assert wm.dtype == np.float32  # NOT int64 (reference train.py:227 bug)
