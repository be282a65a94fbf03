from mmqg_tpu.data.text_prep import decontract, preprocess_corpus, preprocess_text


def test_decontract():
    assert decontract("won't can't let's") == "will not can not let us"
    assert decontract("it's they're I'll we've I'm") == \
        "it is they are I will we have I am"
    assert decontract("it’s") == "it is"  # typographic apostrophe


def test_preprocess_basic():
    assert preprocess_text("Hello, world!") == "Hello , world !"
    assert preprocess_text("state-of-the-art") == "state of the art"
    assert preprocess_text("a_b—c") == "a b c"


def test_preprocess_filters_symbols():
    # only alpha/numeric and , . ? ! survive (reference preprocess_text.py:57-64)
    out = preprocess_text("cost: $5 (approx.) & 10% more?")
    assert out == "cost 5 approx . 10 more ?"


def test_preprocess_empty_returns_none():
    assert preprocess_text("@#$%") is None
    assert preprocess_text("") is None


def test_preprocess_corpus_validates_all_fields():
    corpus = [{"question_id": 7, "question": "ok?", "context": "@#$",
               "answer": "fine"}]
    failed_id, result = preprocess_corpus(corpus)
    assert failed_id == 7 and result is None

    corpus = [{"question_id": 0, "question": "What is X?",
               "context": "X is a thing.", "answer": "a thing"}]
    failed_id, result = preprocess_corpus(corpus)
    assert failed_id == -1
    assert result[0]["question"] == "What is X ?"
