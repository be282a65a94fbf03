"""Text normalisation and tokenisation.

Capability parity with the reference's ``preprocess_text.py`` (decontraction
:9-33, hyphen/underscore stripping :37-39, punctuation spacing :51-54, NLTK
``word_tokenize`` + alpha/numeric/punct filter :56-64) — but with **no NLTK
dependency**: this environment has no punkt data, and a hermetic tokenizer is
a hard requirement for a deployable framework. The tokenizer below is a
Treebank-style rule tokenizer; after the reference's own pre-splitting of
``. , ? !`` and de-contraction, the downstream ``isalpha()/isnumeric()``
filter (reference preprocess_text.py:60-64) makes the two pipelines agree on
real corpus text.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

# (pattern, replacement) pairs — reference preprocess_text.py:9-33, with both
# ASCII ' and typographic ' apostrophes.
_CONTRACTIONS: List[Tuple[re.Pattern, str]] = [
    (re.compile(r"won['’]t"), "will not"),
    (re.compile(r"can['’]t"), "can not"),
    (re.compile(r"let['’]s"), "let us"),
    (re.compile(r"n['’]t"), " not"),
    (re.compile(r"['’]re"), " are"),
    (re.compile(r"['’]s"), " is"),
    (re.compile(r"['’]d"), " would"),
    (re.compile(r"['’]ll"), " will"),
    (re.compile(r"['’]t"), " not"),
    (re.compile(r"['’]ve"), " have"),
    (re.compile(r"['’]m"), " am"),
]

_ALLOWED_PUNCT = {",", ".", "?", "!"}

# Treebank-flavoured word splitter: words (incl. unicode letters), numbers
# (incl. decimals), or any single non-space symbol.
_TOKEN_RE = re.compile(r"\d+(?:\.\d+)?|\w+|[^\w\s]", re.UNICODE)


def decontract(phrase: str) -> str:
    """Expand English contractions (reference preprocess_text.py:9-33)."""
    for pat, rep in _CONTRACTIONS:
        phrase = pat.sub(rep, phrase)
    return phrase


def tokenize(text: str) -> List[str]:
    """Hermetic Treebank-style tokenizer (replaces NLTK word_tokenize)."""
    return _TOKEN_RE.findall(text)


def preprocess_text(text: str) -> Optional[str]:
    """Normalise one string exactly as reference preprocess_text.py:35-68:
    de-hyphenate, de-contract, pad sentence punctuation, tokenize, keep only
    alpha / numeric / {, . ? !} tokens. Returns None for empty results."""
    text = text.replace("—", " ").replace("-", " ").replace("_", " ")
    text = decontract(text)
    for p in (".", ",", "?", "!"):
        text = text.replace(p, f" {p}")

    filtered = []
    for tok in tokenize(text):
        if tok.isalpha() or tok.isnumeric():
            filtered.append(tok)
        elif tok in _ALLOWED_PUNCT:
            filtered.append(tok)
    if not filtered:
        return None
    return " ".join(filtered)


def preprocess_corpus(corpus: List[Dict]) -> Tuple[int, Optional[List[Dict]]]:
    """Normalise question/context/answer of every record
    (reference preprocess_text.py:70-78). Returns (failed_question_id, corpus)
    with failed id == -1 on success; unlike the reference (which only checked
    'question' three times — a copy-paste bug at :76), all three fields are
    validated."""
    for rec in corpus:
        for key in ("question", "context", "answer"):
            rec[key] = preprocess_text(rec[key])
        if any(rec[k] is None for k in ("question", "context", "answer")):
            return rec["question_id"], None
    return -1, corpus


def lowercase_subtitle(subtitle: str) -> str:
    """Caption cleanup (reference dataset/get_salient_text.py:18-22)."""
    return subtitle.lower().replace("\n", " ").strip()
