"""Data layer: text normalisation, vocab, GloVe, subtitles, saliency, batching.

TPU-first stance: everything downstream of this package consumes **fixed-shape
padded numpy batches** (the reference fed per-sample variable-length tensors
through batch_size=1 DataLoaders — reference train.py:233-234, utils/dataset.py:8-55).
"""

from mmqg_tpu.data.text_prep import preprocess_text, preprocess_corpus, tokenize  # noqa: F401
from mmqg_tpu.data.vocab import build_vocab, save_weight_matrix, split_data  # noqa: F401
from mmqg_tpu.data.dataset import QGDataset, Batch  # noqa: F401
