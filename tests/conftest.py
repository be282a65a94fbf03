"""Test harness: force an 8-device virtual CPU platform BEFORE jax imports so
multi-chip sharding logic is exercised without TPU hardware (SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the outer env may pin a TPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# the axon sitecustomize registers a TPU backend in every process and wins
# over the env var, so pin the platform through jax.config as well
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from mmqg_tpu.config import Config  # noqa: E402


def pytest_collection_modifyitems(config, items):
    """Run the virtual-mesh suite FIRST, the end-to-end suite last.

    XLA:CPU can abort the process (no diagnostic) when mesh-sharded donated
    train steps run AFTER long single-device compiles in the same process —
    intermittent, never seen with the mesh tests first or standalone
    (NOTES_NEXT_ROUND.md "Known flake"; scripts/repro_cpu_mesh_abort.py).
    An earlier version of this hook only moved test_end_to_end last, which
    still left ~95 single-device tests ahead of the mesh suite — and the
    abort recurred there. Mesh tests truly first sidesteps the unsound
    interleaving while keeping them in-process."""
    def key(item):
        path = str(item.fspath)
        if path.endswith("test_parallel.py"):
            return -1
        return 1 if path.endswith("test_end_to_end.py") else 0
    items.sort(key=key)


@pytest.fixture(scope="session")
def tiny_config(tmp_path_factory) -> Config:
    """A miniature Config: tiny sequence lengths / frames / audio so every
    test compiles in seconds on CPU."""
    root = tmp_path_factory.mktemp("tiny")
    from mmqg_tpu.models.video_encoder import flatten_dim_for

    return Config(
        output_path=root / "results",
        dataset_path=root / "dataset",
        data_path=root / "data",
        glove_path=root / "glove.6B",
        glove_emb_dim=8,
        epochs=2,
        batch_size=4,
        eval_batch_size=4,
        question_max_length=6,
        context_max_length=12,
        av_max_length=3,
        frame_size=32,
        flatten_dim=flatten_dim_for(32),
        video_hidden_dim=16,
        text_lstm_hidden_dim=16,
        text_lstm_layers=2,
        dec_lstm_hidden_dim=16,
        dec_lstm_layers=2,
        audio_emb=8,
        audio_sample_rate=1600,
        stft_window=64,
        stft_hop=32,
        mel_bins=16,
        mel_frames_per_example=16,
        use_pallas=False,
    ).ensure_dirs()


@pytest.fixture(scope="session")
def tiny_corpus(tiny_config):
    """Synthetic corpus + artifacts on disk (frames npy, wav clips, splits)."""
    from tests.fixtures import build_tiny_corpus

    return build_tiny_corpus(tiny_config, n_questions=12, seed=0)
