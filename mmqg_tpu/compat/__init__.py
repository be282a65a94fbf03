"""Reference-interop: import torch checkpoints into mmqg_tpu pytrees."""
