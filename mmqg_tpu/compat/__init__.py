"""Reference-interop: import torch checkpoints into mmqg_tpu pytrees (and
export back). Re-exports the user-facing converters; the full surface lives
in torch_import.py / torch_export.py."""

from mmqg_tpu.compat.torch_export import export_checkpoint  # noqa: F401
from mmqg_tpu.compat.torch_import import (  # noqa: F401
    import_checkpoint, import_video_resnet, load_pretrained_video_resnet,
)
