"""Scaling layer: device meshes, sharding rules, distributed train/eval.

The reference had no parallelism of any kind (single CPU process, batch 1 —
reference train.py:223,233; SURVEY.md §2 C26-C28). This package supplies the
TPU-native equivalents: a (data, model) ``jax.sharding.Mesh``, partition rules
for every parameter/batch leaf, and jit-compiled steps whose collectives
(grad psum for DP, all-gathers for TP) are emitted by XLA/GSPMD over ICI —
and, across hosts/slices, a ``jax.distributed`` multi-process runtime whose
collectives ride DCN (multihost.py).
"""

from mmqg_tpu.parallel.gpipe import (  # noqa: F401
    gpipe, microbatch, stack_stage_params, unmicrobatch,
)
from mmqg_tpu.parallel.mesh import (  # noqa: F401
    fsdp_shardings, make_mesh, batch_sharding, pad_and_shard_batch,
    param_shardings, shard_batch, shard_opt_state, shard_params,
    shard_params_fsdp, zero1_shardings,
)
from mmqg_tpu.parallel.multihost import (  # noqa: F401
    assemble_global_batch, global_max_int, initialize_multihost, is_primary,
    loader_local_rows, local_row_range, place_global, to_host,
)
