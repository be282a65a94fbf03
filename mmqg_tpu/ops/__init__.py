"""TPU kernels (Pallas) + XLA reference implementations for the hot ops.

Every op ships two interchangeable implementations:
  *_xla     — pure jax.numpy; used on CPU (tests) and as numerics oracle
  *_pallas  — fused Pallas TPU kernel; selected on TPU backends

Dispatch helpers pick per-backend; ``Config.use_pallas=False`` forces XLA.
"""

from mmqg_tpu.ops.attention import trimodal_attention  # noqa: F401
