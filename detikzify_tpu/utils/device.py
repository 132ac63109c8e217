"""Device discovery helpers (reference ``util/torch.py:5-14`` picked
cuda/xpu/npu/cpu; here the JAX runtime owns placement -- these helpers are
for logging and host/device routing decisions)."""
from __future__ import annotations


def infer_device() -> str:
    """Best available platform name ('tpu' | 'gpu' | 'cpu')."""
    import jax

    return jax.default_backend()


def device_count() -> int:
    import jax

    return jax.device_count()


def is_tpu() -> bool:
    return infer_device() == "tpu"
