"""Shared helpers for the Pallas TPU kernels (single source of truth for
the flash-softmax sentinel, padding math, and the pltpu availability
probe -- previously duplicated across attention.py / decode_flash.py /
paged.py, where a fix to one copy could silently diverge)."""
from __future__ import annotations

import jax.numpy as jnp

try:
    from jax.experimental.pallas import tpu as pltpu
    HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    HAS_PLTPU = False

# flash-attention mask sentinel: large-negative but far from -inf so the
# online-softmax subtraction can never produce NaN via inf - inf
NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
