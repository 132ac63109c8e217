"""Distributed metric-state reduction.

TPU-native equivalent of torchmetrics' ``dist_reduce_fx`` sync (reference
``evaluate/imagesim.py:42-43`` etc.): metric states here are plain
(sum, count) host scalars; in multi-process JAX runs they reduce with one
psum across hosts. Single-process runs are passthroughs.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np


def allreduce_sum(*values: float) -> Tuple[float, ...]:
    """Sum each value across all JAX processes (no-op single-process)."""
    import jax

    if jax.process_count() == 1:
        return values
    from jax.experimental import multihost_utils

    arr = np.asarray(values, np.float64)
    summed = multihost_utils.process_allgather(arr).sum(axis=0)
    return tuple(float(x) for x in summed)


def sync_metric(metric) -> float:
    """Reduce a (sum, count)-style metric's state across processes and
    return the global mean. Works with ImageSim/ClipScore-shaped metrics
    (``_sum``/``_n``) without mutating local state."""
    total, count = allreduce_sum(float(metric._sum), float(metric._n))
    if count == 0:
        raise RuntimeError("no updates across any process")
    return total / count
