"""Fused int8-dequant GEMV Pallas kernel (experimental, opt-in).

Measured on v5e (DS-1.3b int8, batch 8, 480 chained layer GEMVs):
XLA's ``dot(x, w_int8.astype(bf16))`` reaches ~160 GB/s effective weight
bandwidth and this single-matmul Pallas kernel ~128 GB/s -- XLA does NOT
materialize the dequantized weights (fusion handles it), and both paths
are capped well below HBM peak by per-op latency on the serial layer
chain, not by traffic. The kernel is therefore OFF by default
(``DETIKZIFY_TPU_INT8_GEMV=pallas`` enables it); the next real lever is a
layer-pipelined kernel that double-buffers layer l+1's weight DMA behind
layer l's compute (grid over the layer stack), tracked in TODO.md.

``models.layers.linear`` routes through :func:`int8_matmul`, which picks
the path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 128          # output tile (lane dim); divides every projection
MAX_GEMV_ROWS = 64    # beyond this the matmul is compute-bound: use XLA


def _kernel(x_ref, q_ref, s_ref, o_ref):
    w = q_ref[:].astype(jnp.bfloat16)                  # int8 -> bf16 in VMEM
    acc = jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)
    o_ref[:] = (acc * s_ref[0, :].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _int8_gemv(x, q, scale, interpret=False):
    b, k = x.shape
    n = q.shape[1]
    grid = (n // TILE_N,)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, k), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, TILE_N), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_N), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, TILE_N), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * k * n, transcendentals=0,
            bytes_accessed=k * n + b * k * 2 + b * n * 2 + 4 * n),
        interpret=interpret,
    )(x, q, scale.reshape(1, -1))


def _use_pallas() -> bool:
    import os

    if os.environ.get("DETIKZIFY_TPU_INT8_GEMV") != "pallas":
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def int8_matmul(x: jnp.ndarray, q: jnp.ndarray, scale: jnp.ndarray,
                *, force_pallas: bool = False,
                interpret: bool = False) -> jnp.ndarray:
    """``x [..., K] @ dequant(q [K, N])`` with int8-only weight traffic in
    the decode (GEMV) regime; transparently falls back to the XLA path."""
    k, n = q.shape
    lead = x.shape[:-1]
    rows = 1
    for d in lead:
        rows *= d
    eligible = (rows <= MAX_GEMV_ROWS and k % 128 == 0 and n % TILE_N == 0
                and x.dtype in (jnp.bfloat16, jnp.float32))
    if eligible and (force_pallas or _use_pallas()):
        xm = x.reshape(rows, k).astype(jnp.bfloat16)
        pad = (-rows) % 16                      # bf16 sublane alignment
        if pad:
            xm = jnp.pad(xm, ((0, pad), (0, 0)))
        y = _int8_gemv(xm, q, scale, interpret=interpret)
        return y[:rows].reshape(*lead, n).astype(x.dtype)
    acc = jnp.dot(x, q.astype(x.dtype), preferred_element_type=jnp.float32)
    return (acc * scale).astype(x.dtype)
