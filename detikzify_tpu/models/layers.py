"""Shared neural-net primitives (pure functions over param pytrees).

Model code throughout this package is *functional*: parameters are nested
dicts of ``jnp.ndarray`` (kernels stored input-major, i.e. ``[in, out]``),
applied by pure functions. This keeps everything trivially compatible with
``jax.jit`` / ``pjit`` / ``shard_map`` and makes sharding annotations a
matter of pytree path rules (see ``detikzify_tpu.parallel.sharding``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def apply_remat(block, remat):
    """Wrap a layer-scan body per the remat policy: ``True`` = full
    rematerialization (save only layer boundaries -- O(1)-layer activation
    memory, one extra forward of compute in the backward); ``"dots"`` =
    save matmul outputs (``dots_with_no_batch_dims_saveable``: backward
    re-runs only cheap elementwise ops, costing ~per-layer dot-output
    memory for up to ~25% fewer training FLOPs than full remat)."""
    if not remat:
        return block
    if remat == "dots":
        return jax.checkpoint(
            block,
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
    return jax.checkpoint(block)


def linear(p, x: jnp.ndarray) -> jnp.ndarray:
    """Dense layer. ``p = {'kernel': [in, out], 'bias'?: [out]}`` or an
    int8-quantized ``{'kernel_q': {'q', 'scale'}}`` (see ``ops.quant``)."""
    if "kernel_q" in p:
        from ..ops.quant_matmul import int8_matmul

        q = p["kernel_q"]
        y = int8_matmul(x, q["q"], q["scale"])
    else:
        y = jnp.einsum("...i,io->...o", x, p["kernel"])
    if "bias" in p:
        y = y + p["bias"]
    return y


def layer_norm(p, x: jnp.ndarray, eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def rms_norm(p, x: jnp.ndarray, eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (y * p["scale"].astype(jnp.float32)).astype(x.dtype)


def gelu_tanh(x: jnp.ndarray) -> jnp.ndarray:
    """PyTorch 'gelu_pytorch_tanh' / gelu(approximate='tanh')."""
    return jax.nn.gelu(x, approximate=True)


ACTIVATIONS = {
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "gelu_pytorch_tanh": gelu_tanh,
    "silu": jax.nn.silu,
    "relu": jax.nn.relu,
}


# ---------------------------------------------------------------------------
# Rotary position embeddings (LLaMA-style, non-interleaved "rotate_half").
# ---------------------------------------------------------------------------

def rope_inv_freq(head_dim: int, theta: float, rope_scaling=None) -> jnp.ndarray:
    """Per-frequency inverse wavelengths, with optional llama3 NTK scaling."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32)
                                / head_dim))
    if rope_scaling and rope_scaling.get("rope_type") == "llama3":
        factor = rope_scaling["factor"]
        lo = rope_scaling["low_freq_factor"]
        hi = rope_scaling["high_freq_factor"]
        orig = rope_scaling["original_max_position_embeddings"]
        wavelen = 2.0 * jnp.pi / inv_freq
        low_wl, high_wl = orig / lo, orig / hi
        smooth = (orig / wavelen - lo) / (hi - lo)
        scaled = jnp.where(
            wavelen > low_wl, inv_freq / factor,
            jnp.where(wavelen < high_wl, inv_freq,
                      (1 - smooth) * inv_freq / factor + smooth * inv_freq))
        inv_freq = scaled
    return inv_freq


def rope_cos_sin(positions: jnp.ndarray, inv_freq: jnp.ndarray):
    """positions [...,] int -> (cos, sin) each [..., head_dim]."""
    angles = positions[..., None].astype(jnp.float32) * inv_freq  # [..., hd/2]
    angles = jnp.concatenate([angles, angles], axis=-1)
    return jnp.cos(angles), jnp.sin(angles)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x [..., n_heads, head_dim]; cos/sin broadcastable [..., head_dim]."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    cos = cos[..., None, :]
    sin = sin[..., None, :]
    return (x.astype(jnp.float32) * cos + rotated.astype(jnp.float32) * sin
            ).astype(x.dtype)


# ---------------------------------------------------------------------------
# Initializers
# ---------------------------------------------------------------------------

def dense_init(rng, in_dim: int, out_dim: int, *, bias: bool = True,
               dtype=jnp.float32, scale: float | None = None):
    std = scale if scale is not None else (in_dim ** -0.5)
    p = {"kernel": jax.random.normal(rng, (in_dim, out_dim), dtype) * std}
    if bias:
        p["bias"] = jnp.zeros((out_dim,), dtype)
    return p


def ln_init(dim: int, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def rms_init(dim: int, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype)}
