"""Attention ops: XLA reference path + Pallas TPU flash kernels.

Replaces the reference's external CUDA attention (flash-attn 2 / torch SDPA,
selected at ``detikzify/model/modeling_detikzify.py:95-96,134``) with
TPU-native implementations:

  * ``attend(...)``            -- full-sequence attention (vision encoder,
                                  decoder prefill, training). Dispatches to a
                                  Pallas flash kernel when shapes allow,
                                  otherwise a fused XLA einsum path (XLA's
                                  fusion already keeps this on the MXU).
  * ``decode_attend(...)``     -- single-step decode attention against a
                                  KV cache with per-slot lengths.

All softmax accumulation is fp32 regardless of input dtype.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from .pallas_common import NEG_INF as _NEG_INF  # shared mask sentinel


def _repeat_kv(x: jnp.ndarray, n_rep: int) -> jnp.ndarray:
    """[B, T, NKV, H] -> [B, T, NKV*n_rep, H] (GQA broadcast)."""
    if n_rep == 1:
        return x
    b, t, nkv, h = x.shape
    x = jnp.broadcast_to(x[:, :, :, None, :], (b, t, nkv, n_rep, h))
    return x.reshape(b, t, nkv * n_rep, h)


def attend_xla(
    q: jnp.ndarray,                      # [B, S, NH, Hd]
    k: jnp.ndarray,                      # [B, T, NKV, Hd]
    v: jnp.ndarray,                      # [B, T, NKV, Hd]
    *,
    causal: bool = False,
    bias: Optional[jnp.ndarray] = None,  # [B, 1|NH, S, T] additive
    kv_mask: Optional[jnp.ndarray] = None,  # [B, T] bool, True = valid
    scale: Optional[float] = None,
    q_offsets: Optional[jnp.ndarray] = None,  # [B] causal offset per batch
    kv_limits: Optional[jnp.ndarray] = None,  # [B] valid-key bound per batch
) -> jnp.ndarray:
    """Reference XLA attention. Returns [B, S, NH, Hd] in q.dtype."""
    if kv_limits is not None and q_offsets is None:
        raise ValueError("kv_limits requires q_offsets "
                         "(pass zeros for offset-free bounds)")
    b, s, nh, hd = q.shape
    t = k.shape[1]
    nkv = k.shape[2]
    k = _repeat_kv(k, nh // nkv)
    v = _repeat_kv(v, nh // nkv)
    scale = (hd ** -0.5) if scale is None else scale

    logits = jnp.einsum("bsnh,btnh->bnst", q, k,
                        preferred_element_type=jnp.float32) * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    if kv_mask is not None:
        logits = jnp.where(kv_mask[:, None, None, :], logits, _NEG_INF)
    if q_offsets is not None:
        # per-batch causal window: key t visible to query i iff
        # t <= q_offsets[b] + i and t < kv_limits[b] (offset-prefill)
        qpos = (q_offsets[:, None, None, None]
                + jnp.arange(s)[None, None, :, None])
        kpos = jnp.arange(t)[None, None, None, :]
        visible = kpos <= qpos
        if kv_limits is not None:
            visible &= kpos < kv_limits[:, None, None, None]
        logits = jnp.where(visible, logits, _NEG_INF)
    if causal:
        # valid when key position <= query position (queries are the last
        # `s` positions of the `t`-long key sequence)
        qpos = jnp.arange(s)[:, None] + (t - s)
        kpos = jnp.arange(t)[None, :]
        logits = jnp.where((kpos <= qpos)[None, None], logits, _NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bnst,btnh->bsnh", probs, v)


def attend(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = False,
    bias: Optional[jnp.ndarray] = None,
    kv_mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    q_offsets: Optional[jnp.ndarray] = None,
    kv_limits: Optional[jnp.ndarray] = None,
    implementation: str = "auto",
) -> jnp.ndarray:
    """Full-sequence attention with automatic kernel dispatch.

    ``implementation``: "auto" | "pallas" | "xla".
    """
    # kv_limits is only applied inside the per-batch offset window (both
    # here and in the Pallas kernel); passing it alone would silently be
    # ignored -- fail loudly instead of attending to stale rows. The
    # implementations (attend_xla, flash_attention) carry the same check
    # for direct callers, and a raise survives python -O where an assert
    # would not.
    if kv_limits is not None and q_offsets is None:
        raise ValueError("kv_limits requires q_offsets "
                         "(pass zeros for offset-free bounds)")
    kw = dict(causal=causal, kv_mask=kv_mask, scale=scale,
              q_offsets=q_offsets, kv_limits=kv_limits)
    if implementation == "xla":
        return attend_xla(q, k, v, bias=bias, **kw)
    if implementation in ("auto", "pallas"):
        from . import flash  # local import: keeps CPU-only paths light

        if flash.supported(q, k, v, bias=bias, causal=causal):
            return flash.flash_attention(q, k, v, **kw)
        if implementation == "pallas":
            raise ValueError(
                f"pallas flash attention unsupported for shapes q={q.shape} "
                f"k={k.shape} bias={None if bias is None else bias.shape}")
    return attend_xla(q, k, v, bias=bias, **kw)


def decode_attend(
    q: jnp.ndarray,          # [B, NH, Hd] -- one new token per slot
    k_cache: jnp.ndarray,    # [B, L, NKV, Hd]
    v_cache: jnp.ndarray,    # [B, L, NKV, Hd]
    lengths: jnp.ndarray,    # [B] int32 -- valid tokens per slot (incl. new)
    *,
    scale: Optional[float] = None,
    implementation: str = "auto",
) -> jnp.ndarray:
    """Single-token decode attention over a contiguous KV cache.

    This is the decode hot loop's attention (reference: HF ``GenerationMixin``
    with ``DynamicCache``, ``modeling_detikzify.py:219``). Batched over all
    active MCTS rollout slots at once.

    "auto" dispatches to the Pallas length-clamped kernel
    (``ops.decode_flash``) for long caches, where skipping dead KV rows
    beats XLA's full-cache read; short caches stay on the fused XLA path
    (kernel launch overhead dominates there).
    """
    if implementation != "xla":
        from . import decode_flash

        long_cache = k_cache.shape[1] >= 1024
        if decode_flash.supported(q, k_cache) and (
                implementation == "pallas" or long_cache):
            return decode_flash.decode_attend_pallas(
                q, k_cache, v_cache, lengths, scale=scale)
    b, nh, hd = q.shape
    nkv = k_cache.shape[2]
    scale = (hd ** -0.5) if scale is None else scale
    groups = nh // nkv

    qg = q.reshape(b, nkv, groups, hd)
    # [B, NKV, G, L]
    logits = jnp.einsum("bngh,blnh->bngl", qg, k_cache,
                        preferred_element_type=jnp.float32) * scale
    valid = jnp.arange(k_cache.shape[1])[None, :] < lengths[:, None]  # [B, L]
    logits = jnp.where(valid[:, None, None, :], logits, _NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bngl,blnh->bngh", probs.astype(v_cache.dtype), v_cache)
    return out.reshape(b, nh, hd).astype(q.dtype)
