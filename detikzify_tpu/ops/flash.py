"""Pallas TPU fused attention kernel.

The workload's sequences are short (vision: 900 patches; decoder: 300 image
tokens + TikZ code, ~2k max -- SURVEY §5 "long-context absent by design"), so
the fastest TPU strategy is a *fused block* kernel: keep one (batch, kv-head)
worth of K/V resident in VMEM and sweep query blocks over it on the MXU,
rather than a streaming flash loop designed for 100k-token contexts. VMEM
budget at T=4096, Hd=128, bf16: K+V 2MB + fp32 logits 2MB per 256-row q block.

Numerics: QK^T and softmax in fp32, PV in input dtype on the MXU.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .pallas_common import HAS_PLTPU as _HAS_PLTPU
from .pallas_common import NEG_INF as _NEG_INF
from .pallas_common import pltpu
from .pallas_common import round_up as _round_up

_MAX_FUSED_T = 8192  # beyond this, VMEM-resident K/V no longer fits


def supported(q, k, v, *, bias=None, causal=False) -> bool:
    """Whether the fused Pallas kernel can serve this attention call."""
    if not _HAS_PLTPU or bias is not None:
        return False
    if jax.default_backend() not in ("tpu",):
        return False
    if q.shape[-1] > 128 or k.shape[1] > _MAX_FUSED_T:
        return False
    if q.shape[2] % k.shape[2] != 0:
        return False
    return True


def _fused_attn_kernel(q_ref, k_ref, v_ref, mask_ref, offlim_ref, out_ref,
                       *, scale: float, causal: bool, q_offset: int,
                       block_q: int, per_batch: bool):
    """One (batch, head, q-block) tile: full logits over VMEM-resident K/V."""
    bi = pl.program_id(0)
    q = q_ref[0, 0].astype(jnp.float32)          # [bq, hd]
    k = k_ref[0, 0]                              # [T, hd]
    logits = jax.lax.dot_general(
        q, k.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # [bq, T]

    # mask/offlim are full-array inputs (Mosaic requires (8,128)-tilable or
    # whole-array blocks); index the batch row inside the kernel
    mask = mask_ref[bi] > 0                      # [T] (padded keys pre-masked)
    logits = jnp.where(mask[None, :], logits, _NEG_INF)
    if causal or per_batch:
        qi = pl.program_id(2)
        offset = offlim_ref[bi, 0] if per_batch else q_offset
        qpos = (qi * block_q
                + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0)
                + offset)
        kpos = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(kpos <= qpos, logits, _NEG_INF)
        if per_batch:
            logits = jnp.where(kpos < offlim_ref[bi, 1], logits, _NEG_INF)

    m = jnp.max(logits, axis=-1, keepdims=True)
    unnorm = jnp.exp(logits - m)
    denom = jnp.sum(unnorm, axis=-1, keepdims=True)
    probs = (unnorm / denom).astype(v_ref.dtype)
    out = jax.lax.dot_general(
        probs, v_ref[0, 0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out_ref[0, 0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("causal", "scale", "interpret"))
def flash_attention(
    q: jnp.ndarray,                      # [B, S, NH, Hd]
    k: jnp.ndarray,                      # [B, T, NKV, Hd]
    v: jnp.ndarray,
    *,
    causal: bool = False,
    kv_mask: Optional[jnp.ndarray] = None,   # [B, T] bool
    scale: Optional[float] = None,
    q_offsets: Optional[jnp.ndarray] = None,  # [B] per-batch causal offset
    kv_limits: Optional[jnp.ndarray] = None,  # [B] per-batch valid-key bound
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused attention, differentiable. Forward runs the Pallas kernel;
    the backward pass recomputes attention with the XLA reference
    implementation and pulls gradients through that (Pallas kernels have no
    automatic transpose; training costs one extra XLA attention in bwd).

    With ``q_offsets``/``kv_limits`` the mask becomes per-batch
    ``kpos <= q_offsets[b] + i  AND  kpos < kv_limits[b]`` -- the decode
    engine's offset-prefill pattern, replacing a [B,1,S,T] bias.

    ``kv_mask``/``q_offsets``/``kv_limits`` thread through the custom_vjp
    as EXPLICIT primal arguments (None cotangents): closing over them
    would capture tracers when they are batch-dependent (padded-batch
    training), which crashes at grad time with "No constant handler for
    DynamicJaxprTracer"."""
    if kv_limits is not None and q_offsets is None:
        raise ValueError("kv_limits requires q_offsets "
                         "(pass zeros for offset-free bounds)")

    def kernel_fn(q, k, v, kv_mask, q_offsets, kv_limits):
        return _flash_impl(q, k, v, causal=causal, kv_mask=kv_mask,
                           scale=scale, q_offsets=q_offsets,
                           kv_limits=kv_limits, interpret=interpret)

    @jax.custom_vjp
    def f(q, k, v, kv_mask, q_offsets, kv_limits):
        return kernel_fn(q, k, v, kv_mask, q_offsets, kv_limits)

    def fwd(q, k, v, kv_mask, q_offsets, kv_limits):
        out = kernel_fn(q, k, v, kv_mask, q_offsets, kv_limits)
        return out, (q, k, v, kv_mask, q_offsets, kv_limits)

    def bwd(res, g):
        q, k, v, kv_mask, q_offsets, kv_limits = res
        from .attention import attend_xla

        def xla_fn(q, k, v):
            return attend_xla(q, k, v, causal=causal, kv_mask=kv_mask,
                              scale=scale, q_offsets=q_offsets,
                              kv_limits=kv_limits)

        _, pullback = jax.vjp(xla_fn, q, k, v)
        return (*pullback(g), None, None, None)

    f.defvjp(fwd, bwd)
    return f(q, k, v, kv_mask, q_offsets, kv_limits)


def _flash_impl(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = False,
    kv_mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    q_offsets: Optional[jnp.ndarray] = None,
    kv_limits: Optional[jnp.ndarray] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    b, s, nh, hd = q.shape
    t, nkv = k.shape[1], k.shape[2]
    groups = nh // nkv
    scale = (hd ** -0.5) if scale is None else float(scale)

    hd_p = _round_up(hd, 128)
    s_p = _round_up(s, 128)
    t_p = _round_up(t, 128)
    block_q = min(256, s_p)
    s_p = _round_up(s_p, block_q)

    # Layout: [B, H, S, Hd] so the last two dims tile cleanly on the MXU.
    qt = jnp.transpose(q, (0, 2, 1, 3))
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))
    qt = jnp.pad(qt, ((0, 0), (0, 0), (0, s_p - s), (0, hd_p - hd)))
    kt = jnp.pad(kt, ((0, 0), (0, 0), (0, t_p - t), (0, hd_p - hd)))
    vt = jnp.pad(vt, ((0, 0), (0, 0), (0, t_p - t), (0, hd_p - hd)))

    if kv_mask is None:
        kv_mask = jnp.ones((b, t), dtype=jnp.bool_)
    mask_i32 = jnp.pad(kv_mask.astype(jnp.int32), ((0, 0), (0, t_p - t)))

    per_batch = q_offsets is not None
    if per_batch:
        limits = (kv_limits if kv_limits is not None
                  else jnp.full((b,), t, jnp.int32))
        offlim = jnp.stack([q_offsets.astype(jnp.int32),
                            limits.astype(jnp.int32)], axis=1)   # [B, 2]
    else:
        offlim = jnp.zeros((b, 2), jnp.int32)

    grid = (b, nh, s_p // block_q)
    kernel = functools.partial(
        _fused_attn_kernel, scale=scale, causal=causal,
        q_offset=t - s, block_q=block_q, per_batch=per_batch)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, hd_p), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, t_p, hd_p),
                         lambda bi, hi, qi, g=groups: (bi, hi // g, 0, 0)),
            pl.BlockSpec((1, 1, t_p, hd_p),
                         lambda bi, hi, qi, g=groups: (bi, hi // g, 0, 0)),
            pl.BlockSpec((b, t_p), lambda bi, hi, qi: (0, 0)),
            pl.BlockSpec((b, 2), lambda bi, hi, qi: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, hd_p),
                               lambda bi, hi, qi: (bi, hi, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, nh, s_p, hd_p), q.dtype),
        interpret=interpret,
    )(qt, kt, vt, mask_i32, offlim)

    out = out[:, :, :s, :hd]
    return jnp.transpose(out, (0, 2, 1, 3))
