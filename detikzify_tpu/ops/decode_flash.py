"""Pallas TPU decode-attention kernel with length-clamped KV reads.

Decode attention is HBM-bandwidth-bound: every step reads the KV cache. The
XLA fallback (``attention.decode_attend``) reads all ``max_len`` rows per
slot and masks; this kernel reads only ``ceil(len/block)`` blocks per slot
via a dynamic-bound loop, cutting decode HBM traffic by max_len/len (e.g.
4x at 512 live tokens in a 2048-slot cache).

Layout: cache [B, L, NKV, Hd] viewed as [B, L, NKV*Hd_pad]; grid over B;
per-slot lengths arrive via scalar prefetch so the loop bound is known
before the body runs. Flash-style online softmax over KV blocks keeps VMEM
flat. GQA: queries [B, NH, Hd] reshaped to [NKV, G, Hd] inside the kernel;
all G group-queries of a KV head process together on the MXU.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from .pallas_common import HAS_PLTPU as _HAS_PLTPU
from .pallas_common import NEG_INF as _NEG_INF
from .pallas_common import pltpu
from .pallas_common import round_up as _round_up

BLOCK_KV = 256


def supported(q, k_cache) -> bool:
    if not _HAS_PLTPU or jax.default_backend() != "tpu":
        return False
    nh, hd = q.shape[1], q.shape[2]
    nkv = k_cache.shape[2]
    # hd must be exactly 128: for hd < 128 the host-side hd_pad would
    # jnp.pad (full-copy) the ENTIRE cache per layer per decode step,
    # costing more HBM traffic than the XLA read-all-and-mask path this
    # kernel exists to beat (review finding)
    return hd == 128 and nh % nkv == 0


def _decode_kernel(lengths_ref,            # scalar prefetch [B]
                   q_ref, k_ref, v_ref,    # q VMEM; k/v full cache in HBM
                   out_ref,
                   acc_ref, m_ref, l_ref, kbuf, vbuf, sem,
                   *, scale: float, block_kv: int, nkv: int, groups: int,
                   hd_pad: int):
    b = pl.program_id(0)
    length = lengths_ref[b]
    nblocks = pl.cdiv(length, block_kv)

    q = q_ref[0].astype(jnp.float32) * scale        # [NH, hd_pad]
    q = q.reshape(nkv, groups, hd_pad)

    acc_ref[:] = jnp.zeros_like(acc_ref)
    m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
    l_ref[:] = jnp.zeros_like(l_ref)

    # double-buffered KV stream: block n+1's DMA runs behind block n's
    # matmuls (kbuf/vbuf have a leading slot dim of 2; sem is [2 slots x
    # {k,v}]). Every started copy is waited exactly once: the warm-up
    # copy in iteration 0, iteration i's prefetch in iteration i+1.
    def dma(slot, blk):
        start = blk * block_kv
        return (pltpu.make_async_copy(
                    k_ref.at[b, pl.ds(start, block_kv)], kbuf.at[slot],
                    sem.at[slot, 0]),
                pltpu.make_async_copy(
                    v_ref.at[b, pl.ds(start, block_kv)], vbuf.at[slot],
                    sem.at[slot, 1]))

    @pl.when(nblocks > 0)
    def _():
        ck, cv = dma(0, 0)
        ck.start()
        cv.start()

    def body(blk, _):
        slot = jax.lax.rem(blk, 2)

        @pl.when(blk + 1 < nblocks)
        def _():
            ck, cv = dma(1 - slot, blk + 1)
            ck.start()
            cv.start()

        ck, cv = dma(slot, blk)
        ck.wait()
        cv.wait()

        start = blk * block_kv
        pos = start + jax.lax.broadcasted_iota(
            jnp.int32, (groups, block_kv), 1)
        valid = pos < length
        # static unroll over kv heads: Mosaic lowers 2D matmuls only
        for h in range(nkv):
            kh = kbuf[slot, :, h * hd_pad:(h + 1) * hd_pad]  # [block, hd]
            qh = q[h]                                   # [G, hd]
            logits = jax.lax.dot_general(
                qh, kh.astype(jnp.float32), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)     # [G, block]
            logits = jnp.where(valid, logits, _NEG_INF)

            m_prev = m_ref[h]                           # [G, 1]
            m_new = jnp.maximum(m_prev,
                                jnp.max(logits, axis=-1, keepdims=True))
            p = jnp.exp(logits - m_new)                 # [G, block]
            alpha = jnp.exp(m_prev - m_new)
            l_ref[h] = l_ref[h] * alpha + jnp.sum(p, axis=-1,
                                                  keepdims=True)
            vh = vbuf[slot, :, h * hd_pad:(h + 1) * hd_pad]  # [block, hd]
            pv = jax.lax.dot_general(
                p.astype(jnp.float32), vh.astype(jnp.float32),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)     # [G, hd]
            acc_ref[h] = acc_ref[h] * alpha + pv
            m_ref[h] = m_new
        return _

    jax.lax.fori_loop(0, nblocks, body, None)
    out = acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)
    out_ref[0] = out.reshape(nkv * groups, hd_pad).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_kv",
                                             "interpret"))
def decode_attend_pallas(
    q: jnp.ndarray,          # [B, NH, Hd]
    k_cache: jnp.ndarray,    # [B, L, NKV, Hd]
    v_cache: jnp.ndarray,
    lengths: jnp.ndarray,    # [B] int32
    *,
    scale: Optional[float] = None,
    block_kv: int = BLOCK_KV,
    interpret: bool = False,
) -> jnp.ndarray:
    b, nh, hd = q.shape
    max_len, nkv = k_cache.shape[1], k_cache.shape[2]
    groups = nh // nkv
    scale = (hd ** -0.5) if scale is None else float(scale)

    hd_pad = _round_up(hd, 128)
    block_kv = min(block_kv, _round_up(max_len, 128))
    len_pad = _round_up(max_len, block_kv)

    # only trace pads when they do something: the auto route (supported())
    # guarantees hd == 128 and bucketed max_len, so the hot path reshapes
    # without copying; direct/interpret callers with odd shapes still pad
    qp = (q if hd_pad == hd
          else jnp.pad(q, ((0, 0), (0, 0), (0, hd_pad - hd))))
    kp, vp = k_cache, v_cache
    if hd_pad != hd or len_pad != max_len:
        pads = ((0, 0), (0, len_pad - max_len), (0, 0), (0, hd_pad - hd))
        kp, vp = jnp.pad(kp, pads), jnp.pad(vp, pads)
    kp = kp.reshape(b, len_pad, nkv * hd_pad)
    vp = vp.reshape(b, len_pad, nkv * hd_pad)

    kernel = functools.partial(
        _decode_kernel, scale=scale, block_kv=block_kv, nkv=nkv,
        groups=groups, hd_pad=hd_pad)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, nh, hd_pad), lambda i, L: (i, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),   # full cache, DMA'd manually
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, nh, hd_pad), lambda i, L: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((nkv, groups, hd_pad), jnp.float32),   # acc
            pltpu.VMEM((nkv, groups, 1), jnp.float32),        # m
            pltpu.VMEM((nkv, groups, 1), jnp.float32),        # l
            pltpu.VMEM((2, block_kv, nkv * hd_pad), k_cache.dtype),
            pltpu.VMEM((2, block_kv, nkv * hd_pad), v_cache.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, nh, hd_pad), q.dtype),
        interpret=interpret,
    )(lengths.astype(jnp.int32), qp, kp, vp)
    return out[:, :, :hd]
