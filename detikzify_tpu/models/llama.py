"""LLaMA-family decoder, TPU-native, with first-class KV-cache entry points.

Replaces the reference's transformers ``AutoModel`` text tower + HF
``GenerationMixin``/``DynamicCache`` decode path (reference
``detikzify/model/modeling_detikzify.py:251-260`` and ``infer/generate.py:
218-227``) with three jit-friendly pure functions:

  * ``forward``      -- full-sequence causal pass (training / no-cache eval)
  * ``prefill``      -- writes K/V for a token block into a preallocated
                        cache at a per-slot offset (supports prefix reuse:
                        restore a cached prefix, then prefill only the tail)
  * ``decode_step``  -- one token for every active slot, batched

Two cache layouts: the contiguous pytree ``KVCache [L, B, T, NKV, Hd]``
(training, transient decode views) and the PAGED pool ``PagedKV
[L, P, page, NKV, Hd]`` read through per-slot page tables (the serving
engine's persistent store -- see ``prefill_paged``/``decode_step_paged``).
Layers are scanned (stacked params) for fast compiles and layer-axis FSDP.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

import os

from ..config import TextConfig
from ..ops.attention import attend, decode_attend

#: layer-scan unroll factor for the decode hot path: under per-op dispatch
#: floors (remote tunnels) unrolling lets XLA fuse across layer bodies;
#: measured on-chip before adoption (1 = plain scan)
LAYER_UNROLL = int(os.environ.get("DETIKZIFY_TPU_LAYER_UNROLL", "1"))
from .layers import (ACTIVATIONS, apply_remat, apply_rope, dense_init,
                     linear, rms_init, rms_norm, rope_cos_sin,
                     rope_inv_freq)


class KVCache(NamedTuple):
    k: jnp.ndarray  # [n_layers, B, T, n_kv_heads, head_dim]
    v: jnp.ndarray

    @property
    def max_len(self) -> int:
        return self.k.shape[2]

    @property
    def batch(self) -> int:
        return self.k.shape[1]


def init_cache(cfg: TextConfig, batch: int, max_len: int,
               dtype=jnp.bfloat16) -> KVCache:
    shape = (cfg.num_hidden_layers, batch, max_len,
             cfg.num_key_value_heads, cfg.head_dim)
    return KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def init(rng: jax.Array, cfg: TextConfig, dtype=jnp.float32) -> dict:
    keys = iter(jax.random.split(rng, 8))
    d, i, hd = cfg.hidden_size, cfg.intermediate_size, cfg.head_dim
    nh, nkv, L = cfg.num_attention_heads, cfg.num_key_value_heads, \
        cfg.num_hidden_layers

    def layer(k):
        ks = iter(jax.random.split(k, 8))
        bias = cfg.attention_bias
        return {
            "input_ln": rms_init(d, dtype),
            "attn": {
                "q": dense_init(next(ks), d, nh * hd, bias=bias, dtype=dtype),
                "k": dense_init(next(ks), d, nkv * hd, bias=bias, dtype=dtype),
                "v": dense_init(next(ks), d, nkv * hd, bias=bias, dtype=dtype),
                "o": dense_init(next(ks), nh * hd, d, bias=False, dtype=dtype),
            },
            "post_ln": rms_init(d, dtype),
            "mlp": {
                "gate": dense_init(next(ks), d, i, bias=False, dtype=dtype),
                "up": dense_init(next(ks), d, i, bias=False, dtype=dtype),
                "down": dense_init(next(ks), i, d, bias=False, dtype=dtype),
            },
        }

    def stack():
        return jax.tree.map(lambda *xs: jnp.stack(xs),
                            *[layer(k) for k in jax.random.split(next(keys), L)])

    params = {
        "embed_tokens": jax.random.normal(
            next(keys), (cfg.vocab_size, d), dtype) * 0.02,
        "layers": stack(),
        "norm": rms_init(d, dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = dense_init(next(keys), d, cfg.vocab_size,
                                       bias=False, dtype=dtype)
    return params


def embed(params: dict, token_ids: jnp.ndarray) -> jnp.ndarray:
    return params["embed_tokens"][token_ids]


def unembed(params: dict, hidden: jnp.ndarray) -> jnp.ndarray:
    """Final-norm'd hidden -> fp32 logits."""
    if "lm_head" in params:
        head = params["lm_head"]
        if "kernel_q" in head:
            q = head["kernel_q"]
            return jnp.dot(hidden, q["q"].astype(hidden.dtype),
                           preferred_element_type=jnp.float32) * q["scale"]
        kernel = head["kernel"]
    else:
        kernel = params["embed_tokens"].T
    return jnp.einsum("...d,dv->...v", hidden, kernel,
                      preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# layer bodies
# ---------------------------------------------------------------------------

def _split_qkv(y, cfg: TextConfig):
    hd, nh, nkv = cfg.head_dim, cfg.num_attention_heads, cfg.num_key_value_heads
    q, k, v = jnp.split(y, [nh * hd, (nh + nkv) * hd], axis=-1)
    shape = y.shape[:-1]
    return (q.reshape(*shape, nh, hd), k.reshape(*shape, nkv, hd),
            v.reshape(*shape, nkv, hd))


def _qkv(lp, x, cfg: TextConfig, cos, sin):
    lead = x.shape[:-1]            # [B, S] full-seq / [B] decode / [B, K1]
    hd, nh, nkv = cfg.head_dim, cfg.num_attention_heads, cfg.num_key_value_heads
    if "qkv" in lp["attn"]:
        # packed projection (fuse_projections): one fat matmul instead of
        # three -- shortens the per-layer op-latency chain in decode
        q, k, v = _split_qkv(linear(lp["attn"]["qkv"], x), cfg)
    else:
        q = linear(lp["attn"]["q"], x).reshape(*lead, nh, hd)
        k = linear(lp["attn"]["k"], x).reshape(*lead, nkv, hd)
        v = linear(lp["attn"]["v"], x).reshape(*lead, nkv, hd)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    return q, k, v


def _mlp(lp, x, act):
    if "gateup" in lp["mlp"]:
        y = linear(lp["mlp"]["gateup"], x)
        gate, up = jnp.split(y, 2, axis=-1)
        return linear(lp["mlp"]["down"], act(gate) * up)
    return linear(lp["mlp"]["down"],
                  act(linear(lp["mlp"]["gate"], x)) * linear(lp["mlp"]["up"], x))


# ---------------------------------------------------------------------------
# full-sequence forward (training / evaluation)
# ---------------------------------------------------------------------------

def forward(
    params: dict,
    cfg: TextConfig,
    inputs_embeds: jnp.ndarray,          # [B, S, D]
    *,
    positions: Optional[jnp.ndarray] = None,   # [B, S]
    attention_mask: Optional[jnp.ndarray] = None,  # [B, S] bool, True=valid
    attn_impl: str = "auto",
    remat=False,
) -> jnp.ndarray:
    """Causal full-sequence pass; returns final-norm'd hidden [B, S, D].

    ``remat`` (False | True | "dots") rematerializes each layer in the
    backward pass (``jax.checkpoint`` on the scan body, see
    ``apply_remat``): activation memory drops from O(layers) to O(1)
    layers -- required for 8B-class training."""
    b, s, _ = inputs_embeds.shape
    act = ACTIVATIONS[cfg.hidden_act]
    if positions is None:
        if attention_mask is not None:
            positions = jnp.maximum(
                jnp.cumsum(attention_mask.astype(jnp.int32), axis=-1) - 1, 0)
        else:
            positions = jnp.broadcast_to(jnp.arange(s)[None], (b, s))
    inv_freq = rope_inv_freq(cfg.head_dim, cfg.rope_theta, cfg.rope_scaling)
    cos, sin = rope_cos_sin(positions, inv_freq)

    def block(x, lp):
        residual = x
        h = rms_norm(lp["input_ln"], x, cfg.rms_norm_eps)
        q, k, v = _qkv(lp, h, cfg, cos, sin)
        h = attend(q, k, v, causal=True, kv_mask=attention_mask,
                   implementation=attn_impl)
        h = linear(lp["attn"]["o"], h.reshape(b, s, -1))
        x = residual + h
        residual = x
        h = rms_norm(lp["post_ln"], x, cfg.rms_norm_eps)
        return residual + _mlp(lp, h, act), None

    block = apply_remat(block, remat)
    x, _ = jax.lax.scan(block, inputs_embeds, params["layers"])
    return rms_norm(params["norm"], x, cfg.rms_norm_eps)


# ---------------------------------------------------------------------------
# prefill: write a token block into the cache at per-slot offsets
# ---------------------------------------------------------------------------

def prefill(
    params: dict,
    cfg: TextConfig,
    inputs_embeds: jnp.ndarray,     # [B, S, D]
    start: jnp.ndarray,             # [B] int32 -- write offset per slot
    seq_len: jnp.ndarray,           # [B] int32 -- valid tokens in this block
    cache: KVCache,
    *,
    attn_impl: str = "auto",
) -> Tuple[jnp.ndarray, KVCache]:
    """Process a (padded) token block, attending to cache[0:start] + causal
    self-attention within the block. Returns (hidden [B,S,D], new cache).

    Invalid tail positions (i >= seq_len[b]) still write to the cache but are
    overwritten by later prefills/decodes and masked by `lengths` everywhere.
    """
    b, s, _ = inputs_embeds.shape
    act = ACTIVATIONS[cfg.hidden_act]
    max_len = cache.max_len

    positions = start[:, None] + jnp.arange(s)[None, :]          # [B, S]
    inv_freq = rope_inv_freq(cfg.head_dim, cfg.rope_theta, cfg.rope_scaling)
    cos, sin = rope_cos_sin(positions, inv_freq)

    # per-slot visibility: key t visible to query i iff t <= start+i and
    # t < start + seq_len (cache rows beyond current content invalid);
    # expressed as offsets/limits so the Pallas kernel applies it in-tile
    # instead of materializing a [B, 1, S, T] bias.
    kv_limits = start + seq_len

    def write(cache_layer, kv, start):
        """scatter kv [B,S,...] into cache_layer [B,T,...] at per-slot start."""
        def one(slot_cache, slot_kv, s0):
            return jax.lax.dynamic_update_slice(
                slot_cache, slot_kv.astype(slot_cache.dtype), (s0, 0, 0))
        return jax.vmap(one)(cache_layer, kv, start)

    def block(x, scanned):
        lp, kc, vc = scanned
        residual = x
        h = rms_norm(lp["input_ln"], x, cfg.rms_norm_eps)
        q, k, v = _qkv(lp, h, cfg, cos, sin)
        kc = write(kc, k, start)
        vc = write(vc, v, start)
        h = attend(q, kc, vc, q_offsets=start, kv_limits=kv_limits,
                   implementation=attn_impl)
        h = linear(lp["attn"]["o"], h.reshape(b, s, -1))
        x = residual + h
        residual = x
        h = rms_norm(lp["post_ln"], x, cfg.rms_norm_eps)
        return residual + _mlp(lp, h, act), (kc, vc)

    x, (new_k, new_v) = jax.lax.scan(
        block, inputs_embeds, (params["layers"], cache.k, cache.v))
    return rms_norm(params["norm"], x, cfg.rms_norm_eps), KVCache(new_k, new_v)


# ---------------------------------------------------------------------------
# decode: one token per active slot
# ---------------------------------------------------------------------------

def decode_step(
    params: dict,
    cfg: TextConfig,
    inputs_embeds: jnp.ndarray,   # [B, D] -- embedding of the newest token
    positions: jnp.ndarray,       # [B] int32 -- position of the new token
    cache: KVCache,
    kv_limit: Optional[int] = None,   # static: attend to rows [0, kv_limit)
    attn_impl: str = "auto",
) -> Tuple[jnp.ndarray, KVCache]:
    """One decode step for all slots; returns (hidden [B,D], new cache).

    ``kv_limit`` (static) bounds the ATTENDED cache prefix: decode
    attention HBM traffic scales with the live maximum sequence length
    instead of ``max_len`` (writes still land in the full cache). Callers
    must guarantee every attending slot's position < kv_limit."""
    b, d = inputs_embeds.shape
    act = ACTIVATIONS[cfg.hidden_act]
    hd, nh, nkv = cfg.head_dim, cfg.num_attention_heads, cfg.num_key_value_heads

    inv_freq = rope_inv_freq(cfg.head_dim, cfg.rope_theta, cfg.rope_scaling)
    cos, sin = rope_cos_sin(positions, inv_freq)        # [B, hd]
    lengths = positions + 1

    def write(cache_layer, kv, pos):
        def one(slot_cache, slot_kv, p):
            return jax.lax.dynamic_update_slice(
                slot_cache, slot_kv.astype(slot_cache.dtype)[None], (p, 0, 0))
        return jax.vmap(one)(cache_layer, kv, pos)

    def block(x, scanned):
        lp, kc, vc = scanned
        residual = x
        h = rms_norm(lp["input_ln"], x, cfg.rms_norm_eps)
        if "qkv" in lp["attn"]:
            q, k, v = _split_qkv(linear(lp["attn"]["qkv"], h), cfg)
        else:
            q = linear(lp["attn"]["q"], h).reshape(b, nh, hd)
            k = linear(lp["attn"]["k"], h).reshape(b, nkv, hd)
            v = linear(lp["attn"]["v"], h).reshape(b, nkv, hd)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        kc = write(kc, k, positions)
        vc = write(vc, v, positions)
        if kv_limit is not None and kv_limit < kc.shape[1]:
            # static slice fuses into the attention reads: traffic follows
            # the live max length, not the allocation
            h = decode_attend(q, kc[:, :kv_limit], vc[:, :kv_limit],
                              jnp.minimum(lengths, kv_limit),
                              implementation=attn_impl)
        else:
            h = decode_attend(q, kc, vc, lengths, implementation=attn_impl)
        h = linear(lp["attn"]["o"], h.reshape(b, -1))
        x = residual + h
        residual = x
        h = rms_norm(lp["post_ln"], x, cfg.rms_norm_eps)
        return residual + _mlp(lp, h, act), (kc, vc)

    x, (new_k, new_v) = jax.lax.scan(
        block, inputs_embeds, (params["layers"], cache.k, cache.v),
        unroll=LAYER_UNROLL)
    return rms_norm(params["norm"], x, cfg.rms_norm_eps), KVCache(new_k, new_v)


# ---------------------------------------------------------------------------
# paged KV cache: shared page pool + per-slot page tables
# ---------------------------------------------------------------------------
# The cache is one page POOL per layer; a slot's token rows
# [i*page, (i+1)*page) live in pool page table[slot, i]. Tree-prefix reuse
# is then a table splice plus at most one copy-on-write boundary-page copy
# (engine/decode.py) -- no per-start materialization of the ancestor's KV.


class PagedKV(NamedTuple):
    k: jnp.ndarray  # [n_layers, n_pages, page, n_kv_heads, head_dim]
    v: jnp.ndarray

    @property
    def page(self) -> int:
        return self.k.shape[2]

    @property
    def n_pages(self) -> int:
        return self.k.shape[1]


def init_paged_cache(cfg: TextConfig, n_pages: int, page: int,
                     dtype=jnp.bfloat16) -> PagedKV:
    shape = (cfg.num_hidden_layers, n_pages, page,
             cfg.num_key_value_heads, cfg.head_dim)
    return PagedKV(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


def _scatter_rows(pool_x: jnp.ndarray, src: jnp.ndarray,
                  rows: jnp.ndarray, write_tab: jnp.ndarray,
                  page: int, trash_row: Optional[int] = None,
                  trash_page: Optional[int] = None) -> jnp.ndarray:
    """ONE scatter writing src [L, B, R, N, H] at absolute token rows
    ``rows`` [B, R] of each slot (all layers at once), routed through its
    ``write_tab`` [B, m_cap] page table.

    Rows at or beyond ``trash_row`` (the engine's trash block, where frozen
    slots and past-budget overflow divert) write to the shared
    ``trash_page`` instead of dereferencing the table -- a RELEASED slot's
    stale table must never be written through (its pages may belong to a
    new owner). Without a trash config, rows beyond the allocation clamp
    to the slot's last page's last row."""
    m_cap = write_tab.shape[1]
    entry = jnp.clip(rows // page, 0, m_cap - 1)
    pid = jnp.take_along_axis(write_tab, entry, axis=1)
    rid = rows % page
    if trash_row is not None:
        trash = rows >= trash_row
        pid = jnp.where(trash, trash_page, pid)
    else:
        overflow = rows >= m_cap * page
        pid = jnp.where(overflow, write_tab[:, -1:], pid)
        rid = jnp.where(overflow, page - 1, rid)
    # src [L, B, R, N, H] -> indexed target pool[:, pid, rid] [L, B, R, N, H]
    return pool_x.at[:, pid, rid].set(src.astype(pool_x.dtype))


def prefill_paged(
    params: dict,
    cfg: TextConfig,
    inputs_embeds: jnp.ndarray,     # [B, S, D] (padded block)
    start: jnp.ndarray,             # [B] int32 -- block write offset
    seq_len: jnp.ndarray,           # [B] int32 -- valid tokens in block
    pool: PagedKV,
    read_tab: jnp.ndarray,          # [B, PB] prefix pages (PB static, may be 0)
    write_tab: jnp.ndarray,         # [B, m_cap] the slot's full page table
    cow_begin: jnp.ndarray,         # [B] first row scattered back (page-
                                    # aligned boundary of the restored
                                    # prefix; == start when aligned/fresh)
    *,
    trash_row: Optional[int] = None,
    trash_page: Optional[int] = None,
    attn_impl: str = "auto",
) -> Tuple[jnp.ndarray, PagedKV]:
    """Offset prefill against a page pool, engineered for op-count
    frugality (remote-TPU dispatch floors): the restored prefix pages are
    gathered ONCE for all layers into contiguous work caches, the layer
    scan runs the standard offset-prefill attention over them, and ONE
    scatter per K/V writes the [cow_begin, cow_begin+page+S) region of
    every layer back through ``write_tab``. Pool writes are the tail plus
    at most one copy-on-write boundary page -- O(tail), never O(max_len).
    Returns (hidden [B,S,D], updated pool)."""
    b, s, _ = inputs_embeds.shape
    act = ACTIVATIONS[cfg.hidden_act]
    page = pool.page
    pb = read_tab.shape[1]
    L = pool.k.shape[0]
    n, hd = pool.k.shape[-2], pool.k.shape[-1]
    w = pb * page + s + page       # pad page: scatter slice never clamps

    positions = start[:, None] + jnp.arange(s)[None, :]
    inv_freq = rope_inv_freq(cfg.head_dim, cfg.rope_theta, cfg.rope_scaling)
    cos, sin = rope_cos_sin(positions, inv_freq)
    kv_limits = start + seq_len
    rows = cow_begin[:, None] + jnp.arange(page + s)[None, :]   # [B, page+S]

    def work_all(pool_x):
        """[L, P, page, N, H] -> [L, B, W, N, H] in ONE gather."""
        if pb == 0:
            return jnp.zeros((L, b, w, n, hd), pool_x.dtype)
        g = pool_x[:, read_tab].reshape(L, b, pb * page, n, hd)
        return jnp.pad(g, ((0, 0), (0, 0), (0, w - pb * page),
                           (0, 0), (0, 0)))

    work_k0 = work_all(pool.k)
    work_v0 = work_all(pool.v)

    def write_block(work_l, kv):
        def one(slot_cache, slot_kv, s0):
            return jax.lax.dynamic_update_slice(
                slot_cache, slot_kv.astype(slot_cache.dtype), (s0, 0, 0))
        return jax.vmap(one)(work_l, kv, start)

    def block(x, scanned):
        lp, wk, wv = scanned
        residual = x
        h = rms_norm(lp["input_ln"], x, cfg.rms_norm_eps)
        q, k, v = _qkv(lp, h, cfg, cos, sin)
        wk = write_block(wk, k)
        wv = write_block(wv, v)
        h = attend(q, wk, wv, q_offsets=start, kv_limits=kv_limits,
                   implementation=attn_impl)
        h = linear(lp["attn"]["o"], h.reshape(b, s, -1))
        x = residual + h
        residual = x
        h = rms_norm(lp["post_ln"], x, cfg.rms_norm_eps)
        return residual + _mlp(lp, h, act), (wk, wv)

    x, (work_k, work_v) = jax.lax.scan(
        block, inputs_embeds, (params["layers"], work_k0, work_v0))

    def cow_slice(work_x):
        def one(slot_cache, c0):    # slot_cache [L-major moved to front?]
            return jax.lax.dynamic_slice(
                slot_cache, (0, c0, 0, 0), (L, page + s, n, hd))
        return jax.vmap(one, in_axes=(1, 0), out_axes=1)(work_x, cow_begin)

    src_k = cow_slice(work_k)       # [L, B, page+S, N, H]
    src_v = cow_slice(work_v)
    new_k = _scatter_rows(pool.k, src_k, rows, write_tab, page,
                          trash_row, trash_page)
    new_v = _scatter_rows(pool.v, src_v, rows, write_tab, page,
                          trash_row, trash_page)
    return rms_norm(params["norm"], x, cfg.rms_norm_eps), PagedKV(new_k,
                                                                  new_v)


def decode_step_paged(
    params: dict,
    cfg: TextConfig,
    inputs_embeds: jnp.ndarray,   # [B, D]
    positions: jnp.ndarray,       # [B] int32 (engine trash-clamps done slots)
    pool: PagedKV,
    tab: jnp.ndarray,             # [B, m_cap] page tables
    *,
    kv_pages: Optional[int] = None,   # static: attend pages [0, kv_pages)
    trash_row: Optional[int] = None,
    trash_page: Optional[int] = None,
    attn_impl: str = "auto",
) -> Tuple[jnp.ndarray, PagedKV]:
    """One decode step against the page pool, op-count-frugal: the
    attended page window is gathered ONCE for all layers into contiguous
    per-slot views (the layer scan then runs the same fused decode
    attention as a contiguous cache, inheriting its Pallas-vs-XLA
    dispatch), and the new K/V rows of every layer write back in ONE
    scatter through the table. Set DETIKZIFY_TPU_PAGED_ATTN=pallas to use
    the zero-copy page-table kernel instead (no gather traffic; wins on
    bandwidth-bound directly-attached chips, loses to the gather under
    per-op dispatch floors). The kernel engages only for head_dim 128
    (e.g. the 8B flagship): smaller heads would force a full-pool pad
    copy per layer and fall back to a per-layer window gather instead."""
    import os

    if os.environ.get("DETIKZIFY_TPU_PAGED_ATTN") == "pallas":
        return _decode_step_paged_zerocopy(
            params, cfg, inputs_embeds, positions, pool, tab,
            kv_pages=kv_pages, trash_row=trash_row, trash_page=trash_page,
            attn_impl=attn_impl)

    b, d = inputs_embeds.shape
    act = ACTIVATIONS[cfg.hidden_act]
    hd, nh, nkv = cfg.head_dim, cfg.num_attention_heads, \
        cfg.num_key_value_heads
    page = pool.page
    m_cap = tab.shape[1]
    m = min(kv_pages or m_cap, m_cap)
    L = pool.k.shape[0]
    width = m * page

    inv_freq = rope_inv_freq(cfg.head_dim, cfg.rope_theta, cfg.rope_scaling)
    cos, sin = rope_cos_sin(positions, inv_freq)
    lengths = jnp.minimum(positions + 1, width)
    # in-view write row: live slots' positions are < width by the
    # dispatcher's kv bound; frozen slots clamp to the view edge (their
    # output is discarded and their pool write goes to the trash page)
    view_pos = jnp.minimum(positions, width - 1)

    sub = tab[:, :m]
    kc_all = pool.k[:, sub].reshape(L, b, width, nkv, hd)   # ONE gather
    vc_all = pool.v[:, sub].reshape(L, b, width, nkv, hd)

    def write(cache_layer, kv, pos):
        def one(slot_cache, slot_kv, p):
            return jax.lax.dynamic_update_slice(
                slot_cache, slot_kv.astype(slot_cache.dtype)[None],
                (p, 0, 0))
        return jax.vmap(one)(cache_layer, kv, pos)

    def block(x, scanned):
        lp, kc, vc = scanned
        residual = x
        h = rms_norm(lp["input_ln"], x, cfg.rms_norm_eps)
        if "qkv" in lp["attn"]:
            q, k, v = _split_qkv(linear(lp["attn"]["qkv"], h), cfg)
        else:
            q = linear(lp["attn"]["q"], h).reshape(b, nh, hd)
            k = linear(lp["attn"]["k"], h).reshape(b, nkv, hd)
            v = linear(lp["attn"]["v"], h).reshape(b, nkv, hd)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        kc = write(kc, k, view_pos)
        vc = write(vc, v, view_pos)
        h = decode_attend(q, kc, vc, lengths)
        h = linear(lp["attn"]["o"], h.reshape(b, -1))
        x = residual + h
        residual = x
        h = rms_norm(lp["post_ln"], x, cfg.rms_norm_eps)
        return residual + _mlp(lp, h, act), (k, v)

    x, (k_new, v_new) = jax.lax.scan(
        block, inputs_embeds, (params["layers"], kc_all, vc_all),
        unroll=LAYER_UNROLL)

    # ONE pool scatter for all layers: [L, B, N, H] rows at (pid, rid)
    new_k = _scatter_rows(pool.k, k_new[:, :, None], positions[:, None],
                          tab, page, trash_row, trash_page)
    new_v = _scatter_rows(pool.v, v_new[:, :, None], positions[:, None],
                          tab, page, trash_row, trash_page)
    return rms_norm(params["norm"], x, cfg.rms_norm_eps), PagedKV(new_k,
                                                                  new_v)


def _route_pool_writes(tab: jnp.ndarray, positions: jnp.ndarray, page: int,
                       trash_row: Optional[int], trash_page,
                       dead: Optional[jnp.ndarray] = None
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Resolve each write position to a pool (page, row) through the
    slot's page table, DIVERTING rows at/beyond ``trash_row`` -- and
    ``dead`` slots entirely -- to the shared trash page. Diverted writes
    must never go through a (possibly stale) released slot's table: do
    not simplify this routing (see engine/decode.py pool invariants).
    ``positions`` may be [B] (1-row decode) or [B, K1] (verify window)."""
    m_cap = tab.shape[1]
    pos2 = positions if positions.ndim == 2 else positions[:, None]
    entry = jnp.clip(pos2 // page, 0, m_cap - 1)
    pid = jnp.take_along_axis(tab, entry, axis=1)
    divert = None
    if trash_row is not None:
        divert = pos2 >= trash_row
    if dead is not None:
        divert = (dead[:, None] if divert is None
                  else divert | dead[:, None])
    if divert is not None:
        pid = jnp.where(
            divert, trash_page if trash_page is not None else tab[:, -1:],
            pid)
    if positions.ndim == 1:
        pid = pid[:, 0]
    return pid, positions % page


def _paged_block(cfg: TextConfig, act, pid, rid, cos, sin, attend):
    """Per-layer body shared by the zero-copy paged paths (1-row decode
    and K+1-row speculative verify): qkv+rope, K/V rows written straight
    into the pool through the pre-routed ``pid``/``rid``, attention via
    ``attend(q, pk, pv)``, o-proj, SwiGLU -- the two paths differ only
    in their attention window."""
    def block(x, scanned):
        lp, pk, pv = scanned
        residual = x
        h = rms_norm(lp["input_ln"], x, cfg.rms_norm_eps)
        q, k, v = _qkv(lp, h, cfg, cos, sin)
        pk = pk.at[pid, rid].set(k.astype(pk.dtype))
        pv = pv.at[pid, rid].set(v.astype(pv.dtype))
        h = attend(q, pk, pv)
        h = linear(lp["attn"]["o"], h.reshape(*x.shape[:-1], -1))
        x = residual + h
        residual = x
        h = rms_norm(lp["post_ln"], x, cfg.rms_norm_eps)
        return residual + _mlp(lp, h, act), (pk, pv)

    return block


def _decode_step_paged_zerocopy(
    params: dict,
    cfg: TextConfig,
    inputs_embeds: jnp.ndarray,
    positions: jnp.ndarray,
    pool: PagedKV,
    tab: jnp.ndarray,
    *,
    kv_pages: Optional[int] = None,
    trash_row: Optional[int] = None,
    trash_page: Optional[int] = None,
    attn_impl: str = "auto",
) -> Tuple[jnp.ndarray, PagedKV]:
    """Page-table-kernel decode step: attention reads the pool directly
    (Pallas scalar-prefetched page DMA, zero gather traffic); per-layer
    row writes scatter through the table."""
    from ..ops.paged import decode_attend_paged

    act = ACTIVATIONS[cfg.hidden_act]
    page = pool.page
    m_cap = tab.shape[1]
    m = min(kv_pages or m_cap, m_cap)

    inv_freq = rope_inv_freq(cfg.head_dim, cfg.rope_theta, cfg.rope_scaling)
    cos, sin = rope_cos_sin(positions, inv_freq)
    lengths = jnp.minimum(positions + 1, m * page)
    pid, rid = _route_pool_writes(tab, positions, page, trash_row,
                                  trash_page)

    block = _paged_block(
        cfg, act, pid, rid, cos, sin,
        lambda q, pk, pv: decode_attend_paged(q, pk, pv, tab[:, :m],
                                              lengths,
                                              implementation=attn_impl))
    x, (new_k, new_v) = jax.lax.scan(
        block, inputs_embeds, (params["layers"], pool.k, pool.v))
    return rms_norm(params["norm"], x, cfg.rms_norm_eps), PagedKV(new_k,
                                                                  new_v)


def verify_step_paged_zerocopy(
    params: dict,
    cfg: TextConfig,
    inputs_embeds: jnp.ndarray,   # [B, K1, D] -- [last, draft_1..draft_K]
    start: jnp.ndarray,           # [B] absolute pool row of column 0
    pool: PagedKV,
    tab: jnp.ndarray,             # [B, m_cap]
    *,
    dead: Optional[jnp.ndarray] = None,   # [B] bool: route writes to trash
    kv_pages: Optional[int] = None,
    trash_row: Optional[int] = None,
    trash_page: Optional[int] = None,
    attn_impl: str = "auto",
) -> Tuple[jnp.ndarray, PagedKV]:
    """Zero-copy speculative verify step: the K+1 block's K/V rows write
    straight into the pool through the page table, then the verify-window
    kernel (``ops.paged.decode_verify_attend_paged``) reads the pool with
    per-row causal limits -- no window gather, no scatter-back. ``dead``
    slots (frozen/inactive: their ``start`` is clamped small for cheap
    attention) divert ALL their writes to the trash page so a released
    slot's stale table is never written through. Semantics match the
    gather-path ``decode_verify_step`` (rows beyond the accepted count
    stay invisible via position bounds)."""
    from ..ops.paged import decode_verify_attend_paged

    _, k1, _ = inputs_embeds.shape
    act = ACTIVATIONS[cfg.hidden_act]
    page = pool.page
    m_cap = tab.shape[1]
    m = min(kv_pages or m_cap, m_cap)

    positions = start[:, None] + jnp.arange(k1)[None, :]      # [B, K1]
    inv_freq = rope_inv_freq(cfg.head_dim, cfg.rope_theta, cfg.rope_scaling)
    cos, sin = rope_cos_sin(positions, inv_freq)
    pid, rid = _route_pool_writes(
        tab, positions, page,
        trash_row if trash_row is not None else m_cap * page,
        trash_page, dead=dead)

    block = _paged_block(
        cfg, act, pid, rid, cos, sin,
        lambda q, pk, pv: decode_verify_attend_paged(
            q, pk, pv, tab[:, :m], start, implementation=attn_impl))
    x, (new_k, new_v) = jax.lax.scan(
        block, inputs_embeds, (params["layers"], pool.k, pool.v))
    return rms_norm(params["norm"], x, cfg.rms_norm_eps), PagedKV(new_k,
                                                                  new_v)
