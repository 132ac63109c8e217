"""Continuous-batching decode engine with tree-prefix KV reuse.

This replaces the reference's decode hot loop -- HF ``GenerationMixin`` at
batch 1 with full re-prefill of the 300-image-token prompt for *every* MCTS
rollout (``detikzify/infer/generate.py:218-227,246-282``; SURVEY §3.3 hot
spots) -- with a TPU-native engine:

  * a fixed pool of **slots** (rows of a preallocated contiguous KV cache);
    rollouts join/leave mid-flight and all slots advance together
    (batch = all active rollouts, not 1);
  * **block decoding**: ``decode_block`` steps run inside ONE jitted
    ``lax.scan`` per host round-trip; slots that hit EOS mid-block freeze
    (writes divert to a trash row). Essential when dispatch latency is
    non-trivial (remote TPU tunnels) and still a win on local hosts;
  * **fused start**: prefix-restore + bucketed prefill + first-token
    sampling execute as a single device program; starts are **lazy** (no
    host sync) so many rollouts can be enqueued back-to-back and overlap;
  * **prefix store**: any slot's KV prefix can be saved on device and
    restored into another slot, so an MCTS child rollout re-prefills only
    the tokens *below* its tree node. The root (image + bos) prefill
    happens exactly once per image;
  * sampling (temperature/top-p/top-k, image-token ban, first-step EOS
    suppression) fused on device.

Per-slot token/position state lives on device; the host keeps plain-int
mirrors that are updated from fetched results (never read back eagerly).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DetikzifyConfig
from ..models import detikzify, llama
from ..models.detikzify import Params
from ..models.llama import KVCache
from ..ops.sampling import SamplingParams, sample, speculative_accept

BUCKETS = (16, 32, 64, 128, 256, 512, 1024, 2048)


def _bucket(n: int, max_len: int) -> int:
    for b in BUCKETS:
        if n <= b and b <= max_len:
            return b
    return max_len


@dataclasses.dataclass
class StoredPrefix:
    """Page-table prefix: KV lives in the engine's shared page pool.

    ``pages[i]`` holds cache rows [i*page, (i+1)*page); pages are immutable
    once written (copy-on-write), so a child prefix REUSES its ancestor's
    full pages and only the tail beyond the shared page boundary is copied.
    Deep MCTS trees therefore store each token's KV once, not once per
    node (round-1 TODO #1 / VERDICT next-step #10)."""

    pages: Tuple[int, ...]     # page-pool ids, in order
    length: int                # valid tokens
    token_ids: tuple           # full token prefix (host copy, exact match)
    namespace: object = None   # scope (e.g. per-image); prevents cross-matches
    dropped: bool = False      # set on eviction: pages may be recycled


@dataclasses.dataclass
class Rollout:
    """Host-side state of one active generation."""

    slot: int
    prompt_len: int                      # tokens already in cache at start
    token_ids: List[int]                 # full sequence incl. prompt
    max_new_tokens: int
    on_token: Optional[Callable[[int], None]] = None
    new_tokens: int = 0
    finished: bool = False
    finish_reason: Optional[str] = None  # "eos" | "length" | "abort"
    aborted: bool = False

    @property
    def length(self) -> int:
        return len(self.token_ids)


class DecodeEngine:
    def __init__(
        self,
        params: Params,
        cfg: DetikzifyConfig,
        *,
        num_slots: int = 8,
        max_len: Optional[int] = None,
        cache_dtype=jnp.bfloat16,
        sampling: SamplingParams = SamplingParams(),
        eos_token_id: Optional[int] = None,
        prefix_budget_bytes: int = 2 << 30,
        decode_block: int = 16,
        pipelined: bool = False,
        page_size: int = 128,
        speculate: int = 0,
        spec_min_rate: float = 1.15,
        device=None,
    ):
        """``device``: commit all engine state (KV cache, page pool, RNG,
        per-slot token/position vectors) to one jax device, so multiple
        engines in one process each drive their own chip (replica-parallel
        inference, see ``parallel.replicas``). ``params`` must already be
        placed on the same device by the caller.

        ``speculate=K > 0`` turns on n-gram prompt-lookup speculative
        decoding: each scan step drafts K tokens from the slot's own
        recent token history (device-side bigram lookup -- TikZ code is
        highly repetitive), verifies them in ONE offset-prefill forward,
        and emits 1..K+1 tokens via distribution-preserving acceptance
        (``ops.sampling.speculative_accept``). Greedy slots emit streams
        token-identical to non-speculative decoding given identical
        logits (pinned exactly by the CPU tests; on-chip the verify
        forward and the plain decode step use different attention
        kernels, so a bf16 near-tie can in principle flip an argmax);
        sampled slots draw from the identical warped distribution. The
        per-step device cost is nearly flat in K (weights dominate), so
        acceptance directly multiplies tokens/sec.

        ``spec_min_rate``: measured tokens-per-step floor below which the
        engine PERMANENTLY falls back to plain decoding for this engine
        (checked once enough speculative steps have been observed) --
        workloads whose drafts never hit pay a fixed verify overhead, so
        speculation must earn its keep. 0 disables the bail-out."""
        self.params = params
        self.cfg = cfg
        self.num_slots = num_slots
        self.decode_block = decode_block
        self.pipelined = pipelined
        self.page = page_size
        self.spec = int(speculate)
        self.spec_min_rate = spec_min_rate
        self._spec_on = self.spec > 0
        self._spec_win = [0, 0]     # (slot-steps, device-emitted tokens)
        self._spec_bad = 0          # consecutive below-rate windows
        # last spec+1 cache rows are trash rows for frozen/inactive slots'
        # writes (one row when speculation is off -- the historical single
        # trash row); rows are padded to a whole number of prefix pages so
        # page save/restore slices never clamp
        want = (max_len or cfg.model_max_length) + 1 + self.spec
        self.max_len = -(-want // page_size) * page_size
        self._trash_start = self.max_len - 1 - self.spec
        self._m_cap = self.max_len // page_size   # pages per full slot
        self.sampling = sampling
        self.eos_token_id = (cfg.eos_token_id if eos_token_id is None
                             else eos_token_id)
        import contextlib

        self.device = device
        # allocate engine state DIRECTLY on the target device: building the
        # KV cache + page pool on the default chip and copying would spike
        # chip-0 HBM (and pay an extra transfer) for every replica engine
        dev_ctx = (jax.default_device(device) if device is not None
                   else contextlib.nullcontext())
        with dev_ctx:
            self.cache = llama.init_cache(cfg.text, num_slots, self.max_len,
                                          cache_dtype)
            self.rng = jax.random.PRNGKey(0)
        if device is not None:
            self.cache = jax.device_put(self.cache, device)
            self.rng = jax.device_put(self.rng, device)

        self._rollouts: Dict[int, Rollout] = {}
        self._free_slots = list(range(num_slots))
        # device-resident per-slot state
        self._tok_dev = jnp.zeros((num_slots,), jnp.int32)
        self._pos_dev = jnp.zeros((num_slots,), jnp.int32)
        # speculative decoding: device-side token history per slot (wider
        # than the cache so K+1-token writes at the last position never
        # clamp); -1 = empty, never matches a real token id. ``_hint_dev``
        # holds per-slot REFERENCE text (e.g. the parent rollout's
        # continuation in MCTS) searched before the slot's own history.
        self._buf_dev = None
        self._hint_dev = None
        if self.spec > 0:
            with dev_ctx:
                self._buf_dev = jnp.full(
                    (num_slots, self.max_len + self.spec + 1), -1, jnp.int32)
                self._hint_dev = jnp.full(
                    (num_slots, self.max_len), -1, jnp.int32)
        self._active = np.zeros((num_slots,), bool)       # host-controlled
        # per-slot (temperature, top_p, top_k): traced into the decode
        # programs, so per-call overrides never recompile
        self._samp_host = np.tile(
            np.asarray([sampling.temperature, sampling.top_p,
                        float(sampling.top_k)], np.float32),
            (num_slots, 1))
        self._first_pending: Dict[int, jnp.ndarray] = {}  # slot -> dev scalar

        # page pool: [L, n_pages, page, nkv, hd] shared, copy-on-write
        tcfg = cfg.text
        page_bytes = (2 * tcfg.num_hidden_layers * page_size
                      * tcfg.num_key_value_heads * tcfg.head_dim
                      * jnp.dtype(cache_dtype).itemsize)
        n_pages = int(min(max(prefix_budget_bytes // page_bytes, 2), 4096))
        with dev_ctx:
            self._pool = KVCache(
                jnp.zeros((tcfg.num_hidden_layers, n_pages, page_size,
                           tcfg.num_key_value_heads, tcfg.head_dim),
                          cache_dtype),
                jnp.zeros((tcfg.num_hidden_layers, n_pages, page_size,
                           tcfg.num_key_value_heads, tcfg.head_dim),
                          cache_dtype))
        if device is not None:
            self._pool = jax.device_put(self._pool, device)
            self._tok_dev = jax.device_put(self._tok_dev, device)
            self._pos_dev = jax.device_put(self._pos_dev, device)
            if self._buf_dev is not None:
                self._buf_dev = jax.device_put(self._buf_dev, device)
                self._hint_dev = jax.device_put(self._hint_dev, device)
        self._page_refs = np.zeros((n_pages,), np.int32)
        self._free_pages: List[int] = list(range(n_pages))
        self._prefix_store: Dict[object, StoredPrefix] = {}
        self._prefix_lru: List[object] = []
        # pipelined stepping: the in-flight scan dispatched last step
        # (device tokens, k, {slot: rollout} snapshot)
        self._inflight = None

        # observability + perf-regression pinning (SURVEY §5): device
        # program dispatches and token accounting
        self.counters = {"starts": 0, "start_dispatches": 0,
                         "prefix_starts": 0,
                         "decode_dispatches": 0, "decode_steps": 0,
                         "decode_tokens": 0,
                         "spec_steps": 0, "spec_tokens": 0,
                         "prefix_saves": 0, "prefill_tokens": 0,
                         "prefill_tokens_saved": 0}

        self._build_jit()

    # ------------------------------------------------------------------
    # jitted device programs
    # ------------------------------------------------------------------

    def _build_jit(self):
        cfg = self.cfg
        max_len = self.max_len
        eos = self.eos_token_id
        page = self.page
        m_cap = self._m_cap

        def wave_core(params, cache, tok_dev, pos_dev, slots, ids,
                      image_embeds, starts, seq_lens, img_offsets, rng,
                      samp, small, banned, suppress):
            """Shared tail of every fused start: bucketed prefill over the
            wave's ``small`` per-slot caches + first-token sampling, all in
            the enclosing single device program."""
            b = slots.shape[0]
            logits, small = detikzify.prefill(
                params, cfg, ids, image_embeds, starts, seq_lens, small,
                image_offsets=img_offsets)
            cache = KVCache(cache.k.at[:, slots].set(small.k),
                            cache.v.at[:, slots].set(small.v))
            rng, sub = jax.random.split(rng)
            firsts = sample(logits, sub,
                            temperature=samp[:, 0], top_p=samp[:, 1],
                            top_k=samp[:, 2].astype(jnp.int32),
                            banned_tokens=banned,
                            suppress_begin_tokens=suppress,
                            is_first=jnp.ones((b,), bool))
            tok_dev = tok_dev.at[slots].set(firsts)
            pos_dev = pos_dev.at[slots].set(starts + seq_lens)
            return cache, tok_dev, pos_dev, rng, firsts

        def fresh_small(cache, b):
            """Fresh wave: every row prefills from position 0, so the
            wave's slot caches begin as zeros (stale rows are masked
            everywhere by lengths)."""
            L, _, _, NKV, HD = cache.k.shape
            return KVCache(
                jnp.zeros((L, b, max_len, NKV, HD), cache.k.dtype),
                jnp.zeros((L, b, max_len, NKV, HD), cache.v.dtype))

        def paged_small(cache, pool_k, pool_v, page_tab):
            """Prefix-restore via PER-SLOT page tables. ``page_tab`` is
            [B, m_cap] with a FIXED page count (the whole slot), padding
            short tables with filler pages: the page-count dimension stays
            out of the jit cache key, so MCTS waves mixing arbitrary tree
            depths (and rows without any prefix at all) share ONE compiled
            program per (B, bucket). Filler/garbage rows land above each
            row's valid prefix and are masked everywhere by lengths
            (StoredPrefix invariant, see module docstring)."""
            L, _, _, NKV, HD = cache.k.shape
            b = page_tab.shape[0]
            return KVCache(
                pool_k[:, page_tab].reshape(L, b, m_cap * page, NKV, HD)
                .astype(cache.k.dtype),
                pool_v[:, page_tab].reshape(L, b, m_cap * page, NKV, HD)
                .astype(cache.v.dtype))

        @functools.partial(
            jax.jit, donate_argnums=(1, 2, 3),
            static_argnames=("banned", "suppress"))
        def start_wave(params, cache, tok_dev, pos_dev, slots, ids,
                       image_embeds, starts, seq_lens, img_offsets, rng,
                       samp, banned, suppress):
            """Fused start for B fresh rollouts (no stored prefix)."""
            small = fresh_small(cache, slots.shape[0])
            return wave_core(params, cache, tok_dev, pos_dev, slots, ids,
                             image_embeds, starts, seq_lens, img_offsets,
                             rng, samp, small, banned, suppress)

        @functools.partial(
            jax.jit, donate_argnums=(1, 2, 3),
            static_argnames=("banned", "suppress"))
        def start_wave_paged(params, cache, tok_dev, pos_dev, slots, ids,
                             image_embeds, starts, seq_lens, img_offsets,
                             rng, pool_k, pool_v, page_tab, samp, banned,
                             suppress):
            """Fused prefix-restore + prefill + first sample for B rollouts
            -- one device program per wave."""
            small = paged_small(cache, pool_k, pool_v, page_tab)
            return wave_core(params, cache, tok_dev, pos_dev, slots, ids,
                             image_embeds, starts, seq_lens, img_offsets,
                             rng, samp, small, banned, suppress)

        @functools.partial(
            jax.jit, donate_argnums=(1, 2, 3),
            static_argnames=("k", "kv_limit", "banned", "suppress"))
        def decode_many(params, cache, tok_dev, pos_dev, active, rng,
                        samp, k, kv_limit, banned, suppress):
            """k decode steps for all slots inside one jitted scan: one host
            round-trip per k*slots tokens. Slots that emit EOS mid-scan
            freeze: their writes divert to the trash row, they re-emit EOS,
            and their position stops advancing. ``samp`` is the [S, 3]
            per-slot (temperature, top_p, top_k) table -- traced, so any
            mix of greedy and sampled slots shares this one program.
            ``kv_limit`` (static, bucketed by the dispatcher) bounds the
            attended cache prefix so KV HBM traffic follows the LIVE max
            sequence length, not max_len."""

            def body(carry, _):
                tokens, positions, done, cache, rng = carry
                write_pos = jnp.where(done, max_len - 1,
                                      jnp.minimum(positions, max_len - 1))
                logits, cache = detikzify.decode_step(params, cfg, tokens,
                                                      write_pos, cache,
                                                      kv_limit=kv_limit)
                rng, sub = jax.random.split(rng)
                nxt = sample(logits, sub,
                             temperature=samp[:, 0], top_p=samp[:, 1],
                             top_k=samp[:, 2].astype(jnp.int32),
                             banned_tokens=banned,
                             suppress_begin_tokens=suppress, is_first=None)
                nxt = jnp.where(done, eos, nxt)
                new_done = done | (nxt == eos)
                positions = jnp.where(done, positions, positions + 1)
                return (nxt, positions, new_done, cache, rng), nxt

            done0 = ~active | (tok_dev == eos)
            (tok_dev, pos_dev, _, cache, rng), toks = jax.lax.scan(
                body, (tok_dev, pos_dev, done0, cache, rng), None, length=k)
            return toks, cache, tok_dev, pos_dev, rng

        spec = self.spec
        if spec > 0:
            k1 = spec + 1
            trash = self._trash_start

            @functools.partial(
                jax.jit, donate_argnums=(1, 2, 3, 11, 13),
                static_argnames=("banned", "suppress"))
            def start_wave_spec(params, cache, tok_dev, pos_dev, slots, ids,
                                image_embeds, starts, seq_lens, img_offsets,
                                rng, buf, full_ids, hint, hint_rows, samp,
                                banned, suppress):
                """start_wave + token-history and reference-hint rows for
                speculative drafts: the full prompt (incl. any restored
                prefix), the first sampled token, and the caller's hint
                text land on device inside the same program."""
                small = fresh_small(cache, slots.shape[0])
                cache, tok_dev, pos_dev, rng, firsts = wave_core(
                    params, cache, tok_dev, pos_dev, slots, ids,
                    image_embeds, starts, seq_lens, img_offsets, rng, samp,
                    small, banned, suppress)
                buf = buf.at[slots].set(full_ids)
                buf = buf.at[slots, starts + seq_lens].set(firsts)
                hint = hint.at[slots].set(hint_rows)
                return cache, tok_dev, pos_dev, rng, firsts, buf, hint

            @functools.partial(
                jax.jit, donate_argnums=(1, 2, 3, 14, 16),
                static_argnames=("banned", "suppress"))
            def start_wave_paged_spec(params, cache, tok_dev, pos_dev,
                                      slots, ids, image_embeds, starts,
                                      seq_lens, img_offsets, rng, pool_k,
                                      pool_v, page_tab, buf, full_ids, hint,
                                      hint_rows, samp, banned, suppress):
                small = paged_small(cache, pool_k, pool_v, page_tab)
                cache, tok_dev, pos_dev, rng, firsts = wave_core(
                    params, cache, tok_dev, pos_dev, slots, ids,
                    image_embeds, starts, seq_lens, img_offsets, rng, samp,
                    small, banned, suppress)
                buf = buf.at[slots].set(full_ids)
                buf = buf.at[slots, starts + seq_lens].set(firsts)
                hint = hint.at[slots].set(hint_rows)
                return cache, tok_dev, pos_dev, rng, firsts, buf, hint

            @functools.partial(
                jax.jit, donate_argnums=(1, 2, 3, 4),
                static_argnames=("k", "banned"))
            def decode_many_spec(params, cache, tok_dev, pos_dev, buf,
                                 hint, active, rng, samp, k, banned):
                """k speculative steps for all slots in one jitted scan.

                Per step and slot: draft ``spec`` tokens by bigram lookup
                over the slot's own token history, verify them in ONE
                offset-prefill forward (rows pos..pos+spec; rows beyond the
                accepted count stay invisible -- attention is bounded by
                per-slot positions), and emit 1..spec+1 tokens via
                distribution-preserving acceptance. Frozen slots write to
                the trash block and re-emit EOS. Returns per-step token
                blocks [k, S, spec+1] and emit counts [k, S]."""

                def body(carry, _):
                    tokens, positions, done, cache, buf, rng = carry
                    # --- draft: n-gram match over the slot's history.
                    # Prefer (1) the most recent TRIGRAM match with a full
                    # continuation in history (longer context = fewer false
                    # matches), then (2) the most recent full-continuation
                    # bigram match (a tail-adjacent match would draft off
                    # the end of the sequence -- mostly empty), then (3)
                    # the most recent bigram match of any kind.
                    t_prev = jnp.take_along_axis(
                        buf, jnp.maximum(positions - 1, 0)[:, None], 1)[:, 0]
                    t_prev2 = jnp.take_along_axis(
                        buf, jnp.maximum(positions - 2, 0)[:, None], 1)[:, 0]
                    match = ((buf[:, :-1] == t_prev[:, None])
                             & (buf[:, 1:] == tokens[:, None]))
                    match3 = match.at[:, 1:].set(
                        match[:, 1:] & (buf[:, :-2] == t_prev2[:, None]))
                    match3 = match3.at[:, 0].set(False)
                    iidx = jnp.arange(buf.shape[1] - 1)[None, :]
                    earlier = match & (iidx + 1 < positions[:, None])
                    in_full = iidx + 1 + spec <= positions[:, None]
                    # trigram context only meaningful with >= 2 tokens back
                    tri_ok = (positions >= 2)[:, None]
                    j_tri = jnp.where(match3 & earlier & in_full & tri_ok,
                                      iidx, -1).max(axis=1)
                    j_full = jnp.where(earlier & in_full, iidx, -1).max(1)
                    j_any = jnp.where(earlier, iidx, -1).max(axis=1)
                    jstar = jnp.where(j_tri >= 0, j_tri,
                                      jnp.where(j_full >= 0, j_full, j_any))
                    src = jnp.clip(jstar + 2, 0, buf.shape[1] - spec)
                    gathered = jax.vmap(
                        lambda row, s0: jax.lax.dynamic_slice(
                            row, (s0,), (spec,)))(buf, src)
                    in_hist = (src[:, None] + jnp.arange(spec)[None, :]
                               <= positions[:, None])
                    drafts = jnp.where((jstar >= 0)[:, None] & in_hist,
                                       gathered, -1)
                    # --- reference-hint lookup (MCTS: the parent rollout's
                    # continuation). A hint trigram match outranks the
                    # slot's own history, but only matches whose
                    # continuation starts with a REAL token (not tail
                    # padding) may displace an own-history draft -- a
                    # tail-of-hint match would draft -1s and cost the
                    # real draft the history had.
                    hmatch = ((hint[:, :-1] == t_prev[:, None])
                              & (hint[:, 1:] == tokens[:, None]))
                    hmatch3 = hmatch.at[:, 1:].set(
                        hmatch[:, 1:] & (hint[:, :-2] == t_prev2[:, None]))
                    hmatch3 = hmatch3.at[:, 0].set(False)
                    hidx = jnp.arange(hint.shape[1] - 1)[None, :]
                    good = jnp.pad(hint[:, 2:] != -1, ((0, 0), (0, 1)))
                    jh3 = jnp.where(hmatch3 & good & tri_ok,
                                    hidx, -1).max(axis=1)
                    jh2 = jnp.where(hmatch & good, hidx, -1).max(axis=1)
                    jh_any = jnp.where(hmatch, hidx, -1).max(axis=1)
                    jh = jnp.where(jh3 >= 0, jh3,
                                   jnp.where(jh2 >= 0, jh2, jh_any))
                    use_hint = ((jh3 >= 0) | ((j_tri < 0) & (jh2 >= 0))
                                | ((jstar < 0) & (jh_any >= 0)))
                    hsrc = jnp.clip(jh + 2, 0, hint.shape[1] - spec)
                    hgather = jax.vmap(
                        lambda row, s0: jax.lax.dynamic_slice(
                            row, (s0,), (spec,)))(hint, hsrc)
                    drafts = jnp.where(use_hint[:, None], hgather, drafts)
                    # --- verify forward over [last, d_1..d_spec]
                    w = jnp.where(done, trash,
                                  jnp.minimum(positions, trash))
                    block = jnp.concatenate(
                        [tokens[:, None], jnp.maximum(drafts, 0)], axis=1)
                    logits, cache = detikzify.decode_verify_step(
                        params, cfg, block, w, cache)
                    rng, sub = jax.random.split(rng)
                    emitted, counts = speculative_accept(
                        logits, drafts, sub,
                        temperature=samp[:, 0], top_p=samp[:, 1],
                        top_k=samp[:, 2].astype(jnp.int32),
                        banned_tokens=banned)
                    # --- EOS truncation + frozen-slot forcing
                    pos_k = jnp.arange(k1)[None, :]
                    hit = (emitted == eos) & (pos_k < counts[:, None])
                    has_eos = hit.any(axis=1)
                    counts = jnp.where(has_eos,
                                       jnp.argmax(hit, axis=1) + 1, counts)
                    emitted = jnp.where(
                        done[:, None],
                        jnp.where(pos_k == 0, eos, 0), emitted)
                    counts = jnp.where(done, 1, counts)
                    adv = jnp.where(done, 0, counts)
                    # --- token history update (garbage beyond the accepted
                    # count is masked by the position bounds above)
                    buf = jax.vmap(
                        lambda row, e, p: jax.lax.dynamic_update_slice(
                            row, e, (p,)))(buf, emitted, positions + 1)
                    last = jnp.take_along_axis(
                        emitted, jnp.maximum(counts - 1, 0)[:, None],
                        1)[:, 0]
                    new_done = done | has_eos
                    return ((last, positions + adv, new_done, cache, buf,
                             rng), (emitted, adv))

                done0 = ~active | (tok_dev == eos)
                ((tok_dev, pos_dev, _, cache, buf, rng),
                 (toks, counts)) = jax.lax.scan(
                    body, (tok_dev, pos_dev, done0, cache, buf, rng),
                    None, length=k)
                return toks, counts, cache, tok_dev, pos_dev, buf, rng

            self._start_wave_spec = start_wave_spec
            self._start_wave_paged_spec = start_wave_paged_spec
            self._decode_many_spec = decode_many_spec

        @functools.partial(jax.jit, donate_argnums=(0, 1),
                           static_argnames=("m",))
        def save_pages(pool_k, pool_v, cache_k, cache_v, slot, page_ids,
                       start, m):
            """Copy m pages of one slot's cache rows (starting at the
            page-aligned token ``start``) into the pool at ``page_ids``."""
            L, _, _, NKV, HD = cache_k.shape
            rows_k = jax.lax.dynamic_slice(
                cache_k, (0, slot, start, 0, 0), (L, 1, m * page, NKV, HD))
            rows_v = jax.lax.dynamic_slice(
                cache_v, (0, slot, start, 0, 0), (L, 1, m * page, NKV, HD))
            pool_k = pool_k.at[:, page_ids].set(
                rows_k.reshape(L, m, page, NKV, HD).astype(pool_k.dtype))
            pool_v = pool_v.at[:, page_ids].set(
                rows_v.reshape(L, m, page, NKV, HD).astype(pool_v.dtype))
            return pool_k, pool_v

        @jax.jit
        def encode_image(params, pixel_values):
            return detikzify.encode_image(params, cfg, pixel_values)

        if cfg.adapter is not None:
            from ..models.siglip import AdapterInputs

            @jax.jit
            def encode_image_adapter(params, pixel_values, adapter_layers,
                                     cross_states, cross_mask):
                ai = AdapterInputs(adapter_layers, cfg.adapter,
                                   cross_states, cross_mask)
                return detikzify.encode_image(params, cfg, pixel_values,
                                              adapter=ai)

            self._encode_image_adapter = encode_image_adapter

        self._start_wave = start_wave
        self._start_wave_paged = start_wave_paged
        self._decode_many = decode_many
        self._save_pages = save_pages
        self._encode_image = encode_image

    # ------------------------------------------------------------------
    # prefix store
    # ------------------------------------------------------------------

    def _put(self, x) -> jnp.ndarray:
        """Transient host array -> device array, committed to the engine's
        device when one is set (replica engines on chips 1..R-1 must not
        route per-dispatch scalars through the default device)."""
        if self.device is not None:
            return jax.device_put(x, self.device)
        return jnp.asarray(x)

    def _alloc_pages(self, n: int) -> Optional[List[int]]:
        """Pop n free pages, LRU-evicting stored prefixes as needed."""
        while len(self._free_pages) < n and len(self._prefix_lru) > 0:
            self._drop_key(self._prefix_lru[0])
        if len(self._free_pages) < n:
            return None
        return [self._free_pages.pop() for _ in range(n)]

    def _drop_key(self, key) -> None:
        sp = self._prefix_store.pop(key, None)
        if key in self._prefix_lru:
            self._prefix_lru.remove(key)
        if sp is None:
            return
        sp.dropped = True   # external handles must not restore from it
        for pid in sp.pages:
            self._page_refs[pid] -= 1
            if self._page_refs[pid] == 0:
                self._free_pages.append(pid)

    @property
    def prefix_pages_used(self) -> int:
        """Distinct pages held by the store (memory diagnostic: shared
        pages count once)."""
        return int((self._page_refs > 0).sum())

    def store_prefix(self, key, rollout: Rollout,
                     length: Optional[int] = None,
                     namespace: object = None) -> Optional[StoredPrefix]:
        """Save rollout's first ``length`` tokens of KV under ``key``.

        Copy-on-write: full pages covered by an already-stored ancestor
        prefix (longest token match in the namespace) are SHARED -- only
        the tail beyond the last shared page boundary is copied off the
        slot. Returns None when the pool cannot hold the new tail."""
        length = rollout.length if length is None else length
        if key in self._prefix_store:
            return self._prefix_store[key]
        ids = tuple(rollout.token_ids[:length])

        shared: Tuple[int, ...] = ()
        found = self.best_prefix(ids, namespace=namespace)
        if found is not None:
            anc = found[1]
            n_shared = min(anc.length, length) // self.page
            shared = anc.pages[:n_shared]

        # pin shared pages BEFORE allocating: allocation may LRU-evict the
        # ancestor, and unpinned pages would go straight back to the free
        # list we are about to draw from
        for pid in shared:
            self._page_refs[pid] += 1
        n_total = -(-length // self.page)
        new_ids = self._alloc_pages(n_total - len(shared))
        if new_ids is None:
            for pid in shared:
                self._page_refs[pid] -= 1
                if self._page_refs[pid] == 0:
                    self._free_pages.append(pid)
            return None
        if new_ids:
            pk, pv = self._save_pages(
                self._pool.k, self._pool.v, self.cache.k, self.cache.v,
                self._put(np.int32(rollout.slot)),
                self._put(np.asarray(new_ids, np.int32)),
                self._put(np.int32(len(shared) * self.page)),
                m=len(new_ids))
            self._pool = KVCache(pk, pv)
            self.counters["prefix_saves"] += 1
        sp = StoredPrefix(pages=shared + tuple(new_ids), length=length,
                          token_ids=ids, namespace=namespace)
        for pid in new_ids:            # shared pages were pinned above
            self._page_refs[pid] += 1
        self._prefix_store[key] = sp
        self._prefix_lru.append(key)
        return sp

    def get_prefix(self, key) -> Optional[StoredPrefix]:
        sp = self._prefix_store.get(key)
        if sp is not None and key in self._prefix_lru:
            self._prefix_lru.remove(key)
            self._prefix_lru.append(key)
        return sp

    def best_prefix(self, token_ids: Sequence[int], namespace: object = None
                    ) -> Optional[Tuple[object, StoredPrefix]]:
        """Longest stored prefix in ``namespace`` matching ``token_ids[:len]``.

        A hit refreshes the key's LRU position: the hottest prefixes (the
        root image+prompt above every rollout) must survive pool-pressure
        eviction, not die in insertion order."""
        best = None
        ids = tuple(token_ids)
        for key, sp in self._prefix_store.items():
            if sp.namespace != namespace:
                continue
            if sp.length <= len(ids) and sp.token_ids == ids[:sp.length]:
                if best is None or sp.length > best[1].length:
                    best = (key, sp)
        if best is not None and best[0] in self._prefix_lru:
            self._prefix_lru.remove(best[0])
            self._prefix_lru.append(best[0])
        return best

    def has_prefix(self, key) -> bool:
        return key in self._prefix_store

    def drop_prefix(self, key) -> None:
        """Evict one stored prefix (frees its unshared pages)."""
        self._drop_key(key)

    def drop_namespace(self, namespace: object) -> None:
        """Evict all prefixes belonging to one generator/image."""
        for key in [k for k, sp in self._prefix_store.items()
                    if sp.namespace == namespace]:
            self._drop_key(key)

    # ------------------------------------------------------------------
    # rollout lifecycle
    # ------------------------------------------------------------------

    def _launch_group(self, rollouts: List[Rollout],
                      prefixes: List[Optional[StoredPrefix]],
                      image_embeds: Optional[jnp.ndarray],
                      hints: Optional[List[Optional[Sequence[int]]]] = None,
                      ) -> None:
        """Dispatch ONE fused start program for these rollouts.

        Each row may carry its own stored prefix (or none): restores go
        through per-slot page tables of fixed width, so any mix of tree
        depths shares one compiled program per (B, bucket). Starts are
        lazy; first tokens arrive at the next ``step()``/``flush()``."""
        b = len(rollouts)
        use_paged = any(pf is not None for pf in prefixes)
        page_tab = np.zeros((b, self._m_cap), np.int32)
        starts_l: List[int] = []
        tails: List[List[int]] = []
        for i, (ro, pf) in enumerate(zip(rollouts, prefixes)):
            start_pos = 0
            if pf is not None:
                start_pos = min(pf.length, len(ro.token_ids) - 1)
                page_tab[i, :len(pf.pages)] = pf.pages
                self.counters["prefix_starts"] += 1
            starts_l.append(start_pos)
            tails.append(ro.token_ids[start_pos:])
        bucket = _bucket(max(len(t) for t in tails), self.max_len)
        for i, ro in enumerate(rollouts):
            # the [B, bucket] block writes at per-row start: a start past
            # max_len - bucket would make dynamic_update_slice CLAMP the
            # write (silently shifting the whole block). Re-prefill a bit
            # more of the (matching) prefix instead -- the adjusted tail
            # still fits: len(p) - (max_len - bucket) <= bucket - 1.
            if starts_l[i] + bucket > self.max_len:
                starts_l[i] = self.max_len - bucket
                tails[i] = ro.token_ids[starts_l[i]:]
        # image tokens already in the restored cache before each block: a
        # re-prefilled image token must receive its TRUE position's
        # embedding, not image_embeds[:, 0] (GRPO prompts are all image
        # tokens, so their prefix-restored tails hit this)
        image_tok = self.cfg.image_token_id
        img_offsets = [ro.token_ids[:s].count(image_tok)
                       for ro, s in zip(rollouts, starts_l)]
        ids = np.zeros((b, bucket), np.int32)
        for i, t in enumerate(tails):
            ids[i, :len(t)] = t
        if image_embeds is None:
            image_embeds = jnp.zeros(
                (1, self.cfg.image_seq_len, self.cfg.text.hidden_size),
                self.params.text["embed_tokens"].dtype)
        if image_embeds.shape[0] == 1 and b > 1:
            image_embeds = jnp.broadcast_to(
                image_embeds, (b,) + image_embeds.shape[1:])

        slots = [ro.slot for ro in rollouts]
        self.counters["starts"] += b
        self.counters["start_dispatches"] += 1
        self.counters["prefill_tokens"] += sum(len(t) for t in tails)
        self.counters["prefill_tokens_saved"] += sum(starts_l)
        dev = self._put
        args = (self.params, self.cache, self._tok_dev, self._pos_dev,
                dev(np.asarray(slots, np.int32)), dev(ids),
                image_embeds, dev(np.asarray(starts_l, np.int32)),
                dev(np.asarray([len(t) for t in tails], np.int32)),
                dev(np.asarray(img_offsets, np.int32)), self.rng)
        samp = dev(self._samp_host[slots])
        if self.spec > 0:
            full_ids = np.full((b, self._buf_dev.shape[1]), -1, np.int32)
            hint_rows = np.full((b, self._hint_dev.shape[1]), -1, np.int32)
            for i, ro in enumerate(rollouts):
                full_ids[i, :len(ro.token_ids)] = ro.token_ids
                h = hints[i] if hints is not None else None
                if h:
                    n = min(len(h), hint_rows.shape[1])
                    hint_rows[i, :n] = list(h)[:n]
            if use_paged:
                (self.cache, self._tok_dev, self._pos_dev, self.rng,
                 firsts, self._buf_dev,
                 self._hint_dev) = self._start_wave_paged_spec(
                    *args, self._pool.k, self._pool.v, dev(page_tab),
                    self._buf_dev, dev(full_ids), self._hint_dev,
                    dev(hint_rows), samp,
                    banned=self._banned(), suppress=self._suppress())
            else:
                (self.cache, self._tok_dev, self._pos_dev, self.rng,
                 firsts, self._buf_dev,
                 self._hint_dev) = self._start_wave_spec(
                    *args, self._buf_dev, dev(full_ids), self._hint_dev,
                    dev(hint_rows), samp,
                    banned=self._banned(), suppress=self._suppress())
        elif use_paged:
            (self.cache, self._tok_dev, self._pos_dev, self.rng,
             firsts) = self._start_wave_paged(
                *args, self._pool.k, self._pool.v, dev(page_tab),
                samp, banned=self._banned(), suppress=self._suppress())
        else:
            (self.cache, self._tok_dev, self._pos_dev, self.rng,
             firsts) = self._start_wave(
                *args, samp, banned=self._banned(),
                suppress=self._suppress())
        for i, ro in enumerate(rollouts):
            self._rollouts[ro.slot] = ro
            self._active[ro.slot] = True
            self._first_pending[ro.slot] = firsts[i]

    def _make_rollout(self, token_ids: Sequence[int], max_new_tokens: int,
                      sampling: Optional[SamplingParams],
                      on_token) -> Rollout:
        slot = self._free_slots.pop()
        sp = sampling if sampling is not None else self.sampling
        self._samp_host[slot] = (sp.temperature, sp.top_p, float(sp.top_k))
        return Rollout(slot=slot, prompt_len=len(token_ids),
                       token_ids=list(token_ids),
                       max_new_tokens=max(
                           min(max_new_tokens,
                               self._trash_start - len(token_ids)), 1),
                       on_token=on_token)

    @staticmethod
    def _check_prefix(token_ids: Sequence[int],
                      prefix: Optional[StoredPrefix]
                      ) -> Optional[StoredPrefix]:
        if prefix is None or prefix.dropped:
            return None     # evicted: its pages may have been recycled
        assert tuple(token_ids[:prefix.length]) == prefix.token_ids, \
            "prefix mismatch"
        return prefix

    def start(
        self,
        token_ids: Sequence[int],
        image_embeds: Optional[jnp.ndarray] = None,
        *,
        max_new_tokens: int = 1024,
        on_token: Optional[Callable[[int], None]] = None,
        prefix: Optional[StoredPrefix] = None,
        lazy: bool = False,
        sampling: Optional[SamplingParams] = None,
        hint: Optional[Sequence[int]] = None,
    ) -> Rollout:
        """Begin generating after ``token_ids``. Returns a Rollout handle.

        The prefill + first-token sample run as one fused device program.
        With ``lazy=True`` the first token is not fetched to the host until
        the next ``step()``/``flush()`` -- callers can enqueue many starts
        back-to-back with zero host syncs. ``hint`` (speculative engines
        only) is reference text for draft lookup -- e.g. the parent
        rollout's continuation in MCTS.
        """
        if not self._free_slots:
            raise RuntimeError("no free slots")
        token_ids = list(token_ids)
        prefix = self._check_prefix(token_ids, prefix)
        ro = self._make_rollout(token_ids, max_new_tokens, sampling,
                                on_token)
        self._launch_group([ro], [prefix], image_embeds, hints=[hint])
        if not lazy:
            self.flush()
        return ro

    def start_many(
        self,
        prompts: Sequence[Sequence[int]],
        image_embeds: Optional[jnp.ndarray] = None,   # [B,seq,H] or [1,..]
        *,
        max_new_tokens=1024,                          # int or per-prompt seq
        prefix: Optional[StoredPrefix] = None,        # shared by all
        prefixes: Optional[Sequence[Optional[StoredPrefix]]] = None,
        sampling: Optional[SamplingParams] = None,
        on_token: Optional[Callable[[int], None]] = None,
        hints: Optional[Sequence[Optional[Sequence[int]]]] = None,
    ) -> List[Rollout]:
        """Start a BURST of rollouts in fused device programs.

        Rollouts may share one stored prefix (``prefix`` -- e.g. GRPO's g
        rollouts from one image prompt) or carry per-prompt ``prefixes``
        (MCTS expansion waves mixing tree depths). Bursts are chunked into
        power-of-two group sizes so the jit cache stays bounded: cost is
        one dispatch per chunk vs one per rollout. Starts are lazy; first
        tokens arrive at the next ``step()``/``flush()``."""
        b = len(prompts)
        assert b >= 1
        if b > len(self._free_slots):
            raise RuntimeError("no free slots")
        if prefixes is None:
            prefixes = [prefix] * b
        assert len(prefixes) == b
        pfs = [self._check_prefix(p, pf)
               for p, pf in zip(prompts, prefixes)]
        mnt = (list(max_new_tokens)
               if isinstance(max_new_tokens, (list, tuple))
               else [max_new_tokens] * b)
        assert len(mnt) == b
        rollouts = [self._make_rollout(list(p), m, sampling, on_token)
                    for p, m in zip(prompts, mnt)]
        if (image_embeds is not None and image_embeds.shape[0] == 1
                and b > 1):
            image_embeds = jnp.broadcast_to(
                image_embeds, (b,) + image_embeds.shape[1:])
        i = 0
        while i < b:
            n = 1
            while n * 2 <= b - i:    # largest power of two that still fits
                n *= 2
            emb = None if image_embeds is None else image_embeds[i:i + n]
            self._launch_group(
                rollouts[i:i + n], pfs[i:i + n], emb,
                hints=None if hints is None else list(hints[i:i + n]))
            i += n
        return rollouts

    def flush(self) -> List[Rollout]:
        """Fetch pending first tokens to the host; returns rollouts that
        finished as a result (eos/abort/budget)."""
        if not self._first_pending:
            return []
        slots = list(self._first_pending)
        values = jax.device_get([self._first_pending[s] for s in slots])
        self._first_pending.clear()
        finished = []
        for slot, tok in zip(slots, values):
            ro = self._rollouts.get(slot)
            if ro is None:
                continue
            self._accept_token(ro, int(tok))
            if ro.finished:
                finished.append(ro)
        return finished

    def _banned(self) -> tuple:
        return (self.cfg.image_token_id,)

    def _suppress(self) -> tuple:
        return (self.eos_token_id,)

    def _accept_token(self, ro: Rollout, tok: int) -> None:
        ro.token_ids.append(tok)
        ro.new_tokens += 1
        if ro.on_token is not None:
            ro.on_token(tok)
        if tok == self.eos_token_id:
            ro.finished, ro.finish_reason = True, "eos"
        elif ro.new_tokens >= ro.max_new_tokens:
            ro.finished, ro.finish_reason = True, "length"
        elif ro.aborted:
            ro.finished, ro.finish_reason = True, "abort"
        if ro.finished:
            self._active[ro.slot] = False

    def abort(self, ro: Rollout) -> None:
        ro.aborted = True

    def release(self, ro: Rollout) -> None:
        if ro.slot in self._rollouts and self._rollouts[ro.slot] is ro:
            del self._rollouts[ro.slot]
            self._active[ro.slot] = False
            self._first_pending.pop(ro.slot, None)
            self._free_slots.append(ro.slot)

    @property
    def num_active(self) -> int:
        return int(self._active.sum())

    @property
    def num_free_slots(self) -> int:
        """Slots available for ``start``/``start_many`` right now."""
        return len(self._free_slots)

    # ------------------------------------------------------------------
    # stepping
    # ------------------------------------------------------------------

    def _kv_limit(self, k: int) -> int:
        """Smallest bucket covering every live slot's rows after k more
        steps (+1 block of slack for pipelined dispatch)."""
        live = [len(ro.token_ids) for slot, ro in self._rollouts.items()
                if self._active[slot]]
        if not live:
            return self.max_len
        need = max(live) + k + (self.decode_block if self.pipelined else 0)
        for b in BUCKETS:
            if need <= b <= self.max_len:
                return b
        return self.max_len

    def _dispatch(self, k: int) -> None:
        """Launch one decode scan asynchronously and record the snapshot of
        which rollout owned each slot at dispatch time."""
        self.counters["decode_dispatches"] += 1
        self.counters["decode_steps"] += k
        if self.spec > 0 and self._spec_on:
            (toks_dev, counts_dev, self.cache, self._tok_dev,
             self._pos_dev, self._buf_dev, self.rng) = \
                self._decode_many_spec(
                    self.params, self.cache, self._tok_dev, self._pos_dev,
                    self._buf_dev, self._hint_dev, self._put(self._active),
                    self.rng, self._put(self._samp_host), k, self._banned())
        else:
            counts_dev = None
            toks_dev, self.cache, self._tok_dev, self._pos_dev, self.rng = \
                self._decode_many(
                    self.params, self.cache, self._tok_dev, self._pos_dev,
                    self._put(self._active), self.rng,
                    self._put(self._samp_host),
                    k, self._kv_limit(k), self._banned(), self._suppress())
        owners = {slot: ro for slot, ro in self._rollouts.items()
                  if self._active[slot]}
        self._inflight = (toks_dev, counts_dev, k, owners)

    def _consume(self, inflight) -> List[Rollout]:
        """Fetch a dispatched scan's tokens (one host sync, shared with any
        pending first tokens) and deliver them to their rollouts."""
        first_slots = list(self._first_pending)
        firsts_dev = [self._first_pending[s] for s in first_slots]
        spec_run = False
        if inflight is None:
            firsts = jax.device_get(firsts_dev) if first_slots else []
            toks, counts, k, owners = None, None, 0, {}
        else:
            toks_dev, counts_dev, k, owners = inflight
            firsts, toks, counts = jax.device_get(
                (firsts_dev, toks_dev, counts_dev))
            toks = np.asarray(toks)      # [k, S] or [k, S, spec+1]
            if counts is None:           # non-speculative: 1 token/step
                toks = toks[:, :, None]
                counts = np.ones(toks.shape[:2], np.int32)
            else:
                spec_run = True
                counts = np.asarray(counts)
        self._first_pending.clear()

        finished = []
        for slot, tok in zip(first_slots, firsts):
            ro = self._rollouts.get(slot)
            if ro is None:
                continue
            self._accept_token(ro, int(tok))
            if ro.finished:
                finished.append(ro)
        for slot, ro in owners.items():
            # skip slots whose rollout was replaced/finished since dispatch
            if self._rollouts.get(slot) is not ro or ro.finished:
                continue
            for i in range(k):
                if spec_run:
                    # acceptance accounting uses the DEVICE counts, not the
                    # host-truncated token loop below: budget cutoffs would
                    # otherwise report rate 1.0 for high-acceptance slots
                    self.counters["spec_steps"] += 1
                    self.counters["spec_tokens"] += int(counts[i, slot])
                    self._spec_win[0] += 1
                    self._spec_win[1] += int(counts[i, slot])
                for j in range(int(counts[i, slot])):
                    self.counters["decode_tokens"] += 1
                    self._accept_token(ro, int(toks[i, slot, j]))
                    if ro.finished:
                        finished.append(ro)
                        break
                if ro.finished:
                    break
        self._maybe_disable_spec()
        return finished

    @property
    def spec_rate(self) -> float:
        """Measured speculative tokens-per-step (1 = no draft ever
        accepted, spec+1 = every draft accepted)."""
        steps = self.counters["spec_steps"]
        return self.counters["spec_tokens"] / steps if steps else 0.0

    def _maybe_disable_spec(self) -> None:
        """Fall back to plain decoding when drafts are not earning their
        verify overhead (the acceptance rate is workload-dependent; TikZ
        repetition usually pays, arbitrary text may not).

        Decided on SLIDING windows of 1024 slot-steps, and only after two
        consecutive below-rate windows: a single cold-start window (short
        histories draft poorly) must not disable speculation forever."""
        if not (self._spec_on and self.spec_min_rate > 0):
            return
        steps, toks = self._spec_win
        if steps < 1024:
            return
        self._spec_win = [0, 0]
        if toks / steps < self.spec_min_rate:
            self._spec_bad += 1
            if self._spec_bad >= 2:
                self._spec_on = False
        else:
            self._spec_bad = 0

    def step(self, k: Optional[int] = None) -> List[Rollout]:
        """Advance decoding by one block. Returns rollouts that finished.

        Synchronous by default: dispatch a scan, fetch its tokens. With
        ``pipelined=True`` scan N+1 launches BEFORE scan N's tokens are
        fetched -- device execution overlaps host-side token processing,
        at the cost of finish detection lagging one block (useful for
        small decode blocks under high dispatch latency; measured a net
        loss at block>=32, hence opt-in)."""
        k = self.decode_block if k is None else k
        if not self.pipelined:
            if self._active.any():
                self._dispatch(k)
            prev, self._inflight = self._inflight, None
            return self._consume(prev)
        prev, self._inflight = self._inflight, None
        if self._active.any():
            self._dispatch(k)
        if prev is None and self._inflight is not None \
                and not self._first_pending:
            return []                    # pipeline primed; tokens next call
        return self._consume(prev)

    @property
    def has_inflight(self) -> bool:
        return self._inflight is not None

    def flush_steps(self) -> List[Rollout]:
        """Drain the in-flight scan without dispatching a new one."""
        prev, self._inflight = self._inflight, None
        return self._consume(prev)

    def run(self, max_steps: Optional[int] = None) -> List[Rollout]:
        """Step until every rollout finishes; returns them all."""
        done: List[Rollout] = []
        steps = 0
        while (self._active.any() or self._first_pending
               or self._inflight is not None):
            done.extend(self.step())
            steps += 1
            if max_steps is not None and steps >= max_steps:
                break
        return done

    # ------------------------------------------------------------------
    # helpers
    # ------------------------------------------------------------------

    def encode_image(self, pixel_values: jnp.ndarray,
                     adapter_inputs=None) -> jnp.ndarray:
        """[B,H,W,C] -> projected image tokens (vision runs once/image).

        With ``adapter_inputs`` (an ``AdapterInputs``), the vision tower is
        caption-conditioned through the TikZero cross-attention blocks."""
        if self.device is not None:
            pixel_values = jax.device_put(pixel_values, self.device)
        if adapter_inputs is None:
            return self._encode_image(self.params, pixel_values)
        return self._encode_image_adapter(
            self.params, pixel_values, adapter_inputs.params,
            adapter_inputs.cross_states, adapter_inputs.cross_mask)
