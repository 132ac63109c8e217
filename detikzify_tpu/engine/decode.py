"""Continuous-batching decode engine with tree-prefix KV reuse.

This replaces the reference's decode hot loop -- HF ``GenerationMixin`` at
batch 1 with full re-prefill of the 300-image-token prompt for *every* MCTS
rollout (``detikzify/infer/generate.py:218-227,246-282``; SURVEY §3.3 hot
spots) -- with a TPU-native engine:

  * a fixed pool of **slots** (rows of a preallocated contiguous KV cache);
    rollouts join/leave mid-flight, all slots advance in ONE jitted decode
    step per token (batch = all active rollouts, not 1);
  * **bucketed prefill** (powers-of-two block lengths -> a handful of
    compiled programs, no shape churn);
  * **prefix store**: any slot's KV prefix can be saved on device and
    restored into another slot, so an MCTS child rollout re-prefills only
    the tokens *below* its tree node instead of the whole prompt. The root
    (image + bos) prefill happens exactly once per image;
  * sampling (temperature/top-p/top-k, image-token ban, first-step EOS
    suppression) fused into the decode step on device;
  * async host streaming: step N+1 is dispatched before step N's tokens are
    fetched, hiding transfer latency behind compute.

All device code is functional; the engine object owns the (donated) cache
and per-slot host bookkeeping.
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
from ..ops.sampling import SamplingParams, sample

BUCKETS = (16, 32, 64, 128, 256, 512, 1024, 2048)


def _bucket(n: int, max_len: int) -> int:
    for b in BUCKETS:
        if n <= b and b <= max_len:
            return b
    return max_len


@dataclasses.dataclass
class StoredPrefix:
    """Device-resident KV prefix (k/v: [layers, bucket, nkv, hd])."""

    k: jnp.ndarray
    v: jnp.ndarray
    length: int          # valid tokens
    token_ids: tuple     # full token prefix (host copy, for exact matching)
    namespace: object = None   # scope (e.g. per-image); prevents cross-matches

    @property
    def bucket(self) -> int:
        return self.k.shape[1]

    def nbytes(self) -> int:
        return self.k.nbytes + self.v.nbytes


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
    ):
        self.params = params
        self.cfg = cfg
        self.num_slots = num_slots
        # last cache row is a trash row for inactive slots' masked writes
        self.max_len = (max_len or cfg.model_max_length) + 1
        self.sampling = sampling
        self.eos_token_id = (cfg.eos_token_id if eos_token_id is None
                             else eos_token_id)
        self.cache = llama.init_cache(cfg.text, num_slots, self.max_len,
                                      cache_dtype)
        self.rng = jax.random.PRNGKey(0)

        self._rollouts: Dict[int, Rollout] = {}
        self._free_slots = list(range(num_slots))
        # device-mirrored per-slot state (host copies)
        self._positions = np.zeros((num_slots,), np.int32)
        self._tokens = np.zeros((num_slots,), np.int32)
        self._active = np.zeros((num_slots,), bool)
        self._is_first = np.zeros((num_slots,), bool)

        self._prefix_store: Dict[object, StoredPrefix] = {}
        self._prefix_bytes = 0
        self._prefix_budget = prefix_budget_bytes
        self._prefix_lru: List[object] = []

        self._build_jit()

    # ------------------------------------------------------------------
    # jitted device programs
    # ------------------------------------------------------------------

    def _build_jit(self):
        cfg = self.cfg

        @functools.partial(jax.jit, donate_argnums=(1,))
        def prefill_slot(params, cache, slot, ids, image_embeds, start,
                         seq_len):
            """ids [1, bucket]; returns (last logits [V], cache)."""
            small = KVCache(
                jax.lax.dynamic_slice_in_dim(cache.k, slot, 1, axis=1),
                jax.lax.dynamic_slice_in_dim(cache.v, slot, 1, axis=1))
            logits, small = detikzify.prefill(
                params, cfg, ids, image_embeds, start[None], seq_len[None],
                small)
            new_k = jax.lax.dynamic_update_slice_in_dim(
                cache.k, small.k, slot, axis=1)
            new_v = jax.lax.dynamic_update_slice_in_dim(
                cache.v, small.v, slot, axis=1)
            return logits[0], KVCache(new_k, new_v)

        @functools.partial(
            jax.jit, donate_argnums=(1,),
            static_argnames=("sampling", "banned", "suppress"))
        def decode_all(params, cache, tokens, positions, active, is_first,
                       rng, sampling, banned, suppress):
            # inactive slots write their k/v into the trash row
            pos = jnp.where(active, positions, self.max_len - 1)
            logits, cache = detikzify.decode_step(params, cfg, tokens, pos,
                                                  cache)
            rng, sub = jax.random.split(rng)
            next_tokens = sample(logits, sub, params=sampling,
                                 banned_tokens=banned,
                                 suppress_begin_tokens=suppress,
                                 is_first=is_first)
            return next_tokens, cache, rng

        @functools.partial(jax.jit, static_argnames=("bucket",))
        def save_prefix(cache, slot, bucket: int):
            k = jax.lax.dynamic_slice_in_dim(cache.k, slot, 1, axis=1)[:, 0]
            v = jax.lax.dynamic_slice_in_dim(cache.v, slot, 1, axis=1)[:, 0]
            return k[:, :bucket], v[:, :bucket]

        @functools.partial(jax.jit, donate_argnums=(0,))
        def restore_prefix(cache, slot, pk, pv):
            def upd(big, small):
                cur = jax.lax.dynamic_slice_in_dim(big, slot, 1, axis=1)
                cur = jax.lax.dynamic_update_slice(
                    cur, small[:, None].astype(cur.dtype), (0, 0, 0, 0, 0))
                return jax.lax.dynamic_update_slice_in_dim(
                    big, cur, slot, axis=1)
            return KVCache(upd(cache.k, pk), upd(cache.v, pv))

        @jax.jit
        def encode_image(params, pixel_values):
            return detikzify.encode_image(params, cfg, pixel_values)

        @functools.partial(
            jax.jit, static_argnames=("sampling", "banned", "suppress"))
        def sample_only(logits, rng, is_first, sampling, banned, suppress):
            rng, sub = jax.random.split(rng)
            tok = sample(logits[None], sub, params=sampling,
                         banned_tokens=banned,
                         suppress_begin_tokens=suppress,
                         is_first=is_first[None])
            return tok[0], rng

        self._prefill_slot = prefill_slot
        self._decode_all = decode_all
        self._save_prefix = save_prefix
        self._restore_prefix = restore_prefix
        self._encode_image = encode_image
        self._sample_only = sample_only

    # ------------------------------------------------------------------
    # prefix store
    # ------------------------------------------------------------------

    def store_prefix(self, key, rollout: Rollout,
                     length: Optional[int] = None,
                     namespace: object = None) -> Optional[StoredPrefix]:
        """Save rollout's first ``length`` tokens of KV under ``key``."""
        length = rollout.length if length is None else length
        bucket = _bucket(length, self.max_len)
        if key in self._prefix_store:
            return self._prefix_store[key]
        k, v = self._save_prefix(self.cache, jnp.int32(rollout.slot), bucket)
        sp = StoredPrefix(k=k, v=v, length=length,
                          token_ids=tuple(rollout.token_ids[:length]),
                          namespace=namespace)
        self._prefix_bytes += sp.nbytes()
        self._prefix_store[key] = sp
        self._prefix_lru.append(key)
        while self._prefix_bytes > self._prefix_budget and len(self._prefix_lru) > 1:
            old = self._prefix_lru.pop(0)
            dropped = self._prefix_store.pop(old, None)
            if dropped is not None:
                self._prefix_bytes -= dropped.nbytes()
        return sp

    def get_prefix(self, key) -> Optional[StoredPrefix]:
        sp = self._prefix_store.get(key)
        if sp is not None and key in self._prefix_lru:
            self._prefix_lru.remove(key)
            self._prefix_lru.append(key)
        return sp

    def best_prefix(self, token_ids: Sequence[int], namespace: object = None
                    ) -> Optional[Tuple[object, StoredPrefix]]:
        """Longest stored prefix in ``namespace`` matching ``token_ids[:len]``."""
        best = None
        ids = tuple(token_ids)
        for key, sp in self._prefix_store.items():
            if sp.namespace != namespace:
                continue
            if sp.length <= len(ids) and sp.token_ids == ids[:sp.length]:
                if best is None or sp.length > best[1].length:
                    best = (key, sp)
        return best

    def drop_namespace(self, namespace: object) -> None:
        """Evict all prefixes belonging to one generator/image."""
        for key in [k for k, sp in self._prefix_store.items()
                    if sp.namespace == namespace]:
            sp = self._prefix_store.pop(key)
            self._prefix_bytes -= sp.nbytes()
            if key in self._prefix_lru:
                self._prefix_lru.remove(key)

    # ------------------------------------------------------------------
    # rollout lifecycle
    # ------------------------------------------------------------------

    def start(
        self,
        token_ids: Sequence[int],
        image_embeds: Optional[jnp.ndarray] = None,
        *,
        max_new_tokens: int = 1024,
        on_token: Optional[Callable[[int], None]] = None,
        prefix: Optional[StoredPrefix] = None,
    ) -> Rollout:
        """Begin generating after ``token_ids``. Returns a Rollout handle.

        If ``prefix`` is given (a StoredPrefix whose token_ids match the
        head of ``token_ids``), only the tail is prefilled.
        """
        if not self._free_slots:
            raise RuntimeError("no free slots")
        token_ids = list(token_ids)
        slot = self._free_slots.pop()
        ro = Rollout(slot=slot, prompt_len=len(token_ids),
                     token_ids=list(token_ids),
                     max_new_tokens=max_new_tokens, on_token=on_token)

        start_pos = 0
        if prefix is not None:
            assert tuple(token_ids[:prefix.length]) == prefix.token_ids, \
                "prefix mismatch"
            self.cache = self._restore_prefix(
                self.cache, jnp.int32(slot), prefix.k, prefix.v)
            start_pos = prefix.length
            if start_pos >= len(token_ids):
                # prefix covers the whole prompt: re-prefill the final token
                # (overwrites its own KV row) to obtain next-token logits.
                start_pos = len(token_ids) - 1

        tail = token_ids[start_pos:]
        max_new = min(max_new_tokens,
                      self.max_len - 1 - len(token_ids))
        ro.max_new_tokens = max(max_new, 0)

        if tail:
            bucket = _bucket(len(tail), self.max_len)
            ids = np.zeros((1, bucket), np.int32)
            ids[0, :len(tail)] = tail
            if image_embeds is None:
                image_embeds_in = jnp.zeros(
                    (1, self.cfg.image_seq_len, self.cfg.text.hidden_size),
                    self.params.text["embed_tokens"].dtype)
            else:
                image_embeds_in = image_embeds
            logits, self.cache = self._prefill_slot(
                self.params, self.cache, jnp.int32(slot), jnp.asarray(ids),
                image_embeds_in, jnp.int32(start_pos), jnp.int32(len(tail)))
            first_tok, self.rng = self._sample_only(
                logits, self.rng, jnp.asarray(True),
                self.sampling, self._banned(), self._suppress())
            first_tok = int(first_tok)
        else:  # pragma: no cover - start_pos adjustment guarantees a tail
            raise AssertionError("empty prefill tail")

        self._rollouts[slot] = ro
        self._positions[slot] = len(token_ids)
        self._tokens[slot] = first_tok
        self._active[slot] = True
        self._is_first[slot] = False  # eos-suppression consumed at prefill
        self._accept_token(ro, first_tok)
        return ro

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
        if ro.slot in self._rollouts:
            del self._rollouts[ro.slot]
            self._active[ro.slot] = False
            self._free_slots.append(ro.slot)

    @property
    def num_active(self) -> int:
        return int(self._active.sum())

    # ------------------------------------------------------------------
    # stepping
    # ------------------------------------------------------------------

    def step(self) -> List[Rollout]:
        """One decode step for all active slots. Returns finished rollouts."""
        if not self._active.any():
            return []
        next_tokens, self.cache, self.rng = self._decode_all(
            self.params, self.cache,
            jnp.asarray(self._tokens), jnp.asarray(self._positions),
            jnp.asarray(self._active), jnp.asarray(self._is_first),
            self.rng, self.sampling, self._banned(), self._suppress())
        toks = np.asarray(jax.device_get(next_tokens))
        finished = []
        for slot, ro in list(self._rollouts.items()):
            if not self._active[slot]:
                continue
            self._positions[slot] += 1
            self._tokens[slot] = toks[slot]
            self._is_first[slot] = False
            self._accept_token(ro, int(toks[slot]))
            if ro.finished:
                finished.append(ro)
        return finished

    def run(self, max_steps: Optional[int] = None) -> List[Rollout]:
        """Step until every rollout finishes; returns them all."""
        done: List[Rollout] = []
        steps = 0
        while self._active.any():
            done.extend(self.step())
            steps += 1
            if max_steps is not None and steps >= max_steps:
                break
        return done

    # ------------------------------------------------------------------
    # helpers
    # ------------------------------------------------------------------

    def encode_image(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        """[B,H,W,C] -> projected image tokens (vision runs once/image)."""
        return self._encode_image(self.params, pixel_values)
