"""Token sampling ops (jit-safe, batched over decode slots).

Replaces the HF ``GenerationMixin`` logits-processor chain the reference
drives at ``detikzify/infer/generate.py:218-227``:

  * temperature / top-p / top-k  (defaults 0.8 / 0.95 / 0, reference
    ``infer/generate.py:360-365``)
  * bad-words masking of the ``<image>`` token (``bad_words_ids``)
  * begin-suppress of EOS on the first generated token
    (``begin_suppress_tokens``)

Everything is one fused [B, V] pass: mask -> temperature -> top-k ->
top-p (within a static candidate set) -> Gumbel-max categorical draw.
The candidate-set trick keeps the per-step sort at [B, CAND] instead of
[B, 128256]; with top-p <= 0.95 and T <= 1 the tail beyond the top-1024
logits carries ~0 mass, and CAND is configurable for exactness studies.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

_NEG_INF = jnp.float32(-1e30)

CANDIDATES = 1024  # static top-k prefilter for the top-p sort


class SamplingParams(NamedTuple):
    temperature: float = 0.8
    top_p: float = 0.95
    top_k: int = 0          # 0 = disabled
    candidates: int = CANDIDATES


def sample(
    logits: jnp.ndarray,            # [B, V] fp32
    rng: jax.Array,                 # single key; split internally
    *,
    params: Optional[SamplingParams] = None,
    temperature=None,               # float or [B] array; 0 = greedy
    top_p=None,                     # float or [B] array; >=1 disables
    top_k=None,                     # int or [B] array; 0 disables
    candidates: Optional[int] = None,
    banned_tokens: Tuple[int, ...] = (),
    suppress_begin_tokens: Tuple[int, ...] = (),
    is_first: Optional[jnp.ndarray] = None,   # [B] bool -- first decode step
) -> jnp.ndarray:
    """Sample one token per row.

    temperature/top_p/top_k are TRACED (scalars broadcast, or per-row [B]
    arrays) so one compiled program serves any sampling configuration --
    the reference's per-call ``**gen_kwargs`` overrides
    (``infer/generate.py:399-426``) without recompiles, and different
    rollouts in one continuous batch can sample differently. Greedy rows
    (temperature <= 0) take the plain argmax.
    """
    base = params if params is not None else SamplingParams()
    temperature = base.temperature if temperature is None else temperature
    top_p = base.top_p if top_p is None else top_p
    top_k = base.top_k if top_k is None else top_k
    candidates = base.candidates if candidates is None else candidates
    return _sample_impl(logits, rng, temperature, top_p, top_k, is_first,
                        candidates=candidates, banned_tokens=banned_tokens,
                        suppress_begin_tokens=suppress_begin_tokens)


def _warp(logits, temperature, top_p, top_k, candidates):
    """Shared warping: temperature -> top-k -> top-p within the candidate
    set. ``logits`` [..., V] fp32 (banned tokens already masked);
    temperature/top_p/top_k broadcast against the leading dims.

    Returns (top_logits [..., cand] with filtered entries at -inf,
    top_idx [..., cand], greedy [...] bool)."""
    v = logits.shape[-1]
    greedy = temperature <= 0.0
    scaled = logits / jnp.where(greedy, 1.0, temperature)[..., None]

    cand = min(candidates, v)
    top_logits, top_idx = jax.lax.top_k(scaled, cand)     # [..., cand] sorted

    ranks = jnp.arange(cand)
    k_eff = jnp.where(top_k <= 0, cand, jnp.minimum(top_k, cand))[..., None]
    top_logits = jnp.where(ranks < k_eff, top_logits, _NEG_INF)

    probs = jax.nn.softmax(top_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep the smallest prefix whose mass reaches top_p (rank 0 always
    # survives, so greedy rows are unaffected by the nucleus mask).
    # top_p >= 1 disables the filter; top_p <= 0 keeps ONLY the top token
    # (HF TopPLogitsWarper's min_tokens_to_keep=1), not "disabled".
    p_eff = jnp.where(top_p >= 1.0, 1.0,
                      jnp.maximum(top_p, 1e-9))[..., None]
    keep = (cum - probs) < p_eff
    top_logits = jnp.where(keep, top_logits, _NEG_INF)
    return top_logits, top_idx, greedy


@functools.partial(jax.jit, static_argnames=("candidates", "banned_tokens",
                                             "suppress_begin_tokens"))
def _sample_impl(logits, rng, temperature, top_p, top_k, is_first,
                 candidates, banned_tokens, suppress_begin_tokens):
    b, v = logits.shape
    logits = logits.astype(jnp.float32)

    for tok in banned_tokens:
        logits = logits.at[:, tok].set(_NEG_INF)
    if suppress_begin_tokens and is_first is not None:
        for tok in suppress_begin_tokens:
            logits = logits.at[:, tok].set(
                jnp.where(is_first, _NEG_INF, logits[:, tok]))

    temperature = jnp.broadcast_to(
        jnp.asarray(temperature, jnp.float32), (b,))
    top_p = jnp.broadcast_to(jnp.asarray(top_p, jnp.float32), (b,))
    top_k = jnp.broadcast_to(jnp.asarray(top_k, jnp.int32), (b,))

    top_logits, top_idx, greedy = _warp(logits, temperature, top_p, top_k,
                                        candidates)
    gumbel = jax.random.gumbel(rng, top_logits.shape, jnp.float32)
    noisy = top_logits + jnp.where(greedy[:, None], 0.0, gumbel)
    choice = jnp.argmax(noisy, axis=-1)                      # [B]
    return jnp.take_along_axis(top_idx, choice[:, None], axis=-1)[:, 0] \
        .astype(jnp.int32)


def speculative_accept(
    logits: jnp.ndarray,            # [B, K+1, V] fp32 -- verify logits
    drafts: jnp.ndarray,            # [B, K] int32 -- drafted tokens (<0 =
    rng: jax.Array,                 #   no draft at that position)
    *,
    temperature,                    # [B] (or scalar) traced sampling params
    top_p,
    top_k,
    candidates: int = CANDIDATES,
    banned_tokens: Tuple[int, ...] = (),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Distribution-preserving acceptance for deterministic drafts
    (n-gram prompt-lookup speculative decoding).

    ``logits[:, i]`` is the model's distribution for the token FOLLOWING
    input position i, where the inputs were ``[last_token, d_1 .. d_K]``.
    Draft ``d_{i+1} = drafts[:, i]`` is accepted with probability
    ``p_i(d_{i+1})`` under the WARPED distribution (the same
    temperature/top-k/top-p/candidate-set warp the non-speculative
    sampler uses, so speculative and plain decoding draw from identical
    distributions); at the first rejection one token is drawn from the
    residual ``p_i`` with the draft's mass removed, and when all K drafts
    are accepted a bonus token is drawn from ``p_K``. Greedy rows
    (temperature <= 0) reduce to exact argmax-match acceptance, so
    speculative greedy decoding emits token-identical streams.

    Returns (emitted [B, K+1] int32, counts [B] int32): row b's emitted
    tokens are ``emitted[b, :counts[b]]`` (1 <= counts <= K+1); entries
    beyond ``counts`` are padding."""
    b, k1, v = logits.shape
    k = k1 - 1
    assert drafts.shape == (b, k)
    logits = logits.astype(jnp.float32)
    for tok in banned_tokens:
        logits = logits.at[:, :, tok].set(_NEG_INF)

    temperature = jnp.broadcast_to(
        jnp.asarray(temperature, jnp.float32), (b,))[:, None]
    top_p = jnp.broadcast_to(jnp.asarray(top_p, jnp.float32), (b,))[:, None]
    top_k = jnp.broadcast_to(jnp.asarray(top_k, jnp.int32), (b,))[:, None]

    top_logits, top_idx, greedy = _warp(logits, temperature, top_p, top_k,
                                        candidates)                # [B,K1,C]
    greedy = greedy[:, 0]                                          # [B]
    probs = jax.nn.softmax(top_logits, axis=-1)                    # [B,K1,C]

    # p_i(d_{i+1}) under the warped distribution; 0 when the draft is
    # outside the candidate set / filtered / invalid (<0)
    is_draft = top_idx[:, :k] == drafts[:, :, None]                # [B,K,C]
    p_draft = jnp.sum(jnp.where(is_draft, probs[:, :k], 0.0), -1)  # [B,K]
    # greedy rows: accept iff the draft IS the argmax (warped top choice)
    argmax_tok = top_idx[..., 0]                                   # [B,K1]
    p_draft = jnp.where(greedy[:, None],
                        (drafts == argmax_tok[:, :k]).astype(jnp.float32),
                        p_draft)

    rng_u, rng_f = jax.random.split(rng)
    u = jax.random.uniform(rng_u, (b, k), jnp.float32)
    acc = u < p_draft                                              # [B,K]
    m = jnp.sum(jnp.cumprod(acc.astype(jnp.int32), axis=-1), -1)   # [B] 0..K

    # final token: residual of p_m with the rejected draft removed when
    # m < K, plain p_K (bonus) when every draft was accepted
    final_logits = jnp.take_along_axis(
        top_logits, m[:, None, None], axis=1)[:, 0]                # [B,C]
    final_idx = jnp.take_along_axis(
        top_idx, m[:, None, None], axis=1)[:, 0]                   # [B,C]
    rej = m < k                                                    # [B]
    rej_draft = jnp.take_along_axis(
        drafts, jnp.minimum(m, k - 1)[:, None], axis=1)[:, 0] \
        if k > 0 else jnp.full((b,), -1, jnp.int32)                # [B]
    final_logits = jnp.where(rej[:, None] & (final_idx == rej_draft[:, None]),
                             _NEG_INF, final_logits)
    gumbel = jax.random.gumbel(rng_f, final_logits.shape, jnp.float32)
    noisy = final_logits + jnp.where(greedy[:, None], 0.0, gumbel)
    choice = jnp.argmax(noisy, axis=-1)
    final_tok = jnp.take_along_axis(
        final_idx, choice[:, None], axis=-1)[:, 0].astype(jnp.int32)

    pos = jnp.arange(k1)[None, :]                                  # [1,K1]
    emitted = jnp.where(
        pos < m[:, None],
        jnp.pad(drafts, ((0, 0), (0, 1))),                         # accepted
        jnp.where(pos == m[:, None], final_tok[:, None], 0))
    counts = m + 1
    return emitted.astype(jnp.int32), counts.astype(jnp.int32)


def make_newline_table(tokenizer, vocab_size: int):
    """Precompute per-token newline counts + 'ends clean at a line boundary'.

    TPU-side equivalent of reference ``newlineinfo`` (``infer/generate.py:
    229-244``): for every vocab id, how many '\\n' its decoded text
    contributes and whether the text ends with '\\n' (so a prefix ending
    on this token is a complete line). Used by the engine to segment the
    token stream at line boundaries without host-side re-decoding.

    Returns (counts [V] int32 numpy, ends_nl [V] bool numpy).
    """
    import re

    import numpy as np

    counts = np.zeros((vocab_size,), np.int32)
    ends = np.zeros((vocab_size,), bool)
    # decode each token in context to handle byte-level BPE newlines
    specials = set(getattr(tokenizer, "all_special_ids", []) or [])
    for tok in range(vocab_size):
        if tok in specials:
            continue
        try:
            text = tokenizer.decode([tok])
        except Exception:
            continue
        # normalize \r\n and bare \r like the reference (generate.py:240)
        text = re.sub(r"\r\n|\r", "\n", text)
        n = text.count("\n")
        if n:
            counts[tok] = n
            ends[tok] = text.endswith("\n")
    return counts, ends
