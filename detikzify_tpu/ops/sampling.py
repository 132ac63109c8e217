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


@functools.partial(jax.jit, static_argnames=("params", "banned_tokens",
                                             "suppress_begin_tokens"))
def sample(
    logits: jnp.ndarray,            # [B, V] fp32
    rng: jax.Array,                 # single key; split internally
    *,
    params: SamplingParams = SamplingParams(),
    banned_tokens: Tuple[int, ...] = (),
    suppress_begin_tokens: Tuple[int, ...] = (),
    is_first: Optional[jnp.ndarray] = None,   # [B] bool -- first decode step
) -> jnp.ndarray:
    """Sample one token per row. Greedy if temperature == 0."""
    b, v = logits.shape
    logits = logits.astype(jnp.float32)

    for tok in banned_tokens:
        logits = logits.at[:, tok].set(_NEG_INF)
    if suppress_begin_tokens and is_first is not None:
        for tok in suppress_begin_tokens:
            logits = logits.at[:, tok].set(
                jnp.where(is_first, _NEG_INF, logits[:, tok]))

    if params.temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    logits = logits / params.temperature

    cand = min(params.candidates, v)
    top_logits, top_idx = jax.lax.top_k(logits, cand)       # [B, cand] sorted

    if params.top_k and params.top_k < cand:
        ranks = jnp.arange(cand)[None, :]
        top_logits = jnp.where(ranks < params.top_k, top_logits, _NEG_INF)

    if 0.0 < params.top_p < 1.0:
        probs = jax.nn.softmax(top_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep the smallest prefix whose mass reaches top_p
        keep = (cum - probs) < params.top_p
        top_logits = jnp.where(keep, top_logits, _NEG_INF)

    gumbel = jax.random.gumbel(rng, top_logits.shape, jnp.float32)
    choice = jnp.argmax(top_logits + gumbel, axis=-1)        # [B]
    return jnp.take_along_axis(top_idx, choice[:, None], axis=-1)[:, 0] \
        .astype(jnp.int32)


def make_newline_table(tokenizer, vocab_size: int):
    """Precompute per-token newline counts + 'ends clean at a line boundary'.

    TPU-side equivalent of reference ``newlineinfo`` (``infer/generate.py:
    229-244``): for every vocab id, how many '\\n' its decoded text
    contributes and whether the text ends with '\\n' (so a prefix ending
    on this token is a complete line). Used by the engine to segment the
    token stream at line boundaries without host-side re-decoding.

    Returns (counts [V] int32 numpy, ends_nl [V] bool numpy).
    """
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
        n = text.count("\n")
        if n:
            counts[tok] = n
            ends[tok] = text.endswith("\n")
    return counts, ends
