"""BPE-realistic speculative-decoding acceptance measurement.

The byte-level 1.48-tok/step datapoint from round 2 measured a degenerate
tokenizer; this harness measures ``engine.spec_rate`` under conditions that
match real deployments (round-2 VERDICT directive #5):

  * a REAL byte-level BPE tokenizer trained on TikZ text,
  * a model OVERFIT on a few hundred TikZ programs (so generations are
    locally coherent TikZ, like a trained checkpoint's),
  * greedy (T=0) and reference sampling (T=0.8/top-p 0.95) regimes,
  * with and without cross-rollout hints (the MCTS parent-continuation
    draft source).

Everything is deterministic and runs hermetically (CPU or TPU); bench.py
reports the measured rates in its extras.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DetikzifyConfig, TextConfig
from ..dataset.synthetic import generate_corpus


def train_bpe_tokenizer(corpus: Sequence[str], vocab_size: int = 512):
    """Byte-level BPE trained on the corpus (the real models' tokenizer
    family; reference checkpoints ship byte-level BPE vocabularies)."""
    import transformers
    from tokenizers import (Tokenizer, decoders, models, pre_tokenizers,
                            trainers)

    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=vocab_size - 3,
        special_tokens=["<pad>", "<s>", "</s>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet())
    tok.train_from_iterator(corpus, trainer)
    return transformers.PreTrainedTokenizerFast(
        tokenizer_object=tok, bos_token="<s>", eos_token="</s>",
        pad_token="<pad>", model_max_length=4096)


def spec_model_config(vocab_size: int) -> DetikzifyConfig:
    """Small-but-capable decoder for overfitting the corpus."""
    from ..config import VisionConfig

    return DetikzifyConfig(
        vision=VisionConfig(hidden_size=48, intermediate_size=96,
                            num_hidden_layers=2, num_attention_heads=4,
                            image_size=42, patch_size=14),
        text=TextConfig(vocab_size=vocab_size + 1, hidden_size=128,
                        intermediate_size=256, num_hidden_layers=4,
                        num_attention_heads=4, num_key_value_heads=4,
                        max_position_embeddings=1024, rope_theta=10000.0),
        image_token_id=vocab_size,      # unused: text-only overfit
        bos_token_id=1, eos_token_id=2, pad_token_id=0,
        model_max_length=640, dtype="float32")


def overfit(cfg: DetikzifyConfig, token_rows: List[List[int]],
            steps: int = 400, lr: float = 3e-3, batch: int = 8,
            width: int = 128, seed: int = 0, log_fn=None):
    """Overfit a fresh model on packed token rows; returns params."""
    import optax

    from ..models import detikzify

    params = detikzify.init(jax.random.PRNGKey(seed), cfg,
                            dtype=jnp.float32)
    flat: List[int] = []
    for row in token_rows:
        flat.extend([cfg.bos_token_id] + row + [cfg.eos_token_id])
    data = np.asarray(flat, np.int32)
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, ids):
        def loss_fn(p):
            _, loss = detikzify.forward(p, cfg, ids, None, labels=ids,
                                        attn_impl="xla")
            return loss
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(seed)
    n = len(data) - width - 1
    loss = None
    for it in range(steps):
        offs = rng.integers(0, n, (batch,))
        ids = np.stack([data[o:o + width] for o in offs])
        params, opt_state, loss = step(params, opt_state, jnp.asarray(ids))
        if log_fn and it % 100 == 0:
            log_fn(f"overfit step {it}: loss {float(loss):.3f}")
    return params, float(loss)


def measure_spec_rate(params, cfg: DetikzifyConfig,
                      prompts: List[List[int]],
                      conts: Optional[List[List[int]]] = None,
                      *, temperature: float, speculate: int = 4,
                      max_new: int = 48, num_slots: int = 8,
                      use_hints: bool = False) -> float:
    """Run all prompts through a speculative engine; returns measured
    tokens-per-step (1 = no draft accepted, speculate+1 = all)."""
    from ..engine import DecodeEngine
    from ..ops.sampling import SamplingParams

    eng = DecodeEngine(
        params, cfg, num_slots=num_slots, max_len=cfg.model_max_length,
        speculate=speculate, spec_min_rate=0.0, cache_dtype=jnp.float32,
        sampling=SamplingParams(temperature=temperature, top_p=0.95),
        prefix_budget_bytes=1 << 24)
    queue = list(range(len(prompts)))
    active = []
    while queue or active:
        while queue and eng.num_free_slots > 0:
            i = queue.pop()
            hint = (conts[i] if use_hints and conts is not None else None)
            active.append(eng.start(list(prompts[i]), max_new_tokens=max_new,
                                    lazy=True, hint=hint))
        eng.step()
        for ro in list(active):
            if ro.finished:
                eng.release(ro)
                active.remove(ro)
    return eng.spec_rate


def run_measurement(n_programs: int = 300, steps: int = 400,
                    n_eval: int = 24, log_fn=print) -> Dict[str, float]:
    """Full pipeline: corpus -> BPE -> overfit -> acceptance table."""
    corpus = generate_corpus(n_programs, seed=0)
    tok = train_bpe_tokenizer(corpus)
    cfg = spec_model_config(len(tok))
    rows = [tok.encode(c, add_special_tokens=False) for c in corpus]
    params, loss = overfit(cfg, rows, steps=steps, log_fn=log_fn)

    prompts, conts = [], []
    for row in rows[:n_eval]:
        prompts.append([cfg.bos_token_id] + row[:8])
        conts.append(row[8:])
    out = {"overfit_loss": round(loss, 3)}
    for name, t, hints in [("spec_rate_bpe_t0", 0.0, False),
                           ("spec_rate_bpe_t08", 0.8, False),
                           ("spec_rate_bpe_t08_hint", 0.8, True)]:
        rate = measure_spec_rate(params, cfg, prompts, conts,
                                 temperature=t, use_hints=hints)
        out[name] = round(rate, 3)
        if log_fn:
            log_fn(f"{name}: {rate:.2f} tok/step")
    return out
