"""GRPO post-training (RL from SelfSim feedback).

TPU-native re-design of reference ``examples/refine.py`` (which drives trl's
``GRPOTrainer`` with a SelfSim ``RewardFunc``, :151-263): group-relative
policy optimization where each figure prompts ``num_generations`` rollouts
from the decode engine, rewards are SelfSim scores of the compiled renders
(-1 when uncompilable, reference :171-185), advantages are group-normalized,
and the policy updates with a clipped surrogate (+ optional KL-to-reference
penalty).

The sampling side reuses the inference engine (continuous batching + root
prefix reuse), so generation -- the dominant GRPO cost -- runs at inference
speed; only the scoring pass and the update are extra.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import DetikzifyConfig
from ..engine import DecodeEngine
from ..models import detikzify, llama
from ..models.detikzify import Params
from ..infer.tikz import CompileService


@dataclasses.dataclass
class GRPOConfig:
    num_generations: int = 32          # reference refine.py:199
    max_new_tokens: int = 512
    learning_rate: float = 1e-6
    clip_eps: float = 0.2
    beta: float = 0.0                  # KL-to-reference coefficient
    grad_clip: float = 1.0
    strict: bool = False               # treat recoverable errors as fatal


class GRPOState(NamedTuple):
    params: Params
    opt_state: object
    step: jnp.ndarray


def sequence_logprobs(params: Params, cfg: DetikzifyConfig,
                      tokens: jnp.ndarray,          # [B, S]
                      pixel_values: Optional[jnp.ndarray],
                      completion_mask: jnp.ndarray,  # [B, S] True on sampled
                      attn_impl: str = "auto") -> jnp.ndarray:
    """Per-token logprobs of tokens[t] given tokens[<t]; 0 where masked."""
    logits, _ = detikzify.forward(params, cfg, tokens, pixel_values,
                                  attn_impl=attn_impl)
    logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
    target = tokens[:, 1:]
    token_lp = jnp.take_along_axis(logp, target[..., None], axis=-1)[..., 0]
    return jnp.where(completion_mask[:, 1:], token_lp, 0.0)


def make_grpo_step(cfg: DetikzifyConfig, optimizer, gcfg: GRPOConfig,
                   attn_impl: str = "auto"):
    """(state, batch) -> (state, metrics). Batch arrays:
    tokens [B,S], completion_mask [B,S], old_logprobs [B,S-1],
    ref_logprobs [B,S-1] (zeros when beta=0), advantages [B],
    pixel_values [B,H,W,C] or absent."""

    def loss_fn(params, batch):
        lp = sequence_logprobs(params, cfg, batch["tokens"],
                               batch.get("pixel_values"),
                               batch["completion_mask"], attn_impl)
        mask = batch["completion_mask"][:, 1:]
        ratio = jnp.exp(lp - batch["old_logprobs"])
        adv = batch["advantages"][:, None]
        unclipped = ratio * adv
        clipped = jnp.clip(ratio, 1 - gcfg.clip_eps,
                           1 + gcfg.clip_eps) * adv
        pg = -jnp.minimum(unclipped, clipped)
        if gcfg.beta > 0:
            # k3 KL estimator (Schulman): exp(ref-lp) - (ref-lp) - 1
            delta = batch["ref_logprobs"] - lp
            pg = pg + gcfg.beta * (jnp.exp(delta) - delta - 1.0)
        denom = jnp.maximum(jnp.sum(mask), 1.0)
        loss = jnp.sum(jnp.where(mask, pg, 0.0)) / denom
        return loss, {"ratio_mean": jnp.sum(jnp.where(mask, ratio, 0.0))
                      / denom}

    def step(state: GRPOState, batch):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return (GRPOState(params, opt_state, state.step + 1),
                {"loss": loss, **aux})

    return step


class SelfSimReward:
    """Reward = SelfSim(render, input) if compilable else -1
    (reference ``RewardFunc``, refine.py:151-185). Compiles run through the
    async pool and renders score as one batched encoder pass."""

    def __init__(self, metric, compile_service: Optional[CompileService]
                 = None, strict: bool = False, size: int = 420):
        self.metric = metric
        self.compiler = compile_service or CompileService()
        self.strict = strict
        self.size = size

    def __call__(self, images: List, codes: List[str]) -> np.ndarray:
        futures = [self.compiler.submit(code) for code in codes]
        docs = [f.result() for f in futures]
        rewards = np.full((len(codes),), -1.0)
        good = [(i, doc.rasterize(self.size)) for i, doc in enumerate(docs)
                if doc.is_rasterizable
                and not (self.strict and doc.compiled_with_errors)]
        if good:
            idx = [i for i, _ in good]
            renders = [img for _, img in good]
            refs = [images[i] for i in idx]
            rewards[idx] = self.metric.score_batch(renders, refs)
        return rewards


def group_advantages(rewards: np.ndarray, group_size: int) -> np.ndarray:
    """(r - mean_group) / (std_group + eps), per prompt group."""
    grouped = rewards.reshape(-1, group_size)
    mean = grouped.mean(axis=1, keepdims=True)
    std = grouped.std(axis=1, keepdims=True)
    return ((grouped - mean) / (std + 1e-4)).reshape(-1)


def refine(
    params: Params,
    cfg: DetikzifyConfig,
    processor,
    images: List,                       # training figures (PIL)
    reward_fn: Callable,                # (images, codes) -> rewards
    *,
    gcfg: Optional[GRPOConfig] = None,
    engine: Optional[DecodeEngine] = None,
    steps: int = 10,
    prompts_per_step: int = 1,
    seed: int = 0,
    attn_impl: str = "auto",
    log_fn=print,
) -> Params:
    """Run GRPO for ``steps`` optimizer updates; returns refined params."""
    from ..ops.sampling import SamplingParams

    gcfg = gcfg or GRPOConfig()
    g = gcfg.num_generations
    engine = engine or DecodeEngine(
        params, cfg, num_slots=min(g, 16),
        max_len=cfg.image_seq_len + 2 + gcfg.max_new_tokens,
        sampling=SamplingParams())
    optimizer = optax.chain(
        optax.clip_by_global_norm(gcfg.grad_clip),
        optax.adamw(gcfg.learning_rate))
    state = GRPOState(params, optimizer.init(params),
                      jnp.zeros((), jnp.int32))
    step_fn = jax.jit(make_grpo_step(cfg, optimizer, gcfg, attn_impl))
    logprob_fn = jax.jit(
        lambda p, t, pix, m: sequence_logprobs(p, cfg, t, pix, m, attn_impl))

    rng = np.random.default_rng(seed)
    size = cfg.vision.image_size
    from ..processing import preprocess_image

    for it in range(steps):
        image = images[int(rng.integers(len(images)))]
        pixels = jnp.asarray(preprocess_image(image, size))[None]
        image_embeds = engine.encode_image(pixels)
        engine.params = state.params   # sample from the current policy
        # reference refine.py prompts with "" -> image tokens only, no bos
        prompt = [cfg.image_token_id] * cfg.image_seq_len

        # --- rollout phase: g generations via continuous batching ---
        rollouts, pending = [], []
        started = 0
        root_prefix = None
        while started < g or pending:
            n = min(len(engine._free_slots), g - started)
            if n > 0:
                # whole wave in ONE fused start program (start_many)
                ros = engine.start_many(
                    [list(prompt)] * n, image_embeds=image_embeds,
                    max_new_tokens=gcfg.max_new_tokens, prefix=root_prefix)
                pending.extend(ros)
                started += n
            engine.step()
            for ro in list(pending):
                if ro.finished:
                    if root_prefix is None:
                        root_prefix = engine.store_prefix(
                            ("grpo", it), ro, length=len(prompt),
                            namespace=("grpo", it))
                    rollouts.append(list(ro.token_ids))
                    engine.release(ro)
                    pending.remove(ro)

        codes = [processor.decode(ids[len(prompt):],
                                  skip_special_tokens=True)
                 for ids in rollouts]
        rewards = np.asarray(reward_fn([image] * g, codes), np.float64)
        advantages = group_advantages(rewards, g)

        # --- update phase ---
        width = max(len(ids) for ids in rollouts)
        pad = cfg.pad_token_id
        tokens = np.full((g, width), pad, np.int32)
        comp_mask = np.zeros((g, width), bool)
        for i, ids in enumerate(rollouts):
            tokens[i, :len(ids)] = ids
            comp_mask[i, len(prompt):len(ids)] = True
        pixel_batch = jnp.broadcast_to(pixels, (g,) + pixels.shape[1:])
        old_lp = logprob_fn(state.params, jnp.asarray(tokens), pixel_batch,
                            jnp.asarray(comp_mask))
        batch = {
            "tokens": jnp.asarray(tokens),
            "completion_mask": jnp.asarray(comp_mask),
            "pixel_values": pixel_batch,
            "old_logprobs": jax.lax.stop_gradient(old_lp),
            "ref_logprobs": jnp.zeros_like(old_lp),
            "advantages": jnp.asarray(advantages, jnp.float32),
        }
        state, metrics = step_fn(state, batch)
        engine.drop_namespace(("grpo", it))
        log_fn(f"grpo step {it}: reward mean {rewards.mean():.4f} "
               f"(max {rewards.max():.4f}), loss "
               f"{float(metrics['loss']):.5f}")
    return state.params
