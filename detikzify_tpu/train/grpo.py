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
import functools
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
    freeze_encoder: bool = True        # reference refine.py:198-207
    speculate: int = 0                 # n-gram speculative rollout decoding
                                       # (auto bail-out if drafts don't pay)
    updates_per_batch: int = 1         # PPO-style epochs per rollout batch;
                                       # > 1 pins old_logprobs to the
                                       # rollout policy so later epochs use
                                       # the true clipped-ratio objective


class GRPOState(NamedTuple):
    params: Params
    opt_state: object
    step: jnp.ndarray


def sequence_logprobs(params: Params, cfg: DetikzifyConfig,
                      tokens: jnp.ndarray,          # [B, S]
                      pixel_values: Optional[jnp.ndarray],
                      completion_mask: jnp.ndarray,  # [B, S] True on sampled
                      attn_impl: str = "auto",
                      image_embeds: Optional[jnp.ndarray] = None
                      ) -> jnp.ndarray:
    """Per-token logprobs of tokens[t] given tokens[<t]; 0 where masked."""
    logits, _ = detikzify.forward(params, cfg, tokens, pixel_values,
                                  image_embeds=image_embeds,
                                  attn_impl=attn_impl)
    logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
    target = tokens[:, 1:]
    token_lp = jnp.take_along_axis(logp, target[..., None], axis=-1)[..., 0]
    return jnp.where(completion_mask[:, 1:], token_lp, 0.0)


def make_grpo_step(cfg: DetikzifyConfig, optimizer, gcfg: GRPOConfig,
                   attn_impl: str = "auto"):
    """(state, batch) -> (state, metrics). Batch arrays:
    tokens [B,S], completion_mask [B,S], advantages [B], and one of
    pixel_values [B,H,W,C] (full vision grads) or vision_feats
    [B,N*cf,Dv] (frozen TOWER: features precomputed outside the grad
    graph, but the connector projection applied INSIDE it -- reference
    refine.py:204-205 freezes only ``vision_model``; the connector
    trains); optional old_logprobs [B,S-1] (absent = rollouts came from
    the CURRENT policy, the single-update-per-batch case: ratio is then
    exp(lp - stop_gradient(lp)), saving a whole forward pass) and
    ref_logprobs [B,S-1] (required when beta > 0)."""

    def loss_fn(params, batch):
        image_embeds = None
        if "vision_feats" in batch:
            image_embeds = detikzify.connector(
                params, batch["vision_feats"], cfg.concat_factor)
        lp = sequence_logprobs(params, cfg, batch["tokens"],
                               batch.get("pixel_values"),
                               batch["completion_mask"], attn_impl,
                               image_embeds=image_embeds)
        mask = batch["completion_mask"][:, 1:]
        old_lp = batch.get("old_logprobs")
        if old_lp is None:
            old_lp = jax.lax.stop_gradient(lp)
        ratio = jnp.exp(lp - old_lp)
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
        # ratio_mean is identically 1 in the implied-old_logprobs path;
        # logp_mean tracks the policy's own confidence either way
        return loss, {"ratio_mean": jnp.sum(jnp.where(mask, ratio, 0.0))
                      / denom,
                      "logp_mean": jnp.sum(jnp.where(mask, lp, 0.0))
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
        speculate=gcfg.speculate,
        sampling=SamplingParams())
    base = optax.chain(
        optax.clip_by_global_norm(gcfg.grad_clip),
        optax.adamw(gcfg.learning_rate))
    if gcfg.freeze_encoder:
        # reference refine.py:198-207: the vision tower does not train
        mask = jax.tree.map(lambda _: "train", params)._replace(
            vision=jax.tree.map(lambda _: "freeze", params.vision))
        optimizer = optax.multi_transform(
            {"train": base, "freeze": optax.set_to_zero()}, mask)
    else:
        optimizer = base
    state = GRPOState(params, optimizer.init(params),
                      jnp.zeros((), jnp.int32))
    ref_params = params if gcfg.beta > 0 else None   # KL anchor: t=0 policy
    step_fn = jax.jit(make_grpo_step(cfg, optimizer, gcfg, attn_impl))
    logprob_fn = jax.jit(functools.partial(
        sequence_logprobs, cfg=cfg, pixel_values=None, attn_impl=attn_impl))

    rng = np.random.default_rng(seed)
    size = cfg.vision.image_size
    # rollouts pad to ONE static width: a data-dependent width would
    # retrace the jitted update nearly every step (30-100 s compiles)
    prompt = [cfg.image_token_id] * cfg.image_seq_len
    width = min(len(prompt) + gcfg.max_new_tokens, engine.max_len - 1)
    pad = cfg.pad_token_id
    from ..processing import preprocess_image

    feats_fn = jax.jit(lambda p, px: detikzify.vision_features(p, cfg, px))
    proj_fn = jax.jit(lambda p, f: detikzify.connector(
        p, f, cfg.concat_factor))

    for it in range(steps):
        engine.params = state.params   # sample from the CURRENT policy
        batch_imgs = [images[int(rng.integers(len(images)))]
                      for _ in range(prompts_per_step)]
        all_rollouts: List[List[int]] = []
        feats_rows, pixels_rows = [], []
        for p_idx, image in enumerate(batch_imgs):
            pixels = jnp.asarray(preprocess_image(image, size))[None]
            pixels_rows.append(pixels)
            # frozen tower: one vision pass per image serves sampling AND
            # the update; the CONNECTOR projection stays inside the grad
            # graph (reference refine.py:204-205 freezes vision_model
            # only), so rollouts project the features with current params
            feats = feats_fn(state.params, pixels)
            feats_rows.append(feats)
            image_embeds = proj_fn(state.params, feats)

            # --- rollout phase: g generations via continuous batching ---
            rollouts, pending = [], []
            started = 0
            root_prefix = None
            ns = ("grpo", it, p_idx)
            while started < g or pending:
                n = min(engine.num_free_slots, g - started)
                if n > 0:
                    # whole wave in ONE fused start program (start_many)
                    ros = engine.start_many(
                        [list(prompt)] * n, image_embeds=image_embeds,
                        max_new_tokens=gcfg.max_new_tokens,
                        prefix=root_prefix)
                    pending.extend(ros)
                    started += n
                engine.step()
                for ro in list(pending):
                    if ro.finished:
                        if root_prefix is None:
                            root_prefix = engine.store_prefix(
                                ns, ro, length=len(prompt), namespace=ns)
                        rollouts.append(list(ro.token_ids))
                        engine.release(ro)
                        pending.remove(ro)
            engine.drop_namespace(ns)
            all_rollouts.extend(rollouts)

        b = prompts_per_step * g
        codes = [processor.decode(ids[len(prompt):],
                                  skip_special_tokens=True)
                 for ids in all_rollouts]
        imgs_flat = [img for img in batch_imgs for _ in range(g)]
        rewards = np.asarray(reward_fn(imgs_flat, codes), np.float64)
        advantages = group_advantages(rewards, g)

        # --- update phase (one static [B, width] shape for all steps) ---
        tokens = np.full((b, width), pad, np.int32)
        comp_mask = np.zeros((b, width), bool)
        for i, ids in enumerate(all_rollouts):
            tokens[i, :len(ids)] = ids
            comp_mask[i, len(prompt):len(ids)] = True
        batch = {
            "tokens": jnp.asarray(tokens),
            "completion_mask": jnp.asarray(comp_mask),
            "advantages": jnp.asarray(advantages, jnp.float32),
        }
        if gcfg.freeze_encoder:
            # rollouts came from the current policy, so old_logprobs is
            # implied (stop_gradient inside the step)
            batch["vision_feats"] = jnp.concatenate(
                [jnp.broadcast_to(f, (g,) + f.shape[1:])
                 for f in feats_rows])
        else:
            batch["pixel_values"] = jnp.concatenate(
                [jnp.broadcast_to(px, (g,) + px.shape[1:])
                 for px in pixels_rows])   # grads flow through vision
        if ref_params is not None:
            # KL anchor = the t=0 policy (TRL ref model); its connector
            # projects the SAME frozen features in the frozen case
            ref_embeds = (proj_fn(ref_params, batch["vision_feats"])
                          if gcfg.freeze_encoder else None)
            batch["ref_logprobs"] = jax.lax.stop_gradient(logprob_fn(
                ref_params, tokens=batch["tokens"],
                completion_mask=batch["completion_mask"],
                image_embeds=ref_embeds,
                pixel_values=batch.get("pixel_values")))
        if gcfg.updates_per_batch > 1:
            # pin the rollout policy's logprobs so epochs 2..K optimize
            # the true clipped ratio against it (PPO-style reuse)
            old_embeds = (proj_fn(state.params, batch["vision_feats"])
                          if gcfg.freeze_encoder else None)
            batch["old_logprobs"] = jax.lax.stop_gradient(logprob_fn(
                state.params, tokens=batch["tokens"],
                completion_mask=batch["completion_mask"],
                image_embeds=old_embeds,
                pixel_values=batch.get("pixel_values")))
        for _ in range(max(1, gcfg.updates_per_batch)):
            state, metrics = step_fn(state, batch)
        log_fn(f"grpo step {it}: reward mean {rewards.mean():.4f} "
               f"(max {rewards.max():.4f}), loss "
               f"{float(metrics['loss']):.5f}, ratio "
               f"{float(metrics['ratio_mean']):.5f}")
    return state.params
