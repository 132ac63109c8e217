"""TikZero adapter pretraining: cross-modal knowledge distillation.

Reference ``detikzify/train/adapter/pretrain.py:34-337``: the *teacher* is
the frozen vision encoder seeing the real figure; the *student* is the same
encoder seeing a degraded/blank/edited image while cross-attending the
caption through the adapter. Only the adapter trains. Loss terms (reference
``AdapterTrainer.compute_loss``, :109-149): pooled output, mean-patch,
per-patch (elementwise) and per-layer (depth-weighted) embedding
similarity; ``EmbeddingSimilarityLoss`` (:34-64) supports cosine or L2,
elementwise or relational (Gram-matrix) form.

Data partition (reference ``AdapterDataset``, :193-253): each example is
degraded by one of {sketchify, full-erase, cutout/mixup/cutmix}.
Hyperparameters: bs 512 (grad accum), lr 1e-4, 3 epochs (:264-268).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ...config import AdapterConfig, DetikzifyConfig, VisionConfig
from ...data.augment import (EditCutMix, EditCutOut, EditMixUp, FullErase,
                             SketchAugment)
from ...models import siglip
from ...models.adapter import make_inputs
from ...models.embedding import AdapterBundle
from ...processing import preprocess_image
from ..checkpoint import Checkpointer
from ..step import make_optimizer


def embedding_similarity_loss(student: jnp.ndarray, teacher: jnp.ndarray,
                              kind: str = "cosine",
                              relational: bool = False) -> jnp.ndarray:
    """Reference ``EmbeddingSimilarityLoss`` (pretrain.py:34-64)."""
    if relational:
        # Gram-style: match pairwise patch relations instead of embeddings
        def gram(x):
            xn = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-8)
            return jnp.einsum("...nd,...md->...nm", xn, xn)

        student, teacher = gram(student), gram(teacher)
    teacher = jax.lax.stop_gradient(teacher)
    if kind == "cosine":
        sim = (jnp.sum(student * teacher, axis=-1)
               / (jnp.linalg.norm(student, axis=-1)
                  * jnp.linalg.norm(teacher, axis=-1) + 1e-8))
        return jnp.mean(1.0 - sim)
    if kind == "l2":
        return jnp.mean(jnp.square(student - teacher))
    raise ValueError(kind)


@dataclasses.dataclass
class DistillLossConfig:
    kind: str = "cosine"
    relational: bool = False
    w_pool: float = 1.0
    w_avg: float = 1.0
    w_patch: float = 1.0
    w_layer: float = 1.0


class DistillState(NamedTuple):
    adapter_params: dict
    opt_state: object
    step: jnp.ndarray


def make_distill_step(cfg: DetikzifyConfig, vision_params: dict,
                      optimizer, loss_cfg: DistillLossConfig,
                      acfg: Optional[AdapterConfig] = None):
    """(state, batch) -> (state, metrics). batch arrays:
    teacher_pixels [B,H,W,C], student_pixels [B,H,W,C],
    caption_hidden [B,T,De], caption_mask [B,T]."""
    vcfg = cfg.vision
    acfg = acfg or cfg.adapter
    assert acfg is not None

    def loss_fn(adapter_params, batch):
        teacher = siglip.apply(vision_params, vcfg, batch["teacher_pixels"],
                               output_hidden_states=True)
        ai = make_inputs(adapter_params, acfg, batch["caption_hidden"],
                         batch["caption_mask"])
        student = siglip.apply(vision_params, vcfg, batch["student_pixels"],
                               adapter=ai, output_hidden_states=True)

        terms: Dict[str, jnp.ndarray] = {}
        terms["pool"] = embedding_similarity_loss(
            student["pooler_output"], teacher["pooler_output"],
            loss_cfg.kind, loss_cfg.relational)
        terms["avg"] = embedding_similarity_loss(
            student["last_hidden_state"].mean(1),
            teacher["last_hidden_state"].mean(1),
            loss_cfg.kind, loss_cfg.relational)
        terms["patch"] = embedding_similarity_loss(
            student["last_hidden_state"], teacher["last_hidden_state"],
            loss_cfg.kind, loss_cfg.relational)
        # depth-weighted per-layer distillation (later layers weigh more)
        sh, th = student["hidden_states"], teacher["hidden_states"]
        n_layers = sh.shape[0]
        weights = jnp.arange(1, n_layers + 1, dtype=jnp.float32)
        weights = weights / weights.sum()
        per_layer = jax.vmap(
            lambda s, t: embedding_similarity_loss(
                s, t, loss_cfg.kind, loss_cfg.relational))(sh, th)
        terms["layer"] = jnp.sum(per_layer * weights)

        loss = (loss_cfg.w_pool * terms["pool"]
                + loss_cfg.w_avg * terms["avg"]
                + loss_cfg.w_patch * terms["patch"]
                + loss_cfg.w_layer * terms["layer"])
        return loss, (terms, per_layer)

    def step(state: DistillState, batch):
        (loss, (terms, per_layer)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.adapter_params, batch)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.adapter_params)
        params = optax.apply_updates(state.adapter_params, updates)
        metrics = {"loss": loss, "per_layer": per_layer, **terms}
        return DistillState(params, opt_state, state.step + 1), metrics

    return step


class AdapterDataset:
    """Multimodal degradation partition (reference :193-253): sketchify /
    full-erase / {cutout, mixup, cutmix} chosen per example."""

    def __init__(self, items: List[dict], seed: int = 0):
        self.items = items
        self.rng = np.random.default_rng(seed)
        self.sketch = SketchAugment(seed=seed)
        self.erase = FullErase()
        self.edits = [EditCutOut(seed=seed), EditMixUp(seed=seed),
                      EditCutMix(seed=seed)]

    def __len__(self):
        return len(self.items)

    def __getitem__(self, idx: int) -> dict:
        item = dict(self.items[idx])
        mode = self.rng.integers(3)
        img = item["image"]
        if mode == 0:
            student = self.sketch(img)
        elif mode == 1:
            student = self.erase(img)
        else:
            edit = self.edits[int(self.rng.integers(3))]
            other = self.items[int(self.rng.integers(len(self.items)))]
            student = edit(img) if isinstance(edit, EditCutOut) \
                else edit(img, other["image"])
        item["student_image"] = student
        return item


def pretrain_adapter(
    output_dir: str,
    bundle: AdapterBundle,
    cfg: DetikzifyConfig,
    vision_params: dict,
    dataset: List[dict],                 # [{image, text(caption)}, ...]
    *,
    batch_size: int = 512,
    micro_batch_size: int = 8,
    learning_rate: float = 1e-4,
    epochs: int = 3,
    loss_cfg: Optional[DistillLossConfig] = None,
    seed: int = 0,
    log_fn=print,
):
    """Train the adapter by distillation; returns trained adapter params."""
    loss_cfg = loss_cfg or DistillLossConfig()
    data = AdapterDataset(dataset, seed=seed)
    accum = max(batch_size // micro_batch_size, 1)
    steps_per_epoch = max(len(data) // batch_size, 1)
    total_steps = steps_per_epoch * epochs

    optimizer = make_optimizer(learning_rate, total_steps=total_steps)
    state = DistillState(bundle.adapter_params,
                         optimizer.init(bundle.adapter_params),
                         jnp.zeros((), jnp.int32))
    step_fn = jax.jit(make_distill_step(cfg, vision_params, optimizer,
                                        loss_cfg))
    ckpt = Checkpointer(output_dir)

    size = cfg.vision.image_size
    rng = np.random.default_rng(seed)
    step = 0
    for epoch in range(epochs):
        order = rng.permutation(len(data))
        for i in range(0, len(order) - micro_batch_size + 1,
                       micro_batch_size):
            items = [data[int(j)] for j in order[i:i + micro_batch_size]]
            hidden, mask = bundle.embed_captions(
                [it["text"] for it in items])
            batch = {
                "teacher_pixels": jnp.asarray(np.stack(
                    [preprocess_image(it["image"], size) for it in items])),
                "student_pixels": jnp.asarray(np.stack(
                    [preprocess_image(it["student_image"], size)
                     for it in items])),
                "caption_hidden": hidden,
                "caption_mask": mask,
            }
            state, metrics = step_fn(state, batch)
            step += 1
            if step % 10 == 0:
                log_fn(f"adapter-pretrain epoch {epoch} step {step} "
                       f"loss {float(metrics['loss']):.4f}")
        ckpt.save(step, state.adapter_params, {"epoch": epoch})
    bundle.adapter_params = state.adapter_params
    return state.adapter_params
