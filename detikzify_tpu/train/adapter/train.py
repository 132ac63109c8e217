"""TikZero+ end-to-end fine-tuning: train the LLM with the adapter attached.

Reference ``detikzify/train/adapter/train.py:22-193``: the text decoder
fine-tunes on caption-conditioned TikZ generation while the vision tower,
adapter, and caption-embedding model stay frozen (:117-124). In
``caption_condition`` mode the LLM prompt is ``caption <bos> code`` and the
loss is masked until after the bos separator (:51-61); otherwise only image
and pad tokens are masked.
"""
from __future__ import annotations

from typing import Dict, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ...config import DetikzifyConfig
from ...models import detikzify
from ...models.adapter import make_inputs
from ...models.detikzify import Params
from ...models.embedding import AdapterBundle
from ...processing import preprocess_image
from ...processing_adapter import AdapterProcessor
from ..checkpoint import Checkpointer
from ..data import IGNORE_INDEX
from ..step import make_optimizer

__all__ = ["tokenize_adapter_batch", "make_adapter_train_step",
           "train_adapter_llm"]


def tokenize_adapter_batch(
    processor: AdapterProcessor,
    captions: List[str],
    codes: List[str],
    images: Optional[List] = None,
    *,
    caption_condition: bool = False,
    max_length: Optional[int] = None,
) -> Dict[str, np.ndarray]:
    """Build (input_ids, labels, adapter_*) with reference label masking."""
    base = processor.processor
    tok = base.tokenizer
    bos = tok.bos_token_id
    if caption_condition:
        # prompt = image tokens + caption <bos> code <eos>; bos is the
        # caption/code separator and loss starts after it (reference
        # train/adapter/train.py:36,51-61 -- bos_token.join + after_bos mask)
        joined = []
        for cap, code in zip(captions, codes):
            cap_ids = tok.encode(cap, add_special_tokens=False)
            code_ids = tok.encode(code, add_special_tokens=False)
            joined.append((cap_ids, code_ids))
        width = max(len(c) + len(d) + 2 for c, d in joined)
        if max_length:
            width = min(width, max_length)
        seq = base.image_seq_len
        pad = getattr(tok, "pad_token_id", 0) or 0
        total = seq + width
        ids = np.full((len(joined), total), pad, np.int32)
        labels = np.full_like(ids, IGNORE_INDEX)
        mask = np.zeros_like(ids, bool)
        for i, (cap_ids, code_ids) in enumerate(joined):
            row = ([base.image_token_id] * seq + cap_ids + [bos]
                   + code_ids + [tok.eos_token_id])[:total]
            ids[i, :len(row)] = row
            mask[i, :len(row)] = True
            # loss starts after the separator bos
            sep = seq + len(cap_ids)       # index of separator bos
            start = min(sep + 1, len(row))
            end = len(row)
            labels[i, start:end] = row[start:end]
        out = {"input_ids": ids, "labels": labels, "attention_mask": mask}
    else:
        enc = base(images=images, text=list(codes),
                   add_eos_token=True, truncation=True)
        ids = enc.input_ids
        labels = ids.copy()
        labels[ids == base.image_token_id] = IGNORE_INDEX
        labels[~enc.attention_mask] = IGNORE_INDEX
        out = {"input_ids": ids.astype(np.int32),
               "labels": labels.astype(np.int32),
               "attention_mask": enc.attention_mask}

    cap_out = processor(images=None, text=list(captions))
    out["adapter_input_ids"] = cap_out.adapter_input_ids
    out["adapter_attention_mask"] = cap_out.adapter_attention_mask
    if images is not None:
        out["pixel_values"] = np.stack([
            preprocess_image(img, base.cfg.vision.image_size)
            for img in images])
    return out


class AdapterLLMState(NamedTuple):
    text_params: dict
    opt_state: object
    step: jnp.ndarray


def make_adapter_train_step(cfg: DetikzifyConfig, frozen: Params,
                            bundle: AdapterBundle, optimizer,
                            attn_impl: str = "auto"):
    """Step training ONLY the text tower; vision/connector/adapter/embedding
    are frozen closures (reference :117-124)."""
    acfg = bundle.adapter_cfg

    def loss_fn(text_params, batch):
        params = Params(vision=frozen.vision, connector=frozen.connector,
                        text=text_params)
        ai = make_inputs(bundle.adapter_params, acfg,
                         batch["caption_hidden"], batch["caption_mask"])
        _, loss = detikzify.forward(
            params, cfg, batch["input_ids"],
            batch.get("pixel_values"),
            attention_mask=batch.get("attention_mask"),
            labels=batch["labels"], adapter=ai, attn_impl=attn_impl)
        return loss

    def step(state: AdapterLLMState, batch):
        loss, grads = jax.value_and_grad(loss_fn)(state.text_params, batch)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.text_params)
        text_params = optax.apply_updates(state.text_params, updates)
        return AdapterLLMState(text_params, opt_state, state.step + 1), \
            {"loss": loss}

    return step


def train_adapter_llm(
    output_dir: str,
    params: Params,
    cfg: DetikzifyConfig,
    processor: AdapterProcessor,
    bundle: AdapterBundle,
    dataset: List[dict],                 # [{image?, caption, code}, ...]
    *,
    caption_condition: bool = False,
    batch_size: int = 128,
    micro_batch_size: int = 4,
    learning_rate: float = 5e-5,
    epochs: int = 1,
    seed: int = 0,
    log_fn=print,
) -> Params:
    steps_per_epoch = max(len(dataset) // micro_batch_size, 1)
    total = steps_per_epoch * epochs
    optimizer = make_optimizer(learning_rate, total_steps=total)
    state = AdapterLLMState(params.text, optimizer.init(params.text),
                            jnp.zeros((), jnp.int32))
    step_fn = jax.jit(make_adapter_train_step(cfg, params, bundle,
                                              optimizer, attn_impl="xla"))
    ckpt = Checkpointer(output_dir)
    rng = np.random.default_rng(seed)
    step = 0
    for epoch in range(epochs):
        order = rng.permutation(len(dataset))
        for i in range(0, len(order) - micro_batch_size + 1,
                       micro_batch_size):
            items = [dataset[int(j)] for j in order[i:i + micro_batch_size]]
            batch = tokenize_adapter_batch(
                processor,
                captions=[it["caption"] for it in items],
                codes=[it["code"] for it in items],
                images=[it["image"] for it in items]
                if "image" in items[0] else None,
                caption_condition=caption_condition)
            hidden, mask = bundle.embed_captions(
                [it["caption"] for it in items])
            batch.pop("adapter_input_ids", None)
            batch.pop("adapter_attention_mask", None)
            batch["caption_hidden"] = hidden
            batch["caption_mask"] = mask
            if "pixel_values" not in batch:
                # text-only: the adapter's (frozen) learnable blank image
                from ...models.adapter import dummy_pixels

                batch["pixel_values"] = np.asarray(dummy_pixels(
                    bundle.adapter_params, len(items)))
            state, metrics = step_fn(state, batch)
            step += 1
            if step % 10 == 0:
                log_fn(f"tikzero+ epoch {epoch} step {step} "
                       f"loss {float(metrics['loss']):.4f}")
        ckpt.save(step, state.text_params, {"epoch": epoch})
    # detach adapter before returning base params (reference :188-191)
    return Params(vision=params.vision, connector=params.connector,
                  text=state.text_params)
