"""ClipScore: SigLIP two-tower caption<->render agreement.

Reference ``detikzify/evaluate/clipscore.py:12-69``: score =
sigmoid(cos(img_emb, txt_emb) * logit_scale + logit_bias), averaged.
Runs as one jitted batched pass over both towers.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import VisionConfig
from ..models import siglip
from ..processing import preprocess_image


class ClipScore:
    higher_is_better = True

    def __init__(self, vision_params: dict, text_params: dict,
                 cfg: VisionConfig, tokenizer, *,
                 logit_scale: float, logit_bias: float,
                 text_max_len: int = 64, preprocess: bool = True):
        self.vision_params = vision_params
        self.text_params = text_params
        cfg = getattr(cfg, "vision", cfg)   # accept DetikzifyConfig too
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.logit_scale = float(logit_scale)
        self.logit_bias = float(logit_bias)
        self.text_max_len = text_max_len
        self.preprocess = preprocess
        self._sum, self._n = 0.0, 0

        scale, bias = self.logit_scale, self.logit_bias

        @jax.jit
        def score_fn(vp, tp, pixels, token_ids):
            img = siglip.apply(vp, cfg, pixels)["pooler_output"]
            txt = siglip.apply_text(tp, cfg, token_ids)["pooler_output"]
            img = img / (jnp.linalg.norm(img, axis=-1, keepdims=True) + 1e-8)
            txt = txt / (jnp.linalg.norm(txt, axis=-1, keepdims=True) + 1e-8)
            logits = jnp.sum(img * txt, axis=-1) * jnp.exp(scale) + bias
            return jax.nn.sigmoid(logits)

        self._score_fn = score_fn

    def _tokenize(self, texts) -> np.ndarray:
        ids = np.zeros((len(texts), self.text_max_len), np.int32)
        pad = getattr(self.tokenizer, "pad_token_id", 0) or 0
        ids[:] = pad
        for i, t in enumerate(texts):
            row = self.tokenizer.encode(t, add_special_tokens=False)
            row = row[:self.text_max_len - 1] + [self.tokenizer.eos_token_id]
            # SigLIP pools the LAST position; right-align real tokens
            ids[i, :len(row)] = row
        return ids

    def score_batch(self, images, texts) -> np.ndarray:
        pixels = jnp.asarray(np.stack([
            preprocess_image(img, self.cfg.image_size,
                             do_trim=self.preprocess) for img in images]))
        tokens = jnp.asarray(self._tokenize(list(texts)))
        return np.asarray(jax.device_get(
            self._score_fn(self.vision_params, self.text_params, pixels,
                           tokens)))

    def update(self, images, text) -> None:
        if not isinstance(text, (list, tuple)):
            text = [text]
        if not isinstance(images, (list, tuple)):
            images = [images]
        scores = self.score_batch(images, text)
        self._sum += float(scores.sum())
        self._n += len(scores)

    def compute(self) -> float:
        if self._n == 0:
            raise RuntimeError("no updates")
        return self._sum / self._n

    def reset(self) -> None:
        self._sum, self._n = 0.0, 0
