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
                 text_max_len: int = 64, preprocess: bool = True,
                 text_cfg: VisionConfig = None):
        self.vision_params = vision_params
        self.text_params = text_params
        cfg = getattr(cfg, "vision", cfg)   # accept DetikzifyConfig too
        self.cfg = cfg
        tcfg = text_cfg or cfg              # towers may differ in depth
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
            txt = siglip.apply_text(tp, tcfg, token_ids)["pooler_output"]
            img = img / (jnp.linalg.norm(img, axis=-1, keepdims=True) + 1e-8)
            txt = txt / (jnp.linalg.norm(txt, axis=-1, keepdims=True) + 1e-8)
            logits = jnp.sum(img * txt, axis=-1) * jnp.exp(scale) + bias
            return jax.nn.sigmoid(logits)

        self._score_fn = score_fn

    @classmethod
    def from_siglip_checkpoint(cls, path: str, dtype=jnp.float32, **kw):
        """Build the two-tower metric from a local transformers
        ``SiglipModel`` checkpoint directory (the reference instantiates
        google/siglip-so400m-patch14-384 from the hub,
        reference clipscore.py:23-34)."""
        import json
        import os

        import transformers

        from ..models.import_hf import (_Src, import_siglip_text,
                                        import_vision,
                                        load_state_dict_from_safetensors)

        state = load_state_dict_from_safetensors(path)
        with open(os.path.join(path, "config.json")) as f:
            hf = json.load(f)

        def tower_cfg(d):
            return VisionConfig(
                hidden_size=d["hidden_size"],
                intermediate_size=d["intermediate_size"],
                num_hidden_layers=d["num_hidden_layers"],
                num_attention_heads=d["num_attention_heads"],
                image_size=d.get("image_size", 224),
                patch_size=d.get("patch_size", 16),
                hidden_act=d.get("hidden_act", "gelu_pytorch_tanh"),
                layer_norm_eps=d.get("layer_norm_eps", 1e-6))

        vcfg = tower_cfg(hf["vision_config"])
        tcfg = tower_cfg(hf["text_config"])
        src = _Src(state)
        vision = import_vision(src, vcfg, dtype, prefix="vision_model")
        text = import_siglip_text(src, tcfg, dtype, prefix="text_model")
        tokenizer = transformers.AutoTokenizer.from_pretrained(path)
        return cls(vision, text, vcfg, tokenizer,
                   logit_scale=float(
                       np.asarray(state["logit_scale"]).reshape(-1)[0]),
                   logit_bias=float(
                       np.asarray(state["logit_bias"]).reshape(-1)[0]),
                   text_cfg=tcfg, **kw)

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
