"""Frozen caption-embedding model for the TikZero adapter.

Reference: the adapter cross-attends caption embeddings from a frozen
``meta-llama/Llama-3.2-1B`` (``model/adapter/__init__.py:10``,
``modeling_adapter.py:398-537``). Here the embedding model is our own JAX
LLaMA tower run WITHOUT the LM head; any ``(params, TextConfig)`` pair
works (tests use a tiny random model; production imports the HF checkpoint
through ``import_hf.import_text``).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import AdapterConfig, TextConfig
from . import llama
from .adapter import make_inputs
from .siglip import AdapterInputs


@dataclasses.dataclass
class AdapterBundle:
    """Everything the text-conditioned path needs, in one handle."""

    adapter_params: dict          # from adapter.init / import_adapter
    adapter_cfg: AdapterConfig
    embed_params: dict            # frozen LLaMA tower (no lm head needed)
    embed_cfg: TextConfig
    tokenizer: object             # caption tokenizer (pad right, max 512)
    max_length: int = 512

    def __post_init__(self):
        cfg = self.embed_cfg

        @jax.jit
        def embed_fn(params, input_ids, attention_mask):
            embeds = llama.embed(params, input_ids)
            return llama.forward(params, cfg, embeds,
                                 attention_mask=attention_mask)

        self._embed_fn = embed_fn

    def tokenize(self, texts) -> tuple:
        if isinstance(texts, str):
            texts = [texts]
        rows = [self.tokenizer.encode(t, add_special_tokens=True)
                [:self.max_length] for t in texts]
        width = max(len(r) for r in rows)
        pad = getattr(self.tokenizer, "pad_token_id", 0) or 0
        ids = np.full((len(rows), width), pad, np.int32)
        mask = np.zeros((len(rows), width), bool)
        for i, r in enumerate(rows):
            ids[i, :len(r)] = r
            mask[i, :len(r)] = True
        return ids, mask

    def embed_captions(self, texts) -> tuple:
        """texts -> (caption_hidden [B,T,De], mask [B,T])."""
        ids, mask = self.tokenize(texts)
        hidden = self._embed_fn(self.embed_params, jnp.asarray(ids),
                                jnp.asarray(mask))
        return hidden, jnp.asarray(mask)

    def adapter_inputs(self, texts) -> AdapterInputs:
        hidden, mask = self.embed_captions(texts)
        return make_inputs(self.adapter_params, self.adapter_cfg, hidden,
                           mask)
