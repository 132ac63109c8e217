"""TikZero cross-attention adapter parameters.

Reference: ``detikzify/model/adapter/modeling_adapter.py:355-394``. The
adapter consists of (a) one gated cross-attention block per vision layer
(active every ``cross_attn_every_n_layers``; inactive slots hold zeros and
are skipped via a static mask in ``siglip.apply``), (b) a ``connector``
projecting frozen caption-embedding states (e.g. Llama-3.2-1B hidden size)
into the vision width, and (c) a learnable ``dummy_input`` image used when
generating from text alone.

The reference wires these via torch forward pre-hooks; here they are explicit
function arguments (``siglip.AdapterInputs``) -- jit-safe and shardable.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import AdapterConfig, VisionConfig
from .layers import dense_init, linear, ln_init
from .siglip import AdapterInputs


def init(rng: jax.Array, vcfg: VisionConfig, acfg: AdapterConfig,
         dtype=jnp.float32) -> dict:
    d, i = vcfg.hidden_size, vcfg.intermediate_size
    hd = d // acfg.num_attention_heads
    L = vcfg.num_hidden_layers
    k_top, k_layers = jax.random.split(rng)

    def block(k):
        ks = iter(jax.random.split(k, 8))
        return {
            "ln1": ln_init(d, dtype),
            "attn": {
                "q": dense_init(next(ks), d, d, dtype=dtype),
                "k": dense_init(next(ks), d, d, dtype=dtype),
                "v": dense_init(next(ks), d, d, dtype=dtype),
                "o": dense_init(next(ks), d, d, dtype=dtype),
                "q_norm": ln_init(hd, dtype),
                "k_norm": ln_init(hd, dtype),
            },
            "ln2": ln_init(d, dtype),
            "mlp": {
                "fc1": dense_init(next(ks), d, i, dtype=dtype),
                "fc2": dense_init(next(ks), i, d, dtype=dtype),
            },
            # sigmoid gates, zero-init (reference modeling_adapter.py:320-321)
            "attn_gate": jnp.zeros((1,), dtype),
            "mlp_gate": jnp.zeros((1,), dtype),
        }

    layers = jax.tree.map(lambda *xs: jnp.stack(xs),
                          *[block(k) for k in jax.random.split(k_layers, L)])
    kc, kd = jax.random.split(k_top)
    return {
        "layers": layers,
        "connector": dense_init(kc, acfg.embedding_hidden_size, d,
                                dtype=dtype),
        "dummy_input": jnp.ones(
            (vcfg.image_size, vcfg.image_size, vcfg.num_channels), dtype),
    }


def make_inputs(adapter_params: dict, acfg: AdapterConfig,
                caption_embeds: jnp.ndarray,      # [B, T, De]
                caption_mask: jnp.ndarray) -> AdapterInputs:
    """Project caption embeddings into vision width and bundle for siglip."""
    cross = linear(adapter_params["connector"], caption_embeds)
    return AdapterInputs(params=adapter_params["layers"], config=acfg,
                         cross_states=cross, cross_mask=caption_mask)


def dummy_pixels(adapter_params: dict, batch: int) -> jnp.ndarray:
    """Learnable blank image, clamped like the reference (:500-501)."""
    img = jnp.clip(adapter_params["dummy_input"], -1.0, 1.0)
    return jnp.broadcast_to(img[None], (batch,) + img.shape)
