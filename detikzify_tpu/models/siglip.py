"""SigLIP-style ViT vision encoder, TPU-native.

Functional re-design of the reference's vision tower (``SiglipVisionModel``
used at ``detikzify/model/modeling_detikzify.py:125-127``): scanned layers
(one ``lax.scan`` over a stacked layer pytree — fast compiles, natural FSDP
sharding on the layer axis) and *explicit* TikZero adapter wiring instead of
the reference's forward pre-hooks (``model/adapter/modeling_adapter.py:
473-526``), which are the least portable construct in the reference.

Layout: images are NHWC (TPU-friendly); patch embedding is a conv expressed
as an unfold + matmul so it lands on the MXU as one large GEMM.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import AdapterConfig, VisionConfig
from ..ops.attention import attend
from .layers import (ACTIVATIONS, apply_remat, dense_init, layer_norm,
                     linear, ln_init)


class AdapterInputs(NamedTuple):
    """Caption-conditioning inputs for the TikZero cross-attention adapter."""

    params: dict                 # stacked adapter params (see adapter.py)
    config: AdapterConfig
    cross_states: jnp.ndarray    # [B, T, D_vision] -- caption embeds, connected
    cross_mask: jnp.ndarray      # [B, T] bool


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def init(rng: jax.Array, cfg: VisionConfig, dtype=jnp.float32) -> dict:
    keys = iter(jax.random.split(rng, 16))
    d, i = cfg.hidden_size, cfg.intermediate_size
    L = cfg.num_hidden_layers
    patch_dim = cfg.patch_size * cfg.patch_size * cfg.num_channels

    def stack(fn):
        return jax.tree.map(lambda *xs: jnp.stack(xs),
                            *[fn(k) for k in jax.random.split(next(keys), L)])

    def layer(k):
        ks = iter(jax.random.split(k, 8))
        return {
            "ln1": ln_init(d, dtype),
            "attn": {
                "q": dense_init(next(ks), d, d, dtype=dtype),
                "k": dense_init(next(ks), d, d, dtype=dtype),
                "v": dense_init(next(ks), d, d, dtype=dtype),
                "o": dense_init(next(ks), d, d, dtype=dtype),
            },
            "ln2": ln_init(d, dtype),
            "mlp": {
                "fc1": dense_init(next(ks), d, i, dtype=dtype),
                "fc2": dense_init(next(ks), i, d, dtype=dtype),
            },
        }

    return {
        "embeddings": {
            "patch": dense_init(next(keys), patch_dim, d, dtype=dtype),
            "position": jax.random.normal(next(keys), (cfg.num_patches, d),
                                          dtype) * 0.02,
        },
        "layers": stack(layer),
        "post_ln": ln_init(d, dtype),
        "head": {
            "probe": jax.random.normal(next(keys), (1, 1, d), dtype) * 0.02,
            "attn": {
                "q": dense_init(next(keys), d, d, dtype=dtype),
                "k": dense_init(next(keys), d, d, dtype=dtype),
                "v": dense_init(next(keys), d, d, dtype=dtype),
                "o": dense_init(next(keys), d, d, dtype=dtype),
            },
            "ln": ln_init(d, dtype),
            "mlp": {
                "fc1": dense_init(next(keys), d, i, dtype=dtype),
                "fc2": dense_init(next(keys), i, d, dtype=dtype),
            },
        },
    }


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------

def patchify(pixel_values: jnp.ndarray, patch: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B, (H/p)*(W/p), p*p*C] with conv-compatible ordering.

    Matches torch ``Conv2d(C, D, p, stride=p)`` + flatten: the kernel dim
    order per patch is (C, ph, pw), so importers can reshape torch conv
    weights ``[D, C, ph, pw] -> [C*ph*pw, D]`` directly.
    """
    b, h, w, c = pixel_values.shape
    gh, gw = h // patch, w // patch
    x = pixel_values.reshape(b, gh, patch, gw, patch, c)
    x = jnp.transpose(x, (0, 1, 3, 5, 2, 4))  # [B, gh, gw, C, ph, pw]
    return x.reshape(b, gh * gw, c * patch * patch)


def _mha(p, x_q, x_kv, num_heads: int, *, kv_mask=None, impl="auto"):
    b, s, d = x_q.shape
    hd = d // num_heads
    q = linear(p["q"], x_q).reshape(b, s, num_heads, hd)
    k = linear(p["k"], x_kv).reshape(b, x_kv.shape[1], num_heads, hd)
    v = linear(p["v"], x_kv).reshape(b, x_kv.shape[1], num_heads, hd)
    out = attend(q, k, v, kv_mask=kv_mask, implementation=impl)
    return linear(p["o"], out.reshape(b, s, d))


def _cross_attn_layer(ap, x, adapter: AdapterInputs, eps: float, impl: str):
    """One gated cross-attention block (reference ``CrossAttentionLayer``,
    ``modeling_adapter.py:309-352``): per-head q/k layernorm, sigmoid gates."""
    acfg = adapter.config
    nh = acfg.num_attention_heads
    b, s, d = x.shape
    hd = d // nh

    residual = x
    h = layer_norm(ap["ln1"], x, eps)
    q = linear(ap["attn"]["q"], h).reshape(b, s, nh, hd)
    k = linear(ap["attn"]["k"], adapter.cross_states)
    k = k.reshape(b, -1, nh, hd)
    v = linear(ap["attn"]["v"], adapter.cross_states).reshape(b, -1, nh, hd)
    q = layer_norm(ap["attn"]["q_norm"], q, eps)
    k = layer_norm(ap["attn"]["k_norm"], k, eps)
    out = attend(q, k, v, kv_mask=adapter.cross_mask, implementation=impl)
    out = linear(ap["attn"]["o"], out.reshape(b, s, d))
    x = residual + jax.nn.sigmoid(ap["attn_gate"]) * out

    residual = x
    h = layer_norm(ap["ln2"], x, eps)
    h = linear(ap["mlp"]["fc2"], ACTIVATIONS["gelu_pytorch_tanh"](
        linear(ap["mlp"]["fc1"], h)))
    return residual + jax.nn.sigmoid(ap["mlp_gate"]) * h


def apply(
    params: dict,
    cfg: VisionConfig,
    pixel_values: jnp.ndarray,            # [B, H, W, C], SigLIP-normalized
    *,
    adapter: Optional[AdapterInputs] = None,
    attn_impl: str = "auto",
    output_hidden_states: bool = False,
    remat: bool = False,
) -> dict:
    """Returns {'last_hidden_state': [B,N,D], 'pooler_output': [B,D]} plus
    'hidden_states' [L,B,N,D] (post-block, pre-final-LN) when requested --
    used by the TikZero adapter's per-layer distillation loss."""
    act = ACTIVATIONS[cfg.hidden_act]
    eps = cfg.layer_norm_eps
    nh = cfg.num_attention_heads

    x = linear(params["embeddings"]["patch"],
               patchify(pixel_values, cfg.patch_size))
    x = x + params["embeddings"]["position"]

    def block(x, scanned):
        lp, layer_idx = scanned
        if adapter is not None:
            # adapter runs as a *pre-layer* block, matching the reference's
            # forward pre-hook placement (modeling_adapter.py:473-526);
            # `active` gates layers per cross_attn_every_n_layers. lax.cond
            # (not jnp.where) so inactive layers SKIP the cross-attention
            # compute entirely -- with every_n > 1 the wasted FLOPs would
            # dominate adapter-mode scoring.
            ap, active = lp["adapter"], lp["adapter_active"]
            x = jax.lax.cond(
                active,
                lambda x, ap=ap: _cross_attn_layer(ap, x, adapter, eps,
                                                   attn_impl),
                lambda x: x, x)
        residual = x
        h = layer_norm(lp["ln1"], x, eps)
        h = _mha(lp["attn"], h, h, nh, impl=attn_impl)
        x = residual + h
        residual = x
        h = layer_norm(lp["ln2"], x, eps)
        h = linear(lp["mlp"]["fc2"], act(linear(lp["mlp"]["fc1"], h)))
        out = residual + h
        return out, (out if output_hidden_states else None)

    layers = dict(params["layers"])
    if adapter is not None:
        nlayers = cfg.num_hidden_layers
        every = adapter.config.cross_attn_every_n_layers
        layers["adapter"] = adapter.params
        layers["adapter_active"] = jnp.array(
            [(idx + 1) % every == 0 for idx in range(nlayers)])
    layer_ids = jnp.arange(cfg.num_hidden_layers)
    block = apply_remat(block, remat)
    x, hidden_states = jax.lax.scan(block, x, (layers, layer_ids))

    x = layer_norm(params["post_ln"], x, eps)

    # attention-pooling head (SigLIP MAP head); checkpoints without one
    # (e.g. timm towers exported headless) fall back to mean pooling
    hp = params.get("head") or {}
    if hp:
        probe = jnp.broadcast_to(hp["probe"],
                                 (x.shape[0],) + hp["probe"].shape[1:])
        pooled = _mha(hp["attn"], probe.astype(x.dtype), x, nh,
                      impl=attn_impl)
        h = layer_norm(hp["ln"], pooled, eps)
        h = linear(hp["mlp"]["fc2"], act(linear(hp["mlp"]["fc1"], h)))
        pooled = (pooled + h)[:, 0]
    else:
        pooled = x.mean(axis=1)

    out = {"last_hidden_state": x, "pooler_output": pooled}
    if output_hidden_states:
        out["hidden_states"] = hidden_states
    return out


# ---------------------------------------------------------------------------
# SigLIP text tower (two-tower scoring: ClipScore / KID text side)
# ---------------------------------------------------------------------------

def init_text(rng: jax.Array, cfg: VisionConfig, vocab_size: int = 32000,
              max_positions: int = 64, dtype=jnp.float32) -> dict:
    """Text encoder sharing the vision layer geometry (SigLIP-style)."""
    base = init(rng, cfg, dtype)
    k1, k2, k3 = jax.random.split(rng, 3)
    d = cfg.hidden_size
    return {
        "embeddings": {
            "token": jax.random.normal(k1, (vocab_size, d), dtype) * 0.02,
            "position": jax.random.normal(k2, (max_positions, d),
                                          dtype) * 0.02,
        },
        "layers": base["layers"],
        "final_ln": ln_init(d, dtype),
        "head": dense_init(k3, d, d, dtype=dtype),
    }


def apply_text(params: dict, cfg: VisionConfig, input_ids: jnp.ndarray,
               *, attn_impl: str = "auto") -> dict:
    """input_ids [B, T] -> {'last_hidden_state', 'pooler_output'}.

    Pooling follows SigLIP: the LAST token's hidden state through the head
    projection (sequences are padded to a fixed length by the tokenizer).
    """
    act = ACTIVATIONS[cfg.hidden_act]
    eps = cfg.layer_norm_eps
    nh = cfg.num_attention_heads

    x = params["embeddings"]["token"][input_ids]
    x = x + params["embeddings"]["position"][:input_ids.shape[1]]

    def block(x, lp):
        residual = x
        h = layer_norm(lp["ln1"], x, eps)
        h = _mha(lp["attn"], h, h, nh, impl=attn_impl)
        x = residual + h
        residual = x
        h = layer_norm(lp["ln2"], x, eps)
        h = linear(lp["mlp"]["fc2"], act(linear(lp["mlp"]["fc1"], h)))
        return residual + h, None

    x, _ = jax.lax.scan(block, x, params["layers"])
    x = layer_norm(params["final_ln"], x, eps)
    pooled = linear(params["head"], x[:, -1])
    return {"last_hidden_state": x, "pooler_output": pooled}
