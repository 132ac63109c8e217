"""HF checkpoint -> pytree weight importer.

Maps ``nllg/detikzify-v2*`` (and compatible) torch checkpoints onto this
package's stacked-layer param pytrees. Torch ``nn.Linear`` stores
``[out, in]``; our kernels are ``[in, out]``, so every kernel transposes.
Per-layer tensors are stacked along a leading layer axis (scan layout).

Accepts any ``dict[str, np.ndarray]`` (torch ``state_dict`` tensors must be
pre-converted via ``.numpy()``; ``load_state_dict_from_safetensors`` handles
files). Key names follow reference ``model/modeling_detikzify.py`` module
paths, e.g. ``model.vision_model.encoder.layers.3.self_attn.q_proj.weight``.
"""
from __future__ import annotations

import glob
import json
import os
import re
from typing import Dict, Mapping

import numpy as np
import jax.numpy as jnp

from ..config import AdapterConfig, DetikzifyConfig, VisionConfig
from .detikzify import Params


def load_state_dict_from_safetensors(path: str) -> Dict[str, np.ndarray]:
    """Load (possibly sharded) ``*.safetensors`` under a directory or file."""
    from safetensors import safe_open

    files = [path] if path.endswith(".safetensors") else \
        sorted(glob.glob(os.path.join(path, "*.safetensors")))
    if not files:
        raise FileNotFoundError(f"no safetensors found at {path}")
    state: Dict[str, np.ndarray] = {}
    for f in files:
        with safe_open(f, framework="numpy") as reader:
            for key in reader.keys():
                state[key] = reader.get_tensor(key)
    return state


class _Src:
    """State-dict view with prefix stripping and access tracking."""

    def __init__(self, state: Mapping[str, np.ndarray]):
        self.state = dict(state)
        self.used: set = set()

    def __call__(self, key: str) -> np.ndarray:
        for candidate in (key, "model." + key):
            if candidate in self.state:
                self.used.add(candidate)
                return np.asarray(self.state[candidate])
        raise KeyError(key)

    def has(self, key: str) -> bool:
        return key in self.state or ("model." + key) in self.state

    def unused(self):
        return sorted(set(self.state) - self.used)


def _lin(src: _Src, name: str, dtype) -> dict:
    p = {"kernel": jnp.asarray(src(f"{name}.weight").T, dtype)}
    if src.has(f"{name}.bias"):
        p["bias"] = jnp.asarray(src(f"{name}.bias"), dtype)
    return p


def _ln(src: _Src, name: str, dtype) -> dict:
    return {"scale": jnp.asarray(src(f"{name}.weight"), dtype),
            "bias": jnp.asarray(src(f"{name}.bias"), dtype)}


def _rms(src: _Src, name: str, dtype) -> dict:
    return {"scale": jnp.asarray(src(f"{name}.weight"), dtype)}


def _stack(items: list) -> dict:
    import jax

    return jax.tree.map(lambda *xs: jnp.stack(xs), *items)


def import_vision(src: _Src, cfg: VisionConfig, dtype=jnp.bfloat16,
                  prefix: str = "vision_model") -> dict:
    d = cfg.hidden_size
    conv_w = src(f"{prefix}.embeddings.patch_embedding.weight")  # [D,C,p,p]
    patch = {
        "kernel": jnp.asarray(conv_w.reshape(d, -1).T, dtype),
        "bias": jnp.asarray(src(f"{prefix}.embeddings.patch_embedding.bias"),
                            dtype),
    }
    layers = []
    for i in range(cfg.num_hidden_layers):
        base = f"{prefix}.encoder.layers.{i}"
        layers.append({
            "ln1": _ln(src, f"{base}.layer_norm1", dtype),
            "attn": {
                "q": _lin(src, f"{base}.self_attn.q_proj", dtype),
                "k": _lin(src, f"{base}.self_attn.k_proj", dtype),
                "v": _lin(src, f"{base}.self_attn.v_proj", dtype),
                "o": _lin(src, f"{base}.self_attn.out_proj", dtype),
            },
            "ln2": _ln(src, f"{base}.layer_norm2", dtype),
            "mlp": {
                "fc1": _lin(src, f"{base}.mlp.fc1", dtype),
                "fc2": _lin(src, f"{base}.mlp.fc2", dtype),
            },
        })

    # MAP pooling head: torch nn.MultiheadAttention packs qkv into in_proj
    head = {}
    if src.has(f"{prefix}.head.probe"):
        in_w = src(f"{prefix}.head.attention.in_proj_weight")  # [3D, D]
        in_b = src(f"{prefix}.head.attention.in_proj_bias")
        qw, kw, vw = np.split(in_w, 3, axis=0)
        qb, kb, vb = np.split(in_b, 3, axis=0)
        head = {
            "probe": jnp.asarray(src(f"{prefix}.head.probe"), dtype),
            "attn": {
                "q": {"kernel": jnp.asarray(qw.T, dtype),
                      "bias": jnp.asarray(qb, dtype)},
                "k": {"kernel": jnp.asarray(kw.T, dtype),
                      "bias": jnp.asarray(kb, dtype)},
                "v": {"kernel": jnp.asarray(vw.T, dtype),
                      "bias": jnp.asarray(vb, dtype)},
                "o": _lin(src, f"{prefix}.head.attention.out_proj", dtype),
            },
            "ln": _ln(src, f"{prefix}.head.layernorm", dtype),
            "mlp": {
                "fc1": _lin(src, f"{prefix}.head.mlp.fc1", dtype),
                "fc2": _lin(src, f"{prefix}.head.mlp.fc2", dtype),
            },
        }

    return {
        "embeddings": {
            "patch": patch,
            "position": jnp.asarray(
                src(f"{prefix}.embeddings.position_embedding.weight"), dtype),
        },
        "layers": _stack(layers),
        "post_ln": _ln(src, f"{prefix}.post_layernorm", dtype),
        "head": head,
    }


def import_timm_vision(state: Mapping[str, np.ndarray], cfg: VisionConfig,
                       dtype=jnp.bfloat16, prefix: str = "") -> dict:
    """timm SigLIP ViT -> our vision pytree (v1 legacy models; reference
    ``model/v1/modeling_detikzify.py:49-73`` wraps a timm tower).

    timm packs qkv into one matrix and names blocks ``blocks.{i}.*``.
    """
    src = _Src(state)
    p = prefix
    d = cfg.hidden_size

    conv_w = src(f"{p}patch_embed.proj.weight")          # [D, C, ph, pw]
    pos = src(f"{p}pos_embed")
    if pos.ndim == 3:
        pos = pos[0]
    layers = []
    for i in range(cfg.num_hidden_layers):
        base = f"{p}blocks.{i}"
        qkv_w = src(f"{base}.attn.qkv.weight")           # [3D, D]
        qkv_b = src(f"{base}.attn.qkv.bias")
        qw, kw, vw = np.split(qkv_w, 3, axis=0)
        qb, kb, vb = np.split(qkv_b, 3, axis=0)
        layers.append({
            "ln1": _ln(src, f"{base}.norm1", dtype),
            "attn": {
                "q": {"kernel": jnp.asarray(qw.T, dtype),
                      "bias": jnp.asarray(qb, dtype)},
                "k": {"kernel": jnp.asarray(kw.T, dtype),
                      "bias": jnp.asarray(kb, dtype)},
                "v": {"kernel": jnp.asarray(vw.T, dtype),
                      "bias": jnp.asarray(vb, dtype)},
                "o": _lin(src, f"{base}.attn.proj", dtype),
            },
            "ln2": _ln(src, f"{base}.norm2", dtype),
            "mlp": {
                "fc1": _lin(src, f"{base}.mlp.fc1", dtype),
                "fc2": _lin(src, f"{base}.mlp.fc2", dtype),
            },
        })

    head = {}
    if src.has(f"{p}attn_pool.latent"):
        # timm MAP head: latent query, packed kv, separate q
        kv_w = src(f"{p}attn_pool.kv.weight")
        kv_b = src(f"{p}attn_pool.kv.bias")
        kw, vw = np.split(kv_w, 2, axis=0)
        kb, vb = np.split(kv_b, 2, axis=0)
        head = {
            "probe": jnp.asarray(src(f"{p}attn_pool.latent"), dtype),
            "attn": {
                "q": _lin(src, f"{p}attn_pool.q", dtype),
                "k": {"kernel": jnp.asarray(kw.T, dtype),
                      "bias": jnp.asarray(kb, dtype)},
                "v": {"kernel": jnp.asarray(vw.T, dtype),
                      "bias": jnp.asarray(vb, dtype)},
                "o": _lin(src, f"{p}attn_pool.proj", dtype),
            },
            "ln": _ln(src, f"{p}attn_pool.norm", dtype),
            "mlp": {
                "fc1": _lin(src, f"{p}attn_pool.mlp.fc1", dtype),
                "fc2": _lin(src, f"{p}attn_pool.mlp.fc2", dtype),
            },
        }

    return {
        "embeddings": {
            "patch": {
                "kernel": jnp.asarray(conv_w.reshape(d, -1).T, dtype),
                "bias": jnp.asarray(src(f"{p}patch_embed.proj.bias"), dtype),
            },
            "position": jnp.asarray(pos, dtype),
        },
        "layers": _stack(layers),
        "post_ln": _ln(src, f"{p}norm", dtype),
        "head": head,
    }


def import_v1(state: Mapping[str, np.ndarray],
              vision_state: Mapping[str, np.ndarray],
              cfg: DetikzifyConfig, dtype=jnp.bfloat16):
    """v1 legacy checkpoint: LLaMA-style decoder + ``mm_projector`` weights
    in ``state``; the timm vision tower arrives separately (the reference
    downloads it at load time, ``model/v1/__init__.py:24-56``)."""
    from .detikzify import Params

    text_state = {}
    for k, v in dict(state).items():
        if k.startswith("model.mm_projector") or k.startswith("mm_projector"):
            continue
        if k.startswith("model."):
            text_state["text_model." + k[len("model."):]] = v
        else:
            text_state[k] = v
    src = _Src(text_state)
    text = import_text(src, cfg.text, dtype)

    proj_w = next(v for k, v in state.items()
                  if "mm_projector" in k and k.endswith("weight"))
    proj_b = next((v for k, v in state.items()
                   if "mm_projector" in k and k.endswith("bias")), None)
    proj = {"kernel": jnp.asarray(np.asarray(proj_w).T, dtype)}
    if proj_b is not None:
        proj["bias"] = jnp.asarray(proj_b, dtype)

    vision = import_timm_vision(vision_state, cfg.vision, dtype)
    return Params(vision=vision, connector={"proj": proj}, text=text)


def import_siglip_text(src: _Src, cfg: VisionConfig, dtype=jnp.bfloat16,
                       prefix: str = "text_model") -> dict:
    """SigLIP text tower (for the two-tower ClipScore metric)."""
    layers = []
    for i in range(cfg.num_hidden_layers):
        base = f"{prefix}.encoder.layers.{i}"
        layers.append({
            "ln1": _ln(src, f"{base}.layer_norm1", dtype),
            "attn": {
                "q": _lin(src, f"{base}.self_attn.q_proj", dtype),
                "k": _lin(src, f"{base}.self_attn.k_proj", dtype),
                "v": _lin(src, f"{base}.self_attn.v_proj", dtype),
                "o": _lin(src, f"{base}.self_attn.out_proj", dtype),
            },
            "ln2": _ln(src, f"{base}.layer_norm2", dtype),
            "mlp": {
                "fc1": _lin(src, f"{base}.mlp.fc1", dtype),
                "fc2": _lin(src, f"{base}.mlp.fc2", dtype),
            },
        })
    return {
        "embeddings": {
            "token": jnp.asarray(
                src(f"{prefix}.embeddings.token_embedding.weight"), dtype),
            "position": jnp.asarray(
                src(f"{prefix}.embeddings.position_embedding.weight"), dtype),
        },
        "layers": _stack(layers),
        "final_ln": _ln(src, f"{prefix}.final_layer_norm", dtype),
        "head": _lin(src, f"{prefix}.head", dtype),
    }


def import_text(src: _Src, cfg, dtype=jnp.bfloat16,
                prefix: str = "text_model") -> dict:
    layers = []
    for i in range(cfg.num_hidden_layers):
        base = f"{prefix}.layers.{i}"
        layers.append({
            "input_ln": _rms(src, f"{base}.input_layernorm", dtype),
            "attn": {
                "q": _lin(src, f"{base}.self_attn.q_proj", dtype),
                "k": _lin(src, f"{base}.self_attn.k_proj", dtype),
                "v": _lin(src, f"{base}.self_attn.v_proj", dtype),
                "o": _lin(src, f"{base}.self_attn.o_proj", dtype),
            },
            "post_ln": _rms(src, f"{base}.post_attention_layernorm", dtype),
            "mlp": {
                "gate": _lin(src, f"{base}.mlp.gate_proj", dtype),
                "up": _lin(src, f"{base}.mlp.up_proj", dtype),
                "down": _lin(src, f"{base}.mlp.down_proj", dtype),
            },
        })
    params = {
        "embed_tokens": jnp.asarray(src(f"{prefix}.embed_tokens.weight"),
                                    dtype),
        "layers": _stack(layers),
        "norm": _rms(src, f"{prefix}.norm", dtype),
    }
    if src.has("lm_head.weight"):
        params["lm_head"] = {"kernel": jnp.asarray(src("lm_head.weight").T,
                                                   dtype)}
    elif not cfg.tie_word_embeddings:
        params["lm_head"] = {"kernel": params["embed_tokens"].T}
    return params


def import_detikzify(state: Mapping[str, np.ndarray], cfg: DetikzifyConfig,
                     dtype=jnp.bfloat16, strict: bool = True) -> Params:
    src = _Src(state)
    # real reference checkpoints nest the tower one level deeper: the
    # DetikzifyModel holds a SiglipVisionModel WRAPPER whose own submodule
    # is vision_model (modeling_detikzify.py:125), so keys read
    # model.vision_model.vision_model.*
    vp = ("vision_model.vision_model"
          if src.has("vision_model.vision_model.embeddings."
                     "patch_embedding.weight") else "vision_model")
    params = Params(
        vision=import_vision(src, cfg.vision, dtype, prefix=vp),
        connector={"proj": _lin(
            src, "connector.modality_projection.proj", dtype)},
        text=import_text(src, cfg.text, dtype),
    )
    if strict:
        leftovers = [k for k in src.unused() if not k.startswith("adapter")]
        if leftovers:
            raise ValueError(f"unmapped checkpoint keys: {leftovers[:10]}"
                             f" (+{max(0, len(leftovers) - 10)} more)")
    return params


def import_adapter(state: Mapping[str, np.ndarray], vcfg: VisionConfig,
                   acfg: AdapterConfig, dtype=jnp.bfloat16,
                   prefix: str = "adapter") -> dict:
    """Import TikZero adapter weights into the full-layer-stack layout.

    Inactive layers (reference stores ``None``; ``modeling_adapter.py:
    365-371``) get zero blocks -- they are skipped statically in the encoder.
    """
    src = _Src(state)
    # reference CrossAttentionAdapter.save_pretrained writes BARE keys
    # (layers.N..., connector.*, dummy_input); adapters embedded in a
    # composite checkpoint carry the adapter. prefix
    if src.has("dummy_input"):
        prefix = ""
    if prefix:
        prefix = prefix.rstrip(".") + "."
    d, i = vcfg.hidden_size, vcfg.intermediate_size
    hd = d // acfg.num_attention_heads

    def zeros_block():
        def zl(din, dout):
            return {"kernel": jnp.zeros((din, dout), dtype),
                    "bias": jnp.zeros((dout,), dtype)}

        def zn(dim):
            return {"scale": jnp.zeros((dim,), dtype),
                    "bias": jnp.zeros((dim,), dtype)}

        return {
            "ln1": zn(d),
            "attn": {"q": zl(d, d), "k": zl(d, d), "v": zl(d, d),
                     "o": zl(d, d), "q_norm": zn(hd), "k_norm": zn(hd)},
            "ln2": zn(d),
            "mlp": {"fc1": zl(d, i), "fc2": zl(i, d)},
            "attn_gate": jnp.zeros((1,), dtype),
            "mlp_gate": jnp.zeros((1,), dtype),
        }

    layers = []
    for idx in range(vcfg.num_hidden_layers):
        base = f"{prefix}layers.{idx}"
        if not src.has(f"{base}.layer_norm1.weight"):
            layers.append(zeros_block())
            continue
        layers.append({
            "ln1": _ln(src, f"{base}.layer_norm1", dtype),
            "attn": {
                "q": _lin(src, f"{base}.cross_attn.q_proj", dtype),
                "k": _lin(src, f"{base}.cross_attn.k_proj", dtype),
                "v": _lin(src, f"{base}.cross_attn.v_proj", dtype),
                "o": _lin(src, f"{base}.cross_attn.out_proj", dtype),
                "q_norm": _ln(src, f"{base}.cross_attn.q_norm", dtype),
                "k_norm": _ln(src, f"{base}.cross_attn.k_norm", dtype),
            },
            "ln2": _ln(src, f"{base}.layer_norm2", dtype),
            "mlp": {
                "fc1": _lin(src, f"{base}.mlp.fc1", dtype),
                "fc2": _lin(src, f"{base}.mlp.fc2", dtype),
            },
            "attn_gate": jnp.asarray(src(f"{base}.cross_attn_attn_gate"),
                                     dtype),
            "mlp_gate": jnp.asarray(src(f"{base}.cross_attn_mlp_gate"),
                                    dtype),
        })

    dummy = src(f"{prefix}dummy_input")  # [C, H, W] -> [H, W, C]
    return {
        "layers": _stack(layers),
        "connector": _lin(src, f"{prefix}connector", dtype),
        "dummy_input": jnp.asarray(np.transpose(dummy, (1, 2, 0)), dtype),
    }


def config_from_hf_json(path_or_dict) -> DetikzifyConfig:
    """Build a DetikzifyConfig from an HF ``config.json``."""
    if isinstance(path_or_dict, str):
        with open(path_or_dict) as f:
            hf = json.load(f)
    else:
        hf = dict(path_or_dict)
    if "patch_token_id" in hf or "DetikzifyForCausalLM" in \
            hf.get("architectures", []):
        return _v1_config_from_hf(hf)
    v = hf.get("vision_config", {})
    t = hf.get("text_config", {})
    vision = VisionConfig(
        hidden_size=v.get("hidden_size", 1152),
        intermediate_size=v.get("intermediate_size", 4304),
        num_hidden_layers=v.get("num_hidden_layers", 27),
        num_attention_heads=v.get("num_attention_heads", 16),
        image_size=v.get("image_size", 420),
        patch_size=v.get("patch_size", 14),
        hidden_act=v.get("hidden_act", "gelu_pytorch_tanh"),
        layer_norm_eps=v.get("layer_norm_eps", 1e-6),
    )
    from ..config import TextConfig

    text = TextConfig(
        vocab_size=t.get("vocab_size", 128256),
        hidden_size=t.get("hidden_size", 4096),
        intermediate_size=t.get("intermediate_size", 14336),
        num_hidden_layers=t.get("num_hidden_layers", 32),
        num_attention_heads=t.get("num_attention_heads", 32),
        num_key_value_heads=t.get("num_key_value_heads", 8),
        max_position_embeddings=t.get("max_position_embeddings", 131072),
        rms_norm_eps=t.get("rms_norm_eps", 1e-5),
        rope_theta=t.get("rope_theta", 500000.0),
        rope_scaling=t.get("rope_scaling"),
        tie_word_embeddings=hf.get("tie_word_embeddings",
                                   t.get("tie_word_embeddings", False)),
        hidden_act=t.get("hidden_act", "silu"),
        attention_bias=t.get("attention_bias", False),
    )
    return DetikzifyConfig(
        vision=vision, text=text,
        image_token_id=hf.get("image_token_id", 128005),
        bos_token_id=t.get("bos_token_id", hf.get("bos_token_id", 128000)),
        eos_token_id=t.get("eos_token_id", hf.get("eos_token_id", 128001)),
        pad_token_id=hf.get("pad_token_id", 128004),
        concat_factor=hf.get("concat_factor", 3),
        # None when the checkpoint does not declare one: SelfSim then falls
        # back to "emd" exactly like the reference (imagesim.py:64)
        pooling_mode=hf.get("pooling_mode"),
    )


def _v1_config_from_hf(hf: dict) -> DetikzifyConfig:
    """v1 legacy config: flat LLaMA fields + mm_* vision wiring
    (reference ``model/v1/configuration_detikzify.py:3-13``)."""
    from ..config import TextConfig

    text = TextConfig(
        vocab_size=hf.get("vocab_size", 32000),
        hidden_size=hf.get("hidden_size", 2048),
        intermediate_size=hf.get("intermediate_size", 5632),
        num_hidden_layers=hf.get("num_hidden_layers", 22),
        num_attention_heads=hf.get("num_attention_heads", 32),
        num_key_value_heads=hf.get("num_key_value_heads",
                                   hf.get("num_attention_heads", 32)),
        max_position_embeddings=hf.get("max_position_embeddings", 2048),
        rms_norm_eps=hf.get("rms_norm_eps", 1e-5),
        rope_theta=hf.get("rope_theta", 10000.0),
        hidden_act=hf.get("hidden_act", "silu"),
        tie_word_embeddings=hf.get("tie_word_embeddings", False),
    )
    concat = hf.get("concat_patches", 3)
    # timm SigLIP so400m/384: hidden 1152, 27 layers, image 384, patch 14
    vision = VisionConfig(image_size=hf.get("vision_image_size", 384))
    return DetikzifyConfig(
        vision=vision, text=text,
        image_token_id=hf.get("patch_token_id",
                              hf.get("image_token_id", 32000)),
        bos_token_id=hf.get("bos_token_id", 1),
        eos_token_id=hf.get("eos_token_id", 2),
        pad_token_id=hf.get("pad_token_id", 0) or 0,
        concat_factor=concat,
        feature_layer=hf.get("feature_layer"),
        projector_bias=True,
        # the reference v1 config's pooling_mode PROPERTY unconditionally
        # returns "cos" (v1/configuration_detikzify.py:12-13), shadowing
        # any value a config.json might carry -- pin it, don't read it
        pooling_mode="cos",
        is_v1=True,
    )
