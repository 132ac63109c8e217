"""Model loading / saving / registry.

Equivalent of reference ``detikzify/model/__init__.py:20-61``:

  * ``load(name_or_path)``     -- resolve a checkpoint directory (or a
    registered model name), build config + params + processor. Supports the
    optional modality-projector overlay (reference :47-56) and auto-loads an
    ``adapter/`` subfolder when present (:58-59).
  * ``save_pretrained(...)``   -- export params to safetensors with
    reference-compatible tensor names, so checkpoints round-trip between
    this framework and the torch reference.
  * ``register(name, path)``   -- local model registry (stands in for the
    HF Auto* registration; zero-egress environments resolve names to local
    paths).
"""
from __future__ import annotations

import json
import os
from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..config import DetikzifyConfig
from ..processing import DetikzifyProcessor, load_tokenizer
from . import import_hf
from .detikzify import Params

# name -> local path or hub id (reference webui/strings.py model registry)
MODEL_REGISTRY: Dict[str, str] = {
    "detikzify-v2.5-8b": "nllg/detikzify-v2.5-8b",
    "detikzify-v2-8b": "nllg/detikzify-v2-8b",
    "detikzify-ds-1.3b": "nllg/detikzify-ds-1.3b",
    "detikzify-ds-7b": "nllg/detikzify-ds-7b",
    "detikzify-tl-1.1b": "nllg/detikzify-tl-1.1b",
    "detikzify-cl-7b": "nllg/detikzify-cl-7b",
}


def register(name: str, path: str) -> None:
    """Register a model name -> checkpoint path mapping."""
    MODEL_REGISTRY[name] = path


def _resolve(name_or_path: str) -> str:
    path = MODEL_REGISTRY.get(name_or_path, name_or_path)
    if os.path.isdir(path):
        return path
    # HF cache layout fallback (offline environments)
    cache = os.environ.get("HF_HOME", os.path.expanduser("~/.cache/huggingface"))
    hub_dir = os.path.join(cache, "hub",
                           "models--" + path.replace("/", "--"))
    if os.path.isdir(hub_dir):
        snaps = os.path.join(hub_dir, "snapshots")
        if os.path.isdir(snaps):
            entries = sorted(os.listdir(snaps))
            if entries:
                return os.path.join(snaps, entries[-1])
    raise FileNotFoundError(
        f"cannot resolve model {name_or_path!r}: not a local directory and "
        f"not in the local HF cache (this build runs zero-egress; download "
        f"checkpoints out-of-band or register() a local path)")


def load(
    model_name_or_path: str,
    *,
    dtype=jnp.bfloat16,
    modality_projector: Optional[str] = None,
    adapter_embedding_model: Optional[str] = None,
    vision_tower: Optional[str] = None,   # v1: timm tower checkpoint path
    quantize: bool = False,
) -> Tuple[Params, DetikzifyConfig, DetikzifyProcessor]:
    """Load (params, config, processor) from a checkpoint directory.

    ``quantize=True`` imports to host memory and quantizes the projection
    kernels to per-channel int8 before device placement -- the single-chip
    serving path for 8B-class models (full-precision weights never touch
    the accelerator).

    v1 legacy checkpoints (LLaVA-style, reference ``model/v1/__init__.py:
    24-56``) are detected from their config and need ``vision_tower``
    pointing at the timm SigLIP checkpoint (the reference downloads it from
    the timm hub at load time)."""
    if quantize:
        import contextlib

        import jax

        from ..ops.quant import quantize_params_host

        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            result = load(
                model_name_or_path, dtype=dtype,
                modality_projector=modality_projector,
                adapter_embedding_model=adapter_embedding_model,
                vision_tower=vision_tower, quantize=False)
        params = quantize_params_host(result[0], device=jax.devices()[0])
        return (params,) + tuple(result[1:])
    path = _resolve(model_name_or_path)
    cfg = import_hf.config_from_hf_json(os.path.join(path, "config.json"))
    state = import_hf.load_state_dict_from_safetensors(path)
    if cfg.is_v1:
        if vision_tower is None:
            raise ValueError(
                "v1 checkpoints need vision_tower= (path to the timm SigLIP "
                "so400m tower weights; zero-egress builds cannot fetch it)")
        vstate = import_hf.load_state_dict_from_safetensors(
            _resolve(vision_tower))
        params = import_hf.import_v1(state, vstate, cfg, dtype=dtype)
        tokenizer = load_tokenizer(path)
        mean, std = _image_stats(_resolve(vision_tower))
        return params, cfg, DetikzifyProcessor(tokenizer, cfg,
                                               image_mean=mean,
                                               image_std=std)
    params = import_hf.import_detikzify(state, cfg, dtype=dtype)

    if modality_projector is not None:
        params = _overlay_projector(params, modality_projector, dtype)

    tokenizer = load_tokenizer(path)
    mean, std = _image_stats(path)
    processor = DetikzifyProcessor(
        tokenizer, cfg, model_expects_text=_processor_expects_text(path),
        image_mean=mean, image_std=std)

    adapter_dir = os.path.join(path, "adapter")
    if os.path.isdir(adapter_dir) and adapter_embedding_model is not None:
        return load_adapter(params, cfg, processor, adapter_dir,
                            adapter_embedding_model, dtype=dtype)
    return params, cfg, processor


def _processor_expects_text(path: str) -> bool:
    """TikZero+ checkpoints mark caption-conditioned prompts in their HF
    processor config (reference processing_detikzify.py:53,65)."""
    import json

    pc = os.path.join(path, "processor_config.json")
    if os.path.isfile(pc):
        with open(pc) as f:
            return bool(json.load(f).get("model_expects_text", False))
    return False


def _image_stats(path: str):
    """Checkpoint-local normalization stats from preprocessor_config.json
    (the reference's v1 loader derives them from the timm data config;
    SigLIP default 0.5/0.5 otherwise)."""
    import json

    pc = os.path.join(path, "preprocessor_config.json")
    if os.path.isfile(pc):
        with open(pc) as f:
            d = json.load(f)
        if "image_mean" in d or "image_std" in d:
            return (d.get("image_mean", 0.5), d.get("image_std", 0.5))
    return 0.5, 0.5


def _overlay_projector(params: Params, path: str, dtype) -> Params:
    """Overlay separately-trained modality-projector weights
    (reference model/__init__.py:47-56)."""
    if path.endswith(".npz"):
        with np.load(path) as data:
            kernel = data["proj/kernel"]
    else:
        state = import_hf.load_state_dict_from_safetensors(path)
        key = next(k for k in state if "proj" in k and k.endswith("weight"))
        kernel = np.asarray(state[key]).T
    connector = dict(params.connector)
    connector["proj"] = {"kernel": jnp.asarray(kernel, dtype)}
    return params._replace(connector=connector)


def load_adapter(params, cfg, processor, adapter_path: str,
                 embedding_model: str, *, dtype=jnp.bfloat16,
                 max_caption_length: int = 512):
    """Attach a TikZero adapter: returns (params, cfg, AdapterProcessor,
    AdapterBundle). ``embedding_model`` is the frozen caption model's
    checkpoint path (reference uses meta-llama/Llama-3.2-1B)."""
    from ..config import AdapterConfig
    from ..processing_adapter import AdapterProcessor
    from .embedding import AdapterBundle

    acfg = cfg.adapter or AdapterConfig()
    cfg = cfg.replace(adapter=acfg)
    state = import_hf.load_state_dict_from_safetensors(adapter_path)
    adapter_params = import_hf.import_adapter(state, cfg.vision, acfg,
                                              dtype=dtype)

    embed_path = _resolve(embedding_model)
    embed_cfg_full = import_hf.config_from_hf_json(
        os.path.join(embed_path, "config.json"))
    embed_cfg = embed_cfg_full.text
    embed_state = import_hf.load_state_dict_from_safetensors(embed_path)
    # plain LLaMA checkpoints use model.* prefixes
    embed_state = {k.replace("model.", "text_model.", 1)
                   if k.startswith("model.") else k: v
                   for k, v in embed_state.items()}
    src = import_hf._Src(embed_state)
    embed_params = import_hf.import_text(src, embed_cfg, dtype=dtype)

    embed_tok = load_tokenizer(embed_path)
    bundle = AdapterBundle(adapter_params=adapter_params, adapter_cfg=acfg,
                           embed_params=embed_params, embed_cfg=embed_cfg,
                           tokenizer=embed_tok,
                           max_length=max_caption_length)
    aprocessor = AdapterProcessor(processor, embed_tok,
                                  max_length=max_caption_length)
    return params, cfg, aprocessor, bundle


def has_adapter(obj) -> bool:
    """Reference ``has_adapter`` (adapter/__init__.py:6-7)."""
    return getattr(obj, "adapter", None) is not None


# ---------------------------------------------------------------------------
# export: params -> reference-compatible safetensors
# ---------------------------------------------------------------------------

def _export_vision(vision: dict, out: dict, prefix: str) -> None:
    def kern(p):
        return np.asarray(p["kernel"]).T

    emb = vision["embeddings"]
    patch = np.asarray(emb["patch"]["kernel"])          # [C*p*p, D]
    # stored flat here; save_pretrained reshapes to conv [D, C, p, p]
    out[f"{prefix}.embeddings.patch_embedding.weight"] = patch.T
    out[f"{prefix}.embeddings.patch_embedding.bias"] = \
        np.asarray(emb["patch"]["bias"])
    out[f"{prefix}.embeddings.position_embedding.weight"] = \
        np.asarray(emb["position"])

    layers = vision["layers"]
    n_layers = np.asarray(layers["ln1"]["scale"]).shape[0]
    for i in range(n_layers):
        base = f"{prefix}.encoder.layers.{i}"
        sel = lambda tree: {k: (sel(v) if isinstance(v, dict)  # noqa: E731
                                else np.asarray(v)[i]) for k, v in tree.items()}
        lp = sel(layers)
        out[f"{base}.layer_norm1.weight"] = lp["ln1"]["scale"]
        out[f"{base}.layer_norm1.bias"] = lp["ln1"]["bias"]
        for ours, theirs in (("q", "q_proj"), ("k", "k_proj"),
                             ("v", "v_proj"), ("o", "out_proj")):
            out[f"{base}.self_attn.{theirs}.weight"] = lp["attn"][ours]["kernel"].T
            out[f"{base}.self_attn.{theirs}.bias"] = lp["attn"][ours]["bias"]
        out[f"{base}.layer_norm2.weight"] = lp["ln2"]["scale"]
        out[f"{base}.layer_norm2.bias"] = lp["ln2"]["bias"]
        out[f"{base}.mlp.fc1.weight"] = lp["mlp"]["fc1"]["kernel"].T
        out[f"{base}.mlp.fc1.bias"] = lp["mlp"]["fc1"]["bias"]
        out[f"{base}.mlp.fc2.weight"] = lp["mlp"]["fc2"]["kernel"].T
        out[f"{base}.mlp.fc2.bias"] = lp["mlp"]["fc2"]["bias"]

    out[f"{prefix}.post_layernorm.weight"] = \
        np.asarray(vision["post_ln"]["scale"])
    out[f"{prefix}.post_layernorm.bias"] = \
        np.asarray(vision["post_ln"]["bias"])

    head = vision.get("head") or {}
    if head:
        out[f"{prefix}.head.probe"] = np.asarray(head["probe"])
        qw = np.asarray(head["attn"]["q"]["kernel"]).T
        kw = np.asarray(head["attn"]["k"]["kernel"]).T
        vw = np.asarray(head["attn"]["v"]["kernel"]).T
        out[f"{prefix}.head.attention.in_proj_weight"] = \
            np.concatenate([qw, kw, vw], axis=0)
        out[f"{prefix}.head.attention.in_proj_bias"] = np.concatenate(
            [np.asarray(head["attn"][x]["bias"]) for x in "qkv"])
        out[f"{prefix}.head.attention.out_proj.weight"] = \
            np.asarray(head["attn"]["o"]["kernel"]).T
        out[f"{prefix}.head.attention.out_proj.bias"] = \
            np.asarray(head["attn"]["o"]["bias"])
        out[f"{prefix}.head.layernorm.weight"] = np.asarray(head["ln"]["scale"])
        out[f"{prefix}.head.layernorm.bias"] = np.asarray(head["ln"]["bias"])
        out[f"{prefix}.head.mlp.fc1.weight"] = \
            np.asarray(head["mlp"]["fc1"]["kernel"]).T
        out[f"{prefix}.head.mlp.fc1.bias"] = np.asarray(head["mlp"]["fc1"]["bias"])
        out[f"{prefix}.head.mlp.fc2.weight"] = \
            np.asarray(head["mlp"]["fc2"]["kernel"]).T
        out[f"{prefix}.head.mlp.fc2.bias"] = np.asarray(head["mlp"]["fc2"]["bias"])


def _export_text(text: dict, out: dict, prefix: str) -> None:
    out[f"{prefix}.embed_tokens.weight"] = np.asarray(text["embed_tokens"])
    layers = text["layers"]
    n_layers = np.asarray(layers["input_ln"]["scale"]).shape[0]
    for i in range(n_layers):
        base = f"{prefix}.layers.{i}"
        sel = lambda tree: {k: (sel(v) if isinstance(v, dict)  # noqa: E731
                                else np.asarray(v)[i]) for k, v in tree.items()}
        lp = sel(layers)
        out[f"{base}.input_layernorm.weight"] = lp["input_ln"]["scale"]
        for ours, theirs in (("q", "q_proj"), ("k", "k_proj"),
                             ("v", "v_proj"), ("o", "o_proj")):
            out[f"{base}.self_attn.{theirs}.weight"] = \
                lp["attn"][ours]["kernel"].T
        out[f"{base}.post_attention_layernorm.weight"] = lp["post_ln"]["scale"]
        for name in ("gate", "up", "down"):
            out[f"{base}.mlp.{name}_proj.weight"] = lp["mlp"][name]["kernel"].T
    out[f"{prefix}.norm.weight"] = np.asarray(text["norm"]["scale"])


def save_adapter(path: str, adapter_params: dict, vcfg,
                 active_every: int = 1) -> None:
    """Export TikZero adapter weights to reference-compatible safetensors
    (inverse of ``import_adapter``): BARE key names exactly as the
    reference's ``CrossAttentionAdapter.save_pretrained`` writes them
    (``layers.{i}...``, ``connector.*``, ``dummy_input``), inactive layers
    omitted like the reference's ``None`` entries."""
    from safetensors.numpy import save_file

    os.makedirs(path, exist_ok=True)
    out: Dict[str, np.ndarray] = {}
    layers = adapter_params["layers"]
    n_layers = np.asarray(layers["ln1"]["scale"]).shape[0]

    def sel(tree, i):
        return {k: (sel(v, i) if isinstance(v, dict) else np.asarray(v)[i])
                for k, v in tree.items()}

    for i in range(n_layers):
        if (i + 1) % active_every != 0:
            continue
        lp = sel(layers, i)
        base = f"layers.{i}"
        out[f"{base}.layer_norm1.weight"] = lp["ln1"]["scale"]
        out[f"{base}.layer_norm1.bias"] = lp["ln1"]["bias"]
        for ours, theirs in (("q", "q_proj"), ("k", "k_proj"),
                             ("v", "v_proj"), ("o", "out_proj")):
            out[f"{base}.cross_attn.{theirs}.weight"] = \
                lp["attn"][ours]["kernel"].T
            out[f"{base}.cross_attn.{theirs}.bias"] = lp["attn"][ours]["bias"]
        for norm in ("q_norm", "k_norm"):
            out[f"{base}.cross_attn.{norm}.weight"] = \
                lp["attn"][norm]["scale"]
            out[f"{base}.cross_attn.{norm}.bias"] = lp["attn"][norm]["bias"]
        out[f"{base}.layer_norm2.weight"] = lp["ln2"]["scale"]
        out[f"{base}.layer_norm2.bias"] = lp["ln2"]["bias"]
        out[f"{base}.mlp.fc1.weight"] = lp["mlp"]["fc1"]["kernel"].T
        out[f"{base}.mlp.fc1.bias"] = lp["mlp"]["fc1"]["bias"]
        out[f"{base}.mlp.fc2.weight"] = lp["mlp"]["fc2"]["kernel"].T
        out[f"{base}.mlp.fc2.bias"] = lp["mlp"]["fc2"]["bias"]
        out[f"{base}.cross_attn_attn_gate"] = lp["attn_gate"]
        out[f"{base}.cross_attn_mlp_gate"] = lp["mlp_gate"]
    out["connector.weight"] = np.asarray(
        adapter_params["connector"]["kernel"]).T
    out["connector.bias"] = np.asarray(
        adapter_params["connector"]["bias"])
    out["dummy_input"] = np.transpose(
        np.asarray(adapter_params["dummy_input"]), (2, 0, 1))
    out = {k: np.ascontiguousarray(v) for k, v in out.items()}
    save_file(out, os.path.join(path, "model.safetensors"))


def save_pretrained(path: str, params: Params, cfg: DetikzifyConfig,
                    processor: Optional[DetikzifyProcessor] = None) -> None:
    """Export to a reference-compatible checkpoint directory."""
    from safetensors.numpy import save_file

    os.makedirs(path, exist_ok=True)
    out: Dict[str, np.ndarray] = {}
    # the reference model nests SiglipVisionModel under an extra
    # ``vision_model`` attribute (modeling_detikzify.py:125), so its
    # state-dict prefix is model.vision_model.vision_model -- verified by
    # the reverse-export gate (test_full_model_export_loads_in_reference)
    vis_prefix = "model.vision_model.vision_model"
    _export_vision(params.vision, out, vis_prefix)
    out["model.connector.modality_projection.proj.weight"] = \
        np.asarray(params.connector["proj"]["kernel"]).T
    _export_text(params.text, out, "model.text_model")
    if "lm_head" in params.text:
        out["lm_head.weight"] = np.asarray(
            params.text["lm_head"]["kernel"]).T
    # conv weight needs [D, C, p, p] layout
    patch = out[f"{vis_prefix}.embeddings.patch_embedding.weight"]
    d = patch.shape[0]
    p, c = cfg.vision.patch_size, cfg.vision.num_channels
    out[f"{vis_prefix}.embeddings.patch_embedding.weight"] = \
        patch.reshape(d, c, p, p)
    out = {k: np.ascontiguousarray(v) for k, v in out.items()}
    save_file(out, os.path.join(path, "model.safetensors"))

    hf_cfg = {
        "architectures": ["DetikzifyForConditionalGeneration"],
        "model_type": "detikzify",
        "image_token_id": cfg.image_token_id,
        "pad_token_id": cfg.pad_token_id,
        "concat_factor": cfg.concat_factor,
        # declared SelfSim mode must survive a save/load round trip --
        # config_from_hf_json reads it and ImageSim.from_detikzify falls
        # back to "emd" when absent (reference imagesim.py:64)
        **({"pooling_mode": cfg.pooling_mode}
           if cfg.pooling_mode is not None else {}),
        "vision_config": {
            "hidden_size": cfg.vision.hidden_size,
            "intermediate_size": cfg.vision.intermediate_size,
            "num_hidden_layers": cfg.vision.num_hidden_layers,
            "num_attention_heads": cfg.vision.num_attention_heads,
            "image_size": cfg.vision.image_size,
            "patch_size": cfg.vision.patch_size,
            "hidden_act": cfg.vision.hidden_act,
            "layer_norm_eps": cfg.vision.layer_norm_eps,
        },
        "text_config": {
            "vocab_size": cfg.text.vocab_size,
            "hidden_size": cfg.text.hidden_size,
            "intermediate_size": cfg.text.intermediate_size,
            "num_hidden_layers": cfg.text.num_hidden_layers,
            "num_attention_heads": cfg.text.num_attention_heads,
            "num_key_value_heads": cfg.text.num_key_value_heads,
            "max_position_embeddings": cfg.text.max_position_embeddings,
            "rms_norm_eps": cfg.text.rms_norm_eps,
            "rope_theta": cfg.text.rope_theta,
            "rope_scaling": cfg.text.rope_scaling,
            "bos_token_id": cfg.bos_token_id,
            "eos_token_id": cfg.eos_token_id,
            "hidden_act": cfg.text.hidden_act,
            "tie_word_embeddings": cfg.text.tie_word_embeddings,
        },
    }
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(hf_cfg, f, indent=2)

    if processor is not None:
        # write the processor artifacts the reference's AutoProcessor path
        # needs (reference model/__init__.py:44: AutoProcessor.from_pretrained
        # -> DetikzifyProcessor(image_processor, tokenizer, image_seq_len,
        # image_token)), so a full export round-trips through the
        # reference's own ``detikzify.model.load()``
        tok = getattr(processor, "tokenizer", None)
        image_token = None
        if tok is not None and hasattr(tok, "save_pretrained"):
            tok.save_pretrained(path)
            if hasattr(tok, "convert_ids_to_tokens"):
                image_token = tok.convert_ids_to_tokens(cfg.image_token_id)
        with open(os.path.join(path, "preprocessor_config.json"), "w") as f:
            json.dump({
                "image_processor_type": "SiglipImageProcessor",
                "processor_class": "DetikzifyProcessor",
                "size": {"height": cfg.vision.image_size,
                         "width": cfg.vision.image_size},
                "image_mean": list(processor.image_mean),
                "image_std": list(processor.image_std),
                "do_resize": True, "do_rescale": True,
                "do_normalize": True, "do_convert_rgb": True,
            }, f, indent=2)
        proc_cfg = {
            "processor_class": "DetikzifyProcessor",
            "image_seq_len": processor.image_seq_len,
        }
        if image_token is not None:
            proc_cfg["image_token"] = image_token
        if processor.model_expects_text:
            proc_cfg["model_expects_text"] = True
        with open(os.path.join(path, "processor_config.json"), "w") as f:
            json.dump(proc_cfg, f, indent=2)
