"""JAX port of the DreamSim perceptual-similarity ensemble.

Reference ``detikzify/evaluate/dreamsim.py:13-89`` wraps the ``dreamsim``
torch package: an ensemble of three ViT-B/16 backbones (DINO, CLIP,
OpenCLIP -- LoRA weights already merged in the published checkpoints).
Each backbone embeds an image to its CLS feature (plus the CLIP visual
projection where present), embeddings are L2-normalized per model and
concatenated, and the distance is ``1 - cos`` between two images'
concatenated embeddings. The metric reported is ``1 - distance``.

This module implements the same computation TPU-natively:

  * a generic ViT encoder (`vit_apply`) covering both backbone flavors:
    - ``variant="vit"``:  pre-norm ViT with CLS token and final LayerNorm
      (DINO / HF ViTModel layout)
    - ``variant="clip"``: CLIP vision tower (ln_pre -> blocks -> ln_post
      on CLS, optional visual projection, quick-gelu)
  * weight importers from the two public state-dict namings:
    `import_vit_hf` (transformers ViTModel), `import_clip_hf`
    (transformers CLIPVisionModel[WithProjection]), and
    `import_vit_timm` (timm / DINO / dreamsim-checkpoint naming)
  * `DreamSimJAX`: the ensemble metric with the reference's
    update/compute/reset surface.

Embedding passes are jitted and batched; pairs score in one fused call.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# per-backbone input normalization (the dreamsim package's processors)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    patch_size: int = 16
    image_size: int = 224
    variant: str = "vit"            # "vit" | "clip"
    hidden_act: str = "gelu"        # "gelu" | "quick_gelu"
    layer_norm_eps: float = 1e-6
    proj_dim: Optional[int] = None  # CLIP visual projection width

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def embed_dim(self) -> int:
        return self.proj_dim or self.hidden_size


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    return jax.nn.gelu


def _ln(p, x, eps):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _linear(p, x):
    y = x @ p["kernel"]
    if "bias" in p:
        y = y + p["bias"]
    return y


def _mha(p, x, heads: int):
    b, s, d = x.shape
    hd = d // heads

    def split(t):
        return t.reshape(b, s, heads, hd).transpose(0, 2, 1, 3)

    q, k, v = (split(_linear(p[n], x)) for n in ("q", "k", "v"))
    attn = jax.nn.softmax(
        (q @ k.transpose(0, 1, 3, 2)) * (hd ** -0.5), axis=-1)
    out = (attn @ v).transpose(0, 2, 1, 3).reshape(b, s, d)
    return _linear(p["o"], out)


def _block(p, x, cfg: ViTConfig):
    act = _act(cfg.hidden_act)
    x = x + _mha(p["attn"], _ln(p["ln1"], x, cfg.layer_norm_eps), cfg.num_attention_heads)
    h = _linear(p["mlp"]["fc1"], _ln(p["ln2"], x, cfg.layer_norm_eps))
    return x + _linear(p["mlp"]["fc2"], act(h))


def vit_apply(params: dict, cfg: ViTConfig, pixels: jnp.ndarray
              ) -> jnp.ndarray:
    """pixels [B, H, W, C] (already normalized) -> CLS embedding
    [B, embed_dim]."""
    b = pixels.shape[0]
    p = cfg.patch_size
    patches = pixels.reshape(b, cfg.image_size // p, p,
                             cfg.image_size // p, p, 3)
    patches = patches.transpose(0, 1, 3, 2, 4, 5).reshape(
        b, cfg.num_patches, p * p * 3)
    x = _linear(params["patch"], patches.astype(jnp.float32))
    cls = jnp.broadcast_to(params["cls_token"], (b, 1, cfg.hidden_size))
    x = jnp.concatenate([cls, x], axis=1) + params["position"]

    if cfg.variant == "clip" or "ln_pre" in params:
        # explicit for the clip variant; optional for timm-layout towers
        # (dreamsim's clip-as-dino keeps CLIP's ln_pre as timm norm_pre)
        x = _ln(params["ln_pre"], x, cfg.layer_norm_eps)

    def body(x, lp):
        return _block(lp, x, cfg), None

    x, _ = jax.lax.scan(body, x, params["layers"])

    if cfg.variant == "clip":
        out = _ln(params["ln_post"], x[:, 0], cfg.layer_norm_eps)
        if "proj" in params:
            out = out @ params["proj"]
        return out
    out = _ln(params["post_ln"], x, cfg.layer_norm_eps)[:, 0]
    if "proj" in params:
        # dreamsim's clip-as-dino towers: a timm-layout ViT whose CLS
        # feature is sent through the retained CLIP visual projection
        out = out @ params["proj"]
    return out


# ---------------------------------------------------------------------------
# importers
# ---------------------------------------------------------------------------

def _np(t):
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _lin_np(state, name, dtype=jnp.float32):
    p = {"kernel": jnp.asarray(_np(state[f"{name}.weight"]).T, dtype)}
    if f"{name}.bias" in state:
        p["bias"] = jnp.asarray(_np(state[f"{name}.bias"]), dtype)
    return p


def _ln_np(state, name, dtype=jnp.float32):
    return {"scale": jnp.asarray(_np(state[f"{name}.weight"]), dtype),
            "bias": jnp.asarray(_np(state[f"{name}.bias"]), dtype)}


def _stack(items):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *items)


def _conv_to_linear(weight, dtype=jnp.float32):
    """[D, C, p, p] conv kernel -> [p*p*C, D] matmul kernel matching the
    (h, w, c)-ordered patch flattening in vit_apply."""
    w = _np(weight)                     # [D, C, p, p]
    w = w.transpose(2, 3, 1, 0)         # [p, p, C, D]
    return jnp.asarray(w.reshape(-1, w.shape[-1]), dtype)


def import_vit_hf(state: dict, cfg: ViTConfig, prefix: str = "vit"
                  ) -> dict:
    """transformers ViTModel state dict (DINO checkpoints are published in
    this layout, e.g. facebook/dino-vitb16) -> vit_apply params."""
    s = {k.removeprefix(f"{prefix}.") if k.startswith(f"{prefix}.")
         else k: v for k, v in state.items()}
    layers = []
    for i in range(cfg.num_hidden_layers):
        b = f"encoder.layer.{i}"
        layers.append({
            "ln1": _ln_np(s, f"{b}.layernorm_before"),
            "attn": {
                "q": _lin_np(s, f"{b}.attention.attention.query"),
                "k": _lin_np(s, f"{b}.attention.attention.key"),
                "v": _lin_np(s, f"{b}.attention.attention.value"),
                "o": _lin_np(s, f"{b}.attention.output.dense"),
            },
            "ln2": _ln_np(s, f"{b}.layernorm_after"),
            "mlp": {"fc1": _lin_np(s, f"{b}.intermediate.dense"),
                    "fc2": _lin_np(s, f"{b}.output.dense")},
        })
    return {
        "patch": {
            "kernel": _conv_to_linear(
                s["embeddings.patch_embeddings.projection.weight"]),
            "bias": jnp.asarray(
                _np(s["embeddings.patch_embeddings.projection.bias"]),
                jnp.float32),
        },
        "cls_token": jnp.asarray(_np(s["embeddings.cls_token"])[0],
                                 jnp.float32),
        "position": jnp.asarray(_np(s["embeddings.position_embeddings"])[0],
                                jnp.float32),
        "layers": _stack(layers),
        "post_ln": _ln_np(s, "layernorm"),
    }


def import_vit_timm(state: dict, cfg: ViTConfig) -> dict:
    """timm / DINO-repo / dreamsim-checkpoint naming (cls_token, pos_embed,
    blocks.{i}.attn.qkv, ...) -> vit_apply params."""
    layers = []
    for i in range(cfg.num_hidden_layers):
        b = f"blocks.{i}"
        qkv_w = _np(state[f"{b}.attn.qkv.weight"])
        qkv_b = _np(state[f"{b}.attn.qkv.bias"])
        qw, kw, vw = np.split(qkv_w, 3, axis=0)
        qb, kb, vb = np.split(qkv_b, 3, axis=0)
        layers.append({
            "ln1": _ln_np(state, f"{b}.norm1"),
            "attn": {
                "q": {"kernel": jnp.asarray(qw.T, jnp.float32),
                      "bias": jnp.asarray(qb, jnp.float32)},
                "k": {"kernel": jnp.asarray(kw.T, jnp.float32),
                      "bias": jnp.asarray(kb, jnp.float32)},
                "v": {"kernel": jnp.asarray(vw.T, jnp.float32),
                      "bias": jnp.asarray(vb, jnp.float32)},
                "o": _lin_np(state, f"{b}.attn.proj"),
            },
            "ln2": _ln_np(state, f"{b}.norm2"),
            "mlp": {"fc1": _lin_np(state, f"{b}.mlp.fc1"),
                    "fc2": _lin_np(state, f"{b}.mlp.fc2")},
        })
    params = {
        "patch": {
            "kernel": _conv_to_linear(state["patch_embed.proj.weight"]),
            "bias": jnp.asarray(_np(state["patch_embed.proj.bias"]),
                                jnp.float32),
        },
        "cls_token": jnp.asarray(_np(state["cls_token"])[0], jnp.float32),
        "position": jnp.asarray(_np(state["pos_embed"])[0], jnp.float32),
        "layers": _stack(layers),
        "post_ln": _ln_np(state, "norm"),
    }
    if "norm_pre.weight" in state:   # clip-as-dino keeps CLIP's ln_pre
        params["ln_pre"] = _ln_np(state, "norm_pre")
    if "proj" in state:              # retained CLIP visual projection
        params["proj"] = jnp.asarray(_np(state["proj"]), jnp.float32)
    return params


def import_clip_hf(state: dict, cfg: ViTConfig) -> dict:
    """transformers CLIPVisionModel(WithProjection) state dict ->
    vit_apply params (variant='clip')."""
    s = {k.removeprefix("vision_model."): v for k, v in state.items()}
    layers = []
    for i in range(cfg.num_hidden_layers):
        b = f"encoder.layers.{i}"
        layers.append({
            "ln1": _ln_np(s, f"{b}.layer_norm1"),
            "attn": {
                "q": _lin_np(s, f"{b}.self_attn.q_proj"),
                "k": _lin_np(s, f"{b}.self_attn.k_proj"),
                "v": _lin_np(s, f"{b}.self_attn.v_proj"),
                "o": _lin_np(s, f"{b}.self_attn.out_proj"),
            },
            "ln2": _ln_np(s, f"{b}.layer_norm2"),
            "mlp": {"fc1": _lin_np(s, f"{b}.mlp.fc1"),
                    "fc2": _lin_np(s, f"{b}.mlp.fc2")},
        })
    # HF spells it "pre_layrnorm" (sic)
    pre = "pre_layrnorm" if "pre_layrnorm.weight" in s else "pre_layernorm"
    params = {
        "patch": {
            "kernel": _conv_to_linear(
                s["embeddings.patch_embedding.weight"]),
        },
        "cls_token": jnp.asarray(_np(s["embeddings.class_embedding"]),
                                 jnp.float32).reshape(1, -1),
        "position": jnp.asarray(
            _np(s["embeddings.position_embedding.weight"]), jnp.float32),
        "ln_pre": _ln_np(s, pre),
        "layers": _stack(layers),
        "ln_post": _ln_np(s, "post_layernorm"),
    }
    if "embeddings.patch_embedding.bias" in s:
        params["patch"]["bias"] = jnp.asarray(
            _np(s["embeddings.patch_embedding.bias"]), jnp.float32)
    else:
        params["patch"]["bias"] = jnp.zeros((cfg.hidden_size,), jnp.float32)
    if "visual_projection.weight" in state:
        params["proj"] = jnp.asarray(
            _np(state["visual_projection.weight"]).T, jnp.float32)
    return params


# ---------------------------------------------------------------------------
# the ensemble metric
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class Extractor:
    params: dict
    cfg: ViTConfig
    mean: Tuple[float, float, float] = IMAGENET_MEAN
    std: Tuple[float, float, float] = IMAGENET_STD


class DreamSimJAX:
    """DreamSim-ensemble perceptual similarity, update/compute/reset API.

    ``update(img1, img2)`` accumulates ``1 - distance`` where distance is
    ``1 - cos`` over the per-extractor-normalized concatenated CLS
    embeddings -- the reference torch metric's exact computation
    (``detikzify/evaluate/dreamsim.py:67-86``)."""

    higher_is_better = True

    def __init__(self, extractors: Sequence[Extractor],
                 preprocess: bool = True):
        assert extractors
        self.extractors = list(extractors)
        self.preprocess = preprocess
        self._scores: List[float] = []

        def embed_one(ex: Extractor):
            mean = jnp.asarray(ex.mean)
            std = jnp.asarray(ex.std)

            @jax.jit
            def fn(params, pixels01):     # [B,H,W,C] in [0,1]
                e = vit_apply(params, ex.cfg, (pixels01 - mean) / std)
                return e / (jnp.linalg.norm(e, axis=-1, keepdims=True)
                            + 1e-8)

            return fn

        self._embed_fns = [embed_one(ex) for ex in self.extractors]

    def _pixels01(self, img, size: int) -> np.ndarray:
        from PIL import Image

        from ..utils.image import expand, load, remove_alpha, trim

        pil = load(img) if not isinstance(img, Image.Image) else img
        if self.preprocess:
            pil = expand(trim(remove_alpha(pil)), max(pil.size))
        pil = remove_alpha(pil).resize((size, size),
                                       Image.Resampling.BICUBIC)
        return np.asarray(pil, np.float32) / 255.0

    def embed(self, img) -> np.ndarray:
        """Concatenated per-model-normalized embedding of one image."""
        parts = []
        for ex, fn in zip(self.extractors, self._embed_fns):
            pixels = jnp.asarray(
                self._pixels01(img, ex.cfg.image_size))[None]
            parts.append(np.asarray(fn(ex.params, pixels))[0])
        return np.concatenate(parts)

    def similarity(self, img1, img2) -> float:
        e1, e2 = self.embed(img1), self.embed(img2)
        denom = (np.linalg.norm(e1) * np.linalg.norm(e2)) or 1.0
        return float(e1 @ e2 / denom)

    def update(self, img1, img2) -> None:
        if isinstance(img1, (list, tuple)) or isinstance(img2, (list, tuple)):
            assert len(img1) == len(img2)
            for a, b in zip(img1, img2):
                self.update(a, b)
            return
        # score += 1 - distance == cosine similarity
        self._scores.append(self.similarity(img1, img2))

    def compute(self) -> float:
        if not self._scores:
            raise RuntimeError("no updates")
        return float(np.mean(self._scores))

    def reset(self) -> None:
        self._scores = []


def _cfg_from_checkpoint(path: str, defaults: ViTConfig) -> ViTConfig:
    """Override backbone dims from the checkpoint's HF config.json when
    present (keeps tiny test checkpoints and non-base variants loadable);
    the ViT-B/16 defaults apply otherwise."""
    import json
    import os

    cfg_path = os.path.join(path if os.path.isdir(path)
                            else os.path.dirname(path), "config.json")
    if not os.path.exists(cfg_path):
        return defaults
    with open(cfg_path) as f:
        hf = json.load(f)
    hf = hf.get("vision_config", hf)   # CLIPVisionModel nests under this
    updates = {}
    for ours, theirs in (("hidden_size", "hidden_size"),
                         ("num_hidden_layers", "num_hidden_layers"),
                         ("num_attention_heads", "num_attention_heads"),
                         ("intermediate_size", "intermediate_size"),
                         ("patch_size", "patch_size"),
                         ("image_size", "image_size")):
        if theirs in hf:
            updates[ours] = hf[theirs]
    if defaults.variant == "clip" and "projection_dim" in hf:
        updates["proj_dim"] = hf["projection_dim"]
    return dataclasses.replace(defaults, **updates)


def from_checkpoints(dino_path: Optional[str] = None,
                     clip_path: Optional[str] = None,
                     open_clip_path: Optional[str] = None) -> DreamSimJAX:
    """Build the ensemble from local safetensors checkpoints of the three
    backbones (HF layouts: ViTModel for DINO, CLIPVisionModelWithProjection
    for CLIP/OpenCLIP). Pass only the backbones you have -- DreamSim's
    'single' variants use one."""
    from ..models.import_hf import load_state_dict_from_safetensors

    extractors = []
    if dino_path:
        cfg = _cfg_from_checkpoint(
            dino_path, ViTConfig(variant="vit", layer_norm_eps=1e-12))
        state = load_state_dict_from_safetensors(dino_path)
        extractors.append(Extractor(import_vit_hf(state, cfg), cfg,
                                    IMAGENET_MEAN, IMAGENET_STD))
    for path in (clip_path, open_clip_path):
        if path:
            cfg = _cfg_from_checkpoint(
                path, ViTConfig(variant="clip", hidden_act="quick_gelu",
                                layer_norm_eps=1e-5, proj_dim=512))
            state = load_state_dict_from_safetensors(path)
            extractors.append(Extractor(import_clip_hf(state, cfg), cfg,
                                        CLIP_MEAN, CLIP_STD))
    if not extractors:
        raise ValueError("at least one backbone checkpoint required")
    return DreamSimJAX(extractors)


# ---------------------------------------------------------------------------
# dreamsim-package merged checkpoints (the published LoRA-merged weights)
# ---------------------------------------------------------------------------

#: branch name -> (file keyword, per-branch input normalization). The
#: published ensemble (reference detikzify/evaluate/dreamsim.py:40-66 via
#: the ``dreamsim`` package) is DINO + CLIP + OpenCLIP ViT-B/16 towers,
#: all stored in timm/DINO naming after the package's *_as_dino wrapping;
#: the two CLIP towers carry a retained visual projection.
ENSEMBLE_BRANCHES = (
    ("dino_vitb16", (IMAGENET_MEAN, IMAGENET_STD)),
    ("clip_vitb16", (CLIP_MEAN, CLIP_STD)),
    ("open_clip_vitb16", (CLIP_MEAN, CLIP_STD)),
)


def import_dreamsim_merged(obj, cfg: Optional[ViTConfig] = None
                           ) -> Tuple[dict, ViTConfig]:
    """One LoRA-merged dreamsim tower (torch state dict, timm naming;
    either the raw state dict or ``{"model": sd, "proj": tensor}``) ->
    (``vit_apply`` params, inferred config). ``cfg`` defaults to the
    shapes read off the checkpoint (ViT-B/16 at 224 for the published
    ensemble)."""
    if isinstance(obj, dict) and "model" in obj and any(
            k.startswith("blocks.") for k in obj["model"]):
        state = dict(obj["model"])
        if "proj" in obj and obj["proj"] is not None:
            state["proj"] = obj["proj"]
    else:
        state = obj
    if cfg is None:
        n_layers = 1 + max(int(k.split(".")[1]) for k in state
                           if k.startswith("blocks."))
        hidden = _np(state["cls_token"]).shape[-1]
        heads = max(hidden // 64, 1)
        inter = _np(state["blocks.0.mlp.fc1.weight"]).shape[0]
        n_patches = _np(state["pos_embed"]).shape[1] - 1
        patch = _np(state["patch_embed.proj.weight"]).shape[-1]
        side = int(round(n_patches ** 0.5)) * patch
        cfg = ViTConfig(hidden_size=hidden, num_hidden_layers=n_layers,
                        num_attention_heads=heads,
                        intermediate_size=inter, patch_size=patch,
                        image_size=side, variant="vit",
                        layer_norm_eps=1e-6,
                        proj_dim=_np(state["proj"]).shape[-1]
                        if "proj" in state else None)
    return import_vit_timm(state, cfg), cfg


def from_dreamsim_checkpoint(paths: dict) -> "DreamSimJAX":
    """Build the ensemble straight from dreamsim-package merged ``.pth``
    files: ``paths`` maps branch name (see ENSEMBLE_BRANCHES) to a torch
    checkpoint path. Requires torch to deserialize; use
    ``tools/convert_dreamsim.py`` once + ``load_ensemble`` for the
    torch-free path."""
    import torch

    norm = dict(ENSEMBLE_BRANCHES)
    extractors = []
    for branch, path in paths.items():
        obj = torch.load(path, map_location="cpu", weights_only=True)
        params, cfg = import_dreamsim_merged(obj)
        mean, std = norm.get(branch, (IMAGENET_MEAN, IMAGENET_STD))
        extractors.append(Extractor(params, cfg, mean, std))
    return DreamSimJAX(extractors)


def _flatten(tree, prefix=""):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten(v, f"{prefix}{k}/")
    else:
        yield prefix[:-1], np.asarray(tree)


def _unflatten(flat: dict) -> dict:
    out: dict = {}
    for key, value in flat.items():
        node = out
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(value)
    return out


def save_ensemble(path: str, ds: "DreamSimJAX") -> dict:
    """Persist a converted ensemble torch-free: one ``.npz`` per branch +
    ``manifest.json`` (config, normalization, array sha256 per branch).
    Returns the manifest."""
    import hashlib
    import json
    import os

    os.makedirs(path, exist_ok=True)
    manifest = {"format": "detikzify_tpu.dreamsim.v1", "branches": []}
    for i, ex in enumerate(ds.extractors):
        flat = dict(_flatten(ex.params))
        fname = f"branch{i}.npz"
        np.savez(os.path.join(path, fname), **flat)
        digest = hashlib.sha256()
        for key in sorted(flat):
            digest.update(key.encode())
            digest.update(np.ascontiguousarray(flat[key]).tobytes())
        manifest["branches"].append({
            "file": fname,
            "sha256": digest.hexdigest(),
            "n_params": int(sum(v.size for v in flat.values())),
            "config": dataclasses.asdict(ex.cfg),
            "mean": list(ex.mean), "std": list(ex.std),
        })
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def load_ensemble(path: str) -> "DreamSimJAX":
    """Load a ``save_ensemble`` directory (no torch), verifying each
    branch's sha256 against the manifest."""
    import hashlib
    import json
    import os

    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    extractors = []
    for spec in manifest["branches"]:
        flat = dict(np.load(os.path.join(path, spec["file"])))
        digest = hashlib.sha256()
        for key in sorted(flat):
            digest.update(key.encode())
            digest.update(np.ascontiguousarray(flat[key]).tobytes())
        if digest.hexdigest() != spec["sha256"]:
            raise ValueError(
                f"{spec['file']}: sha256 mismatch vs manifest "
                f"(corrupted or tampered conversion)")
        cfg = ViTConfig(**spec["config"])
        extractors.append(Extractor(_unflatten(flat), cfg,
                                    tuple(spec["mean"]),
                                    tuple(spec["std"])))
    return DreamSimJAX(extractors)
