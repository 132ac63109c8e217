"""DreamSim JAX ensemble: golden tower parity vs transformers torch
implementations (ViTModel for the DINO layout, CLIPVisionModelWithProjection
for the CLIP layout) + ensemble metric behavior."""
import numpy as np
import jax.numpy as jnp
import pytest
import torch
from PIL import Image, ImageDraw

from detikzify_tpu.evaluate.dreamsim_jax import (DreamSimJAX, Extractor,
                                                 ViTConfig, import_clip_hf,
                                                 import_vit_hf,
                                                 import_vit_timm, vit_apply)

ATOL = 5e-4


def tiny_vit_cfg(**kw):
    return ViTConfig(hidden_size=32, num_hidden_layers=2,
                     num_attention_heads=4, intermediate_size=64,
                     patch_size=8, image_size=32, **kw)


def _pixels(rng, size):
    return rng.standard_normal((2, size, size, 3)).astype(np.float32)


def test_vit_parity_hf_vitmodel():
    import transformers

    torch.manual_seed(0)
    cfg = tiny_vit_cfg(variant="vit", layer_norm_eps=1e-12)
    hf_cfg = transformers.ViTConfig(
        hidden_size=cfg.hidden_size, num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        intermediate_size=cfg.intermediate_size, image_size=cfg.image_size,
        patch_size=cfg.patch_size)
    model = transformers.ViTModel(hf_cfg, add_pooling_layer=False).eval()

    pix = _pixels(np.random.default_rng(0), cfg.image_size)
    with torch.inference_mode():
        want = model(torch.from_numpy(pix.transpose(0, 3, 1, 2))
                     ).last_hidden_state[:, 0].numpy()

    params = import_vit_hf(model.state_dict(), cfg)
    got = np.asarray(vit_apply(params, cfg, jnp.asarray(pix)))
    np.testing.assert_allclose(got, want, atol=ATOL, rtol=1e-3)


def test_vit_parity_timm_naming():
    """timm/DINO-style state dict (packed qkv) maps to the same tower."""
    import transformers

    torch.manual_seed(1)
    cfg = tiny_vit_cfg(variant="vit", layer_norm_eps=1e-12)
    hf_cfg = transformers.ViTConfig(
        hidden_size=cfg.hidden_size, num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        intermediate_size=cfg.intermediate_size, image_size=cfg.image_size,
        patch_size=cfg.patch_size)
    model = transformers.ViTModel(hf_cfg, add_pooling_layer=False).eval()
    hf = model.state_dict()

    # build the timm-style dict from the HF weights
    timm = {
        "cls_token": hf["embeddings.cls_token"],
        "pos_embed": hf["embeddings.position_embeddings"],
        "patch_embed.proj.weight":
            hf["embeddings.patch_embeddings.projection.weight"],
        "patch_embed.proj.bias":
            hf["embeddings.patch_embeddings.projection.bias"],
        "norm.weight": hf["layernorm.weight"],
        "norm.bias": hf["layernorm.bias"],
    }
    for i in range(cfg.num_hidden_layers):
        h, t = f"encoder.layer.{i}", f"blocks.{i}"
        timm[f"{t}.norm1.weight"] = hf[f"{h}.layernorm_before.weight"]
        timm[f"{t}.norm1.bias"] = hf[f"{h}.layernorm_before.bias"]
        timm[f"{t}.attn.qkv.weight"] = torch.cat(
            [hf[f"{h}.attention.attention.{n}.weight"]
             for n in ("query", "key", "value")])
        timm[f"{t}.attn.qkv.bias"] = torch.cat(
            [hf[f"{h}.attention.attention.{n}.bias"]
             for n in ("query", "key", "value")])
        timm[f"{t}.attn.proj.weight"] = hf[f"{h}.attention.output.dense.weight"]
        timm[f"{t}.attn.proj.bias"] = hf[f"{h}.attention.output.dense.bias"]
        timm[f"{t}.norm2.weight"] = hf[f"{h}.layernorm_after.weight"]
        timm[f"{t}.norm2.bias"] = hf[f"{h}.layernorm_after.bias"]
        timm[f"{t}.mlp.fc1.weight"] = hf[f"{h}.intermediate.dense.weight"]
        timm[f"{t}.mlp.fc1.bias"] = hf[f"{h}.intermediate.dense.bias"]
        timm[f"{t}.mlp.fc2.weight"] = hf[f"{h}.output.dense.weight"]
        timm[f"{t}.mlp.fc2.bias"] = hf[f"{h}.output.dense.bias"]

    pix = _pixels(np.random.default_rng(1), cfg.image_size)
    with torch.inference_mode():
        want = model(torch.from_numpy(pix.transpose(0, 3, 1, 2))
                     ).last_hidden_state[:, 0].numpy()
    got = np.asarray(vit_apply(import_vit_timm(timm, cfg), cfg,
                               jnp.asarray(pix)))
    np.testing.assert_allclose(got, want, atol=ATOL, rtol=1e-3)


def test_clip_parity_hf():
    import transformers

    torch.manual_seed(2)
    cfg = tiny_vit_cfg(variant="clip", hidden_act="quick_gelu",
                       layer_norm_eps=1e-5, proj_dim=16)
    hf_cfg = transformers.CLIPVisionConfig(
        hidden_size=cfg.hidden_size, num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        intermediate_size=cfg.intermediate_size, image_size=cfg.image_size,
        patch_size=cfg.patch_size, projection_dim=cfg.proj_dim,
        hidden_act="quick_gelu")
    model = transformers.CLIPVisionModelWithProjection(hf_cfg).eval()

    pix = _pixels(np.random.default_rng(2), cfg.image_size)
    with torch.inference_mode():
        want = model(torch.from_numpy(pix.transpose(0, 3, 1, 2))
                     ).image_embeds.numpy()
    params = import_clip_hf(model.state_dict(), cfg)
    got = np.asarray(vit_apply(params, cfg, jnp.asarray(pix)))
    np.testing.assert_allclose(got, want, atol=ATOL, rtol=1e-3)


def test_dreamsim_ensemble_metric():
    """Ensemble metric: identical images score 1.0; different images score
    lower; embeddings concatenate across backbones."""
    import transformers

    torch.manual_seed(3)
    vit_cfg = tiny_vit_cfg(variant="vit", layer_norm_eps=1e-12)
    clip_cfg = tiny_vit_cfg(variant="clip", hidden_act="quick_gelu",
                            layer_norm_eps=1e-5, proj_dim=16)
    vit = transformers.ViTModel(transformers.ViTConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, image_size=32, patch_size=8),
        add_pooling_layer=False).eval()
    clip = transformers.CLIPVisionModelWithProjection(
        transformers.CLIPVisionConfig(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=64, image_size=32, patch_size=8,
            projection_dim=16, hidden_act="quick_gelu")).eval()

    metric = DreamSimJAX([
        Extractor(import_vit_hf(vit.state_dict(), vit_cfg), vit_cfg),
        Extractor(import_clip_hf(clip.state_dict(), clip_cfg), clip_cfg),
    ])
    img1 = Image.new("RGB", (32, 32), "white")
    ImageDraw.Draw(img1).rectangle([4, 4, 27, 27], outline="black", width=2)
    img2 = Image.new("RGB", (32, 32), "white")
    ImageDraw.Draw(img2).ellipse([2, 10, 29, 22], fill="blue")

    assert metric.embed(img1).shape == (32 + 16,)
    metric.update(img1, img1.copy())
    same = metric.compute()
    metric.reset()
    metric.update([img1], [img2])
    diff = metric.compute()
    assert same == pytest.approx(1.0, abs=1e-5)
    assert diff < same
