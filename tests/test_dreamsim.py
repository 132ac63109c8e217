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


# ---------------------------------------------------------------------------
# published-checkpoint conversion dry-run (round-4 VERDICT directive #7):
# synthesize a LoRA-merged ensemble AT THE REAL SHAPE (ViT-B/16 @ 224,
# dreamsim-package naming: timm state dicts, clip towers wrapped as-dino
# with retained visual projection) and push it through the FULL import
# path -- tools/convert_dreamsim.py -> manifest -> torch-free
# load_ensemble -- so the only networked step left is the download.
# ---------------------------------------------------------------------------

def _timm_b16_state(seed, *, norm_pre=False):
    g = torch.Generator().manual_seed(seed)

    def t(*shape, scale=0.02):
        return torch.randn(*shape, generator=g) * scale

    d, inter, layers, patch, npatch = 768, 3072, 12, 16, 196
    sd = {
        "cls_token": t(1, 1, d),
        "pos_embed": t(1, npatch + 1, d),
        "patch_embed.proj.weight": t(d, 3, patch, patch),
        "patch_embed.proj.bias": t(d),
        "norm.weight": torch.ones(d) + t(d),
        "norm.bias": t(d),
    }
    if norm_pre:
        sd["norm_pre.weight"] = torch.ones(d) + t(d)
        sd["norm_pre.bias"] = t(d)
    for i in range(layers):
        b = f"blocks.{i}"
        sd.update({
            f"{b}.norm1.weight": torch.ones(d) + t(d),
            f"{b}.norm1.bias": t(d),
            f"{b}.attn.qkv.weight": t(3 * d, d),
            f"{b}.attn.qkv.bias": t(3 * d),
            f"{b}.attn.proj.weight": t(d, d),
            f"{b}.attn.proj.bias": t(d),
            f"{b}.norm2.weight": torch.ones(d) + t(d),
            f"{b}.norm2.bias": t(d),
            f"{b}.mlp.fc1.weight": t(inter, d),
            f"{b}.mlp.fc1.bias": t(inter),
            f"{b}.mlp.fc2.weight": t(d, inter),
            f"{b}.mlp.fc2.bias": t(d),
        })
    return sd


def test_convert_dreamsim_checkpoint_dry_run(tmp_path):
    import json
    import subprocess
    import sys
    import os

    from detikzify_tpu.evaluate.dreamsim_jax import (
        import_dreamsim_merged, load_ensemble, vit_apply)

    src = tmp_path / "dreamsim_ck"
    src.mkdir()
    # the published ensemble's three branches, real shapes + naming
    torch.save(_timm_b16_state(0),
               src / "dino_vitb16_pretrain_lora_merged.pth")
    clip_sd = _timm_b16_state(1, norm_pre=True)
    torch.save({"model": clip_sd,
                "proj": torch.randn(768, 512,
                                    generator=torch.Generator()
                                    .manual_seed(2)) * 0.02},
               src / "clip_vitb16_pretrain_lora_merged.pth")
    oclip_sd = _timm_b16_state(3, norm_pre=True)
    oclip_sd["proj"] = torch.randn(
        768, 512, generator=torch.Generator().manual_seed(4)) * 0.02
    torch.save(oclip_sd,
               src / "open_clip_vitb16_pretrain_lora_merged.pth")

    out = tmp_path / "converted"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "convert_dreamsim.py"),
         "--input", str(src), "--output", str(out)],
        capture_output=True, text=True, timeout=900, cwd=repo,
        env=dict(os.environ, JAX_PLATFORMS="cpu"))
    assert proc.returncode == 0, proc.stderr[-3000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert [b["branch"] for b in summary["branches"]] == [
        "dino_vitb16", "clip_vitb16", "open_clip_vitb16"]
    for b in summary["branches"]:
        assert b["n_params"] > 80_000_000       # really ViT-B-sized
        assert len(b["source_sha256"]) == 64

    ds = load_ensemble(str(out))                # torch-free path
    assert len(ds.extractors) == 3
    # the two clip-as-dino towers kept ln_pre + visual projection
    assert "ln_pre" in ds.extractors[1].params
    assert ds.extractors[1].params["proj"].shape == (768, 512)
    assert ds.extractors[2].cfg.proj_dim == 512

    img1 = Image.new("RGB", (96, 96), "white")
    ImageDraw.Draw(img1).ellipse([10, 10, 80, 80], outline="black")
    img2 = Image.new("RGB", (96, 96), "white")
    ImageDraw.Draw(img2).rectangle([20, 20, 70, 70], outline="red")
    emb = ds.embed(img1)
    assert emb.shape == (768 + 512 + 512,)
    assert np.isfinite(emb).all()
    assert ds.similarity(img1, img1) == pytest.approx(1.0, abs=1e-5)
    assert ds.similarity(img1, img2) < 1.0

    # converted params match the direct in-memory import bit-for-bit
    direct, cfg = import_dreamsim_merged(_timm_b16_state(0))
    pix = np.zeros((1, 224, 224, 3), np.float32)
    a = np.asarray(vit_apply(direct, cfg, jnp.asarray(pix)))
    b = np.asarray(vit_apply(ds.extractors[0].params,
                             ds.extractors[0].cfg, jnp.asarray(pix)))
    np.testing.assert_array_equal(a, b)

    # manifest sha256 really guards the artifacts
    target = out / "branch0.npz"
    blob = bytearray(target.read_bytes())
    blob[len(blob) // 2] ^= 0xFF
    target.write_bytes(bytes(blob))
    with pytest.raises(Exception):
        load_ensemble(str(out))
