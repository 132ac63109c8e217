"""v1 legacy model family tests (LLaVA-style, timm vision tower)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from detikzify_tpu.config import VisionConfig, tiny_test_config
from detikzify_tpu.models import detikzify, import_hf, siglip


def _timm_state(cfg: VisionConfig, rng):
    """Synthetic timm-format SigLIP ViT state dict."""
    d, i, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_hidden_layers
    p, c = cfg.patch_size, cfg.num_channels
    s = {}

    def lin(name, din, dout):
        s[f"{name}.weight"] = rng.standard_normal(
            (dout, din)).astype(np.float32) * 0.05
        s[f"{name}.bias"] = rng.standard_normal(
            (dout,)).astype(np.float32) * 0.01

    def ln(name, dim):
        s[f"{name}.weight"] = np.ones((dim,), np.float32)
        s[f"{name}.bias"] = np.zeros((dim,), np.float32)

    s["patch_embed.proj.weight"] = rng.standard_normal(
        (d, c, p, p)).astype(np.float32) * 0.05
    s["patch_embed.proj.bias"] = np.zeros((d,), np.float32)
    s["pos_embed"] = rng.standard_normal(
        (1, cfg.num_patches, d)).astype(np.float32) * 0.02
    for idx in range(L):
        ln(f"blocks.{idx}.norm1", d)
        lin(f"blocks.{idx}.attn.qkv", d, 3 * d)
        lin(f"blocks.{idx}.attn.proj", d, d)
        ln(f"blocks.{idx}.norm2", d)
        lin(f"blocks.{idx}.mlp.fc1", d, i)
        lin(f"blocks.{idx}.mlp.fc2", i, d)
    ln("norm", d)
    return s


def test_import_timm_vision_runs():
    cfg = VisionConfig(hidden_size=48, intermediate_size=96,
                       num_hidden_layers=2, num_attention_heads=4,
                       image_size=42, patch_size=14)
    rng = np.random.default_rng(0)
    params = import_hf.import_timm_vision(_timm_state(cfg, rng), cfg,
                                          dtype=jnp.float32)
    pix = jnp.asarray(rng.standard_normal((1, 42, 42, 3)), jnp.float32)
    out = siglip.apply(params, cfg, pix, attn_impl="xla")
    assert out["last_hidden_state"].shape == (1, cfg.num_patches, 48)


def test_v1_feature_layer_and_truncation():
    """feature_layer taps an intermediate layer; 16 patches with concat 3
    -> image_seq_len 5, front patch truncated (reference v1:132-137)."""
    base = tiny_test_config(vocab_size=128)
    cfg = base.replace(
        vision=base.vision.replace(image_size=56),   # 16 patches
        feature_layer=0, projector_bias=True, is_v1=True)
    assert cfg.image_seq_len == 5
    params = detikzify.init(jax.random.PRNGKey(0), cfg)
    assert "bias" in params.connector["proj"]

    pix = jnp.asarray(np.random.default_rng(1).standard_normal(
        (1, 56, 56, 3)), jnp.float32)
    emb = detikzify.encode_image(params, cfg, pix)
    assert emb.shape == (1, 5, cfg.text.hidden_size)

    # tapping a different layer changes features
    cfg2 = cfg.replace(feature_layer=1)
    emb2 = detikzify.encode_image(params, cfg2, pix)
    assert float(jnp.abs(emb - emb2).max()) > 1e-5


def test_v1_config_from_hf_json():
    hf = {
        "architectures": ["DetikzifyForCausalLM"],
        "vocab_size": 32002, "hidden_size": 2048,
        "intermediate_size": 5632, "num_hidden_layers": 22,
        "num_attention_heads": 32, "num_key_value_heads": 4,
        "patch_token_id": 32000, "concat_patches": 3, "feature_layer": 26,
        "rope_theta": 10000.0,
    }
    cfg = import_hf.config_from_hf_json(hf)
    assert cfg.is_v1 and cfg.projector_bias
    assert cfg.image_token_id == 32000
    assert cfg.feature_layer == 26
    assert cfg.text.num_key_value_heads == 4
    assert cfg.vision.image_size == 384


def test_import_v1_full():
    base = tiny_test_config(vocab_size=128)
    cfg = base.replace(feature_layer=1, projector_bias=True, is_v1=True)
    rng = np.random.default_rng(2)
    vstate = _timm_state(cfg.vision, rng)
    d_in = cfg.projection_in
    state = {
        "model.mm_projector.weight": rng.standard_normal(
            (cfg.text.hidden_size, d_in)).astype(np.float32) * 0.05,
        "model.mm_projector.bias": np.zeros((cfg.text.hidden_size,),
                                            np.float32),
        "model.embed_tokens.weight": rng.standard_normal(
            (128, 64)).astype(np.float32) * 0.02,
        "model.norm.weight": np.ones((64,), np.float32),
        "lm_head.weight": rng.standard_normal((128, 64)).astype(
            np.float32) * 0.02,
    }
    for i in range(2):
        b = f"model.layers.{i}"
        state[f"{b}.input_layernorm.weight"] = np.ones((64,), np.float32)
        state[f"{b}.post_attention_layernorm.weight"] = np.ones(
            (64,), np.float32)
        for n, shp in (("q_proj", (64, 64)), ("k_proj", (32, 64)),
                       ("v_proj", (32, 64)), ("o_proj", (64, 64))):
            state[f"{b}.self_attn.{n}.weight"] = rng.standard_normal(
                shp).astype(np.float32) * 0.05
        for n, shp in (("gate_proj", (128, 64)), ("up_proj", (128, 64)),
                       ("down_proj", (64, 128))):
            state[f"{b}.mlp.{n}.weight"] = rng.standard_normal(
                shp).astype(np.float32) * 0.05
    params = import_hf.import_v1(state, vstate, cfg, dtype=jnp.float32)

    ids = np.full((1, cfg.image_seq_len + 3), cfg.image_token_id, np.int32)
    ids[0, cfg.image_seq_len:] = [cfg.bos_token_id, 5, 6]
    pix = jnp.asarray(rng.standard_normal((1, 42, 42, 3)), jnp.float32)
    logits, _ = detikzify.forward(params, cfg, jnp.asarray(ids), pix,
                                  attn_impl="xla")
    assert logits.shape == (1, ids.shape[1], 128)
    assert np.isfinite(np.asarray(logits)).all()


def test_v1_pipeline_mcts_end_to_end():
    """Compose the v1 legacy family with the FULL inference stack
    (BASELINE tracked config #1 shape): feature-layer tap + biased
    projector through the engine, SelfSim metric resolving the v1
    ``pooling_mode="cos"``, MCTS simulate + one-shot sample against the
    hermetic compiler. The reference drives v1 checkpoints through the
    same Pipeline/Generator path (model/v1/__init__.py:24-56,
    infer/generate.py:356-467)."""
    from detikzify_tpu.infer import DetikzifyPipeline, FakeBackend, \
        set_backend
    from detikzify_tpu.infer.tikz import TikzDocument
    from detikzify_tpu.processing import ByteTokenizer, DetikzifyProcessor
    from PIL import Image, ImageDraw

    base = tiny_test_config(vocab_size=512)
    cfg = base.replace(feature_layer=0, projector_bias=True, is_v1=True,
                       pooling_mode="cos")
    params = detikzify.init(jax.random.PRNGKey(3), cfg)
    tok = ByteTokenizer(vocab_size=512, image_token_id=cfg.image_token_id,
                        bos_token_id=cfg.bos_token_id,
                        eos_token_id=cfg.eos_token_id, model_max_length=96)
    set_backend(FakeBackend())
    try:
        pipe = DetikzifyPipeline(params, cfg,
                                 DetikzifyProcessor(tok, cfg),
                                 num_slots=2, max_len=96, metric="model")
        # v1 pooling_mode resolves to pooled-cos SelfSim
        assert pipe.metric.mode == "cos"
        img = Image.new("RGB", (80, 60), "white")
        ImageDraw.Draw(img).rectangle([5, 5, 75, 55], outline="black")
        doc = pipe.sample(image=img)
        assert isinstance(doc, TikzDocument)
        results = list(pipe.simulate(image=img, expansions=3))
        assert len(results) == 3
        for score, rdoc in results:
            assert isinstance(rdoc, TikzDocument)
            if rdoc.is_rasterizable:
                assert -1.0 <= score <= 1.0
            else:
                assert score == -1
        assert pipe.engine.num_free_slots == pipe.engine.num_slots
    finally:
        set_backend(None)
