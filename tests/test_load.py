"""Checkpoint IO tests: save_pretrained -> import round trip, registry."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from detikzify_tpu.config import tiny_test_config
from detikzify_tpu.models import detikzify, import_hf
from detikzify_tpu.models.load import (MODEL_REGISTRY, _resolve, register,
                                       save_pretrained)


def test_save_import_roundtrip(tmp_path):
    cfg = tiny_test_config(vocab_size=128)
    params = detikzify.init(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "ckpt")
    save_pretrained(path, params, cfg)

    cfg2 = import_hf.config_from_hf_json(f"{path}/config.json")
    assert cfg2.vision.hidden_size == cfg.vision.hidden_size
    assert cfg2.text.num_key_value_heads == cfg.text.num_key_value_heads
    # the declared SelfSim mode survives the round trip (a dropped key
    # would silently flip ImageSim.from_detikzify to the "emd" fallback)
    assert cfg2.pooling_mode == cfg.pooling_mode == "cos"

    state = import_hf.load_state_dict_from_safetensors(path)
    params2 = import_hf.import_detikzify(state, cfg2, dtype=jnp.float32)

    ids = np.full((1, cfg.image_seq_len + 4), cfg.image_token_id, np.int32)
    ids[0, cfg.image_seq_len:] = [cfg.bos_token_id, 5, 6, 7]
    pix = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, cfg.vision.image_size, cfg.vision.image_size, 3)), jnp.float32)
    logits1, _ = detikzify.forward(params, cfg, jnp.asarray(ids), pix,
                                   attn_impl="xla")
    logits2, _ = detikzify.forward(params2, cfg2, jnp.asarray(ids), pix,
                                   attn_impl="xla")
    np.testing.assert_allclose(np.asarray(logits1), np.asarray(logits2),
                               atol=1e-5, rtol=1e-4)


def test_registry(tmp_path):
    register("my-model", str(tmp_path))
    assert _resolve("my-model") == str(tmp_path)
    assert "detikzify-v2-8b" in MODEL_REGISTRY
    # full reference zoo (reference model/v1/__init__.py:10-15 + webui)
    for name in ("detikzify-v2.5-8b", "detikzify-ds-1.3b",
                 "detikzify-ds-7b", "detikzify-tl-1.1b",
                 "detikzify-cl-7b"):
        assert name in MODEL_REGISTRY
    with pytest.raises(FileNotFoundError):
        _resolve("nonexistent/model")


def test_full_load_path_with_tokenizer(tmp_path):
    """End-to-end load(): config + safetensors + a real HF tokenizer dir."""
    transformers = pytest.importorskip("transformers")
    from tokenizers import Tokenizer, models, pre_tokenizers

    cfg = tiny_test_config(vocab_size=128)
    params = detikzify.init(jax.random.PRNGKey(5), cfg)
    path = str(tmp_path / "ckpt")
    save_pretrained(path, params, cfg)

    # build a tiny word-level tokenizer on disk
    vocab = {f"tok{i}": i for i in range(120)}
    vocab.update({"<s>": cfg.bos_token_id - 0, "</s>": cfg.eos_token_id,
                  "<image>": cfg.image_token_id, "<pad>": 120})
    tok = Tokenizer(models.WordLevel(
        {k: v for k, v in vocab.items() if v < 128}, unk_token="tok0"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    fast = transformers.PreTrainedTokenizerFast(
        tokenizer_object=tok, bos_token="<s>", eos_token="</s>",
        pad_token="<pad>", model_max_length=96)
    fast.save_pretrained(path)

    from detikzify_tpu.models.load import load

    params2, cfg2, processor = load(path, dtype=jnp.float32)
    out = processor(images=None, text="tok1 tok2")
    assert out.input_ids.shape[0] == 1
    ids = np.full((1, cfg2.image_seq_len + 3), cfg2.image_token_id, np.int32)
    ids[0, cfg2.image_seq_len:] = [cfg2.bos_token_id, 1, 2]
    logits, _ = detikzify.forward(params2, cfg2, jnp.asarray(ids), None,
                                  attn_impl="xla")
    assert np.isfinite(np.asarray(logits)).all()


def test_image_stats_from_preprocessor_config(tmp_path):
    """Checkpoint-local image_mean/std in preprocessor_config.json are
    honored (v1 towers may not be 0.5/0.5)."""
    import json

    from PIL import Image

    cfg = tiny_test_config(vocab_size=128)
    params = detikzify.init(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "ckpt")
    save_pretrained(path, params, cfg)
    with open(f"{path}/preprocessor_config.json", "w") as f:
        json.dump({"image_mean": [0.4, 0.4, 0.4],
                   "image_std": [0.2, 0.2, 0.2]}, f)

    from tokenizers import Tokenizer, models, pre_tokenizers
    import transformers

    tok = Tokenizer(models.WordLevel({"a": 0, "b": 1}, unk_token="a"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    transformers.PreTrainedTokenizerFast(
        tokenizer_object=tok, model_max_length=64).save_pretrained(path)

    from detikzify_tpu.models.load import load

    _, _, processor = load(path, dtype=jnp.float32)
    assert processor.image_mean == [0.4, 0.4, 0.4]
    out = processor(images=Image.new("RGB", (42, 42), "white"))
    # white pixel: (1.0 - 0.4) / 0.2 = 3.0
    np.testing.assert_allclose(out.pixel_values[0, 0, 0], 3.0, atol=1e-5)
