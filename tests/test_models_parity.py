"""Golden parity tests: JAX towers vs torch/transformers on tiny random models.

The reference runs on transformers' SiglipVisionModel + LlamaForCausalLM
(reference ``detikzify/model/modeling_detikzify.py:125-127,251-260``). These
tests build tiny torch models, export their state_dicts through our importer,
and require logits to match within fp32 tolerance.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from detikzify_tpu.config import TextConfig, VisionConfig  # noqa: E402
from detikzify_tpu.models import import_hf, llama, siglip  # noqa: E402


def _to_np(state_dict):
    return {k: v.detach().cpu().numpy() for k, v in state_dict.items()}


@pytest.fixture(scope="module")
def torch_siglip():
    from transformers import SiglipVisionConfig, SiglipVisionModel

    torch.manual_seed(0)
    cfg = SiglipVisionConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, image_size=56, patch_size=14,
        num_channels=3)
    model = SiglipVisionModel(cfg).eval()
    return model, cfg


def test_siglip_parity(torch_siglip):
    model, tcfg = torch_siglip
    cfg = VisionConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, image_size=56, patch_size=14)

    rng = np.random.default_rng(0)
    pixels = rng.standard_normal((2, 3, 56, 56)).astype(np.float32)

    with torch.no_grad():
        out = model(pixel_values=torch.from_numpy(pixels))
    ref_hidden = out.last_hidden_state.numpy()
    ref_pooled = out.pooler_output.numpy()

    src = import_hf._Src(_to_np(model.state_dict()))
    params = import_hf.import_vision(src, cfg, dtype=jnp.float32)
    got = siglip.apply(params, cfg,
                       jnp.asarray(np.transpose(pixels, (0, 2, 3, 1))),
                       attn_impl="xla")

    np.testing.assert_allclose(np.asarray(got["last_hidden_state"]),
                               ref_hidden, atol=2e-4, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(got["pooler_output"]),
                               ref_pooled, atol=2e-4, rtol=2e-3)


@pytest.fixture(scope="module")
def torch_llama():
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(1)
    cfg = LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0,
        rms_norm_eps=1e-5, attention_bias=False, tie_word_embeddings=False)
    model = LlamaForCausalLM(cfg).eval()
    return model, cfg


def test_llama_parity(torch_llama):
    model, tcfg = torch_llama
    cfg = TextConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0, rms_norm_eps=1e-5)

    rng = np.random.default_rng(1)
    tokens = rng.integers(0, 256, size=(2, 17))

    with torch.no_grad():
        ref = model(input_ids=torch.from_numpy(tokens)).logits.numpy()

    state = {k.removeprefix("model."): v
             for k, v in _to_np(model.state_dict()).items()}
    # importer expects text_model.* naming (reference module paths)
    state = {("text_model." + k if not k.startswith("lm_head") else k): v
             for k, v in state.items()}
    src = import_hf._Src(state)
    params = import_hf.import_text(src, cfg, dtype=jnp.float32)

    embeds = llama.embed(params, jnp.asarray(tokens))
    hidden = llama.forward(params, cfg, embeds, attn_impl="xla")
    logits = llama.unembed(params, hidden)

    np.testing.assert_allclose(np.asarray(logits), ref, atol=3e-4, rtol=2e-3)


def test_llama_prefill_decode_matches_forward(torch_llama):
    """Cache path (prefill + decode_step) must agree with the full forward."""
    cfg = TextConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0, rms_norm_eps=1e-5)
    import jax

    params = llama.init(jax.random.PRNGKey(0), cfg)
    tokens = np.random.default_rng(2).integers(0, 256, size=(2, 12))

    embeds = llama.embed(params, jnp.asarray(tokens))
    full_hidden = llama.forward(params, cfg, embeds, attn_impl="xla")
    full_logits = llama.unembed(params, full_hidden)

    cache = llama.init_cache(cfg, batch=2, max_len=32, dtype=jnp.float32)
    prefix = 8
    start = jnp.zeros((2,), jnp.int32)
    seq_len = jnp.full((2,), prefix, jnp.int32)
    hidden, cache = llama.prefill(params, cfg, embeds[:, :prefix], start,
                                  seq_len, cache, attn_impl="xla")
    logits_pre = llama.unembed(params, hidden)
    np.testing.assert_allclose(np.asarray(logits_pre),
                               np.asarray(full_logits[:, :prefix]),
                               atol=1e-4, rtol=1e-3)

    for i in range(prefix, tokens.shape[1]):
        step_hidden, cache = llama.decode_step(
            params, cfg, embeds[:, i],
            jnp.full((2,), i, jnp.int32), cache)
        step_logits = llama.unembed(params, step_hidden)
        np.testing.assert_allclose(np.asarray(step_logits),
                                   np.asarray(full_logits[:, i]),
                                   atol=1e-4, rtol=1e-3)


def test_prefill_with_offset_matches_forward():
    """Prefix-restore + tail-prefill (MCTS prefix reuse) must be consistent."""
    import jax

    cfg = TextConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rope_theta=10000.0)
    params = llama.init(jax.random.PRNGKey(3), cfg)
    tokens = np.random.default_rng(3).integers(0, 128, size=(1, 14))
    embeds = llama.embed(params, jnp.asarray(tokens))

    full_hidden = llama.forward(params, cfg, embeds, attn_impl="xla")
    full_logits = llama.unembed(params, full_hidden)

    cache = llama.init_cache(cfg, batch=1, max_len=32, dtype=jnp.float32)
    # prefill first 6 tokens at offset 0, then next 8 at offset 6
    _, cache = llama.prefill(params, cfg, embeds[:, :6],
                             jnp.array([0]), jnp.array([6]), cache,
                             attn_impl="xla")
    hidden, cache = llama.prefill(params, cfg, embeds[:, 6:],
                                  jnp.array([6]), jnp.array([8]), cache,
                                  attn_impl="xla")
    logits = llama.unembed(params, hidden)
    np.testing.assert_allclose(np.asarray(logits),
                               np.asarray(full_logits[:, 6:]),
                               atol=1e-4, rtol=1e-3)
