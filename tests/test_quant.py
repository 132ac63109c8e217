"""Int8 weight-only quantization tests."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from detikzify_tpu.config import tiny_test_config
from detikzify_tpu.engine import DecodeEngine
from detikzify_tpu.models import detikzify
from detikzify_tpu.ops.quant import (dequant_matmul, params_nbytes,
                                     quantize_kernel, quantize_params)
from detikzify_tpu.ops.sampling import SamplingParams


def test_quantize_kernel_roundtrip():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((64, 32)), jnp.float32)
    q = quantize_kernel(w)
    assert q["q"].dtype == jnp.int8
    recon = q["q"].astype(jnp.float32) * q["scale"]
    rel = float(jnp.abs(recon - w).max() / jnp.abs(w).max())
    assert rel < 0.01   # per-channel int8: <1% peak error

    x = jnp.asarray(rng.standard_normal((4, 64)), jnp.float32)
    got = dequant_matmul(x, q)
    want = x @ w
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=0.05 * float(jnp.abs(want).max()))


def test_quantize_params_structure_and_size():
    cfg = tiny_test_config(vocab_size=128)
    params = detikzify.init(jax.random.PRNGKey(0), cfg)
    qparams = quantize_params(params)
    # stacked text kernels quantized
    assert "kernel_q" in qparams.text["layers"]["attn"]["q"]
    assert qparams.text["layers"]["attn"]["q"]["kernel_q"]["q"].dtype \
        == jnp.int8
    assert "kernel_q" in qparams.text["lm_head"]
    # norms/embeddings untouched
    assert "scale" in qparams.text["norm"]
    assert qparams.text["embed_tokens"].dtype == params.text[
        "embed_tokens"].dtype
    assert params_nbytes(qparams) < params_nbytes(params)


def test_quantized_forward_close_and_engine_runs():
    cfg = tiny_test_config(vocab_size=128)
    params = detikzify.init(jax.random.PRNGKey(0), cfg)
    qparams = quantize_params(params)

    ids = np.full((1, cfg.image_seq_len + 5), cfg.image_token_id, np.int32)
    ids[0, cfg.image_seq_len:] = [cfg.bos_token_id, 5, 6, 7, 8]
    logits_f, _ = detikzify.forward(params, cfg, jnp.asarray(ids), None,
                                    attn_impl="xla")
    logits_q, _ = detikzify.forward(qparams, cfg, jnp.asarray(ids), None,
                                    attn_impl="xla")
    # top-1 agreement on most positions (weight-only int8 is near-lossless)
    agree = (np.asarray(logits_f.argmax(-1))
             == np.asarray(logits_q.argmax(-1))).mean()
    assert agree >= 0.8

    eng = DecodeEngine(qparams, cfg, num_slots=2, max_len=64,
                       sampling=SamplingParams(temperature=0.0))
    ro = eng.start([cfg.bos_token_id, 5, 6], max_new_tokens=6)
    eng.run()
    assert ro.new_tokens >= 1


def test_quantize_params_host_matches_device():
    from detikzify_tpu.ops.quant import quantize_params_host

    cfg = tiny_test_config(vocab_size=128)
    params = detikzify.init(jax.random.PRNGKey(1), cfg)
    q_dev = quantize_params(params)
    q_host = quantize_params_host(params)
    kd = np.asarray(q_dev.text["layers"]["attn"]["q"]["kernel_q"]["q"])
    kh = np.asarray(q_host.text["layers"]["attn"]["q"]["kernel_q"]["q"])
    # identical per-channel int8 up to rounding ties at .5 boundaries
    assert (kd == kh).mean() > 0.999
    sd = np.asarray(q_dev.text["layers"]["attn"]["q"]["kernel_q"]["scale"])
    sh = np.asarray(q_host.text["layers"]["attn"]["q"]["kernel_q"]["scale"])
    np.testing.assert_allclose(sd, sh, rtol=1e-6)


def test_load_quantize(tmp_path):
    from detikzify_tpu.models.load import save_pretrained
    from detikzify_tpu.models import import_hf
    from detikzify_tpu.ops.quant import quantize_params_host

    cfg = tiny_test_config(vocab_size=128)
    params = detikzify.init(jax.random.PRNGKey(2), cfg)
    path = str(tmp_path / "ckpt")
    save_pretrained(path, params, cfg)
    # exercise the host-quantized import path (load() needs a tokenizer on
    # disk, so drive the pieces it composes)
    state = import_hf.load_state_dict_from_safetensors(path)
    imported = import_hf.import_detikzify(state, cfg, dtype=jnp.float32)
    qparams = quantize_params_host(imported)
    ids = np.full((1, cfg.image_seq_len + 4), cfg.image_token_id, np.int32)
    ids[0, cfg.image_seq_len:] = [cfg.bos_token_id, 3, 4, 5]
    lf, _ = detikzify.forward(imported, cfg, jnp.asarray(ids), None,
                              attn_impl="xla")
    lq, _ = detikzify.forward(qparams, cfg, jnp.asarray(ids), None,
                              attn_impl="xla")
    agree = (np.asarray(lf.argmax(-1)) == np.asarray(lq.argmax(-1))).mean()
    assert agree >= 0.8


def test_int8_gemv_pallas_matches_xla():
    """The fused dequant GEMV kernel (interpret mode off-TPU) must match
    the XLA dequant path bit-for-bit-ish (same bf16 operands, f32 acc)."""
    import jax.numpy as jnp

    from detikzify_tpu.ops.quant import quantize_kernel
    from detikzify_tpu.ops.quant_matmul import int8_matmul

    rng = np.random.default_rng(0)
    for b, k, n in [(8, 256, 384), (1, 128, 128), (16, 512, 256)]:
        x = jnp.asarray(rng.standard_normal((b, k)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((k, n)), jnp.float32)
        qd = quantize_kernel(w)
        want = np.asarray(int8_matmul(x, qd["q"], qd["scale"]))
        got = np.asarray(int8_matmul(x, qd["q"], qd["scale"],
                                     force_pallas=True, interpret=True))
        np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)

    # ineligible shapes (vocab-sized N not multiple of tile) fall back
    x = jnp.asarray(rng.standard_normal((4, 128)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((128, 130)), jnp.float32)
    qd = quantize_kernel(w)
    out = int8_matmul(x, qd["q"], qd["scale"], force_pallas=True)
    assert out.shape == (4, 130)


def test_fuse_projections_exact():
    """Packed qkv / gate-up must reproduce the unfused model exactly
    (bf16/full precision) and near-exactly (int8) across forward, prefill,
    and block decode."""
    import jax
    import jax.numpy as jnp

    from detikzify_tpu.config import tiny_test_config
    from detikzify_tpu.engine import DecodeEngine
    from detikzify_tpu.models import detikzify
    from detikzify_tpu.ops.quant import fuse_projections, quantize_params
    from detikzify_tpu.ops.sampling import SamplingParams

    cfg = tiny_test_config(vocab_size=256)
    params = detikzify.init(jax.random.PRNGKey(0), cfg)
    fused = fuse_projections(params)
    assert "qkv" in fused.text["layers"]["attn"]
    assert "gateup" in fused.text["layers"]["mlp"]
    assert "q" not in fused.text["layers"]["attn"]

    ids = np.full((1, cfg.image_seq_len + 6), cfg.image_token_id, np.int32)
    ids[0, cfg.image_seq_len:] = [cfg.bos_token_id, 5, 6, 7, 8, 9]
    pix = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, cfg.vision.image_size, cfg.vision.image_size, 3)), jnp.float32)
    l0, _ = detikzify.forward(params, cfg, jnp.asarray(ids), pix,
                              attn_impl="xla")
    l1, _ = detikzify.forward(fused, cfg, jnp.asarray(ids), pix,
                              attn_impl="xla")
    np.testing.assert_allclose(np.asarray(l0), np.asarray(l1),
                               atol=1e-5, rtol=1e-4)

    # greedy engine rollout equality (covers prefill + decode paths)
    prompt = [cfg.bos_token_id, 11, 12, 13]
    outs = []
    for p in (params, fused):
        eng = DecodeEngine(p, cfg, num_slots=2, max_len=64,
                           sampling=SamplingParams(temperature=0.0))
        ro = eng.start(prompt, max_new_tokens=8)
        eng.run()
        outs.append(list(ro.token_ids))
    assert outs[0] == outs[1]

    # int8: per-output-channel scales concatenate losslessly, so
    # quantize-then-fuse == fuse-then-quantize
    qf = fuse_projections(quantize_params(params))
    fq = quantize_params(fuse_projections(params))
    a = np.asarray(qf.text["layers"]["attn"]["qkv"]["kernel_q"]["q"])
    b = np.asarray(fq.text["layers"]["attn"]["qkv"]["kernel_q"]["q"])
    np.testing.assert_array_equal(a, b)
