"""GRPO refinement tests (hermetic: fake compiler + SelfSim reward)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image, ImageDraw

from detikzify_tpu.config import tiny_test_config
from detikzify_tpu.evaluate.imagesim import ImageSim
from detikzify_tpu.infer import CompileService, FakeBackend
from detikzify_tpu.models import detikzify
from detikzify_tpu.processing import ByteTokenizer, DetikzifyProcessor
from detikzify_tpu.train.grpo import (GRPOConfig, SelfSimReward,
                                      group_advantages, refine,
                                      sequence_logprobs)


def test_group_advantages():
    rewards = np.array([1.0, 0.0, 1.0, 1.0])
    adv = group_advantages(rewards, 2)
    assert adv[0] > 0 > adv[1]             # within-group normalization
    assert adv[2] == adv[3] == pytest.approx(0.0)  # degenerate group -> 0


def test_sequence_logprobs_masking():
    cfg = tiny_test_config(vocab_size=128)
    params = detikzify.init(jax.random.PRNGKey(0), cfg)
    tokens = jnp.asarray(np.random.default_rng(0).integers(
        0, 128, (2, 10)), jnp.int32)
    mask = np.zeros((2, 10), bool)
    mask[:, 4:] = True
    lp = sequence_logprobs(params, cfg, tokens, None, jnp.asarray(mask),
                           attn_impl="xla")
    assert lp.shape == (2, 9)
    assert (np.asarray(lp)[:, :3] == 0).all()   # prompt region masked
    assert (np.asarray(lp)[:, 4:] < 0).all()    # real logprobs


def test_refine_runs_and_updates(setup_figure=None):
    cfg = tiny_test_config(vocab_size=512)
    params = detikzify.init(jax.random.PRNGKey(1), cfg)
    tok = ByteTokenizer(vocab_size=512, image_token_id=cfg.image_token_id,
                        bos_token_id=cfg.bos_token_id,
                        eos_token_id=cfg.eos_token_id, model_max_length=64)
    processor = DetikzifyProcessor(tok, cfg)
    img = Image.new("RGB", (80, 80), "white")
    ImageDraw.Draw(img).rectangle([10, 10, 70, 70], outline="black")

    metric = ImageSim.from_detikzify(params, cfg)
    reward = SelfSimReward(
        metric, CompileService(workers=2, backend=FakeBackend()))
    gcfg = GRPOConfig(num_generations=4, max_new_tokens=12,
                      learning_rate=1e-4)
    logs = []
    new_params = refine(params, cfg, processor, [img], reward, gcfg=gcfg,
                        steps=2, attn_impl="xla",
                        log_fn=lambda m: logs.append(m))
    assert len(logs) == 2
    delta = float(jnp.abs(new_params.text["embed_tokens"]
                          - params.text["embed_tokens"]).max())
    assert np.isfinite(delta)
    # rewards -1..1; with a live fake compiler most rollouts compile
    assert "reward mean" in logs[0]
    # reference refine.py:198-207 default: the vision TOWER is frozen...
    v_delta = max(float(jnp.abs(a - b).max()) for a, b in zip(
        jax.tree.leaves(new_params.vision),
        jax.tree.leaves(params.vision)))
    assert v_delta == 0.0
    # ...but the CONNECTOR projection trains (it sits outside
    # model.model.vision_model in the reference)
    c_delta = max(float(jnp.abs(a - b).max()) for a, b in zip(
        jax.tree.leaves(new_params.connector),
        jax.tree.leaves(params.connector)))
    assert c_delta > 0.0


def test_refine_kl_and_multi_prompt():
    """beta > 0 anchors the KL to the INITIAL policy (not logprob 0), and
    prompts_per_step batches several images' groups into one update."""
    cfg = tiny_test_config(vocab_size=512)
    params = detikzify.init(jax.random.PRNGKey(2), cfg)
    tok = ByteTokenizer(vocab_size=512, image_token_id=cfg.image_token_id,
                        bos_token_id=cfg.bos_token_id,
                        eos_token_id=cfg.eos_token_id, model_max_length=64)
    processor = DetikzifyProcessor(tok, cfg)
    imgs = []
    for i in range(2):
        im = Image.new("RGB", (80, 80), "white")
        ImageDraw.Draw(im).ellipse([8 + 6 * i, 8, 70, 70], outline="black")
        imgs.append(im)
    metric = ImageSim.from_detikzify(params, cfg)
    reward = SelfSimReward(
        metric, CompileService(workers=2, backend=FakeBackend()))
    gcfg = GRPOConfig(num_generations=2, max_new_tokens=8,
                      learning_rate=1e-4, beta=0.04)
    logs = []
    new_params = refine(params, cfg, processor, imgs, reward, gcfg=gcfg,
                        steps=2, prompts_per_step=2, attn_impl="xla",
                        log_fn=lambda m: logs.append(m))
    assert len(logs) == 2
    assert all(np.isfinite(float(m.split("loss ")[1])) for m in logs)
    delta = float(jnp.abs(new_params.text["embed_tokens"]
                          - params.text["embed_tokens"]).max())
    assert np.isfinite(delta) and delta > 0
