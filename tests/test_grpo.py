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
    assert all(np.isfinite(float(m.split("loss ")[1].split(",")[0]))
               for m in logs)
    delta = float(jnp.abs(new_params.text["embed_tokens"]
                          - params.text["embed_tokens"]).max())
    assert np.isfinite(delta) and delta > 0


def test_refine_learning_gate():
    """Reward-mean must IMPROVE over steps on a deterministic dense-reward
    toy (VERDICT round-2 directive #6): a sign error in the advantage or
    the surrogate drives the reward down or flat and fails this gate,
    where the params-moved checks above would still pass."""
    cfg = tiny_test_config(vocab_size=512)
    params = detikzify.init(jax.random.PRNGKey(1), cfg)
    tok = ByteTokenizer(vocab_size=512, image_token_id=cfg.image_token_id,
                        bos_token_id=cfg.bos_token_id,
                        eos_token_id=cfg.eos_token_id, model_max_length=64)
    processor = DetikzifyProcessor(tok, cfg)
    img = Image.new("RGB", (80, 80), "white")

    means = []

    def reward(images, codes):
        # dense deterministic reward: fraction of 'x' bytes emitted
        r = np.asarray([c.count("x") / max(len(c), 1) for c in codes])
        means.append(float(r.mean()))
        return r

    gcfg = GRPOConfig(num_generations=8, max_new_tokens=8,
                      learning_rate=3e-3)
    refine(params, cfg, processor, [img], reward, gcfg=gcfg, steps=10,
           attn_impl="xla", log_fn=lambda m: None)
    assert len(means) == 10
    early, late = np.mean(means[:3]), np.mean(means[-3:])
    assert late > early + 0.3, \
        f"no learning: early {early:.3f} -> late {late:.3f} ({means})"


def test_refine_multi_update_old_logprobs():
    """updates_per_batch > 1 takes the PPO path: old_logprobs pinned to the
    rollout policy, so epochs after the first optimize a real ratio != 1
    (the implied-old_logprobs path is identically ratio 1)."""
    cfg = tiny_test_config(vocab_size=512)
    params = detikzify.init(jax.random.PRNGKey(3), cfg)
    tok = ByteTokenizer(vocab_size=512, image_token_id=cfg.image_token_id,
                        bos_token_id=cfg.bos_token_id,
                        eos_token_id=cfg.eos_token_id, model_max_length=64)
    processor = DetikzifyProcessor(tok, cfg)
    img = Image.new("RGB", (80, 80), "white")

    def reward(images, codes):
        return np.asarray([c.count("x") / max(len(c), 1) for c in codes])

    logs = []
    gcfg = GRPOConfig(num_generations=4, max_new_tokens=8,
                      learning_rate=3e-3, updates_per_batch=3)
    new_params = refine(params, cfg, processor, [img], reward, gcfg=gcfg,
                        steps=2, attn_impl="xla",
                        log_fn=lambda m: logs.append(m))
    assert len(logs) == 2
    # the logged ratio is from the LAST inner epoch: with pinned
    # old_logprobs and two updates already applied it must deviate from 1
    ratios = [float(m.split("ratio ")[1]) for m in logs]
    assert all(np.isfinite(r) for r in ratios)
    assert any(abs(r - 1.0) > 1e-4 for r in ratios)
    delta = float(jnp.abs(new_params.text["embed_tokens"]
                          - params.text["embed_tokens"]).max())
    assert np.isfinite(delta) and delta > 0


def test_grpo_step_clipping_with_old_logprobs():
    """make_grpo_step with explicit old_logprobs clips the ratio: pushing
    old_logprobs far below the policy's caps the surrogate at (1+eps)*adv
    for positive advantages."""
    import optax

    from detikzify_tpu.train.grpo import GRPOState, make_grpo_step

    cfg = tiny_test_config(vocab_size=128)
    params = detikzify.init(jax.random.PRNGKey(0), cfg)
    gcfg = GRPOConfig(clip_eps=0.2, learning_rate=1e-3)
    optimizer = optax.sgd(1e-3)
    step = jax.jit(make_grpo_step(cfg, optimizer, gcfg, attn_impl="xla"))
    state = GRPOState(params, optimizer.init(params),
                      jnp.zeros((), jnp.int32))
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, 128, (2, 10)), jnp.int32)
    mask = np.zeros((2, 10), bool)
    mask[:, 4:] = True
    from detikzify_tpu.train.grpo import sequence_logprobs as slp

    lp = slp(params, cfg, tokens, None, jnp.asarray(mask), attn_impl="xla")
    base = {"tokens": tokens, "completion_mask": jnp.asarray(mask),
            "advantages": jnp.asarray([1.0, 1.0], jnp.float32)}
    # old == current -> identical loss to the implied path
    _, m_implied = step(state, dict(base))
    _, m_pinned = step(state, dict(base, old_logprobs=lp))
    np.testing.assert_allclose(float(m_implied["loss"]),
                               float(m_pinned["loss"]), rtol=1e-5)
    # old far below current -> ratio huge; clipped surrogate caps loss at
    # -(1+eps)*adv exactly
    _, m_clip = step(state, dict(base, old_logprobs=lp - 5.0))
    assert float(m_clip["loss"]) == pytest.approx(-(1 + gcfg.clip_eps),
                                                  rel=1e-5)
