"""Training subsystem tests: tokenize masking, augment determinism,
trainer loop with resume, projector freezing, checkpointing."""
import os

import numpy as np
import jax
import pytest
from PIL import Image, ImageDraw

from detikzify_tpu.config import tiny_test_config
from detikzify_tpu.models import detikzify
from detikzify_tpu.processing import ByteTokenizer, DetikzifyProcessor
from detikzify_tpu.train import data as tdata
from detikzify_tpu.train import (TrainConfig, Trainer, get_last_checkpoint,
                                 make_optimizer, make_train_step,
                                 init_state, trainable_mask, save_params_npz)
from detikzify_tpu.data.augment import (EditCutMix, EditCutOut, EditMixUp,
                                        FullErase, SketchAugment)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test_config(vocab_size=512)
    params = detikzify.init(jax.random.PRNGKey(0), cfg)
    tok = ByteTokenizer(vocab_size=512, image_token_id=cfg.image_token_id,
                        bos_token_id=cfg.bos_token_id,
                        eos_token_id=cfg.eos_token_id, model_max_length=64)
    return cfg, params, DetikzifyProcessor(tok, cfg)


def _figure(seed=0):
    img = Image.new("RGB", (96, 64), "white")
    d = ImageDraw.Draw(img)
    d.rectangle([5 + seed, 5, 90, 58], outline="black", width=2)
    return img


def test_tokenize_masks_image_and_pad(setup):
    cfg, _, processor = setup
    batch = tdata.tokenize_batch(
        processor, texts=["abc", "defgh"], images=[_figure(), _figure(1)])
    ids, labels = batch["input_ids"], batch["labels"]
    assert (labels[ids == cfg.image_token_id] == -100).all()
    # padding masked
    assert (labels[~batch["attention_mask"]] == -100).all()
    # code tokens keep their ids
    code_mask = batch["attention_mask"] & (ids != cfg.image_token_id)
    assert (labels[code_mask] == ids[code_mask]).all()
    # eos appended
    assert (ids == cfg.eos_token_id).sum() == 2


def test_fits_in_context(setup):
    cfg, _, processor = setup
    assert tdata.fits_in_context(processor, "short", 64)
    assert not tdata.fits_in_context(processor, "x" * 100, 64)


def test_sketch_augment_deterministic():
    a = SketchAugment(seed=3)(_figure())
    b = SketchAugment(seed=3)(_figure())
    assert list(a.getdata()) == list(b.getdata())
    assert a.size == _figure().size


def test_edit_augments():
    img, other = _figure(), _figure(5)
    assert FullErase()(img).getextrema() == ((255, 255), (255, 255),
                                             (255, 255))
    assert EditCutOut(seed=0)(img).size == img.size
    assert EditMixUp(seed=0)(img, other).size == img.size
    assert EditCutMix(seed=0)(img, other).size == img.size


def test_sketch_dataset_epoch_swap(setup):
    ds = tdata.SketchDataset(
        [{"image": _figure(), "text": "t"}], sketch_ratio=1.0, seed=0)
    ds.set_epoch(0)
    a = ds[0]["image"]
    ds.set_epoch(1)
    b = ds[0]["image"]
    assert list(a.getdata()) != list(_figure().getdata())  # augmented
    assert list(a.getdata()) != list(b.getdata())          # per-epoch differs


def test_trainer_loss_decreases_and_resumes(setup, tmp_path):
    cfg, params, processor = setup
    dataset = [{"image": _figure(i % 3), "text": f"code{i % 3};"}
               for i in range(16)]
    tc = TrainConfig(
        output_dir=str(tmp_path / "run"), learning_rate=2e-3, epochs=2,
        micro_batch_size=4, grad_accum=2, max_length=32,
        save_epoch_fraction=0.5, logging_steps=1, trainable="all",
        fsdp=False, model_axis=1)
    losses = []
    trainer = Trainer(params, cfg, processor, dataset, tc,
                      log_fn=lambda m: losses.append(m))
    state = trainer.train()
    assert int(state.step) == trainer.total_steps
    assert get_last_checkpoint(str(tmp_path / "run")) is not None

    # resume from checkpoint: new trainer starts at saved step
    trainer2 = Trainer(params, cfg, processor, dataset, tc,
                       log_fn=lambda m: None)
    assert trainer2._resume() == trainer.total_steps


def test_projector_freeze(setup):
    cfg, params, _ = setup
    mask = trainable_mask(params, "projector")
    opt = make_optimizer(1e-2, total_steps=4, trainable=mask)
    step = make_train_step(cfg, opt, grad_accum=1, attn_impl="xla")
    state = init_state(params, opt)

    ids = np.full((2, cfg.image_seq_len + 6), 65, np.int32)
    ids[:, :cfg.image_seq_len] = cfg.image_token_id
    batch = {
        "input_ids": ids,
        "labels": np.where(ids == cfg.image_token_id, -100, ids),
        "pixel_values": np.zeros(
            (2, cfg.vision.image_size, cfg.vision.image_size, 3),
            np.float32),
    }
    jit_step = jax.jit(step)
    new_state, metrics = jit_step(state, batch)
    new_state, metrics = jit_step(new_state, batch)  # step 0 has lr=0 (warmup)
    # connector moved, text tower untouched
    delta_conn = float(jax.numpy.abs(
        new_state.params.connector["proj"]["kernel"]
        - params.connector["proj"]["kernel"]).max())
    delta_text = float(jax.numpy.abs(
        new_state.params.text["embed_tokens"]
        - params.text["embed_tokens"]).max())
    assert delta_conn > 0
    assert delta_text == 0


def test_save_params_npz(setup, tmp_path):
    _, params, _ = setup
    path = str(tmp_path / "proj.npz")
    save_params_npz(path, params, only="connector")
    loaded = tdata.np.load(path)
    assert "proj/kernel" in loaded.files


def test_checkpoint_restore_across_mesh_shapes(setup, tmp_path):
    """A checkpoint saved under one mesh restores into templates sharded
    for a DIFFERENT mesh shape (elastic resume: Orbax reshards on load)."""
    import jax.numpy as jnp

    from detikzify_tpu.parallel.mesh import make_mesh, shard_params
    from detikzify_tpu.train.checkpoint import Checkpointer

    cfg, params, _ = setup
    mesh_a = make_mesh(data=4, model=2)
    mesh_b = make_mesh(data=2, model=4)
    placed = jax.tree.map(
        jax.device_put, params, shard_params(params, mesh_a, fsdp=True))

    ckpt = Checkpointer(str(tmp_path / "xmesh"))
    ckpt.save(1, placed, {"mesh": "4x2"})
    ckpt.wait()

    template = jax.tree.map(
        lambda x, s: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=s),
        params, shard_params(params, mesh_b, fsdp=True))
    restored, meta = ckpt.restore_latest(template)
    assert meta["mesh"] == "4x2"
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the restored shardings follow the NEW mesh
    leaf = restored.text["embed_tokens"]
    assert leaf.sharding.mesh.shape == dict(mesh_b.shape)


def test_lowmem_adam_matches_fp32_moments(setup):
    """make_optimizer(moment_dtype=bf16) stores both Adam moments in
    bf16 (halves optimizer HBM; what lets the DS-1.3b full fine-tune fit
    one 16 GB chip -- bench.py train_bench). Convergence gate: on a tiny
    overfit run its loss curve tracks fp32-moment AdamW step for step."""
    import jax.numpy as jnp

    cfg, params, _ = setup
    ids = np.full((2, cfg.image_seq_len + 8), 65, np.int32)
    ids[:, :cfg.image_seq_len] = cfg.image_token_id
    ids[:, cfg.image_seq_len:] = (
        np.arange(8, dtype=np.int32)[None] % 7 + 60)
    batch = {
        "input_ids": ids,
        "labels": np.where(ids == cfg.image_token_id, -100, ids),
        "pixel_values": np.zeros(
            (2, cfg.vision.image_size, cfg.vision.image_size, 3),
            np.float32),
    }

    def run(moment_dtype):
        opt = make_optimizer(5e-3, total_steps=10, warmup_ratio=0.0,
                             trainable=trainable_mask(params, "all"),
                             moment_dtype=moment_dtype)
        state = init_state(params, opt)
        step = jax.jit(make_train_step(cfg, opt, grad_accum=1,
                                       attn_impl="xla"))
        losses = []
        for _ in range(8):
            state, metrics = step(state, batch)
            losses.append(float(metrics["loss"]))
        return losses

    ref = run(None)
    lowmem = run(jnp.bfloat16)
    assert ref[-1] < ref[0]           # both actually learn
    assert lowmem[-1] < lowmem[0]
    for a, b in zip(ref, lowmem):     # step-for-step agreement
        assert abs(a - b) < 0.05 * max(1.0, abs(a)), (ref, lowmem)


def test_quant8_adam_matches_fp32_moments(setup):
    """make_optimizer(moment_dtype='quant8') stores both Adam moments in
    block-scaled 8-bit float (quarter of fp32 optimizer HBM -- what lets
    the DS-1.3b full fine-tune GRAD-ACCUMULATE on one 16 GB chip,
    bench.py train_bench ga 1/2/4). Convergence gate: on a tiny overfit
    run its loss curve tracks fp32-moment AdamW closely (8-bit moments
    carry ~2^-3 relative quantization noise, so the tolerance is looser
    than the bf16 gate above)."""
    import jax.numpy as jnp

    cfg, params, _ = setup
    ids = np.full((2, cfg.image_seq_len + 8), 65, np.int32)
    ids[:, :cfg.image_seq_len] = cfg.image_token_id
    ids[:, cfg.image_seq_len:] = (
        np.arange(8, dtype=np.int32)[None] % 7 + 60)
    batch = {
        "input_ids": ids,
        "labels": np.where(ids == cfg.image_token_id, -100, ids),
        "pixel_values": np.zeros(
            (2, cfg.vision.image_size, cfg.vision.image_size, 3),
            np.float32),
    }

    def run(moment_dtype):
        opt = make_optimizer(5e-3, total_steps=10, warmup_ratio=0.0,
                             trainable=trainable_mask(params, "all"),
                             moment_dtype=moment_dtype)
        state = init_state(params, opt)
        step = jax.jit(make_train_step(cfg, opt, grad_accum=1,
                                       attn_impl="xla"))
        losses = []
        for _ in range(8):
            state, metrics = step(state, batch)
            losses.append(float(metrics["loss"]))
        return losses, state

    ref, _ = run(None)
    q8, qstate = run("quant8")
    assert ref[-1] < ref[0]           # both actually learn
    assert q8[-1] < q8[0]
    for a, b in zip(ref, q8):         # step-for-step agreement, 8-bit tol
        assert abs(a - b) < 0.15 * max(1.0, abs(a)), (ref, q8)
    # the moment trees really are 1-byte storage (plus fp32 block scales)
    def find_quant_state(node):
        if isinstance(node, dict):
            if "m" in node and "count" in node:
                return node
            children = node.values()
        elif isinstance(node, (tuple, list)) or hasattr(node, "_fields"):
            children = tuple(node)
        else:
            return None
        for child in children:
            got = find_quant_state(child)
            if got is not None:
                return got
        return None

    inner = find_quant_state(qstate.opt_state)
    assert inner is not None
    leaf = jax.tree.leaves(
        inner["m"], is_leaf=lambda x: isinstance(x, dict) and "mq" in x)[0]
    assert leaf["mq"].dtype.itemsize == 1
    assert leaf["vq"].dtype.itemsize == 1


def test_grad_accum_quant8_fits_and_matches(setup):
    """grad_accum=2 with quant8 moments + explicit accum_dtype produces
    the same loss as grad_accum=1 over the concatenated batch (averaging
    identity), and the microbatch loop stays a single-jaxpr lax.scan."""
    import jax.numpy as jnp

    cfg, params, _ = setup
    ids = np.full((4, cfg.image_seq_len + 6), 65, np.int32)
    ids[:, :cfg.image_seq_len] = cfg.image_token_id
    ids[:, cfg.image_seq_len:] = (
        np.arange(6, dtype=np.int32)[None] % 5 + 60)
    batch = {
        "input_ids": ids,
        "labels": np.where(ids == cfg.image_token_id, -100, ids),
        "pixel_values": np.zeros(
            (4, cfg.vision.image_size, cfg.vision.image_size, 3),
            np.float32),
    }
    opt = make_optimizer(1e-3, total_steps=4, warmup_ratio=0.0,
                         trainable=trainable_mask(params, "all"),
                         moment_dtype="quant8")
    losses = {}
    for ga, accum in ((1, None), (2, None), (2, jax.numpy.float32)):
        state = init_state(params, opt)
        step = jax.jit(make_train_step(cfg, opt, grad_accum=ga,
                                       attn_impl="xla",
                                       accum_dtype=accum))
        state, metrics = step(state, batch)
        losses[(ga, accum)] = float(metrics["loss"])
    base = losses[(1, None)]
    for key, val in losses.items():
        assert abs(val - base) < 5e-3 * max(1.0, abs(base)), losses


def test_remat_dots_policy_matches_full_remat(setup):
    """remat='dots' (save matmul outputs, skip recomputing dots in the
    backward) must be numerically equivalent to full remat -- same loss,
    same grads -- it only changes what the backward rematerializes."""
    cfg, params, _ = setup
    ids = np.full((2, cfg.image_seq_len + 5), 65, np.int32)
    ids[:, :cfg.image_seq_len] = cfg.image_token_id
    batch = {
        "input_ids": jax.numpy.asarray(ids),
        "labels": jax.numpy.asarray(
            np.where(ids == cfg.image_token_id, -100, ids)),
        "pixel_values": jax.numpy.zeros(
            (2, cfg.vision.image_size, cfg.vision.image_size, 3),
            np.float32),
    }
    from detikzify_tpu.train.step import label_smoothing_free_loss

    def grads_with(remat):
        return jax.jit(jax.value_and_grad(
            lambda p: label_smoothing_free_loss(
                p, cfg, batch, attn_impl="xla", remat=remat)))(params)

    loss_full, g_full = grads_with(True)
    loss_dots, g_dots = grads_with("dots")
    assert abs(float(loss_full) - float(loss_dots)) < 1e-5
    for a, b in zip(jax.tree.leaves(g_full), jax.tree.leaves(g_dots)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
