"""Sharded training step (pjit over a ('data','model') mesh).

TPU-native replacement for the reference's HF-Trainer + DDP/DeepSpeed stack
(``detikzify/train/train.py:105-147``, ``train/pretrain.py:70-97``):

  * gradient accumulation happens INSIDE the jitted step (lax.scan over
    microbatches) -- no WORLD_SIZE bookkeeping (reference train.py:82-83);
  * parameter freezing (projector-only pretraining, reference
    pretrain.py:50-60) is an optax partition: frozen subtrees get
    ``set_to_zero`` updates -- one step function serves both stages;
  * optimizer-state sharding (ZeRO 1/2 equivalent) falls out of param
    shardings; FSDP via ``shard_params(fsdp=True)``.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..config import DetikzifyConfig
from ..models import detikzify
from ..models.detikzify import Params


class TrainState(NamedTuple):
    params: Params
    opt_state: object
    step: jnp.ndarray


def label_smoothing_free_loss(params, cfg, batch, attn_impl="auto",
                              remat=False):
    _, loss = detikzify.forward(
        params, cfg,
        batch["input_ids"],
        batch.get("pixel_values"),
        attention_mask=batch.get("attention_mask"),
        labels=batch["labels"],
        attn_impl=attn_impl,
        remat=remat,
    )
    return loss


def trainable_mask(params: Params, mode: str):
    """'all' | 'projector' (stage-1 pretraining trains only the connector)."""
    if mode == "all":
        return jax.tree.map(lambda _: "train", params)
    if mode == "projector":
        mask = jax.tree.map(lambda _: "freeze", params)
        return mask._replace(
            connector=jax.tree.map(lambda _: "train", params.connector))
    raise ValueError(mode)


def _scale_by_adam_lowmem(b1: float, b2: float, eps: float,
                          dtype) -> optax.GradientTransformation:
    """Adam moment tracking with BOTH moments stored in ``dtype``
    (typically bfloat16). Arithmetic runs in fp32 each step; only the
    persistent mu/nu trees are downcast, halving optimizer HBM versus
    optax's fp32 default (optax.adamw exposes ``mu_dtype`` only). On a
    single 16 GB chip this is the difference between a 1.3B-class full
    fine-tune fitting or OOMing: fp32 m+v for 1.7B params is ~13.6 GB
    alone. Convergence parity with fp32 moments is pinned by
    tests/test_train.py (tiny-overfit loss curves match within tol)."""

    def init(params):
        zeros = lambda p: jnp.zeros_like(p, dtype=dtype)  # noqa: E731
        return {"count": jnp.zeros((), jnp.int32),
                "mu": jax.tree.map(zeros, params),
                "nu": jax.tree.map(zeros, params)}

    def update(grads, state, params=None):
        del params
        count = state["count"] + 1

        def upd_mu(m, g):
            g32 = g.astype(jnp.float32)
            return (b1 * m.astype(jnp.float32)
                    + (1.0 - b1) * g32).astype(dtype)

        def upd_nu(v, g):
            g32 = g.astype(jnp.float32)
            return (b2 * v.astype(jnp.float32)
                    + (1.0 - b2) * g32 * g32).astype(dtype)

        mu = jax.tree.map(upd_mu, state["mu"], grads)
        nu = jax.tree.map(upd_nu, state["nu"], grads)
        c = count.astype(jnp.float32)
        bc1 = 1.0 - b1 ** c
        bc2 = 1.0 - b2 ** c

        def adam(m, v):
            mhat = m.astype(jnp.float32) / bc1
            vhat = v.astype(jnp.float32) / bc2
            return mhat / (jnp.sqrt(vhat) + eps)

        updates = jax.tree.map(adam, mu, nu)
        return updates, {"count": count, "mu": mu, "nu": nu}

    return optax.GradientTransformation(init, update)


_QUANT_BLOCK = 256


def _scale_by_adam_quant8(b1: float, b2: float, eps: float,
                          dtype=None,
                          block: int = _QUANT_BLOCK
                          ) -> optax.GradientTransformation:
    """Adam with BOTH moments stored in 8-bit float (e4m3) with a per-block
    fp32 absmax scale -- 1 byte/param + 4/block overhead, quartering
    optimizer HBM vs fp32 (halving vs the bf16 path above). The 4-bit
    exponent rides within each block's absmax scale, so the second
    moment's wide dynamic range survives storage (the failure mode of
    plain linear int8: sqrt(v)~0 explodes updates at eps=1e-8). Same
    technique family as 8-bit Adam (Dettmers et al., block-wise quantized
    optimizer states); arithmetic runs fp32 every step.

    On the 16 GB chip this is what lets the DS-1.3b FULL fine-tune
    gradient-accumulate: bf16 moments (6.8 GB) + a second grad tree for
    the accumulation carry (3.4 GB) exceed HBM; e4m3 moments (3.4 GB
    for m+v) free up 3.4 GB (bench.py train_bench ga 1/2/4). Convergence
    pinned by tests/test_train.py::test_quant8_adam_matches_fp32_moments."""
    qdtype = dtype or jnp.float8_e4m3fn
    qmax = float(jnp.finfo(qdtype).max)

    def qinit(p):
        nb = -(-p.size // block)
        return {"mq": jnp.zeros((nb, block), qdtype),
                "ms": jnp.zeros((nb,), jnp.float32),
                "vq": jnp.zeros((nb, block), qdtype),
                "vs": jnp.zeros((nb,), jnp.float32)}

    def _is_qleaf(x):
        return isinstance(x, dict) and "mq" in x

    def init(params):
        return {"count": jnp.zeros((), jnp.int32),
                "m": jax.tree.map(qinit, params)}

    def update(grads, state, params=None):
        del params
        count = state["count"] + 1
        c = count.astype(jnp.float32)
        bc1 = 1.0 - b1 ** c
        bc2 = 1.0 - b2 ** c

        def quant(x):
            s = jnp.max(jnp.abs(x), axis=1) / qmax
            q = (x / jnp.maximum(s, 1e-30)[:, None]).astype(qdtype)
            return q, s

        def upd(st, g):
            n = g.size
            gf = jnp.pad(g.astype(jnp.float32).reshape(-1),
                         (0, -n % block)).reshape(-1, block)
            m = st["mq"].astype(jnp.float32) * st["ms"][:, None]
            v = st["vq"].astype(jnp.float32) * st["vs"][:, None]
            m = b1 * m + (1.0 - b1) * gf
            v = b2 * v + (1.0 - b2) * gf * gf
            u = (m / bc1) / (jnp.sqrt(v / bc2) + eps)
            mq, ms = quant(m)
            vq, vs = quant(v)
            return {"st": {"mq": mq, "ms": ms, "vq": vq, "vs": vs},
                    "u": u.reshape(-1)[:n].reshape(g.shape)
                    .astype(g.dtype)}

        both = jax.tree.map(upd, state["m"], grads, is_leaf=_is_qleaf)

        def _is_pair(x):
            return isinstance(x, dict) and "st" in x and "u" in x

        updates = jax.tree.map(lambda d: d["u"], both, is_leaf=_is_pair)
        new_m = jax.tree.map(lambda d: d["st"], both, is_leaf=_is_pair)
        return updates, {"count": count, "m": new_m}

    return optax.GradientTransformation(init, update)


def make_optimizer(
    learning_rate: float,
    *,
    total_steps: int,
    warmup_ratio: float = 0.03,
    weight_decay: float = 0.0,
    b1: float = 0.9,
    b2: float = 0.999,
    grad_clip: float = 1.0,
    trainable: Optional[object] = None,    # pytree of 'train'/'freeze'
    moment_dtype=None,                     # e.g. jnp.bfloat16 (low-mem Adam)
) -> optax.GradientTransformation:
    """AdamW + cosine schedule with linear warmup (reference hyperparams:
    cosine schedule, warmup_ratio 0.03 -- train/train.py:116-121).

    ``moment_dtype=jnp.bfloat16`` stores both Adam moments in bf16;
    ``moment_dtype="quant8"`` (or any 1-byte float dtype) stores them in
    block-scaled 8-bit float (see ``_scale_by_adam_quant8``). Update
    math stays fp32 in every mode."""
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=learning_rate,
        warmup_steps=max(int(total_steps * warmup_ratio), 1),
        decay_steps=total_steps, end_value=0.0)
    if moment_dtype is None:
        adamw = optax.adamw(schedule, b1=b1, b2=b2, eps=1e-8,
                            weight_decay=weight_decay)
    else:
        if (moment_dtype == "quant8"
                or jnp.dtype(moment_dtype).itemsize == 1):
            if (moment_dtype != "quant8"
                    and not jnp.issubdtype(jnp.dtype(moment_dtype),
                                           jnp.floating)):
                raise ValueError(
                    f"moment_dtype {moment_dtype} unsupported: 1-byte "
                    f"moments must be a float8 dtype (block-absmax "
                    f"scaling needs a float format), got an integer type")
            scaler = _scale_by_adam_quant8(
                b1, b2, 1e-8,
                None if moment_dtype == "quant8" else moment_dtype)
        else:
            scaler = _scale_by_adam_lowmem(b1, b2, 1e-8, moment_dtype)
        # mirror optax.adamw's chain with low-mem moment storage
        adamw = optax.chain(
            scaler,
            optax.add_decayed_weights(weight_decay)
            if weight_decay else optax.identity(),
            optax.scale_by_learning_rate(schedule),
        )
    opt = optax.chain(
        optax.clip_by_global_norm(grad_clip),
        adamw,
    )
    if trainable is not None:
        opt = optax.multi_transform(
            {"train": opt, "freeze": optax.set_to_zero()}, trainable)
    return opt


def make_train_step(
    cfg: DetikzifyConfig,
    optimizer: optax.GradientTransformation,
    *,
    grad_accum: int = 1,
    attn_impl: str = "auto",
    remat: bool = False,
    accum_dtype=None,
    loss_fn: Optional[Callable] = None,
):
    """Build a jittable (state, batch) -> (state, metrics) step.

    ``batch`` arrays have leading dim ``grad_accum * micro_batch``; the step
    scans over ``grad_accum`` microbatches, averaging grads on device.
    ``accum_dtype`` sets the grad-accumulation carry dtype (default: the
    params' own dtype; fp32 buys precision when HBM allows -- the loss
    accumulator is fp32 in every mode).
    """
    if loss_fn is None:
        loss_fn = label_smoothing_free_loss
    else:
        user_fn = loss_fn
        loss_fn = lambda p, c, b, a, r: user_fn(p, c, b, a)  # noqa: E731

    def compute_grads(params, batch):
        return jax.value_and_grad(
            lambda p: loss_fn(p, cfg, batch, attn_impl, remat))(params)

    def train_step(state: TrainState, batch) -> tuple:
        params = state.params
        if grad_accum == 1:
            loss, grads = compute_grads(params, batch)
        else:
            def micro(carry, mb):
                loss, grads = compute_grads(params, mb)
                acc_loss, acc_grads = carry
                return (acc_loss + loss,
                        jax.tree.map(
                            lambda a, g: a + g.astype(a.dtype),
                            acc_grads, grads)), None

            zeros = jax.tree.map(
                lambda p: jnp.zeros(p.shape, accum_dtype or p.dtype),
                params)
            split = jax.tree.map(
                lambda x: x.reshape((grad_accum, -1) + x.shape[1:]), batch)
            (loss, grads), _ = jax.lax.scan(
                micro, (jnp.zeros((), jnp.float32), zeros), split)
            loss = loss / grad_accum
            grads = jax.tree.map(
                lambda g, p: (g / grad_accum).astype(p.dtype),
                grads, params)

        updates, opt_state = optimizer.update(grads, state.opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
        }
        return TrainState(params, opt_state, state.step + 1), metrics

    return train_step


def init_state(params: Params, optimizer) -> TrainState:
    return TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))
