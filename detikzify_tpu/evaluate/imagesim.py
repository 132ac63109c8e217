"""ImageSim (SelfSim): perceptual similarity via the model's own vision tower.

Re-design of reference ``detikzify/evaluate/imagesim.py:21-147`` for TPU:
the metric is a jitted SigLIP encoder pass over *batches* of (render, input)
pairs -- the MCTS loop queues renders and scores them in one device call
instead of one-at-a-time GPU round-trips.

Modes (reference :102-125):
  * ``cos``      -- cosine of attention-pooled (MAP head) embeddings
  * ``cos_avg``  -- cosine of mean patch embeddings
  * ``emd``      -- patchwise Earth Mover's Distance mapped through
                    ``2*tanh(-emd2) + 1``. The reference uses an exact LP
                    solver (POT ``ot.lp.emd2``); here EMD is computed with
                    entropy-regularized Sinkhorn iterations -- an XLA-friendly
                    fixed-iteration scheme that converges to the same optimum
                    as regularization -> 0 and runs entirely on device.

Metric state follows the torchmetrics update/compute/reset contract with
``sum``-reduction semantics so distributed eval can psum the state
(reference relies on torchmetrics ``dist_reduce_fx``).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from ..config import DetikzifyConfig
from ..models import siglip
from ..processing import preprocess_image


def _cos(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-8)
    b = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-8)
    return jnp.sum(a * b, axis=-1)


def sinkhorn_emd2(cost: jnp.ndarray, reg: float = 0.01,
                  iters: int = 200) -> jnp.ndarray:
    """Entropy-regularized EMD (uniform marginals). cost: [..., N, M]."""
    cost = jnp.asarray(cost, jnp.float32)
    n, m = cost.shape[-2:]
    log_a = -jnp.log(n) * jnp.ones(cost.shape[:-1])           # [..., N]
    log_b = -jnp.log(m) * jnp.ones(cost.shape[:-2] + (m,))    # [..., M]
    log_k = -cost / reg

    # scaled potentials: f,g are dual potentials divided by reg
    def body(_, fg):
        f, g = fg
        f = log_a - jax.nn.logsumexp(log_k + g[..., None, :], axis=-1)
        g = log_b - jax.nn.logsumexp(log_k + f[..., :, None], axis=-2)
        return f, g

    f = jnp.zeros_like(log_a)
    g = jnp.zeros_like(log_b)
    f, g = jax.lax.fori_loop(0, iters, body, (f, g))
    log_pi = f[..., :, None] + g[..., None, :] + log_k
    return jnp.sum(jnp.exp(log_pi) * cost, axis=(-2, -1))


class ImageSim:
    """Self-similarity metric. update()/compute()/reset() accumulate a mean."""

    higher_is_better = True

    def __init__(self, vision_params: dict, cfg: DetikzifyConfig,
                 mode: str = "cos", preprocess: bool = True):
        assert mode in ("cos", "cos_avg", "emd")
        self.vision_params = vision_params
        self.cfg = cfg
        self.mode = mode
        self.preprocess = preprocess
        self._sum = 0.0
        self._n = 0
        self._build()

    @classmethod
    def from_detikzify(cls, params, cfg: DetikzifyConfig, mode: str = "cos",
                       **kw) -> "ImageSim":
        """Build from a composite model's params (reference :61-89)."""
        return cls(params.vision, cfg, mode=mode, **kw)

    def _build(self):
        vcfg = self.cfg.vision
        mode = self.mode

        @jax.jit
        def embed(params, pixels):  # [B,H,W,C]
            out = siglip.apply(params, vcfg, pixels)
            if mode == "cos":
                return out["pooler_output"]
            return out["last_hidden_state"]

        @jax.jit
        def score_pairs(params, pix1, pix2):
            e1, e2 = embed(params, pix1), embed(params, pix2)
            if mode == "cos":
                return _cos(e1, e2)
            if mode == "cos_avg":
                return _cos(e1.mean(axis=1), e2.mean(axis=1))
            # emd over patch embeddings
            a = e1 / (jnp.linalg.norm(e1, axis=-1, keepdims=True) + 1e-8)
            b = e2 / (jnp.linalg.norm(e2, axis=-1, keepdims=True) + 1e-8)
            cost = 1.0 - jnp.einsum("bnd,bmd->bnm", a, b)
            emd2 = sinkhorn_emd2(cost)
            return 2.0 * jnp.tanh(-emd2) + 1.0

        self._score_pairs = score_pairs

    def _pixels(self, img) -> np.ndarray:
        if isinstance(img, np.ndarray) and img.ndim == 3:
            return img.astype(np.float32)
        return preprocess_image(img, self.cfg.vision.image_size,
                                do_trim=self.preprocess)

    def score(self, img1, img2) -> float:
        return float(self.score_batch([img1], [img2])[0])

    def score_batch(self, imgs1, imgs2) -> np.ndarray:
        """Batched scoring -- the TPU-native MCTS fast path."""
        pix1 = jnp.asarray(np.stack([self._pixels(i) for i in imgs1]))
        pix2 = jnp.asarray(np.stack([self._pixels(i) for i in imgs2]))
        return np.asarray(jax.device_get(
            self._score_pairs(self.vision_params, pix1, pix2)))

    # torchmetrics-style stateful interface -------------------------------

    def update(self, img1, img2, **_) -> None:
        self._sum += self.score(img1, img2)
        self._n += 1

    def compute(self) -> float:
        if self._n == 0:
            raise RuntimeError("no updates")
        return self._sum / self._n

    def reset(self) -> None:
        self._sum, self._n = 0.0, 0

    def __call__(self, img1, img2) -> float:
        return self.score(img1, img2)
