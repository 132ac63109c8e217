"""Kernel Inception Distance over SigLIP image features.

Reference ``detikzify/evaluate/kid.py:29-74``: torchmetrics KID with a
SigLIP ``get_image_features`` wrapper, subset_size=50. Here the unbiased
polynomial-kernel MMD^2 estimator runs as one jitted program on TPU over
pooled SigLIP embeddings.
"""
from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..config import VisionConfig
from ..models import siglip
from ..processing import preprocess_image


def poly_mmd2(x: jnp.ndarray, y: jnp.ndarray, degree: int = 3,
              coef: float = 1.0) -> jnp.ndarray:
    """Unbiased MMD^2 with kernel k(a,b) = (a.b/d + coef)^degree."""
    d = x.shape[-1]
    m, n = x.shape[0], y.shape[0]
    kxx = (x @ x.T / d + coef) ** degree
    kyy = (y @ y.T / d + coef) ** degree
    kxy = (x @ y.T / d + coef) ** degree
    sum_kxx = (jnp.sum(kxx) - jnp.trace(kxx)) / (m * (m - 1))
    sum_kyy = (jnp.sum(kyy) - jnp.trace(kyy)) / (n * (n - 1))
    sum_kxy = jnp.sum(kxy) * 2.0 / (m * n)
    return sum_kxx + sum_kyy - sum_kxy


class KernelInceptionDistance:
    higher_is_better = False

    def __init__(self, vision_params: dict, cfg: VisionConfig, *,
                 subset_size: int = 50, subsets: int = 100, seed: int = 0,
                 preprocess: bool = True):
        self.vision_params = vision_params
        cfg = getattr(cfg, "vision", cfg)   # accept DetikzifyConfig too
        self.cfg = cfg
        self.subset_size = subset_size
        self.subsets = subsets
        self.seed = seed
        self.preprocess = preprocess
        self._real: List[np.ndarray] = []
        self._fake: List[np.ndarray] = []

        @jax.jit
        def embed(vp, pixels):
            return siglip.apply(vp, cfg, pixels)["pooler_output"]

        self._embed = embed

    def _features(self, images) -> np.ndarray:
        pixels = jnp.asarray(np.stack([
            preprocess_image(img, self.cfg.image_size,
                             do_trim=self.preprocess) for img in images]))
        return np.asarray(jax.device_get(
            self._embed(self.vision_params, pixels))).astype(np.float64)

    def update(self, images, real: bool) -> None:
        if not isinstance(images, (list, tuple)):
            images = [images]
        (self._real if real else self._fake).append(self._features(images))

    def compute(self) -> tuple:
        """Returns (mean, std) of per-subset MMD^2, like torchmetrics."""
        real = np.concatenate(self._real)
        fake = np.concatenate(self._fake)
        n = min(len(real), len(fake), self.subset_size)
        if n < 2:
            raise RuntimeError("need at least 2 samples per distribution")
        rng = np.random.default_rng(self.seed)
        vals = []
        for _ in range(self.subsets):
            r = real[rng.choice(len(real), n, replace=False)]
            f = fake[rng.choice(len(fake), n, replace=False)]
            vals.append(float(poly_mmd2(jnp.asarray(r), jnp.asarray(f))))
        return float(np.mean(vals)), float(np.std(vals))

    def reset(self) -> None:
        self._real, self._fake = [], []
