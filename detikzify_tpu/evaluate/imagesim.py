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

Text-conditioned scoring (TikZero): with an ``AdapterBundle``, either side
may be conditioned on a caption through the gated cross-attention blocks
(reference's adapter-aware cast, imagesim.py:70-85); an absent image is
replaced by ``DUMMY_IMAGE``.

Metric state follows the torchmetrics update/compute/reset contract with
``sum``-reduction semantics so distributed eval can psum the state
(reference relies on torchmetrics ``dist_reduce_fx``).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DetikzifyConfig
from ..models import siglip
from ..utils.image import DUMMY_IMAGE


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
                 mode: str = "cos", preprocess: bool = True,
                 adapter=None, image_mean=0.5, image_std=0.5):
        assert mode in ("cos", "cos_avg", "emd")
        self.vision_params = vision_params
        self.cfg = cfg
        self.mode = mode
        self.preprocess = preprocess
        self.adapter = adapter
        # checkpoint-local normalization stats: renders must be normalized
        # exactly like the model's prompt pixels (the reference embeds via
        # the checkpoint's own AutoImageProcessor)
        self.image_mean = image_mean
        self.image_std = image_std
        self._sum = 0.0
        self._n = 0
        from collections import OrderedDict

        self._feature_cache: "OrderedDict" = OrderedDict()
        self._build()

    @classmethod
    def from_detikzify(cls, params, cfg: DetikzifyConfig, *,
                       processor=None, mode: Optional[str] = None,
                       adapter=None, **kw) -> "ImageSim":
        """Build from a composite model's params (reference :61-89); pass the
        model's AdapterBundle for text-conditioned (TikZero) scoring.

        ``mode`` resolves like the reference (imagesim.py:64): explicit
        argument > checkpoint config ``pooling_mode`` > ``"emd"``. The
        ``processor`` (when given) supplies checkpoint-local image
        normalization stats."""
        if mode is None:
            mode = getattr(cfg, "pooling_mode", None) or "emd"
        if processor is not None:
            kw.setdefault("image_mean",
                          getattr(processor, "image_mean", 0.5))
            kw.setdefault("image_std",
                          getattr(processor, "image_std", 0.5))
        return cls(params.vision, cfg, mode=mode, adapter=adapter, **kw)

    def _build(self):
        vcfg = self.cfg.vision
        mode = self.mode
        pooled = mode == "cos"

        def _post(out):
            return out["pooler_output"] if pooled \
                else out["last_hidden_state"]

        mean = jnp.float32(self.image_mean)
        std = jnp.float32(self.image_std)

        def _norm(pixels):
            # pixels arrive as uint8 (4x less host->device traffic than
            # f32 -- decisive over remote-TPU tunnels) or pre-normalized
            # f32; normalization runs on device with the CHECKPOINT's stats
            if pixels.dtype == jnp.uint8:
                return (pixels.astype(jnp.float32) / 255.0 - mean) / std
            return pixels

        @jax.jit
        def embed(params, pixels):  # [B,H,W,C] uint8 or normalized f32
            return _post(siglip.apply(params, vcfg, _norm(pixels)))

        self._embed = embed

        if self.adapter is not None:
            acfg = self.adapter.adapter_cfg

            @jax.jit
            def embed_adapter(params, pixels, alayers, cross, mask):
                ai = siglip.AdapterInputs(alayers, acfg, cross, mask)
                return _post(siglip.apply(params, vcfg, _norm(pixels),
                                          adapter=ai))

            self._embed_adapter = embed_adapter

        def _score_pairs(e1, e2):
            if mode == "cos":
                return _cos(e1, e2)
            if mode == "cos_avg":
                return _cos(e1.mean(axis=1), e2.mean(axis=1))
            a = e1 / (jnp.linalg.norm(e1, axis=-1, keepdims=True) + 1e-8)
            b = e2 / (jnp.linalg.norm(e2, axis=-1, keepdims=True) + 1e-8)
            cost = 1.0 - jnp.einsum("bnd,bmd->bnm", a, b)
            return 2.0 * jnp.tanh(-sinkhorn_emd2(cost)) + 1.0

        self._pair_score = jax.jit(_score_pairs)

        @jax.jit
        def wave_score(params, pixels, ref):
            """Fused encoder + score for a render wave against ONE cached
            reference embedding -- a single device program (one dispatch +
            one sync instead of two + one; decisive on remote tunnels
            where each dispatch costs ~10ms)."""
            e1 = _post(siglip.apply(params, vcfg, _norm(pixels)))
            e2 = jnp.broadcast_to(ref, e1.shape)
            return _score_pairs(e1, e2)

        self._wave_score = wave_score

    # ------------------------------------------------------------------

    def _pixels(self, img) -> np.ndarray:
        """PIL/path -> uint8 [H, W, C] (device-side normalize); already-
        normalized FLOAT arrays pass through. A raw uint8 HWC array is an
        image, not features: it goes through the normal resize+normalize
        path via PIL."""
        if img is None:
            img = DUMMY_IMAGE
        if isinstance(img, np.ndarray) and img.ndim == 3:
            if img.dtype == np.uint8:
                from PIL import Image as _Image

                img = _Image.fromarray(img)
            else:
                return np.ascontiguousarray(img, np.float32)
        from PIL import Image

        from ..utils.image import expand, load, remove_alpha

        pil = load(img) if not isinstance(img, Image.Image) else img
        if self.preprocess:
            # reference get_vision_features: trim -> pad to square at the
            # ORIGINAL scale (imagesim.py:94-96), then the image processor
            # bicubic-resizes; stretch-resizing a trimmed rectangle would
            # distort
            pil = expand(pil, max(pil.size), do_trim=True)
        size = self.cfg.vision.image_size
        pil = remove_alpha(pil).resize((size, size),
                                       Image.Resampling.BICUBIC)
        return np.asarray(pil, np.uint8)

    def features(self, image=None, text: Optional[str] = None) -> jnp.ndarray:
        """Vision features for one (image, text) input; either may be None.

        Features are memoized (small LRU) on (image bytes, text): in the
        MCTS loop the *input* figure is scored against every rollout render,
        so its embedding is computed exactly once per search."""
        if image is None and text is None:
            raise ValueError("image or text required")
        pixels_np = self._pixels(image)
        key = (pixels_np.tobytes(), text)
        hit = self._feature_cache.get(key)
        if hit is not None:
            self._feature_cache.move_to_end(key)
            return hit
        pixels = jnp.asarray(pixels_np)[None]
        if text is not None:
            if self.adapter is None:
                raise ValueError("text-conditioned scoring needs an adapter")
            ai = self.adapter.adapter_inputs([text])
            out = self._embed_adapter(self.vision_params, pixels,
                                      ai.params, ai.cross_states,
                                      ai.cross_mask)
        else:
            out = self._embed(self.vision_params, pixels)
        self._feature_cache[key] = out
        while len(self._feature_cache) > 16:
            self._feature_cache.popitem(last=False)
        return out

    def score(self, img1=None, img2=None, text1: Optional[str] = None,
              text2: Optional[str] = None) -> float:
        e1 = self.features(img1, text1)
        e2 = self.features(img2, text2)
        return float(jax.device_get(self._pair_score(e1, e2))[0])

    @staticmethod
    def _bucket(n: int) -> int:
        b = 1
        while b < n:
            b *= 2
        return b

    def score_against_async(self, imgs, ref_image=None,
                            text: Optional[str] = None):
        """Dispatch the wave-scoring program WITHOUT blocking on the
        result. Returns (device_array, k); slice the fetched array to
        [:k]. Lets the MCTS driver enqueue the encoder pass and keep
        dispatching decode steps behind it, overlapping the host round
        trip with device compute (JAX async dispatch)."""
        k = len(imgs)
        pix = np.stack([self._pixels(i) for i in imgs])
        b = self._bucket(k)
        if b > k:
            pix = np.concatenate(
                [pix, np.repeat(pix[-1:], b - k, axis=0)])
        ref = self.features(ref_image, text)              # LRU-cached
        return self._wave_score(
            self.vision_params, jnp.asarray(pix), ref), k

    def score_against(self, imgs, ref_image=None,
                      text: Optional[str] = None) -> np.ndarray:
        """Score a batch of renders against ONE (cached) reference input --
        the MCTS wave fast path. The render batch is padded to a power-of-
        two bucket so only O(log max_wave) programs ever compile."""
        dev, k = self.score_against_async(imgs, ref_image, text)
        return np.asarray(jax.device_get(dev))[:k]

    def score_batch(self, imgs1, imgs2) -> np.ndarray:
        """Batched image-pair scoring (bucketed to limit recompiles)."""
        k = len(imgs1)
        pix1 = np.stack([self._pixels(i) for i in imgs1])
        pix2 = np.stack([self._pixels(i) for i in imgs2])
        b = self._bucket(k)
        if b > k:
            pix1 = np.concatenate(
                [pix1, np.repeat(pix1[-1:], b - k, axis=0)])
            pix2 = np.concatenate(
                [pix2, np.repeat(pix2[-1:], b - k, axis=0)])
        e1 = self._embed(self.vision_params, jnp.asarray(pix1))
        e2 = self._embed(self.vision_params, jnp.asarray(pix2))
        return np.asarray(jax.device_get(self._pair_score(e1, e2)))[:k]

    # torchmetrics-style stateful interface -------------------------------

    def update(self, img1=None, img2=None, text1=None, text2=None) -> None:
        self._sum += self.score(img1, img2, text1, text2)
        self._n += 1

    def compute(self) -> float:
        if self._n == 0:
            raise RuntimeError("no updates")
        return self._sum / self._n

    def reset(self) -> None:
        self._sum, self._n = 0.0, 0

    def __call__(self, img1=None, img2=None, **kw) -> float:
        return self.score(img1, img2, **kw)
