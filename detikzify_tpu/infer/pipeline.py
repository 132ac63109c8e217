"""User-facing inference pipeline.

API surface matches reference ``DetikzifyPipeline``
(``detikzify/infer/generate.py:356-467``): ``sample()`` for one-shot
generation, ``simulate()`` for MCTS refinement yielding (score, TikzDocument)
tuples. Default hyperparameters are the reference's (T=0.8, top-p 0.95,
top-k 0; compile timeout 60 s; exploration 0.6).

Unlike the reference, one ``DecodeEngine`` (KV cache pool + compiled decode
programs) is shared across calls, so repeated sampling/simulation pays no
re-jit or re-allocation cost.
"""
from __future__ import annotations

from typing import Generator, Optional, Tuple, Union

from PIL import Image

from ..config import DetikzifyConfig
from ..engine import DecodeEngine
from ..evaluate.imagesim import ImageSim
from ..models.detikzify import Params
from ..ops.sampling import SamplingParams
from ..processing import DetikzifyProcessor
from ..utils.image import expand, load
from .generator import DetikzifyGenerator, ExplicitAbort
from .tikz import CompileService, TikzDocument

Numeric = Union[int, float]


class DetikzifyPipeline:
    def __init__(
        self,
        params: Params,
        cfg: DetikzifyConfig,
        processor: DetikzifyProcessor,
        *,
        # hyperparams based on "a systematic evaluation of large language
        # models of code" (reference generate.py:360-365)
        temperature: float = 0.8,
        top_p: float = 0.95,
        top_k: int = 0,
        compile_timeout: float = 60.0,   # same as old overleaf
        metric: Union[str, object] = "model",
        num_slots: int = 8,
        max_len: Optional[int] = None,
        exploration: float = 0.6,
        compile_workers: int = 4,
        speculate: int = 0,                # n-gram speculative decoding
        engine: Optional[DecodeEngine] = None,
        adapter=None,                      # AdapterBundle (TikZero)
    ):
        self.cfg = cfg
        self.processor = processor
        self.compile_timeout = compile_timeout
        self.exploration = exploration
        self.adapter = adapter
        self.engine = engine or DecodeEngine(
            params, cfg, num_slots=num_slots,
            max_len=max_len or min(processor.model_max_length,
                                   cfg.model_max_length),
            speculate=speculate,
            sampling=SamplingParams(temperature=temperature, top_p=top_p,
                                    top_k=top_k))
        if metric == "model":   # SelfSim on the model's own vision tower
            self.metric = ImageSim.from_detikzify(params, cfg,
                                                  processor=processor,
                                                  adapter=adapter)
        elif metric == "fast":  # compiler diagnostics only
            self.metric = None
        else:
            self.metric = metric
        self.compiler = CompileService(workers=compile_workers,
                                       timeout=compile_timeout)

    # ------------------------------------------------------------------

    def load(self, image: Union[Image.Image, str], preprocess: bool = True
             ) -> Image.Image:
        image = load(image)
        if preprocess:
            return expand(image, max(image.size), do_trim=True)
        return image

    def check_inputs(self, image, text) -> None:
        if text is not None and self.adapter is None:
            raise ValueError(
                "You need to load an adapter for textual inputs!")
        if image is None and text is None:
            raise ValueError("Either image or text (or both) required!")

    def _sampling_override(self, temperature, top_p, top_k):
        """Merge per-call sampling kwargs over the pipeline defaults --
        the reference's ``**gen_kwargs`` pass-through (generate.py:404,436).
        Traced into one compiled program: overrides never recompile."""
        if temperature is None and top_p is None and top_k is None:
            return None
        base = self.engine.sampling
        return base._replace(
            **{k: v for k, v in [("temperature", temperature),
                                 ("top_p", top_p), ("top_k", top_k)]
               if v is not None})

    def _generator(self, image, text, preprocess, *, metric=None,
                   mcts_timeout=None, control=None, on_token=None,
                   temperature=None, top_p=None, top_k=None,
                   exploration=None, compile_timeout=None,
                   **kw) -> DetikzifyGenerator:
        self.check_inputs(image, text)
        return DetikzifyGenerator(
            sampling=self._sampling_override(temperature, top_p, top_k),
            engine=self.engine,
            processor=self.processor,
            image=self.load(image, preprocess) if image is not None else None,
            text=text,
            metric=metric,
            compile_timeout=self.compile_timeout
            if compile_timeout is None else compile_timeout,
            mcts_timeout=mcts_timeout,
            exploration=self.exploration if exploration is None
            else exploration,
            compile_service=self.compiler,
            control=control,
            on_token=on_token,
            adapter=self.adapter,
            **kw,
        )

    def generator(
        self,
        image: Optional[Union[Image.Image, str]] = None,
        text: Optional[str] = None,
        preprocess: bool = True,
        **kw,
    ) -> DetikzifyGenerator:
        """Build a ``DetikzifyGenerator`` bound to this pipeline's engine
        without driving it -- for schedulers that own the search loop
        (serve.InferenceServer timeslices several searches and adjusts
        each generator's ``parallelism`` live). The caller must
        ``close()`` the generator when done."""
        return self._generator(image, text, preprocess, **kw)

    def sample(
        self,
        image: Optional[Union[Image.Image, str]] = None,
        text: Optional[str] = None,
        preprocess: bool = True,
        **kw,
    ) -> TikzDocument:
        """DeTikZify a raster image: sample a single TikZ program."""
        gen = self._generator(image, text, preprocess, **kw)
        try:
            return gen.sample()
        finally:
            gen.close()

    def sample_batch(
        self,
        images: list,
        preprocess: bool = True,
        max_new_tokens: Optional[int] = None,
        temperature: Optional[float] = None,
        top_p: Optional[float] = None,
        top_k: Optional[int] = None,
    ) -> list:
        """One-shot sampling for a mini-batch of figures.

        All figures' rollouts run concurrently over the engine's slots (one
        vision pass for the whole batch, continuous-batched decode) -- the
        TPU-native path for bulk inference (BASELINE.md config #2).
        """
        import jax.numpy as jnp
        import numpy as np

        pil = [self.load(img, preprocess) for img in images]
        out = self.processor(images=pil)
        embeds = self.engine.encode_image(jnp.asarray(out.pixel_values))
        # `is not None`, not truthiness: max_new_tokens=0 must mean "zero
        # new tokens" here exactly as it does on the singleton sample()
        # path, or the same request diverges depending on wave fusion
        max_new = (max_new_tokens if max_new_tokens is not None
                   else self.engine.max_len - 1 - out.input_ids.shape[1])

        queue = list(range(len(pil)))
        rollouts: dict = {}
        generated: dict = {}
        sampling = self._sampling_override(temperature, top_p, top_k)
        while queue or rollouts:
            n = min(self.engine.num_free_slots, len(queue))
            if n > 0:
                # burst-start one figure wave as a single fused program
                wave = [queue.pop(0) for _ in range(n)]
                ros = self.engine.start_many(
                    [[int(t) for t in out.input_ids[i]] for i in wave],
                    image_embeds=embeds[jnp.asarray(wave)],
                    max_new_tokens=max_new, sampling=sampling)
                rollouts.update(dict(zip(wave, ros)))
            self.engine.step()
            # release each rollout AS IT FINISHES: when the engine is
            # shared (serving interleaves sampling into an MCTS search's
            # slot remainder), waiting for the whole batch would pin every
            # slot this wave ever held -- with one free slot and a larger
            # queue that spins forever, since nothing else releases
            for i, ro in list(rollouts.items()):
                if ro.finished:
                    generated[i] = list(ro.token_ids[ro.prompt_len:])
                    self.engine.release(ro)
                    del rollouts[i]

        docs = []
        for i in range(len(pil)):
            code = self.processor.decode(generated[i],
                                         skip_special_tokens=True)
            docs.append(TikzDocument(code, timeout=self.compile_timeout,
                                     backend=self.compiler.backend))
        return docs

    def simulate(
        self,
        image: Optional[Union[Image.Image, str]] = None,
        text: Optional[str] = None,
        preprocess: bool = True,
        expansions: Optional[Numeric] = None,
        timeout: Optional[Numeric] = None,
        parallelism: int = 1,
        **kw,
    ) -> Generator[Tuple[Numeric, TikzDocument], None, None]:
        """DeTikZify with MCTS refinement: yields (score, doc) per rollout.

        ``parallelism > 1`` overlaps that many MCTS expansions on the
        engine's decode slots (TPU-native rollout throughput multiplier).
        """
        gen = self._generator(image, text, preprocess, metric=self.metric,
                              mcts_timeout=timeout or None, **kw)
        try:
            yield from gen.simulate(expansions or None,
                                    parallelism=parallelism)
        finally:
            gen.close()

    def __call__(self, *args, **kw) -> TikzDocument:
        return self.sample(*args, **kw)
