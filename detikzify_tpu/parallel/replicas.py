"""Single-host replica-parallel inference: one model replica per chip.

The reference's multi-GPU eval protocol places ONE model replica per rank
and stripes the test set across ranks (reference ``examples/eval.py:
110-133``, torchrun). On TPU a single process drives every local chip of a
slice, so the TPU-native equivalent is in-process: parameters are
``device_put`` onto each chip, each chip hosts an independent
``DecodeEngine`` (its jitted programs dispatch on that chip's committed
arrays), and one host thread per replica drives the search/compile logic
-- device waits release the GIL, so R chips decode concurrently. Combined
with per-process sharding (``evaluate.harness.shard_indices``) across
hosts, MCTS rollout throughput scales linearly in chips: this is the
"v5e-8 = 8 replicas" leg of the north-star target (BASELINE.md).

Replica parallelism composes with, and is distinct from, the TP/FSDP
sharding in ``parallel.mesh``: models that fit one chip (all five tracked
configs, int8 8B included) replicate for throughput; models that do not
would shard over a sub-mesh instead.
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, List, Optional, Sequence

import jax

from ..config import DetikzifyConfig
from ..engine import DecodeEngine
from ..ops.sampling import SamplingParams


class ReplicaPool:
    """R independent pipelines, one per device, with work-stealing map."""

    def __init__(
        self,
        params,
        cfg: DetikzifyConfig,
        processor,
        *,
        devices: Optional[Sequence] = None,
        metric="fast",
        adapter=None,
        num_slots: int = 8,
        max_len: Optional[int] = None,
        temperature: float = 0.8,
        top_p: float = 0.95,
        top_k: int = 0,
        compile_timeout: float = 60.0,
        compile_workers: int = 4,
        speculate: int = 0,
    ):
        from ..infer.pipeline import DetikzifyPipeline

        self.devices = list(devices or jax.local_devices())
        assert self.devices, "no devices"
        self.pipelines: List[DetikzifyPipeline] = []
        for i, dev in enumerate(self.devices):
            p_i = jax.device_put(params, dev)
            engine = DecodeEngine(
                p_i, cfg, num_slots=num_slots,
                max_len=max_len or min(processor.model_max_length,
                                       cfg.model_max_length),
                sampling=SamplingParams(temperature=temperature,
                                        top_p=top_p, top_k=top_k),
                speculate=speculate, device=dev)
            # decorrelate sampling across replicas
            engine.rng = jax.device_put(jax.random.PRNGKey(i), dev)
            self.pipelines.append(DetikzifyPipeline(
                p_i, cfg, processor, engine=engine, metric=metric,
                adapter=adapter, compile_timeout=compile_timeout,
                compile_workers=compile_workers))

    def __len__(self) -> int:
        return len(self.pipelines)

    def run(self, fn: Callable, items: Sequence) -> List:
        """``results[i] = fn(pipeline, items[i])`` with each replica's
        pipeline owned exclusively by one worker thread; items are pulled
        from a shared queue (work stealing -- MCTS item times vary a lot).
        An item whose ``fn`` raises gets the exception object as its
        result; other items are unaffected."""
        results: List = [None] * len(items)
        todo: "queue.Queue[int]" = queue.Queue()
        for i in range(len(items)):
            todo.put(i)

        def worker(pipe):
            while True:
                try:
                    i = todo.get_nowait()
                except queue.Empty:
                    return
                try:
                    results[i] = fn(pipe, items[i])
                except Exception as e:  # noqa: BLE001 -- isolate items
                    results[i] = e
                except BaseException as e:
                    # record so no None row reaches callers, then stop this
                    # worker (KeyboardInterrupt etc. must not be swallowed
                    # into per-item results silently)
                    results[i] = e
                    raise

        threads = [threading.Thread(target=worker, args=(p,), daemon=True)
                   for p in self.pipelines[:max(1, len(items))]]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        return results

    def map_sample(self, images: Sequence, **kw) -> List:
        """One-shot ``pipeline.sample`` per image across replicas."""
        return self.run(lambda pipe, img: pipe.sample(image=img, **kw),
                        images)

    def map_until_compilable(self, images: Sequence, **kw) -> List:
        """Reference eval protocol per item (``examples/eval.py:95-106``)
        across replicas; kwargs forward to ``generate_until_compilable``."""
        from ..evaluate.harness import generate_until_compilable

        return self.run(
            lambda pipe, img: generate_until_compilable(pipe, img, **kw),
            images)
