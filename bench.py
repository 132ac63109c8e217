"""Benchmark: TikZ decode throughput on one TPU chip.

Measures the engine's continuous-batched decode throughput (tokens/sec/chip)
on the DS-1.3b tracked config (BASELINE.md config #2) with an image prompt
(300 image tokens + bos), and compares against the reference execution model
-- batch-1 sequential decode with full prompt re-prefill per rollout, which
is exactly how the reference's HF GenerationMixin MCTS loop runs
(SURVEY §3.3 hot spots (1)-(2)).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
where vs_baseline is the throughput multiple over the reference execution
model measured on the same chip/model (reference publishes no absolute
numbers in-tree; BASELINE.md records `published: {}`).
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

DECODE_TOKENS = 128
SLOTS = 8


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def zero_params(cfg, dtype):
    from detikzify_tpu.models import detikzify

    shapes = jax.eval_shape(
        lambda: detikzify.init(jax.random.PRNGKey(0), cfg, dtype=dtype))
    zeros = jax.jit(
        lambda: jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes))
    return zeros()


def run_rollouts(engine, prompt, image_embeds, n, max_new, prefix=None):
    """Start n rollouts (staggered into available slots) and run to done.
    Returns (generated_tokens, wall_seconds, decode_steps)."""
    done_tokens = 0
    started = 0
    active = []
    t0 = time.time()
    steps = 0
    while started < n or active:
        while started < n and engine.num_active < engine.num_slots:
            ro = engine.start(list(prompt), image_embeds=image_embeds,
                              max_new_tokens=max_new, prefix=prefix,
                              lazy=True)
            active.append(ro)
            started += 1
        engine.step()
        steps += 1
        for ro in list(active):
            if ro.finished:
                done_tokens += ro.new_tokens
                engine.release(ro)
                active.remove(ro)
    jax.block_until_ready(engine.cache.k)
    return done_tokens, time.time() - t0, steps


def main():
    from detikzify_tpu.config import get_config
    from detikzify_tpu.engine import DecodeEngine
    from detikzify_tpu.ops.sampling import SamplingParams

    log(f"devices: {jax.devices()}")
    cfg = get_config("detikzify-ds-1.3b").replace(model_max_length=640)
    params = zero_params(cfg, jnp.bfloat16)
    from detikzify_tpu.ops.quant import quantize_params

    params = quantize_params(params)   # int8 serving config
    jax.block_until_ready(params.text["embed_tokens"])
    log("params ready")

    engine = DecodeEngine(
        params, cfg, num_slots=SLOTS, max_len=640, decode_block=32,
        sampling=SamplingParams(temperature=0.8, top_p=0.95, top_k=0))
    prompt = [cfg.image_token_id] * cfg.image_seq_len + [cfg.bos_token_id]
    image_embeds = jnp.zeros((1, cfg.image_seq_len, cfg.text.hidden_size),
                             jnp.bfloat16)

    # warmup: trigger prefill + decode + prefix-start compiles
    t0 = time.time()
    ro = engine.start(list(prompt), image_embeds=image_embeds,
                      max_new_tokens=4)
    while not ro.finished:
        engine.step()
    root_prefix = engine.store_prefix("root", ro, length=len(prompt))
    engine.release(ro)
    ro = engine.start(list(prompt), image_embeds=image_embeds,
                      max_new_tokens=4, prefix=root_prefix)
    while not ro.finished:
        engine.step()
    engine.release(ro)
    log(f"warmup (compiles) took {time.time() - t0:.1f}s")

    # reference execution model: batch-1, sequential rollouts
    seq_tokens, seq_time, _ = run_rollouts(
        engine, prompt, image_embeds, n=2, max_new=DECODE_TOKENS)
    # batch-1 forced: slots available but rollouts issued one at a time
    t0 = time.time()
    base_tokens = 0
    for _ in range(2):
        ro = engine.start(list(prompt), image_embeds=image_embeds,
                          max_new_tokens=DECODE_TOKENS)
        while not ro.finished:
            engine.step()
        base_tokens += ro.new_tokens
        engine.release(ro)
    base_time = time.time() - t0
    base_tps = base_tokens / base_time
    log(f"sequential batch-1: {base_tokens} tok in {base_time:.2f}s "
        f"= {base_tps:.1f} tok/s")

    # TPU-native: continuous-batched rollouts across all slots
    tokens, secs, steps = run_rollouts(
        engine, prompt, image_embeds, n=2 * SLOTS, max_new=DECODE_TOKENS,
        prefix=root_prefix)
    tps = tokens / secs
    log(f"batched x{SLOTS}: {tokens} tok in {secs:.2f}s = {tps:.1f} tok/s "
        f"({steps} steps)")

    # MCTS rollouts/min (secondary north-star metric, BASELINE.md): full
    # rollouts from the root with compile feedback, sequential (reference
    # execution order) vs parallel expansions. Hermetic compile backend
    # with LaTeX-like latency.
    from PIL import Image, ImageDraw

    from detikzify_tpu.infer import DetikzifyPipeline, set_backend
    from detikzify_tpu.infer.tikz import CompileResult
    from detikzify_tpu.processing import ByteTokenizer, DetikzifyProcessor

    class AlwaysFailBackend:
        def __init__(self, latency):
            self.latency = latency

        def compile(self, code, timeout=60):
            time.sleep(self.latency)
            return CompileResult(status=2, log="! Emergency stop.\n")

        def rasterize(self, pdf, size=420):
            return None

    set_backend(AlwaysFailBackend(0.5))
    tok = ByteTokenizer(vocab_size=cfg.text.vocab_size,
                        image_token_id=cfg.image_token_id,
                        bos_token_id=cfg.bos_token_id,
                        eos_token_id=cfg.eos_token_id,
                        pad_token_id=cfg.pad_token_id, model_max_length=640)
    pipe = DetikzifyPipeline(params, cfg,
                             DetikzifyProcessor(tok, cfg),
                             metric="fast", engine=engine)
    img = Image.new("RGB", (100, 100), "white")
    ImageDraw.Draw(img).rectangle([10, 10, 90, 90], outline="black")
    list(pipe.simulate(image=img, expansions=1, max_length=365))  # warmup
    rollout_rates = {}
    for par in (1, 8):
        t0 = time.time()
        list(pipe.simulate(image=img, expansions=16, parallelism=par,
                           max_length=365))
        rollout_rates[par] = 16 / (time.time() - t0) * 60
        log(f"mcts rollouts/min (parallelism={par}): "
            f"{rollout_rates[par]:.0f}")
    set_backend(None)
    log(f"mcts parallel speedup: {rollout_rates[8] / rollout_rates[1]:.2f}x")

    # p50 time-to-first-compile (north-star metric #3): hermetic compiler
    # where rollouts compile, parallel expansions
    from detikzify_tpu.evaluate.harness import (generate_until_compilable,
                                                p50_time_to_first_compile)
    from detikzify_tpu.infer.tikz import FakeBackend

    set_backend(FakeBackend(latency=0.5))
    ttfc = []
    for _ in range(3):
        r = generate_until_compilable(pipe, img, max_expansions=8)
        if r.compiled:
            ttfc.append(r.seconds)
    set_backend(None)
    if ttfc:
        log(f"p50 time-to-first-compile: "
            f"{p50_time_to_first_compile(ttfc):.2f}s (n={len(ttfc)})")

    print(json.dumps({
        "metric": "tikz_decode_tokens_per_sec_per_chip_ds13b",
        "value": round(tps, 2),
        "unit": "tokens/s",
        "vs_baseline": round(tps / base_tps, 3),
    }))


if __name__ == "__main__":
    main()
