"""Benchmark: TikZ decode throughput on one TPU chip.

Measures the engine's continuous-batched decode throughput (tokens/sec/chip)
on the DS-1.3b tracked config (BASELINE.md config #2) with an image prompt
(300 image tokens + bos), and compares against a LADDER of reference
execution models measured on the same chip (the reference publishes no
absolute numbers in-tree; BASELINE.md records `published: {}`):

  1. ds13b_reference_loop_tok_s -- the TRUE reference loop: bf16 weights
     (the reference stack's serving dtype), batch-1 on a single-slot
     engine, full prompt re-prefill per rollout, ONE HOST ROUND-TRIP PER
     TOKEN (HF GenerationMixin semantics, SURVEY §3.3 hot spots (1)-(2)).
  2. ds13b_batch1_bf16_tok_s -- the same but granted this engine's
     32-token block dispatch (removes the per-token sync the reference
     cannot avoid). ** vs_baseline uses THIS rung **: on this host the
     device link is a remote tunnel whose per-token RTT would flatter us
     unrepresentatively; rung 2 is maximally generous to the reference
     short of that (it measures at the bf16 weight-streaming bound).
  3. ds13b_batch1_tok_s -- our serving engine (int8+fusion, 8 slots) at
     batch-1 occupancy: what our own optimizations cost/buy at the
     reference's shape.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
with vs_baseline = value / ds13b_batch1_bf16_tok_s (rung 2).
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


def bench_image():
    """The fixed sketch input every MCTS section searches from."""
    from PIL import Image, ImageDraw

    img = Image.new("RGB", (100, 100), "white")
    ImageDraw.Draw(img).rectangle([10, 10, 90, 90], outline="black")
    return img


class AlwaysFailBackend:
    """Hermetic compile backend with LaTeX-like latency where every
    program errors (metric='fast' workload: the search runs on compiler
    diagnostics alone, no render/score pass)."""

    def __init__(self, latency):
        self.latency = latency

    def compile(self, code, timeout=60):
        from detikzify_tpu.infer.tikz import CompileResult

        time.sleep(self.latency)
        return CompileResult(status=2, log="! Emergency stop.\n")

    def rasterize(self, pdf, size=420):
        return None


def make_tokenizer(cfg, model_max_length=640):
    from detikzify_tpu.processing import ByteTokenizer

    return ByteTokenizer(vocab_size=cfg.text.vocab_size,
                         image_token_id=cfg.image_token_id,
                         bos_token_id=cfg.bos_token_id,
                         eos_token_id=cfg.eos_token_id,
                         pad_token_id=cfg.pad_token_id,
                         model_max_length=model_max_length)


def zero_int8_8b():
    """v2-8b int8 tree built DIRECTLY from shapes: materializing the full
    bf16 8B tree first (16 GB) cannot fit HBM."""
    from detikzify_tpu.config import get_config
    from detikzify_tpu.models import detikzify as _dtk
    from detikzify_tpu.ops.quant import fuse_projections, quantize_params

    cfg8 = get_config("detikzify-v2-8b").replace(model_max_length=640)
    shapes8 = jax.eval_shape(lambda: fuse_projections(quantize_params(
        _dtk.init(jax.random.PRNGKey(0), cfg8, dtype=jnp.bfloat16))))
    params8 = jax.jit(lambda: jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes8))()
    jax.block_until_ready(params8.text["embed_tokens"])
    return cfg8, params8


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


def train_bench():
    """TRAINING throughput (round-3 VERDICT directive #3): SURVEY L5 is a
    first-class workload; measure it, don't just run it. DS-1.3b full
    fine-tune shape: bf16 params, micro-batch 4 at seq 640 (300 image
    tokens + text), remat on, AdamW with blockwise-quantized 8-bit moment
    storage (train/step.py make_optimizer(moment_dtype="quant8"): fp32
    m+v for the 1.7B params would be ~13.6 GB alone and OOM this 16 GB
    chip; even bf16 moments left no room for a grad-accum carry);
    grad-accum scaling 1/2/4. One jitted step per global batch -- the
    microbatch loop is a scan INSIDE the step (perf-contract-pinned,
    test_perf_contracts.test_train_step_is_one_device_program).
    est. MFU uses the standard 6*N*T fwd+bwd flop model against the
    v5e bf16 peak (197 TFLOP/s); *_mfu_vs_peak re-anchors it on the
    MEASURED achievable rate (matmul_peak_tflops, a pure bf16 4096^3
    dot chain: 132-137 TF/s through this tunnel = ~68% of nominal).
    Measured MFU levers (r5): remat recompute is nearly free (the
    "dots" save-matmul-outputs policy recovers only ~1.5%: cost
    analysis shows it trims just 11% of flops -- attention einsums
    carry batch dims and the flash custom-VJP is opaque to policies),
    attn_impl="xla" beats the Pallas flash kernel by ~1.5% on the
    training shape, no-remat grad OOMs, and the barrier fetch is
    already amortized (reps 3 vs 8 within noise) -- the residual gap
    to the dense-matmul rate is XLA's backward efficiency at d=2048,
    not recompute or measurement.

    Runs as a SUBPROCESS (``bench.py --train-bench``) dispatched before
    the parent touches the device: full fine-tune state near-fills HBM,
    and a ResourceExhausted raised mid-bench pins its arrays in the
    frame -- process isolation guarantees the serving benchmarks below
    start with a clean chip either way. Prints one JSON line."""
    import gc

    from detikzify_tpu.config import get_config
    from detikzify_tpu.train.step import (init_state, make_optimizer,
                                          make_train_step, trainable_mask)

    cfg = get_config("detikzify-ds-1.3b").replace(model_max_length=640)
    train_stats = {}
    micro, seq = 4, 640
    ids_t = np.full((micro, seq), cfg.image_token_id, np.int32)
    ids_t[:, cfg.image_seq_len] = cfg.bos_token_id
    ids_t[:, cfg.image_seq_len + 1:] = 7
    labels_t = np.where(ids_t == cfg.image_token_id, -100, ids_t)
    pixels_t = np.zeros((micro, cfg.vision.image_size,
                         cfg.vision.image_size, 3), np.float32)
    n_params = sum(
        np.prod(s.shape) for s in jax.tree.leaves(jax.eval_shape(
            lambda: __import__(
                "detikzify_tpu.models.detikzify",
                fromlist=["init"]).init(
                    jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16))))
    def measure_ga(ga: int, mode: str, mb: int = None, remat=True,
                   attn: str = "auto", suffix: str = "") -> None:
        """mode 'all' = full fine-tune (reference train/train.py);
        'projector' = stage-1 connector pretrain (reference
        train/pretrain.py: every tower frozen, only the connector
        trains -- grads still flow through the whole text tower).
        ``mb`` overrides the micro-batch; ``remat`` is the policy
        (True = full, "dots" = save matmul outputs); ``attn`` selects
        the attention impl (measured: "xla" beats the Pallas flash
        kernel by ~4% on the training shape); ``suffix`` tags the
        emitted stat keys for variant legs."""
        mb = mb or micro
        reps_mb = -(-mb // micro)
        ids_m = np.tile(ids_t, (reps_mb, 1))[:mb]
        labels_m = np.tile(labels_t, (reps_mb, 1))[:mb]
        pixels_m = np.tile(pixels_t, (reps_mb, 1, 1, 1))[:mb]
        params_t = zero_params(cfg, jnp.bfloat16)
        # quant8 (blockwise 8-bit) Adam moments for the full fine-tune:
        # 3.4 GB for m+v instead of 6.8 GB bf16 / 13.6 GB fp32 -- the
        # HBM that lets ga>=2 carry a grad-accumulation tree on chip
        optimizer = make_optimizer(
            2e-5, total_steps=100,
            trainable=trainable_mask(params_t, mode),
            moment_dtype="quant8" if mode == "all" else None)
        state = init_state(params_t, optimizer)
        del params_t
        step = jax.jit(make_train_step(cfg, optimizer, grad_accum=ga,
                                       remat=remat, attn_impl=attn),
                       donate_argnums=0)
        batch_t = {
            "input_ids": jnp.asarray(np.tile(ids_m, (ga, 1))),
            "labels": jnp.asarray(np.tile(labels_m, (ga, 1))),
            "pixel_values": jnp.asarray(
                np.tile(pixels_m, (ga, 1, 1, 1))),
        }
        t0 = time.time()
        state, metrics = step(state, batch_t)
        # fetch the VALUE, not block_until_ready: on the tunneled axon
        # backend block_until_ready returns before the program finishes
        # (measured 1 ms/"step" = pure dispatch), a host copy is the
        # only reliable barrier
        float(metrics["loss"])
        log(f"train[{mode}{suffix}] ga={ga}: compile+first step "
            f"{time.time() - t0:.1f}s")
        # steps chain device-side (donated state); the single value fetch
        # at the end is the barrier. The tunnel's host round-trip
        # (~100-150 ms) amortizes over reps -- at reps=3 it inflated every
        # step by ~35-50 ms, so scale reps down only as ga grows.
        reps = max(3, 8 // ga)
        t0 = time.time()
        for _ in range(reps):
            state, metrics = step(state, batch_t)
        float(metrics["loss"])
        sec = (time.time() - t0) / reps
        toks = ga * mb * seq
        # flop model: full FT fwd+bwd = 6*N*T; projector pretrain skips
        # the frozen towers' WEIGHT-grad matmuls but still runs fwd +
        # full activation backward = ~4*N*T
        flops_per_tok = (6 if mode == "all" else 4) * float(n_params)
        mfu = flops_per_tok * toks / sec / 197e12
        key = ("train" if mode == "all" else "pretrain") + suffix
        train_stats[f"{key}_step_ms_ga{ga}"] = round(sec * 1e3, 1)
        train_stats[f"{key}_tok_s_ga{ga}"] = round(toks / sec, 1)
        train_stats[f"{key}_est_mfu_ga{ga}"] = round(mfu, 3)
        log(f"train[{mode}{suffix}] ds13b micro{mb} ga{ga}: "
            f"{sec * 1e3:.0f} ms/step, {toks / sec:.0f} tok/s, "
            f"est MFU {mfu:.1%}")

    # Full fine-tune grad-accum ladder ON CHIP (round-4 VERDICT directive
    # #4): quant8 Adam moments free ~5 GB vs the bf16-moment config that
    # OOM'd at ga=2 (18.07G/15.75G), so the full-FT ladder now runs
    # directly. Variant legs probe the MFU headroom: remat="dots" trades
    # dot-output memory for ~25% less backward recompute; micro8 doubles
    # the per-program batch.
    legs = (
        dict(ga=1, mode="all"),
        dict(ga=2, mode="all"),
        dict(ga=4, mode="all"),
        dict(ga=1, mode="all", remat="dots", suffix="_dots"),
        dict(ga=1, mode="all", attn="xla", suffix="_xla"),
        dict(ga=1, mode="all", mb=8, suffix="_micro8"),
        dict(ga=1, mode="all", mb=8, remat="dots", suffix="_micro8_dots"),
        dict(ga=1, mode="projector"),
        dict(ga=2, mode="projector"),
        dict(ga=4, mode="projector"),
    )
    for leg in legs:
        for attempt in (0, 1):
            try:
                measure_ga(**leg)
                break
            except Exception as e:
                log(f"train leg {leg} attempt {attempt} failed: "
                    f"{type(e).__name__}: {e}")
                # the axon remote_compile helper 500s transiently; one
                # retry, then move on (a genuine OOM fails both tries)
            finally:
                gc.collect()

    # Speed-of-light anchor: a pure dense bf16 4096^3 matmul chain -- the
    # chip's ACHIEVABLE compute rate through this tunnel (measured 132-137
    # TF/s vs the 197 TF/s v5e nominal, i.e. ~68-70%). The honest MFU
    # denominator for "how well does the training step use this device":
    # *_mfu_vs_peak = est_mfu * 197 / matmul_peak.
    try:
        n = 4096
        a = jnp.zeros((n, n), jnp.bfloat16)
        b = jnp.zeros((n, n), jnp.bfloat16)

        @jax.jit
        def chain(a, b):
            x = a
            for _ in range(32):
                x = jnp.dot(x, b, preferred_element_type=jnp.bfloat16)
            return x

        t0 = time.time()
        float(chain(a, b)[0, 0])
        log(f"matmul_peak compile+first {time.time() - t0:.1f}s")
        t0 = time.time()
        for _ in range(3):
            out = chain(a, b)
        float(out[0, 0])
        sec = (time.time() - t0) / 3
        peak = 32 * 2 * n ** 3 / sec / 1e12
        train_stats["matmul_peak_tflops"] = round(peak, 1)
        log(f"matmul speed-of-light: {peak:.1f} TF/s "
            f"({peak / 197:.0%} of v5e nominal)")
        for k in [k for k in train_stats if "_est_mfu_" in k]:
            train_stats[k.replace("_est_mfu_", "_mfu_vs_peak_")] = round(
                train_stats[k] * 197.0 / peak, 3)
    except Exception as e:
        log(f"matmul_peak leg failed: {type(e).__name__}: {e}")
    print(json.dumps(train_stats), flush=True)


def seven_bench():
    """BASELINE tracked config #3: DS-7b STREAMING inference -- int8
    continuous-batched decode with a per-token streaming consumer
    attached to every rollout (the webui/SSE path). Isolated subprocess:
    the 7B tree needs a clean chip.

    HBM audit: the int8 tree must be built DIRECTLY from shapes (like
    the 8B section) -- materializing the 6.7B bf16 tree first (13.4 GB)
    before quantizing transiently needs ~20 GB and ResourceExhausts the
    15.75 GB chip. The KV pool itself is cheap (MHA 30-layer page =
    2*30*128*32*128*2B = 63 MB; 51 pages = 3.2 GB at 8 slots x 640)."""
    from detikzify_tpu.config import get_config
    from detikzify_tpu.engine import DecodeEngine
    from detikzify_tpu.models import detikzify as _dtk
    from detikzify_tpu.ops.quant import fuse_projections, quantize_params
    from detikzify_tpu.ops.sampling import SamplingParams

    slots7 = SLOTS
    cfg7 = get_config("detikzify-ds-7b").replace(model_max_length=640)
    shapes7 = jax.eval_shape(lambda: fuse_projections(quantize_params(
        _dtk.init(jax.random.PRNGKey(0), cfg7, dtype=jnp.bfloat16))))
    params7 = jax.jit(lambda: jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes7))()
    jax.block_until_ready(params7.text["embed_tokens"])
    eng7 = DecodeEngine(
        params7, cfg7, num_slots=slots7, max_len=640, decode_block=32,
        prefix_budget_bytes=64 << 20,
        sampling=SamplingParams(temperature=0.8, top_p=0.95, top_k=0))
    p7 = ([cfg7.image_token_id] * cfg7.image_seq_len
          + [cfg7.bos_token_id])
    emb7 = jnp.zeros((1, cfg7.image_seq_len, cfg7.text.hidden_size),
                     jnp.bfloat16)
    streams = [[] for _ in range(2 * slots7)]

    def run_streaming(n, max_new):
        done_tokens, started, active = 0, 0, []
        t0 = time.time()
        while started < n or active:
            while started < n and eng7.num_free_slots > 0:
                ro = eng7.start(
                    list(p7), image_embeds=emb7, max_new_tokens=max_new,
                    lazy=True, on_token=streams[started].append)
                active.append(ro)
                started += 1
            eng7.step()
            for ro in list(active):
                if ro.finished:
                    done_tokens += ro.new_tokens
                    eng7.release(ro)
                    active.remove(ro)
        jax.block_until_ready(eng7.cache.k)
        return done_tokens, time.time() - t0

    run_streaming(slots7, 16)                       # warmup (compiles)
    tps = 0.0
    for _ in range(2):
        for s in streams:
            s.clear()
        tok7, sec7 = run_streaming(2 * slots7, DECODE_TOKENS)
        assert sum(len(s) for s in streams) == tok7  # consumers saw all
        tps = max(tps, tok7 / sec7)
    log(f"ds-7b int8 streaming decode (x{slots7} slots, per-token "
        f"consumers): {tps:.1f} tok/s")
    print(json.dumps({"ds7b_stream_tok_s": round(tps, 2)}), flush=True)


def tl_bench():
    """BASELINE tracked config #1: TL-1.1b single-figure GREEDY sampling
    (the v1 legacy model family) -- batch-1 greedy decode tok/s.
    Isolated subprocess for the same clean-chip reason as seven_bench."""
    from detikzify_tpu.config import get_config
    from detikzify_tpu.engine import DecodeEngine
    from detikzify_tpu.ops.quant import fuse_projections, quantize_params
    from detikzify_tpu.ops.sampling import SamplingParams

    cfg_tl = get_config("detikzify-tl-1.1b").replace(model_max_length=640)
    params_tl = fuse_projections(quantize_params(
        zero_params(cfg_tl, jnp.bfloat16)))
    eng_tl = DecodeEngine(
        params_tl, cfg_tl, num_slots=2, max_len=640, decode_block=32,
        prefix_budget_bytes=16 << 20,
        sampling=SamplingParams(temperature=0.0))
    p_tl = ([cfg_tl.image_token_id] * cfg_tl.image_seq_len
            + [cfg_tl.bos_token_id])
    emb_tl = jnp.zeros(
        (1, cfg_tl.image_seq_len, cfg_tl.text.hidden_size), jnp.bfloat16)
    run_rollouts(eng_tl, p_tl, emb_tl, n=1, max_new=8)     # warmup
    tps = 0.0
    for _ in range(2):
        tok_tl, sec_tl, _ = run_rollouts(eng_tl, p_tl, emb_tl, n=1,
                                         max_new=DECODE_TOKENS)
        tps = max(tps, tok_tl / sec_tl)
    log(f"tl-1.1b greedy batch-1 decode: {tps:.1f} tok/s")
    print(json.dumps({"tl11b_greedy_batch1_tok_s": round(tps, 2)}),
          flush=True)


def eight_bench():
    """BASELINE tracked config #4: v2-8b int8 decode + MCTS refinement on
    one chip. Isolated subprocess (round-4 VERDICT directive #2): in-process
    this section shared HBM/arena state with the spec + TikZero legs and one
    RESOURCE_EXHAUSTED nulled all of them."""
    from detikzify_tpu.engine import DecodeEngine
    from detikzify_tpu.infer import DetikzifyPipeline, set_backend
    from detikzify_tpu.ops.sampling import SamplingParams
    from detikzify_tpu.processing import DetikzifyProcessor

    out = {}
    cfg8, params8 = zero_int8_8b()
    param_bytes = sum(x.nbytes for x in jax.tree.leaves(params8))
    eng8 = DecodeEngine(
        params8, cfg8, num_slots=SLOTS, max_len=640, decode_block=32,
        prefix_budget_bytes=64 << 20,   # small page pool: HBM is tight
        sampling=SamplingParams(temperature=0.8, top_p=0.95, top_k=0))
    p8 = [cfg8.image_token_id] * cfg8.image_seq_len
    emb8 = jnp.zeros((1, cfg8.image_seq_len, cfg8.text.hidden_size),
                     jnp.bfloat16)
    run_rollouts(eng8, p8, emb8, n=SLOTS, max_new=16)   # warmup
    tps_8b = 0.0
    for _ in range(2):
        tok8, sec8, steps8 = run_rollouts(eng8, p8, emb8, n=SLOTS,
                                          max_new=64)
        tps_8b = max(tps_8b, tok8 / sec8)
    out["v2_8b_int8_tok_s"] = round(tps_8b, 2)
    # model-level HBM traffic estimate: every decode_block step streams
    # the full weight set once (weights dominate at batch<=8) plus the
    # KV rows read/written; utilization = estimate / v5e peak (819GB/s)
    tcfg = cfg8.text
    kv_bytes_step = (tcfg.num_hidden_layers * 2 * SLOTS * 640
                     * tcfg.num_key_value_heads * tcfg.head_dim * 2)
    scans = -(-64 // 32)  # decode blocks per rollout wave
    hbm_gbps = (param_bytes + kv_bytes_step) * 32 * scans / sec8 / 1e9
    out["v2_8b_est_hbm_gbps"] = round(hbm_gbps, 1)
    log(f"v2-8b int8 decode: {tok8} tok in {sec8:.2f}s = {tps_8b:.1f} "
        f"tok/s; est. HBM {hbm_gbps:.0f} GB/s "
        f"({hbm_gbps / 819 * 100:.0f}% of v5e peak)")
    # v2-8b MCTS rollouts/min (workload: metric='fast' diagnostics-only
    # scoring + AlwaysFailBackend 0.5 s hermetic compile)
    try:
        set_backend(AlwaysFailBackend(0.5))
        pipe8b = DetikzifyPipeline(
            params8, cfg8, DetikzifyProcessor(make_tokenizer(cfg8), cfg8),
            metric="fast", engine=eng8, compile_workers=8)
        img = bench_image()
        list(pipe8b.simulate(image=img, expansions=1, max_length=365))
        best8 = 0.0
        for _ in range(2):
            t0 = time.time()
            list(pipe8b.simulate(image=img, expansions=8,
                                 parallelism=8, max_length=365))
            best8 = max(best8, 8 / (time.time() - t0) * 60)
        out["v2_8b_mcts_rollouts_min_par8"] = round(best8, 1)
        log(f"v2-8b mcts rollouts/min (parallelism=8, metric=fast, "
            f"AlwaysFailBackend): {best8:.0f}")
    except Exception as e:
        log(f"8B MCTS bench skipped: {type(e).__name__}: {e}")
    finally:
        set_backend(None)
    print(json.dumps(out), flush=True)


def eight_spec_bench():
    """v2-8b speculative ceiling (isolated subprocess): the verify forward
    reads the same weights for K+1 tokens, so the bandwidth-bound 8B
    config gains the full acceptance multiple (block 16: less scan-tail
    waste when rollouts finish in few speculative steps)."""
    from detikzify_tpu.engine import DecodeEngine
    from detikzify_tpu.ops.sampling import SamplingParams

    cfg8, params8 = zero_int8_8b()
    p8 = [cfg8.image_token_id] * cfg8.image_seq_len
    emb8 = jnp.zeros((1, cfg8.image_seq_len, cfg8.text.hidden_size),
                     jnp.bfloat16)
    eng8s = DecodeEngine(
        params8, cfg8, num_slots=SLOTS, max_len=640,
        decode_block=16, speculate=4, spec_min_rate=0.0,
        prefix_budget_bytes=64 << 20,
        sampling=SamplingParams(temperature=0.0))
    run_rollouts(eng8s, p8, emb8, n=SLOTS, max_new=16)
    tps = 0.0
    for _ in range(2):
        tok8s, sec8s, _ = run_rollouts(eng8s, p8, emb8, n=SLOTS,
                                       max_new=128)
        tps = max(tps, tok8s / sec8s)
    log(f"v2-8b int8 speculative (greedy, full acceptance): "
        f"{tps:.1f} tok/s (rate {eng8s.spec_rate:.2f})")
    print(json.dumps({"v2_8b_spec4_greedy_tok_s": round(tps, 2)}),
          flush=True)


def tikzero_bench():
    """BASELINE tracked config #5: TikZero text-conditioned generation on
    v2-8b (isolated subprocess). Measures (a) conditioning cost: frozen
    caption embedder forward + vision tower WITH gated cross-attention on
    the learnable blank image (reference adapter/__init__.py:6-22 +
    modeling_adapter.py:398-537); (b) text-conditioned MCTS search
    throughput with SelfSim scoring; (c) the SAME-backend image-only MCTS
    rate on the same engine, so the text-conditioning delta is isolated
    (round-4 VERDICT directive #3). Phase stats are logged per run so a
    gap can be attributed (t_launch/t_step/t_resolve/score_time)."""
    from detikzify_tpu.config import AdapterConfig, TextConfig
    from detikzify_tpu.engine import DecodeEngine
    from detikzify_tpu.infer import (DetikzifyPipeline, FakeBackend,
                                     set_backend)
    from detikzify_tpu.models import adapter as adapter_mod
    from detikzify_tpu.models.adapter import dummy_pixels
    from detikzify_tpu.models import llama as llama_mod
    from detikzify_tpu.models.embedding import AdapterBundle
    from detikzify_tpu.ops.sampling import SamplingParams
    from detikzify_tpu.processing import DetikzifyProcessor

    out = {}
    cfg8, params8 = zero_int8_8b()
    tok8b = make_tokenizer(cfg8)
    acfg = AdapterConfig()
    aparams = adapter_mod.init(jax.random.PRNGKey(3), cfg8.vision,
                               acfg, dtype=jnp.bfloat16)
    # caption embedder at the REAL shapes (Llama-3.2-1B dims)
    embed_cfg = TextConfig(
        vocab_size=cfg8.text.vocab_size, hidden_size=2048,
        intermediate_size=8192, num_hidden_layers=16,
        num_attention_heads=32, num_key_value_heads=8,
        max_position_embeddings=2048, rope_theta=500000.0)
    embed_params = jax.jit(lambda: jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype),
        jax.eval_shape(lambda: llama_mod.init(
            jax.random.PRNGKey(4), embed_cfg, dtype=jnp.bfloat16))))()
    bundle = AdapterBundle(
        adapter_params=aparams, adapter_cfg=acfg,
        embed_params=embed_params, embed_cfg=embed_cfg,
        tokenizer=tok8b, max_length=64)
    cfg8a = cfg8.replace(adapter=acfg)   # adapter-aware encode_image
    eng_ad = DecodeEngine(
        params8, cfg8a, num_slots=8, max_len=384, decode_block=32,
        prefix_budget_bytes=16 << 20,
        sampling=SamplingParams(temperature=0.8, top_p=0.95, top_k=0))
    caption = "a bar chart of quarterly revenue by region"

    def condition():
        ai = bundle.adapter_inputs([caption])
        emb = eng_ad.encode_image(
            jnp.asarray(dummy_pixels(aparams, 1)), adapter_inputs=ai)
        # true completion barrier: fetch a scalar (on the axon tunnel
        # block_until_ready returns at dispatch, not completion)
        jax.device_get(emb[0, 0, 0])
        return emb

    t0 = time.time()
    emb_txt = condition()                       # compile
    log(f"tikzero conditioning warmup took {time.time() - t0:.1f}s")
    cond_ms = []
    for _ in range(3):
        t0 = time.time()
        condition()
        cond_ms.append((time.time() - t0) * 1e3)
    out["tikzero_condition_ms"] = round(min(cond_ms), 1)
    # text-conditioned rollout end-to-end on-chip (non-fatal: the
    # conditioning number above must survive a decode-leg failure)
    try:
        cap_ids = tok8b.encode(caption) + [cfg8.bos_token_id]
        p_txt = ([cfg8.image_token_id] * cfg8.image_seq_len
                 + [int(t) for t in cap_ids])
        ro = eng_ad.start(list(p_txt), image_embeds=emb_txt,
                          max_new_tokens=32)
        while not ro.finished:
            eng_ad.step()
        assert ro.new_tokens > 0
        eng_ad.release(ro)
        log(f"tikzero text-conditioned path: conditioning "
            f"{out['tikzero_condition_ms']:.1f} ms, rollout ok "
            f"({ro.new_tokens} tok)")
    except Exception as e:
        log(f"tikzero rollout check skipped: {type(e).__name__}: {e}")

    # MCTS search throughput, text-conditioned vs image-only on the SAME
    # engine/backend/metric (FakeBackend 0.5 s + SelfSim wave scoring)
    img = bench_image()

    def measure_search(pipe, label, key, text=None):
        list(pipe.simulate(image=img, text=text, expansions=1,
                           max_length=365))          # warmup compiles
        best, stats = 0.0, None
        for _ in range(2):
            gen = pipe.generator(image=img, text=text,
                                 metric=pipe.metric, mcts_timeout=None,
                                 max_length=365)
            try:
                t0 = time.time()
                for _o in gen.simulate(8, parallelism=8):
                    pass
                # decoded rollouts, not yields: terminal compile-only leaf
                # revisits re-stream existing programs (VERDICT r4 #1)
                rate = gen.stats["rollouts"] / (time.time() - t0) * 60
                if rate > best:
                    best, stats = rate, dict(gen.stats)
            finally:
                gen.close()
        log(f"{label}: {best:.0f} rollouts/min (parallelism=8, SelfSim, "
            f"FakeBackend)")
        if stats:
            log(f"  phase split: launch {stats['t_launch']:.2f}s step "
                f"{stats['t_step']:.2f}s resolve {stats['t_resolve']:.2f}s "
                f"score {stats['score_time']:.2f}s compile "
                f"{stats['compile_time']:.2f}s; {stats['rollouts']} "
                f"rollouts, {stats['rollout_tokens']} tok")
        out[key] = round(best, 1)

    try:
        set_backend(FakeBackend(latency=0.5))
        pipe_tz = DetikzifyPipeline(
            params8, cfg8a, DetikzifyProcessor(tok8b, cfg8a),
            metric="model", engine=eng_ad, adapter=bundle,
            compile_workers=8)
        measure_search(pipe_tz, "v2-8b image-only mcts (same backend)",
                       "v2_8b_mcts_rollouts_min_par8_selfsim")
        measure_search(pipe_tz, "tikzero text-conditioned mcts",
                       "tikzero_mcts_rollouts_min_par8", text=caption)
    except Exception as e:
        # a search-leg failure (HBM-tight 8B+adapter) must not discard
        # the conditioning number already in `out`
        log(f"tikzero mcts bench skipped: {type(e).__name__}: {e}")
    finally:
        set_backend(None)
    print(json.dumps(out), flush=True)


def serve_bench_leg():
    """Mixed-workload serving numbers ON CHIP (round-4 VERDICT directive
    #6): run examples/serve_bench.py (full shape) as a subprocess and
    persist its idle + mixed latency numbers into the bench extras."""
    import os
    import subprocess

    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "examples", "serve_bench.py")
    try:
        proc = subprocess.run(
            [sys.executable, script], capture_output=True, text=True,
            timeout=2400)
        sys.stderr.write(proc.stderr)
        sys.stderr.write(proc.stdout)
        if proc.returncode != 0:
            log(f"serve bench failed (exit {proc.returncode})")
            return {}
        for line in reversed(proc.stdout.splitlines()):
            line = line.strip()
            if line.startswith("{"):
                r = json.loads(line)
                keep = ("requests_per_min", "decode_tok_s",
                        "fused_fraction", "sample_p50_s", "sample_p95_s",
                        "mixed_sample_p50_s", "mixed_sample_p95_s",
                        "mixed_vs_idle_p95", "mcts_candidates_during_mix")
                return {f"serve_{k}": r[k] for k in keep if k in r}
        return {}
    except Exception as e:
        log(f"serve bench skipped: {type(e).__name__}: {e}")
        return {}


def run_bench_subprocess(flag: str, timeout: float = 1800) -> dict:
    """Dispatch ``bench.py <flag>`` as a child process and parse its JSON
    line. Must run BEFORE the parent initializes the TPU client (the
    tunneled chip is exclusive; the child needs it to itself)."""
    import subprocess

    try:
        proc = subprocess.run(
            [sys.executable, __file__, flag],
            capture_output=True, text=True, timeout=timeout)
        sys.stderr.write(proc.stderr)
        if proc.returncode != 0:
            log(f"{flag} bench subprocess failed (exit {proc.returncode})")
            return {}
        for line in reversed(proc.stdout.splitlines()):
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)
        return {}
    except Exception as e:
        log(f"{flag} bench subprocess skipped: {type(e).__name__}: {e}")
        return {}


def main():
    from detikzify_tpu.config import get_config
    from detikzify_tpu.engine import DecodeEngine
    from detikzify_tpu.ops.sampling import SamplingParams

    # isolated-subprocess benches first, BEFORE this process claims the
    # (exclusive) chip: training (near-fills HBM; an OOM must not poison
    # the serving benches), tracked configs #3/#1 (the 7B/1.1B trees need
    # a clean chip), the three 8B-class legs (round-4 VERDICT directive
    # #2: one RESOURCE_EXHAUSTED must not cascade across them), and the
    # serving front-end load test (directive #6).
    train_stats = run_bench_subprocess("--train-bench")
    seven_stats = run_bench_subprocess("--seven-bench")
    tl_stats = run_bench_subprocess("--tl-bench")
    eight_stats = run_bench_subprocess("--eight-bench", timeout=2400)
    eight_spec_stats = run_bench_subprocess("--eight-spec-bench",
                                            timeout=2400)
    tikzero_stats = run_bench_subprocess("--tikzero-bench", timeout=3000)
    serve_stats = serve_bench_leg()

    log(f"devices: {jax.devices()}")
    cfg = get_config("detikzify-ds-1.3b").replace(model_max_length=640)
    params_bf16 = zero_params(cfg, jnp.bfloat16)
    from detikzify_tpu.ops.quant import fuse_projections, quantize_params

    # int8 serving config + fused qkv/gate-up projections (measured +1.4%
    # at the 16-slot/128-block headline shape; exactness-tested transform)
    params = fuse_projections(quantize_params(params_bf16))
    jax.block_until_ready(params.text["embed_tokens"])
    log("params ready")

    # ---- reference execution model (the vs_baseline denominator): bf16
    # weights, batch-1 on a SINGLE-slot engine (the reference's forward
    # carries exactly one sequence -- no other slots' KV rows in the
    # scan), full prompt re-prefill per rollout. bf16 is what the
    # reference serves (BASELINE.md "Reference SW stack"); int8+fusion
    # below are THIS framework's optimizations and must not credit the
    # baseline. Still generous: block dispatch instead of per-token sync.
    import gc

    def measure_batch1(eng, prompt, embeds, reps=2):
        """Timed sequential rollouts, one at a time, full re-prefill."""
        t0 = time.time()
        tokens = 0
        for _ in range(reps):
            ro = eng.start(list(prompt), image_embeds=embeds,
                           max_new_tokens=DECODE_TOKENS)
            while not ro.finished:
                eng.step()
            tokens += ro.new_tokens
            eng.release(ro)
        return tokens, time.time() - t0

    eng_base = DecodeEngine(
        params_bf16, cfg, num_slots=1, max_len=640, decode_block=32,
        sampling=SamplingParams(temperature=0.8, top_p=0.95, top_k=0))
    image_embeds_bf16 = jnp.zeros(
        (1, cfg.image_seq_len, cfg.text.hidden_size), jnp.bfloat16)
    prompt = [cfg.image_token_id] * cfg.image_seq_len + [cfg.bos_token_id]
    t0 = time.time()
    ro = eng_base.start(list(prompt), image_embeds=image_embeds_bf16,
                        max_new_tokens=4)
    while not ro.finished:
        eng_base.step()
    eng_base.release(ro)
    log(f"bf16 baseline warmup (compiles) took {time.time() - t0:.1f}s")
    base_tokens, base_secs = measure_batch1(eng_base, prompt,
                                            image_embeds_bf16)
    base_bf16_tps = base_tokens / base_secs
    log(f"reference execution model (bf16, batch-1, re-prefill): "
        f"{base_tokens} tok = {base_bf16_tps:.1f} tok/s")
    del eng_base

    # the TRUE reference loop additionally pays ONE HOST ROUND-TRIP PER
    # TOKEN (HF GenerationMixin fetches each sampled token into Python
    # before the next forward -- SURVEY §3.3 hot spot (2)). decode_block=1
    # with the engine's synchronous step() reproduces exactly that.
    # Reported for the record; vs_baseline deliberately does NOT use this
    # rung because this host's device link is a remote tunnel whose RTT
    # would flatter us unrepresentatively.
    base_loop_tps = None
    eng_tok = None
    try:
        eng_tok = DecodeEngine(
            params_bf16, cfg, num_slots=1, max_len=640, decode_block=1,
            sampling=SamplingParams(temperature=0.8, top_p=0.95,
                                    top_k=0))
        ro = eng_tok.start(list(prompt), image_embeds=image_embeds_bf16,
                           max_new_tokens=4)
        while not ro.finished:
            eng_tok.step()
        eng_tok.release(ro)
        toks_l, secs_l = measure_batch1(eng_tok, prompt,
                                        image_embeds_bf16, reps=1)
        base_loop_tps = toks_l / secs_l
        log(f"true reference loop (bf16, batch-1, 1 host sync/token): "
            f"{base_loop_tps:.1f} tok/s")
    except Exception as e:
        log(f"per-token loop baseline skipped: {type(e).__name__}: {e}")
    finally:
        eng_tok = None   # free HBM even when the measurement failed
    del image_embeds_bf16, params_bf16, ro
    gc.collect()

    engine = DecodeEngine(
        params, cfg, num_slots=SLOTS, max_len=640, decode_block=32,
        sampling=SamplingParams(temperature=0.8, top_p=0.95, top_k=0))
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

    # our stack at the reference's execution SHAPE (batch-1, re-prefill)
    # but with int8+fusion on (and the 8-slot serving engine): how much
    # the serving optimizations alone buy
    base_tokens, base_time = measure_batch1(engine, prompt, image_embeds)
    base_tps = base_tokens / base_time
    log(f"int8 batch-1 (ours, serving engine): {base_tokens} tok in "
        f"{base_time:.2f}s = {base_tps:.1f} tok/s")

    # TPU-native HEADLINE: continuous-batched rollouts on the measured-best
    # serving shape (16 slots, 128-step decode blocks; 32 slots measured
    # WORSE -- 748 vs 835 tok/s). Best of 3 waves -- remote-tunnel
    # run-to-run variance is ~10%.
    eng16 = DecodeEngine(
        params, cfg, num_slots=16, max_len=640, decode_block=128,
        prefix_budget_bytes=64 << 20,
        sampling=SamplingParams(temperature=0.8, top_p=0.95, top_k=0))
    run_rollouts(eng16, prompt, image_embeds, n=16, max_new=16)  # warmup
    tps = 0.0
    for _ in range(3):
        tokens, secs, steps = run_rollouts(
            eng16, prompt, image_embeds, n=32, max_new=DECODE_TOKENS)
        tps = max(tps, tokens / secs)
        log(f"batched x16: {tokens} tok in {secs:.2f}s "
            f"= {tokens / secs:.1f} tok/s ({steps} steps)")

    # speculative decoding ceiling: n-gram prompt-lookup drafts at full
    # acceptance (greedy; zero-init weights loop, so every draft hits --
    # the upper bound of what acceptance can buy on this chip)
    tps_spec = eng_spec = None
    try:   # own try: a spec-path failure must not lose the headline metric
        eng_spec = DecodeEngine(
            params, cfg, num_slots=SLOTS, max_len=640, decode_block=32,
            speculate=4, spec_min_rate=0.0, prefix_budget_bytes=64 << 20,
            sampling=SamplingParams(temperature=0.0))
        run_rollouts(eng_spec, prompt, image_embeds, n=SLOTS, max_new=16)
        tps_spec = 0.0
        for _ in range(2):
            tokens, secs, _ = run_rollouts(
                eng_spec, prompt, image_embeds, n=2 * SLOTS,
                max_new=DECODE_TOKENS)
            tps_spec = max(tps_spec, tokens / secs)
        log(f"speculative x{SLOTS} (greedy, full acceptance): "
            f"{tps_spec:.1f} tok/s (rate {eng_spec.spec_rate:.2f} tok/step)")
    except Exception as e:
        log(f"1.3b speculative bench skipped: {type(e).__name__}: {e}")

    # BPE-realistic speculative acceptance (VERDICT round-2 #5): overfit a
    # small model on synthetic TikZ with a REAL byte-level BPE tokenizer
    # and measure engine.spec_rate -- the honest acceptance numbers, not
    # the full-acceptance ceiling above
    spec_bpe = {}
    try:
        from detikzify_tpu.evaluate.spec_acceptance import run_measurement

        spec_bpe = run_measurement(n_programs=300, steps=400, n_eval=16,
                                   log_fn=None)
        log(f"BPE-realistic acceptance: "
            f"t0 {spec_bpe.get('spec_rate_bpe_t0')} tok/step, "
            f"t0.8 {spec_bpe.get('spec_rate_bpe_t08')}, "
            f"t0.8+hints {spec_bpe.get('spec_rate_bpe_t08_hint')}")
    except Exception as e:
        log(f"BPE acceptance bench skipped: {type(e).__name__}: {e}")

    # prefix-hit start latency (restore = page-table splice + <= 1-page COW;
    # no per-start prefix materialization)
    def measure_prefix_start(eng, pfx):
        t0 = time.time()
        ros = [eng.start(list(prompt) + [5], image_embeds=image_embeds,
                         max_new_tokens=1, prefix=pfx, lazy=True)
               for _ in range(SLOTS)]
        eng.flush()
        ms = (time.time() - t0) / SLOTS * 1e3
        for r in ros:
            eng.release(r)
        eng.run()
        return ms

    # best-of-3: single-dispatch latencies on the tunnel jitter ~50%
    prefix_start_ms = min(measure_prefix_start(engine, root_prefix)
                          for _ in range(3))
    log(f"prefix-hit start latency: {prefix_start_ms:.1f} ms "
        f"(300-token prompt restored, max_len=640)")
    # O(1)-restore criterion: the same restore must cost the SAME at a
    # 3.2x larger max_len (pool writes are tail-only + boundary page)
    prefix_start_2048_ms = None
    try:
        eng2048 = DecodeEngine(
            params, cfg, num_slots=SLOTS, max_len=2048,
            prefix_budget_bytes=64 << 20, decode_block=32,
            sampling=SamplingParams(temperature=0.0))
        ro = eng2048.start(list(prompt), image_embeds=image_embeds,
                           max_new_tokens=4)
        while not ro.finished:
            eng2048.step()
        pfx2048 = eng2048.store_prefix("root", ro, length=len(prompt))
        eng2048.release(ro)
        measure_prefix_start(eng2048, pfx2048)   # warm the compile
        prefix_start_2048_ms = min(measure_prefix_start(eng2048, pfx2048)
                                   for _ in range(3))
        log(f"prefix-hit start latency: {prefix_start_2048_ms:.1f} ms "
            f"(same restore, max_len=2048 -> "
            f"{prefix_start_2048_ms / max(prefix_start_ms, 1e-9):.2f}x)")
        del eng2048
    except Exception as e:
        log(f"2048 prefix bench skipped: {type(e).__name__}: {e}")

    # free the batched/spec engines BEFORE the MCTS engines exist: their
    # pools (~3 GB) left the 16 GB chip so close to full that the MCTS
    # sections' b=16 restore-gather transients (~1.6 GB work cache)
    # could ResourceExhaust (observed with the start-bucket warmup)
    del eng16
    eng16 = None
    eng_spec = None
    gc.collect()

    # MCTS rollouts/min (secondary north-star metric, BASELINE.md): full
    # rollouts from the root with compile feedback, sequential (reference
    # execution order) vs parallel expansions. Hermetic compile backend
    # with LaTeX-like latency.
    from detikzify_tpu.infer import DetikzifyPipeline, set_backend
    from detikzify_tpu.processing import DetikzifyProcessor

    set_backend(AlwaysFailBackend(0.5))
    tok = make_tokenizer(cfg)
    # MCTS on the measured-best search shape: 16 slots (parallelism 16
    # measured +60% rollouts/min over 8/8), block 64 (measured +17%
    # SelfSim-scored rollouts/min over 32; pipelined stepping measured
    # WORSE at this block size)
    eng_mcts = DecodeEngine(
        params, cfg, num_slots=16, max_len=640, decode_block=64,
        prefix_budget_bytes=1 << 30,
        sampling=SamplingParams(temperature=0.8, top_p=0.95, top_k=0))
    pipe = DetikzifyPipeline(params, cfg,
                             DetikzifyProcessor(tok, cfg),
                             metric="fast", engine=eng_mcts,
                             compile_workers=16)
    # latency-shaped runs (sequential order, time-to-first-compile) use
    # the smaller 8-slot engine: fewer cache rows per decode step = lower
    # single-rollout latency, while eng_mcts maximizes wave throughput
    pipe8 = DetikzifyPipeline(params, cfg,
                              DetikzifyProcessor(tok, cfg),
                              metric="fast", engine=engine)
    img = bench_image()

    def warm_start_buckets(eng, wave_sizes):
        """One-time compile warmup of the fused-start program space the
        MCTS sections traverse: chunked wave sizes x restored-tail-length
        buckets x the fresh-root shape. A novel (B, tail-bucket,
        read-pages) combo compiles on FIRST dispatch (~5-15 s over the
        tunnel); profiling showed those landing INSIDE timed windows
        (t_launch spikes of 5-14 s mid-run), distorting any single
        steady-state measurement. Persistent-cached, so reruns pay
        dispatch only."""
        t0 = time.time()
        ro = eng.start(list(prompt), image_embeds=image_embeds,
                       max_new_tokens=2)
        while not ro.finished:
            eng.step()
        sp = eng.store_prefix(("warm", "root", eng.num_slots), ro,
                              length=len(prompt))
        eng.release(ro)
        for b in wave_sizes:
            for tail in (8, 24, 48, 112):     # ids buckets 16/32/64/128
                ros = eng.start_many(
                    [list(prompt) + [1] * tail] * b,
                    image_embeds=image_embeds, max_new_tokens=1,
                    prefixes=[sp] * b)
                eng.flush()
                for r in ros:
                    eng.release(r)
            # fresh-root shape (no restored prefix, 512-token ids bucket)
            ros = eng.start_many([list(prompt)] * b,
                                 image_embeds=image_embeds,
                                 max_new_tokens=1)
            eng.flush()
            for r in ros:
                eng.release(r)
        eng.drop_prefix(("warm", "root", eng.num_slots))
        log(f"start-bucket warmup ({eng.num_slots} slots, waves "
            f"{list(wave_sizes)}) took {time.time() - t0:.1f}s")

    try:   # warmup is best-effort: a failure must not cost the sections
        warm_start_buckets(eng_mcts, (1, 2, 4, 8, 16))
        warm_start_buckets(engine, (1,))
    except Exception as e:
        log(f"start-bucket warmup degraded: {type(e).__name__}: {e}")
    list(pipe.simulate(image=img, expansions=1, max_length=365))  # warmup
    list(pipe8.simulate(image=img, expansions=1, max_length=365))
    rollout_rates = {}
    for par, reps in ((1, 2), (16, 2)):     # best-of-2: tunnel jitter
        best = 0.0
        for _ in range(reps):
            t0 = time.time()
            list((pipe8 if par == 1 else pipe).simulate(
                image=img, expansions=16, parallelism=par,
                max_length=365))
            best = max(best, 16 / (time.time() - t0) * 60)
        rollout_rates[par] = best
        log(f"mcts rollouts/min (parallelism={par}, metric=fast, "
            f"AlwaysFailBackend, {16 if par > 1 else 8} slots): "
            f"{rollout_rates[par]:.0f}")
    log(f"mcts parallel speedup (fast workload, NOT same-basis -- par1 "
        f"runs 8 slots): {rollout_rates[16] / rollout_rates[1]:.2f}x")

    # MCTS rollouts/min with the ACTUAL workload shape (metric='model':
    # SelfSim scoring on, every rollout render pays a second encoder pass;
    # FakeBackend produces real renders)
    from detikzify_tpu.infer.tikz import FakeBackend

    set_backend(FakeBackend(latency=0.5))
    pipe_model = DetikzifyPipeline(params, cfg,
                                   DetikzifyProcessor(tok, cfg),
                                   metric="model", engine=eng_mcts,
                                   compile_workers=16)
    # warm every scoring bucket (wave sizes are bucketed to powers of two;
    # completion waves can reach the 2x-parallelism in-flight cap = 32)
    for k in (1, 2, 4, 8, 16, 32):
        pipe_model.metric.score_against([img] * k, img)
    list(pipe_model.simulate(image=img, expansions=1,
                             max_length=365))  # warmup score compiles
    rollouts_min_scored = 0.0
    try:    # best-so-far survives a late-rep failure
        for _ in range(2):                      # best-of-2: tunnel jitter
            t0 = time.time()
            list(pipe_model.simulate(image=img, expansions=16,
                                     parallelism=16, max_length=365))
            rollouts_min_scored = max(rollouts_min_scored,
                                      16 / (time.time() - t0) * 60)
    except Exception as e:
        log(f"selfsim burst bench degraded: {type(e).__name__}: {e}")
    log(f"mcts rollouts/min (parallelism=16, SelfSim scoring, "
        f"FakeBackend, 16 slots): {rollouts_min_scored:.0f}")
    # steady-state shape: 32 expansions through the same 16 decode slots.
    # Decode refills while earlier expansions sit in the compile/score
    # stages (generator pipelining), so the burst run's end-of-run drain
    # (last compile latency + last score pass, ~0.6 s) amortizes -- this
    # is the serving-shaped number (the eval protocol streams expansions
    # until compile success / score plateau rather than stopping at 16).
    rollouts_min_scored_n32 = 0.0
    try:    # best-so-far survives a late-rep failure
        for _ in range(2):   # rep 1 absorbs refill-shape compiles
            t0 = time.time()
            list(pipe_model.simulate(image=img, expansions=32,
                                     parallelism=16, max_length=365))
            rollouts_min_scored_n32 = max(rollouts_min_scored_n32,
                                          32 / (time.time() - t0) * 60)
    except Exception as e:
        log(f"selfsim steady bench degraded: {type(e).__name__}: {e}")
    log(f"mcts rollouts/min (par16, SelfSim, over 32): "
        f"{rollouts_min_scored_n32:.0f}")
    # STEADY-STATE estimator (round-4 VERDICT directive #1, metric
    # integrity): rollouts/min sustained across BACK-TO-BACK bounded
    # searches -- the production shape. The eval protocol
    # (reference examples/eval.py:95-106) and the serving scheduler both
    # run a bounded search per item/request, one after another; nothing
    # runs one infinite search on one image. Each search's pipeline
    # fill, root prefill, generator setup, and end-of-run drain are all
    # INSIDE the measured wall clock, amortized across the stream --
    # nothing cold is cropped out.
    #
    # Counting: DECODED ROLLOUTS via the generator's own counter
    # (gen.stats["rollouts"]), not stream yields -- the stream also
    # yields terminal leaf revisits (memoized re-streams of
    # already-generated programs, near-free since the wave scorer shares
    # the score memo), which the reference's MeanSamplingThroughput
    # (eval.py:153-154) would count as "programs generated" but we do
    # NOT count as rollouts. Yields/min is reported separately under its
    # honest name (expansions/min).
    #
    # (An unbounded single-image search was measured too and is the
    # WRONG steady state: past ~60 expansions the tiny synthetic task's
    # tree saturates -- every line-prefix of the best program explored,
    # max_length hit -- and UCT's exploit term pins selection to
    # terminal revisits (exploration decays as 1/sqrt(visits)), so the
    # decoded-rollout rate measures tree saturation, not the engine.
    # Reference UCT has identical dynamics; real searches are stopped at
    # compile success / score plateau long before that regime.)
    def searches_rate(pipe_m, par, n_exp, reps):
        """-> (decoded_rollouts_per_min, expansions_per_min) sustained
        across ``reps`` consecutive ``n_exp``-expansion searches."""
        n_roll = n_yield = 0
        t0 = time.time()
        for _ in range(reps):
            gen = pipe_m.generator(image=img, metric=pipe_m.metric,
                                   mcts_timeout=None, max_length=365)
            try:
                for _out in gen.simulate(n_exp, parallelism=par):
                    n_yield += 1
                n_roll += gen.stats["rollouts"]
            finally:
                gen.close()
        dt = time.time() - t0
        return n_roll / dt * 60, n_yield / dt * 60

    rollouts_min_steady = expansions_min_steady = None
    try:
        for _ in range(2):                  # best-of-2: tunnel jitter
            r_rate, e_rate = searches_rate(pipe_model, 16, 32, 3)
            log(f"  back-to-back rep: {r_rate:.0f} decoded rollouts/min, "
                f"{e_rate:.0f} expansions/min (terminal compile-only "
                f"re-streams excluded from the rollouts count)")
            rollouts_min_steady = max(rollouts_min_steady or 0.0, r_rate)
            expansions_min_steady = max(expansions_min_steady or 0.0,
                                        e_rate)
    except Exception as e:
        log(f"selfsim steady-state bench degraded: "
            f"{type(e).__name__}: {e}")
    log(f"mcts DECODED rollouts/min (par16, SelfSim, FakeBackend, "
        f"3x back-to-back 32-expansion searches, nothing cropped): "
        f"{rollouts_min_steady or 0:.0f} "
        f"(expansions/min {expansions_min_steady or 0:.0f})")

    # SAME-BASIS par-1 denominator (directive #1): identical workload --
    # same engine (16 slots), same FakeBackend+SelfSim metric, same
    # decoded-rollout counting, same back-to-back-search method, same
    # 32-expansion budget -- so the parallel-speedup ratio compares like
    # with like. (The earlier par-1 number above runs the fast/AlwaysFail
    # workload on 8 slots and is NOT a valid denominator for the SelfSim
    # numerator.)
    rollouts_min_par1_samebasis = None
    speedup_samebasis = None
    try:
        rollouts_min_par1_samebasis, _ = searches_rate(pipe_model, 1, 32, 1)
        log(f"mcts DECODED rollouts/min (par1, SAME workload/engine/"
            f"budget/counting): {rollouts_min_par1_samebasis:.1f}")
        if rollouts_min_par1_samebasis and rollouts_min_steady:
            speedup_samebasis = (rollouts_min_steady
                                 / rollouts_min_par1_samebasis)
            log(f"mcts parallel speedup (same-basis, decoded rollouts): "
                f"{speedup_samebasis:.2f}x")
    except Exception as e:
        log(f"same-basis par1 bench degraded: {type(e).__name__}: {e}")

    # p50 time-to-first-compile (north-star metric #3): parallel
    # expansions, n=10
    from detikzify_tpu.evaluate.harness import (generate_until_compilable,
                                                p50_time_to_first_compile)

    ttfc = []
    for _ in range(10):
        r = generate_until_compilable(pipe8, img, max_expansions=8,
                                      parallelism=8)
        if r.compiled:
            ttfc.append(r.seconds)
    set_backend(None)
    p50_ttfc = p50_time_to_first_compile(ttfc) if ttfc else float("nan")
    if ttfc:
        log(f"p50 time-to-first-compile (parallelism=8, FakeBackend, "
            f"metric=fast, 8 slots): {p50_ttfc:.2f}s (n={len(ttfc)})")

    # tracked configs #3 (DS-7b streaming), #1 (TL-1.1b greedy), #4
    # (v2-8b incl. speculative) and #5 (TikZero), plus the serving load
    # test, were measured in isolated subprocesses before this process
    # attached to the chip (see the per-leg docstrings)
    tps_7b_stream = seven_stats.get("ds7b_stream_tok_s")
    tps_tl = tl_stats.get("tl11b_greedy_batch1_tok_s")

    result = {
        "metric": "tikz_decode_tokens_per_sec_per_chip_ds13b",
        "value": round(tps, 2),
        "unit": "tokens/s",
        "vs_baseline": round(tps / base_bf16_tps, 3),
        "extra": {
            "ds13b_batch1_bf16_tok_s": round(base_bf16_tps, 2),
            "ds13b_reference_loop_tok_s": round(base_loop_tps, 2)
            if base_loop_tps else None,
            "ds13b_batch1_tok_s": round(base_tps, 2),
            "ds13b_spec4_greedy_tok_s": round(tps_spec, 2)
            if tps_spec else None,
            "mcts_rollouts_min_par1": round(rollout_rates[1], 1),
            "mcts_rollouts_min_par16": round(rollout_rates[16], 1),
            "mcts_rollouts_min_par16_selfsim":
            round(rollouts_min_scored, 1) if rollouts_min_scored
            else None,
            "mcts_rollouts_min_par16_selfsim_n32":
            round(rollouts_min_scored_n32, 1)
            if rollouts_min_scored_n32 else None,
            "mcts_rollouts_min_steady":
            round(rollouts_min_steady, 1)
            if rollouts_min_steady else None,
            "mcts_expansions_min_steady":
            round(expansions_min_steady, 1)
            if expansions_min_steady else None,
            "mcts_rollouts_min_par1_samebasis":
            round(rollouts_min_par1_samebasis, 1)
            if rollouts_min_par1_samebasis else None,
            "mcts_parallel_speedup_samebasis":
            round(speedup_samebasis, 2) if speedup_samebasis else None,
            "p50_ttfc_s_par8_n10": round(p50_ttfc, 2),
            "prefix_hit_start_ms": round(prefix_start_ms, 1),
            "prefix_hit_start_ms_maxlen2048":
            round(prefix_start_2048_ms, 1) if prefix_start_2048_ms
            else None,
            "ds7b_stream_tok_s": round(tps_7b_stream, 2)
            if tps_7b_stream else None,
            "tl11b_greedy_batch1_tok_s": round(tps_tl, 2)
            if tps_tl else None,
            **eight_stats,
            **eight_spec_stats,
            **tikzero_stats,
            **serve_stats,
            **train_stats,
            **{k: v for k, v in spec_bpe.items()
               if k.startswith("spec_rate")},
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    if "--train-bench" in sys.argv:
        train_bench()
    elif "--seven-bench" in sys.argv:
        seven_bench()
    elif "--tl-bench" in sys.argv:
        tl_bench()
    elif "--eight-bench" in sys.argv:
        eight_bench()
    elif "--eight-spec-bench" in sys.argv:
        eight_spec_bench()
    elif "--tikzero-bench" in sys.argv:
        tikzero_bench()
    else:
        main()
