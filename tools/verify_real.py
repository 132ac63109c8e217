#!/usr/bin/env python
"""Turnkey real-weights verification runbook (round-3 VERDICT #8).

When a networked environment finally exists, closing the "real weights"
ledger item is ONE command per checkpoint:

    python tools/verify_real.py --checkpoint ds-1.3b=/ckpts/detikzify-ds-1.3b \
        [--checkpoint v2-8b=/ckpts/detikzify-v2-8b ...] [--tex] [--cpu]

For each checkpoint directory it runs, recording a per-step verdict:

  1. ``import``          -- HF checkpoint -> our params/config/processor
                            (``models.load.load``, the forward export gate).
  2. ``processor_parity``-- token + pixel equality vs the ACTUAL reference
                            processor loaded from the same directory
                            (reference ``model/__init__.py:28-61``).
  3. ``logit_parity``    -- fp32 forward logits vs the reference model
                            (max abs diff <= --atol) + 24-token greedy
                            equality through the decode engine.
  4. ``export_gate``     -- REVERSE gate: our ``save_pretrained`` export
                            loads through the reference's own loader with
                            logit + greedy parity.
  5. ``spec_acceptance`` -- measured tokens/step with the checkpoint's REAL
                            BPE: unhinted sampling (T=0.8) and MCTS-style
                            parent-continuation hints, vs the 1.3 verify
                            break-even (re-validates the spec_min_rate
                            default on real weights).
  6. ``bench``           -- the BASELINE.md-shaped numbers on THIS
                            checkpoint: batched decode tok/s, prefix-hit
                            start ms, MCTS rollouts/min (par 8), p50 TTFC.
  7. ``eval_smoke``      -- ``examples/eval.py`` main() end-to-end on a
                            small testset (synthetic unless --testset):
                            every reported metric finite.

Device placement: the fp32 parity tree (steps 1-4) is loaded and COMMITTED
to host memory -- a real 7B/8B checkpoint at fp32 is 28-32 GB and must
never touch a 16 GB chip -- and the parity forwards/greedy run there, next
to the torch CPU reference. The serving-side steps (5-7) get a separate
device-side load: fp32 on-device for small checkpoints, or the production
weight-only int8 path (``load(quantize=True)``: host import, int8
placement) for >3B-param checkpoints / ``--quantize``.

LaTeX: steps 6-7 use the hermetic FakeBackend unless ``--tex`` is given
(then the real latexmk toolchain must be on PATH). The reference package
is imported from --reference (default /root/reference) with the same
dependency stubs the parity tests use.

Validated end-to-end here against a tiny reference-saved checkpoint:
``python tools/verify_real.py --make-tiny /tmp/tiny_ck --cpu`` builds one
with the actual reference implementation and then runs all seven steps
against it.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def log(*a):
    print("[verify_real]", *a, file=sys.stderr, flush=True)


def _figure(size=64):
    from PIL import Image, ImageDraw

    img = Image.new("RGB", (size, size), "white")
    ImageDraw.Draw(img).ellipse([8, 8, size - 12, size - 12],
                                outline="black", width=2)
    ImageDraw.Draw(img).line([4, size - 6, size - 6, 4], fill="blue")
    return img


def _load_reference(ref_path):
    sys.path.insert(0, os.path.join(REPO, "tests"))
    import reference_loader

    reference_loader.REFERENCE_PATH = ref_path
    return reference_loader.load_reference()


def make_tiny_checkpoint(path: str) -> None:
    """Build a tiny checkpoint SAVED BY THE REFERENCE implementation (the
    parity-test shape) so this script can be validated hermetically."""
    import torch
    import transformers
    from tokenizers import (Tokenizer, decoders, models, pre_tokenizers,
                            trainers)

    ref = _load_reference(os.environ.get("DETIKZIFY_REFERENCE_PATH",
                                         "/root/reference"))
    corpus = [
        "\\documentclass{article}\n\\begin{document}\nHi\n\\end{document}\n",
        "\\begin{tikzpicture}\n\\draw (0,0) -- (1,1);\n\\end{tikzpicture}\n",
        "\\draw[red,thick] circle (3);\n", "x y z 0 1 2 ( ) { } ; , .\n",
    ]
    torch.manual_seed(0)
    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    tok.train_from_iterator(corpus, trainers.BpeTrainer(
        vocab_size=320, special_tokens=["<pad>", "<s>", "</s>", "<image>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet()))
    fast = transformers.PreTrainedTokenizerFast(
        tokenizer_object=tok, bos_token="<s>", eos_token="</s>",
        pad_token="<pad>", additional_special_tokens=["<image>"],
        model_max_length=128)
    from detikzify.model import DetikzifyConfig as RefConfig
    from detikzify.model import DetikzifyForConditionalGeneration as RefModel
    from detikzify.model.processing_detikzify import \
        DetikzifyProcessor as RefProcessor

    cfg = RefConfig(
        vision_config=dict(hidden_size=48, intermediate_size=96,
                           num_hidden_layers=2, num_attention_heads=4,
                           image_size=42, patch_size=14),
        text_config=dict(model_type="llama", vocab_size=len(fast),
                         hidden_size=64, intermediate_size=128,
                         num_hidden_layers=2, num_attention_heads=4,
                         num_key_value_heads=2,
                         max_position_embeddings=256, rope_theta=10000.0,
                         rms_norm_eps=1e-5, bos_token_id=fast.bos_token_id,
                         eos_token_id=fast.eos_token_id,
                         pad_token_id=fast.pad_token_id),
        image_token_id=fast.convert_tokens_to_ids("<image>"),
        concat_factor=3, pad_token_id=fast.pad_token_id)
    assert ref is not None
    model = RefModel(cfg).eval()
    model.save_pretrained(path, safe_serialization=True)
    fast.save_pretrained(path)
    proc = RefProcessor(
        image_processor=transformers.SiglipImageProcessor(
            size={"height": 42, "width": 42},
            image_mean=[0.5] * 3, image_std=[0.5] * 3),
        tokenizer=fast, image_seq_len=3, image_token="<image>")
    proc.save_pretrained(path)
    log(f"tiny reference checkpoint written to {path}")


def verify_checkpoint(name: str, path: str, args) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from detikzify_tpu.engine import DecodeEngine
    from detikzify_tpu.models.load import load as our_load
    from detikzify_tpu.models.load import save_pretrained
    from detikzify_tpu.ops.sampling import SamplingParams

    out: dict = {"path": path}

    def step(key):
        def deco(fn):
            t0 = time.time()
            try:
                val = fn()
                out[key] = {"ok": True, **(val or {})}
            except Exception as e:  # noqa: BLE001 -- recorded per step
                log(f"{name}.{key} FAILED: {type(e).__name__}: {e}")
                traceback.print_exc()
                out[key] = {"ok": False,
                            "error": f"{type(e).__name__}: {e}"}
            out[key]["seconds"] = round(time.time() - t0, 1)
            log(f"{name}.{key}: "
                f"{'ok' if out[key]['ok'] else 'FAILED'} "
                f"({out[key]['seconds']}s)")
        return deco

    state: dict = {}
    cpu_dev = jax.devices("cpu")[0]

    @step("import")
    def _():
        # Parity runs against a torch CPU reference, so the fp32 tree is
        # loaded AND COMMITTED to host memory: a real 7B/8B checkpoint at
        # fp32 (28-32 GB) must never be placed on a 16 GB chip. Serving
        # steps (spec/bench) get their own device-side load below.
        with jax.default_device(cpu_dev):
            params, cfg, proc = our_load(
                path, dtype=jnp.float32,
                vision_tower=args.vision_tower or None)
        params = jax.device_put(params, cpu_dev)
        n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
        quant = bool(args.quantize) or (n > 3_000_000_000 and not args.cpu)
        state.update(params=params, cfg=cfg, proc=proc, use_quant=quant)
        return {"n_params": n, "serve_quantized": quant}

    if not out["import"]["ok"]:
        return out

    ref = None
    try:
        ref = _load_reference(args.reference)
        import torch

        ref_model, ref_proc = ref.model.load(path, dtype=torch.float32)
        ref_model.eval()
        state.update(ref_model=ref_model, ref_proc=ref_proc)
    except Exception as e:  # noqa: BLE001
        log(f"reference package unavailable ({type(e).__name__}: {e}); "
            f"parity steps will be skipped")

    img = _figure(state["cfg"].vision.image_size)
    cfg, params, proc = state["cfg"], state["params"], state["proc"]

    def our_greedy(prompt_ids, pixels, max_new):
        # Parity greedy decodes on the HOST (same device as the committed
        # fp32 tree); the chip-side engine is benchmarked separately below.
        eng = DecodeEngine(params, cfg, num_slots=2,
                           max_len=min(cfg.model_max_length, 512),
                           cache_dtype=jnp.float32, device=cpu_dev,
                           sampling=SamplingParams(temperature=0.0))
        embeds = eng.encode_image(jnp.asarray(pixels))
        ro = eng.start(list(prompt_ids), image_embeds=embeds,
                       max_new_tokens=max_new)
        eng.run()
        toks = list(ro.token_ids)
        eng.release(ro)
        return toks

    if ref is not None:
        import torch

        @step("processor_parity")
        def _():
            ref_in = state["ref_proc"](images=img, text="\\draw (0,0)",
                                       return_tensors="pt")
            our_in = proc(images=img, text="\\draw (0,0)")
            assert [int(t) for t in our_in.input_ids[0]] == \
                ref_in["input_ids"][0].tolist(), "token ids diverge"
            dp = np.abs(np.asarray(our_in.pixel_values[0])
                        - ref_in["pixel_values"][0].permute(1, 2, 0)
                        .numpy()).max()
            assert dp < 1e-5, f"pixel values diverge by {dp}"
            return {"pixel_max_diff": float(dp)}

        @step("logit_parity")
        def _():
            from detikzify_tpu.models import detikzify as dtk

            ref_in = state["ref_proc"](images=img, text="",
                                       return_tensors="pt")
            with torch.inference_mode():
                ref_logits = state["ref_model"](
                    input_ids=ref_in["input_ids"],
                    pixel_values=ref_in["pixel_values"]).logits.numpy()
            our_in = proc(images=img, text="")
            # attn_impl="xla": this forward runs on the CPU-committed fp32
            # tree; trace-time kernel dispatch keys off the DEFAULT backend
            # (the chip), which would pick the TPU Pallas attention for a
            # CPU-lowered program and fail -- and the parity comparison
            # wants the reference XLA math anyway
            logits, _ = dtk.forward(
                params, cfg, jnp.asarray(our_in.input_ids),
                jnp.asarray(our_in.pixel_values), attn_impl="xla")
            d = float(np.abs(np.asarray(logits, np.float32)
                             - ref_logits).max())
            assert d <= args.atol, f"logit max diff {d} > atol {args.atol}"
            with torch.inference_mode():
                ref_toks = state["ref_model"].generate(
                    input_ids=ref_in["input_ids"],
                    pixel_values=ref_in["pixel_values"], do_sample=False,
                    max_new_tokens=24,
                    bad_words_ids=[[cfg.image_token_id]],
                    begin_suppress_tokens=[cfg.eos_token_id])[0].tolist()
            ours = our_greedy([int(t) for t in our_in.input_ids[0]],
                              our_in.pixel_values, 24)
            n = min(len(ours), len(ref_toks))
            assert ours[:n] == ref_toks[:n] and len(ours) == len(ref_toks), \
                "greedy streams diverge"
            return {"logit_max_diff": d, "greedy_tokens": len(ours)}

        @step("export_gate")
        def _():
            export = os.path.join(args.workdir, f"{name}_export")
            save_pretrained(export, params, cfg, proc)
            for extra in ("tokenizer.json", "tokenizer_config.json",
                          "special_tokens_map.json", "processor_config.json",
                          "preprocessor_config.json"):
                src = os.path.join(path, extra)
                if os.path.exists(src):
                    import shutil

                    shutil.copy(src, os.path.join(export, extra))
            m2, p2 = ref.model.load(export, dtype=torch.float32)
            m2.eval()
            ref_in = p2(images=img, text="", return_tensors="pt")
            with torch.inference_mode():
                a = m2(input_ids=ref_in["input_ids"],
                       pixel_values=ref_in["pixel_values"]).logits
                b = state["ref_model"](
                    input_ids=ref_in["input_ids"],
                    pixel_values=ref_in["pixel_values"]).logits
            d = float((a - b).abs().max())
            assert d <= args.atol, \
                f"reference disagrees with our export by {d}"
            return {"roundtrip_logit_max_diff": d}

    @step("serve_load")
    def _():
        # Device-side params for the serving-shaped steps. >3B checkpoints
        # (or --quantize) use the production single-chip path: host import
        # + weight-only int8 before placement (models/load.py ``quantize``)
        # so neither the bf16 nor the fp32 tree ever touches the chip.
        nonlocal params
        state.pop("ref_model", None)    # free the torch fp32 tree first
        state.pop("ref_proc", None)
        if state["use_quant"]:
            state["params"] = params = None   # drop the 32 GB fp32 tree
                                              # before the bf16 import
            sp, _, _ = our_load(path, dtype=jnp.bfloat16, quantize=True,
                                vision_tower=args.vision_tower or None)
            state.update(serve_params=sp, serve_cache=jnp.bfloat16)
            return {"mode": "int8", "cache_dtype": "bfloat16"}
        state.update(serve_params=jax.device_put(params, jax.devices()[0]),
                     serve_cache=jnp.float32)
        return {"mode": "fp32", "cache_dtype": "float32"}

    if not out["serve_load"]["ok"]:
        return out

    @step("spec_acceptance")
    def _():
        eng = DecodeEngine(state["serve_params"], cfg, num_slots=4,
                           max_len=min(cfg.model_max_length, 512),
                           cache_dtype=state["serve_cache"], speculate=4,
                           spec_min_rate=0.0,
                           sampling=SamplingParams(temperature=0.8,
                                                   top_p=0.95))
        prompt = [cfg.image_token_id] * cfg.image_seq_len
        pixels = proc(images=img).pixel_values
        embeds = eng.encode_image(jnp.asarray(pixels))
        hints = []
        for _ in range(4):       # unhinted sampling window
            ro = eng.start(list(prompt), image_embeds=embeds,
                           max_new_tokens=args.spec_tokens)
            eng.run()
            hints.append(list(ro.token_ids[len(prompt):]))
            eng.release(ro)
        unhinted = eng.spec_rate
        eng.counters["spec_steps"] = eng.counters["spec_tokens"] = 0
        for h in hints:          # parent-continuation hints (MCTS shape)
            ro = eng.start(list(prompt), image_embeds=embeds,
                           max_new_tokens=args.spec_tokens, hint=h)
            eng.run()
            eng.release(ro)
        hinted = eng.spec_rate
        return {"spec_rate_unhinted_t08": round(unhinted, 3),
                "spec_rate_hinted_t08": round(hinted, 3),
                "break_even": 1.3,
                "unhinted_pays": unhinted >= 1.3,
                "hinted_pays": hinted >= 1.3}

    @step("bench")
    def _():
        import bench as bench_mod    # repo-root bench.py (REPO on sys.path)

        from detikzify_tpu.evaluate.harness import (
            generate_until_compilable, p50_time_to_first_compile)
        from detikzify_tpu.infer import DetikzifyPipeline
        from detikzify_tpu.infer.tikz import FakeBackend, set_backend

        if not args.tex:
            set_backend(FakeBackend(latency=0.25))
        try:
            eng = DecodeEngine(
                state["serve_params"], cfg, num_slots=8,
                max_len=min(cfg.model_max_length, 512), decode_block=32,
                cache_dtype=state["serve_cache"],
                sampling=SamplingParams(temperature=0.8, top_p=0.95))
            prompt = [cfg.image_token_id] * cfg.image_seq_len
            pixels = proc(images=img).pixel_values
            embeds = eng.encode_image(jnp.asarray(pixels))
            # batched decode tok/s: an 8-slot warmup burst (compiles),
            # then the measured 16-rollout run (two full waves)
            for n_rollouts in (8, 16):
                toks, secs, _ = bench_mod.run_rollouts(
                    eng, prompt, embeds, n_rollouts,
                    args.bench_tokens)
            # prefix-hit start latency
            ro = eng.start(list(prompt), image_embeds=embeds,
                           max_new_tokens=2)
            eng.run()
            pfx = eng.store_prefix("root", ro, length=len(prompt))
            eng.release(ro)
            t0 = time.time()
            ro = eng.start(list(prompt) + [cfg.bos_token_id],
                           image_embeds=embeds, max_new_tokens=1,
                           prefix=pfx, lazy=True)
            eng.flush()
            pfx_ms = (time.time() - t0) * 1e3
            eng.release(ro)
            eng.run()
            # MCTS rollouts/min + p50 TTFC
            pipe = DetikzifyPipeline(state["serve_params"], cfg, proc,
                                     engine=eng, metric="fast")
            list(pipe.simulate(image=img, expansions=1))     # warmup
            t0 = time.time()
            list(pipe.simulate(image=img, expansions=8, parallelism=8))
            mcts_min = 8 / (time.time() - t0) * 60
            ttfc = []
            for _ in range(3):
                r = generate_until_compilable(pipe, img, max_expansions=8,
                                              parallelism=8)
                if r.compiled:
                    ttfc.append(r.seconds)
            return {
                "decode_tok_s": round(toks / secs, 1),
                "prefix_hit_start_ms": round(pfx_ms, 1),
                "mcts_rollouts_min_par8": round(mcts_min, 1),
                "p50_ttfc_s": round(p50_time_to_first_compile(ttfc), 2)
                if ttfc else None,
                "backend": "latexmk" if args.tex else "fake",
            }
        finally:
            if not args.tex:
                set_backend(None)

    @step("eval_smoke")
    def _():
        import datasets
        from PIL import ImageDraw

        from detikzify_tpu.infer.tikz import FakeBackend, set_backend

        testset = args.testset
        if not testset:
            rows = []
            for i in range(3):
                f = _figure()
                ImageDraw.Draw(f).rectangle([2 + i, 2, 30, 30 + i],
                                            outline="red")
                rows.append({"image": f,
                             "code": f"\\draw (0,{i}) -- (1,1);",
                             "caption": f"figure {i}"})
            ds = datasets.Dataset.from_list(rows).cast_column(
                "image", datasets.Image())
            testset = os.path.join(args.workdir, "testset")
            ds.save_to_disk(testset)
        if not args.tex:
            set_backend(FakeBackend(latency=0.0))
        try:
            scores_path = os.path.join(args.workdir, f"{name}_scores.json")
            argv_save = sys.argv
            sys.argv = ["eval.py", "--path", f"{name}={path}",
                        "--testset", testset,
                        "--cache_dir", os.path.join(args.workdir, "cache"),
                        "--limit", "3", "--parallelism", "4",
                        "--output", scores_path]
            if args.clip:
                sys.argv += ["--clip", args.clip]
            if state["use_quant"]:
                sys.argv += ["--quantize"]
            sys.path.insert(0, os.path.join(REPO, "examples"))
            try:
                import importlib

                eval_mod = importlib.import_module("eval")
                eval_mod.main()
            finally:
                sys.argv = argv_save
            with open(scores_path) as f:
                scores = json.load(f)
            vals = scores[name]
            bad = {k: v for k, v in vals.items()
                   if isinstance(v, float) and not np.isfinite(v)}
            assert not bad, f"non-finite metrics: {bad}"
            return {"metrics": len(vals), "scores_json": scores_path}
        finally:
            if not args.tex:
                set_backend(None)

    return out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--checkpoint", action="append", default=[],
                   help="NAME=PATH of an HF checkpoint dir (repeatable; "
                        "run all five BASELINE configs by passing five)")
    p.add_argument("--vision-tower", default=None,
                   help="timm SigLIP tower dir (v1 checkpoints)")
    p.add_argument("--reference", default=os.environ.get(
        "DETIKZIFY_REFERENCE_PATH", "/root/reference"),
        help="reference repo path (parity + export gates)")
    p.add_argument("--testset", default=None,
                   help="datasets.save_to_disk dir for eval_smoke "
                        "(synthetic 3-item set when omitted)")
    p.add_argument("--clip", default=None,
                   help="SigLIP two-tower dir for ClipScore in eval_smoke")
    p.add_argument("--tex", action="store_true",
                   help="use the real latexmk toolchain (default: "
                        "hermetic FakeBackend)")
    p.add_argument("--quantize", action="store_true",
                   help="run the serving-side steps (spec_acceptance, "
                        "bench, eval_smoke) on the weight-only int8 "
                        "single-chip path; auto-enabled for >3B-param "
                        "checkpoints unless --cpu")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (hermetic validation)")
    p.add_argument("--atol", type=float, default=3e-4,
                   help="fp32 logit-parity tolerance")
    p.add_argument("--bench-tokens", type=int, default=32)
    p.add_argument("--spec-tokens", type=int, default=48)
    p.add_argument("--workdir", default="/tmp/verify_real")
    p.add_argument("--output", default=None,
                   help="also write the JSON verdict here")
    p.add_argument("--make-tiny", default=None, metavar="DIR",
                   help="build a tiny reference-saved checkpoint at DIR "
                        "and verify it (hermetic self-test)")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        # the host-side fp32 parity legs run on jax.devices("cpu") next to
        # the chip's serving steps -- when a sitecustomize force-sets an
        # EXCLUSIVE platform list (JAX_PLATFORMS=axon on this box, which
        # overrides the env var), the CPU backend would be unavailable and
        # verify_checkpoint would die before any step runs; extend the
        # list so both backends are live
        plats = os.environ.get("JAX_PLATFORMS", "")
        if plats and "cpu" not in plats.split(","):
            jax.config.update("jax_platforms", plats + ",cpu")
    # persistent compile cache (CLAUDE.md convention for chip-driving
    # scripts): without it every rerun re-pays 30-100 s per program for
    # the parity/spec/engine compiles that precede the bench step
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
    except Exception:
        pass
    os.makedirs(args.workdir, exist_ok=True)

    if args.make_tiny:
        make_tiny_checkpoint(args.make_tiny)
        args.checkpoint.append(f"tiny={args.make_tiny}")
    if not args.checkpoint:
        p.error("at least one --checkpoint NAME=PATH (or --make-tiny)")

    results = {}
    for spec in args.checkpoint:
        name, _, path = spec.partition("=")
        if not path:
            name, path = os.path.basename(spec.rstrip("/")), spec
        log(f"=== verifying {name} ({path}) ===")
        results[name] = verify_checkpoint(name, path, args)

    ok = all(v.get("ok", False)
             for r in results.values() for k, v in r.items()
             if isinstance(v, dict))
    verdict = {"verdict": "pass" if ok else "fail",
               "checkpoints": results}
    line = json.dumps(verdict)
    print(line)
    if args.output:
        with open(args.output, "w") as f:
            f.write(line + "\n")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
