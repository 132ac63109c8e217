#!/usr/bin/env python
"""Benchmark harness (reference ``examples/eval.py``): evaluate one or more
models on a DaTikZ-style test set with the full metric suite, prediction
caching, per-process sharding, and redacted variants when PDF tooling is
available."""
import argparse
import json
import os

from detikzify_tpu.evaluate import (ClipScore, CrystalBLEU, ImageSim,
                                    KernelInceptionDistance,
                                    TexEditDistance)
from detikzify_tpu.evaluate.harness import (PredictionCache,
                                            gather_interleaved,
                                            generate_until_compilable,
                                            mean_sampling_throughput,
                                            mean_token_efficiency,
                                            shard_indices)
from detikzify_tpu.infer import TikzDocument
from detikzify_tpu.models.load import load


def parse_args():
    p = argparse.ArgumentParser(description="evaluate DeTikZify-TPU models")
    p.add_argument("--path", nargs="+", required=True,
                   help="NAME=CHECKPOINT pairs")
    p.add_argument("--testset", required=True,
                   help="dataset path with (image, code) pairs")
    p.add_argument("--cache_dir", default="eval_cache")
    p.add_argument("--timeout", type=int, default=0,
                   help="per-item score-improvement budget (0 = stop at "
                        "first compilable output)")
    p.add_argument("--limit", type=int, default=0)
    p.add_argument("--parallelism", type=int, default=8,
                   help="concurrent MCTS expansions per item (engine slots)")
    p.add_argument("--output", default="scores.json")
    return p.parse_args()


def predict(name, ckpt, testset, cache_dir, timeout, parallelism=8):
    """Striped across processes (multi-host) AND across this host's chips:
    one model replica per local device, as the reference places one replica
    per torchrun rank (reference examples/eval.py:110-133)."""
    import jax

    from detikzify_tpu.parallel.replicas import ReplicaPool

    params, cfg, processor = load(ckpt)
    metric = "model" if timeout else "fast"
    pool = ReplicaPool(params, cfg, processor, metric=metric,
                       devices=jax.local_devices())
    os.makedirs(cache_dir, exist_ok=True)
    cache = PredictionCache(os.path.join(cache_dir, f"{name}.jsonl"))
    local, todo = [], []
    for idx in shard_indices(len(testset)):
        key = f"{name}-{idx}"
        hit = cache.get(key)
        if hit is not None:
            local.append((idx, hit))
        else:
            todo.append(idx)

    def run_item(pipe, idx):
        # cache each item as it completes: interrupted runs resume
        result = generate_until_compilable(
            pipe, testset[idx]["image"],
            score_improve=bool(timeout), min_seconds=timeout or 0.0,
            parallelism=parallelism)
        row = {"code": result.best_code, "score": result.best_score,
               "num_programs": result.num_programs,
               "lengths": result.program_lengths,
               "seconds": result.seconds}
        cache.put(f"{name}-{idx}", row)
        return row

    for idx, row in zip(todo, pool.run(run_item, todo)):
        if isinstance(row, Exception):
            raise row
        local.append((idx, row))
    return gather_interleaved(local, len(testset)), params, cfg, processor


def score(name, rows, testset, params, cfg, processor):
    refs = [ex["code"] for ex in testset]
    codes = [row["code"] for row in rows]
    renders, ref_images, pairs = [], [], []
    for row, ex in zip(rows, testset):
        doc = TikzDocument(row["code"])
        img = doc.rasterize()
        if img is not None:
            renders.append(img)
            ref_images.append(ex["image"])
            pairs.append((img, ex["image"]))

    out = {
        "CompileSuccessRate": len(renders) / max(len(rows), 1),
        "MeanTokenEfficiency": mean_token_efficiency(
            [row["lengths"] for row in rows]),
        "MeanSamplingThroughput": mean_sampling_throughput(
            [row["num_programs"] for row in rows]),
    }
    # the reference eval harness instantiates ImageSim with its default
    # mode="cos" (reference examples/eval.py:143) rather than the
    # checkpoint-resolved mode the MCTS pipeline uses -- match it so the
    # reported SelfSim column stays on the cosine scale
    selfsim = ImageSim.from_detikzify(params, cfg, processor=processor,
                                      mode="cos")
    if pairs:
        out["SelfSim"] = float(selfsim.score_batch(
            [a for a, _ in pairs], [b for _, b in pairs]).mean())
        kid = KernelInceptionDistance(params.vision, cfg,
                                      subset_size=min(50, len(renders)))
        kid.update(ref_images, real=True)
        kid.update(renders, real=False)
        out["KID"] = kid.compute()[0]
    bleu = CrystalBLEU(refs)
    bleu.update(codes, [[r] for r in refs])
    out["CrystalBLEU"] = bleu.compute()
    eed = TexEditDistance()
    eed.update(codes, [[r] for r in refs])
    out["TexEditDistance"] = eed.compute()

    # redacted variants (rot13 text scrambling; leakage-controlled eval)
    from detikzify_tpu.evaluate.harness import redacted_render

    redacted = [(redacted_render(TikzDocument(row["code"]), rot13=True),
                 ex["image"])
                for row, ex in zip(rows, testset)]
    redacted = [(r, i) for r, i in redacted if r is not None]
    if redacted:
        out["SelfSim_redacted"] = float(selfsim.score_batch(
            [r for r, _ in redacted], [i for _, i in redacted]).mean())
    return out


def main():
    args = parse_args()
    import datasets

    ds = datasets.load_from_disk(args.testset)
    testset = [ex for ex in ds][:args.limit or None]

    scores = {}
    for pair in args.path:
        name, ckpt = pair.split("=", 1)
        rows, params, cfg, processor = predict(
            name, ckpt, testset, args.cache_dir, args.timeout,
            parallelism=args.parallelism)
        scores[name] = score(name, rows, testset, params, cfg, processor)
        print(name, json.dumps(scores[name], indent=2))
    with open(args.output, "w") as f:
        json.dump(scores, f, indent=2)


if __name__ == "__main__":
    main()
