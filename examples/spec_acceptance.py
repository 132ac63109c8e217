#!/usr/bin/env python
"""Measure BPE-realistic speculative-decoding acceptance (VERDICT #5).

Trains a byte-level BPE tokenizer on a deterministic synthetic-TikZ
corpus, overfits a small model on it, and measures the decode engine's
speculative tokens-per-step at T=0 / T=0.8, with and without MCTS-style
parent-continuation hints. Prints one JSON line.
"""
import argparse
import json


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--programs", type=int, default=300)
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--eval", type=int, default=24)
    args = p.parse_args()

    from detikzify_tpu.evaluate.spec_acceptance import run_measurement

    out = run_measurement(n_programs=args.programs, steps=args.steps,
                          n_eval=args.eval)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
