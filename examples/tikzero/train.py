#!/usr/bin/env python
"""TikZero stage-2: fine-tune the LLM end-to-end with the (frozen) adapter
attached (reference ``examples/tikzero/train.py``), optionally conditioning
the prompt on captions (TikZero+ / ``--caption_condition``)."""
import argparse
import os

import jax


def parse_args():
    p = argparse.ArgumentParser(
        description="fine-tune a TikZero adapter end-to-end, optionally "
                    "conditioned on captions")
    p.add_argument("--base_model", required=True,
                   help="DeTikZify checkpoint for weights initialization")
    p.add_argument("--embedding_model", default="meta-llama/Llama-3.2-1B",
                   help="adapter embedding model checkpoint (LLaMA 3.x)")
    p.add_argument("--adapter_model", required=True,
                   help="adapter checkpoint from tikzero/pretrain.py")
    p.add_argument("--datikz", default="nllg/datikz-v3",
                   help="path of the DaTikZ dataset (load_from_disk)")
    p.add_argument("--caption_condition", action="store_true",
                   help="also condition the LLM prompt on captions "
                        "(image tokens + caption + <bos> + code)")
    p.add_argument("--output", required=True)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--micro_batch_size", type=int, default=4)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--learning_rate", type=float, default=5e-5)
    p.add_argument("--distributed", action="store_true")
    return p.parse_args()


def main():
    args = parse_args()
    if args.distributed:
        jax.distributed.initialize()

    from detikzify_tpu.models.load import (load, load_adapter,
                                           save_pretrained)
    from detikzify_tpu.train.adapter import train_adapter_llm

    params, cfg, processor = load(args.base_model)
    params, cfg, aprocessor, bundle = load_adapter(
        params, cfg, processor, args.adapter_model, args.embedding_model)

    import datasets

    datikz = datasets.load_from_disk(args.datikz)
    items = [{"image": ex["image"], "caption": ex["caption"],
              "code": ex["code"]} for ex in datikz
             if len(ex.get("caption") or "") > 0]

    trained = train_adapter_llm(
        args.output, params, cfg, aprocessor, bundle, items,
        caption_condition=args.caption_condition,
        batch_size=args.batch_size,
        micro_batch_size=args.micro_batch_size,
        learning_rate=args.learning_rate, epochs=args.epochs)

    out = os.path.join(args.output, os.path.basename(args.base_model))
    save_pretrained(out, trained, cfg)


if __name__ == "__main__":
    main()
