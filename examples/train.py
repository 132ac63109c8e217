#!/usr/bin/env python
"""Stage-2 fine-tuning entry (reference ``examples/train.py``; torchrun
becomes a single JAX process spanning the local mesh -- multi-host runs use
``jax.distributed.initialize`` via --distributed)."""
import argparse

from detikzify_tpu.models.load import load
from detikzify_tpu.train import train


def parse_args():
    p = argparse.ArgumentParser(description="fine-tune DeTikZify-TPU")
    p.add_argument("--base_model", required=True,
                   help="base checkpoint (projector-pretrained)")
    p.add_argument("--datikz", required=True,
                   help="path to a DaTikZ-style dataset "
                        "(datasets.load_from_disk format with image/code)")
    p.add_argument("--output", required=True)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--micro_batch_size", type=int, default=1)
    p.add_argument("--sketch_ratio", type=float, default=0.5)
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--model_axis", type=int, default=1,
                   help="tensor-parallel mesh axis size")
    p.add_argument("--distributed", action="store_true",
                   help="initialize multi-host JAX")
    p.add_argument("--gradient_checkpointing", action="store_true")
    return p.parse_args()


def main():
    args = parse_args()
    if args.distributed:
        import jax

        jax.distributed.initialize()
    params, cfg, processor = load(args.base_model)

    import datasets

    ds = datasets.load_from_disk(args.datikz)
    items = [{"image": ex["image"], "text": ex["code"],
              "sketches": ex.get("sketches")} for ex in ds]

    from detikzify_tpu.parallel.mesh import make_mesh

    train(args.output, params, cfg, processor, items,
          batch_size=args.batch_size,
          micro_batch_size=args.micro_batch_size,
          sketch_ratio=args.sketch_ratio, epochs=args.epochs,
          gradient_checkpointing=args.gradient_checkpointing,
          mesh=make_mesh(model=args.model_axis))


if __name__ == "__main__":
    main()
