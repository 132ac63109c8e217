#!/usr/bin/env python
"""Stage-1 projector pretraining entry (reference ``examples/pretrain.py``):
caption -> figure alignment on an ArxivCap-style dataset, training only the
modality projector."""
import argparse

from detikzify_tpu.models.load import load
from detikzify_tpu.train import pretrain


def parse_args():
    p = argparse.ArgumentParser(description="pretrain modality projector")
    p.add_argument("--base_model", required=True)
    p.add_argument("--arxivcap", required=True,
                   help="dataset path with (image, caption) pairs")
    p.add_argument("--size", type=int, default=1_000_000,
                   help="the amount of figures to use for pretraining "
                        "(reference pretrain.py --size)")
    p.add_argument("--output", required=True)
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--micro_batch_size", type=int, default=1)
    p.add_argument("--model_axis", type=int, default=1)
    p.add_argument("--distributed", action="store_true")
    return p.parse_args()


def main():
    args = parse_args()
    if args.distributed:
        import jax

        jax.distributed.initialize()
    params, cfg, processor = load(args.base_model)

    import datasets

    ds = datasets.load_from_disk(args.arxivcap)
    items = [{"image": ex["image"], "text": ex["caption"]}
             for ex in ds.select(range(min(args.size, len(ds))))]

    from detikzify_tpu.parallel.mesh import make_mesh

    pretrain(args.output, params, cfg, processor, items,
             batch_size=args.batch_size,
             micro_batch_size=args.micro_batch_size,
             mesh=make_mesh(model=args.model_axis))


if __name__ == "__main__":
    main()
