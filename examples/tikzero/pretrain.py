#!/usr/bin/env python
"""TikZero stage-1: pretrain the cross-attention adapter by distillation
(reference ``examples/tikzero/pretrain.py``): the caption-conditioned
vision tower (student, captions through the frozen embedding model) learns
to match the plain image tower (teacher) on (image, caption) pairs."""
import argparse
import os

import jax


def parse_args():
    p = argparse.ArgumentParser(
        description="pretrain a TikZero adapter by distillation")
    p.add_argument("--base_model", required=True,
                   help="DeTikZify checkpoint supplying the vision tower")
    p.add_argument("--embedding_model", default="meta-llama/Llama-3.2-1B",
                   help="frozen caption embedding model checkpoint")
    p.add_argument("--dataset", required=True,
                   help="datasets.load_from_disk path with (image, caption)")
    p.add_argument("--output", required=True)
    p.add_argument("--batch_size", type=int, default=512)
    p.add_argument("--micro_batch_size", type=int, default=8)
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--mse_loss", action="store_true",
                   help="distill with L2 instead of cosine similarity "
                        "(reference tikzero/pretrain.py --mse_loss)")
    p.add_argument("--distributed", action="store_true")
    return p.parse_args()


def main():
    args = parse_args()
    if args.distributed:
        jax.distributed.initialize()

    from detikzify_tpu.config import AdapterConfig
    from detikzify_tpu.models import adapter as adapter_mod
    from detikzify_tpu.models.embedding import AdapterBundle
    from detikzify_tpu.models.load import (_resolve, load, load_tokenizer,
                                           save_adapter)
    from detikzify_tpu.models import import_hf
    from detikzify_tpu.train.adapter import pretrain_adapter

    params, cfg, processor = load(args.base_model)

    # frozen caption embedding model (reference pretrain.py builds the
    # CrossAttentionSiglipVisionModel around it; here it is an explicit
    # bundle of LLaMA params + tokenizer)
    embed_path = _resolve(args.embedding_model)
    embed_cfg = import_hf.config_from_hf_json(
        os.path.join(embed_path, "config.json")).text
    embed_state = import_hf.load_state_dict_from_safetensors(embed_path)
    embed_state = {k.replace("model.", "text_model.", 1)
                   if k.startswith("model.") else k: v
                   for k, v in embed_state.items()}
    embed_params = import_hf.import_text(import_hf._Src(embed_state),
                                         embed_cfg)

    acfg = cfg.adapter or AdapterConfig(
        embedding_hidden_size=embed_cfg.hidden_size)
    cfg = cfg.replace(adapter=acfg)
    adapter_params = adapter_mod.init(jax.random.PRNGKey(0), cfg.vision,
                                      acfg)
    bundle = AdapterBundle(adapter_params=adapter_params, adapter_cfg=acfg,
                           embed_params=embed_params, embed_cfg=embed_cfg,
                           tokenizer=load_tokenizer(embed_path))

    import datasets

    ds = datasets.load_from_disk(args.dataset)
    items = [{"image": ex["image"], "text": ex["caption"]} for ex in ds
             if ex.get("caption")]

    from detikzify_tpu.train.adapter.pretrain import DistillLossConfig

    trained = pretrain_adapter(
        args.output, bundle, cfg, params.vision, items,
        batch_size=args.batch_size,
        micro_batch_size=args.micro_batch_size,
        learning_rate=args.learning_rate, epochs=args.epochs,
        loss_cfg=DistillLossConfig(kind="l2") if args.mse_loss else None)
    save_adapter(os.path.join(args.output, "adapter"), trained, cfg.vision,
                 active_every=acfg.cross_attn_every_n_layers)


if __name__ == "__main__":
    main()
