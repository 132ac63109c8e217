"""Int8 weight-only quantization for decode-bandwidth-bound inference.

Decode throughput on a single chip is set by weight HBM traffic; int8
per-output-channel symmetric weights halve it and, critically, let the
v2-8b flagship fit on ONE v5e chip (16 GB bf16 -> 8.5 GB int8). The matmul
pattern ``dot(x, w_int8.astype(bf16)) * scale`` keeps the HBM read at int8
(XLA fuses the convert into the dot operand load on TPU) and accumulates
in fp32 on the MXU.

``quantize_params`` rewrites the big projection kernels in a Params pytree
in place; ``layers.linear`` transparently consumes quantized dicts.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def quantize_kernel(kernel: jnp.ndarray) -> dict:
    """[in, out] float kernel -> {'q': int8 [in,out], 'scale': f32 [out]}."""
    kf = kernel.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(kf), axis=0)               # per output channel
    scale = jnp.maximum(absmax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(kf / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "scale": scale}


def dequant_matmul(x: jnp.ndarray, qdict: dict) -> jnp.ndarray:
    """x [..., in] @ int8 kernel -> [..., out] in x.dtype."""
    acc = jnp.dot(x, qdict["q"].astype(x.dtype),
                  preferred_element_type=jnp.float32)
    return (acc * qdict["scale"]).astype(x.dtype)


_QUANT_KEYS = ("attn/q", "attn/k", "attn/v", "attn/o",
               "mlp/gate", "mlp/up", "mlp/down", "mlp/fc1", "mlp/fc2",
               "lm_head")


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
    return "/".join(parts)


def quantize_params(params, keys: Tuple[str, ...] = _QUANT_KEYS):
    """Quantize every 'kernel' leaf under the listed pytree paths.

    Works on the composite ``Params`` NamedTuple or any sub-pytree; returns
    the same structure with quantized kernels replaced by
    {'kernel_q': {'q', 'scale'}} entries.
    """

    def rewrite(node, path=""):
        if isinstance(node, dict):
            if "kernel" in node and any(k in path for k in keys) \
                    and node["kernel"].ndim >= 2:
                new = {k: v for k, v in node.items() if k != "kernel"}
                kern = node["kernel"]
                if kern.ndim == 2:
                    new["kernel_q"] = quantize_kernel(kern)
                else:
                    # stacked layer kernels [L, in, out]: vmap over layers
                    new["kernel_q"] = jax.vmap(quantize_kernel)(kern)
                return new
            return {k: rewrite(v, f"{path}/{k}") for k, v in node.items()}
        if hasattr(node, "_fields"):
            return type(node)(*(rewrite(getattr(node, f), f"{path}/{f}")
                                for f in node._fields))
        return node

    return rewrite(params)


def params_nbytes(params) -> int:
    return sum(x.nbytes for x in jax.tree.leaves(params))


def _concat_linear(parts):
    """Concatenate linear-param dicts along the OUTPUT axis (plain or
    int8-quantized; per-output-channel scales concatenate directly)."""
    if all("kernel_q" in p for p in parts):
        return {"kernel_q": {
            "q": jnp.concatenate([p["kernel_q"]["q"] for p in parts],
                                 axis=-1),
            "scale": jnp.concatenate([p["kernel_q"]["scale"]
                                      for p in parts], axis=-1)}}
    assert all("kernel" in p for p in parts), "mixed quantization"
    out = {"kernel": jnp.concatenate([p["kernel"] for p in parts],
                                     axis=-1)}
    if all("bias" in p for p in parts):
        out["bias"] = jnp.concatenate([p["bias"] for p in parts], axis=-1)
    return out


def fuse_projections(params):
    """Pack q/k/v into one matmul and gate/up into another (inference-time
    transform; per-output-channel int8 scales pack losslessly).

    Decode at small batch is partly bound by the serial per-op latency
    chain, not HBM traffic (TODO.md measurements): 7 projections per layer
    become 4. The layer bodies consume either layout; training keeps the
    unfused tree (optimizer states key on it). Applies to the TEXT tower
    only -- the SigLIP body reads q/k/v individually."""
    if hasattr(params, "_fields") and hasattr(params, "text"):
        return params._replace(text=fuse_projections(params.text))

    def rewrite(node):
        if isinstance(node, dict):
            node = {k: rewrite(v) for k, v in node.items()}
            if "attn" in node and all(
                    k in node["attn"] for k in ("q", "k", "v")):
                attn = {k: v for k, v in node["attn"].items()
                        if k not in ("q", "k", "v")}
                try:
                    attn["qkv"] = _concat_linear(
                        [node["attn"][k] for k in ("q", "k", "v")])
                    node = {**node, "attn": attn}
                except AssertionError:
                    pass
            if "mlp" in node and all(
                    k in node["mlp"] for k in ("gate", "up")):
                mlp = {k: v for k, v in node["mlp"].items()
                       if k not in ("gate", "up")}
                try:
                    mlp["gateup"] = _concat_linear(
                        [node["mlp"][k] for k in ("gate", "up")])
                    node = {**node, "mlp": mlp}
                except AssertionError:
                    pass
            return node
        if hasattr(node, "_fields"):
            return type(node)(*(rewrite(getattr(node, f))
                                for f in node._fields))
        return node

    return rewrite(params)


def quantize_params_host(params, keys: Tuple[str, ...] = _QUANT_KEYS,
                         device=None):
    """Quantize on the HOST (numpy) and place results on ``device``.

    The on-device ``quantize_params`` needs full-precision + int8 params
    resident together -- for 8B-class models that exceeds single-chip HBM.
    This variant streams leaf by leaf: each kernel is pulled to host numpy,
    quantized, and only the int8 result lands on the accelerator.
    """
    import numpy as np

    def quant_np(kernel):
        kf = np.asarray(jax.device_get(kernel), np.float32)
        absmax = np.abs(kf).max(axis=-2)
        scale = np.maximum(absmax / 127.0, 1e-8)
        q = np.clip(np.round(kf / scale[..., None, :]), -127,
                    127).astype(np.int8)
        return {"q": jax.device_put(q, device),
                "scale": jax.device_put(scale.astype(np.float32), device)}

    def rewrite(node, path=""):
        if isinstance(node, dict):
            if "kernel" in node and any(k in path for k in keys) \
                    and node["kernel"].ndim >= 2:
                new = {k: jax.device_put(jax.device_get(v), device)
                       for k, v in node.items() if k != "kernel"}
                new["kernel_q"] = quant_np(node["kernel"])
                return new
            return {k: rewrite(v, f"{path}/{k}") for k, v in node.items()}
        if hasattr(node, "_fields"):
            return type(node)(*(rewrite(getattr(node, f), f"{path}/{f}")
                                for f in node._fields))
        return jax.device_put(jax.device_get(node), device)

    return rewrite(params)
