"""Device mesh construction and parameter sharding rules.

TPU-native replacement for the reference's distribution stack (torchrun DDP,
DeepSpeed ZeRO 1/2, accelerate device_map -- SURVEY §2.8): one
``jax.sharding.Mesh`` with ``data`` and ``model`` axes; parameters get
NamedShardings from pytree-path rules, batches shard along ``data``, and XLA
inserts the collectives (psum for grad reduce == DDP allreduce; sharded
params + gathers == ZeRO/FSDP; ``model``-axis matmul sharding == TP for
8B-class decode on a v5e-8).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: Optional[int] = None, model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Create a ('data', 'model') mesh over available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        assert n % model == 0, (n, model)
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


# ---------------------------------------------------------------------------
# sharding rules
# ---------------------------------------------------------------------------

def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "name"):
            parts.append(str(p.name))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
    return "/".join(parts)


# (substring of pytree path, substring of leaf name) -> PartitionSpec factory.
# Layer-stacked kernels are [L, in, out]; unstacked are [in, out].
def param_spec(path: str, shape: tuple, fsdp: bool) -> P:
    """Tensor-parallel spec for one parameter.

    Megatron-style: column-parallel for q/k/v/gate/up/fc1 (+ lm_head,
    embeddings over vocab), row-parallel for o/down/fc2. When ``fsdp`` is
    set, the remaining large dimension additionally shards over 'data'
    (ZeRO-3-style parameter sharding; XLA all-gathers just-in-time).
    """
    ndim = len(shape)
    col = ("attn/q/", "attn/k/", "attn/v/", "mlp/gate/", "mlp/up/",
           "mlp/fc1/")
    row = ("attn/o/", "mlp/down/", "mlp/fc2/")

    def spec_for(in_axis: Optional[int], out_axis: Optional[int],
                 model_on_out: bool) -> P:
        dims: list = [None] * ndim
        if model_on_out and out_axis is not None:
            dims[out_axis] = "model"
            if fsdp and in_axis is not None:
                dims[in_axis] = "data"
        elif not model_on_out and in_axis is not None:
            dims[in_axis] = "model"
            if fsdp and out_axis is not None:
                dims[out_axis] = "data"
        return P(*dims)

    if path.endswith("kernel") or "embed_tokens" in path or "position" in path:
        if "embed_tokens" in path and ndim == 2:
            # [V, D]: shard HIDDEN on 'model' (vocab on 'data' under fsdp).
            # A vocab-sharded table forces SPMD to fully replicate at the
            # token-id gather ("involuntary full rematerialization"); a
            # hidden-sharded table partitions the gather cleanly.
            return spec_for(0, 1, model_on_out=True)
        if "lm_head" in path and ndim == 2:
            return spec_for(0, 1, model_on_out=True)    # [D, V]: V on model
        if ndim >= 2:
            in_axis, out_axis = ndim - 2, ndim - 1
            if any(s in path for s in col):
                return spec_for(in_axis, out_axis, model_on_out=True)
            if any(s in path for s in row):
                # row-parallel: contracting (input) dim on 'model'
                return spec_for(in_axis, out_axis, model_on_out=False)
            if fsdp and ndim >= 2:
                return P(*([None] * (ndim - 2) + ["data", None]))
    return P()  # replicated (norms, biases, gates, small tensors)


def shard_params(params, mesh: Mesh, fsdp: bool = False):
    """Return a pytree of NamedShardings mirroring ``params``."""

    def leaf_spec(path, leaf):
        spec = param_spec(_path_str(path), np.shape(leaf), fsdp)
        # guard: only keep axes whose size divides the mesh axis
        dims = []
        for i, axis in enumerate(spec):
            if axis is None:
                dims.append(None)
            else:
                size = mesh.shape[axis]
                dims.append(axis if np.shape(leaf)[i] % size == 0 else None)
        return NamedSharding(mesh, P(*dims))

    return jax.tree_util.tree_map_with_path(leaf_spec, params)


def place_params(params, mesh: Mesh, fsdp: bool = False):
    """Device-put params according to the sharding rules."""
    shardings = shard_params(params, mesh, fsdp)
    return jax.tree.map(jax.device_put, params, shardings)


def data_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Batch arrays shard along the leading (batch) axis."""
    return NamedSharding(mesh, P(*(["data"] + [None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
