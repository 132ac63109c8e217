"""Orbax checkpointing with the reference's auto-resume contract.

Replaces HF Trainer checkpoint handling (reference ``train/train.py:91-103``
auto-discovery + resume; ``util/trainer.py:17-40`` fractional-epoch saves;
``train/pretrain.py:104-111`` partial-state projector-only saves) with
async Orbax saves of the full TrainState plus a tiny JSON meta sidecar.
"""
from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional

import jax
import numpy as np

_STEP_RE = re.compile(r"^checkpoint-(\d+)$")


def _ckpt_dir(output_dir: str, step: int) -> str:
    return os.path.join(output_dir, f"checkpoint-{step}")


def get_last_checkpoint(output_dir: str) -> Optional[str]:
    """Latest ``checkpoint-<step>`` subdirectory, like HF's helper."""
    if not os.path.isdir(output_dir):
        return None
    best, best_step = None, -1
    for name in os.listdir(output_dir):
        m = _STEP_RE.match(name)
        if m and int(m.group(1)) > best_step:
            marker = os.path.join(output_dir, name, "meta.json")
            if os.path.exists(marker):
                best, best_step = os.path.join(output_dir, name), int(m.group(1))
    return best


class Checkpointer:
    def __init__(self, output_dir: str, max_to_keep: int = 3):
        import orbax.checkpoint as ocp

        self.output_dir = os.path.abspath(output_dir)
        os.makedirs(self.output_dir, exist_ok=True)
        self.max_to_keep = max_to_keep
        self._ckpt = ocp.StandardCheckpointer()
        self._pending: list = []   # (path, step, meta) of unfinished saves

    def save(self, step: int, state, meta: Optional[Dict[str, Any]] = None,
             blocking: bool = True) -> str:
        path = _ckpt_dir(self.output_dir, step)
        self._ckpt.save(os.path.join(path, "state"), state, force=True)
        # meta.json is the completeness marker get_last_checkpoint keys on:
        # it must only exist once the (possibly async) Orbax save finished,
        # or a crash mid-save would leave auto-resume pointing at a partial
        # checkpoint. Non-blocking saves defer it to the next sync point.
        self._pending.append((path, step, meta))
        if blocking:
            self.wait()
        return path

    def _flush_markers(self) -> None:
        for path, step, meta in self._pending:
            with open(os.path.join(path, "meta.json"), "w") as f:
                json.dump({"step": step, **(meta or {})}, f)
        if self._pending:
            self._pending.clear()
            self._gc()

    def restore(self, path: str, template):
        """Restore into the structure/shardings of ``template``."""
        self.wait()
        return self._ckpt.restore(os.path.join(path, "state"), template)

    def restore_latest(self, template):
        path = get_last_checkpoint(self.output_dir)
        if path is None:
            return None, None
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        return self.restore(path, template), meta

    def wait(self) -> None:
        self._ckpt.wait_until_finished()
        self._flush_markers()

    def _gc(self) -> None:
        steps = sorted(
            int(_STEP_RE.match(n).group(1))
            for n in os.listdir(self.output_dir) if _STEP_RE.match(n))
        for step in steps[:-self.max_to_keep]:
            import shutil

            shutil.rmtree(_ckpt_dir(self.output_dir, step),
                          ignore_errors=True)


def save_params_npz(path: str, params, only: Optional[str] = None) -> None:
    """Flat .npz export of (a subtree of) params -- the partial-state
    equivalent of the reference's projector-only save (pretrain.py:104-111).

    ``only``: optional top-level field of the Params NamedTuple
    ('connector', 'vision', 'text')."""
    tree = getattr(params, only) if only else params
    flat = {}

    def visit(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                visit(f"{prefix}/{k}" if prefix else k, v)
        elif hasattr(node, "_fields"):
            for k in node._fields:
                visit(f"{prefix}/{k}" if prefix else k, getattr(node, k))
        else:
            flat[prefix] = np.asarray(jax.device_get(node))

    visit("", tree)
    np.savez(path, **flat)


def load_params_npz(path: str) -> Dict[str, np.ndarray]:
    with np.load(path) as data:
        return {k: data[k] for k in data.files}
