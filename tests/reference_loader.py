"""Import the UPSTREAM reference implementation (/root/reference) for
golden parity tests.

The reference is torch/transformers code; torch and transformers are real
in this environment, but its optional rendering/augmentation deps
(pymupdf, pdf2image, pdfCropMargins, torchvision, torchmetrics) are not
installed. Those are irrelevant to token-level generation semantics, so
they are stubbed with permissive placeholder modules: any attribute
resolves to a no-op class/function. Parity tests exercise the reference's
actual processor / model / generation / MCTS code paths, not the stubs.
"""
from __future__ import annotations

import importlib.machinery
import sys
import types

REFERENCE_PATH = "/root/reference"


class _Anything:
    """Placeholder for any stubbed class: accepts any args, any attrs."""

    def __init__(self, *a, **k):
        pass

    def __call__(self, *a, **k):
        return self

    def __getattr__(self, name):
        return _Anything()


def _permissive_module(name: str) -> types.ModuleType:
    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None)

    def module_getattr(attr, _n=name):
        if attr.startswith("__"):
            raise AttributeError(attr)
        return _Anything
    mod.__getattr__ = module_getattr
    return mod


_STUB_NAMES = [
    "pymupdf",
    "pdf2image", "pdf2image.pdf2image",
    "pdfCropMargins",
    "torchmetrics", "torchmetrics.text",
    "torchmetrics.functional", "torchmetrics.functional.text",
    "torchmetrics.functional.text.eed",
    "torchmetrics.functional.text.helper",
    "torchmetrics.image", "torchmetrics.image.kid",
    "torchvision", "torchvision.tv_tensors", "torchvision.transforms",
    "torchvision.transforms.v2", "torchvision.transforms.v2._utils",
    "timm",
    "ot", "ot.lp",
]


def install_stubs() -> None:
    for name in _STUB_NAMES:
        if name not in sys.modules:
            sys.modules[name] = _permissive_module(name)
    # wire parent.child attributes for attribute-style access
    for name in _STUB_NAMES:
        if "." in name:
            parent, child = name.rsplit(".", 1)
            setattr(sys.modules[parent], child, sys.modules[name])


def load_reference():
    """Return the imported reference ``detikzify`` package (torch impl)."""
    install_stubs()
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import detikzify  # noqa: F401  (the reference package)
    import detikzify.infer
    import detikzify.model
    return detikzify
