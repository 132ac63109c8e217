"""Dataset loaders (reference ``detikzify/dataset/``).

``load_dataset`` resolves the bundled builders by name, mirroring the
reference shim (``dataset/__init__.py:4-7``). Builders accept either a URL
(network environments) or a pre-downloaded local archive path (zero-egress
environments).
"""
from __future__ import annotations

from .paper2fig import load_paper2fig
from .scicap import load_scicap

_BUILDERS = {
    "paper2fig": load_paper2fig,
    "scicap": load_scicap,
}


def load_dataset(name_or_path: str, *args, **kwargs):
    """Resolve bundled builders by name; fall back to HF datasets."""
    if name_or_path in _BUILDERS:
        return _BUILDERS[name_or_path](*args, **kwargs)
    import datasets

    return datasets.load_dataset(name_or_path, *args, **kwargs)


__all__ = ["load_dataset", "load_paper2fig", "load_scicap"]
