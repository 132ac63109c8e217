from . import adapter, detikzify, import_hf, layers, llama, siglip
from .detikzify import Params
from .llama import KVCache, init_cache

__all__ = ["adapter", "detikzify", "import_hf", "layers", "llama", "siglip",
           "Params", "KVCache", "init_cache"]
