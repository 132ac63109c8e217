"""Evaluation metric suite (reference ``detikzify/evaluate/__init__.py``).

``ImageSim`` is the hard dependency (MCTS scoring); the rest import lazily
like the reference's ``[evaluate]`` extra gating.
"""
from .imagesim import ImageSim


def __getattr__(name):
    if name == "CrystalBLEU":
        from .crystalbleu import CrystalBLEU

        return CrystalBLEU
    if name == "KernelInceptionDistance":
        from .kid import KernelInceptionDistance

        return KernelInceptionDistance
    if name == "TexEditDistance":
        from .eed import TexEditDistance

        return TexEditDistance
    if name == "DreamSim":
        from .dreamsim import DreamSim

        return DreamSim
    if name in ("DreamSimJAX", "dreamsim_from_checkpoints"):
        from .dreamsim_jax import DreamSimJAX, from_checkpoints

        return {"DreamSimJAX": DreamSimJAX,
                "dreamsim_from_checkpoints": from_checkpoints}[name]
    if name == "SigLIPDreamSim":
        from .dreamsim import SigLIPDreamSim

        return SigLIPDreamSim
    if name == "ClipScore":
        from .clipscore import ClipScore

        return ClipScore
    raise AttributeError(name)


__all__ = ["ImageSim", "CrystalBLEU", "KernelInceptionDistance",
           "TexEditDistance", "DreamSim", "DreamSimJAX",
           "dreamsim_from_checkpoints", "SigLIPDreamSim", "ClipScore"]
