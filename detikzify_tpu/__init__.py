"""DeTikZify-TPU: a TPU-native (JAX/XLA/Pallas/pjit) rebuild of DeTikZify.

Synthesizes TikZ graphics programs from raster images of scientific figures
(and text captions via TikZero adapters), with MCTS-based iterative
refinement driven by compiler feedback and the model's own perceptual
similarity metric. Reference capabilities: potamides/DeTikZify.
"""

__version__ = "0.1.0"

from . import config
from .config import DetikzifyConfig, TextConfig, VisionConfig, get_config

__all__ = ["config", "DetikzifyConfig", "TextConfig", "VisionConfig",
           "get_config", "__version__"]
