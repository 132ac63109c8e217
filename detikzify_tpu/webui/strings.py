"""WebUI model registry + UI strings (reference ``webui/strings.py``)."""

BANNER = """\
# DeTikZify-TPU: Synthesizing Graphics Programs for Scientific Figures \
and Sketches with TikZ (TPU-native)

Generate TikZ programs from raster figures or hand-drawn sketches,
optionally refined with MCTS and compiler feedback.
"""

# reference strings.py:24-41 (v2.5/v2 first; v1 models behind legacy flag)
MODELS = {
    "detikzify-v2.5-8b": "nllg/detikzify-v2.5-8b",
    "detikzify-v2-8b": "nllg/detikzify-v2-8b",
    "detikzify-ds-7b": "nllg/detikzify-ds-7b",
    "detikzify-ds-1.3b": "nllg/detikzify-ds-1.3b",
    "detikzify-tl-1.1b": "nllg/detikzify-tl-1.1b",
}

ALGORITHMS = {
    "mcts": "MCTS-based refinement (iteratively improves output quality)",
    "sampling": "One-shot sampling (fastest)",
}

CSS = """
.gallery-item { object-fit: contain !important; }
footer { visibility: hidden }
"""
