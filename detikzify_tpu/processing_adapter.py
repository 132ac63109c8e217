"""Adapter processor: joint (caption, image) preprocessing for TikZero.

Reference ``detikzify/model/adapter/processing_adapter.py:20-74``: wraps the
base processor, tokenizes the caption into ``adapter_input_ids`` /
``adapter_attention_mask``, and substitutes ``DUMMY_IMAGE`` when no image is
given (text-only generation uses the adapter's learnable blank instead at
model level -- ``modeling_adapter.py:500-501``).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Union

import numpy as np

from .processing import DetikzifyProcessor, ProcessorOutput
from .utils.image import DUMMY_IMAGE


@dataclasses.dataclass
class AdapterProcessorOutput(ProcessorOutput):
    adapter_input_ids: Optional[np.ndarray] = None
    adapter_attention_mask: Optional[np.ndarray] = None


class AdapterProcessor:
    def __init__(self, processor: DetikzifyProcessor, tokenizer,
                 max_length: int = 512):
        if processor is None or tokenizer is None:
            raise ValueError("processor and tokenizer are both required")
        self.processor = processor
        self.tokenizer = tokenizer
        self.max_length = max_length

    @property
    def model_max_length(self) -> int:
        return self.processor.model_max_length

    @property
    def image_token_id(self) -> int:
        return self.processor.image_token_id

    @property
    def image_seq_len(self) -> int:
        return self.processor.image_seq_len

    def __call__(self, images=None, text: Union[str, Sequence[str], None] = None,
                 **kw) -> AdapterProcessorOutput:
        if images is None and text is None:
            raise ValueError("either images or text (or both) required")
        adapter_ids = adapter_mask = None
        if text is not None:
            texts = [text] if isinstance(text, str) else list(text)
            rows = [self.tokenizer.encode(t, add_special_tokens=True)
                    [:self.max_length] for t in texts]
            width = max(len(r) for r in rows)
            pad = getattr(self.tokenizer, "pad_token_id", 0) or 0
            adapter_ids = np.full((len(rows), width), pad, np.int32)
            adapter_mask = np.zeros((len(rows), width), bool)
            for i, r in enumerate(rows):
                adapter_ids[i, :len(r)] = r
                adapter_mask[i, :len(r)] = True
            if images is None:
                images = [DUMMY_IMAGE] * len(texts)
        # TikZero+ checkpoints condition the LLM prompt on the caption too:
        # image tokens + caption + <bos> separator (reference
        # processing_adapter.py:48-49, processing_detikzify.py:105-106)
        if text is not None and getattr(self.processor,
                                        "model_expects_text", False):
            base = self.processor(images=images, text=texts,
                                  add_bos_token=True, **kw)
        else:
            base = self.processor(images=images, text=None, **kw)
        return AdapterProcessorOutput(
            input_ids=base.input_ids,
            pixel_values=base.pixel_values,
            attention_mask=base.attention_mask,
            adapter_input_ids=adapter_ids,
            adapter_attention_mask=adapter_mask,
        )

    def decode(self, *a, **kw):
        return self.processor.decode(*a, **kw)

    def batch_decode(self, *a, **kw):
        return self.processor.batch_decode(*a, **kw)
