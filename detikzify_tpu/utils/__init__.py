from .device import device_count, infer_device, is_tpu
from .functools import batchify, cache_cast, listify
from .generation import (ExplicitAbort, StreamerList, TextIteratorStreamer,
                         TokenStreamer, unwrap_processor)
from .image import DUMMY_IMAGE, convert, expand, load, redact, remove_alpha, to_array, trim
from .subprocess import check_output, run, safe_killpg

__all__ = [
    "device_count", "infer_device", "is_tpu",
    "batchify", "cache_cast", "listify",
    "ExplicitAbort", "StreamerList", "TextIteratorStreamer", "TokenStreamer",
    "unwrap_processor",
    "DUMMY_IMAGE", "convert", "expand", "load", "redact", "remove_alpha",
    "to_array", "trim",
    "check_output", "run", "safe_killpg",
]
