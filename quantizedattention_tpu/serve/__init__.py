"""Serving layer: continuous batching over the int8 KV cache.

New capability vs the reference (selau642/QuantizedAttention has no
inference/serving code at all — SURVEY.md §1: "no scheduler, communication,
model, serving, or CLI layer"); demanded by the north-star's "continuous
batching across hosts" (BASELINE.json).
"""

from quantizedattention_tpu.serve.engine import (
    GenerationResult,
    ServingEngine,
    make_sharded_decode_step,
    make_sharded_verify_step,
)
from quantizedattention_tpu.serve.scheduler import (
    NativePager,
    NativeScheduler,
    PyPager,
    PyScheduler,
    make_pager,
    make_scheduler,
)

__all__ = [
    "GenerationResult",
    "ServingEngine",
    "NativeScheduler",
    "PyScheduler",
    "make_scheduler",
    "NativePager",
    "PyPager",
    "make_pager",
    "make_sharded_decode_step",
    "make_sharded_verify_step",
]
