"""Model layer: a transformer LM and a flow-matching DiT built on the
quantized-attention kernels.

The reference is a kernel library with no model layer (SURVEY.md §1); these
models exist to (a) exercise the kernels exactly the way production training
and serving would — causal training steps, fwd-mode distillation steps,
KV-cache decoding — and (b) provide the flagship entry points the benchmark
and the multi-chip dry-run drive.
"""

from quantizedattention_tpu.models.transformer import (
    TransformerConfig,
    init_transformer,
    transformer_forward,
    lm_loss,
    make_train_step,
    generate,
    prefill_slot,
    prefill_batched,
    decode_step_batched,
    verify_step_batched,
    sample_token,
    Sampling,
)
from quantizedattention_tpu.models.dit import (
    DiTConfig,
    init_dit,
    dit_forward,
    dit_jvp_step,
)
from quantizedattention_tpu.models.sharded_train import make_sharded_train_step, param_specs
from quantizedattention_tpu.models.pipeline import make_pipeline_train_step

__all__ = [
    "TransformerConfig",
    "init_transformer",
    "transformer_forward",
    "lm_loss",
    "make_train_step",
    "generate",
    "prefill_slot",
    "prefill_batched",
    "decode_step_batched",
    "verify_step_batched",
    "sample_token",
    "Sampling",
    "DiTConfig",
    "init_dit",
    "dit_forward",
    "dit_jvp_step",
    "make_sharded_train_step",
    "make_pipeline_train_step",
    "param_specs",
]
