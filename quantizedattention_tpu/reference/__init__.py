"""fp32 oracles: plain-jnp softmax attention and its AD transforms.

Every kernel in ops/ is validated against these, replacing the reference's
hand-written PyTorch oracle (reference: attention_bf16.py:450-478 and clones)
and its `torch.func.jvp` machine oracle (reference: attention_jvp.py:254-258).
"""

from quantizedattention_tpu.reference.attention import (
    reference_attention,
    reference_attention_vjp,
    reference_attention_jvp,
)

__all__ = [
    "reference_attention",
    "reference_attention_vjp",
    "reference_attention_jvp",
]
