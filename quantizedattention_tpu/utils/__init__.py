from quantizedattention_tpu.utils.testing import mismatch_report, MismatchReport
from quantizedattention_tpu.utils.runtime import use_interpret_mode, cdiv, round_up
from quantizedattention_tpu.utils.profiling import (
    KernelTiming,
    chained_seconds,
    attention_flops,
    time_attention,
)
from quantizedattention_tpu.utils.checkpoint import save_checkpoint, load_checkpoint
from quantizedattention_tpu.utils.failure import (
    FailureEvent,
    StepGuard,
    Watchdog,
    device_heartbeat,
    hosts_alive,
)

__all__ = [
    "mismatch_report",
    "MismatchReport",
    "use_interpret_mode",
    "cdiv",
    "round_up",
    "KernelTiming",
    "chained_seconds",
    "attention_flops",
    "time_attention",
    "save_checkpoint",
    "load_checkpoint",
    "FailureEvent",
    "StepGuard",
    "Watchdog",
    "device_heartbeat",
    "hosts_alive",
]
