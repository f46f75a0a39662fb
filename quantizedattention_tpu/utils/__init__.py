from quantizedattention_tpu.utils.testing import mismatch_report, MismatchReport
from quantizedattention_tpu.utils.runtime import use_interpret_mode, cdiv, round_up

__all__ = ["mismatch_report", "MismatchReport", "use_interpret_mode", "cdiv", "round_up"]
