from quantizedattention_tpu.tune.config import BlockConfig, default_block_config
from quantizedattention_tpu.tune.autotune import autotune, load_cached_config, save_config

__all__ = ["BlockConfig", "default_block_config", "autotune", "load_cached_config", "save_config"]
