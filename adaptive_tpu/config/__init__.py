from adaptive_tpu.config.config import Config, load_config
from adaptive_tpu.config.experiment import Experiment, Logger

__all__ = ["Config", "load_config", "Experiment", "Logger"]
