"""Host-side utilities: config parsing, logging, file helpers."""

from .config import Config, load_experiment
from .logger import log, setup_logging

__all__ = ["Config", "load_experiment", "log", "setup_logging"]
