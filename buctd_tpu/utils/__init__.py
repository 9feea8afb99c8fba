from .logging_utils import create_logger, MetricWriter, set_seed
from .summary import get_model_summary

__all__ = ["create_logger", "MetricWriter", "set_seed", "get_model_summary"]
