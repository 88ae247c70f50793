from .registry import MODELS, DATASETS, Registry
from .config import ConfigDict, cfg_from_yaml_file, merge_new_config
from .logger import get_logger, print_log, ScalarWriter
from .meters import AverageMeter

__all__ = ["MODELS", "DATASETS", "Registry", "ConfigDict",
           "cfg_from_yaml_file", "merge_new_config", "get_logger",
           "print_log", "ScalarWriter", "AverageMeter"]
