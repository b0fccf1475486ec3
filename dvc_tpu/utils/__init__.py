from .config import Config, load_config, parse_opts, import_cfg
from . import box_ops

__all__ = ["Config", "load_config", "parse_opts", "import_cfg", "box_ops"]
