from .node import CfgNode
from .defaults import default_config, update_config

# module-level default instance, mirroring `from config import cfg` in the reference
cfg = default_config()

__all__ = ["CfgNode", "cfg", "default_config", "update_config"]
