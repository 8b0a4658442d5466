from .cfg import CfgNode, CN, FrozenCfg
from .defaults import get_cfg

__all__ = ["CfgNode", "CN", "FrozenCfg", "get_cfg"]
