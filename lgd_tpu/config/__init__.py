from .cfg import CfgNode, CN
from .defaults import get_cfg

__all__ = ["CfgNode", "CN", "get_cfg"]
