from .rcnn import RCNNCT
from .roi_heads import StandardROIHeads
from .rpn import RPN

__all__ = ["RCNNCT", "StandardROIHeads", "RPN"]
