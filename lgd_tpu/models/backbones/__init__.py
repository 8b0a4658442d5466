from .fpn import FPN, fpn_output_strides
from .resnet import ResNet, build_resnet

__all__ = ["FPN", "fpn_output_strides", "ResNet", "build_resnet"]
