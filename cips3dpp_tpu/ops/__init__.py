from .fused_act import fused_leaky_relu
from .upfirdn2d import upfirdn2d, make_blur_kernel, blur, upsample2x, downsample2x
from .modulated import (
    modulate_weights_1x1,
    modulated_matmul,
    modulated_conv2d,
)

__all__ = [
    "fused_leaky_relu",
    "upfirdn2d",
    "make_blur_kernel",
    "blur",
    "upsample2x",
    "downsample2x",
    "modulate_weights_1x1",
    "modulated_matmul",
    "modulated_conv2d",
]
