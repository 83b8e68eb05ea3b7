from .metrics import psnr, ssim
from .logging import MetricLogger

__all__ = ["psnr", "ssim", "MetricLogger"]
