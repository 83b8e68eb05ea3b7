from .generator import Generator, GeneratorConfig, RendererConfig, DecoderConfig
from .discriminator import DStyleGAN, DStyleGANProgressive
from .discriminator_pose import DVolumeRender, DVolumeRenderProgressive

__all__ = [
    "Generator",
    "GeneratorConfig",
    "RendererConfig",
    "DecoderConfig",
    "DStyleGAN",
    "DStyleGANProgressive",
    "DVolumeRender",
    "DVolumeRenderProgressive",
]
