from .siren_render import siren_render_fused, siren_render_reference

__all__ = ["siren_render_fused", "siren_render_reference"]
