from .sample import (
    yaw_trajectory,
    circle_trajectory,
    translate_rotate_trajectory,
    render_trajectory,
    style_mixing_grid,
    interpolate_decoder_params,
    slerp,
    lerp,
)

__all__ = [
    "yaw_trajectory",
    "circle_trajectory",
    "translate_rotate_trajectory",
    "render_trajectory",
    "style_mixing_grid",
    "interpolate_decoder_params",
    "slerp",
    "lerp",
]
