from .camera import (
    CameraParams,
    camera_from_angles,
    sample_cameras,
    axis_angle_to_matrix,
    camera2world_from_axis_angle,
)
from .rays import (
    get_rays_in_world,
    get_z_vals,
    get_points,
    normalize_points,
    prepare_nerf_inputs,
)
from .integration import volume_integration

__all__ = [
    "CameraParams",
    "camera_from_angles",
    "sample_cameras",
    "axis_angle_to_matrix",
    "camera2world_from_axis_angle",
    "get_rays_in_world",
    "get_z_vals",
    "get_points",
    "normalize_points",
    "prepare_nerf_inputs",
    "volume_integration",
]
