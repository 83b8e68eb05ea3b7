from .losses import (
    d_logistic_loss,
    g_nonsaturating_loss,
    r1_penalty,
    eikonal_loss,
    minimal_surface_loss,
    viewpoint_loss,
    path_length_penalty,
)
from .state import TrainConfig, TrainState, create_train_state
from .steps import make_train_steps, ema_update, fade_alpha

__all__ = [
    "d_logistic_loss",
    "g_nonsaturating_loss",
    "r1_penalty",
    "eikonal_loss",
    "minimal_surface_loss",
    "viewpoint_loss",
    "path_length_penalty",
    "TrainConfig",
    "TrainState",
    "create_train_state",
    "make_train_steps",
    "ema_update",
    "fade_alpha",
]
