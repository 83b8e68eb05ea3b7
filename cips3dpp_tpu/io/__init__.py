from .torch_import import (
    import_generator_state_dict,
    export_generator_state_dict,
    load_torch_checkpoint,
)

__all__ = [
    "import_generator_state_dict",
    "export_generator_state_dict",
    "load_torch_checkpoint",
]
