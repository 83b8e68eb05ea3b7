from .build import build_native, native_lib_path

__all__ = ["build_native", "native_lib_path"]
