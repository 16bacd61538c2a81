from .loader import CxrLoader, build_native, native_available, preprocess_file

__all__ = ["CxrLoader", "build_native", "native_available", "preprocess_file"]
