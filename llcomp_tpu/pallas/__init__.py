from . import encode_kernels  # noqa: F401
