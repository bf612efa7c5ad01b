from . import safetensors_io, torch_pickle  # noqa: F401
