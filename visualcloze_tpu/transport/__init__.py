from .transport import Transport, ModelType, PathType, create_transport
from .sampling import Sampler, denoise_ode, denoise_sde
from . import path

__all__ = [
    "Transport", "ModelType", "PathType", "create_transport",
    "Sampler", "denoise_ode", "denoise_sde", "path",
]
