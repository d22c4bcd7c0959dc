from . import camera_matrix, distortion, pinhole, registry, scheimpflug
from .camera_matrix import CalibrationBounds, sanitize_intrinsics
from .registry import MODELS, PINHOLE, SCHEIMPFLUG, CameraModelSpec, get_model

__all__ = [
    "camera_matrix",
    "distortion",
    "pinhole",
    "scheimpflug",
    "registry",
    "CalibrationBounds",
    "sanitize_intrinsics",
    "CameraModelSpec",
    "MODELS",
    "PINHOLE",
    "SCHEIMPFLUG",
    "get_model",
]
