from .fixtures import synthetic_sequence
from .camera import parse_camera_matrices_header

__all__ = ["synthetic_sequence", "parse_camera_matrices_header"]
