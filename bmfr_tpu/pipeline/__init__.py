from .state import TemporalState
from .denoise import denoise_frame, denoise_sequence, make_denoise_frame

__all__ = [
    "TemporalState",
    "denoise_frame",
    "denoise_sequence",
    "make_denoise_frame",
]
