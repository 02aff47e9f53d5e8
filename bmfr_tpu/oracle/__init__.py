from .reference import OracleState, oracle_denoise_frame, oracle_denoise_sequence

__all__ = ["OracleState", "oracle_denoise_frame", "oracle_denoise_sequence"]
