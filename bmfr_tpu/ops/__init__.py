from .reproject import accumulate_noisy_data
from .blockify import blockify_planes, unblockify_planes, build_feature_blocks
from .fitter import fit_blocks
from .weighted_sum import weighted_sum
from .accumulate import accumulate_filtered_data
from .taa import taa

__all__ = [
    "accumulate_noisy_data",
    "blockify_planes",
    "unblockify_planes",
    "build_feature_blocks",
    "fit_blocks",
    "weighted_sum",
    "accumulate_filtered_data",
    "taa",
]
