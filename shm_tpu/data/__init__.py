from shm_tpu.data.windows import (
    make_windows,
    compute_standardizer,
    standardize,
    destandardize,
    normalize_windows,
    compute_mean_std_from_windows,
    stitch_windows,
    segment_rmse,
    slice_frac,
    num_windows,
)

__all__ = [
    "make_windows",
    "compute_standardizer",
    "standardize",
    "destandardize",
    "normalize_windows",
    "compute_mean_std_from_windows",
    "stitch_windows",
    "segment_rmse",
    "slice_frac",
    "num_windows",
]
