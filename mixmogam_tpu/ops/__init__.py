"""Device compute ops (JAX/XLA/Pallas): the TPU-native replacements for the
reference's numpy/scipy hot paths (SURVEY.md L0/L3/L4)."""

from mixmogam_tpu.ops.eigen import eigen_k, projected_spectrum
from mixmogam_tpu.ops.reml import reml_from_spectrum, NullModel, fit_null_model
from mixmogam_tpu.ops.scan import emmax_scan_stats, RotatedNull, build_rotated_null

__all__ = [
    "eigen_k", "projected_spectrum", "reml_from_spectrum", "NullModel",
    "fit_null_model", "emmax_scan_stats", "RotatedNull", "build_rotated_null",
]
