from tests.reference_numpy.kalman import kalman_filter, rts_smoother
from tests.reference_numpy.numpy_smc import NumpySSMParams, numpy_forward_filter

__all__ = [
    "NumpySSMParams",
    "kalman_filter",
    "numpy_forward_filter",
    "rts_smoother",
]
