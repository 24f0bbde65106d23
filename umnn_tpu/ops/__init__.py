from umnn_tpu.ops.integrand_kernel import fused_cc_integral, pallas_available
from umnn_tpu.ops.quadrature import (
    cc_quadrature,
    integrate,
    integrate_autodiff,
    neural_integral,
    padded_cc_quadrature,
)

__all__ = [
    "fused_cc_integral",
    "pallas_available",
    "cc_quadrature",
    "padded_cc_quadrature",
    "integrate",
    "integrate_autodiff",
    "neural_integral",
]
