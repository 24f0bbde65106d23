"""umnn-tpu: a TPU-native framework for Unconstrained Monotonic Neural
Networks and UMNN-based normalizing flows (JAX / XLA / Pallas / pjit).

Built from scratch with the capabilities of the PyTorch reference
AWehenkel/UMNN (Wehenkel & Louppe, NeurIPS 2019). See SURVEY.md for the
component-by-component mapping.
"""

from umnn_tpu.ops.quadrature import (
    cc_quadrature,
    integrate,
    integrate_autodiff,
    neural_integral,
    padded_cc_quadrature,
)

__version__ = "0.1.0"

__all__ = [
    "cc_quadrature",
    "padded_cc_quadrature",
    "integrate",
    "integrate_autodiff",
    "neural_integral",
]
