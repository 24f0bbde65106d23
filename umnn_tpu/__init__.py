"""umnn-tpu: a TPU-native framework for Unconstrained Monotonic Neural
Networks and UMNN-based normalizing flows (JAX / XLA / Pallas / pjit).

Built from scratch with the capabilities of the PyTorch reference
AWehenkel/UMNN (Wehenkel & Louppe, NeurIPS 2019). See SURVEY.md for the
component-by-component mapping.
"""

import os as _os

import jax as _jax

# The axon TPU plugin on this host ignores the JAX_PLATFORMS env var: with
# JAX_PLATFORMS=cpu set in the shell, backend init still constructs the axon
# client (and hangs forever when the tunnel is down — see CLAUDE.md).
# jax.config's jax_platforms DOES take effect, so honor the env var here,
# before any backend is initialized. tests/conftest.py does the same for the
# test suite; this covers the example drivers and scripts.
if _os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
    _jax.config.update("jax_platforms", "cpu")

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
