"""Exact optimal NLL of the synthetic UCI stand-in distribution.

The synthetic fallback (`umnn_tpu/data/uci.py::_synthetic`) draws from a
3-component Gaussian mixture with shared covariance A^T A, then z-scores by
the train+valid moments — an affine map, so the true density of the final
data is still a 3-Gaussian mixture with computable log-pdf. The floor math
lives next to the generator (`uci.py::synthetic_floor`, one source of truth)
so the data and its target can never drift apart.

Prints the floor for each dataset at BOTH the 20k test-default row count and
the real-dataset scale (`SYNTH_REAL_ROWS`) used by the parity gates.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from umnn_tpu.data.uci import SYNTH_REAL_ROWS, UCI_DIMS, load_uci, synthetic_floor

if __name__ == "__main__":
    for name in sorted(UCI_DIMS):
        f20 = synthetic_floor(name)
        freal = synthetic_floor(name, n_rows=SYNTH_REAL_ROWS[name])
        data = load_uci(name, synthetic=True)
        print(
            f"{name}: optimal test NLL = {f20:.4f} (n=20000) | "
            f"{freal:.4f} (n={SYNTH_REAL_ROWS[name]})  (dims={data.n_dims})"
        )
