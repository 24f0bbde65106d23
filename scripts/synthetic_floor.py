"""Exact optimal NLL of the synthetic UCI stand-in distribution.

The synthetic fallback (`umnn_tpu/data/uci.py::_synthetic`) draws from a
3-component Gaussian mixture with shared covariance A A^T, then z-scores by
the train+valid moments — an affine map, so the true density of the final
data is still a 3-Gaussian mixture with computable log-pdf. The average
negative log-density of the TRUE model on the test split is the optimal
achievable test NLL (any model's NLL exceeds it by its KL divergence).

Prints the floor for each dataset name so training curves in runs/ can be
read against an absolute target.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from umnn_tpu.data.uci import UCI_DIMS, _tail_splits_10_10, load_uci


def floor(name: str, seed: int = 0) -> float:
    d = UCI_DIMS[name]
    rng = np.random.RandomState(seed)
    n = 20000
    mix = rng.randint(0, 3, size=n)
    centers = rng.randn(3, d) * 2.0
    A = rng.randn(d, d) * 0.3
    data = centers[mix] + rng.randn(n, d) @ A

    # replicate the z-scoring affine map
    trn, val, tst = _tail_splits_10_10(data)
    joint = np.vstack([trn, val])
    mu, s = joint.mean(0), joint.std(0)

    # density of y = (x - mu)/s where x ~ (1/3) sum_k N(c_k, A^T A):
    # log p_y(y) = log p_x(s*y + mu) + sum log s
    cov = A.T @ A
    sign, logdet = np.linalg.slogdet(cov)
    prec = np.linalg.inv(cov)
    x = tst  # pre z-score coordinates of the test split
    lps = []
    for k in range(3):
        diff = x - centers[k]
        m2 = np.einsum("ni,ij,nj->n", diff, prec, diff)
        lps.append(-0.5 * (m2 + d * np.log(2 * np.pi) + logdet))
    lp = np.logaddexp.reduce(np.stack(lps), axis=0) - np.log(3)
    lp_y = lp + np.log(s).sum()
    return float(-lp_y.mean())


if __name__ == "__main__":
    for name in sorted(UCI_DIMS):
        f = floor(name)
        # sanity: the loader reproduces the same data
        data = load_uci(name, synthetic=True)
        print(f"{name}: optimal test NLL = {f:.4f}  (dims={data.n_dims})")
