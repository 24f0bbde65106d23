"""Quantify the achievable-at-n generalization gap of the synthetic UCI
stand-ins with a correctly-specified parametric oracle.

The synthetic stand-in is a 3-component shared-covariance Gaussian mixture
(`umnn_tpu/data/uci.py::_synthetic_draw`), so the *best possible learner*
at a given train-set size is maximum likelihood in that exact family. This
script fits sklearn's tied-covariance GMM on the same z-scored train split
the flow trains on — EM initialized at the TRUE parameters, so it converges
to the relevant MLE — and reports its test NLL next to the exact
infinite-data floor.

Reading the result: `oracle − floor` is the irreducible sample-size cost
for a model that already knows the answer's form; `flow − oracle` is the
nonparametric model family's extra generalization cost at that n (what the
reference's torch implementation pays too — see
`scripts/head_to_head_ref.py` for the direct check). PARITY_RUNS.md §2b
uses both numbers for the miniboone/bsds300 gates.
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from umnn_tpu.data.uci import (
    SYNTH_REAL_ROWS,
    UCI_DIMS,
    _synthetic_draw,
    _tail_splits_10_10,
    load_uci,
    synthetic_floor,
)


def oracle_test_nll(name: str, seed: int = 0, n_rows: int | None = None):
    """Fit the true 3-Gaussian tied-covariance family by EM (initialized at
    the truth) on the z-scored train split; return its test NLL."""
    from sklearn.mixture import GaussianMixture

    raw, centers, A = _synthetic_draw(name, seed, n_rows)
    trn, val, tst = _tail_splits_10_10(raw)
    joint = np.vstack([trn, val])
    mu, s = joint.mean(axis=0), joint.std(axis=0)
    trn_z, tst_z = (trn - mu) / s, (tst - mu) / s

    # truth mapped through the same z-score affine
    means0 = (centers - mu) / s
    cov0 = (A.T @ A) / np.outer(s, s)
    gm = GaussianMixture(
        n_components=3,
        covariance_type="tied",
        weights_init=np.full(3, 1.0 / 3.0),
        means_init=means0,
        precisions_init=np.linalg.inv(cov0),
        max_iter=200,
        tol=1e-5,
        reg_covar=1e-8,
    )
    gm.fit(trn_z)
    return -float(gm.score(tst_z)), -float(gm.score(trn_z)), gm.n_iter_


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-data", nargs="+", default=sorted(UCI_DIMS))
    p.add_argument("-seed", type=int, default=0)
    p.add_argument("-real_scale", action="store_true",
                   help="use SYNTH_REAL_ROWS row counts (the §2a gates)")
    p.add_argument("-rows", type=int, default=0,
                   help="explicit row count override (the §2b ladder rungs)")
    args = p.parse_args()

    out = []
    for name in args.data:
        rows = args.rows or (SYNTH_REAL_ROWS[name] if args.real_scale else None)
        floor = synthetic_floor(name, seed=args.seed, n_rows=rows)
        tst_nll, trn_nll, iters = oracle_test_nll(name, args.seed, rows)
        row = {
            "dataset": name, "dims": UCI_DIMS[name], "rows": rows or 20000,
            "floor": round(floor, 4), "oracle_test_nll": round(tst_nll, 4),
            "oracle_train_nll": round(trn_nll, 4),
            "oracle_gap": round(tst_nll - floor, 4), "em_iters": iters,
        }
        out.append(row)
        print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
