"""Quadrature-resolution probe: is a trained flow's reported NLL real?

Round-4 diagnostic for the bsds300 instability (PARITY_RUNS §2e): late in
real-scale bsds300 training, epochs start reporting non-finite batch
losses and — in the patience-10 control — valid NLLs several nats BELOW
the correctly-specified oracle, which no valid normalized density can do
in expectation. The suspected mechanism is quadrature under-resolution:
UMNN's log-density pairs an exact pointwise log f'(x) Jacobian term with
a Clenshaw-Curtis estimate of z = ∫f', so once training sharpens the
integrand past what the reference's 50 CC nodes resolve
(`UCIExperiments.py:130-132` trains with 2·U{5,50} nodes), (z, log f')
become inconsistent and the "likelihood" is no longer a density — it can
drift arbitrarily below the entropy floor.

This probe measures that directly: load a run's params (Orbax step ckpt
or f16 npz snapshot), evaluate per-row NLL on a fixed slice of the valid
split at increasing node counts, and report the NLL-vs-nodes curve plus
the non-finite row count. A converged, well-resolved model is flat in the
node count; an under-resolved one keeps moving (the high-node value is
the truth) and sheds non-finite rows.

Usage:
    python scripts/quad_probe.py -data bsds300 -folder RUN_DIR \
        [-load_npz SNAP.npz] [-rows 2000] [-b_size 100] \
        [-steps 50 100 200 500 1000] [-synthetic_rows -1] [-split valid]
Prints one JSON line with the per-step-count results.
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from umnn_tpu.data.uci import SYNTH_REAL_ROWS, UCI_DIMS, load_uci
from umnn_tpu.models.flow import UMNNMAFFlow
from umnn_tpu.ops.quadrature import padded_cc_quadrature


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-data", default="bsds300", choices=sorted(UCI_DIMS))
    p.add_argument("-folder", required=True, help="run dir containing ckpt/ (train_uci layout)")
    p.add_argument("-load_npz", default="", help="f16 snapshot instead of the Orbax ckpt")
    p.add_argument("-rows", type=int, default=2000, help="-1 = the full split")
    p.add_argument("-b_size", type=int, default=100)
    p.add_argument("-steps", type=int, nargs="+", default=[50, 100, 200, 500, 1000])
    p.add_argument("-split", default="valid", choices=["valid", "test", "train"])
    p.add_argument("-synthetic_rows", type=int, default=-1)
    p.add_argument("-seed", type=int, default=0)
    # model geometry: train_uci.py defaults (reference UCIExperiments.py:196-217)
    p.add_argument("-nb_flow", type=int, default=5)
    p.add_argument("-embedding_s", type=int, default=30)
    p.add_argument("-hidden_embedding", type=int, nargs="+", default=[512, 512])
    p.add_argument("-hidden_derivative", type=int, nargs="+", default=[50, 50, 50, 50])
    p.add_argument(
        "-backend", default="xla", choices=["auto", "xla", "pallas"],
        help="integrand backend; default xla — the Pallas kernel caps its "
             "node axis well below the 1000-node probes",
    )
    p.add_argument(
        "-precision", default="", choices=["", "highest"],
        help="set jax_default_matmul_precision; 'highest' makes TPU matmuls "
             "f32-accurate (multi-pass) — the mitigation lever for models "
             "that fail the -cast bf16 sensitivity check",
    )
    p.add_argument(
        "-cast", default="", choices=["", "bf16"],
        help="cast params+inputs to bfloat16 then back to f32 per matmul "
             "input (precision-sensitivity probe: a healthy model moves "
             "<0.01 nats; a numerically degenerate one moves by nats — the "
             "TPU MXU runs f32 matmuls as bf16 passes at default precision)",
    )
    args = p.parse_args()

    if args.precision:
        jax.config.update("jax_default_matmul_precision", args.precision)
    rows = SYNTH_REAL_ROWS[args.data] if args.synthetic_rows == -1 else (
        args.synthetic_rows or None
    )
    data = load_uci(args.data, synthetic=True, synthetic_rows=rows)
    split = {"valid": data.val, "test": data.tst, "train": data.trn}[args.split]
    x = np.asarray(split if args.rows < 0 else split[: args.rows], dtype=np.float32)

    model = UMNNMAFFlow(
        nb_flow=args.nb_flow,
        nb_in=data.n_dims,
        hidden_derivative=tuple(args.hidden_derivative),
        hidden_embedding=tuple(args.hidden_embedding),
        embedding_s=args.embedding_s,
        nb_steps=max(args.steps),
        backend=args.backend,
    )
    params = model.init(jax.random.PRNGKey(args.seed))
    if args.load_npz:
        from umnn_tpu.training.checkpoint import load_params_npz

        params = load_params_npz(args.load_npz, params)
        source = args.load_npz
    else:
        from umnn_tpu.training.checkpoint import CheckpointManager
        from umnn_tpu.training.loops import make_optimizer

        ckpt = CheckpointManager(Path(args.folder) / "ckpt")
        opt_state = make_optimizer("adam", lr=1e-3, weight_decay=1e-2,
                                   grad_clip=1.0).init(params)
        restored = ckpt.restore(template={"params": params, "opt_state": opt_state})
        if restored is None:
            sys.exit(f"no ckpt under {args.folder}/ckpt and no -load_npz given")
        step, params, _ = restored
        source = f"{args.folder}/ckpt step {step}"

    if args.cast == "bf16":
        params = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, jnp.bfloat16).astype(jnp.float32), params
        )
        x = np.asarray(
            jnp.asarray(x, jnp.bfloat16).astype(jnp.float32), dtype=np.float32
        )

    @jax.jit
    def nll_vec(prm, batch, nodes, weights):
        ll, _ = model.compute_ll(prm, batch, nodes=nodes, weights=weights)
        return -ll

    out = {"data": data.name, "source": source, "split": args.split,
           "rows": int(len(x)), "per_steps": {}}
    for s in args.steps:
        nodes, weights = padded_cc_quadrature(s, s)
        vals = []
        for i in range(0, len(x), args.b_size):
            vals.append(np.asarray(nll_vec(params, jnp.asarray(x[i:i + args.b_size]),
                                           nodes, weights)))
        v = np.concatenate(vals)
        finite = np.isfinite(v)
        fv = np.sort(v[finite]) if finite.any() else np.zeros(0)
        out["per_steps"][str(s)] = {
            "nll_finite_mean": float(fv.mean()) if fv.size else None,
            "n_nonfinite": int((~finite).sum()),
            "nll_min": float(fv[0]) if fv.size else None,
            "nll_max": float(fv[-1]) if fv.size else None,
            # the left tail is where fake (sub-floor) likelihood mass lives
            "smallest5": [float(t) for t in fv[:5]],
            "median": float(np.median(fv)) if fv.size else None,
        }
        print(f"steps {s}: {out['per_steps'][str(s)]}", file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
