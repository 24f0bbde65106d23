"""Small-D feasibility study for the AR(1) copula bits/pixel gate.

The 784-d AR(1) gate (`examples/train_mnist.py -synthetic_mode ar1`,
VERDICT r2 #9) has not yet closed its <0.05 bpp gap: at rho=0.9 the
committed runs plateau 0.5-0.8 bpp above the exact floor, and the
promising 150k-row run was killed by the tunnel death at epoch 6 (7.31
bpp, still descending). Before spending TPU-hours, this script answers
the cheap question on CPU: does the SAME model family (UMNN-MAF with the
reference MNIST conditioner geometry, scaled to dimension d) converge to
the floor on the SAME ground truth at small d, and at what epoch budget?

The AR(1) copula is raster-Markov, so per-pixel conditional structure is
identical at every d — per-pixel MI is -(1/2)ln(1-rho^2)·(d-1)/d, i.e.
the per-dimension task does not get harder with d. If the family gates at
d=64, the 784-d gap is an optimization-budget problem (more epochs); if
it plateaus well above the floor at d=64 too, the gate's threshold — not
the big run's budget — needs rethinking.

Usage:
    JAX_PLATFORMS=cpu python scripts/ar1_smalld_study.py -d 64 -nb_epoch 80

Writes per-epoch test bpp vs the exact floor; exits 0 iff gap < 0.05.
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from umnn_tpu.data.images import synthetic_mnist_ar1
from umnn_tpu.models.flow import UMNNMAFFlow
from umnn_tpu.training.loops import make_optimizer


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-d", type=int, nargs="+", default=[64])
    p.add_argument("-rho", type=float, default=0.9)
    p.add_argument("-rows", type=int, default=20000)
    p.add_argument("-nb_epoch", type=int, default=80)
    p.add_argument("-nb_flow", type=int, default=5)
    p.add_argument("-nb_steps", type=int, default=50)
    p.add_argument("-embedding_s", type=int, default=30)
    # reference MNIST geometry scaled ~d/784 in the embedding trunk; the
    # derivative net keeps the reference widths (they are per-dimension)
    p.add_argument("-hidden_embedding", type=int, nargs="+", default=[256, 256, 256])
    p.add_argument("-hidden_derivative", type=int, nargs="+",
                   default=[100, 50, 50, 50, 50])
    p.add_argument("-b_size", type=int, default=500)
    p.add_argument("-lr", type=float, default=1e-3)
    p.add_argument("-wd", type=float, default=0.0)
    p.add_argument("-seed", type=int, default=0)
    p.add_argument("-gate", type=float, default=0.05)
    args = p.parse_args()

    # several dimensions run sequentially IN ONE PROCESS: each tunnel
    # process connect/disconnect risks stalling a peer's in-flight RPC
    # (CLAUDE.md), so a d-sweep must not be N separate invocations
    rc = 0
    for d in args.d:
        rc |= run_one(d, args)
    return rc


def run_one(d, args):
    data, floor = synthetic_mnist_ar1(
        rho=args.rho, seed=args.seed,
        n=(args.rows, max(args.rows // 10, 500), max(args.rows // 4, 1000)),
        d=d,
    )
    print(f"d={d} rho={args.rho} rows={args.rows} exact floor {floor:.4f} bpp "
          f"(independence floor 8.0)", flush=True)

    model = UMNNMAFFlow(
        nb_flow=args.nb_flow,
        nb_in=d,
        hidden_derivative=tuple(args.hidden_derivative),
        hidden_embedding=tuple(args.hidden_embedding),
        embedding_s=args.embedding_s,
        nb_steps=args.nb_steps,
    )
    params = model.init(jax.random.PRNGKey(args.seed))
    n_params = sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
    print(f"params {n_params}  devices {jax.devices()}", flush=True)

    optimizer = make_optimizer("adam", lr=args.lr, weight_decay=args.wd,
                               grad_clip=1.0)
    opt_state = optimizer.init(params)

    @jax.jit
    def train_step(prm, opt_st, batch):
        def loss_fn(q):
            ll, _ = model.compute_ll(q, batch)
            return -jnp.mean(ll)

        loss, grads = jax.value_and_grad(loss_fn)(prm)
        updates, opt_st = optimizer.update(grads, opt_st, prm)
        import optax

        prm = optax.apply_updates(prm, updates)
        return prm, opt_st, loss

    @jax.jit
    def bpp_step(prm, batch):
        bpp, _, _ = model.compute_bpp(prm, batch)
        return jnp.sum(bpp), bpp.shape[0]

    def eval_bpp(x):
        tot, cnt = 0.0, 0
        for i in range(0, len(x), args.b_size):
            b = jnp.asarray(x[i:i + args.b_size])
            s, c = bpp_step(params, b)
            tot += float(s)
            cnt += int(c)
        return tot / cnt

    rng = np.random.RandomState(args.seed + 1)
    best = (float("inf"), None)
    for epoch in range(args.nb_epoch):
        t0 = time.time()
        perm = rng.permutation(len(data.trn_x))
        losses = []
        for i in range(0, len(perm) - args.b_size + 1, args.b_size):
            b = jnp.asarray(data.trn_x[perm[i:i + args.b_size]])
            params, opt_state, loss = train_step(params, opt_state, b)
            losses.append(loss)
        val = eval_bpp(data.val_x)
        tst = eval_bpp(data.tst_x)
        if val < best[0]:
            best = (val, tst)
        print(f"epoch {epoch:3d}  train NLL {float(jnp.mean(jnp.stack(losses))):8.2f}  "
              f"valid bpp {val:.4f}  test bpp {tst:.4f}  gap {tst - floor:+.4f}  "
              f"({time.time() - t0:.1f}s)", flush=True)

    gap = best[1] - floor
    print(json.dumps({
        "d": d, "rho": args.rho, "rows": args.rows,
        "epochs": args.nb_epoch, "floor_bpp": floor,
        "test_bpp_best_valid": best[1], "gap_bpp": gap,
        "gate": args.gate, "pass": bool(gap < args.gate),
    }), flush=True)
    return 0 if gap < args.gate else 1


if __name__ == "__main__":
    sys.exit(main())
