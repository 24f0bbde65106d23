"""2-D toy density estimation with a UMNN-MAF flow.

Framework equivalent of the reference driver `ToyExperiments.py` (train a
flow on the FFJORD toy densities, report train/test NLL, optionally sample
via inversion). TPU-first: one jitted SPMD train step, batch axis sharded
over the device mesh.

Usage:
    python examples/train_toy.py -data 8gaussians -nb_epoch 10
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from umnn_tpu.data.toy import TOY_DATASETS, inf_train_gen
from umnn_tpu.models.flow import UMNNMAFFlow
from umnn_tpu.parallel.mesh import data_mesh
from umnn_tpu.training.loops import make_eval_step, make_optimizer, make_train_step


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-data", default="8gaussians", choices=list(TOY_DATASETS))
    p.add_argument("-nb_epoch", type=int, default=50)
    p.add_argument("-nb_flow", type=int, default=1)
    p.add_argument("-nb_steps", type=int, default=20)
    p.add_argument("-embedding_s", type=int, default=10)
    p.add_argument("-hidden_embedding", type=int, nargs="+", default=[100, 100, 100])
    p.add_argument("-hidden_derivative", type=int, nargs="+", default=[50, 50, 50])
    p.add_argument("-b_size", type=int, default=512)
    p.add_argument("-lr", type=float, default=1e-3)
    p.add_argument("-seed", type=int, default=0)
    p.add_argument("-sample", type=int, default=0, help="draw N samples at the end")
    p.add_argument("-folder", default="")
    args = p.parse_args()

    rng = np.random.RandomState(args.seed)
    model = UMNNMAFFlow(
        nb_flow=args.nb_flow,
        nb_in=2,
        hidden_derivative=tuple(args.hidden_derivative),
        hidden_embedding=tuple(args.hidden_embedding),
        embedding_s=args.embedding_s,
        nb_steps=args.nb_steps,
    )
    params = model.init(jax.random.PRNGKey(args.seed))
    n_params = sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
    print(f"devices={jax.devices()} params={n_params}")

    optimizer = make_optimizer("adam", lr=args.lr, weight_decay=1e-2)
    opt_state = optimizer.init(params)
    mesh = data_mesh()

    def loss_fn(prm, batch):
        ll, _ = model.compute_ll(prm, batch)
        return -jnp.mean(ll)

    train_step = make_train_step(loss_fn, optimizer, mesh)
    eval_step = make_eval_step(loss_fn, mesh)

    steps_per_epoch = 10
    for epoch in range(args.nb_epoch):
        t0 = time.time()
        losses = []
        for _ in range(steps_per_epoch):
            batch = jnp.asarray(inf_train_gen(args.data, rng, args.b_size)[:, :2])
            params, opt_state, loss = train_step(params, opt_state, batch)
            losses.append(loss)
        test_batch = jnp.asarray(inf_train_gen(args.data, rng, 2048)[:, :2])
        test_nll = float(eval_step(params, test_batch))
        print(
            f"epoch {epoch:3d}  train NLL {float(jnp.stack(losses).mean()):8.4f}  "
            f"test NLL {test_nll:8.4f}  ({time.time()-t0:.2f}s)"
        )

    if args.sample > 0:
        t0 = time.time()
        samples = model.sample(params, jax.random.PRNGKey(args.seed + 1), args.sample)
        samples = np.asarray(samples)
        print(
            f"sampled {args.sample} points in {time.time()-t0:.1f}s  "
            f"mean={samples.mean(0)}  std={samples.std(0)}"
        )
        if args.folder:
            out = Path(args.folder)
            out.mkdir(parents=True, exist_ok=True)
            np.save(out / f"samples_{args.data}.npy", samples)
            try:
                from umnn_tpu.utils.visualize import visualize_transform

                def log_prob(pts):
                    ll, _ = model.compute_ll(params, pts)
                    return ll

                visualize_transform(
                    samples, log_prob, out / f"density_{args.data}.png"
                )
                print(f"saved density plot to {out}/density_{args.data}.png")
            except Exception as e:  # matplotlib optional
                print(f"density plot skipped: {e}")

    return 0


if __name__ == "__main__":
    sys.exit(main())
