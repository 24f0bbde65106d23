"""Monotone regression: UMNN MonotonicNN vs an unconstrained MLP.

Framework equivalent of the reference driver `MonotonicMLP.py` (fit
y = 0.001*(x1^3 + x1) + x2^2 + sin(x3), monotone in x1).

Usage:
    python examples/train_monotonic.py -nb_epoch 20
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from umnn_tpu.models.monotonic import MonotonicNN
from umnn_tpu.nn.core import ACTIVATIONS, mlp_apply, mlp_init
from umnn_tpu.training.loops import make_optimizer


def target(x):
    return 0.001 * (x[:, 0] ** 3 + x[:, 0]) + x[:, 1] ** 2 + jnp.sin(x[:, 2])


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-nb_epoch", type=int, default=100)
    p.add_argument("-nb_steps", type=int, default=50)
    p.add_argument("-b_size", type=int, default=512)
    p.add_argument("-lr", type=float, default=1e-3)
    p.add_argument("-seed", type=int, default=0)
    args = p.parse_args()

    key = jax.random.PRNGKey(args.seed)
    model = MonotonicNN(3, (100, 100, 100), nb_steps=args.nb_steps)
    params_m = model.init(key)
    mlp = mlp_init(jax.random.fold_in(key, 1), [3, 100, 100, 100, 1])

    opt = make_optimizer("adam", lr=args.lr, grad_clip=None)
    st_m = opt.init(params_m)
    st_f = opt.init(mlp)

    @jax.jit
    def step_mono(prm, st, x, y):
        def loss(prm):
            pred = model.apply(prm, x[:, 0:1], x[:, 1:])[:, 0]
            return jnp.mean((pred - y) ** 2)

        l, g = jax.value_and_grad(loss)(prm)
        import optax

        upd, st = opt.update(g, st, prm)
        return optax.apply_updates(prm, upd), st, l

    @jax.jit
    def step_mlp(prm, st, x, y):
        def loss(prm):
            pred = mlp_apply(prm, x, ACTIVATIONS["ReLU"])[:, 0]
            return jnp.mean((pred - y) ** 2)

        l, g = jax.value_and_grad(loss)(prm)
        import optax

        upd, st = opt.update(g, st, prm)
        return optax.apply_updates(prm, upd), st, l

    rng = jax.random.PRNGKey(args.seed + 7)
    for epoch in range(args.nb_epoch):
        rng, k = jax.random.split(rng)
        x = jax.random.uniform(k, (args.b_size, 3), minval=-2.0, maxval=2.0)
        y = target(x)
        t0 = time.time()
        params_m, st_m, lm = step_mono(params_m, st_m, x, y)
        mlp, st_f, lf = step_mlp(mlp, st_f, x, y)
        if epoch % 10 == 0 or epoch == args.nb_epoch - 1:
            print(
                f"epoch {epoch:4d}  MSE monotonic {float(lm):.5f}  "
                f"MSE mlp {float(lf):.5f}  ({time.time()-t0:.3f}s)"
            )

    # monotonicity check along x1
    xs = jnp.linspace(-2, 2, 101)[:, None]
    h = jnp.zeros((101, 2))
    ys = model.apply(params_m, xs, h)[:, 0]
    mono = bool(jnp.all(jnp.diff(ys) > 0))
    print(f"monotone in x1: {mono}")
    return 0 if mono else 1


if __name__ == "__main__":
    sys.exit(main())
