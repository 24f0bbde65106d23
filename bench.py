"""Benchmark: quadrature-point integrand-MLP evals/s/chip (BASELINE.json metric).

Measures the hot loop of UMNN training — the fused Clenshaw-Curtis integrand
sweep at the UCI parity config (hidden_derivative [50,50,50,50], embedding 30,
50 CC steps, batch 500, D=6; `UCIExperiments.py:196-217`) — as full
forward+backward training-step evals/s on one chip.

"Evals" counts integrand-MLP evaluations: B * (N+1) * D per forward sweep;
a training step costs 1 fwd sweep + 1 bwd sweep + endpoint/log-jac evals
(SURVEY.md §3.1 cost model), counted explicitly below.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` compares against the PyTorch reference's CPU-measured
megabatch throughput scaled estimate recorded in BASELINE.md (no published
number exists; baseline here = this harness run on the torch CPU reference
path would be hardware-incomparable, so vs_baseline reports the ratio to the
*naive XLA lowering* of the same computation on the same chip — i.e. the
fusion speedup the Pallas kernel buys).
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp
import numpy as np


def _bench_fn(fn, args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    from umnn_tpu.models.umnn_maf import UMNNMAF

    B, D, E, N = 500, 6, 30, 50
    cfg = dict(
        input_size=D,
        embedding_s=E,
        hidden_embedding=(512, 512),
        hidden_derivative=(50, 50, 50, 50),
        nb_steps=N,
    )

    x = jax.random.normal(jax.random.PRNGKey(1), (B, D))

    def make_loss(model):
        def loss(params, x):
            ll, _ = model.compute_ll(params, x)
            return -jnp.mean(ll)

        return loss

    results = {}
    for backend in ("pallas", "xla"):
        if backend == "pallas" and jax.default_backend() != "tpu":
            continue
        model = UMNNMAF(backend=backend, **cfg)
        params = model.init(jax.random.PRNGKey(0))
        step = jax.jit(jax.value_and_grad(make_loss(model)))
        dt = _bench_fn(lambda p, xx: step(p, xx), (params, x), iters=20)
        results[backend] = dt

    # evals per train step: fwd sweep (N+1) + bwd sweep (N+1) + log-jac
    # endpoint eval (1), per (B, D) row  — SURVEY.md §3.1 cost model.
    evals_per_step = B * D * (2 * (N + 1) + 1)
    best = min(results.values())
    value = evals_per_step / best
    vs = (results["xla"] / results["pallas"]) if "pallas" in results else 1.0
    print(
        json.dumps(
            {
                "metric": "quadrature-point integrand-MLP evals/s/chip (UCI parity config, fwd+bwd train step)",
                "value": round(value, 1),
                "unit": "evals/s",
                "vs_baseline": round(vs, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
