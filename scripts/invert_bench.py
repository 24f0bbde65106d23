"""Serve-path benchmark: flow inversion (sampling) throughput + accuracy.

The reference's sampling path is dimension-sequential gridded bisection
(`UMNNMAF.py:182-232`, accuracy ≈ (bound/candidates)^iters); this
framework adds a TPU-native parallel Jacobi-Newton solver
(`UMNNMAF.invert_newton`). Neither the reference nor earlier rounds
published a sampling throughput number — this script measures both
methods at both parity configs on one chip, interleaved in one process
(CLAUDE.md variance protocol: queue-drain timing, min over windows), and
reports round-trip accuracy max|forward(invert(z)) - z| for each.

It also runs an accuracy-vs-iters sweep at the UCI config checking the
reference's claimed bisection tolerance (`UMNNMAFFlow.py:82`: "Approximate
error of the inversion: 25/100**nb_iter"): x-space error max|invert(
forward(x)) - x| per refinement count, reported next to the claimed curve
and the actual geometric bracket-shrink rate (2/(candidates-1) per iter —
see `UMNNMAF.invert`, which keeps the 2 grid cells around the argmin).

Usage: python scripts/invert_bench.py [out.json] [--quick] [--no-sweep]
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from bench import CONFIGS, _call_floor, _drain_time  # noqa: E402
from umnn_tpu.models.flow import UMNNMAFFlow  # noqa: E402

WINDOWS = 3
METHODS = {
    # reference semantics: 10 bisection refinements over 10 candidates
    "bisection": dict(method="bisection", iters=10),
    # TPU-native: parallel Jacobi-Newton, all dims at once
    "newton": dict(method="newton", iters=30),
}


def accuracy_sweep(flow, params, B, D):
    """x-space inversion error vs bisection iters (+ newton checkpoints),
    against the reference's claimed 25/100**iters tolerance."""
    # ground-truth x strictly inside the solver bound, z from the true fwd
    x_true = jnp.clip(
        jax.random.normal(jax.random.PRNGKey(7), (B, D)) * 1.5, -6.0, 6.0
    )
    z = flow.forward(params, x_true)
    sweep = {"bisection": {}, "newton": {}, "claimed_25_over_100^k": {}}
    for k in (1, 2, 3, 4, 6, 8, 10):
        x_hat = jax.jit(
            lambda p, zz, k=k: flow.invert(p, zz, iters=k, method="bisection")
        )(params, z)
        err = float(jnp.max(jnp.abs(x_hat - x_true)))
        sweep["bisection"][k] = err
        sweep["claimed_25_over_100^k"][k] = 25.0 / 100.0 ** k
        print(f"sweep bisection iters={k}: x err {err:.3e} "
              f"(claimed {25.0 / 100.0 ** k:.3e})", flush=True)
    for k in (5, 10, 20, 30):
        x_hat = jax.jit(
            lambda p, zz, k=k: flow.invert(p, zz, iters=k, method="newton")
        )(params, z)
        err = float(jnp.max(jnp.abs(x_hat - x_true)))
        sweep["newton"][k] = err
        print(f"sweep newton iters={k}: x err {err:.3e}", flush=True)
    return sweep


def main():
    out_path = Path(sys.argv[1]) if len(sys.argv) > 1 else Path(
        "runs/invert_bench.json"
    )
    quick = "--quick" in sys.argv
    results = {}
    for name, cfg in CONFIGS.items():
        B, D, E, N = cfg["B"], cfg["D"], cfg["E"], cfg["N"]
        flow = UMNNMAFFlow(
            nb_flow=2 if quick else 5,
            nb_in=D, embedding_s=E,
            hidden_embedding=cfg["hidden_emb"],
            hidden_derivative=cfg["hidden_der"],
            nb_steps=N,
        )
        params = flow.init(jax.random.PRNGKey(0))
        z = jax.random.normal(jax.random.PRNGKey(1), (B, D)) * 0.7

        legs = {}
        for meth, kw in METHODS.items():
            fn = jax.jit(lambda p, zz, kw=kw: flow.invert(p, zz, **kw))
            try:
                x = fn(params, z)
                # round-trip accuracy (full-precision fwd at eval nodes)
                z_rt = flow.forward(params, x)
                rt_err = float(jnp.max(jnp.abs(z_rt - z)))
                floor = _call_floor(fn, (params, z), lambda o: o[0, 0])
                legs[meth] = (fn, floor, [], rt_err)
            except Exception as e:  # noqa: BLE001
                print(f"{name}/{meth} failed: {e}", file=sys.stderr)
        iters_n = 2 if (quick or name == "mnist") else 20
        for w in range(WINDOWS):
            for meth, (fn, floor, times, _) in legs.items():
                times.append(
                    _drain_time(fn, (params, z), max(iters_n, 2),
                                lambda o: o[0, 0], floor)
                )
            if w < WINDOWS - 1:
                time.sleep(2.0)
        entry = {}
        for meth, (_, _, times, rt_err) in legs.items():
            t = min(times)
            entry[meth] = {
                "min_s_per_batch": t,
                "samples_per_s": B / t,
                "roundtrip_max_abs_err": rt_err,
                "windows_s": times,
            }
            print(f"{name}/{meth}: {B / t:.1f} samples/s "
                  f"(rt err {rt_err:.2e})", flush=True)
        if {"bisection", "newton"} <= entry.keys():
            entry["newton_speedup"] = (
                entry["bisection"]["min_s_per_batch"]
                / entry["newton"]["min_s_per_batch"]
            )
        if name == "uci" and "--no-sweep" not in sys.argv:
            entry["accuracy_vs_iters"] = accuracy_sweep(flow, params, B, D)
        results[name] = entry
        # persist per-config: a stall in a later leg must not destroy
        # completed measurements (r4 lost the MNIST leg exactly this way)
        out_path.parent.mkdir(parents=True, exist_ok=True)
        out_path.write_text(json.dumps(results, indent=1))
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text(json.dumps(results, indent=1))
    print(json.dumps({"out": str(out_path)}))


if __name__ == "__main__":
    main()
