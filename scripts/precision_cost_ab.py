"""Measure the cost of the precision mitigation: default vs HIGHEST matmuls.

PARITY_RUNS §2e's validity work gives drivers an eval-side mitigation for
precision-fragile models — `jax_default_matmul_precision = "highest"`
(f32-accurate multi-pass MXU matmuls instead of the default bf16-input
passes). This script prices that lever: the full train step (fwd+bwd) at
both parity configs, both backends, default vs highest precision,
INTERLEAVED in one process per the CLAUDE.md variance protocol (the legs
of each window share the chip's load state; compare mins and the
per-window ratio).

Usage: python scripts/precision_cost_ab.py [out.json]
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

WINDOWS = 4


def main():
    out_path = Path(sys.argv[1]) if len(sys.argv) > 1 else Path(
        "runs/precision_cost_ab.json"
    )
    from umnn_tpu.models.umnn_maf import UMNNMAF

    results = {}
    for name, cfg in CONFIGS.items():
        B, D, E, N = cfg["B"], cfg["D"], cfg["E"], cfg["N"]
        x = jax.random.normal(jax.random.PRNGKey(1), (B, D))
        backends = ["xla"]
        if jax.default_backend() == "tpu":
            backends.append("pallas")
        for backend in backends:
            model = UMNNMAF(
                input_size=D, embedding_s=E,
                hidden_embedding=cfg["hidden_emb"],
                hidden_derivative=cfg["hidden_der"],
                nb_steps=N, backend=backend,
            )
            params = model.init(jax.random.PRNGKey(0))

            def loss(p, xb, model=model):
                ll, _ = model.compute_ll(p, xb)
                return -jnp.mean(ll)

            scalarize = lambda o: o[0]  # noqa: E731
            legs = {}
            ok = True
            for prec in ("default", "highest"):
                fn = jax.jit(jax.value_and_grad(loss))
                ctx = (
                    jax.default_matmul_precision("highest")
                    if prec == "highest"
                    else _null_ctx()
                )
                try:
                    with ctx:  # precision is baked in at trace time
                        _ = float(scalarize(fn(params, x)))  # compile+warm
                    floor = _call_floor(fn, (params, x), scalarize)
                    legs[prec] = (fn, floor, [])
                except Exception as e:  # noqa: BLE001
                    print(f"{name}/{backend}/{prec} failed: {e}", file=sys.stderr)
                    ok = False
            if not ok:
                continue
            for w in range(WINDOWS):
                for prec, (fn, floor, times) in legs.items():
                    times.append(
                        _drain_time(fn, (params, x), cfg["iters"], scalarize, floor)
                    )
                if w < WINDOWS - 1:
                    time.sleep(2.0)
            entry = {
                prec: {
                    "min_ms": min(t) * 1e3,
                    "median_ms": float(np.median(t)) * 1e3,
                    "windows_ms": [ti * 1e3 for ti in t],
                }
                for prec, (_, _, t) in legs.items()
            }
            entry["highest_over_default"] = (
                entry["highest"]["min_ms"] / entry["default"]["min_ms"]
            )
            results[f"{name}/{backend}"] = entry
            print(f"{name}/{backend}: default {entry['default']['min_ms']:.3f} ms, "
                  f"highest {entry['highest']['min_ms']:.3f} ms "
                  f"({entry['highest_over_default']:.2f}x)", flush=True)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text(json.dumps(results, indent=1))
    print(json.dumps({"out": str(out_path)}))


class _null_ctx:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


if __name__ == "__main__":
    main()
