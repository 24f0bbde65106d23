"""Measure the XLA-vs-Pallas crossover over folded-row count and MLP width.

The auto backend picks the fused Pallas kernel when B*D >= pallas_min_rows
(`umnn_maf.py`); that threshold was measured at two configs in round 1. This
sweep times the full fwd+bwd train step for both backends over a grid of
(rows, hidden width), interleaved in one process (time-shared chip), and
prints a table + the per-width crossover row count.

Usage: python scripts/backend_crossover.py [iters]
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from umnn_tpu.models.umnn_maf import UMNNMAF

E, N = 30, 50
D = 8  # GAS-like; rows scale via batch size


def build(backend, width, depth=4):
    return UMNNMAF(
        input_size=D,
        embedding_s=E,
        hidden_embedding=(512, 512),
        hidden_derivative=(width,) * depth,
        nb_steps=N,
        backend=backend,
    )


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    widths = [50, 100]
    row_counts = [4096, 8192, 16384, 32768]

    steps = {}
    for width in widths:
        for backend in ("xla", "pallas"):
            model = build(backend, width)
            params = model.init(jax.random.PRNGKey(0))

            def loss(p, xx, model=model):
                ll, _ = model.compute_ll(p, xx)
                return -jnp.mean(ll)

            step = jax.jit(jax.value_and_grad(loss))
            for rows in row_counts:
                b = rows // D
                x = jax.random.normal(jax.random.PRNGKey(1), (b, D))
                steps[(width, backend, rows)] = (step, params, x)

    results = {}
    floors = {}
    for key, (step, params, x) in steps.items():
        try:
            out = step(params, x)
            _ = float(out[0])
        except Exception as e:  # noqa: BLE001
            print(f"{key}: FAILED {type(e).__name__}", file=sys.stderr)
            results[key] = None
            continue
        fl = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            out = step(params, x)
            _ = float(out[0])
            fl = min(fl, time.perf_counter() - t0)
        floors[key] = fl
        results[key] = 1e9

    for _ in range(3):
        for key, entry in steps.items():
            if results.get(key) is None:
                continue
            step, params, x = entry
            t0 = time.perf_counter()
            for _ in range(iters):
                out = step(params, x)
            _ = float(out[0])
            dt = (time.perf_counter() - t0 - floors[key]) / (iters - 1)
            results[key] = min(results[key], dt)

    table = {}
    for width in widths:
        for rows in row_counts:
            xla = results.get((width, "xla", rows))
            pal = results.get((width, "pallas", rows))
            table[f"w{width}_r{rows}"] = {
                "xla_ms": round(xla * 1e3, 3) if xla else None,
                "pallas_ms": round(pal * 1e3, 3) if pal else None,
            }
            print(
                f"width {width:4d} rows {rows:6d}: "
                f"xla {xla*1e3 if xla else float('nan'):7.3f} ms  "
                f"pallas {pal*1e3 if pal else float('nan'):7.3f} ms",
                flush=True,
            )
    print(json.dumps(table))


if __name__ == "__main__":
    sys.exit(main())
