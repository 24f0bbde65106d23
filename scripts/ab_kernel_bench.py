"""Interleaved A/B benchmark of fused-kernel configs at the MNIST config.

Measures the full jitted train-step-equivalent (value_and_grad of the
UMNN-MAF NLL, one block, B=100 D=784 — the `MNISTExperiment.py` parity
shape) for several Pallas kernel configurations, interleaved in ONE process
so the time-shared chip's 2-3x drift cancels in the comparison. Reports the
min over rounds per config (CLAUDE.md timing rules: queue-drain timing,
subtract the call+readback floor).

Usage: python scripts/ab_kernel_bench.py [iters] [rounds]
"""

import itertools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from umnn_tpu.models.umnn_maf import UMNNMAF

B, D, E, N = 100, 784, 30, 50
HIDDEN_EMB = (1024, 1024, 1024)
HIDDEN_DER = (100, 50, 50, 50, 50)

CONFIGS = [
    # (label, dw_mode, node_chunk, tile_r)
    ("per_layer_nc16_t128", "per_layer", 16, 128),
    ("per_layer_nc32_t128", "per_layer", 32, 128),
    ("per_layer_nc64_t128", "per_layer", 64, 128),
    # nc51 = exactly K for N=50: no zero-weight padding nodes (nc16 pads
    # 51 -> 64, wasting 25% of all node evals) and a single in-kernel chunk
    ("per_layer_nc51_t128", "per_layer", 51, 128),
    ("per_layer_nc51_t256", "per_layer", 51, 256),
    ("per_layer_nc16_t256", "per_layer", 16, 256),
    ("per_layer_nc32_t256", "per_layer", 32, 256),
    ("batched_nc16_t128", "batched", 16, 128),
    ("batched_nc51_t128", "batched", 51, 128),
    ("xla", None, 0, 0),
]


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    x = jax.random.normal(jax.random.PRNGKey(1), (B, D))

    steps = {}
    for label, mode, nc, tr in CONFIGS:
        if mode is None:
            model = UMNNMAF(
                input_size=D, embedding_s=E, hidden_embedding=HIDDEN_EMB,
                hidden_derivative=HIDDEN_DER, nb_steps=N, backend="xla",
            )
        else:
            model = UMNNMAF(
                input_size=D, embedding_s=E, hidden_embedding=HIDDEN_EMB,
                hidden_derivative=HIDDEN_DER, nb_steps=N, backend="pallas",
                pallas_dw_mode=mode, pallas_node_chunk=nc, pallas_tile_r=tr,
            )
        params = model.init(jax.random.PRNGKey(0))

        def loss(p, xx, model=model):
            ll, _ = model.compute_ll(p, xx)
            return -jnp.mean(ll)

        steps[label] = (jax.jit(jax.value_and_grad(loss)), params)

    # compile + floor measurement per config
    floors, best = {}, {}
    for label, (step, params) in steps.items():
        try:
            out = step(params, x)
            _ = float(out[0])
        except Exception as e:  # noqa: BLE001
            print(f"{label}: COMPILE FAILED: {type(e).__name__}", file=sys.stderr)
            steps[label] = None
            continue
        fl = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            out = step(params, x)
            _ = float(out[0])
            fl = min(fl, time.perf_counter() - t0)
        floors[label] = fl
        best[label] = 1e9

    for r in range(rounds):
        for label, entry in steps.items():
            if entry is None:
                continue
            step, params = entry
            t0 = time.perf_counter()
            for _ in range(iters):
                out = step(params, x)
            _ = float(out[0])
            dt = (time.perf_counter() - t0 - floors[label]) / (iters - 1)
            best[label] = min(best[label], dt)
            print(f"round {r} {label}: {dt*1e3:.2f} ms", flush=True)

    print(json.dumps({k: round(v * 1e3, 3) for k, v in best.items()}))


if __name__ == "__main__":
    sys.exit(main())
