"""Probe: can the fused kernel beat XLA at the (small) UCI parity config?

rows = B*D = 3000 only; the kernel's fixed costs (grid setup, param loads)
amortize poorly there, so XLA has held the lead (~0.85 vs 0.95 ms). Sweep
tile_r with the nc=K kernel, XLA as the in-process drift anchor.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from umnn_tpu.models.umnn_maf import UMNNMAF

B, D, E, N = 500, 6, 30, 50

CONFIGS = [("xla", None)] + [("pallas", t) for t in (64, 128, 256, 384)]


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    x = jax.random.normal(jax.random.PRNGKey(1), (B, D))
    steps = {}
    for backend, tr in CONFIGS:
        kw = {} if tr is None else {"pallas_tile_r": tr}
        model = UMNNMAF(
            input_size=D, embedding_s=E, hidden_embedding=(512, 512),
            hidden_derivative=(50, 50, 50, 50), nb_steps=N, backend=backend, **kw,
        )
        params = model.init(jax.random.PRNGKey(0))

        def loss(p, xx, model=model):
            ll, _ = model.compute_ll(p, xx)
            return -jnp.mean(ll)

        steps[f"{backend}_t{tr}"] = (jax.jit(jax.value_and_grad(loss)), params)

    floors, best = {}, {}
    for label, (step, params) in steps.items():
        try:
            _ = float(step(params, x)[0])
        except Exception as e:  # noqa: BLE001
            print(f"{label}: FAILED {type(e).__name__}", file=sys.stderr)
            steps[label] = None
            continue
        fl = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            _ = float(step(params, x)[0])
            fl = min(fl, time.perf_counter() - t0)
        floors[label] = fl
        best[label] = 1e9

    for r in range(4):
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
            print(f"round {r} {label}: {dt*1e3:.3f} ms", flush=True)
    print(json.dumps({k: round(v * 1e3, 3) for k, v in best.items()}))


if __name__ == "__main__":
    sys.exit(main())


# Measured results (v5e, time-shared; min over rounds):
# - busy-chip window: xla 0.821, t64 0.719 (Pallas "wins")
# - quiet-chip window, 8 rounds: xla 0.773, t32 0.833, t48 0.890, t64 0.790
# Conclusion: at 3000 folded rows XLA and tuned Pallas(t64) are equal within
# the chip's drift (+-5%); single-window winners are noise. The auto
# backend's 12288-row threshold for width<=64 therefore stands.
