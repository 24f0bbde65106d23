"""pack2 A/B at the UCI parity config (companion to uci_tile_probe.py)."""
import json, sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp
from umnn_tpu.models.umnn_maf import UMNNMAF

B, D, E, N = 500, 6, 30, 50
CONFIGS = [
    ("xla", "xla", {}),
    ("pallas_nopack_t128", "pallas", dict(pallas_tile_r=128, pallas_pack2=False)),
    ("pallas_pack2_t128", "pallas", dict(pallas_tile_r=128, pallas_pack2=True)),
    ("pallas_pack2_t64", "pallas", dict(pallas_tile_r=64, pallas_pack2=True)),
    ("pallas_pack2_t256", "pallas", dict(pallas_tile_r=256, pallas_pack2=True)),
]

def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    x = jax.random.normal(jax.random.PRNGKey(1), (B, D))
    steps = {}
    for label, backend, kw in CONFIGS:
        model = UMNNMAF(
            input_size=D, embedding_s=E, hidden_embedding=(512, 512),
            hidden_derivative=(50, 50, 50, 50), nb_steps=N, backend=backend, **kw,
        )
        params = model.init(jax.random.PRNGKey(0))
        def loss(p, xx, model=model):
            ll, _ = model.compute_ll(p, xx)
            return -jnp.mean(ll)
        steps[label] = (jax.jit(jax.value_and_grad(loss)), params)

    floors, best = {}, {}
    ref = None
    for label, (step, params) in steps.items():
        try:
            out = float(step(params, x)[0])
        except Exception as e:
            print(f"{label}: FAILED {type(e).__name__}: {e}", file=sys.stderr)
            steps[label] = None
            continue
        if ref is None:
            ref = out
        else:
            assert abs(out - ref) / abs(ref) < 1e-4, (label, out, ref)
        fl = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            _ = float(step(params, x)[0])
            fl = min(fl, time.perf_counter() - t0)
        floors[label] = fl
        best[label] = 1e9
    for r in range(6):
        for label, entry in steps.items():
            if entry is None: continue
            step, params = entry
            t0 = time.perf_counter()
            for _ in range(iters):
                out = step(params, x)
            _ = float(out[0])
            dt = (time.perf_counter() - t0 - floors[label]) / (iters - 1)
            best[label] = min(best[label], dt)
            print(f"round {r} {label}: {dt*1e3:.3f} ms", flush=True)
    print(json.dumps({k: round(v*1e3, 3) for k, v in best.items()}))

if __name__ == "__main__":
    sys.exit(main())
