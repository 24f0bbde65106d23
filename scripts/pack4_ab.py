"""pack4 vs pack2 vs unpacked vs XLA A/B at a toy-config shape.

Interleaved in ONE process (the repo's A/B rule: cross-process comparisons
are meaningless at 2-3x device drift). Config: the verify-surface toy shape
B=256, D=2, e=8, hidden_derivative (32, 32), N=16 — the <=32-lane regime
pack4 targets (VERDICT r2 next-step #6). A second, heavier variant at
B=2048 stresses the MXU-bound regime where packing should matter most.

Result (2026-08-17, v5e via axon, min over interleaved rounds, shared-chip
window): toy_B256 — xla 0.307 ms, pallas_nopack 0.356, pallas_pack2 0.446,
pallas_pack4 0.319; toy_B2048 — xla 0.358, nopack 0.415, pack2 0.414,
pack4 0.432. Conclusion: pack4 is the best PALLAS variant at the small-batch
toy shape (−10% vs nopack, −28% vs pack2, whose 64-lane packing pads badly
at width 32), but XLA still edges every kernel variant at these tiny
dispatch-bound shapes and all arms tie within device drift at B2048 — the
width-aware auto crossover correctly keeps toy/monotonic configs on XLA, so
pack4 stays a correctness-pinned, auto-disabled specialization (negative
result recorded per the repo's A/B discipline).
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax
import jax.numpy as jnp

from umnn_tpu.models.umnn_maf import UMNNMAF

E, N = 8, 16
HD = (32, 32)


def build(B, D):
    x = jax.random.normal(jax.random.PRNGKey(1), (B, D))
    configs = [
        ("xla", "xla", {}),
        ("pallas_nopack", "pallas", dict(pallas_pack2=False, pallas_pack4=False)),
        ("pallas_pack2", "pallas", dict(pallas_pack2=True, pallas_pack4=False)),
        ("pallas_pack4", "pallas", dict(pallas_pack4=True)),
    ]
    steps = {}
    for label, backend, kw in configs:
        model = UMNNMAF(
            input_size=D, embedding_s=E, hidden_embedding=(64, 64),
            hidden_derivative=HD, nb_steps=N, backend=backend, **kw,
        )
        params = model.init(jax.random.PRNGKey(0))

        def loss(p, xx, model=model):
            ll, _ = model.compute_ll(p, xx)
            return -jnp.mean(ll)

        steps[label] = (jax.jit(jax.value_and_grad(loss)), params)
    return steps, x


def run(tag, B, D, iters, rounds=6):
    steps, x = build(B, D)
    floors, best = {}, {}
    ref = None
    for label in list(steps):
        step, params = steps[label]
        try:
            out = float(step(params, x)[0])
        except Exception as e:  # noqa: BLE001
            print(f"{tag}/{label}: FAILED {type(e).__name__}: {e}", file=sys.stderr)
            del steps[label]
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
    for r in range(rounds):
        for label, (step, params) in steps.items():
            t0 = time.perf_counter()
            out = None
            for _ in range(iters):
                out = step(params, x)
            _ = float(out[0])
            dt = (time.perf_counter() - t0 - floors[label]) / (iters - 1)
            best[label] = min(best[label], dt)
            print(f"{tag} round {r} {label}: {dt*1e3:.3f} ms", flush=True)
    return {k: round(v * 1e3, 3) for k, v in best.items()}


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    out = {
        "toy_B256": run("toy_B256", 256, 2, iters),
        "toy_B2048": run("toy_B2048", 2048, 2, iters),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
