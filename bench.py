"""Benchmark: quadrature-point integrand-MLP evals/s/chip (BASELINE.json metric).

Measures the hot loop of UMNN training — the fused Clenshaw-Curtis integrand
sweep at the UCI parity config (hidden_derivative [50,50,50,50], embedding 30,
50 CC steps, batch 500, D=6; reference `UCIExperiments.py:196-217`) — as full
forward+backward training-step evals/s on one chip, taking the best of the
XLA-megabatch and fused-Pallas backends.

"Evals" counts integrand-MLP evaluations: B * (N+1) * D per forward sweep;
a training step costs 1 fwd sweep + 1 bwd sweep + endpoint/log-jac evals
(SURVEY.md §3.1 cost model), counted explicitly below.

``vs_baseline`` is the ratio to the PyTorch reference's own hot path
(ParallelNeuralIntegral semantics re-implemented in torch from the published
math, NOT vendored code) executed on this host's CPU — the reference has no
TPU path, so reference-on-available-hardware is its best runnable number.

Timing notes: ``jax.block_until_ready`` under-reports through the axon
tunnel, so each measurement enqueues ``iters`` executions and drains the
in-order device queue with one scalar readback; the single-call+readback RTT
(~29 ms on this tunnel) is measured separately and subtracted.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp
import numpy as np

B, D, E, N = 500, 6, 30, 50
HIDDEN_EMB = (512, 512)
HIDDEN_DER = (50, 50, 50, 50)


def _timed(fn, args, iters, scalarize, rounds=5):
    """Per-call seconds over ``rounds`` windows: enqueue ``iters`` calls,
    drain with one readback. Returns (min, median) across rounds — the chip
    is time-shared and run-to-run throughput drifts 2-3x, so the min is the
    capability number and the median the expectation."""
    out = fn(*args)
    _ = float(scalarize(out))
    floor = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(scalarize(out))
        floor = min(floor, time.perf_counter() - t0)  # 1 call + readback RTT
    times = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _ = float(scalarize(out))
        times.append((time.perf_counter() - t0 - floor) / (iters - 1))
    return min(times), float(np.median(times))


def bench_jax():
    from umnn_tpu.models.umnn_maf import UMNNMAF

    cfg = dict(
        input_size=D,
        embedding_s=E,
        hidden_embedding=HIDDEN_EMB,
        hidden_derivative=HIDDEN_DER,
        nb_steps=N,
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (B, D))

    results = {}
    for backend in ("pallas", "xla"):
        if backend == "pallas" and jax.default_backend() != "tpu":
            continue
        model = UMNNMAF(backend=backend, **cfg)
        params = model.init(jax.random.PRNGKey(0))

        def loss(params, x, model=model):
            ll, _ = model.compute_ll(params, x)
            return -jnp.mean(ll)

        step = jax.jit(jax.value_and_grad(loss))
        for attempt in range(3):  # remote-compile helper is flaky
            try:
                results[backend] = _timed(
                    step, (params, x), iters=600, scalarize=lambda o: o[0]
                )
                break
            except Exception as e:  # noqa: BLE001
                if attempt == 2:
                    print(f"backend {backend} failed: {e}", file=sys.stderr)
    return results


# chip nominal peak (TPU v5e: ~197 TFLOP/s bf16 MXU; f32 matmuls measured
# sustaining ~172 TF/s on this chip — see CLAUDE.md). MFU uses the nominal
# peak so the number stays honest against the marketing roofline.
PEAK_TFLOPS = 197.0


def useful_flops_per_step():
    """Useful training FLOPs per step at the parity config (SURVEY §7.10).

    Counted on UNPADDED shapes (padding is overhead, not useful work):
    * integrand MLP row: 2 * sum(din*dout) over [1+E, *HIDDEN_DER, 1];
      rows per sweep = B*(N+1)*D.
      Train step sweeps: forward (1x), backward recompute (1x), backward
      VJP dW+dx chain (~2x), log-jac endpoint (B*D rows) and the two
      Leibniz endpoint evals (2*B*D rows).
    * MADE conditioner [D, *HIDDEN_EMB, D*(E+1)]: forward + ~2x backward.
    """
    f_row = 2 * sum(
        a * b
        for a, b in zip([1 + E, *HIDDEN_DER], [*HIDDEN_DER, 1])
    )
    sweep_rows = B * (N + 1) * D
    endpoint_rows = 3 * B * D
    integrand = f_row * (4 * sweep_rows + endpoint_rows)
    made_sizes = [D, *HIDDEN_EMB, D * (E + 1)]
    f_made = 2 * sum(a * b for a, b in zip(made_sizes[:-1], made_sizes[1:]))
    made = 3 * f_made * B
    return integrand + made


def bench_torch_reference():
    """The reference's hot path (CCParallel + Leibniz backward) in torch on CPU.

    Re-derived from the published math (Wehenkel & Louppe 2019, §3; reference
    semantics `ParallelNeuralIntegral.py:37-123`): forward under no_grad sums
    the integrand MLP over all CC nodes; backward re-sweeps the nodes with
    cotangents g*(x/2)*w_i through torch.autograd.grad. Matches what a torch
    user of the reference pays per training step, minus the MADE conditioner
    (so the baseline is, if anything, flattered).
    """
    import torch

    from umnn_tpu.ops.quadrature import cc_quadrature

    t_nodes, w = cc_quadrature(N)
    nodes_t = torch.tensor(t_nodes, dtype=torch.float32)
    ccw_t = torch.tensor(w, dtype=torch.float32)

    sizes = [1 + E, *HIDDEN_DER, 1]
    mods = []
    for a, b in zip(sizes[:-1], sizes[1:]):
        mods.append(torch.nn.Linear(a, b))
        mods.append(torch.nn.LeakyReLU())
    mods[-1] = torch.nn.ELU()
    net = torch.nn.Sequential(*mods)

    def f_net(xcol, hrows):
        return net(torch.cat([xcol, hrows], dim=-1)) + 1.0

    torch.manual_seed(0)
    x = torch.randn(B * D, 1)
    h = torch.randn(B * D, E)

    def sweep(x, h, grad_out=None):
        K = N + 1
        s = (nodes_t + 1.0) * 0.5  # [K]
        X = (x[:, None, :] * s[None, :, None]).reshape(-1, 1)  # [R*K, 1]
        H = h[:, None, :].expand(-1, K, -1).reshape(-1, E)
        if grad_out is None:
            with torch.no_grad():
                F = f_net(X, H).reshape(-1, K)
                return (F * ccw_t[None]).sum(-1, keepdim=True) * x * 0.5
        ct = (grad_out * x * 0.5) * ccw_t[None]  # [R, K]
        F = f_net(X, H).reshape(-1, K)
        gs = torch.autograd.grad((F * ct).sum(), list(net.parameters()))
        return gs

    def step():
        z = sweep(x, h)
        g = 2.0 * z / z.numel()  # d(mean z^2)/dz — stand-in loss cotangent
        _ = sweep(x, h, grad_out=g)

    step()  # warm
    best = 1e9
    for _ in range(4):  # min-of-N: the 1-core host is noisy
        t0 = time.perf_counter()
        step()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    results = bench_jax()
    if not results:
        print("bench: all backends failed; see stderr", file=sys.stderr)
        return 1
    best = min(t_min for t_min, _ in results.values())
    torch_dt = bench_torch_reference()

    # evals per train step: fwd sweep (N+1) + bwd sweep (N+1) + log-jac
    # endpoint eval (1), per (B, D) row  — SURVEY.md §3.1 cost model.
    evals_per_step = B * D * (2 * (N + 1) + 1)
    # torch baseline step above runs fwd + bwd sweeps (no log-jac endpoint)
    torch_evals_per_step = B * D * 2 * (N + 1)
    value = evals_per_step / best
    baseline = torch_evals_per_step / torch_dt

    # honest absolute story: useful-FLOPs roofline (SURVEY §7 step 10)
    flops_step = useful_flops_per_step()
    tflops_eff = flops_step / best / 1e12
    out = {
        "metric": "quadrature-point integrand-MLP evals/s/chip (UCI parity config, fwd+bwd train step)",
        "value": round(value, 1),
        "unit": "evals/s",
        "vs_baseline": round(value / baseline, 3),
        "tflops_effective": round(tflops_eff, 3),
        "mfu": round(tflops_eff / PEAK_TFLOPS, 4),
        "peak_tflops_assumed": PEAK_TFLOPS,
        "useful_flops_per_step": flops_step,
        "backends_ms": {
            k: {"min": round(t_min * 1e3, 3), "median": round(t_med * 1e3, 3)}
            for k, (t_min, t_med) in results.items()
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
