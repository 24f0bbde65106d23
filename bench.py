"""Benchmark: quadrature-point integrand-MLP evals/s/chip (BASELINE.json metric).

Measures the hot loop of UMNN training — the fused Clenshaw-Curtis integrand
sweep — as full forward+backward training-step evals/s on one chip, at BOTH
parity configs:

* ``uci``:   B=500, D=6,  hidden_derivative [50,50,50,50], embedding 30,
  50 CC steps (reference `UCIExperiments.py:196-217`);
* ``mnist``: B=100, D=784, hidden_derivative [100,50,50,50,50],
  hidden_embedding [1024,1024,1024] (reference `MNISTExperiment.py:237-250`).

"Evals" counts integrand-MLP evaluations: B * (N+1) * D per forward sweep;
a training step costs 1 fwd sweep + 1 bwd sweep + endpoint/log-jac evals
(SURVEY.md §3.1 cost model), counted explicitly below.

Variance protocol (the chip is time-shared; throughput drifts 2-3x between
runs): the two backends are INTERLEAVED inside one process across several
spaced windows, per-window times are emitted in the artifact, and the
backend comparison is min-vs-min plus an XLA-anchored ratio per config
(pallas_min / xla_min) — the ratio cancels most of the drift because both
legs of each window share the chip's load state.

``vs_baseline`` is the ratio to the PyTorch reference's own hot path
(ParallelNeuralIntegral semantics re-implemented in torch from the published
math, NOT vendored code) executed on this host's CPU — the reference has no
TPU path, so reference-on-available-hardware is its best runnable number.

Timing notes: ``jax.block_until_ready`` under-reports through the axon
tunnel, so each measurement enqueues ``iters`` executions and drains the
in-order device queue with one scalar readback; the single-call+readback RTT
(~29 ms on this tunnel) is measured separately and subtracted.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "configs"}.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp
import numpy as np

CONFIGS = {
    "uci": dict(
        B=500, D=6, E=30, N=50,
        hidden_der=(50, 50, 50, 50), hidden_emb=(512, 512),
        iters=600,
    ),
    "mnist": dict(
        B=100, D=784, E=30, N=50,
        hidden_der=(100, 50, 50, 50, 50), hidden_emb=(1024, 1024, 1024),
        iters=30,
    ),
}
WINDOWS = 4  # spaced measurement windows per (config, backend)
WINDOW_GAP_S = 2.0

# chip nominal peak (TPU v5e: ~197 TFLOP/s bf16 MXU; f32 matmuls measured
# sustaining ~172 TF/s on this chip — see CLAUDE.md). MFU uses the nominal
# peak so the number stays honest against the marketing roofline.
PEAK_TFLOPS = 197.0


def _drain_time(fn, args, iters, scalarize, floor):
    """One window: enqueue ``iters`` calls, drain with one readback."""
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    _ = float(scalarize(out))
    return (time.perf_counter() - t0 - floor) / (iters - 1)


def _call_floor(fn, args, scalarize):
    """Single-call+readback RTT (min of 3): subtracted from every window."""
    floor = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(scalarize(fn(*args)))
        floor = min(floor, time.perf_counter() - t0)
    return floor


def bench_config(name, cfg):
    """Interleaved pallas/XLA windows for one parity config."""
    from umnn_tpu.models.umnn_maf import UMNNMAF

    B, D, E, N = cfg["B"], cfg["D"], cfg["E"], cfg["N"]
    x = jax.random.normal(jax.random.PRNGKey(1), (B, D))
    backends = ["xla"]
    if jax.default_backend() == "tpu":
        backends.append("pallas")

    steps = {}
    for backend in backends:
        model = UMNNMAF(
            input_size=D, embedding_s=E,
            hidden_embedding=cfg["hidden_emb"],
            hidden_derivative=cfg["hidden_der"],
            nb_steps=N, backend=backend,
        )
        params = model.init(jax.random.PRNGKey(0))

        def loss(params, x, model=model):
            ll, _ = model.compute_ll(params, x)
            return -jnp.mean(ll)

        steps[backend] = (jax.jit(jax.value_and_grad(loss)), params)

    scalarize = lambda o: o[0]  # noqa: E731
    windows = {b: [] for b in backends}
    floors = {}
    for backend in backends:  # warm + compile (retried: flaky remote compile)
        fn, params = steps[backend]
        for attempt in range(3):
            try:
                _ = float(scalarize(fn(params, x)))
                floors[backend] = _call_floor(fn, (params, x), scalarize)
                break
            except Exception as e:  # noqa: BLE001
                if attempt == 2:
                    print(f"{name}/{backend} failed: {e}", file=sys.stderr)
                    backends.remove(backend)
    for w in range(WINDOWS):
        for backend in backends:  # interleave: both legs share chip state
            fn, params = steps[backend]
            windows[backend].append(
                _drain_time(fn, (params, x), cfg["iters"], scalarize, floors[backend])
            )
        if w < WINDOWS - 1:
            time.sleep(WINDOW_GAP_S)
    return {
        b: {"min": min(ts), "median": float(np.median(ts)), "windows": ts}
        for b, ts in windows.items()
        if ts
    }


def useful_flops_per_step(cfg):
    """Useful training FLOPs per step (SURVEY §7.10), UNPADDED shapes
    (padding is overhead, not useful work):
    * integrand MLP row: 2 * sum(din*dout) over [1+E, *hidden_der, 1];
      rows per sweep = B*(N+1)*D. Train step sweeps: forward (1x), backward
      recompute (1x), backward VJP dW+dx chain (~2x), log-jac endpoint
      (B*D rows) and the two Leibniz endpoint evals (2*B*D rows).
    * MADE conditioner [D, *hidden_emb, D*(E+1)]: forward + ~2x backward.
    """
    B, D, E, N = cfg["B"], cfg["D"], cfg["E"], cfg["N"]
    f_row = 2 * sum(
        a * b for a, b in zip([1 + E, *cfg["hidden_der"]], [*cfg["hidden_der"], 1])
    )
    sweep_rows = B * (N + 1) * D
    endpoint_rows = 3 * B * D
    integrand = f_row * (4 * sweep_rows + endpoint_rows)
    made_sizes = [D, *cfg["hidden_emb"], D * (E + 1)]
    f_made = 2 * sum(a * b for a, b in zip(made_sizes[:-1], made_sizes[1:]))
    made = 3 * f_made * B
    return integrand + made


def bench_torch_reference(cfg, rounds=4):
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

    B, D, E, N = cfg["B"], cfg["D"], cfg["E"], cfg["N"]
    t_nodes, w = cc_quadrature(N)
    nodes_t = torch.tensor(t_nodes, dtype=torch.float32)
    ccw_t = torch.tensor(w, dtype=torch.float32)

    sizes = [1 + E, *cfg["hidden_der"], 1]
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
    for _ in range(rounds):  # min-of-N: the 1-core host is noisy
        t0 = time.perf_counter()
        step()
        best = min(best, time.perf_counter() - t0)
    return best


def _tunnel_alive(timeout=3.0):
    """TCP-probe the axon relay (see scripts/tpu_probe.py): when its
    listener threads die, any jax device call blocks forever, so bench
    must fail fast with a diagnostic line instead of hanging the driver."""
    import socket

    for port in (8082, 8083, 8087):
        try:
            with socket.create_connection(("127.0.0.1", port), timeout=timeout):
                return True
        except OSError:
            continue
    return False


def main():
    import os

    if os.environ.get("JAX_PLATFORMS", "").lower() != "cpu" and not _tunnel_alive():
        print(json.dumps({
            "metric": "quadrature-point integrand-MLP evals/s/chip (UCI parity config, fwd+bwd train step)",
            "value": 0.0,
            "unit": "evals/s",
            "vs_baseline": 0.0,
            "error": "TPU tunnel dead (TCP probe of the axon relay ports "
                     "failed); jax.devices() would hang. See scripts/tpu_probe.py.",
        }))
        return 1

    configs_out = {}
    for name, cfg in CONFIGS.items():
        results = bench_config(name, cfg)
        if not results:
            continue
        B, D, N = cfg["B"], cfg["D"], cfg["N"]
        best = min(r["min"] for r in results.values())
        torch_dt = bench_torch_reference(cfg)
        evals_per_step = B * D * (2 * (N + 1) + 1)
        torch_evals_per_step = B * D * 2 * (N + 1)
        flops_step = useful_flops_per_step(cfg)
        tflops_eff = flops_step / best / 1e12
        # shape-imposed MFU ceiling: the integrand layers (<=100 wide) each
        # occupy one full 128x128 MXU tile, so useful/padded FLOPs bounds
        # the reachable MFU at these parity shapes (PERF.md; pack2 packs
        # two quadrature nodes per row when every layer fits 64 lanes)
        widths = [1 + cfg["E"], *cfg["hidden_der"]]
        pack = 2 if max(widths) <= 64 else 1
        f_row = 2 * sum(
            a * b for a, b in zip(widths, [*cfg["hidden_der"], 1])
        )
        ceiling = f_row * pack / (2 * 128 * 128 * (len(cfg["hidden_der"]) + 1))
        entry = {
            "evals_per_s": round(evals_per_step / best, 1),
            "mfu_shape_ceiling": round(ceiling, 4),
            "vs_torch_cpu": round(
                (evals_per_step / best) / (torch_evals_per_step / torch_dt), 3
            ),
            "tflops_effective": round(tflops_eff, 3),
            "mfu": round(tflops_eff / PEAK_TFLOPS, 4),
            "useful_flops_per_step": flops_step,
            "backends_ms": {
                b: {
                    "min": round(r["min"] * 1e3, 3),
                    "median": round(r["median"] * 1e3, 3),
                    "windows": [round(t * 1e3, 3) for t in r["windows"]],
                }
                for b, r in results.items()
            },
        }
        if "pallas" in results and "xla" in results:
            # drift-cancelling comparison: both legs of each window share
            # the chip's load state (< 1 = pallas faster)
            entry["pallas_over_xla_min"] = round(
                results["pallas"]["min"] / results["xla"]["min"], 3
            )
            entry["pallas_over_xla_per_window"] = [
                round(p / x, 3)
                for p, x in zip(
                    results["pallas"]["windows"], results["xla"]["windows"]
                )
            ]
        configs_out[name] = entry

    if not configs_out:
        print("bench: all configs failed; see stderr", file=sys.stderr)
        return 1
    head = configs_out.get("uci") or next(iter(configs_out.values()))
    out = {
        "metric": "quadrature-point integrand-MLP evals/s/chip (UCI parity config, fwd+bwd train step)",
        "value": head["evals_per_s"],
        "unit": "evals/s",
        "vs_baseline": head["vs_torch_cpu"],
        "tflops_effective": head["tflops_effective"],
        "mfu": head["mfu"],
        "peak_tflops_assumed": PEAK_TFLOPS,
        "configs": configs_out,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
