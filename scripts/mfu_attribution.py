"""MFU attribution: where does the chip time of a train step actually go?
(round-4 VERDICT item 4 — no more blind packing A/Bs).

Decomposes the parity-config train step into measured on-device components
(one process, interleaved, queue-drain timing per CLAUDE.md) and compares
each against its analytic roofline:

* ``emb_fwd``      — MADE conditioner forward alone (`model.embed`)
* ``int_fwd``      — fused integrand CC sweep, forward kernel only
* ``int_step``     — integrand sweep forward + Leibniz-VJP backward kernel
* ``fwd``          — full ``compute_ll`` forward
* ``step``         — full ``value_and_grad`` train step (bench.py's number)
* ``mxu_floor``    — a dense [R,128]x[128,128] matmul chain with the SAME
  row count and layer count as the padded integrand sweep: the empirically
  attainable time for the padded FLOPs on this chip (captures sustained
  f32 MXU rate at these M sizes, not the marketing peak)

The integrand MLP's layers (<=100 wide) each occupy exactly one 128x128
MXU tile, so the *shape-imposed* ceiling is ``useful/padded`` FLOPs —
e.g. MNIST config: 31300 useful vs 6*2*128*128 padded per row = 15.9%.
Everything beyond that ratio is kernel inefficiency; this script measures
how much of the attainable (padded-FLOPs) roofline the kernel actually
reaches. Reference counterpart: none (the torch reference has no profiler
story beyond timeit — SURVEY.md §5.1).

Writes runs/mfu_attribution.json and prints a markdown table.
"""

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np

CONFIGS = {
    "uci": dict(
        B=500, D=6, E=30, N=50,
        hidden_der=(50, 50, 50, 50), hidden_emb=(512, 512), iters=400,
    ),
    "mnist": dict(
        B=100, D=784, E=30, N=50,
        hidden_der=(100, 50, 50, 50, 50), hidden_emb=(1024, 1024, 1024),
        iters=20,
    ),
}
ROUNDS = 3  # interleaved timing rounds; min-of-rounds cancels chip weather


def drain(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = float(jnp.asarray(leaf).reshape(-1)[0])


def timeit(fn, args, iters):
    out = fn(*args)
    drain(out)
    t0 = time.perf_counter()
    out = fn(*args)
    drain(out)
    floor = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    drain(out)
    return max((time.perf_counter() - t0 - floor) / max(iters - 1, 1), 1e-9)


def analyze(name, cfg):
    from umnn_tpu.models.umnn_maf import UMNNMAF
    from umnn_tpu.ops.integrand_kernel import fused_cc_integral
    from umnn_tpu.ops.quadrature import cc_quadrature

    B, D, E, N = cfg["B"], cfg["D"], cfg["E"], cfg["N"]
    backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    model = UMNNMAF(
        input_size=D, embedding_s=E, hidden_embedding=cfg["hidden_emb"],
        hidden_derivative=cfg["hidden_der"], nb_steps=N, backend=backend,
    )
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, D))

    def loss(p, xb):
        ll, _ = model.compute_ll(p, xb)
        return -jnp.mean(ll)

    step = jax.jit(jax.value_and_grad(loss))
    fwd = jax.jit(lambda p, xb: -jnp.mean(model.compute_ll(p, xb)[0]))
    emb = jax.jit(lambda p, xb: jnp.sum(model.embed(p, xb)))

    # isolated integrand sweep at the same row geometry
    layers = params["net"]["integrand"]["layers"]
    ws = [l["w"] for l in layers]
    bs = [l["b"] for l in layers]
    rows = B * D
    xr = jax.random.normal(jax.random.PRNGKey(2), (rows,))
    hr = jax.random.normal(jax.random.PRNGKey(3), (rows, E))
    n_np, w_np = cc_quadrature(N)
    nodes = jnp.asarray(n_np, jnp.float32)
    ccw = jnp.asarray(w_np, jnp.float32)
    interp = jax.default_backend() != "tpu"

    def int_fwd_f(ws, bs, xr, hr):
        return jnp.sum(fused_cc_integral(ws, bs, xr, hr, nodes, ccw,
                                         interpret=interp))

    int_fwd = jax.jit(int_fwd_f)
    int_step = jax.jit(jax.value_and_grad(int_fwd_f, argnums=(0, 1)))

    # attainable floor: dense chain with the padded geometry of the fwd sweep
    n_layers = len(cfg["hidden_der"]) + 1
    pack = 1
    if max([1 + E, *cfg["hidden_der"]]) <= 32:
        pack = 4
    elif max([1 + E, *cfg["hidden_der"]]) <= 64:
        pack = 2
    r_sweep = rows * (-(-(N + 1) // pack))  # rows x ceil(nodes/pack)
    r_pad = -(-r_sweep // 128) * 128
    a0 = jax.random.normal(jax.random.PRNGKey(4), (r_pad, 128))
    wchain = [jax.random.normal(jax.random.PRNGKey(5 + i), (128, 128))
              for i in range(n_layers)]

    def mxu_chain(a, wc):
        for w in wc:
            a = a @ w
        return jnp.sum(a)

    mxu = jax.jit(mxu_chain)

    # one profiler-trace capture attempt per config (SURVEY §5.1): through
    # the axon tunnel device-side traces may not materialize — record what
    # does. Artifacts land in runs/trace_<name>/ for TensorBoard/Perfetto.
    trace_info = {"captured": False}
    try:
        from umnn_tpu.utils.profiling import trace

        tdir = REPO / "runs" / f"trace_{name}"
        with trace(str(tdir)):
            drain(step(params, x))
        files = [p for p in tdir.rglob("*") if p.is_file()]
        trace_info = {
            "captured": any(p.suffix in (".pb", ".json", ".gz") or
                            "trace" in p.name for p in files),
            "n_files": len(files),
            "bytes": sum(p.stat().st_size for p in files),
            "dir": str(tdir),
        }
    except Exception as e:  # noqa: BLE001
        trace_info = {"captured": False, "error": repr(e)[:300]}

    fns = {
        "emb_fwd": (emb, (params, x), cfg["iters"] * 4),
        "int_fwd": (int_fwd, (ws, bs, xr, hr), cfg["iters"] * 2),
        "int_step": (int_step, (ws, bs, xr, hr), cfg["iters"]),
        "fwd": (fwd, (params, x), cfg["iters"] * 2),
        "step": (step, (params, x), cfg["iters"]),
        "mxu_floor_fwd": (mxu, (a0, wchain), cfg["iters"] * 2),
    }
    times = {k: [] for k in fns}
    for _ in range(ROUNDS):
        for k, (fn, args, iters) in fns.items():
            times[k].append(timeit(fn, args, iters))
    t = {k: min(v) for k, v in times.items()}

    # analytic FLOPs
    f_row = 2 * sum(a * b for a, b in zip([1 + E, *cfg["hidden_der"]],
                                          [*cfg["hidden_der"], 1]))
    useful_fwd_sweep = f_row * rows * (N + 1)
    padded_fwd_sweep = 2 * r_pad * 128 * 128 * n_layers
    made_sizes = [D, *cfg["hidden_emb"], D * (E + 1)]
    f_made = 2 * sum(a * b for a, b in zip(made_sizes[:-1], made_sizes[1:]))

    mxu_rate = padded_fwd_sweep / t["mxu_floor_fwd"] / 1e12  # attainable TF/s

    out = {
        "backend": backend,
        "pack": pack,
        "profiler_trace": trace_info,
        "times_ms": {k: round(v * 1e3, 3) for k, v in t.items()},
        "times_ms_rounds": {k: [round(x * 1e3, 3) for x in v]
                            for k, v in times.items()},
        "flops": {
            "integrand_row_useful": f_row,
            "integrand_row_padded": 2 * 128 * 128 * n_layers // pack,
            "fwd_sweep_useful": useful_fwd_sweep,
            "fwd_sweep_padded": padded_fwd_sweep,
            "made_fwd": f_made * B,
            "shape_ceiling_mfu": round(
                f_row * pack / (2 * 128 * 128 * n_layers), 4),
        },
        "derived": {
            "mxu_sustained_tflops_at_this_M": round(mxu_rate, 1),
            "int_fwd_padded_tflops": round(
                padded_fwd_sweep / t["int_fwd"] / 1e12, 1),
            "int_fwd_frac_of_attainable": round(
                (padded_fwd_sweep / t["int_fwd"]) / (padded_fwd_sweep / t["mxu_floor_fwd"]), 3),
            "int_bwd_over_fwd": round((t["int_step"] - t["int_fwd"]) / t["int_fwd"], 2),
            "emb_frac_of_step": round(t["emb_fwd"] / t["step"], 3),
            "int_frac_of_step": round(t["int_step"] / t["step"], 3),
            "unattributed_step_ms": round(
                (t["step"] - t["int_step"] - 3 * t["emb_fwd"]) * 1e3, 3),
        },
    }
    return out


def main():
    import os

    if os.environ.get("MFU_SMOKE"):  # CPU correctness smoke (tiny shapes)
        global ROUNDS
        ROUNDS = 1
        CONFIGS.clear()
        CONFIGS["smoke"] = dict(
            B=8, D=3, E=4, N=8, hidden_der=(8, 8), hidden_emb=(16, 16),
            iters=2,
        )
    res = {}
    for name, cfg in CONFIGS.items():
        print(f"== {name}", flush=True)
        res[name] = analyze(name, cfg)
        print(json.dumps(res[name]["times_ms"]), flush=True)
    outp = REPO / "runs" / "mfu_attribution.json"
    outp.write_text(json.dumps(res, indent=1))
    print(f"-> {outp}")
    for name, r in res.items():
        d, f, tms = r["derived"], r["flops"], r["times_ms"]
        print(f"\n### {name} ({r['backend']}, pack{r['pack']})")
        print("| component | ms | note |")
        print("|---|---|---|")
        print(f"| full train step | {tms['step']} | bench.py headline |")
        print(f"| integrand fwd+bwd | {tms['int_step']} | {d['int_frac_of_step']*100:.0f}% of step |")
        print(f"| integrand fwd sweep | {tms['int_fwd']} | {d['int_fwd_frac_of_attainable']*100:.0f}% of attainable padded-FLOPs roofline |")
        print(f"| MADE fwd | {tms['emb_fwd']} | {d['emb_frac_of_step']*100:.1f}% of step |")
        print(f"| dense 128-wide chain (same rows/layers) | {tms['mxu_floor_fwd']} | sustains {d['mxu_sustained_tflops_at_this_M']} TF/s |")
        print(f"| shape-imposed MFU ceiling | {f['shape_ceiling_mfu']*100:.1f}% | useful/padded FLOPs at width<=100 on 128x128 MXU |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
