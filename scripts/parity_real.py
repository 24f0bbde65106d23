"""One-command real-data parity harness (VERDICT r2 next-step #5).

Runs the full reference-config suite against whatever data is mounted under
the data root and emits a BASELINE.md-vs-measured table. Datasets whose
files are absent fall back to the synthetic stand-ins (exact-floor gates) so
the plumbing is provable today — the day real files appear under
``$UMNN_DATA_ROOT`` (see `umnn_tpu/data/uci.py::uci_available` for the
expected layout, reference `datasets/download_datasets.py:232-282` for
sources), the SAME command runs the real parity suite with zero edits.

Reference configs replicated (BASELINE.md): UCI — nb_flow 5,
hidden_embedding [512,512], hidden_derivative [50,50,50,50], embedding 30,
CC steps 50, Adam lr 1e-3 wd 1e-2, batch 500, scheduler factor 0.5 /
patience 5 / rel-threshold 1e-2, 500 epochs (`UCIExperiments.py:196-217`);
MNIST flow — [1024]*3 embedding, [100,50,50,50,50] derivative, batch 100
(`MNISTExperiment.py:237-250`); MMAF VAE — z 64, made_h 320, 4 flows,
Adamax 5e-4, warmup 100, final IWAE S=5000/MB=500 (`TrainVaeFlow.py:66-110`).

Usage:
    python scripts/parity_real.py [--root DATA_ROOT] [--quick] [--only ...]
    --quick: cap epochs for a fast plumbing proof (synthetic fallbacks)
"""

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

BASELINE = {  # poster/UMNN-poster2.pdf p.1 (BASELINE.md); NLL nats, mnist bpp
    "power": -0.63, "gas": -10.89, "hepmass": 13.99,
    "miniboone": 9.67, "bsds300": -157.98, "mnist_flow": 1.13,
}


def run(cmd, log_path):
    print(f"$ {' '.join(cmd)}", flush=True)
    with open(log_path, "ab") as f:
        proc = subprocess.run(cmd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        f.write(proc.stdout)
    txt = proc.stdout.decode(errors="replace")
    tail = [l for l in txt.strip().splitlines() if l.startswith("{")]
    if proc.returncode != 0:
        print(txt[-2000:], flush=True)
        return None
    return json.loads(tail[-1]) if tail else None


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", default=os.environ.get("UMNN_DATA_ROOT", "datasets/data"))
    ap.add_argument("--quick", action="store_true")
    ap.add_argument(
        "--only", nargs="+", default=None,
        help="subset of: power gas hepmass miniboone bsds300 mnist_flow vae",
    )
    ap.add_argument("--out", default="runs/parity_real")
    ap.add_argument(
        "--epochs", type=int, default=None,
        help="override the per-leg epoch budget (the actual budget is "
        "recorded per row in parity_table.json so capped runs can't be "
        "mistaken for full-protocol numbers)",
    )
    args = ap.parse_args()
    os.environ["UMNN_DATA_ROOT"] = args.root

    from umnn_tpu.data.uci import SYNTH_REAL_ROWS, synthetic_floor, uci_available

    out_dir = REPO / args.out
    out_dir.mkdir(parents=True, exist_ok=True)
    log = out_dir / "parity.log"
    py = sys.executable
    rows = []
    want = args.only or ["power", "gas", "hepmass", "miniboone", "bsds300", "mnist_flow", "vae"]

    # Synthetic-leg epoch budgets: the converged per-dataset budgets from the
    # round-3 real-scale suite (PARITY_RUNS.md §2 — the plateau schedule
    # freezes the LR well before these, so more epochs buy nothing). Real
    # data keeps the reference's 500 (`UCIExperiments.py:209`).
    synth_epochs = {
        "power": "15", "gas": "25", "hepmass": "65",
        "miniboone": "400", "bsds300": "150",
    }
    for ds in ["power", "gas", "hepmass", "miniboone", "bsds300"]:
        if ds not in want:
            continue
        real = uci_available(ds, args.root)
        epochs = "500" if real and not args.quick else ("3" if args.quick else synth_epochs[ds])
        if args.epochs is not None:
            epochs = str(args.epochs)
        cmd = [
            py, str(REPO / "examples/train_uci.py"), "-data", ds,
            "-nb_epoch", epochs, "-folder", str(out_dir / "uci"),
        ]
        if not real:
            # synthetic fallback at REAL row counts so the exact floor gates
            # (quick mode caps rows for the fast plumbing proof)
            cmd += ["-synthetic", "-synthetic_rows", "20000" if args.quick else "-1"]
        res = run(cmd, log)
        if res is None:
            rows.append((ds, "FAILED", None, None, epochs))
            continue
        if real:
            rows.append((ds, "real", res["test_nll"], BASELINE[ds], epochs))
        else:
            n = 20000 if args.quick else SYNTH_REAL_ROWS[ds]
            rows.append((ds, "synthetic", res["test_nll"],
                         synthetic_floor(ds, n_rows=n), epochs))

    if "mnist_flow" in want:
        from umnn_tpu.data.images import load_mnist_raw

        try:
            load_mnist_raw(Path(args.root))
            real = True
        except FileNotFoundError:
            real = False
        epochs = "2" if args.quick else ("40" if not real else "50")
        if args.epochs is not None:
            epochs = str(args.epochs)
        cmd = [
            py, str(REPO / "examples/train_mnist.py"), "-nb_epoch", epochs,
            "-nb_steps", "0", "-folder", str(out_dir / "mnist"),
        ]
        if not real:
            # AR(1) copula at the real MNIST row count (60k = 76 rows/dim),
            # wd 0 per the §3a ablation (the reference's wd 1e-2 pins the
            # conditioner at independence on this target)
            cmd += ["-synthetic", "-synthetic_mode", "ar1", "-ar1_rho", "0.9",
                    "-ar1_rows", "60000", "-wd", "0"]
        res = run(cmd, log)
        if res is None:
            rows.append(("mnist_flow", "FAILED", None, None, epochs))
        elif real:
            rows.append(("mnist_flow", "real", res["test_bpp"],
                         BASELINE["mnist_flow"], epochs))
        else:
            rows.append(("mnist_flow", "synthetic-ar1", res["test_bpp"],
                         res["floor_bpp"], epochs))

    if "vae" in want:
        real = (Path(args.root) / "mnist_static" / "binarized_mnist_train.amat").exists()
        epochs = "2" if args.quick else ("30" if not real else "2000")
        if args.epochs is not None:
            epochs = str(args.epochs)
        cmd = [
            py, str(REPO / "examples/train_vae.py"), "-dataset", "mnist",
            "-flow", "MMAF", "-steps", "0", "-nb_epoch", epochs,
            "-folder", str(out_dir / "vae"), "-plot_every", "0",
        ]
        if args.quick:
            cmd += ["-iwae_samples", "100", "-iwae_minibatch", "50"]
        if not real:
            cmd += ["-synthetic"]
        res = run(cmd, log)
        if res is None:
            rows.append(("vae_mmaf", "FAILED", None, None, epochs))
        else:
            # synthetic binary floor: 784*ln2 nats ELBO (uniform bernoulli)
            target = None if real else 784 * 0.6931471805599453
            rows.append(("vae_mmaf", "real" if real else "synthetic",
                         res["test_elbo"], target, epochs))

    print("\n| workload | data | measured | target (baseline/floor) | gap | epochs |")
    print("|---|---|---|---|---|---|")
    report = []
    for name, kind, measured, target, epochs in rows:
        gap = None if (measured is None or target is None) else measured - target
        fmt = lambda v: "-" if v is None else f"{v:.4f}"  # noqa: E731
        print(f"| {name} | {kind} | {fmt(measured)} | {fmt(target)} | "
              f"{fmt(gap)} | {epochs} |")
        report.append(dict(workload=name, data=kind, measured=measured,
                           target=target, gap=gap, epochs=int(epochs)))
    (out_dir / "parity_table.json").write_text(json.dumps(report, indent=1))
    print(f"\ntable -> {out_dir / 'parity_table.json'}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
