"""Assemble the full parity_real table from per-leg logs.

The orchestrator (`scripts/parity_real.py`) holds its row list in memory,
so a mid-pass interruption (TPU stall, API kill) loses the table even when
every leg's artifacts survive on disk. This assembler rebuilds
`parity_table.json` from the legs' final JSON stdout lines — the same
lines `parity_real.run()` parses — wherever they landed (the shared
`parity.log`, or a per-leg resume log), recomputing targets exactly as
the orchestrator does (synthetic floors at the real row counts;
BASELINE.md numbers for real data).

Usage:
    python scripts/parity_assemble.py [--out runs/parity_real]
"""

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


import re

_EPOCH_RE = re.compile(r"^epoch\s+(\d+)\b")


def last_json(paths, match):
    """Return (obj, epochs) — the last parseable JSON object line containing
    `match` across the given log files (later files win), plus the actual
    epoch budget recovered from the nearest preceding `epoch K` training
    line (K+1; None if the leg's run dir and log both lack it)."""
    found, found_epochs = None, None
    for p in paths:
        p = Path(p)
        if not p.exists():
            continue
        last_epoch = None
        for line in p.read_text(errors="replace").splitlines():
            line = line.strip()
            m = _EPOCH_RE.match(line)
            if m:
                last_epoch = int(m.group(1)) + 1
                continue
            if not line.startswith("{") or match not in line:
                continue
            try:
                obj = json.loads(line)
            except json.JSONDecodeError:
                continue
            # training-run lines only — skip eval-only reproductions
            if obj.get("mode") == "test_only":
                continue
            found, found_epochs = obj, last_epoch
    return found, found_epochs


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="runs/parity_real")
    ap.add_argument(
        "--extra_logs", nargs="*", default=[],
        help="additional leg logs to scan (e.g. a committed run from an "
        "earlier round when this round's harness leg was interrupted)",
    )
    args = ap.parse_args()
    out_dir = REPO / args.out

    from umnn_tpu.data.uci import SYNTH_REAL_ROWS, synthetic_floor

    def leg_epochs(*candidates):
        # the actual epoch budget, from the leg run-dir's args.json (so a
        # budget-capped assembled row is labeled just like the orchestrator's)
        for c in candidates:
            p = out_dir / c / "args.json"
            if p.exists():
                return json.loads(p.read_text()).get("nb_epoch")
        return None

    logs = (sorted(out_dir.glob("*.log")) + sorted(out_dir.glob("*_leg.log"))
            + [REPO / p for p in args.extra_logs])
    rows = []
    for ds in ["power", "gas", "hepmass", "miniboone", "bsds300"]:
        obj, log_epochs = last_json(logs, f'"synthetic-{ds}"')
        if obj is None:
            rows.append((ds, "MISSING", None, None, None))
            continue
        floor = synthetic_floor(ds, n_rows=SYNTH_REAL_ROWS[ds])
        rows.append((ds, "synthetic", obj["test_nll"], floor,
                     leg_epochs(f"uci/{ds}") or log_epochs))

    obj, log_epochs = last_json(logs, '"test_bpp"')
    if obj is None:
        rows.append(("mnist_flow", "MISSING", None, None, None))
    else:
        rows.append(("mnist_flow", "synthetic-ar1", obj["test_bpp"],
                     obj["floor_bpp"], leg_epochs("mnist") or log_epochs))

    obj, log_epochs = last_json(logs, '"test_elbo"')
    if obj is None:
        # pre-r4 driver logs print 'FINAL test ELBO: X' without the JSON line
        elbo_re = re.compile(r"FINAL test ELBO:\s*([0-9.]+)")
        for p in logs:
            if not Path(p).exists():
                continue
            last_epoch = None
            for line in Path(p).read_text(errors="replace").splitlines():
                m = _EPOCH_RE.match(line.strip())
                if m:
                    last_epoch = int(m.group(1)) + 1
                m = elbo_re.search(line)
                if m:
                    obj, log_epochs = {"test_elbo": float(m.group(1))}, last_epoch
    if obj is None:
        rows.append(("vae_mmaf", "MISSING", None, None, None))
    else:
        rows.append(("vae_mmaf", "synthetic", obj["test_elbo"],
                     784 * 0.6931471805599453,
                     leg_epochs("vae/mnist_MMAF") or log_epochs))

    print("\n| workload | data | measured | target (floor) | gap | epochs |")
    print("|---|---|---|---|---|---|")
    report = []
    for name, kind, measured, target, epochs in rows:
        gap = None if (measured is None or target is None) else measured - target
        fmt = lambda v: "-" if v is None else f"{v:.4f}"  # noqa: E731
        print(f"| {name} | {kind} | {fmt(measured)} | {fmt(target)} | "
              f"{fmt(gap)} | {epochs} |")
        report.append(dict(workload=name, data=kind, measured=measured,
                           target=target, gap=gap, epochs=epochs))
    (out_dir / "parity_table.json").write_text(json.dumps(report, indent=1))
    print(f"\ntable -> {out_dir / 'parity_table.json'}")
    return 0 if all(r[1] != "MISSING" for r in rows) else 1


if __name__ == "__main__":
    sys.exit(main())
