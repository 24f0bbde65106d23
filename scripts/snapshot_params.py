"""Export a run's parameters as a compact committable float16 snapshot.

Round-transition durability (round-3 lesson): `runs/` checkpoint
directories are not committed — the round-3 784-d AR(1) gate run lost its
Orbax checkpoints when the box was re-cloned, forcing a from-scratch
restart. This script converts a run's saved state into a single float16
`.npz` small enough to commit (params only, half precision: ~270 MB for
the 135M-param MNIST geometry, ~4 MB for UCI-parity models), which the
drivers reload via ``-load_npz`` (warm start, fresh optimizer) — including
the reference's eval-only path (`UCIExperiments.py:93-122` loads
model_best_train.pt; here `-test -load_npz snap.npz`).

Usage:
    python scripts/snapshot_params.py RUN_FOLDER [-tag valid|train|train_valid|latest]
        [-out OUT.npz]

``-tag latest`` reads the newest Orbax step checkpoint; the best_* tags
read the flat numpy best-param snapshots (`CheckpointManager.save_best`).
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("folder", help="run folder (contains ckpt/)")
    p.add_argument(
        "-tag", default="valid", choices=["valid", "train", "train_valid", "latest"]
    )
    p.add_argument(
        "-step", type=int, default=None,
        help="with -tag latest: a specific retained Orbax step instead of "
             "the newest (recovers a historical best whose best-tag stash "
             "was lost to a mid-run kill)",
    )
    p.add_argument("-out", default="", help="output .npz (default <folder>/params_<tag>.f16.npz)")
    args = p.parse_args()

    folder = Path(args.folder)
    suffix = f"step{args.step}" if args.step is not None else args.tag
    out = Path(args.out) if args.out else folder / f"params_{suffix}.f16.npz"

    if args.tag == "latest" or args.step is not None:
        # jax import deferred: the best_* path below is pure numpy
        import jax

        from umnn_tpu.training.checkpoint import CheckpointManager, save_params_npz

        ckpt = CheckpointManager(folder / "ckpt")
        restored = ckpt.restore(step=args.step)
        if restored is None:
            sys.exit(f"no Orbax step checkpoints under {folder}/ckpt/steps")
        step, params, _opt = restored
        save_params_npz(out, params)
        n = sum(x.size for x in jax.tree_util.tree_leaves(params))
        print(f"step {step}: {n} params -> {out} ({out.stat().st_size/1e6:.1f} MB)")
        return

    src = folder / "ckpt" / f"best_{args.tag}"
    if not (src / "arrays.npz").exists():
        sys.exit(f"no best-{args.tag} snapshot under {folder}/ckpt")
    with np.load(src / "arrays.npz") as data:
        leaves = [data[k] for k in data.files]
    treedef = (src / "treedef.txt").read_text()
    # leaf order: flatten({'params': params}) == flatten(params) for the
    # single-key wrapper save_best writes, so -load_npz templates line up
    arrays = {f"leaf_{i}": x.astype(np.float16) for i, x in enumerate(leaves)}
    np.savez_compressed(out, __treedef__=np.array(treedef), **arrays)
    n = sum(x.size for x in leaves)
    print(f"best-{args.tag}: {n} params -> {out} ({out.stat().st_size/1e6:.1f} MB)")


if __name__ == "__main__":
    main()
