"""Compact float16 parameter snapshots (`checkpoint.save_params_npz` /
`load_params_npz` and `scripts/snapshot_params.py`): the cross-round
durability path added after the round-3 AR(1) gate run lost its
(uncommitted) Orbax checkpoints to a box re-clone. Compile-free."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from umnn_tpu.training.checkpoint import (
    CheckpointManager,
    load_params_npz,
    save_params_npz,
)


def _params():
    return {
        "made": [jnp.arange(6, dtype=jnp.float32).reshape(3, 2) / 7.0,
                 jnp.asarray([0.25, -1.5], jnp.float32)],
        "scale": jnp.asarray([[2.0]], jnp.float32),
    }


def _template():
    return jax.tree_util.tree_map(jnp.zeros_like, _params())


def test_roundtrip_within_f16(tmp_path):
    out = tmp_path / "snap.npz"
    save_params_npz(out, _params())
    restored = loaded = load_params_npz(out, _template())
    flat_o = jax.tree_util.tree_leaves(_params())
    flat_r = jax.tree_util.tree_leaves(restored)
    assert len(flat_o) == len(flat_r)
    for o, r in zip(flat_o, flat_r):
        assert r.dtype == jnp.float32  # cast back to the template dtype
        np.testing.assert_allclose(np.asarray(o), np.asarray(r), rtol=1e-3)
    assert loaded["scale"].shape == (1, 1)


def test_shape_mismatch_raises(tmp_path):
    out = tmp_path / "snap.npz"
    save_params_npz(out, _params())
    bad = _template()
    bad["scale"] = jnp.zeros((2, 2), jnp.float32)
    with pytest.raises(ValueError, match="shape"):
        load_params_npz(out, bad)


def test_leaf_count_mismatch_raises(tmp_path):
    out = tmp_path / "snap.npz"
    save_params_npz(out, _params())
    bad = _template()
    del bad["scale"]
    with pytest.raises(ValueError, match="leaves"):
        load_params_npz(out, bad)


def test_snapshot_script_best_tag(tmp_path, monkeypatch):
    """The script's best_* path must preserve the save_best leaf order so a
    driver template (flatten(params)) lines up with flatten({'params': ...})."""
    run = tmp_path / "run"
    ckpt = CheckpointManager(run / "ckpt")
    ckpt.save_best("valid", _params())

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    try:
        import snapshot_params
    finally:
        sys.path.pop(0)
    monkeypatch.setattr(
        sys, "argv", ["snapshot_params.py", str(run), "-tag", "valid"]
    )
    snapshot_params.main()

    out = run / "params_valid.f16.npz"
    assert out.exists()
    restored = load_params_npz(out, _template())
    for o, r in zip(
        jax.tree_util.tree_leaves(_params()), jax.tree_util.tree_leaves(restored)
    ):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r), rtol=1e-3)
