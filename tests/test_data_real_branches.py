"""Fixture tests for the REAL-file preprocessing branches of the data layer.

The real UCI/image files are not redistributable and unavailable offline, so
these tests lay out tiny synthetic files with the exact on-disk formats
(npy / pandas pickle / CSV / freyfaces pickle) and assert the load pipelines
against independently hand-replicated reference transcripts:

* POWER — seed-42 shuffle, column deletions, the voltage-before-gap RNG draw
  ORDER, tail splits, train+valid z-scoring (`datasets/power.py:30-74`);
* GAS — Meth/Eth/Time drop and the iterative SIGNED-threshold correlation
  pruning: corr > 0.98 triggers drops, corr < -0.98 must NOT
  (`datasets/gas.py:30-72`);
* HEPMASS — class-1 filtering, spurious-last-column drop, train-moment
  z-scoring, and the smallest-value-multiplicity > 5 feature removal
  (`datasets/hepmass.py:40-92`);
* MINIBOONE — tail splits + train+valid z-scoring (`miniboone.py:27-69`);
* Freyfaces — pickle[0]/255 and the seeded shuffle-then-split 1565/200/200
  layout (`vae_lib/utils/load_data.py:57-100`).
"""

import numpy as np
import pytest

from umnn_tpu.data.images import load_freyfaces
from umnn_tpu.data.uci import load_uci


# --- POWER ---------------------------------------------------------------


def test_power_real_branch(tmp_path):
    rng0 = np.random.RandomState(7)
    raw = rng0.randn(60, 8) * 3.0
    (tmp_path / "power").mkdir()
    np.save(tmp_path / "power" / "data.npy", raw)

    data = load_uci("power", root=tmp_path, synthetic=False)

    # independent transcript of `power.py:30-74`
    r = np.random.RandomState(42)
    d = raw.copy()
    r.shuffle(d)
    n = d.shape[0]
    d = np.delete(d, 3, axis=1)
    d = np.delete(d, 1, axis=1)
    voltage_noise = 0.01 * r.rand(n, 1)  # drawn BEFORE gap noise
    gap_noise = 0.001 * r.rand(n, 1)
    sm_noise = r.rand(n, 3)
    time_noise = np.zeros((n, 1))
    d = d + np.hstack((gap_noise, voltage_noise, sm_noise, time_noise))
    n_test = int(0.1 * d.shape[0])
    tst = d[-n_test:]
    rest = d[:-n_test]
    n_val = int(0.1 * rest.shape[0])
    trn, val = rest[:-n_val], rest[-n_val:]
    joint = np.vstack((trn, val))
    mu, s = joint.mean(0), joint.std(0)

    np.testing.assert_allclose(data.trn, (trn - mu) / s, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(data.val, (val - mu) / s, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(data.tst, (tst - mu) / s, rtol=1e-5, atol=1e-5)
    assert data.n_dims == 6  # 8 raw - 2 deleted columns
    assert len(data.trn) == 49 and len(data.val) == 5 and len(data.tst) == 6


def test_power_rng_draw_order_matters(tmp_path):
    """Swapping the voltage/gap draw order changes the data — guards the
    byte-equivalence comment in `_load_power` against 'simplification'."""
    rng0 = np.random.RandomState(7)
    raw = rng0.randn(60, 8)
    (tmp_path / "power").mkdir()
    np.save(tmp_path / "power" / "data.npy", raw)
    data = load_uci("power", root=tmp_path, synthetic=False)

    r = np.random.RandomState(42)
    d = raw.copy()
    r.shuffle(d)
    n = d.shape[0]
    d = np.delete(np.delete(d, 3, axis=1), 1, axis=1)
    gap_first = 0.001 * r.rand(n, 1)  # WRONG order: gap before voltage
    voltage = 0.01 * r.rand(n, 1)
    sm = r.rand(n, 3)
    d_wrong = d + np.hstack((gap_first, voltage, sm, np.zeros((n, 1))))
    n_test = int(0.1 * n)
    rest = d_wrong[:-n_test]
    n_val = int(0.1 * rest.shape[0])
    trn_wrong = rest[:-n_val]
    assert not np.allclose(
        data.trn[:, :2],
        ((trn_wrong - np.vstack((rest[:-n_val], rest[-n_val:])).mean(0))
         / np.vstack((rest[:-n_val], rest[-n_val:])).std(0))[:, :2],
        atol=1e-6,
    )


# --- GAS -----------------------------------------------------------------


def test_gas_correlation_pruning(tmp_path):
    pd = pytest.importorskip("pandas")
    rng = np.random.RandomState(0)
    n = 200
    base = rng.randn(n)
    df = pd.DataFrame(
        {
            "Time": np.arange(n, dtype=float),
            "Meth": rng.randn(n),
            "Eth": rng.randn(n),
            "CO": rng.randn(n),
            # A ~ B: corr ~ +1 -> the iterative pruning must drop A (first
            # column with count > 1), then stop
            "A": base,
            "B": base + 1e-6 * rng.randn(n),
            # C = -A: corr ~ -1 -> signed threshold (> 0.98) must NOT drop it
            "C": -base + 1e-6 * rng.randn(n),
            "D": rng.randn(n),
        }
    )
    (tmp_path / "gas").mkdir()
    df.to_pickle(tmp_path / "gas" / "ethylene_CO.pickle")

    data = load_uci("gas", root=tmp_path, synthetic=False)

    # survivors: CO, B, C, D (Time/Meth/Eth dropped by name, A by pruning)
    assert data.n_dims == 4
    kept = df.drop(columns=["Time", "Meth", "Eth", "A"])
    normed = ((kept - kept.mean()) / kept.std()).to_numpy()
    n_test = int(0.1 * n)
    rest = normed[:-n_test]
    n_val = int(0.1 * rest.shape[0])
    np.testing.assert_allclose(data.trn, rest[:-n_val], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(data.tst, normed[-n_test:], rtol=1e-5, atol=1e-5)
    # anti-correlated column survived: some column of trn correlates ~ -1
    # with the B-column
    corr = np.corrcoef(data.trn.T)
    assert corr.min() < -0.95


# --- HEPMASS ---------------------------------------------------------------


def test_hepmass_filtering_and_feature_drop(tmp_path):
    pd = pytest.importorskip("pandas")
    rng = np.random.RandomState(1)
    n = 80
    label = np.array([1.0, 0.0]).repeat(n // 2)
    f_cont = rng.randn(n, 3)
    # a quasi-discrete feature: its MINIMUM value repeats 10 times among
    # class-1 rows -> must be dropped (`hepmass.py:75-81` counts the
    # smallest value's multiplicity)
    f_disc = rng.randn(n)
    f_disc[:40][:10] = f_disc.min() - 1.0
    trn_df = pd.DataFrame(
        {
            "label": label,
            "f0": f_cont[:, 0],
            "f1": f_disc,
            "f2": f_cont[:, 1],
            "f3": f_cont[:, 2],
        }
    )
    tst_df = trn_df.copy()
    tst_df["junk"] = np.ones(n)  # the test set's spurious last column
    (tmp_path / "hepmass").mkdir()
    trn_df.to_csv(tmp_path / "hepmass" / "1000_train.csv", index=False)
    tst_df.to_csv(tmp_path / "hepmass" / "1000_test.csv", index=False)

    data = load_uci("hepmass", root=tmp_path, synthetic=False)

    # 4 features, minus the quasi-discrete one -> 3 dims
    assert data.n_dims == 3
    # class-1 filter keeps 40 rows; val = 10% tail of train
    assert len(data.trn) + len(data.val) == 40 and len(data.val) == 4
    assert len(data.tst) == 40
    # transcript: z-score class-1 rows by train moments, drop f1
    cls1 = trn_df[trn_df["label"] == 1].drop(columns=["label"])
    mu, s = cls1.mean(), cls1.std()
    normed = ((cls1 - mu) / s).to_numpy()
    kept = normed[:, [0, 2, 3]]
    np.testing.assert_allclose(data.trn, kept[:-4], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(data.val, kept[-4:], rtol=1e-5, atol=1e-5)


# --- MINIBOONE -------------------------------------------------------------


def test_miniboone_splits(tmp_path):
    rng = np.random.RandomState(3)
    raw = rng.randn(100, 5).astype(np.float64)
    (tmp_path / "miniboone").mkdir()
    np.save(tmp_path / "miniboone" / "data.npy", raw)
    data = load_uci("miniboone", root=tmp_path, synthetic=False)
    assert len(data.tst) == 10 and len(data.val) == 9 and len(data.trn) == 81
    joint = np.vstack([data.trn, data.val])
    np.testing.assert_allclose(joint.mean(0), 0.0, atol=1e-5)
    np.testing.assert_allclose(joint.std(0), 1.0, atol=1e-4)
    # test split is the raw tail, z-scored by train+valid moments
    mu = np.vstack([raw[:81], raw[81:90]]).mean(0)
    s = np.vstack([raw[:81], raw[81:90]]).std(0)
    np.testing.assert_allclose(data.tst, (raw[-10:] - mu) / s, rtol=1e-5)


# --- Freyfaces --------------------------------------------------------------


def test_freyfaces_split_indices(tmp_path):
    import pickle

    rng = np.random.RandomState(5)
    raw = rng.randint(0, 256, size=(1965, 28 * 20)).astype(np.float64)
    (tmp_path / "freyfaces").mkdir()
    with open(tmp_path / "freyfaces" / "freyfaces.pkl", "wb") as f:
        # the real pickle is a tuple with the pixel matrix at [0]
        pickle.dump((raw, {"meta": 1}), f)

    data = load_freyfaces(root=tmp_path, seed=123, synthetic=False)

    expect = raw / 255.0
    np.random.RandomState(123).shuffle(expect)
    np.testing.assert_allclose(data.trn, expect[:1565], rtol=1e-6)
    np.testing.assert_allclose(data.val, expect[1565:1765], rtol=1e-6)
    np.testing.assert_allclose(data.tst, expect[1765:1965], rtol=1e-6)
    assert data.input_type == "multinomial"
    assert data.input_size == (1, 28, 20)
    assert not data.dynamic_binarization
