"""Data-layer tests: toy generators, UCI synthetic fallback, logit transform
round-trip, split conventions."""

import numpy as np
import pytest

from umnn_tpu.data.images import (
    add_uniform_noise_and_logit,
    load_mnist_flow,
    load_vae_dataset,
    logit_back,
)
from umnn_tpu.data.toy import TOY_DATASETS, inf_train_gen
from umnn_tpu.data.uci import UCI_DIMS, load_uci


@pytest.mark.parametrize("name", TOY_DATASETS)
def test_toy_generators(name):
    rng = np.random.RandomState(0)
    out = inf_train_gen(name, rng, batch_size=256)
    if name == "conditionnal8gaussians":
        # (x, one-hot context) contract (`toy_data.py:54-73`)
        x, ctx = out
        assert ctx.shape == (256, 8)
        np.testing.assert_array_equal(ctx.sum(axis=1), np.ones(256))
        assert set(np.unique(ctx)) <= {0.0, 1.0}
    else:
        x = out
    assert x.shape == (256, 2)
    assert x.dtype == np.float32
    assert np.isfinite(x).all()


def test_toy_sklearn_distribution_parity():
    """swissroll noise scale and circles/moons linspace-angle layout match
    the sklearn samplers the reference calls (`toy_data.py:16-34`)."""
    rng = np.random.RandomState(0)
    # swissroll: unit noise pre-rescale => residual sigma 0.2 post /5.
    # Measure the RMS distance from samples to the clean spiral curve; with
    # 2-D isotropic sigma=0.2 jitter that RMS is ~0.27 (the curve's own
    # curvature absorbs a little), decisively above the old 0.05-noise bug.
    x = inf_train_gen("swissroll", rng, batch_size=4000)
    t = 1.5 * np.pi * (1 + 2 * np.linspace(0, 1, 4000))
    curve = np.stack([t * np.cos(t), t * np.sin(t)], axis=1) / 5.0
    d2 = ((x[:, None, :] - curve[None, :, :]) ** 2).sum(-1).min(axis=1)
    rms = float(np.sqrt(d2.mean()))
    assert 0.15 < rms < 0.35, rms
    # circles: angles are equispaced (linspace) -> per-angular-bin counts are
    # nearly constant (variance ~ boundary jitter only), while uniformly
    # RANDOM angles give Poisson counts (variance ~ mean = 50).
    n = 1000
    xc = inf_train_gen("circles", np.random.RandomState(2), batch_size=2 * n)
    outer = xc[:n]
    ang = np.mod(np.arctan2(outer[:, 1], outer[:, 0]), 2 * np.pi)
    # equispaced + 0.08-rad jitter measures ~20 (boundary crossings only);
    # uniformly random angles give multinomial variance ~n*p*(1-p) ~ 47.5
    counts, _ = np.histogram(ang, bins=20, range=(0, 2 * np.pi))
    assert counts.var() < 32.0, counts.var()
    # moons: y-range of the shifted second moon matches sklearn's [-0.5, 0.5]
    xm = inf_train_gen("moons", np.random.RandomState(3), batch_size=4000)
    assert xm[:, 1].min() > -2.0 and xm[:, 1].max() < 3.0


@pytest.mark.parametrize("name", sorted(UCI_DIMS))
def test_uci_synthetic_fallback(name):
    data = load_uci(name, synthetic=True)
    assert data.n_dims == UCI_DIMS[name]
    # z-scored by train+valid moments
    joint = np.vstack([data.trn, data.val])
    np.testing.assert_allclose(joint.mean(0), 0.0, atol=1e-4)
    np.testing.assert_allclose(joint.std(0), 1.0, atol=1e-3)
    # deterministic across loads
    data2 = load_uci(name, synthetic=True)
    np.testing.assert_array_equal(data.tst, data2.tst)


def test_logit_transform_roundtrip():
    rng = np.random.RandomState(0)
    x = rng.randint(0, 256, (16, 784)).astype(np.uint8)
    z = add_uniform_noise_and_logit(x, rng)
    back = logit_back(z)
    # dequantized pixel recovers to within one 1/256 bin
    np.testing.assert_allclose(back, (x + 0.5) / 256.0, atol=1.0 / 256.0)


def test_mnist_flow_synthetic():
    data = load_mnist_flow(synthetic=True)
    assert data.trn_x.shape[1] == 784
    assert len(data.trn_x) == len(data.trn_y)
    assert np.isfinite(data.trn_x).all()


@pytest.mark.parametrize("name", ["mnist", "freyfaces", "omniglot", "caltech"])
def test_vae_datasets_synthetic(name):
    data = load_vae_dataset(name, synthetic=True)
    c, h, w = data.input_size
    assert data.trn.shape[1] == c * h * w
    assert data.input_type in ("binary", "multinomial")
    assert data.trn.min() >= 0.0 and data.trn.max() <= 1.0


def test_batch_iter_with_counts():
    import numpy as np
    from umnn_tpu.training.loops import batch_iter

    x = np.arange(10)[:, None].astype(np.float32)
    rng = np.random.RandomState(0)
    out = list(batch_iter(x, 4, rng, shuffle=False, with_counts=True))
    assert [n for _, n in out] == [4, 4, 2]
    # last batch wrap-padded to full size but only n_valid=2 real rows
    assert out[-1][0].shape == (4, 1)
    assert out[-1][0][:2, 0].tolist() == [8.0, 9.0]


def test_synthetic_mnist_ar1_floor_math():
    """AR(1) copula gate (VERDICT r2 weak #4 fix): uniform marginals, exact
    correlated floor below 8.0 bpp by ~the mutual information, and the
    driver's bpp formula scores an independence model at exactly 8.0."""
    import numpy as np

    from umnn_tpu.data.images import ALPHA, synthetic_mnist_ar1

    rho = 0.7
    data, floor = synthetic_mnist_ar1(rho=rho, seed=0, n=(2000, 200, 2000))
    assert data.trn_x.shape == (2000, 784)

    # pixel marginals are uniform: sigmoid-back to y and check moments
    y = 1.0 / (1.0 + np.exp(-data.trn_x.astype(np.float64)))
    y = (y - ALPHA) / (1 - 2 * ALPHA)
    assert abs(y.mean() - 0.5) < 0.01
    assert abs(y.var() - 1.0 / 12.0) < 0.005

    # closed-form floor: 8 - (783/784) * 0.5 * log2(1/(1-rho^2)) bits/pixel
    # (the alpha corrections cancel exactly in the bpp formula)
    expected = 8.0 - (783.0 / 784.0) * 0.5 * (-np.log2(1 - rho * rho))
    assert abs(floor - expected) < 0.02, (floor, expected)
    assert floor < 7.6  # genuinely below the independence score

    # independence model scores EXACTLY 8.0 through the same formula:
    # ll_indep = sum log(dy/dx) (uniform y density pushed to logit space)
    x = data.tst_x.astype(np.float64)
    sig = 1.0 / (1.0 + np.exp(-x))
    ll = (np.log(sig) + np.log1p(-sig) - np.log(1 - 2 * ALPHA)).sum(1)
    d = 784
    bpp = (
        -ll / (d * np.log(2)) - np.log2(1 - 2 * ALPHA) + 8
        + (np.log2(sig) + np.log2(1 - sig)).sum(1) / d
    )
    np.testing.assert_allclose(bpp, 8.0, rtol=1e-10)


def test_synthetic_mnist_ar1_small_d():
    """The d parameter (r3: CPU-scale gate feasibility studies) keeps the
    floor math exact at any dimension: closed-form MI check at d=8."""
    import numpy as np

    from umnn_tpu.data.images import synthetic_mnist_ar1

    rho, d = 0.9, 8
    data, floor = synthetic_mnist_ar1(rho=rho, seed=3, n=(500, 200, 4000), d=d)
    assert data.trn_x.shape == (500, d)
    expected = 8.0 - ((d - 1.0) / d) * 0.5 * (-np.log2(1 - rho * rho))
    assert abs(floor - expected) < 0.05, (floor, expected)
