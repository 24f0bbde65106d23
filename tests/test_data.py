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
    x = inf_train_gen(name, rng, batch_size=256)
    d = 3 if name == "conditionnal_gaussian" else 2
    assert x.shape == (256, d)
    assert x.dtype == np.float32
    assert np.isfinite(x).all()


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
