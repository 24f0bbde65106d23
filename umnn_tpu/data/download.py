"""Dataset downloader — registry + fetchers for every dataset the framework
consumes (reference semantics: `download_datasets.py:232-282`).

The reference downloads: the MAF preprocessed-tabular tarball (POWER/GAS/
HEPMASS/MINIBOONE/BSDS300) from Zenodo, MNIST (raw + static binarization
.amat files), Omniglot, Caltech101 Silhouettes and Freyfaces. This module
keeps the same on-disk layout the loaders in :mod:`umnn_tpu.data.uci` /
:mod:`umnn_tpu.data.images` expect, and degrades gracefully in air-gapped
environments (every loader has a seeded synthetic fallback, so nothing in
training/tests *requires* network access).

Usage:
    python -m umnn_tpu.data.download [power gas ... | all]
"""

from __future__ import annotations

import sys
import tarfile
from pathlib import Path

from umnn_tpu.data.uci import DEFAULT_ROOT

# dataset name -> (url, archive member / filename). URLs match the sources
# used by the reference and its upstream (MAF, sylvester-flows).
MAF_DATA_URL = "https://zenodo.org/record/1161203/files/data.tar.gz"

URLS: dict[str, list[str]] = {
    "maf_tabular": [MAF_DATA_URL],  # POWER/GAS/HEPMASS/MINIBOONE/BSDS300
    "mnist_static_binarized": [
        "http://www.cs.toronto.edu/~larocheh/public/datasets/binarized_mnist/"
        f"binarized_mnist_{split}.amat"
        for split in ("train", "valid", "test")
    ],
    "freyfaces": ["https://raw.githubusercontent.com/y0ast/Variational-Autoencoder/master/freyfaces.pkl"],
    "omniglot": [
        "https://github.com/yburda/iwae/raw/master/datasets/OMNIGLOT/chardata.mat"
    ],
    "caltech": [
        "https://people.cs.umass.edu/~marlin/data/caltech101_silhouettes_28_split1.mat"
    ],
}

TABULAR = ("power", "gas", "hepmass", "miniboone", "bsds300")


def _fetch(url: str, dest: Path, timeout: int = 120) -> Path:
    import urllib.request

    dest.parent.mkdir(parents=True, exist_ok=True)
    if dest.exists():
        return dest
    tmp = dest.with_suffix(dest.suffix + ".part")
    urllib.request.urlretrieve(url, tmp)  # noqa: S310
    tmp.rename(dest)
    return dest


def download(name: str, root: str | Path = DEFAULT_ROOT) -> None:
    """Download one dataset (or ``"all"``) into the data root.

    Tabular names (power/gas/...) all resolve to the single MAF tarball,
    which is unpacked to the ``data/<dataset>/`` layout the UCI loaders
    expect (`datasets/__init__.py:1-7` in the reference).
    """
    root = Path(root)
    name = name.lower()
    if name == "all":
        for n in ("maf_tabular", "mnist_static_binarized", "freyfaces", "omniglot", "caltech"):
            download(n, root)
        return
    if name in TABULAR:
        name = "maf_tabular"
    if name not in URLS:
        raise KeyError(f"unknown dataset {name!r}; known: {sorted(URLS) + list(TABULAR)}")
    if name == "maf_tabular":
        tar_path = _fetch(MAF_DATA_URL, root / "data.tar.gz")
        with tarfile.open(tar_path) as tf:
            tf.extractall(root, filter="data")
        return
    for url in URLS[name]:
        _fetch(url, root / name / url.rsplit("/", 1)[-1])


def main(argv: list[str]) -> int:
    targets = argv or ["all"]
    for t in targets:
        try:
            download(t)
            print(f"downloaded {t}")
        except Exception as e:  # noqa: BLE001
            print(
                f"could not download {t}: {e}\n"
                "  (air-gapped? all loaders fall back to seeded synthetic "
                "data with the correct shapes — see umnn_tpu.data.uci/images)",
                file=sys.stderr,
            )
            return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
