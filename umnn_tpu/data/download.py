"""Dataset downloader — registry + fetchers for every dataset the framework
consumes (reference semantics: `download_datasets.py:232-282`).

The reference downloads: the MAF preprocessed-tabular tarball (POWER/GAS/
HEPMASS/MINIBOONE/BSDS300) from Zenodo, MNIST (raw idx + static binarization
.amat files), Omniglot, Caltech101 Silhouettes and Freyfaces. This module
writes the exact on-disk layout the loaders in :mod:`umnn_tpu.data.uci` /
:mod:`umnn_tpu.data.images` read back, and degrades gracefully in air-gapped
environments (every loader has a seeded synthetic fallback, so nothing in
training/tests *requires* network access).

Usage:
    python -m umnn_tpu.data.download [power gas mnist ... | all]
"""

from __future__ import annotations

import gzip
import shutil
import sys
import tarfile
from pathlib import Path

from umnn_tpu.data.uci import DEFAULT_ROOT

MAF_DATA_URL = "https://zenodo.org/record/1161203/files/data.tar.gz"

# name -> list of (url, relative destination under the data root). The
# destinations mirror the loader expectations exactly:
#   uci.py:       <root>/power/data.npy, <root>/gas/ethylene_CO.pickle, ...
#   images.py:    <root>/mnist/train-images-idx3-ubyte (raw idx),
#                 <root>/mnist_static/binarized_mnist_{split}.amat,
#                 <root>/freyfaces/freyfaces.pkl,
#                 <root>/omniglot/chardata.mat,
#                 <root>/caltech/caltech101_silhouettes_28_split1.mat
URLS: dict[str, list[tuple[str, str]]] = {
    "mnist": [
        (
            f"https://ossci-datasets.s3.amazonaws.com/mnist/{n}.gz",
            f"mnist/{n}.gz",
        )
        for n in (
            "train-images-idx3-ubyte",
            "train-labels-idx1-ubyte",
            "t10k-images-idx3-ubyte",
            "t10k-labels-idx1-ubyte",
        )
    ],
    "mnist_static": [
        (
            "http://www.cs.toronto.edu/~larocheh/public/datasets/"
            f"binarized_mnist/binarized_mnist_{split}.amat",
            f"mnist_static/binarized_mnist_{split}.amat",
        )
        for split in ("train", "valid", "test")
    ],
    "freyfaces": [
        (
            "https://raw.githubusercontent.com/y0ast/Variational-Autoencoder/"
            "master/freyfaces.pkl",
            "freyfaces/freyfaces.pkl",
        )
    ],
    "omniglot": [
        (
            "https://github.com/yburda/iwae/raw/master/datasets/OMNIGLOT/chardata.mat",
            "omniglot/chardata.mat",
        )
    ],
    "caltech": [
        (
            "https://people.cs.umass.edu/~marlin/data/"
            "caltech101_silhouettes_28_split1.mat",
            "caltech/caltech101_silhouettes_28_split1.mat",
        )
    ],
}

TABULAR = ("power", "gas", "hepmass", "miniboone", "bsds300")


def _fetch(url: str, dest: Path) -> Path:
    import urllib.request

    dest.parent.mkdir(parents=True, exist_ok=True)
    if dest.exists():
        return dest
    tmp = dest.with_suffix(dest.suffix + ".part")
    urllib.request.urlretrieve(url, tmp)  # noqa: S310
    tmp.rename(dest)
    return dest


def _gunzip(path: Path) -> None:
    out = path.with_suffix("")  # strip .gz
    if not out.exists():
        with gzip.open(path, "rb") as src, open(out, "wb") as dst:
            shutil.copyfileobj(src, dst)


def download(name: str, root: str | Path = DEFAULT_ROOT) -> None:
    """Download one dataset (or ``"all"``) into the data root.

    Tabular names (power/gas/...) all resolve to the single MAF tarball.
    The tarball's top-level directory is ``data/`` — it is extracted so the
    datasets land at ``<root>/power/...`` etc. regardless of what ``root``
    is called (the reference extracts into ``datasets/`` to get
    ``datasets/data/power``, `datasets/__init__.py:1`).
    """
    root = Path(root)
    name = name.lower()
    if name == "all":
        for n in ("maf_tabular", "mnist", "mnist_static", "freyfaces", "omniglot", "caltech"):
            download(n, root)
        return
    if name in TABULAR:
        name = "maf_tabular"
    if name == "maf_tabular":
        tar_path = _fetch(MAF_DATA_URL, root / "data.tar.gz")
        with tarfile.open(tar_path) as tf:
            try:
                tf.extractall(root, filter="data")
            except TypeError:
                # `filter=` needs Python >= 3.10.12/3.11.4; older patch
                # releases fall back to a manual path-safety check
                base = root.resolve()
                for m in tf.getmembers():
                    dest = (base / m.name).resolve()
                    if not str(dest).startswith(str(base)):
                        raise RuntimeError(f"unsafe tar member path: {m.name}")
                tf.extractall(root)
        # the archive prefixes everything with 'data/': hoist its contents
        # so loaders find <root>/power/data.npy
        inner = root / "data"
        if inner.is_dir():
            for child in inner.iterdir():
                target = root / child.name
                if not target.exists():
                    shutil.move(str(child), str(target))
            if not any(inner.iterdir()):
                inner.rmdir()
        return
    if name not in URLS:
        raise KeyError(
            f"unknown dataset {name!r}; known: {sorted(URLS) + list(TABULAR)}"
        )
    for url, rel in URLS[name]:
        dest = _fetch(url, root / rel)
        if dest.suffix == ".gz":
            _gunzip(dest)


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
