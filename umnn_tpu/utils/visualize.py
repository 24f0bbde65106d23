"""Density / sample visualization for 2-D flows.

Reference semantics: `lib/visualize_flow.py:13-141` in AWehenkel/UMNN —
density heatmap via `compute_ll` on a grid, sample scatter, and the
composite figure. Matplotlib is imported lazily (headless-safe, Agg).
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

LOW, HIGH = -4.0, 4.0


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def density_grid(
    log_prob_fn: Callable[[jnp.ndarray], jnp.ndarray],
    npts: int = 300,
    low: float = LOW,
    high: float = HIGH,
    memory: int = 10000,
):
    """Evaluate exp(log p) on an npts^2 grid, chunked (`visualize_flow.py:34-57`)."""
    side = np.linspace(low, high, npts)
    xx, yy = np.meshgrid(side, side)
    pts = np.stack([xx.reshape(-1), yy.reshape(-1)], axis=1).astype(np.float32)
    out = []
    for i in range(0, len(pts), memory):
        out.append(np.asarray(log_prob_fn(jnp.asarray(pts[i : i + memory]))))
    px = np.exp(np.concatenate(out)).reshape(npts, npts)
    return xx, yy, px


def plt_flow(log_prob_fn, ax=None, npts: int = 300, title: str = "q(x)"):
    plt = _plt()
    if ax is None:
        _, ax = plt.subplots(figsize=(4, 4))
    xx, yy, px = density_grid(log_prob_fn, npts)
    ax.imshow(px, extent=(LOW, HIGH, LOW, HIGH), origin="lower", cmap="inferno")
    ax.set_title(title)
    ax.axis("off")
    return ax


def plt_samples(samples: np.ndarray, ax=None, npts: int = 100, title: str = "x ~ p(x)"):
    plt = _plt()
    if ax is None:
        _, ax = plt.subplots(figsize=(4, 4))
    ax.hist2d(
        samples[:, 0], samples[:, 1], range=[[LOW, HIGH], [LOW, HIGH]], bins=npts,
        cmap="inferno",
    )
    ax.set_title(title)
    ax.axis("off")
    return ax


def plt_stream(
    transform_fn, ax=None, npts: int = 200, title: str = "Density streamflow"
):
    """Streamplot of the flow displacement field z(x) - x
    (`lib/visualize_flow.py:59-67`): color encodes displacement magnitude."""
    plt = _plt()
    if ax is None:
        _, ax = plt.subplots(figsize=(4, 4))
    import jax.numpy as jnp

    side = np.linspace(LOW, HIGH, npts)
    xx, yy = np.meshgrid(side, side)
    x = np.hstack([xx.reshape(-1, 1), yy.reshape(-1, 1)]).astype(np.float32)
    z = np.asarray(transform_fn(jnp.asarray(x)))
    dzx = (z - x)[:, 0].reshape(xx.shape)
    dzy = (z - x)[:, 1].reshape(xx.shape)
    ax.streamplot(xx, yy, dzx, dzy, color=(dzx**2 + dzy**2) / 2, cmap="autumn")
    ax.set_title(title)
    return ax


def visualize_transform(
    samples: Optional[np.ndarray],
    log_prob_fn,
    out_path: str | Path,
    npts: int = 300,
):
    """Side-by-side data samples + learned density (`visualize_flow.py:97-141`)."""
    plt = _plt()
    fig, axes = plt.subplots(1, 2 if samples is not None else 1, figsize=(9, 4))
    axes = np.atleast_1d(axes)
    i = 0
    if samples is not None:
        plt_samples(samples, axes[i], title="data")
        i += 1
    plt_flow(log_prob_fn, axes[i], npts)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def image_grid(images: np.ndarray, out_path: str | Path, ncols: int = 10):
    """Save a grid of [N, H, W] images (reconstruction/generation plots,
    `vae_lib/utils/visual_evaluation.py:9-53`)."""
    plt = _plt()
    n = len(images)
    nrows = (n + ncols - 1) // ncols
    fig, axes = plt.subplots(nrows, ncols, figsize=(ncols, nrows))
    for i, ax in enumerate(np.asarray(axes).reshape(-1)):
        ax.axis("off")
        if i < n:
            ax.imshow(images[i], cmap="gray")
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def plot_training_curves(
    metrics_path: str | Path, out_path: str | Path, tags: Optional[list] = None
):
    """Training-curve figure from a MetricsWriter jsonl stream
    (`vae_lib/utils/plotting.py:11-104` semantics: one line per tag over
    steps/epochs)."""
    import json

    plt = _plt()
    series: dict = {}
    with open(metrics_path) as f:
        for line in f:
            rec = json.loads(line)
            series.setdefault(rec["tag"], []).append((rec["step"], rec["value"]))
    if tags is not None:
        series = {t: series[t] for t in tags if t in series}
    fig, ax = plt.subplots(figsize=(6, 4))
    for tag, pts in sorted(series.items()):
        pts.sort()
        ax.plot([p[0] for p in pts], [p[1] for p in pts], label=tag)
    ax.set_xlabel("epoch")
    ax.legend()
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path
