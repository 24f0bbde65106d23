"""NN layers for the VAE stack: gated convolutions and k-block masked linears.

Reference semantics: `models/vae_lib/models/layers.py` in AWehenkel/UMNN
(the sylvester-flows lineage). TPU notes: convolutions run in NCHW to match
the reference's shape conventions — XLA lays them out for the MXU
internally; gating (h * sigmoid(g)) is fused elementwise.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from umnn_tpu.nn.core import Params

_DN = ("NCHW", "OIHW", "NCHW")


def conv_init(key, in_ch, out_ch, ksize, dtype=jnp.float32) -> Params:
    """torch Conv2d default init (kaiming-uniform fan-in on both w and b)."""
    kh, kw = (ksize, ksize) if isinstance(ksize, int) else ksize
    fan_in = in_ch * kh * kw
    bound = 1.0 / math.sqrt(fan_in)
    k1, k2 = jax.random.split(key)
    return {
        "w": jax.random.uniform(k1, (out_ch, in_ch, kh, kw), dtype, -bound, bound),
        "b": jax.random.uniform(k2, (out_ch,), dtype, -bound, bound),
    }


def conv2d(p: Params, x: jax.Array, stride=1, padding=0, dilation=1) -> jax.Array:
    s = (stride, stride) if isinstance(stride, int) else stride
    pad = (padding, padding) if isinstance(padding, int) else padding
    d = (dilation, dilation) if isinstance(dilation, int) else dilation
    out = jax.lax.conv_general_dilated(
        x,
        p["w"],
        window_strides=s,
        padding=[(pad[0], pad[0]), (pad[1], pad[1])],
        rhs_dilation=d,
        dimension_numbers=_DN,
    )
    return out + p["b"][None, :, None, None]


def conv_transpose2d(
    p: Params, x: jax.Array, stride=1, padding=0, output_padding=0
) -> jax.Array:
    """Transposed conv with torch ConvTranspose2d geometry:
    out = (in-1)*s - 2p + k + output_padding. Implemented as an
    input-dilated convolution with a flipped kernel."""
    s = (stride, stride) if isinstance(stride, int) else stride
    pad = (padding, padding) if isinstance(padding, int) else padding
    op = (output_padding, output_padding) if isinstance(output_padding, int) else output_padding
    # stored as (out_ch, in_ch, kh, kw) OIHW; spatial flip makes this the
    # exact adjoint-geometry convolution of the input-dilated x
    w = jnp.flip(p["w"], axis=(-2, -1))
    kh, kw = w.shape[-2:]
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(1, 1),
        padding=[
            (kh - 1 - pad[0], kh - 1 - pad[0] + op[0]),
            (kw - 1 - pad[1], kw - 1 - pad[1] + op[1]),
        ],
        lhs_dilation=s,
        dimension_numbers=_DN,
    )
    return out + p["b"][None, :, None, None]


def gated_conv_init(key, in_ch, out_ch, ksize, dtype=jnp.float32) -> Params:
    kh, kg = jax.random.split(key)
    return {
        "h": conv_init(kh, in_ch, out_ch, ksize, dtype),
        "g": conv_init(kg, in_ch, out_ch, ksize, dtype),
    }


def gated_conv2d(p, x, stride=1, padding=0, dilation=1, activation=None):
    """h(x) * sigmoid(g(x)) (`layers.py:17-36`)."""
    h = conv2d(p["h"], x, stride, padding, dilation)
    if activation is not None:
        h = activation(h)
    return h * jax.nn.sigmoid(conv2d(p["g"], x, stride, padding, dilation))


def gated_conv_transpose2d(p, x, stride=1, padding=0, output_padding=0, activation=None):
    h = conv_transpose2d(p["h"], x, stride, padding, output_padding)
    if activation is not None:
        h = activation(h)
    return h * jax.nn.sigmoid(conv_transpose2d(p["g"], x, stride, padding, output_padding))


# --- k-block autoregressive masked linear (`layers.py:68-134`) ---------------


def build_block_mask(n_in: int, n_out: int, diagonal_zeros: bool = False) -> np.ndarray:
    """IAF-style k-block triangular mask [n_in, n_out]: output block i may
    see input blocks < i (plus == i unless diagonal_zeros)."""
    if not (n_in % n_out == 0 or n_out % n_in == 0):
        raise ValueError(f"incompatible sizes {n_in} {n_out}")
    mask = np.ones((n_in, n_out), dtype=np.float32)
    if n_out >= n_in:
        k = n_out // n_in
        for i in range(n_in):
            mask[i + 1 :, i * k : (i + 1) * k] = 0
            if diagonal_zeros:
                mask[i : i + 1, i * k : (i + 1) * k] = 0
    else:
        k = n_in // n_out
        for i in range(n_out):
            mask[(i + 1) * k :, i : i + 1] = 0
            if diagonal_zeros:
                mask[i * k : (i + 1) * k, i : i + 1] = 0
    return mask


def masked_linear_init(key, n_in, n_out, dtype=jnp.float32) -> Params:
    """Kaiming-normal weight, zero bias (`layers.py:93-96`)."""
    w = jax.random.normal(key, (n_in, n_out), dtype) * math.sqrt(2.0 / n_in)
    return {"w": w, "b": jnp.zeros((n_out,), dtype)}


def masked_linear(p: Params, mask: jax.Array, x: jax.Array) -> jax.Array:
    return x @ (p["w"] * mask) + p["b"]


# --- pixelCNN autoregressive masked conv (`layers.py:137-209`) ---------------


def build_pixelcnn_mask(
    n_in: int,
    n_out: int,
    size_kernel: tuple[int, int] = (3, 3),
    diagonal_zeros: bool = False,
) -> np.ndarray:
    """PixelCNN-style autoregressive conv mask [n_out, n_in, kh, kw].

    Replicates the reference's exact semantics (`layers.py:168-193`): the
    spatial half-plane strictly before the kernel center (in the reference's
    chosen raster order) is zeroed, and the center tap carries the same
    k-block feature triangularity as :func:`build_block_mask`
    (``diagonal_zeros=True`` for y_i = f(x_<i) output layers).
    """
    if not (n_in % n_out == 0 or n_out % n_in == 0):
        raise ValueError(f"incompatible sizes {n_in} {n_out}")
    l = (size_kernel[0] - 1) // 2
    m = (size_kernel[1] - 1) // 2
    mask = np.ones((n_out, n_in, *size_kernel), dtype=np.float32)
    mask[:, :, :l, :] = 0
    mask[:, :, l, :m] = 0
    if n_out >= n_in:
        k = n_out // n_in
        for i in range(n_in):
            mask[i * k : (i + 1) * k, i + 1 :, l, m] = 0
            if diagonal_zeros:
                mask[i * k : (i + 1) * k, i : i + 1, l, m] = 0
    else:
        k = n_in // n_out
        for i in range(n_out):
            mask[i : i + 1, (i + 1) * k :, l, m] = 0
            if diagonal_zeros:
                mask[i : i + 1, i * k : (i + 1) * k, l, m] = 0
    return mask


def masked_conv2d_init(key, n_in, n_out, size_kernel=(3, 3), dtype=jnp.float32) -> Params:
    fan_in = n_in * size_kernel[0] * size_kernel[1]
    w = jax.random.normal(key, (n_out, n_in, *size_kernel), dtype) * math.sqrt(
        2.0 / fan_in
    )
    return {"w": w, "b": jnp.zeros((n_out,), dtype)}


def masked_conv2d(p: Params, mask: jax.Array, x: jax.Array) -> jax.Array:
    """NCHW masked conv with 'same' padding (`layers.py:196-198`)."""
    kh, kw = p["w"].shape[-2:]
    out = jax.lax.conv_general_dilated(
        x,
        p["w"] * mask,
        window_strides=(1, 1),
        padding=((kh // 2, kh // 2), (kw // 2, kw // 2)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out + p["b"][None, :, None, None]
