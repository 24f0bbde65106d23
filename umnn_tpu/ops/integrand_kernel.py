"""Fused Pallas TPU kernel for the UMNN Clenshaw-Curtis integrand sweep.

This is the framework's north-star native component (SURVEY.md §2 P1/P2):
the reference materializes a ``[B*(N+1)*D, 1+e]`` megabatch in device memory
and runs the integrand MLP over it layer by layer
(`ParallelNeuralIntegral.py:50-65` + `UMNNMAF.py:263-284`), paying HBM
round-trips for every activation. Here the quadrature-node axis never leaves
VMEM:

* grid over row tiles of the flattened (batch x dim) axis;
* the tiny integrand MLP weights (padded to 128 lanes) live in VMEM for the
  whole sweep;
* an in-register ``fori_loop`` over the N+1 nodes rebuilds each node's input
  from the endpoint row (col 0 scaled by ``(t_n+1)/2`` — integrals start at
  x0 = 0 for all UMNN models), runs the MLP chain on the MXU, and
  accumulates the weighted sum;
* the backward kernel re-sweeps the nodes with per-node cotangents
  ``g * x/2 * w_n`` (the Leibniz-rule VJP), accumulating dW/db across rows,
  nodes, and grid steps — grid iterations on a TensorCore are sequential, so
  output-block accumulation is race-free.

HBM traffic is O(B*D*(1+e)) instead of O(B*D*(N+1)*(1+e+hidden)) — the
arithmetic intensity grows by the node count (~51x), which is what makes
this op MXU-bound instead of bandwidth-bound.

The public entry :func:`fused_cc_integral` is shape-polymorphic over any
leading batch axes and carries a jax.custom_vjp; `interpret=True` runs the
same kernels on CPU (used by the test suite on the virtual-device backend).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_cc_integral", "pallas_available"]

LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pallas_available() -> bool:
    return jax.default_backend() == "tpu"


def _pad_params(ws: Sequence[jax.Array], bs: Sequence[jax.Array]):
    """Pad MLP weights/biases to 128-lane tiles (zero rows/cols)."""
    pw, pb = [], []
    for w, b in zip(ws, bs):
        din, dout = w.shape
        w_p = jnp.zeros((_round_up(din, LANE), _round_up(dout, LANE)), w.dtype)
        w_p = w_p.at[:din, :dout].set(w)
        b_p = jnp.zeros((_round_up(dout, LANE),), b.dtype)
        b_p = b_p.at[:dout].set(b)
        pw.append(w_p)
        pb.append(b_p.reshape(1, -1))
    return pw, pb


def _leaky(x, neg_slope):
    return jnp.where(x > 0, x, neg_slope * x)


def _dleaky(x, neg_slope):
    return jnp.where(x > 0, 1.0, neg_slope)


def _eluplus(x):
    return jnp.where(x > 0, x + 1.0, jnp.exp(x))


def _deluplus(x):
    return jnp.where(x > 0, 1.0, jnp.exp(x))


def _fwd_kernel(nodes_ref, ccw_ref, feat_ref, *rest, neg_slope):
    """One row tile: out[r] = sum_n ccw[n] * MLP(feat_r with col0 *= s_n).

    Pallas arg order: inputs (nodes, ccw, feat, ws..., bs...) then outputs.
    """
    n_layers = len(rest) // 2  # rest = ws..., bs..., out
    ws = rest[:n_layers]
    bs = rest[n_layers : 2 * n_layers]
    out_ref = rest[2 * n_layers]
    feat = feat_ref[:]  # [T, F_pad]
    T = feat.shape[0]
    K = nodes_ref.shape[0]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, feat.shape, 1)
    x_end = feat[:, 0:1]  # endpoint x (x0 = 0)

    def node_body(n, acc):
        s_n = (nodes_ref[n, 0] + 1.0) * 0.5
        w_n = ccw_ref[n, 0]
        a = jnp.where(col_ids == 0, x_end * s_n, feat)
        for i in range(n_layers - 1):
            a = _leaky(
                jnp.dot(a, ws[i][:], preferred_element_type=jnp.float32) + bs[i][:],
                neg_slope,
            )
        a = _eluplus(
            jnp.dot(a, ws[n_layers - 1][:], preferred_element_type=jnp.float32)
            + bs[n_layers - 1][:]
        )
        return acc + w_n * a[:, 0:1]

    acc = jax.lax.fori_loop(0, K, node_body, jnp.zeros((T, 1), jnp.float32))
    out_ref[:] = acc * x_end * 0.5  # (xT - x0)/2 with x0 = 0


def _bwd_kernel(nodes_ref, ccw_ref, feat_ref, g_ref, *rest, neg_slope):
    """Backward over one row tile.

    Computes dfeat (the x column gets the exact node-path term — this VJP is
    the true gradient of the forward approximation) and accumulates dW/db
    into shared output blocks across the sequential grid.
    """
    # rest = ws..., bs... (inputs), dfeat, dws..., dbs... (outputs)
    n_layers = len(rest) // 4  # 4*n_layers + 1 total; floor div works
    ws = rest[:n_layers]
    bs = rest[n_layers : 2 * n_layers]
    dfeat_ref = rest[2 * n_layers]
    dws = rest[2 * n_layers + 1 : 3 * n_layers + 1]
    dbs = rest[3 * n_layers + 1 :]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for i in range(n_layers):
            dws[i][:] = jnp.zeros_like(dws[i])
            dbs[i][:] = jnp.zeros_like(dbs[i])

    feat = feat_ref[:]
    g = g_ref[:]  # [T, 1]
    T = feat.shape[0]
    K = nodes_ref.shape[0]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, feat.shape, 1)
    x_end = feat[:, 0:1]
    gx = g * x_end * 0.5  # cotangent of the node-sum (chain through *x/2)

    def node_body(n, carry):
        dfeat, dw_acc, db_acc = carry
        s_n = (nodes_ref[n, 0] + 1.0) * 0.5
        w_n = ccw_ref[n, 0]
        ct = gx * w_n  # [T, 1]
        # forward chain, keeping pre-activations
        a = jnp.where(col_ids == 0, x_end * s_n, feat)
        acts = [a]
        pre = []
        for i in range(n_layers - 1):
            z = jnp.dot(a, ws[i][:], preferred_element_type=jnp.float32) + bs[i][:]
            pre.append(z)
            a = _leaky(z, neg_slope)
            acts.append(a)
        zL = (
            jnp.dot(a, ws[n_layers - 1][:], preferred_element_type=jnp.float32)
            + bs[n_layers - 1][:]
        )
        # backward chain
        out_cols = jax.lax.broadcasted_iota(jnp.int32, zL.shape, 1)
        d_out = jnp.where(out_cols == 0, ct, 0.0)
        dz = d_out * _deluplus(zL)
        new_dw, new_db = [], []
        for i in range(n_layers - 1, -1, -1):
            new_dw.insert(
                0,
                dw_acc[i]
                + jnp.dot(acts[i].T, dz, preferred_element_type=jnp.float32),
            )
            new_db.insert(0, db_acc[i] + jnp.sum(dz, axis=0, keepdims=True))
            da = jnp.dot(dz, ws[i][:].T, preferred_element_type=jnp.float32)
            if i > 0:
                dz = da * _dleaky(pre[i - 1], neg_slope)
        # da is d(input row); x column carries the node scale
        d_in = da
        dfeat = dfeat + jnp.where(
            col_ids == 0, d_in[:, 0:1] * s_n, d_in
        )
        return dfeat, new_dw, new_db

    dfeat0 = jnp.zeros_like(feat)
    dw0 = [jnp.zeros(w.shape, jnp.float32) for w in dws]
    db0 = [jnp.zeros(b.shape, jnp.float32) for b in dbs]
    dfeat, dw_fin, db_fin = jax.lax.fori_loop(
        0, K, node_body, (dfeat0, dw0, db0)
    )
    # d(x_end) also enters through the trailing *x/2 and through every node's
    # col-0 scale — the node part is in dfeat col 0 already; add the quad-sum
    # part: out = S(x) * x/2 with S = sum_n w_n f_n; dS-part handled above,
    # d(x/2)-part = g * S = g * out/(x/2)... avoided: recompute S cheaply is
    # a full sweep; instead host passes out/x precomputed? We fold it here:
    # S * g = (acc) * g — we recompute acc in the same loop? To stay
    # single-sweep, the host-side VJP adds g*z/x term analytically using the
    # saved forward output. See _integral_bwd below.
    dfeat_ref[:] = dfeat
    for i in range(n_layers):
        dws[i][:] += dw_fin[i]
        dbs[i][:] += db_fin[i]


def _run_fwd(pw, pb, feat, nodes, ccw, tile_r, interpret, neg_slope):
    R, F = feat.shape
    grid = (R // tile_r,)
    n_layers = len(pw)
    in_specs = [
        pl.BlockSpec((nodes.shape[0], 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((nodes.shape[0], 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((tile_r, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ] + [
        pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM) for w in pw
    ] + [
        pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM) for b in pb
    ]
    mlp_flops = sum(2 * w.shape[0] * w.shape[1] for w in pw)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, neg_slope=neg_slope),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile_r, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, 1), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=R * nodes.shape[0] * mlp_flops,
            bytes_accessed=R * F * 4 + R * 4,
            transcendentals=R * nodes.shape[0] * LANE,
        ),
    )(nodes, ccw, feat, *pw, *pb)


def _run_bwd(pw, pb, feat, g, nodes, ccw, tile_r, interpret, neg_slope):
    R, F = feat.shape
    grid = (R // tile_r,)
    in_specs = [
        pl.BlockSpec((nodes.shape[0], 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((nodes.shape[0], 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((tile_r, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_r, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ] + [
        pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM) for w in pw
    ] + [
        pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM) for b in pb
    ]
    out_shape = (
        [jax.ShapeDtypeStruct((R, F), jnp.float32)]
        + [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in pw]
        + [jax.ShapeDtypeStruct(b.shape, jnp.float32) for b in pb]
    )
    out_specs = (
        [pl.BlockSpec((tile_r, F), lambda i: (i, 0), memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM) for w in pw]
        + [pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM) for b in pb]
    )
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, neg_slope=neg_slope),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(nodes, ccw, feat, g, *pw, *pb)
    dfeat = outs[0]
    n_layers = len(pw)
    dpw = outs[1 : 1 + n_layers]
    dpb = outs[1 + n_layers :]
    return dfeat, dpw, dpb


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(5, 6, 7)
)
def _fused_integral(ws, bs, x, h, nodes_ccw, tile_r, interpret, neg_slope):
    z, _ = _fused_fwd_impl(ws, bs, x, h, nodes_ccw, tile_r, interpret, neg_slope)
    return z


def _prep(ws, bs, x, h):
    """Flatten leading axes and build the padded feature block."""
    batch_shape = x.shape
    R = int(np.prod(batch_shape))
    e = h.shape[-1]
    F = _round_up(1 + e, LANE)
    feat = jnp.zeros((R, F), jnp.float32)
    feat = feat.at[:, 0].set(x.reshape(R).astype(jnp.float32))
    feat = feat.at[:, 1 : 1 + e].set(h.reshape(R, e).astype(jnp.float32))
    return feat, batch_shape, R, e


def _fused_fwd_impl(ws, bs, x, h, nodes_ccw, tile_r, interpret, neg_slope):
    nodes, ccw = nodes_ccw
    feat, batch_shape, R, e = _prep(ws, bs, x, h)
    pw, pb = _pad_params(ws, bs)
    R_pad = _round_up(max(R, tile_r), tile_r)
    if R_pad != R:
        feat = jnp.pad(feat, ((0, R_pad - R), (0, 0)))
    out = _run_fwd(pw, pb, feat, nodes, ccw, tile_r, interpret, neg_slope)
    z = out[:R, 0].reshape(batch_shape)
    return z, (feat, batch_shape, R, e)


def _fused_vjp_fwd(ws, bs, x, h, nodes_ccw, tile_r, interpret, neg_slope):
    z, _ = _fused_fwd_impl(ws, bs, x, h, nodes_ccw, tile_r, interpret, neg_slope)
    return z, (ws, bs, x, h, z, nodes_ccw)


def _fused_vjp_bwd(tile_r, interpret, neg_slope, res, g):
    ws, bs, x, h, z, nodes_ccw = res
    nodes, ccw = nodes_ccw
    feat, batch_shape, R, e = _prep(ws, bs, x, h)
    pw, pb = _pad_params(ws, bs)
    R_pad = _round_up(max(R, tile_r), tile_r)
    g_flat = g.reshape(R, 1).astype(jnp.float32)
    if R_pad != R:
        feat = jnp.pad(feat, ((0, R_pad - R), (0, 0)))
        g_flat = jnp.pad(g_flat, ((0, R_pad - R), (0, 0)))
    dfeat, dpw, dpb = _run_bwd(
        pw, pb, feat, g_flat, nodes, ccw, tile_r, interpret, neg_slope
    )
    dfeat = dfeat[:R]
    # node-path x gradient + the product-rule term g * S(x)/2 = g * z / x
    # (z = S * x/2). Guard x ~ 0: z/x -> S(0)/2 is finite; use safe divide.
    safe_x = jnp.where(jnp.abs(x) > 1e-8, x, 1.0)
    prod_term = jnp.where(
        jnp.abs(x) > 1e-8, g * z / safe_x, jnp.zeros_like(x)
    )
    dx = dfeat[:, 0].reshape(batch_shape) + prod_term
    dh = dfeat[:, 1 : 1 + e].reshape(*batch_shape, e).astype(h.dtype)
    dws = [dw[: w.shape[0], : w.shape[1]].astype(w.dtype) for dw, w in zip(dpw, ws)]
    dbs = [db[0, : b.shape[0]].astype(b.dtype) for db, b in zip(dpb, bs)]
    return (dws, dbs, dx.astype(x.dtype), dh, (jnp.zeros_like(nodes), jnp.zeros_like(ccw)))


_fused_integral.defvjp(_fused_vjp_fwd, _fused_vjp_bwd)


def fused_cc_integral(
    ws: Sequence[jax.Array],
    bs: Sequence[jax.Array],
    x: jax.Array,
    h: jax.Array,
    nodes: jax.Array,
    ccw: jax.Array,
    *,
    tile_r: int = 256,
    interpret: bool | None = None,
    neg_slope: float = 0.01,
) -> jax.Array:
    """``∫_0^{x} f(t, h) dt`` for the UMNN integrand MLP, fused on-TPU.

    ``ws/bs``: unpadded MLP layer params ([din, dout] / [dout]); hidden
    activation LeakyReLU(0.01), output ELU+1. ``x: [...]`` endpoints,
    ``h: [..., e]`` per-row conditioning. ``nodes/ccw``: CC quadrature
    as [K, 1] float32 columns (see :func:`umnn_tpu.ops.quadrature.cc_quadrature`).
    Differentiable via the fused Leibniz-VJP backward kernel.
    """
    if interpret is None:
        interpret = not pallas_available()
    nodes = nodes.reshape(-1, 1).astype(jnp.float32)
    ccw = ccw.reshape(-1, 1).astype(jnp.float32)
    return _fused_integral(
        list(ws), list(bs), x, h, (nodes, ccw), tile_r, interpret, neg_slope
    )
