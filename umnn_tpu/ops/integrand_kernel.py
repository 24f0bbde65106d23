"""Fused Pallas TPU kernel for the UMNN Clenshaw-Curtis integrand sweep.

This is the framework's north-star native component (SURVEY.md §2 P1/P2):
the reference materializes a ``[B*(N+1)*D, 1+e]`` megabatch in device memory
and runs the integrand MLP over it layer by layer
(`ParallelNeuralIntegral.py:50-65` + `UMNNMAF.py:263-284`), paying HBM
round-trips for every activation. Here the quadrature-node axis never leaves
VMEM, and the kernel exploits two structural facts of the UMNN integrand:

* **Only the x column varies across quadrature nodes.** The first layer's
  contribution of the conditioning features ``h`` is computed ONCE per row
  (``ph = [0,h] @ W1 + b1``) and each node adds a rank-1 update
  ``(x*s_n) * W1[0,:]`` — the whole first-layer matmul drops out of the
  node sweep.
* **The node axis folds into the matmul M dimension.** Nodes are processed
  in chunks of ``node_chunk``; activations live as ``[NC*T, 128]`` blocks so
  every hidden layer is one large MXU matmul instead of ``N+1`` tiny
  sequential ones. The weighted CC reduction collapses the node sub-axis
  in-register.

The backward kernel applies the same folding: per (row-tile, node-chunk) it
recomputes the forward chain, then runs the standard MLP VJP where each
``dW += acts^T @ dz`` is a single ``[128, NC*T] x [NC*T, 128]`` contraction,
accumulated across the (sequential) grid into shared output blocks.

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


def _pad_nodes(nodes: jax.Array, ccw: jax.Array, node_chunk: int):
    """Pad the node axis to a multiple of node_chunk with zero-weight nodes.

    Padding nodes sit at t=-1 (position scale 0 — evaluates the integrand at
    x0=0, harmless) and carry zero CC weight, so they contribute nothing to
    either the forward sum or any backward cotangent.
    """
    K = nodes.shape[0]
    K_pad = _round_up(K, node_chunk)
    if K_pad != K:
        nodes = jnp.concatenate(
            [nodes, jnp.full((K_pad - K, 1), -1.0, nodes.dtype)], axis=0
        )
        ccw = jnp.concatenate([ccw, jnp.zeros((K_pad - K, 1), ccw.dtype)], axis=0)
    return nodes, ccw, K_pad


def _leaky(x, neg_slope):
    return jnp.where(x > 0, x, neg_slope * x)


def _dleaky(x, neg_slope):
    return jnp.where(x > 0, 1.0, neg_slope)


def _eluplus(x):
    return jnp.where(x > 0, x + 1.0, jnp.exp(jnp.minimum(x, 0.0)))


def _deluplus(x):
    return jnp.where(x > 0, 1.0, jnp.exp(jnp.minimum(x, 0.0)))


def _fwd_kernel(nodes_ref, ccw_ref, feat_ref, *rest, neg_slope, node_chunk, k_pad):
    """One row tile: out[r] = sum_n ccw[n] * MLP(feat_r with col0 := x_r*s_n).

    Pallas arg order: inputs (nodes, ccw, feat, ws..., bs...) then outputs.
    """
    n_layers = len(rest) // 2  # rest = ws..., bs..., out
    ws = rest[:n_layers]
    bs = rest[n_layers : 2 * n_layers]
    out_ref = rest[2 * n_layers]
    feat = feat_ref[:]  # [T, F_pad]
    T = feat.shape[0]
    NC = node_chunk
    n_chunks = k_pad // NC
    col_ids = jax.lax.broadcasted_iota(jnp.int32, feat.shape, 1)
    x_end = feat[:, 0:1]  # endpoint x (x0 = 0 for all UMNN integrals)

    # Node-invariant part of layer 1: [0, h] @ W1 + b1, computed once.
    feat_h = jnp.where(col_ids == 0, 0.0, feat)
    ph = (
        jnp.dot(feat_h, ws[0][:], preferred_element_type=jnp.float32) + bs[0][:]
    )  # [T, H1]
    w1x = ws[0][0:1, :]  # [1, H1] — the x-input row of W1
    H1 = ph.shape[1]

    def chunk_body(c, acc):
        # rank-3 layout [NC, T, *]: all mixing via size-1-dim broadcasts
        # (Mosaic disallows lane<->sublane reshape relayouts).
        s3 = ((nodes_ref[pl.ds(c * NC, NC), :] + 1.0) * 0.5)[:, :, None]  # [NC,1,1]
        xs3 = s3 * x_end[None]  # [NC, T, 1] — per-(node,row) abscissa
        pre1 = ph[None] + xs3 * w1x[None]  # [NC, T, H1]
        a = _leaky(pre1, neg_slope).reshape(NC * T, H1)
        for i in range(1, n_layers - 1):
            a = _leaky(
                jnp.dot(a, ws[i][:], preferred_element_type=jnp.float32) + bs[i][:],
                neg_slope,
            )
        zL = (
            jnp.dot(a, ws[n_layers - 1][:], preferred_element_type=jnp.float32)
            + bs[n_layers - 1][:]
        )
        f3 = _eluplus(zL[:, 0:1]).reshape(NC, T, 1)
        w3 = ccw_ref[pl.ds(c * NC, NC), :][:, :, None]  # [NC, 1, 1]
        return acc + jnp.sum(w3 * f3, axis=0)  # [T, 1]

    acc = jax.lax.fori_loop(
        0, n_chunks, chunk_body, jnp.zeros((T, 1), jnp.float32)
    )
    out_ref[:] = acc * x_end * 0.5  # (xT - x0)/2 with x0 = 0


def _bwd_kernel(
    nodes_ref, ccw_ref, feat_ref, g_ref, *rest, neg_slope, node_chunk, k_pad,
    dw_mode="per_layer",
):
    """Backward over one row tile with the node axis folded into rows.

    Computes dfeat (the x column gets the exact node-path term — this VJP is
    the true gradient of the forward approximation) and accumulates dW/db
    into shared output blocks across the sequential grid. The trailing
    product-rule term ``g * S(x)/2`` is added host-side from the saved
    forward output (see `_fused_vjp_bwd`).
    """
    # rest = ws..., bs... (inputs), dfeat, dws..., dbs..., S (outputs)
    n_layers = (len(rest) - 2) // 4
    ws = rest[:n_layers]
    bs = rest[n_layers : 2 * n_layers]
    dfeat_ref = rest[2 * n_layers]
    dws = rest[2 * n_layers + 1 : 3 * n_layers + 1]
    dbs = rest[3 * n_layers + 1 : 4 * n_layers + 1]
    s_ref = rest[4 * n_layers + 1]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for i in range(n_layers):
            dws[i][:] = jnp.zeros_like(dws[i])
            dbs[i][:] = jnp.zeros_like(dbs[i])

    feat = feat_ref[:]
    g = g_ref[:]  # [T, 1]
    T = feat.shape[0]
    NC = node_chunk
    n_chunks = k_pad // NC
    col_ids = jax.lax.broadcasted_iota(jnp.int32, feat.shape, 1)
    x_end = feat[:, 0:1]
    gx = g * x_end * 0.5  # [T, 1] cotangent of the node-sum

    feat_h = jnp.where(col_ids == 0, 0.0, feat)
    ph = (
        jnp.dot(feat_h, ws[0][:], preferred_element_type=jnp.float32) + bs[0][:]
    )  # [T, H1]
    w1x = ws[0][0:1, :]
    H1 = ph.shape[1]
    F = feat.shape[1]

    def contract_rows(a, b):
        # a^T @ b with contraction over the (folded) row axis: [F, G]
        return jax.lax.dot_general(
            a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    # transposed weights for the dz chain, computed once per tile
    # (hoisted out of the node-chunk loop)
    wTs = [ws[i][:].T for i in range(n_layers)]

    def chunk_body(c, carry):
        dfeat, s_acc = carry
        s3 = ((nodes_ref[pl.ds(c * NC, NC), :] + 1.0) * 0.5)[:, :, None]  # [NC,1,1]
        xs3 = s3 * x_end[None]  # [NC, T, 1]
        # forward chain. No pre-activation buffers: both activation
        # derivatives are recoverable from the activations themselves
        # (leaky: a > 0 <=> pre > 0; ELU+1: f' = min(f, 1)), halving the
        # VMEM working set.
        pre1 = (ph[None] + xs3 * w1x[None]).reshape(NC * T, H1)
        a = _leaky(pre1, neg_slope)
        acts = [a]
        for i in range(1, n_layers - 1):
            z = jnp.dot(a, ws[i][:], preferred_element_type=jnp.float32) + bs[i][:]
            a = _leaky(z, neg_slope)
            acts.append(a)
        fL = _eluplus(
            jnp.dot(a, ws[n_layers - 1][:], preferred_element_type=jnp.float32)[:, 0:1]
            + bs[n_layers - 1][0:1, 0:1]
        )
        # per-(node,row) cotangent: g * x/2 * w_n, only output col 0 is real
        w3 = ccw_ref[pl.ds(c * NC, NC), :][:, :, None]  # [NC, 1, 1]
        # quadrature sum S = sum_n w_n f_n (exact d z/d x = S/2 + x/2 dS/dx;
        # the S/2 product-rule term is applied host-side from this output)
        s_acc = s_acc + jnp.sum(w3 * fL.reshape(NC, T, 1), axis=0)  # [T, 1]
        ct = (w3 * gx[None]).reshape(NC * T, 1)  # [NC*T, 1]
        # dW/db accumulate straight into the output refs (read-modify-write;
        # the grid is sequential and the node-chunk loop is in-kernel), so
        # the fori_loop carries only dfeat — carried tensors cost a VMEM
        # copy per iteration.
        if dw_mode == "batched" and all(
            w.shape == ws[1].shape for w in ws[1:]
        ):
            out_cols = jax.lax.broadcasted_iota(
                jnp.int32, (NC * T, ws[n_layers - 1].shape[1]), 1
            )
            dz = jnp.where(out_cols == 0, ct * jnp.minimum(fL, 1.0), 0.0)
            # One [(L-1)*128]-wide contraction instead of L-1 separate
            # row-contractions: concat acts/dz along lanes and keep only the
            # diagonal blocks of A_cat^T @ DZ_cat. (L-1)x padded FLOPs, one
            # MXU op — measured A/B against per-layer (VERDICT r1 item 3).
            dzs = {}
            for i in range(n_layers - 1, 0, -1):
                dzs[i] = dz
                dbs[i][:] += jnp.sum(dz, axis=0, keepdims=True)
                da = jnp.dot(dz, wTs[i], preferred_element_type=jnp.float32)
                dz = da * jnp.where(acts[i - 1] > 0, 1.0, neg_slope)
            a_cat = jnp.concatenate(acts[: n_layers - 1], axis=1)
            dz_cat = jnp.concatenate(
                [dzs[i] for i in range(1, n_layers)], axis=1
            )
            dw_big = contract_rows(a_cat, dz_cat)
            H = ws[1].shape[0]
            for i in range(1, n_layers):
                blk = dw_big[(i - 1) * H : i * H, (i - 1) * H : i * H]
                dws[i][:] += blk
        else:
            # Output layer special case: dz_L has ONE real column, so its
            # dW contraction is a VPU reduction (stored TRANSPOSED in row 0
            # of the dW ref — un-transposed host-side, `_fused_vjp_bwd`)
            # and the dz chain through W_L is a rank-1 broadcast. Removes
            # the two most expensive MXU ops (one of them lhs-transposed)
            # per chunk.
            dzL = ct * jnp.minimum(fL, 1.0)  # [M, 1]
            aL = acts[n_layers - 2]
            dwL_row = jnp.sum(aL * dzL, axis=0, keepdims=True)  # [1, H]
            rowsL = jax.lax.broadcasted_iota(
                jnp.int32, dws[n_layers - 1].shape, 0
            )
            dws[n_layers - 1][:] += jnp.where(rowsL == 0, dwL_row, 0.0)
            dbL = jnp.sum(dzL, axis=0, keepdims=True)  # [1, 1]
            colsLb = jax.lax.broadcasted_iota(
                jnp.int32, dbs[n_layers - 1].shape, 1
            )
            dbs[n_layers - 1][:] += jnp.where(colsLb == 0, dbL, 0.0)
            da = dzL * wTs[n_layers - 1][0:1, :]  # [M, H] rank-1
            dz = da * jnp.where(aL > 0, 1.0, neg_slope)
            for i in range(n_layers - 2, 0, -1):
                dws[i][:] += contract_rows(acts[i - 1], dz)
                dbs[i][:] += jnp.sum(dz, axis=0, keepdims=True)
                da = jnp.dot(dz, wTs[i], preferred_element_type=jnp.float32)
                dz = da * jnp.where(acts[i - 1] > 0, 1.0, neg_slope)
        # layer 1. Input rows are [x*s_n, h] and h is node-invariant, so the
        # node axis collapses BEFORE the big contractions:
        #   dW1[f>=1,:] = feat_h^T @ (sum_n dz1_n)      [T-row contraction]
        #   dW1[0,  :] = sum_{n,r} (x_r s_n) dz1_{n,r}  [VPU reduction]
        #   dh         = (sum_n dz1_n) @ W1[1:,:]^T     [T-row matmul]
        #   dx_nodes   = sum_n s_n (dz1_n @ W1[0,:]^T)  [VPU reduction]
        # — no [NC*T, F] input rebuild and no [NC*T]-row matmuls here.
        dz3 = dz.reshape(NC, T, H1)
        dz_sum = jnp.sum(dz3, axis=0)  # [T, H1]
        dw1_h = contract_rows(feat_h, dz_sum)  # [F, H1]; row 0 is 0 (x col of feat_h)
        dw1_x = jnp.sum(jnp.sum(xs3 * dz3, axis=0), axis=0, keepdims=True)  # [1, H1]
        w_rows = jax.lax.broadcasted_iota(jnp.int32, dw1_h.shape, 0)
        dws[0][:] += jnp.where(w_rows == 0, dw1_x, dw1_h)
        dbs[0][:] += jnp.sum(dz_sum, axis=0, keepdims=True)
        dh_nodes = jnp.dot(
            dz_sum, wTs[0], preferred_element_type=jnp.float32
        )  # [T, F] (col 0 overwritten below)
        dx_per = jnp.sum(dz3 * w1x[None], axis=2, keepdims=True)  # [NC, T, 1]
        dx_nodes = jnp.sum(dx_per * s3, axis=0)  # [T, 1]
        dfeat = dfeat + jnp.where(col_ids == 0, dx_nodes, dh_nodes)
        return dfeat, s_acc

    dfeat, s_sum = jax.lax.fori_loop(
        0, n_chunks, chunk_body, (jnp.zeros_like(feat), jnp.zeros((T, 1), jnp.float32))
    )
    dfeat_ref[:] = dfeat
    s_ref[:] = s_sum


# ---------------------------------------------------------------------------
# 2-node lane packing (pack2): for integrands whose widths fit in 64 lanes
# (the UCI shape: 1+e = 31 inputs, 50-wide hidden), TWO quadrature nodes ride
# each matmul row via block-diagonal weights — doubling lane occupancy and
# halving the folded M dimension. The Pallas path at these configs is
# MXU-bound on ~6x padded FLOPs (scripts/uci_tile_probe.py), so packing cuts
# the padded work ~2x. Feature layout per row: [x, h, x, h] with the two x
# columns scaled by different node positions; weight blocks per layer:
# diag(W, W) (output layer: two one-hot columns). Cross-block gradient
# blocks are discarded and the two diagonal blocks summed host-side.
# ---------------------------------------------------------------------------


def _fwd_kernel_p2(
    na_ref, nb_ref, ca_ref, cb_ref, feat_ref, *rest,
    neg_slope, node_chunk, k_pad, x2_col,
):
    n_layers = len(rest) // 2
    ws = rest[:n_layers]
    bs = rest[n_layers : 2 * n_layers]
    out_ref = rest[2 * n_layers]
    feat = feat_ref[:]
    T = feat.shape[0]
    NC = node_chunk
    n_chunks = k_pad // NC
    col_ids = jax.lax.broadcasted_iota(jnp.int32, feat.shape, 1)
    x_end = feat[:, 0:1]

    feat_h = jnp.where((col_ids == 0) | (col_ids == x2_col), 0.0, feat)
    ph = (
        jnp.dot(feat_h, ws[0][:], preferred_element_type=jnp.float32) + bs[0][:]
    )
    w1xa = ws[0][0:1, :]
    w1xb = ws[0][x2_col : x2_col + 1, :]
    H1 = ph.shape[1]

    def chunk_body(c, acc):
        sa3 = ((na_ref[pl.ds(c * NC, NC), :] + 1.0) * 0.5)[:, :, None]
        sb3 = ((nb_ref[pl.ds(c * NC, NC), :] + 1.0) * 0.5)[:, :, None]
        pre1 = (
            ph[None]
            + (sa3 * x_end[None]) * w1xa[None]
            + (sb3 * x_end[None]) * w1xb[None]
        )
        a = _leaky(pre1, neg_slope).reshape(NC * T, H1)
        for i in range(1, n_layers - 1):
            a = _leaky(
                jnp.dot(a, ws[i][:], preferred_element_type=jnp.float32) + bs[i][:],
                neg_slope,
            )
        zL = (
            jnp.dot(a, ws[n_layers - 1][:], preferred_element_type=jnp.float32)
            + bs[n_layers - 1][:]
        )
        fa3 = _eluplus(zL[:, 0:1]).reshape(NC, T, 1)
        fb3 = _eluplus(zL[:, 1:2]).reshape(NC, T, 1)
        wa3 = ca_ref[pl.ds(c * NC, NC), :][:, :, None]
        wb3 = cb_ref[pl.ds(c * NC, NC), :][:, :, None]
        return acc + jnp.sum(wa3 * fa3 + wb3 * fb3, axis=0)

    acc = jax.lax.fori_loop(0, n_chunks, chunk_body, jnp.zeros((T, 1), jnp.float32))
    out_ref[:] = acc * x_end * 0.5


def _bwd_kernel_p2(
    na_ref, nb_ref, ca_ref, cb_ref, feat_ref, g_ref, *rest,
    neg_slope, node_chunk, k_pad, x2_col,
):
    n_layers = (len(rest) - 2) // 4
    ws = rest[:n_layers]
    bs = rest[n_layers : 2 * n_layers]
    dfeat_ref = rest[2 * n_layers]
    dws = rest[2 * n_layers + 1 : 3 * n_layers + 1]
    dbs = rest[3 * n_layers + 1 : 4 * n_layers + 1]
    s_ref = rest[4 * n_layers + 1]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for i in range(n_layers):
            dws[i][:] = jnp.zeros_like(dws[i])
            dbs[i][:] = jnp.zeros_like(dbs[i])

    feat = feat_ref[:]
    g = g_ref[:]
    T = feat.shape[0]
    NC = node_chunk
    n_chunks = k_pad // NC
    col_ids = jax.lax.broadcasted_iota(jnp.int32, feat.shape, 1)
    x_end = feat[:, 0:1]
    gx = g * x_end * 0.5

    feat_h = jnp.where((col_ids == 0) | (col_ids == x2_col), 0.0, feat)
    ph = (
        jnp.dot(feat_h, ws[0][:], preferred_element_type=jnp.float32) + bs[0][:]
    )
    w1xa = ws[0][0:1, :]
    w1xb = ws[0][x2_col : x2_col + 1, :]
    H1 = ph.shape[1]

    def contract_rows(a, b):
        return jax.lax.dot_general(
            a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    wTs = [ws[i][:].T for i in range(n_layers)]

    def chunk_body(c, carry):
        dfeat, s_acc = carry
        sa3 = ((na_ref[pl.ds(c * NC, NC), :] + 1.0) * 0.5)[:, :, None]
        sb3 = ((nb_ref[pl.ds(c * NC, NC), :] + 1.0) * 0.5)[:, :, None]
        xsa3 = sa3 * x_end[None]
        xsb3 = sb3 * x_end[None]
        pre1 = (ph[None] + xsa3 * w1xa[None] + xsb3 * w1xb[None]).reshape(
            NC * T, H1
        )
        a = _leaky(pre1, neg_slope)
        acts = [a]
        for i in range(1, n_layers - 1):
            z = jnp.dot(a, ws[i][:], preferred_element_type=jnp.float32) + bs[i][:]
            a = _leaky(z, neg_slope)
            acts.append(a)
        zL = jnp.dot(a, ws[n_layers - 1][:], preferred_element_type=jnp.float32)
        fa = _eluplus(zL[:, 0:1] + bs[n_layers - 1][0:1, 0:1])
        fb = _eluplus(zL[:, 1:2] + bs[n_layers - 1][0:1, 1:2])
        wa3 = ca_ref[pl.ds(c * NC, NC), :][:, :, None]
        wb3 = cb_ref[pl.ds(c * NC, NC), :][:, :, None]
        s_acc = s_acc + jnp.sum(
            wa3 * fa.reshape(NC, T, 1) + wb3 * fb.reshape(NC, T, 1), axis=0
        )
        cta = (wa3 * gx[None]).reshape(NC * T, 1)
        ctb = (wb3 * gx[None]).reshape(NC * T, 1)
        dzLa = cta * jnp.minimum(fa, 1.0)
        dzLb = ctb * jnp.minimum(fb, 1.0)
        # output layer: two real columns -> two VPU reductions, stored
        # TRANSPOSED in rows 0/1 of the dW ref (un-transposed host-side)
        aL = acts[n_layers - 2]
        r0 = jnp.sum(aL * dzLa, axis=0, keepdims=True)
        r1 = jnp.sum(aL * dzLb, axis=0, keepdims=True)
        rowsL = jax.lax.broadcasted_iota(jnp.int32, dws[n_layers - 1].shape, 0)
        dws[n_layers - 1][:] += jnp.where(
            rowsL == 0, r0, jnp.where(rowsL == 1, r1, 0.0)
        )
        colsLb = jax.lax.broadcasted_iota(jnp.int32, dbs[n_layers - 1].shape, 1)
        dbs[n_layers - 1][:] += jnp.where(
            colsLb == 0,
            jnp.sum(dzLa, axis=0, keepdims=True),
            jnp.where(colsLb == 1, jnp.sum(dzLb, axis=0, keepdims=True), 0.0),
        )
        da = dzLa * wTs[n_layers - 1][0:1, :] + dzLb * wTs[n_layers - 1][1:2, :]
        dz = da * jnp.where(aL > 0, 1.0, neg_slope)
        for i in range(n_layers - 2, 0, -1):
            dws[i][:] += contract_rows(acts[i - 1], dz)
            dbs[i][:] += jnp.sum(dz, axis=0, keepdims=True)
            da = jnp.dot(dz, wTs[i], preferred_element_type=jnp.float32)
            dz = da * jnp.where(acts[i - 1] > 0, 1.0, neg_slope)
        # layer 1 with TWO x rows (0 and x2_col)
        dz3 = dz.reshape(NC, T, H1)
        dz_sum = jnp.sum(dz3, axis=0)
        dw1_h = contract_rows(feat_h, dz_sum)
        dw1_xa = jnp.sum(jnp.sum(xsa3 * dz3, axis=0), axis=0, keepdims=True)
        dw1_xb = jnp.sum(jnp.sum(xsb3 * dz3, axis=0), axis=0, keepdims=True)
        w_rows = jax.lax.broadcasted_iota(jnp.int32, dw1_h.shape, 0)
        dws[0][:] += jnp.where(
            w_rows == 0, dw1_xa, jnp.where(w_rows == x2_col, dw1_xb, dw1_h)
        )
        dbs[0][:] += jnp.sum(dz_sum, axis=0, keepdims=True)
        dh_nodes = jnp.dot(dz_sum, wTs[0], preferred_element_type=jnp.float32)
        dxa = jnp.sum(
            jnp.sum(dz3 * w1xa[None], axis=2, keepdims=True) * sa3, axis=0
        )
        dxb = jnp.sum(
            jnp.sum(dz3 * w1xb[None], axis=2, keepdims=True) * sb3, axis=0
        )
        # all of dx lands in col 0; col x2 zeroed so the host never
        # double-counts (dh slots are folded host-side instead)
        dfeat = dfeat + jnp.where(
            col_ids == 0,
            dxa + dxb,
            jnp.where(col_ids == x2_col, 0.0, dh_nodes),
        )
        return dfeat, s_acc

    dfeat, s_sum = jax.lax.fori_loop(
        0, n_chunks, chunk_body, (jnp.zeros_like(feat), jnp.zeros((T, 1), jnp.float32))
    )
    dfeat_ref[:] = dfeat
    s_ref[:] = s_sum


# ---------------------------------------------------------------------------
# 4-node lane packing (pack4): generalizes pack2 to FOUR nodes per matmul row
# for integrands whose widths fit in 32 lanes (toy/monotonic shapes:
# 1+e <= 32, hidden <= 32) — quadrupling lane occupancy and quartering the
# folded M dimension. Feature layout per row: [x,h]*4 with the four x columns
# scaled by different node positions; weights diag(W,W,W,W) (output layer:
# four one-hot columns). Node/CC-weight columns ride ONE [K4, 4] ref each.
# (VERDICT r2 next-step #6.)
# ---------------------------------------------------------------------------

PN = 4  # slots for the pack4 kernels


def _fwd_kernel_pn(
    nodes_ref, ccw_ref, feat_ref, *rest, neg_slope, node_chunk, k_pad, stride
):
    n_layers = len(rest) // 2
    ws = rest[:n_layers]
    bs = rest[n_layers : 2 * n_layers]
    out_ref = rest[2 * n_layers]
    feat = feat_ref[:]
    T = feat.shape[0]
    NC = node_chunk
    n_chunks = k_pad // NC
    col_ids = jax.lax.broadcasted_iota(jnp.int32, feat.shape, 1)
    x_end = feat[:, 0:1]

    is_x_col = col_ids == 0
    for j in range(1, PN):
        is_x_col = is_x_col | (col_ids == j * stride)
    feat_h = jnp.where(is_x_col, 0.0, feat)
    ph = jnp.dot(feat_h, ws[0][:], preferred_element_type=jnp.float32) + bs[0][:]
    w1x = [ws[0][j * stride : j * stride + 1, :] for j in range(PN)]
    H1 = ph.shape[1]

    def chunk_body(c, acc):
        s3 = [
            ((nodes_ref[pl.ds(c * NC, NC), j : j + 1] + 1.0) * 0.5)[:, :, None]
            for j in range(PN)
        ]  # each [NC, 1, 1]
        pre1 = ph[None]
        for j in range(PN):
            pre1 = pre1 + (s3[j] * x_end[None]) * w1x[j][None]
        a = _leaky(pre1, neg_slope).reshape(NC * T, H1)
        for i in range(1, n_layers - 1):
            a = _leaky(
                jnp.dot(a, ws[i][:], preferred_element_type=jnp.float32) + bs[i][:],
                neg_slope,
            )
        zL = (
            jnp.dot(a, ws[n_layers - 1][:], preferred_element_type=jnp.float32)
            + bs[n_layers - 1][:]
        )
        add = jnp.zeros((T, 1), jnp.float32)
        for j in range(PN):
            f3 = _eluplus(zL[:, j : j + 1]).reshape(NC, T, 1)
            w3 = ccw_ref[pl.ds(c * NC, NC), j : j + 1][:, :, None]
            add = add + jnp.sum(w3 * f3, axis=0)
        return acc + add

    acc = jax.lax.fori_loop(0, n_chunks, chunk_body, jnp.zeros((T, 1), jnp.float32))
    out_ref[:] = acc * x_end * 0.5


def _bwd_kernel_pn(
    nodes_ref, ccw_ref, feat_ref, g_ref, *rest, neg_slope, node_chunk, k_pad, stride
):
    n_layers = (len(rest) - 2) // 4
    ws = rest[:n_layers]
    bs = rest[n_layers : 2 * n_layers]
    dfeat_ref = rest[2 * n_layers]
    dws = rest[2 * n_layers + 1 : 3 * n_layers + 1]
    dbs = rest[3 * n_layers + 1 : 4 * n_layers + 1]
    s_ref = rest[4 * n_layers + 1]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for i in range(n_layers):
            dws[i][:] = jnp.zeros_like(dws[i])
            dbs[i][:] = jnp.zeros_like(dbs[i])

    feat = feat_ref[:]
    g = g_ref[:]
    T = feat.shape[0]
    NC = node_chunk
    n_chunks = k_pad // NC
    col_ids = jax.lax.broadcasted_iota(jnp.int32, feat.shape, 1)
    x_end = feat[:, 0:1]
    gx = g * x_end * 0.5

    is_x_col = col_ids == 0
    for j in range(1, PN):
        is_x_col = is_x_col | (col_ids == j * stride)
    feat_h = jnp.where(is_x_col, 0.0, feat)
    ph = jnp.dot(feat_h, ws[0][:], preferred_element_type=jnp.float32) + bs[0][:]
    w1x = [ws[0][j * stride : j * stride + 1, :] for j in range(PN)]
    H1 = ph.shape[1]

    def contract_rows(a, b):
        return jax.lax.dot_general(
            a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    wTs = [ws[i][:].T for i in range(n_layers)]

    def chunk_body(c, carry):
        dfeat, s_acc = carry
        s3 = [
            ((nodes_ref[pl.ds(c * NC, NC), j : j + 1] + 1.0) * 0.5)[:, :, None]
            for j in range(PN)
        ]
        xs3 = [s3[j] * x_end[None] for j in range(PN)]
        pre1 = ph[None]
        for j in range(PN):
            pre1 = pre1 + xs3[j] * w1x[j][None]
        a = _leaky(pre1.reshape(NC * T, H1), neg_slope)
        acts = [a]
        for i in range(1, n_layers - 1):
            z = jnp.dot(a, ws[i][:], preferred_element_type=jnp.float32) + bs[i][:]
            a = _leaky(z, neg_slope)
            acts.append(a)
        zL = jnp.dot(a, ws[n_layers - 1][:], preferred_element_type=jnp.float32)
        fs = [
            _eluplus(zL[:, j : j + 1] + bs[n_layers - 1][0:1, j : j + 1])
            for j in range(PN)
        ]
        w3 = [
            ccw_ref[pl.ds(c * NC, NC), j : j + 1][:, :, None] for j in range(PN)
        ]
        s_add = jnp.zeros((T, 1), jnp.float32)
        for j in range(PN):
            s_add = s_add + jnp.sum(w3[j] * fs[j].reshape(NC, T, 1), axis=0)
        s_acc = s_acc + s_add
        dzL = [
            (w3[j] * gx[None]).reshape(NC * T, 1) * jnp.minimum(fs[j], 1.0)
            for j in range(PN)
        ]
        # output layer: PN real columns -> PN VPU reductions, stored
        # TRANSPOSED in rows 0..PN-1 of the dW ref (un-transposed host-side)
        aL = acts[n_layers - 2]
        rowsL = jax.lax.broadcasted_iota(jnp.int32, dws[n_layers - 1].shape, 0)
        dwL = jnp.zeros_like(dws[n_layers - 1][:])
        for j in range(PN):
            rj = jnp.sum(aL * dzL[j], axis=0, keepdims=True)
            dwL = dwL + jnp.where(rowsL == j, rj, 0.0)
        dws[n_layers - 1][:] += dwL
        colsLb = jax.lax.broadcasted_iota(jnp.int32, dbs[n_layers - 1].shape, 1)
        dbL = jnp.zeros_like(dbs[n_layers - 1][:])
        for j in range(PN):
            dbL = dbL + jnp.where(
                colsLb == j, jnp.sum(dzL[j], axis=0, keepdims=True), 0.0
            )
        dbs[n_layers - 1][:] += dbL
        da = dzL[0] * wTs[n_layers - 1][0:1, :]
        for j in range(1, PN):
            da = da + dzL[j] * wTs[n_layers - 1][j : j + 1, :]
        dz = da * jnp.where(aL > 0, 1.0, neg_slope)
        for i in range(n_layers - 2, 0, -1):
            dws[i][:] += contract_rows(acts[i - 1], dz)
            dbs[i][:] += jnp.sum(dz, axis=0, keepdims=True)
            da = jnp.dot(dz, wTs[i], preferred_element_type=jnp.float32)
            dz = da * jnp.where(acts[i - 1] > 0, 1.0, neg_slope)
        # layer 1 with PN x rows (j * stride)
        dz3 = dz.reshape(NC, T, H1)
        dz_sum = jnp.sum(dz3, axis=0)
        dw1_h = contract_rows(feat_h, dz_sum)
        w_rows = jax.lax.broadcasted_iota(jnp.int32, dw1_h.shape, 0)
        dw1 = dw1_h
        for j in range(PN):
            dw1_xj = jnp.sum(jnp.sum(xs3[j] * dz3, axis=0), axis=0, keepdims=True)
            dw1 = jnp.where(w_rows == j * stride, dw1_xj, dw1)
        dws[0][:] += dw1
        dbs[0][:] += jnp.sum(dz_sum, axis=0, keepdims=True)
        dh_nodes = jnp.dot(dz_sum, wTs[0], preferred_element_type=jnp.float32)
        dx = jnp.zeros((T, 1), jnp.float32)
        for j in range(PN):
            dx = dx + jnp.sum(
                jnp.sum(dz3 * w1x[j][None], axis=2, keepdims=True) * s3[j], axis=0
            )
        # all of dx lands in col 0; the other x cols zeroed (their dh slots
        # are folded host-side)
        dfeat = dfeat + jnp.where(
            col_ids == 0, dx, jnp.where(is_x_col, 0.0, dh_nodes)
        )
        return dfeat, s_acc

    dfeat, s_sum = jax.lax.fori_loop(
        0, n_chunks, chunk_body, (jnp.zeros_like(feat), jnp.zeros((T, 1), jnp.float32))
    )
    dfeat_ref[:] = dfeat
    s_ref[:] = s_sum


def _packn_params(ws, bs):
    """Block-diagonal PN-slot weights (real sizes; padding happens after)."""
    pws, pbs = [], []
    n = len(ws)
    for idx, (w, b) in enumerate(zip(ws, bs)):
        i, o = w.shape
        if idx == n - 1:
            wp = jnp.zeros((PN * i, PN), w.dtype)
            for j in range(PN):
                wp = wp.at[j * i : (j + 1) * i, j].set(w[:, 0])
            bp = jnp.concatenate([b] * PN)
        else:
            wp = jnp.zeros((PN * i, PN * o), w.dtype)
            for j in range(PN):
                wp = wp.at[j * i : (j + 1) * i, j * o : (j + 1) * o].set(w)
            bp = jnp.concatenate([b] * PN)
        pws.append(wp)
        pbs.append(bp)
    return pws, pbs


def _packn_nodes(nodes, ccw, node_chunk):
    """Deinterleave the node axis into PN slot columns [K/PN, PN]; pad to
    node_chunk with zero-weight t=-1 nodes."""
    K = nodes.shape[0]
    K_r = _round_up(K, PN)
    if K_r != K:
        nodes = jnp.concatenate(
            [nodes, jnp.full((K_r - K, 1), -1.0, nodes.dtype)]
        )
        ccw = jnp.concatenate([ccw, jnp.zeros((K_r - K, 1), ccw.dtype)])
    kp = K_r // PN
    nodes_p = nodes.reshape(kp, PN)
    ccw_p = ccw.reshape(kp, PN)
    kp_pad = _round_up(kp, node_chunk)
    if kp_pad != kp:
        pad = kp_pad - kp
        nodes_p = jnp.concatenate(
            [nodes_p, jnp.full((pad, PN), -1.0, nodes_p.dtype)]
        )
        ccw_p = jnp.concatenate([ccw_p, jnp.zeros((pad, PN), ccw_p.dtype)])
    return nodes_p, ccw_p, kp_pad


def _pack4_applicable(ws) -> bool:
    """pack4 needs every layer's block to fit in a quarter of the 128 lanes."""
    return (
        len(ws) >= 2
        and ws[0].shape[0] <= 32  # 1 + e
        and all(w.shape[1] <= 32 for w in ws[:-1])  # hidden widths
        and ws[-1].shape[1] == 1  # scalar integrand head
    )


def _prep_pn(x, h):
    """Packed feature rows [x, h] * PN; x columns at j * (1 + e)."""
    batch_shape = x.shape
    R = int(np.prod(batch_shape))
    e = h.shape[-1]
    stride = 1 + e
    F = _round_up(PN * stride, LANE)
    xf = x.reshape(R).astype(jnp.float32)
    hf = h.reshape(R, e).astype(jnp.float32)
    feat = jnp.zeros((R, F), jnp.float32)
    for j in range(PN):
        feat = feat.at[:, j * stride].set(xf)
        feat = feat.at[:, j * stride + 1 : (j + 1) * stride].set(hf)
    return feat, batch_shape, R, e, stride


def _run_fwd_pn(
    pw, pb, feat, nodes_p, ccw_p, tile_r, node_chunk, interpret, neg_slope, stride
):
    R, F = feat.shape
    grid = (R // tile_r,)
    k_pad = nodes_p.shape[0]
    node_spec = pl.BlockSpec((k_pad, PN), lambda i: (0, 0), memory_space=pltpu.VMEM)
    in_specs = [node_spec, node_spec] + [
        pl.BlockSpec((tile_r, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ] + [
        pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM) for w in pw
    ] + [
        pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM) for b in pb
    ]
    return pl.pallas_call(
        functools.partial(
            _fwd_kernel_pn, neg_slope=neg_slope, node_chunk=node_chunk,
            k_pad=k_pad, stride=stride,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile_r, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, 1), jnp.float32),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(nodes_p, ccw_p, feat, *pw, *pb)


def _run_bwd_pn(
    pw, pb, feat, g, nodes_p, ccw_p, tile_r, node_chunk, interpret, neg_slope, stride
):
    R, F = feat.shape
    grid = (R // tile_r,)
    k_pad = nodes_p.shape[0]
    node_spec = pl.BlockSpec((k_pad, PN), lambda i: (0, 0), memory_space=pltpu.VMEM)
    in_specs = [node_spec, node_spec] + [
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
        + [jax.ShapeDtypeStruct((R, 1), jnp.float32)]
    )
    out_specs = (
        [pl.BlockSpec((tile_r, F), lambda i: (i, 0), memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM) for w in pw]
        + [pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM) for b in pb]
        + [pl.BlockSpec((tile_r, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)]
    )
    outs = pl.pallas_call(
        functools.partial(
            _bwd_kernel_pn, neg_slope=neg_slope, node_chunk=node_chunk,
            k_pad=k_pad, stride=stride,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(nodes_p, ccw_p, feat, g, *pw, *pb)
    n_layers = len(pw)
    return (
        outs[0],
        outs[1 : 1 + n_layers],
        outs[1 + n_layers : 1 + 2 * n_layers],
        outs[1 + 2 * n_layers],
    )


def _pack2_params(ws, bs):
    """Block-diagonal 2-slot weights (real sizes; padding happens after)."""
    pws, pbs = [], []
    n = len(ws)
    for idx, (w, b) in enumerate(zip(ws, bs)):
        i, o = w.shape
        if idx == n - 1:
            # output layer: two one-hot columns (slot A -> col 0, B -> col 1)
            wp = jnp.zeros((2 * i, 2), w.dtype)
            wp = wp.at[:i, 0].set(w[:, 0])
            wp = wp.at[i:, 1].set(w[:, 0])
            bp = jnp.concatenate([b, b])
        else:
            wp = jnp.zeros((2 * i, 2 * o), w.dtype)
            wp = wp.at[:i, :o].set(w)
            wp = wp.at[i:, o:].set(w)
            bp = jnp.concatenate([b, b])
        pws.append(wp)
        pbs.append(bp)
    return pws, pbs


def _pack2_nodes(nodes, ccw, node_chunk):
    """Split the node axis into even/odd pairs; pad pairs to node_chunk."""
    K = nodes.shape[0]
    if K % 2:
        nodes = jnp.concatenate([nodes, jnp.full((1, 1), -1.0, nodes.dtype)])
        ccw = jnp.concatenate([ccw, jnp.zeros((1, 1), ccw.dtype)])
    na, nb = nodes[0::2], nodes[1::2]
    ca, cb = ccw[0::2], ccw[1::2]
    K2 = na.shape[0]
    K2_pad = _round_up(K2, node_chunk)
    if K2_pad != K2:
        pad = K2_pad - K2
        na = jnp.concatenate([na, jnp.full((pad, 1), -1.0, na.dtype)])
        nb = jnp.concatenate([nb, jnp.full((pad, 1), -1.0, nb.dtype)])
        ca = jnp.concatenate([ca, jnp.zeros((pad, 1), ca.dtype)])
        cb = jnp.concatenate([cb, jnp.zeros((pad, 1), cb.dtype)])
    return na, nb, ca, cb, K2_pad


def _pack2_applicable(ws) -> bool:
    """pack2 needs every layer's block to fit in half the 128 lanes."""
    return (
        len(ws) >= 2
        and ws[0].shape[0] <= 64  # 1 + e
        and all(w.shape[1] <= 64 for w in ws[:-1])  # hidden widths
        and ws[-1].shape[1] == 1  # scalar integrand head
    )


def _prep_p2(x, h):
    """Packed feature rows [x, h, x, h]; x2_col is the second x column."""
    batch_shape = x.shape
    R = int(np.prod(batch_shape))
    e = h.shape[-1]
    x2_col = 1 + e
    F = _round_up(2 * (1 + e), LANE)
    xf = x.reshape(R).astype(jnp.float32)
    hf = h.reshape(R, e).astype(jnp.float32)
    feat = jnp.zeros((R, F), jnp.float32)
    feat = feat.at[:, 0].set(xf)
    feat = feat.at[:, 1 : 1 + e].set(hf)
    feat = feat.at[:, x2_col].set(xf)
    feat = feat.at[:, x2_col + 1 : x2_col + 1 + e].set(hf)
    return feat, batch_shape, R, e, x2_col


def _run_fwd(pw, pb, feat, nodes, ccw, tile_r, node_chunk, interpret, neg_slope):
    R, F = feat.shape
    grid = (R // tile_r,)
    k_pad = nodes.shape[0]
    in_specs = [
        pl.BlockSpec((k_pad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((k_pad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_r, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ] + [
        pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM) for w in pw
    ] + [
        pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM) for b in pb
    ]
    mlp_flops = sum(2 * w.shape[0] * w.shape[1] for w in pw)
    return pl.pallas_call(
        functools.partial(
            _fwd_kernel, neg_slope=neg_slope, node_chunk=node_chunk, k_pad=k_pad
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile_r, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, 1), jnp.float32),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        cost_estimate=pl.CostEstimate(
            flops=R * k_pad * mlp_flops,
            bytes_accessed=R * F * 4 + R * 4,
            transcendentals=R * k_pad,
        ),
    )(nodes, ccw, feat, *pw, *pb)


def _run_bwd(pw, pb, feat, g, nodes, ccw, tile_r, node_chunk, interpret, neg_slope,
             dw_mode="per_layer"):
    R, F = feat.shape
    grid = (R // tile_r,)
    k_pad = nodes.shape[0]
    in_specs = [
        pl.BlockSpec((k_pad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((k_pad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
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
        + [jax.ShapeDtypeStruct((R, 1), jnp.float32)]
    )
    out_specs = (
        [pl.BlockSpec((tile_r, F), lambda i: (i, 0), memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM) for w in pw]
        + [pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM) for b in pb]
        + [pl.BlockSpec((tile_r, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)]
    )
    outs = pl.pallas_call(
        functools.partial(
            _bwd_kernel, neg_slope=neg_slope, node_chunk=node_chunk, k_pad=k_pad,
            dw_mode=dw_mode,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(nodes, ccw, feat, g, *pw, *pb)
    dfeat = outs[0]
    n_layers = len(pw)
    dpw = outs[1 : 1 + n_layers]
    dpb = outs[1 + n_layers : 1 + 2 * n_layers]
    s_sum = outs[1 + 2 * n_layers]
    return dfeat, dpw, dpb, s_sum


def _run_fwd_p2(
    pw, pb, feat, na, nb, ca, cb, tile_r, node_chunk, interpret, neg_slope, x2_col
):
    R, F = feat.shape
    grid = (R // tile_r,)
    k_pad = na.shape[0]
    node_spec = pl.BlockSpec((k_pad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    in_specs = [node_spec] * 4 + [
        pl.BlockSpec((tile_r, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ] + [
        pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM) for w in pw
    ] + [
        pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM) for b in pb
    ]
    return pl.pallas_call(
        functools.partial(
            _fwd_kernel_p2, neg_slope=neg_slope, node_chunk=node_chunk,
            k_pad=k_pad, x2_col=x2_col,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile_r, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, 1), jnp.float32),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(na, nb, ca, cb, feat, *pw, *pb)


def _run_bwd_p2(
    pw, pb, feat, g, na, nb, ca, cb, tile_r, node_chunk, interpret, neg_slope, x2_col
):
    R, F = feat.shape
    grid = (R // tile_r,)
    k_pad = na.shape[0]
    node_spec = pl.BlockSpec((k_pad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    in_specs = [node_spec] * 4 + [
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
        + [jax.ShapeDtypeStruct((R, 1), jnp.float32)]
    )
    out_specs = (
        [pl.BlockSpec((tile_r, F), lambda i: (i, 0), memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM) for w in pw]
        + [pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM) for b in pb]
        + [pl.BlockSpec((tile_r, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)]
    )
    outs = pl.pallas_call(
        functools.partial(
            _bwd_kernel_p2, neg_slope=neg_slope, node_chunk=node_chunk,
            k_pad=k_pad, x2_col=x2_col,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(na, nb, ca, cb, feat, g, *pw, *pb)
    n_layers = len(pw)
    return (
        outs[0],
        outs[1 : 1 + n_layers],
        outs[1 + n_layers : 1 + 2 * n_layers],
        outs[1 + 2 * n_layers],
    )


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10)
)
def _fused_integral(
    ws, bs, x, h, nodes_ccw, tile_r, node_chunk, interpret, neg_slope, dw_mode,
    pack,
):
    z, _ = _fused_fwd_impl(
        ws, bs, x, h, nodes_ccw, tile_r, node_chunk, interpret, neg_slope, pack
    )
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


def _fused_fwd_impl(
    ws, bs, x, h, nodes_ccw, tile_r, node_chunk, interpret, neg_slope, pack=1
):
    nodes, ccw = nodes_ccw
    if pack == 4:
        feat, batch_shape, R, e, stride = _prep_pn(x, h)
        pw, pb = _pad_params(*_packn_params(ws, bs))
        nodes_p, ccw_p, _ = _packn_nodes(nodes, ccw, node_chunk)
        R_pad = _round_up(max(R, tile_r), tile_r)
        if R_pad != R:
            feat = jnp.pad(feat, ((0, R_pad - R), (0, 0)))
        out = _run_fwd_pn(
            pw, pb, feat, nodes_p, ccw_p, tile_r, node_chunk, interpret,
            neg_slope, stride,
        )
        return out[:R, 0].reshape(batch_shape), (feat, batch_shape, R, e)
    if pack == 2:
        feat, batch_shape, R, e, x2_col = _prep_p2(x, h)
        pw, pb = _pad_params(*_pack2_params(ws, bs))
        na, nb, ca, cb, _ = _pack2_nodes(nodes, ccw, node_chunk)
        R_pad = _round_up(max(R, tile_r), tile_r)
        if R_pad != R:
            feat = jnp.pad(feat, ((0, R_pad - R), (0, 0)))
        out = _run_fwd_p2(
            pw, pb, feat, na, nb, ca, cb, tile_r, node_chunk, interpret,
            neg_slope, x2_col,
        )
        return out[:R, 0].reshape(batch_shape), (feat, batch_shape, R, e)
    feat, batch_shape, R, e = _prep(ws, bs, x, h)
    pw, pb = _pad_params(ws, bs)
    nodes, ccw, _ = _pad_nodes(nodes, ccw, node_chunk)
    R_pad = _round_up(max(R, tile_r), tile_r)
    if R_pad != R:
        feat = jnp.pad(feat, ((0, R_pad - R), (0, 0)))
    out = _run_fwd(pw, pb, feat, nodes, ccw, tile_r, node_chunk, interpret, neg_slope)
    z = out[:R, 0].reshape(batch_shape)
    return z, (feat, batch_shape, R, e)


def _fused_vjp_fwd(
    ws, bs, x, h, nodes_ccw, tile_r, node_chunk, interpret, neg_slope, dw_mode,
    pack,
):
    z, _ = _fused_fwd_impl(
        ws, bs, x, h, nodes_ccw, tile_r, node_chunk, interpret, neg_slope, pack
    )
    return z, (ws, bs, x, h, z, nodes_ccw)


def _fused_vjp_bwd(
    tile_r, node_chunk, interpret, neg_slope, dw_mode, pack, res, g
):
    ws, bs, x, h, z, nodes_ccw = res
    nodes, ccw = nodes_ccw
    if pack == 4:
        return _fused_vjp_bwd_pn(
            tile_r, node_chunk, interpret, neg_slope, res, g
        )
    if pack == 2:
        return _fused_vjp_bwd_p2(
            tile_r, node_chunk, interpret, neg_slope, res, g
        )
    feat, batch_shape, R, e = _prep(ws, bs, x, h)
    pw, pb = _pad_params(ws, bs)
    nodes, ccw, _ = _pad_nodes(nodes, ccw, node_chunk)
    R_pad = _round_up(max(R, tile_r), tile_r)
    g_flat = g.reshape(R, 1).astype(jnp.float32)
    if R_pad != R:
        feat = jnp.pad(feat, ((0, R_pad - R), (0, 0)))
        g_flat = jnp.pad(g_flat, ((0, R_pad - R), (0, 0)))
    dfeat, dpw, dpb, s_sum = _run_bwd(
        pw, pb, feat, g_flat, nodes, ccw, tile_r, node_chunk, interpret, neg_slope,
        dw_mode,
    )
    dfeat = dfeat[:R]
    # node-path x gradient + the exact product-rule term g * S(x)/2, with
    # S = sum_n w_n f_n recomputed by the backward kernel (dividing the saved
    # z by x would be singular at x = 0, where the true gradient is g*f(0,h)).
    prod_term = g * s_sum[:R, 0].reshape(batch_shape) * 0.5
    dx = dfeat[:, 0].reshape(batch_shape) + prod_term
    dh = dfeat[:, 1 : 1 + e].reshape(*batch_shape, e).astype(h.dtype)
    batched_active = dw_mode == "batched" and all(
        w.shape == pw[1].shape for w in pw[1:]
    )  # must mirror the kernel's branch predicate exactly
    if not batched_active:
        # per-layer kernel stores the output layer's dW transposed (its
        # single real column accumulated as row 0 via a VPU reduction)
        dpw = list(dpw[:-1]) + [dpw[-1].T]
    dws = [dw[: w.shape[0], : w.shape[1]].astype(w.dtype) for dw, w in zip(dpw, ws)]
    dbs = [db[0, : b.shape[0]].astype(b.dtype) for db, b in zip(dpb, bs)]
    return (dws, dbs, dx.astype(x.dtype), dh, (jnp.zeros_like(nodes_ccw[0]), jnp.zeros_like(nodes_ccw[1])))


def _fused_vjp_bwd_p2(tile_r, node_chunk, interpret, neg_slope, res, g):
    ws, bs, x, h, z, nodes_ccw = res
    nodes, ccw = nodes_ccw
    feat, batch_shape, R, e, x2_col = _prep_p2(x, h)
    pw, pb = _pad_params(*_pack2_params(ws, bs))
    na, nb, ca, cb, _ = _pack2_nodes(nodes, ccw, node_chunk)
    R_pad = _round_up(max(R, tile_r), tile_r)
    g_flat = g.reshape(R, 1).astype(jnp.float32)
    if R_pad != R:
        feat = jnp.pad(feat, ((0, R_pad - R), (0, 0)))
        g_flat = jnp.pad(g_flat, ((0, R_pad - R), (0, 0)))
    dfeat, dpw, dpb, s_sum = _run_bwd_p2(
        pw, pb, feat, g_flat, na, nb, ca, cb, tile_r, node_chunk, interpret,
        neg_slope, x2_col,
    )
    dfeat = dfeat[:R]
    prod_term = g * s_sum[:R, 0].reshape(batch_shape) * 0.5
    dx = dfeat[:, 0].reshape(batch_shape) + prod_term
    # h gradient arrives in both packed slots — fold them
    dh = (
        dfeat[:, 1 : 1 + e] + dfeat[:, x2_col + 1 : x2_col + 1 + e]
    ).reshape(*batch_shape, e).astype(h.dtype)
    dws, dbs = [], []
    n = len(ws)
    for idx, (w, b) in enumerate(zip(ws, bs)):
        i, o = w.shape
        if idx == n - 1:
            dun = dpw[idx].T  # output dW stored transposed (rows 0/1)
            dw = dun[:i, 0:1] + dun[i : 2 * i, 1:2]
            db = dpb[idx][0, 0:1] + dpb[idx][0, 1:2]
        else:
            dw = dpw[idx][:i, :o] + dpw[idx][i : 2 * i, o : 2 * o]
            db = dpb[idx][0, :o] + dpb[idx][0, o : 2 * o]
        dws.append(dw.astype(w.dtype))
        dbs.append(db.astype(b.dtype))
    return (
        dws, dbs, dx.astype(x.dtype), dh,
        (jnp.zeros_like(nodes_ccw[0]), jnp.zeros_like(nodes_ccw[1])),
    )


def _fused_vjp_bwd_pn(tile_r, node_chunk, interpret, neg_slope, res, g):
    ws, bs, x, h, z, nodes_ccw = res
    nodes, ccw = nodes_ccw
    feat, batch_shape, R, e, stride = _prep_pn(x, h)
    pw, pb = _pad_params(*_packn_params(ws, bs))
    nodes_p, ccw_p, _ = _packn_nodes(nodes, ccw, node_chunk)
    R_pad = _round_up(max(R, tile_r), tile_r)
    g_flat = g.reshape(R, 1).astype(jnp.float32)
    if R_pad != R:
        feat = jnp.pad(feat, ((0, R_pad - R), (0, 0)))
        g_flat = jnp.pad(g_flat, ((0, R_pad - R), (0, 0)))
    dfeat, dpw, dpb, s_sum = _run_bwd_pn(
        pw, pb, feat, g_flat, nodes_p, ccw_p, tile_r, node_chunk, interpret,
        neg_slope, stride,
    )
    dfeat = dfeat[:R]
    prod_term = g * s_sum[:R, 0].reshape(batch_shape) * 0.5
    dx = dfeat[:, 0].reshape(batch_shape) + prod_term
    # h gradient arrives in all PN packed slots — fold them
    dh_acc = dfeat[:, 1:stride]
    for j in range(1, PN):
        dh_acc = dh_acc + dfeat[:, j * stride + 1 : (j + 1) * stride]
    dh = dh_acc.reshape(*batch_shape, e).astype(h.dtype)
    dws, dbs = [], []
    n = len(ws)
    for idx, (w, b) in enumerate(zip(ws, bs)):
        i, o = w.shape
        if idx == n - 1:
            dun = dpw[idx].T  # output dW stored transposed (rows 0..PN-1)
            dw = sum(dun[j * i : (j + 1) * i, j : j + 1] for j in range(PN))
            db = sum(dpb[idx][0, j : j + 1] for j in range(PN))
        else:
            dw = sum(
                dpw[idx][j * i : (j + 1) * i, j * o : (j + 1) * o]
                for j in range(PN)
            )
            db = sum(dpb[idx][0, j * o : (j + 1) * o] for j in range(PN))
        dws.append(dw.astype(w.dtype))
        dbs.append(db.astype(b.dtype))
    return (
        dws, dbs, dx.astype(x.dtype), dh,
        (jnp.zeros_like(nodes_ccw[0]), jnp.zeros_like(nodes_ccw[1])),
    )


_fused_integral.defvjp(_fused_vjp_fwd, _fused_vjp_bwd)


def fused_cc_integral(
    ws: Sequence[jax.Array],
    bs: Sequence[jax.Array],
    x: jax.Array,
    h: jax.Array,
    nodes: jax.Array,
    ccw: jax.Array,
    *,
    tile_r: int = 128,
    node_chunk: int | None = None,
    interpret: bool | None = None,
    neg_slope: float = 0.01,
    dw_mode: str = "per_layer",
    pack2: bool | None = None,
    pack4: bool | None = None,
) -> jax.Array:
    """``∫_0^{x} f(t, h) dt`` for the UMNN integrand MLP, fused on-TPU.

    ``ws/bs``: unpadded MLP layer params ([din, dout] / [dout]); hidden
    activation LeakyReLU(0.01), output ELU+1. ``x: [...]`` endpoints,
    ``h: [..., e]`` per-row conditioning. ``nodes/ccw``: CC quadrature
    as [K, 1] float32 columns (see :func:`umnn_tpu.ops.quadrature.cc_quadrature`).
    Differentiable via the fused Leibniz-VJP backward kernel.

    ``tile_r`` rows per grid step; ``node_chunk`` quadrature nodes folded
    into each matmul's M dimension (VMEM per activation buffer is
    ``tile_r * node_chunk * 128 * 4`` bytes); ``pack2`` packs two nodes per
    matmul row via block-diagonal weights when every layer fits 64 lanes
    (auto-enabled — measured 0.834 -> 0.607 ms per UCI-config train step);
    ``pack4`` packs FOUR nodes per row for <=32-lane integrands
    (toy/monotonic shapes; auto-enabled when applicable, wins priority over
    pack2 — A/B via scripts/pack4_ab.py).
    """
    if len(ws) < 2:
        # the kernels assume >= 1 hidden layer (separate first/output
        # matmuls); a single-layer integrand must use the XLA path
        raise ValueError(
            "fused_cc_integral requires an integrand MLP with at least one "
            "hidden layer; use the XLA quadrature path for single-layer nets"
        )
    if interpret is None:
        interpret = not pallas_available()
    nodes = nodes.reshape(-1, 1).astype(jnp.float32)
    ccw = ccw.reshape(-1, 1).astype(jnp.float32)
    if pack4 is None:
        # auto: pack 4 nodes per row whenever every layer's block fits in a
        # quarter of the 128 lanes (not with the batched-dW research variant)
        pack4 = dw_mode != "batched" and _pack4_applicable(ws)
    if pack2 is None:
        # auto: pack 2 nodes per row whenever every layer's block fits in
        # half the 128 lanes (not with the batched-dW research variant)
        pack2 = dw_mode != "batched" and _pack2_applicable(ws)
    pack = 4 if pack4 else (2 if pack2 else 1)
    if node_chunk is None:
        # Default: fold ALL nodes into one chunk when the activation
        # working set fits VMEM — zero padding nodes and no chunk loop.
        # (nc=16 pads K=51 -> 64, wasting 25% of every node sweep; the
        # nc=K config measured 26.4 ms vs 30.4 ms per MNIST-config train
        # step, scripts/ab_kernel_bench.py.) Rough working set: one
        # [K*tile_r, 128] f32 buffer per layer plus ~3 temporaries.
        K = nodes.shape[0]
        K = (K + pack - 1) // pack  # node axis counts packed GROUPS
        est = K * tile_r * LANE * 4 * (len(ws) + 3)
        node_chunk = K if est <= 80 * 1024 * 1024 else 16
    return _fused_integral(
        list(ws), list(bs), x, h, (nodes, ccw), tile_r, node_chunk, interpret,
        neg_slope, dw_mode, pack,
    )
