"""Amortized normalizing-flow building blocks for VAE posteriors.

Reference semantics: `models/vae_lib/models/flows.py` in AWehenkel/UMNN
(the sylvester-flows zoo plus the UMNN MMAF). All transforms here are pure
functions of amortized parameters (no parameters of their own except IAF and
MMAF); they return ``(z_next, log_det_jacobian)``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from umnn_tpu.models.flow import UMNNMAFFlow
from umnn_tpu.models.vae.layers import (
    build_block_mask,
    masked_linear,
    masked_linear_init,
)
from umnn_tpu.nn.core import Params


def planar_flow(z, u, w, b):
    """z' = z + u_hat * tanh(w^T z + b) with the invertibility reparam of u
    (`flows.py:36-68`). Shapes: z [B,Z], u [B,Z,1], w [B,1,Z], b [B,1,1]."""
    zk = z[..., None]  # [B, Z, 1]
    uw = jnp.einsum("bij,bjk->bik", w, u)  # [B,1,1]
    m_uw = -1.0 + jax.nn.softplus(uw)
    w_norm_sq = jnp.sum(w**2, axis=2, keepdims=True)
    u_hat = u + (m_uw - uw) * jnp.swapaxes(w, 1, 2) / w_norm_sq
    wzb = jnp.einsum("bij,bjk->bik", w, zk) + b  # [B,1,1]
    z_next = (zk + u_hat * jnp.tanh(wzb))[..., 0]
    psi = w * (1 - jnp.tanh(wzb) ** 2)  # [B,1,Z]
    log_det = jnp.log(
        jnp.abs(1.0 + jnp.einsum("bij,bjk->bik", psi, u_hat))
    )[:, 0, 0]
    return z_next, log_det


def sylvester_flow(z, r1, r2, q_ortho, b):
    """z' = z + Q r1 tanh(r2 Q^T z + b) (`flows.py:97-141`).

    Shapes: z [B,Z], r1/r2 [B,M,M] upper-triangular, q_ortho [B,Z,M],
    b [B,1,M]. Invertibility needs diag(r1)*diag(r2)*tanh' > -1 (the
    amortization tanh-bounds the diagonals upstream).
    """
    zk = z[:, None, :]  # [B,1,Z]
    diag_r1 = jnp.diagonal(r1, axis1=1, axis2=2)
    diag_r2 = jnp.diagonal(r2, axis1=1, axis2=2)
    qr2 = jnp.einsum("bzm,bnm->bzn", q_ortho, r2)  # Q r2^T : [B,Z,M]
    qr1 = jnp.einsum("bzm,bmn->bzn", q_ortho, r1)  # Q r1   : [B,Z,M]
    r2qzb = jnp.einsum("bij,bjm->bim", zk, qr2) + b  # [B,1,M]
    z_next = (jnp.einsum("bim,bzm->biz", jnp.tanh(r2qzb), qr1) + zk)[:, 0, :]
    diag_j = 1.0 + (1 - jnp.tanh(r2qzb[:, 0, :]) ** 2) * diag_r1 * diag_r2
    log_det = jnp.sum(jnp.log(jnp.abs(diag_j)), axis=-1)
    return z_next, log_det


def triangular_sylvester_flow(z, r1, r2, b, permute: bool):
    """Sylvester flow with Q = identity or the reversal permutation
    (`flows.py:169-220`)."""
    zk = z[:, None, :]
    diag_r1 = jnp.diagonal(r1, axis1=1, axis2=2)
    diag_r2 = jnp.diagonal(r2, axis1=1, axis2=2)
    z_per = jnp.flip(zk, axis=-1) if permute else zk
    r2qzb = jnp.einsum("bij,bmj->bim", z_per, r2) + b  # z r2^T + b : [B,1,Z]
    zn = jnp.einsum("bim,bzm->biz", jnp.tanh(r2qzb), r1)
    if permute:
        zn = jnp.flip(zn, axis=-1)
    z_next = (zn + zk)[:, 0, :]
    diag_j = 1.0 + (1 - jnp.tanh(r2qzb[:, 0, :]) ** 2) * diag_r1 * diag_r2
    log_det = jnp.sum(jnp.log(jnp.abs(diag_j)), axis=-1)
    return z_next, log_det


def householder_orthogonalize(q: jax.Array, z_size: int, num_householder: int):
    """Product of Householder reflections H = prod_k (I - 2 v_k v_k^T)
    (`VAE.py:470-498`). q: [B, num_householder * z_size] -> [B, Z, Z]."""
    v = q.reshape(-1, num_householder, z_size)
    v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    eye = jnp.eye(z_size, dtype=q.dtype)
    amat = eye[None, None] - 2.0 * v[..., :, None] * v[..., None, :]

    def body(carry, m):
        return jnp.einsum("bij,bjk->bik", m, carry), None

    out, _ = jax.lax.scan(
        body, amat[:, 0], jnp.moveaxis(amat[:, 1:], 1, 0)
    )
    return out


def iterative_orthogonalize(q: jax.Array, z_size: int, num_ortho_vecs: int, steps: int = 30):
    """Bjorck-style iterative orthogonalization A <- A(I + 0.5(I - A^T A))
    (`VAE.py:304-346`). The reference loops to tolerance 1e-5/1e-6 with a
    break; on TPU we run a fixed (sufficient) step count — the iteration
    converges quadratically for ||A|| <= 1 (guaranteed by the pre-scaling)."""
    norm = jnp.linalg.norm(q, axis=-1, keepdims=True)
    amat = (q / norm).reshape(-1, z_size, num_ortho_vecs)
    eye = jnp.eye(num_ortho_vecs, dtype=q.dtype)

    def body(a, _):
        tmp = eye[None] + 0.5 * (eye[None] - jnp.einsum("bzm,bzn->bmn", a, a))
        return jnp.einsum("bzm,bmn->bzn", a, tmp), None

    amat, _ = jax.lax.scan(body, amat, None, length=steps)
    return amat


# --- IAF (`flows.py:227-302`) -------------------------------------------------


@dataclasses.dataclass(frozen=True)
class IAF:
    """MADE-layer inverse autoregressive flow with sigmoid gating
    z <- sigma(s) * z + (1 - sigma(s)) * m."""

    z_size: int
    num_flows: int = 2
    num_hidden: int = 1
    h_size: int = 50
    forget_bias: float = 1.0

    def __post_init__(self):
        object.__setattr__(
            self, "_mask_in", jnp.asarray(build_block_mask(self.z_size, self.h_size))
        )
        object.__setattr__(
            self, "_mask_hid", jnp.asarray(build_block_mask(self.h_size, self.h_size))
        )
        object.__setattr__(
            self,
            "_mask_out",
            jnp.asarray(build_block_mask(self.h_size, self.z_size, diagonal_zeros=True)),
        )

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        flows = []
        for k in range(self.num_flows):
            kk = jax.random.fold_in(key, k)
            ks = jax.random.split(kk, 3 + self.num_hidden)
            flows.append(
                {
                    "z_feat": masked_linear_init(ks[0], self.z_size, self.h_size, dtype),
                    "zh_feats": [
                        masked_linear_init(ks[1 + j], self.h_size, self.h_size, dtype)
                        for j in range(self.num_hidden)
                    ],
                    "mean": masked_linear_init(ks[-2], self.h_size, self.z_size, dtype),
                    "std": masked_linear_init(ks[-1], self.h_size, self.z_size, dtype),
                }
            )
        return {"flows": flows}

    def apply(self, params: Params, z: jax.Array, h_context: jax.Array):
        log_dets = jnp.zeros(z.shape[0], z.dtype)
        for i, fp in enumerate(params["flows"]):
            if (i + 1) % 2 == 0:
                z = jnp.flip(z, axis=-1)  # reorder to help mixing
            h = jax.nn.elu(masked_linear(fp["z_feat"], self._mask_in, z))
            h = h + h_context
            for hp in fp["zh_feats"]:
                h = jax.nn.elu(masked_linear(hp, self._mask_hid, h))
            mean = masked_linear(fp["mean"], self._mask_out, h)
            gate = jax.nn.sigmoid(
                masked_linear(fp["std"], self._mask_out, h) + self.forget_bias
            )
            z = gate * z + (1 - gate) * mean
            log_dets = log_dets + jnp.sum(jnp.log(gate), axis=-1)
        return z, log_dets


# --- MMAF: the UMNN flow as a VAE posterior (`flows.py:305-327`) ---------------


@dataclasses.dataclass(frozen=True)
class MMAF:
    """UMNNMAFFlow conditioned on the encoder context (cond_in = h_size).

    ``apply`` returns (z_k, per-dim log-det summed) via compute_log_jac_bis.
    Randomized steps (steps == 0) are supported by passing padded
    nodes/weights at call time instead of mutating module state
    (`flows.py:319-321`).
    """

    z_size: int
    num_flows: int = 2
    h_size: int = 50
    hidden_derivative: tuple[int, ...] = (50, 50, 50, 50)
    hidden_embedding: tuple[int, ...] = (512, 512)
    embedding_size: int = 30
    nb_steps: int = 50
    solver: str = "CCParallel"
    backend: str = "auto"

    def __post_init__(self):
        flow = UMNNMAFFlow(
            nb_flow=self.num_flows,
            nb_in=self.z_size,
            hidden_derivative=self.hidden_derivative,
            hidden_embedding=self.hidden_embedding,
            embedding_s=self.embedding_size,
            nb_steps=self.nb_steps or 50,
            solver=self.solver,
            cond_in=self.h_size,
            backend=self.backend,
        )
        object.__setattr__(self, "flow", flow)

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        return self.flow.init(key, dtype)

    def apply(self, params, z, h_context, nodes=None, weights=None):
        z_k, log_jac = self.flow.compute_log_jac_bis(
            params, z, context=h_context, nodes=nodes, weights=weights
        )
        return z_k, jnp.sum(log_jac, axis=-1)

    def force_lipschitz(self, params, key, L=1.5):
        if L > 0:
            return self.flow.force_lipschitz(params, key, L)
        return params
