"""VAE model family with normalizing-flow posteriors.

Reference semantics: `models/vae_lib/models/VAE.py` in AWehenkel/UMNN (the
sylvester-flows VAE zoo + the UMNN MMAVAE). Architecture (binary input
type): gated-conv encoder [32,32s2,64,64s2,64,256(k=last)] -> 256-d feature,
linear mean head + Softplus var head; gated-deconv decoder mirroring it with
a sigmoid Bernoulli head (`VAE.py:44-120`). The multinomial variant emits
256-way logits per subpixel. Every ``apply`` is a pure function
``(params, x, rng, ...) -> (x_mean, z_mu, z_var, log_det_j, z0, z_k)`` —
matching the reference's forward contract (`VAE.py:158-170`).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp

from umnn_tpu.models.vae import flows as F
from umnn_tpu.models.vae.layers import (
    conv2d,
    conv_init,
    gated_conv2d,
    gated_conv_init,
    gated_conv_transpose2d,
)
from umnn_tpu.nn.core import Params, torch_linear_init

FEAT_DIM = 256  # encoder feature width (`VAE.py:33`)


def _last_kernel(input_size):
    if list(input_size) in ([1, 28, 28], [3, 28, 28]):
        return (7, 7)
    if list(input_size) == [1, 28, 20]:
        return (7, 5)
    raise ValueError(f"invalid input size {input_size}")


@dataclasses.dataclass(frozen=True)
class VAE:
    """Base VAE: gated conv encoder/decoder, no flow (z_0 = z_k)."""

    z_size: int = 64
    input_size: tuple[int, ...] = (1, 28, 28)
    input_type: str = "binary"  # or "multinomial"

    @property
    def last_kernel_size(self):
        return _last_kernel(self.input_size)

    # --- init ----------------------------------------------------------------

    def _init_encoder(self, key, dtype):
        c = self.input_size[0]
        ks = jax.random.split(key, 8)
        enc = [
            gated_conv_init(ks[0], c, 32, 5, dtype),
            gated_conv_init(ks[1], 32, 32, 5, dtype),
            gated_conv_init(ks[2], 32, 64, 5, dtype),
            gated_conv_init(ks[3], 64, 64, 5, dtype),
            gated_conv_init(ks[4], 64, 64, 5, dtype),
            gated_conv_init(ks[5], 64, FEAT_DIM, self.last_kernel_size, dtype),
        ]
        return {
            "q_z_nn": enc,
            "q_z_mean": torch_linear_init(ks[6], FEAT_DIM, self.z_size, dtype),
            "q_z_var": torch_linear_init(ks[7], FEAT_DIM, self.z_size, dtype),
        }

    def _init_decoder(self, key, dtype):
        c = self.input_size[0]
        ks = jax.random.split(key, 8)
        dec = [
            gated_conv_init(ks[0], self.z_size, 64, self.last_kernel_size, dtype),
            gated_conv_init(ks[1], 64, 64, 5, dtype),
            gated_conv_init(ks[2], 64, 32, 5, dtype),
            gated_conv_init(ks[3], 32, 32, 5, dtype),
            gated_conv_init(ks[4], 32, 32, 5, dtype),
            gated_conv_init(ks[5], 32, 32, 5, dtype),
        ]
        if self.input_type == "binary":
            head = [conv_init(ks[6], 32, c, 1, dtype)]
        else:
            head = [
                conv_init(ks[6], 32, 256, 5, dtype),
                conv_init(ks[7], 256, c * 256, 1, dtype),
            ]
        return {"p_x_nn": dec, "p_x_mean": head}

    def init_base(self, key, dtype=jnp.float32) -> Params:
        ke, kd = jax.random.split(key)
        return {**self._init_encoder(ke, dtype), **self._init_decoder(kd, dtype)}

    def init(self, key, dtype=jnp.float32) -> Params:
        return self.init_base(key, dtype)

    # --- encoder/decoder ------------------------------------------------------

    def encode_features(self, params, x):
        """Gated convnet -> flat 256-d feature (`VAE.py:44-79`)."""
        h = x
        strides = [1, 2, 1, 2, 1, 1]
        pads = [2, 2, 2, 2, 2, 0]
        for p, s, pd in zip(params["q_z_nn"], strides, pads):
            h = gated_conv2d(p, h, stride=s, padding=pd)
        return h.reshape(h.shape[0], -1)

    def encode(self, params, x):
        h = self.encode_features(params, x)
        mean = h @ params["q_z_mean"]["w"] + params["q_z_mean"]["b"]
        var = jax.nn.softplus(h @ params["q_z_var"]["w"] + params["q_z_var"]["b"])
        if self.input_type == "multinomial":
            var = jnp.clip(var, 0.01, 7.0)  # Hardtanh bound (`VAE.py:78`)
        return mean, var

    def decode(self, params, z):
        h = z.reshape(z.shape[0], self.z_size, 1, 1)
        strides = [1, 1, 2, 1, 2, 1]
        pads = [0, 2, 2, 2, 2, 2]
        out_pads = [0, 0, 1, 0, 1, 0]
        for p, s, pd, op in zip(params["p_x_nn"], strides, pads, out_pads):
            h = gated_conv_transpose2d(p, h, stride=s, padding=pd, output_padding=op)
        if self.input_type == "binary":
            logits = conv2d(params["p_x_mean"][0], h, 1, 0)
            return jax.nn.sigmoid(logits)
        h = conv2d(params["p_x_mean"][0], h, 1, 2)
        return conv2d(params["p_x_mean"][1], h, 1, 0)  # raw 256-way logits

    @staticmethod
    def reparameterize(rng, mu, var):
        eps = jax.random.normal(rng, mu.shape, mu.dtype)
        return mu + eps * jnp.sqrt(var)

    def apply(self, params, x, rng):
        z_mu, z_var = self.encode(params, x)
        z = self.reparameterize(rng, z_mu, z_var)
        x_mean = self.decode(params, z)
        ldj = jnp.zeros(x.shape[0], x.dtype)
        return x_mean, z_mu, z_var, ldj, z, z


@dataclasses.dataclass(frozen=True)
class PlanarVAE(VAE):
    """Planar-flow posterior (`VAE.py:173-239`)."""

    num_flows: int = 4

    def init(self, key, dtype=jnp.float32) -> Params:
        kb, ku, kw, kbb = jax.random.split(key, 4)
        params = self.init_base(kb, dtype)
        params["amor_u"] = torch_linear_init(
            ku, FEAT_DIM, self.num_flows * self.z_size, dtype
        )
        params["amor_w"] = torch_linear_init(
            kw, FEAT_DIM, self.num_flows * self.z_size, dtype
        )
        params["amor_b"] = torch_linear_init(kbb, FEAT_DIM, self.num_flows, dtype)
        return params

    def apply(self, params, x, rng):
        B = x.shape[0]
        h = self.encode_features(params, x)
        z_mu = h @ params["q_z_mean"]["w"] + params["q_z_mean"]["b"]
        z_var = jax.nn.softplus(h @ params["q_z_var"]["w"] + params["q_z_var"]["b"])
        u = (h @ params["amor_u"]["w"] + params["amor_u"]["b"]).reshape(
            B, self.num_flows, self.z_size, 1
        )
        w = (h @ params["amor_w"]["w"] + params["amor_w"]["b"]).reshape(
            B, self.num_flows, 1, self.z_size
        )
        b = (h @ params["amor_b"]["w"] + params["amor_b"]["b"]).reshape(
            B, self.num_flows, 1, 1
        )
        z0 = self.reparameterize(rng, z_mu, z_var)
        z, ldj = z0, jnp.zeros(B, x.dtype)
        for k in range(self.num_flows):
            z, ld = F.planar_flow(z, u[:, k], w[:, k], b[:, k])
            ldj = ldj + ld
        return self.decode(params, z), z_mu, z_var, ldj, z0, z


def _amor_sylvester_init(key, num_flows, m, z_size, with_q, q_dim, dtype):
    ks = jax.random.split(key, 5)
    params = {
        "amor_d": torch_linear_init(ks[0], FEAT_DIM, num_flows * m * m, dtype),
        "amor_diag1": torch_linear_init(ks[1], FEAT_DIM, num_flows * m, dtype),
        "amor_diag2": torch_linear_init(ks[2], FEAT_DIM, num_flows * m, dtype),
        "amor_b": torch_linear_init(ks[4], FEAT_DIM, num_flows * m, dtype),
    }
    if with_q:
        params["amor_q"] = torch_linear_init(ks[3], FEAT_DIM, num_flows * q_dim, dtype)
    return params


def _amortize_triangular(params, h, B, m, num_flows, dtype):
    """Shared r1/r2 amortization: strict upper triangles from amor_d, tanh-
    bounded diagonals from amor_diag{1,2} (`VAE.py:360-382`)."""
    full_d = (h @ params["amor_d"]["w"] + params["amor_d"]["b"]).reshape(
        B, m, m, num_flows
    )
    diag1 = jnp.tanh(
        (h @ params["amor_diag1"]["w"] + params["amor_diag1"]["b"]).reshape(
            B, m, num_flows
        )
    )
    diag2 = jnp.tanh(
        (h @ params["amor_diag2"]["w"] + params["amor_diag2"]["b"]).reshape(
            B, m, num_flows
        )
    )
    triu = jnp.triu(jnp.ones((m, m), dtype), k=1)[None, :, :, None]
    eye = jnp.eye(m, dtype=dtype)[None, :, :, None]
    r1 = full_d * triu + eye * diag1[:, :, None, :]
    r2 = jnp.swapaxes(full_d, 1, 2) * triu + eye * diag2[:, :, None, :]
    b = (h @ params["amor_b"]["w"] + params["amor_b"]["b"]).reshape(
        B, 1, m, num_flows
    )
    return r1, r2, b


@dataclasses.dataclass(frozen=True)
class OrthogonalSylvesterVAE(VAE):
    """Sylvester flow with iteratively-orthogonalized Q (`VAE.py:242-411`)."""

    num_flows: int = 4
    num_ortho_vecs: int = 32

    def init(self, key, dtype=jnp.float32) -> Params:
        kb, ka = jax.random.split(key)
        params = self.init_base(kb, dtype)
        params.update(
            _amor_sylvester_init(
                ka,
                self.num_flows,
                self.num_ortho_vecs,
                self.z_size,
                True,
                self.z_size * self.num_ortho_vecs,
                dtype,
            )
        )
        return params

    def apply(self, params, x, rng):
        B = x.shape[0]
        m = self.num_ortho_vecs
        h = self.encode_features(params, x)
        z_mu = h @ params["q_z_mean"]["w"] + params["q_z_mean"]["b"]
        z_var = jax.nn.softplus(h @ params["q_z_var"]["w"] + params["q_z_var"]["b"])
        r1, r2, b = _amortize_triangular(params, h, B, m, self.num_flows, x.dtype)
        q = (h @ params["amor_q"]["w"] + params["amor_q"]["b"]).reshape(
            B * self.num_flows, self.z_size * m
        )
        q_ortho = F.iterative_orthogonalize(q, self.z_size, m).reshape(
            B, self.num_flows, self.z_size, m
        )
        z0 = self.reparameterize(rng, z_mu, z_var)
        z, ldj = z0, jnp.zeros(B, x.dtype)
        for k in range(self.num_flows):
            z, ld = F.sylvester_flow(
                z, r1[..., k], r2[..., k], q_ortho[:, k], b[..., k]
            )
            ldj = ldj + ld
        return self.decode(params, z), z_mu, z_var, ldj, z0, z


@dataclasses.dataclass(frozen=True)
class HouseholderSylvesterVAE(VAE):
    """Sylvester flow with Householder-product Q (`VAE.py:414-565`)."""

    num_flows: int = 4
    num_householder: int = 8

    def init(self, key, dtype=jnp.float32) -> Params:
        kb, ka = jax.random.split(key)
        params = self.init_base(kb, dtype)
        params.update(
            _amor_sylvester_init(
                ka,
                self.num_flows,
                self.z_size,
                self.z_size,
                True,
                self.z_size * self.num_householder,
                dtype,
            )
        )
        return params

    def apply(self, params, x, rng):
        B = x.shape[0]
        m = self.z_size
        h = self.encode_features(params, x)
        z_mu = h @ params["q_z_mean"]["w"] + params["q_z_mean"]["b"]
        z_var = jax.nn.softplus(h @ params["q_z_var"]["w"] + params["q_z_var"]["b"])
        r1, r2, b = _amortize_triangular(params, h, B, m, self.num_flows, x.dtype)
        q = (h @ params["amor_q"]["w"] + params["amor_q"]["b"]).reshape(
            B * self.num_flows, -1
        )
        q_ortho = F.householder_orthogonalize(
            q, self.z_size, self.num_householder
        ).reshape(B, self.num_flows, self.z_size, self.z_size)
        z0 = self.reparameterize(rng, z_mu, z_var)
        z, ldj = z0, jnp.zeros(B, x.dtype)
        for k in range(self.num_flows):
            z, ld = F.sylvester_flow(
                z, r1[..., k], r2[..., k], q_ortho[:, k], b[..., k]
            )
            ldj = ldj + ld
        return self.decode(params, z), z_mu, z_var, ldj, z0, z


@dataclasses.dataclass(frozen=True)
class TriangularSylvesterVAE(VAE):
    """Sylvester flow with alternating identity/reversal Q (`VAE.py:568-682`)."""

    num_flows: int = 4

    def init(self, key, dtype=jnp.float32) -> Params:
        kb, ka = jax.random.split(key)
        params = self.init_base(kb, dtype)
        params.update(
            _amor_sylvester_init(
                ka, self.num_flows, self.z_size, self.z_size, False, 0, dtype
            )
        )
        return params

    def apply(self, params, x, rng):
        B = x.shape[0]
        m = self.z_size
        h = self.encode_features(params, x)
        z_mu = h @ params["q_z_mean"]["w"] + params["q_z_mean"]["b"]
        z_var = jax.nn.softplus(h @ params["q_z_var"]["w"] + params["q_z_var"]["b"])
        r1, r2, b = _amortize_triangular(params, h, B, m, self.num_flows, x.dtype)
        z0 = self.reparameterize(rng, z_mu, z_var)
        z, ldj = z0, jnp.zeros(B, x.dtype)
        for k in range(self.num_flows):
            z, ld = F.triangular_sylvester_flow(
                z, r1[..., k], r2[..., k], b[..., k], permute=(k % 2 == 1)
            )
            ldj = ldj + ld
        return self.decode(params, z), z_mu, z_var, ldj, z0, z


@dataclasses.dataclass(frozen=True)
class IAFVAE(VAE):
    """IAF posterior with encoder context (`VAE.py:685-735`)."""

    num_flows: int = 4
    made_h_size: int = 320

    def __post_init__(self):
        object.__setattr__(
            self,
            "iaf",
            F.IAF(
                z_size=self.z_size,
                num_flows=self.num_flows,
                num_hidden=1,
                h_size=self.made_h_size,
            ),
        )

    def init(self, key, dtype=jnp.float32) -> Params:
        kb, kh, kf = jax.random.split(key, 3)
        params = self.init_base(kb, dtype)
        params["h_context"] = torch_linear_init(kh, FEAT_DIM, self.made_h_size, dtype)
        params["flow"] = self.iaf.init(kf, dtype)
        return params

    def apply(self, params, x, rng):
        h = self.encode_features(params, x)
        z_mu = h @ params["q_z_mean"]["w"] + params["q_z_mean"]["b"]
        z_var = jax.nn.softplus(h @ params["q_z_var"]["w"] + params["q_z_var"]["b"])
        h_context = h @ params["h_context"]["w"] + params["h_context"]["b"]
        z0 = self.reparameterize(rng, z_mu, z_var)
        z_k, ldj = self.iaf.apply(params["flow"], z0, h_context)
        return self.decode(params, z_k), z_mu, z_var, ldj, z0, z_k


@dataclasses.dataclass(frozen=True)
class MMAVAE(VAE):
    """The UMNN-VAE: monotonic masked autoregressive flow posterior
    conditioned on the encoder context (`VAE.py:738-793`)."""

    num_flows: int = 4
    made_h_size: int = 320
    hidden_derivative: tuple[int, ...] = (50, 50, 50, 50)
    hidden_embedding: tuple[int, ...] = (512, 512)
    embedding_size: int = 30
    nb_steps: int = 50
    backend: str = "auto"

    def __post_init__(self):
        object.__setattr__(
            self,
            "mmaf",
            F.MMAF(
                z_size=self.z_size,
                num_flows=self.num_flows,
                h_size=self.made_h_size,
                hidden_derivative=self.hidden_derivative,
                hidden_embedding=self.hidden_embedding,
                embedding_size=self.embedding_size,
                nb_steps=self.nb_steps,
                backend=self.backend,
            ),
        )

    def init(self, key, dtype=jnp.float32) -> Params:
        kb, kh, kf = jax.random.split(key, 3)
        params = self.init_base(kb, dtype)
        params["h_context"] = torch_linear_init(kh, FEAT_DIM, self.made_h_size, dtype)
        params["flow"] = self.mmaf.init(kf, dtype)
        return params

    def apply(self, params, x, rng, nodes=None, weights=None):
        h = self.encode_features(params, x)
        z_mu = h @ params["q_z_mean"]["w"] + params["q_z_mean"]["b"]
        z_var = jax.nn.softplus(h @ params["q_z_var"]["w"] + params["q_z_var"]["b"])
        h_context = h @ params["h_context"]["w"] + params["h_context"]["b"]
        z0 = self.reparameterize(rng, z_mu, z_var)
        z_k, ldj = self.mmaf.apply(params["flow"], z0, h_context, nodes, weights)
        return self.decode(params, z_k), z_mu, z_var, ldj, z0, z_k

    def force_lipschitz(self, params, key, L=1.5):
        new_flow = self.mmaf.force_lipschitz(params["flow"], key, L)
        return {**params, "flow": new_flow}


VAE_FAMILIES = {
    "no_flow": VAE,
    "planar": PlanarVAE,
    "orthogonal": OrthogonalSylvesterVAE,
    "householder": HouseholderSylvesterVAE,
    "triangular": TriangularSylvesterVAE,
    "iaf": IAFVAE,
    "MMAF": MMAVAE,
}
