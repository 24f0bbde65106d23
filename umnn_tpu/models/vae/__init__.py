from umnn_tpu.models.vae.vae import (
    VAE,
    VAE_FAMILIES,
    HouseholderSylvesterVAE,
    IAFVAE,
    MMAVAE,
    OrthogonalSylvesterVAE,
    PlanarVAE,
    TriangularSylvesterVAE,
)
from umnn_tpu.models.vae.losses import calculate_loss, calculate_loss_array
from umnn_tpu.models.vae.iwae import calculate_likelihood

__all__ = [
    "VAE",
    "VAE_FAMILIES",
    "PlanarVAE",
    "OrthogonalSylvesterVAE",
    "HouseholderSylvesterVAE",
    "TriangularSylvesterVAE",
    "IAFVAE",
    "MMAVAE",
    "calculate_loss",
    "calculate_loss_array",
    "calculate_likelihood",
]
