from umnn_tpu.models.monotonic import IntegrandNN, MonotonicNN
from umnn_tpu.models.umnn_maf import EmbeddingNetwork, IntegrandNetwork, UMNNMAF
from umnn_tpu.models.flow import UMNNMAFFlow

__all__ = [
    "IntegrandNN",
    "MonotonicNN",
    "EmbeddingNetwork",
    "IntegrandNetwork",
    "UMNNMAF",
    "UMNNMAFFlow",
]
