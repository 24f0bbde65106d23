from umnn_tpu.data.toy import TOY_DATASETS, inf_train_gen
from umnn_tpu.data.uci import UCI_DIMS, TabularData, load_uci, uci_available
from umnn_tpu.data.images import (
    FlowImageData,
    VAEImageData,
    add_uniform_noise_and_logit,
    load_mnist_flow,
    load_vae_dataset,
    logit_back,
)

__all__ = [
    "TOY_DATASETS",
    "inf_train_gen",
    "UCI_DIMS",
    "TabularData",
    "load_uci",
    "uci_available",
    "FlowImageData",
    "VAEImageData",
    "add_uniform_noise_and_logit",
    "load_mnist_flow",
    "load_vae_dataset",
    "logit_back",
]
