from umnn_tpu.nn.core import (
    ACTIVATIONS,
    count_params,
    dense_apply,
    elu_plus,
    mlp_apply,
    mlp_init,
    torch_linear_init,
)
from umnn_tpu.nn.made import MADE, ConditionalMADE, build_made_masks

__all__ = [
    "ACTIVATIONS",
    "count_params",
    "dense_apply",
    "elu_plus",
    "mlp_apply",
    "mlp_init",
    "torch_linear_init",
    "MADE",
    "ConditionalMADE",
    "build_made_masks",
]
