from deepaco_tpu.models.gnn import EdgeBlock, EmbNet, Net, ParNet, TorchBatchNorm
from deepaco_tpu.models.transformer import (
    TransformerModel,
    load_transformer_checkpoint,
)
from deepaco_tpu.models.torch_compat import (
    load_reference_checkpoint,
    torch_state_dict_to_flax,
)

__all__ = [
    "EdgeBlock",
    "EmbNet",
    "TorchBatchNorm",
    "TransformerModel",
    "load_transformer_checkpoint",
    "Net",
    "ParNet",
    "load_reference_checkpoint",
    "torch_state_dict_to_flax",
]
