from deepaco_tpu.models.gnn import EmbNet, Net, ParNet
from deepaco_tpu.models.torch_compat import (
    load_reference_checkpoint,
    torch_state_dict_to_flax,
)

__all__ = [
    "EmbNet",
    "Net",
    "ParNet",
    "load_reference_checkpoint",
    "torch_state_dict_to_flax",
]
