from .torch_ckpt import (params_from_torch_state_dict,
                         params_to_torch_state_dict, load_torch_checkpoint,
                         save_checkpoint)
from .checkpoint import (getCheckpointData, get_checkpoint_data, loadArgs,
                         load_args, save_logs, save_args)

__all__ = [
    "params_from_torch_state_dict", "params_to_torch_state_dict",
    "load_torch_checkpoint", "save_checkpoint", "getCheckpointData",
    "get_checkpoint_data", "loadArgs", "load_args", "save_logs", "save_args",
]
