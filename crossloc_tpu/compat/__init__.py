"""Reference interop: torch `.net` checkpoints + output-dir naming grammar."""
from .naming import finetune_output_name, read_meta_info, train_output_name
from .torch_import import (
    extract_submodule,
    load_net,
    params_to_torch_state,
    save_net,
    torch_state_to_params,
    transpose_net_key_map,
    vanilla_net_key_map,
)

__all__ = [
    "extract_submodule",
    "finetune_output_name",
    "load_net",
    "params_to_torch_state",
    "read_meta_info",
    "save_net",
    "torch_state_to_params",
    "train_output_name",
    "transpose_net_key_map",
    "vanilla_net_key_map",
]
