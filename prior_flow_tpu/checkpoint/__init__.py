from .convert import (
    convert_state_dict,
    convert_things_ckpt,
    export_state_dict,
    load_pth,
)

__all__ = ["convert_state_dict", "convert_things_ckpt", "export_state_dict",
           "load_pth"]
