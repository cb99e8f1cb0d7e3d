from concepthash_tpu.config.loader import load_config, save_config, to_dict
from concepthash_tpu.config.registry import instantiate, register, resolve_target

__all__ = [
    "load_config",
    "save_config",
    "to_dict",
    "instantiate",
    "register",
    "resolve_target",
]
