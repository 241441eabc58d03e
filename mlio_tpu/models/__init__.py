from mlio_tpu.models.spec import ModelSpec, PRESETS, get_spec
from mlio_tpu.models.transformer import Impl, forward, init_params, apply_rope, rope_cos_sin
from mlio_tpu.models.loader import (
    load_model,
    model_registry,
    spec_from_hf_config,
    state_dict_from_dir,
    state_dict_from_torch,
)

__all__ = [
    "ModelSpec",
    "PRESETS",
    "get_spec",
    "Impl",
    "forward",
    "init_params",
    "apply_rope",
    "rope_cos_sin",
    "load_model",
    "model_registry",
    "spec_from_hf_config",
    "state_dict_from_dir",
    "state_dict_from_torch",
]
