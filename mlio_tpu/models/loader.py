"""HF checkpoint → JAX pytree conversion and model registry.

Replaces the reference's loader stack (/root/reference/baseline/
model_loader.py:14-510: BaseModelLoader, HuggingFaceModelLoader,
CustomModelLoader, regex ModelRegistry). The TPU-native difference: instead
of keeping a live torch module and mutating it, we convert the weights ONCE
into this framework's stacked-layer pytree (models/transformer.py) and the
torch object is never touched again. Works fully offline from a local
directory (safetensors / pytorch_model.bin) or from an in-memory
``transformers`` model (used by the parity tests).
"""
from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Any, Callable, Dict, Optional

import numpy as np
import jax.numpy as jnp

from mlio_tpu.models.spec import ModelSpec, PRESETS, get_spec

StateDict = Dict[str, np.ndarray]


# ---------------------------------------------------------------------------
# State-dict acquisition (offline)
# ---------------------------------------------------------------------------

def state_dict_from_torch(model) -> StateDict:
    """Pull a numpy state dict out of a live torch module (no copy of the
    framework keeps the torch object alive)."""
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}


def state_dict_from_dir(path: Path) -> StateDict:
    """Load all weights from a local HF checkpoint directory."""
    path = Path(path)
    sd: StateDict = {}
    safetensor_files = sorted(path.glob("*.safetensors"))
    if safetensor_files:
        from safetensors.numpy import load_file

        for f in safetensor_files:
            sd.update(load_file(str(f)))
        return sd
    bin_files = sorted(path.glob("pytorch_model*.bin")) + sorted(path.glob("*.pt"))
    if bin_files:
        import torch

        for f in bin_files:
            loaded = torch.load(f, map_location="cpu", weights_only=True)
            if hasattr(loaded, "state_dict"):
                loaded = loaded.state_dict()
            sd.update({k: v.numpy() for k, v in loaded.items()})
        return sd
    raise FileNotFoundError(f"no weights (*.safetensors / pytorch_model*.bin) in {path}")


# ---------------------------------------------------------------------------
# Spec derivation from HF config
# ---------------------------------------------------------------------------

def spec_from_hf_config(cfg: Any, name: str = "custom") -> ModelSpec:
    """Derive a ModelSpec from an HF config object or dict (parity:
    get_model_config model_loader.py:156-254)."""
    get = (lambda k, d=None: cfg.get(k, d)) if isinstance(cfg, dict) else (
        lambda k, d=None: getattr(cfg, k, d))
    model_type = get("model_type", "gpt2")
    if model_type == "gpt2":
        h = get("n_embd")
        return ModelSpec(
            name=name, vocab_size=get("vocab_size"), hidden_size=h,
            num_layers=get("n_layer"), num_heads=get("n_head"),
            num_kv_heads=get("n_head"),
            intermediate_size=get("n_inner") or 4 * h,
            max_seq_len=get("n_positions", 1024),
            activation="gelu_new", norm="layernorm",
            norm_eps=get("layer_norm_epsilon", 1e-5),
            positional="learned", tie_embeddings=True)
    if model_type in ("llama", "mistral"):
        heads = get("num_attention_heads")
        return ModelSpec(
            name=name, vocab_size=get("vocab_size"),
            hidden_size=get("hidden_size"), num_layers=get("num_hidden_layers"),
            num_heads=heads, num_kv_heads=get("num_key_value_heads") or heads,
            intermediate_size=get("intermediate_size"),
            max_seq_len=get("max_position_embeddings", 4096),
            activation="swiglu", norm="rmsnorm",
            norm_eps=get("rms_norm_eps", 1e-5), positional="rope",
            rope_theta=get("rope_theta", 10000.0),
            use_qkv_bias=False, use_mlp_bias=False, use_out_bias=False,
            tie_embeddings=bool(get("tie_word_embeddings", False)))
    raise ValueError(f"unsupported HF model_type '{model_type}'")


# ---------------------------------------------------------------------------
# Conversion (per architecture family)
# ---------------------------------------------------------------------------

def _stack(sd: StateDict, fmt: str, num_layers: int, transform=None) -> Optional[jnp.ndarray]:
    key0 = fmt.format(0)
    if key0 not in sd:
        return None
    arrs = []
    for i in range(num_layers):
        a = np.asarray(sd[fmt.format(i)])
        if transform is not None:
            a = transform(a)
        arrs.append(a)
    return jnp.asarray(np.stack(arrs))


def convert_gpt2(sd: StateDict, spec: ModelSpec, dtype=jnp.float32) -> Dict[str, Any]:
    """GPT-2 state dict → pytree. HF GPT-2 uses Conv1D ([in, out] weight
    layout — matches ours directly) with a fused c_attn [H, 3H] that we split
    into q/k/v (the split the reference does at conversion time,
    flash_attention.py:1050-1110)."""
    # Keys may or may not carry the "transformer." prefix.
    prefix = "transformer." if any(k.startswith("transformer.") for k in sd) else ""
    L, H = spec.num_layers, spec.hidden_size

    def g(key):
        return np.asarray(sd[prefix + key])

    def stack(fmt, transform=None):
        return _stack({k: v for k, v in sd.items()}, prefix + fmt, L, transform)

    qkv_w = np.stack([g(f"h.{i}.attn.c_attn.weight") for i in range(L)])  # [L, H, 3H]
    qkv_b = np.stack([g(f"h.{i}.attn.c_attn.bias") for i in range(L)])  # [L, 3H]
    wq, wk, wv = np.split(qkv_w, 3, axis=2)
    bq, bk, bv = np.split(qkv_b, 3, axis=1)

    def J(x):
        return jnp.asarray(x, dtype=dtype)

    blocks = {
        "ln1_scale": J(np.stack([g(f"h.{i}.ln_1.weight") for i in range(L)])),
        "ln1_bias": J(np.stack([g(f"h.{i}.ln_1.bias") for i in range(L)])),
        "wq": J(wq), "bq": J(bq), "wk": J(wk), "bk": J(bk), "wv": J(wv), "bv": J(bv),
        "wo": J(np.stack([g(f"h.{i}.attn.c_proj.weight") for i in range(L)])),
        "bo": J(np.stack([g(f"h.{i}.attn.c_proj.bias") for i in range(L)])),
        "ln2_scale": J(np.stack([g(f"h.{i}.ln_2.weight") for i in range(L)])),
        "ln2_bias": J(np.stack([g(f"h.{i}.ln_2.bias") for i in range(L)])),
        "w_up": J(np.stack([g(f"h.{i}.mlp.c_fc.weight") for i in range(L)])),
        "b_up": J(np.stack([g(f"h.{i}.mlp.c_fc.bias") for i in range(L)])),
        "w_gate": None, "b_gate": None,
        "w_down": J(np.stack([g(f"h.{i}.mlp.c_proj.weight") for i in range(L)])),
        "b_down": J(np.stack([g(f"h.{i}.mlp.c_proj.bias") for i in range(L)])),
    }
    return {
        "tok_embed": J(g("wte.weight")),
        "pos_embed": J(g("wpe.weight")),
        "blocks": blocks,
        "final_scale": J(g("ln_f.weight")),
        "final_bias": J(g("ln_f.bias")),
        "lm_head": None,  # GPT-2 ties lm_head to wte
    }


def convert_llama(sd: StateDict, spec: ModelSpec, dtype=jnp.float32) -> Dict[str, Any]:
    """Llama/Mistral state dict → pytree. torch Linear stores [out, in]; we
    transpose to [in, out] once here so the forward is a plain x @ W."""
    prefix = "model." if any(k.startswith("model.") for k in sd) else ""
    L = spec.num_layers

    def g(key):
        return np.asarray(sd[prefix + key])

    def J(x):
        return jnp.asarray(x, dtype=dtype)

    def lin(fmt):
        return J(np.stack([g(fmt.format(i)).T for i in range(L)]))

    blocks = {
        "ln1_scale": J(np.stack([g(f"layers.{i}.input_layernorm.weight") for i in range(L)])),
        "ln1_bias": None,
        "wq": lin("layers.{}.self_attn.q_proj.weight"),
        "bq": None,
        "wk": lin("layers.{}.self_attn.k_proj.weight"),
        "bk": None,
        "wv": lin("layers.{}.self_attn.v_proj.weight"),
        "bv": None,
        "wo": lin("layers.{}.self_attn.o_proj.weight"),
        "bo": None,
        "ln2_scale": J(np.stack([g(f"layers.{i}.post_attention_layernorm.weight") for i in range(L)])),
        "ln2_bias": None,
        "w_up": lin("layers.{}.mlp.up_proj.weight"),
        "b_up": None,
        "w_gate": lin("layers.{}.mlp.gate_proj.weight"),
        "b_gate": None,
        "w_down": lin("layers.{}.mlp.down_proj.weight"),
        "b_down": None,
    }
    if spec.tie_embeddings or "lm_head.weight" not in sd:
        lm_head = None
    else:
        lm_head = J(np.asarray(sd["lm_head.weight"]).T)
    return {
        "tok_embed": J(g("embed_tokens.weight")),
        "pos_embed": None,
        "blocks": blocks,
        "final_scale": J(g("norm.weight")),
        "final_bias": None,
        "lm_head": lm_head,
    }


# ---------------------------------------------------------------------------
# Registry (parity: ModelRegistry model_loader.py:466-502)
# ---------------------------------------------------------------------------

class ModelRegistry:
    """Regex-pattern registry mapping model names to converters."""

    def __init__(self):
        self._entries = []  # (pattern, converter)

    def register(self, pattern: str, converter: Callable):
        self._entries.append((re.compile(pattern), converter))

    def get_converter(self, name: str) -> Callable:
        for pattern, conv in self._entries:
            if pattern.match(name):
                return conv
        raise KeyError(f"no converter registered for model '{name}'")


model_registry = ModelRegistry()
model_registry.register(r"gpt2.*", convert_gpt2)
model_registry.register(r".*llama.*", convert_llama)
model_registry.register(r".*mistral.*", convert_llama)


def load_model(
    name_or_path: str,
    *,
    dtype=jnp.bfloat16,
    torch_model=None,
    spec: Optional[ModelSpec] = None,
):
    """Load a model by preset name, local checkpoint dir, or torch module.

    Returns ``(spec, params)``. Parity: load_model model_loader.py:466-510
    minus the network path (this environment is offline; checkpoints must be
    local).
    """
    path = Path(name_or_path)
    if torch_model is not None:
        sd = state_dict_from_torch(torch_model)
        if spec is None:
            spec = spec_from_hf_config(torch_model.config, name=name_or_path)
    elif path.is_dir():
        sd = state_dict_from_dir(path)
        cfg_file = path / "config.json"
        if spec is None:
            if not cfg_file.exists():
                raise FileNotFoundError(f"no config.json in {path}; pass spec=")
            spec = spec_from_hf_config(json.loads(cfg_file.read_text()),
                                       name=path.name)
    else:
        # Preset name without weights → random init (useful for benchmarks).
        import jax

        spec = spec or get_spec(name_or_path)
        from mlio_tpu.models.transformer import init_params

        return spec, init_params(spec, jax.random.PRNGKey(0), dtype=dtype)

    try:
        converter = model_registry.get_converter(name_or_path)
    except KeyError:
        # Fall back on architecture: learned positions + LayerNorm = GPT-2
        # family layout, otherwise the Llama-style layout.
        converter = convert_gpt2 if spec.positional == "learned" else convert_llama
    params = converter(sd, spec, dtype=dtype)
    return spec, params
