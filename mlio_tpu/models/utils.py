"""Model utilities: size/FLOPs accounting, summaries, precision, partial load.

Rebuild of /root/reference/baseline/model_utils.py (758 LoC) for the pytree
model. The reference's module-discovery helpers (find attention/MLP modules
:76-154, module search :455) become pytree-path queries; the monkeypatch
`add_paged_attention_to_model` (:600-759) has no equivalent because paged
attention is a first-class forward here (runtime/paged_forward.py).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mlio_tpu.models.spec import ModelSpec


def get_model_size(params) -> Dict[str, Any]:
    """Param count + bytes (parity: get_model_size model_utils.py:18-74)."""
    leaves = jax.tree_util.tree_leaves(params)
    count = sum(int(l.size) for l in leaves)
    by_dtype: Dict[str, int] = {}
    total_bytes = 0
    for l in leaves:
        b = int(l.size) * l.dtype.itemsize
        total_bytes += b
        by_dtype[str(l.dtype)] = by_dtype.get(str(l.dtype), 0) + b
    return {"num_params": count, "total_bytes": total_bytes,
            "bytes_by_dtype": by_dtype,
            "total_gb": total_bytes / 1e9}


def find_params(params, predicate: Callable[[str], bool]) -> Dict[str, Any]:
    """Pytree-path search (parity: find_modules model_utils.py:455-468)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {}
    for path, leaf in flat:
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        if predicate(name):
            out[name] = leaf
    return out


def get_attention_params(params) -> Dict[str, Any]:
    """(parity: find_attention_layers model_utils.py:116-152)."""
    return find_params(params, lambda n: any(
        k in n for k in ("wq", "wk", "wv", "wo", "bq", "bk", "bv", "bo")))


def get_mlp_params(params) -> Dict[str, Any]:
    """(parity: find_mlp_layers model_utils.py:154-210)."""
    return find_params(params, lambda n: any(
        k in n for k in ("w_up", "w_down", "w_gate", "b_up", "b_down")))


def convert_precision(params, dtype) -> Any:
    """(parity: convert_model_precision model_utils.py:212-261). QTensor
    leaves keep their quantized payloads; only float leaves convert."""
    def conv(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(conv, params)


def theoretical_flops(spec: ModelSpec, batch: int, seq_len: int,
                      *, decode: bool = False) -> Dict[str, float]:
    """Analytic FLOPs (parity: the hook-based estimator
    model_utils.py:263-388, computed in closed form instead of via hooks)."""
    h, i, L = spec.hidden_size, spec.intermediate_size, spec.num_layers
    tokens = batch * (1 if decode else seq_len)
    ctx = seq_len
    proj = 2 * tokens * h * (spec.q_dim + 2 * spec.kv_dim + spec.q_dim)
    attn = 4 * tokens * ctx * spec.q_dim * (0.5 if not decode else 1.0)
    mlp = 2 * tokens * h * i * (3 if spec.activation == "swiglu" else 2)
    head = 2 * tokens * h * spec.vocab_size
    total = L * (proj + attn + mlp) + head
    return {"projection_flops": L * proj, "attention_flops": L * attn,
            "mlp_flops": L * mlp, "lm_head_flops": head,
            "total_flops": total}


def count_macs(spec: ModelSpec, batch: int, seq_len: int) -> float:
    """(parity: MAC counter model_utils.py:470-523)."""
    return theoretical_flops(spec, batch, seq_len)["total_flops"] / 2


def model_summary(spec: ModelSpec, params=None) -> str:
    """(parity: model summary model_utils.py:390-453)."""
    lines = [
        f"Model: {spec.name}",
        f"  layers={spec.num_layers} hidden={spec.hidden_size} "
        f"heads={spec.num_heads} kv_heads={spec.num_kv_heads} "
        f"head_dim={spec.head_size}",
        f"  intermediate={spec.intermediate_size} act={spec.activation} "
        f"norm={spec.norm} pos={spec.positional}",
        f"  vocab={spec.vocab_size} max_seq={spec.max_seq_len} "
        f"params≈{spec.num_params() / 1e6:.1f}M",
    ]
    if params is not None:
        size = get_model_size(params)
        lines.append(f"  materialized: {size['num_params'] / 1e6:.1f}M params, "
                     f"{size['total_gb']:.2f} GB "
                     f"({', '.join(f'{k}:{v/1e6:.0f}MB' for k, v in size['bytes_by_dtype'].items())})")
    return "\n".join(lines)


def load_partial_state(params, updates: Dict[str, Any],
                       strict: bool = False) -> Tuple[Any, List[str], List[str]]:
    """Partial parameter load with diagnostics
    (parity: partial state-dict load model_utils.py:525-570).

    ``updates`` maps pytree paths ("blocks/wq", "tok_embed", ...) to arrays.
    Returns (new_params, loaded_paths, missing_paths).
    """
    flat = jax.tree_util.tree_flatten_with_path(params)
    loaded, missing = [], []

    def path_str(path):
        return "/".join(str(getattr(p, "key", p)) for p in path)

    new_leaves = []
    seen = set()
    for path, leaf in flat[0]:
        name = path_str(path)
        if name in updates:
            arr = jnp.asarray(updates[name])
            if arr.shape != leaf.shape:
                if strict:
                    raise ValueError(f"shape mismatch for {name}: "
                                     f"{arr.shape} vs {leaf.shape}")
                missing.append(name)
                new_leaves.append(leaf)
                continue
            new_leaves.append(arr.astype(leaf.dtype))
            loaded.append(name)
            seen.add(name)
        else:
            new_leaves.append(leaf)
    unknown = [k for k in updates if k not in seen and k not in missing]
    if strict and unknown:
        raise ValueError(f"unknown parameter paths: {unknown}")
    new_params = jax.tree_util.tree_unflatten(flat[1], new_leaves)
    return new_params, loaded, missing + unknown
