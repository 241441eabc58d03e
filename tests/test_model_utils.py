"""Model utility tests (parity: baseline/model_utils.py capabilities)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mlio_tpu.models import forward, get_spec, init_params
from mlio_tpu.models.utils import (
    convert_precision,
    count_macs,
    find_params,
    get_attention_params,
    get_mlp_params,
    get_model_size,
    load_partial_state,
    model_summary,
    theoretical_flops,
)


@pytest.fixture(scope="module")
def model():
    spec = get_spec("llama-tiny")
    return spec, init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)


def test_model_size(model):
    spec, params = model
    size = get_model_size(params)
    assert size["num_params"] > 0
    assert size["total_bytes"] == size["num_params"] * 4  # all fp32
    # spec-level estimate within 5% of materialized count
    assert abs(size["num_params"] - spec.num_params()) / size["num_params"] < 0.05


def test_param_discovery(model):
    spec, params = model
    attn = get_attention_params(params)
    assert any("wq" in k for k in attn)
    mlp = get_mlp_params(params)
    assert any("w_gate" in k for k in mlp)
    lns = find_params(params, lambda n: "ln1_scale" in n)
    assert len(lns) == 1


def test_convert_precision(model):
    spec, params = model
    bf = convert_precision(params, jnp.bfloat16)
    assert bf["tok_embed"].dtype == jnp.bfloat16
    # quantized leaves keep their payload dtype
    from mlio_tpu.runtime import quantize_params

    q = quantize_params(params, spec, "int8")
    q16 = convert_precision(q, jnp.bfloat16)
    assert q16["blocks"]["wq"].q.dtype == jnp.int8


def test_theoretical_flops_and_macs(model):
    spec, _ = model
    f = theoretical_flops(spec, batch=2, seq_len=64)
    assert f["total_flops"] > 0
    assert f["mlp_flops"] > f["projection_flops"] * 0.5
    assert count_macs(spec, 2, 64) == f["total_flops"] / 2
    fd = theoretical_flops(spec, batch=2, seq_len=64, decode=True)
    assert fd["total_flops"] < f["total_flops"]


def test_model_summary(model):
    spec, params = model
    s = model_summary(spec, params)
    assert "llama-tiny" in s and "materialized" in s


def test_load_partial_state(model):
    spec, params = model
    new_embed = np.ones_like(np.asarray(params["tok_embed"]))
    updated, loaded, missing = load_partial_state(
        params, {"tok_embed": new_embed, "nonexistent/path": new_embed})
    assert "tok_embed" in loaded
    assert "nonexistent/path" in missing
    assert float(updated["tok_embed"][0, 0]) == 1.0
    # strict mode raises on unknown keys
    with pytest.raises(ValueError):
        load_partial_state(params, {"bogus": new_embed}, strict=True)
    # model still runs with the updated params
    ids = jnp.zeros((1, 4), jnp.int32)
    logits, _ = forward(updated, spec, ids)
    assert np.isfinite(np.asarray(logits)).all()
