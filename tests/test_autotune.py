"""Autotune table mechanics + integration with the flash wrapper.

Parity target: the reference's @triton.autotune config cache
(/root/reference/kernels/triton/flash_attention_kernels.py:39-52); here the
tuned choices live in a persistent shape-class table consulted at trace time.
"""
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlio_tpu.ops import autotune
from mlio_tpu.ops.flash_attention import flash_attention
from mlio_tpu.ops.reference import attention_reference


def test_shape_class_buckets():
    a = autotune.shape_class("flash_fwd", 2048, 2048, 128, "bfloat16",
                             True, False)
    b = autotune.shape_class("flash_fwd", 1500, 2000, 128, "bfloat16",
                             True, False)
    assert a == b  # same pow2 buckets
    c = autotune.shape_class("flash_fwd", 4096, 4096, 128, "bfloat16",
                             True, False)
    assert a != c
    assert autotune.shape_class("flash_fwd", 2048, 2048, 128, "bfloat16",
                                True, True) != a  # chunked regime splits


def test_lookup_roundtrip(tmp_path, monkeypatch):
    cache = tmp_path / "tune.json"
    monkeypatch.setenv("MLIO_AUTOTUNE_CACHE", str(cache))
    autotune._load_tables.cache_clear()
    assert autotune.lookup("flash_fwd", 999, 999, 64, "float32",
                           True, False) is None
    key = autotune.shape_class("flash_fwd", 999, 999, 64, "float32",
                               True, False)
    autotune._save(key, {"block_q": 128, "block_kv": 256}, str(cache))
    got = autotune.lookup("flash_fwd", 999, 999, 64, "float32", True, False)
    assert got == {"block_q": 128, "block_kv": 256}
    # bucketed: a nearby shape in the same class hits the same entry
    assert autotune.lookup("flash_fwd", 700, 600, 64, "float32",
                           True, False) == got
    autotune._load_tables.cache_clear()


def test_flash_consults_tuned_entry(tmp_path, monkeypatch):
    """A tuned entry routes the wrapper to those tiles and stays correct."""
    cache = tmp_path / "tune.json"
    B, S, H, D = 1, 256, 2, 64
    key = autotune.shape_class("flash_fwd", S, S, D, "float32", True, False)
    cache.write_text(json.dumps({key: {"block_q": 128, "block_kv": 128}}))
    monkeypatch.setenv("MLIO_AUTOTUNE_CACHE", str(cache))
    autotune._load_tables.cache_clear()
    try:
        rng = jax.random.PRNGKey(0)
        q, k, v = (jax.random.normal(r, (B, S, H, D), jnp.float32)
                   for r in jax.random.split(rng, 3))
        out = flash_attention(q, k, v, causal=True, interpret=True)
        ref = attention_reference(q, k, v, causal=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-3, rtol=2e-3)
    finally:
        autotune._load_tables.cache_clear()


def test_tune_flash_records_winner(tmp_path, monkeypatch):
    """tune_flash times candidates (stubbed) and persists the fastest."""
    cache = tmp_path / "tune.json"
    monkeypatch.setenv("MLIO_AUTOTUNE_CACHE", str(cache))
    autotune._load_tables.cache_clear()

    calls = []

    def fake_marginal(make_run, lo=3, hi=10, reps=3):
        calls.append(1)
        return 0.001 * len(calls)  # first candidate is fastest

    monkeypatch.setattr(autotune, "_marginal_time", fake_marginal)
    import mlio_tpu.ops.flash_attention as fa
    monkeypatch.setattr(fa, "flash_attention",
                        lambda *a, **k: jnp.zeros(()))
    best = autotune.tune_flash(1, 256, 256, 2, 2, 64, dtype=jnp.float32,
                               candidates=[(128, 256), (256, 256)],
                               save=True, save_path=str(cache))
    assert best["block_q"] == 128 and best["block_kv"] == 256
    stored = json.loads(cache.read_text())
    assert list(stored.values())[0]["block_q"] == 128
    autotune._load_tables.cache_clear()
