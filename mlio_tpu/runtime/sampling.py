"""Token sampling: greedy, temperature, top-k, top-p.

The reference only ships greedy decode (verify_baseline.py:276-291); sampling
is part of any serving-complete runtime so it's first-class here. Hashable
frozen dataclass so it can be a jit static argument.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SamplingMethod:
    """temperature == 0.0 → greedy argmax."""

    temperature: float = 0.0
    top_k: Optional[int] = None
    top_p: Optional[float] = None


def sample(logits: jax.Array, rng: jax.Array, method: SamplingMethod) -> jax.Array:
    """logits [B, V] → token ids [B] (int32)."""
    if method.temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return jax.random.categorical(
        rng, _filtered_logits(logits, method), axis=-1).astype(jnp.int32)


def probabilities(logits: jax.Array, method: SamplingMethod) -> jax.Array:
    """The distribution ``sample`` draws from, as probs [B, V] (fp32).

    Greedy collapses to a one-hot at the argmax. Used by speculative
    decoding's acceptance rule (runtime/speculative.py), which needs the
    POST-filter target/draft distributions, not raw softmax."""
    if method.temperature == 0.0:
        return jax.nn.one_hot(jnp.argmax(logits, -1), logits.shape[-1],
                              dtype=jnp.float32)
    return jax.nn.softmax(_filtered_logits(logits, method), axis=-1)


def _filtered_logits(logits: jax.Array, method: SamplingMethod) -> jax.Array:
    """Temperature + top-k + top-p filtering shared by sample/probabilities."""
    logits = logits.astype(jnp.float32) / method.temperature
    if method.top_k is not None:
        top_vals, _ = jax.lax.top_k(logits, method.top_k)
        kth = top_vals[:, -1:]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if method.top_p is not None:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # Keep the smallest set of tokens whose cumulative prob >= top_p.
        cutoff_idx = jnp.sum(cum < method.top_p, axis=-1, keepdims=True)
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    return logits
