"""Synthetic models with KNOWN behavior for benchmarking and tests.

`make_induction_model` hand-builds a transformer whose greedy continuation
genuinely repeats the prompt's period — a stand-in for "code/doc
continuation on a trained checkpoint" in this offline environment (no
downloads). The model pays FULL forward cost for its geometry (every
weight matrix streams from HBM at its real size) and is not told anything
about the drafter: speculative-decoding legs built on it measure the real
machinery (n-gram prompt-lookup drafting + verify rounds) on a model that
genuinely predicts repetitive continuations, rather than forcing
acceptance through the external-draft interface.

Construction (one real induction layer + pass-through layers):
  * learned positional embeddings are a scaled random orthonormal family
    {u_t}; token embeddings are random unit rows E[V, H] (near-orthogonal
    at H >= 2048).
  * layer 0 attention: W_k projects onto the positional subspace
    (k_j ~ u_j); W_q additionally SHIFTS by the period
    (q_i ~ beta * u_{i-P+1}), so scores peak exactly at j = i-P+1 and
    softmax is ~one-hot at inverse-temperature beta.
  * W_v = W_o = c*I: the retrieved x_{i-P+1} (whose token part is
    tok_{i-P+1} = tok_{i+1} for period-P text) is added to the residual
    with gain c, dominating the logits E @ x — greedy argmax continues
    the pattern.
  * remaining layers have zero attention/MLP weights (pure residual
    pass-through) but FULL-SIZE weight tensors: decode still streams
    every byte, so throughput numbers are real for the geometry.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from mlio_tpu.models.spec import ModelSpec


def induction_spec(hidden: int = 1024, layers: int = 8, heads: int = 8,
                   intermediate: Optional[int] = None, vocab: int = 8192,
                   max_seq: int = 2048, name: str = "induction") -> ModelSpec:
    return ModelSpec(
        name=name, vocab_size=vocab, hidden_size=hidden, num_layers=layers,
        num_heads=heads, num_kv_heads=heads,
        intermediate_size=intermediate or 4 * hidden, max_seq_len=max_seq,
        activation="gelu_new", norm="layernorm", positional="learned",
        use_qkv_bias=True, use_mlp_bias=True, use_out_bias=True,
        tie_embeddings=True)


def make_induction_model(spec: ModelSpec, period: int,
                         key: Optional[jax.Array] = None,
                         beta: float = 40.0, gain: float = 6.0,
                         pos_scale: float = 6.0):
    """Build params (framework layout) for a period-``period`` induction
    model on ``spec`` (learned positions, tied embeddings). Returns params.
    """
    assert spec.positional == "learned" and spec.tie_embeddings
    assert spec.max_seq_len <= spec.hidden_size // 2, (
        "the induction construction needs the positional family to span a "
        "STRICT subspace (token embeddings keep most of their energy under "
        "I - P_pos): use max_seq_len <= hidden_size/2")
    key = key if key is not None else jax.random.PRNGKey(0)
    H, V, S = spec.hidden_size, spec.vocab_size, spec.max_seq_len
    L, Hq, D = spec.num_layers, spec.num_heads, spec.head_size
    k1, k2 = jax.random.split(key)

    # random unit token rows; scaled orthonormal positional family (unit
    # u_t rows, scaled so the positional part dominates the LN direction)
    E = jax.random.normal(k1, (V, H)) / jnp.sqrt(H)
    U = jnp.linalg.qr(jax.random.normal(k2, (H, S)).astype(jnp.float32)
                      )[0].T                                    # [S, H]
    pos_embed = pos_scale * U

    # Row-vector maps: x @ P_pos projects onto the positional span
    # (P = U^T U); x @ SHIFT = sum_t (x . u_t) u_{t-period+1} maps u_t to
    # the key position an induction head must hit (clamped at 0).
    P_pos = U.T @ U                                             # [H, H]
    src = jnp.arange(S)
    dst = jnp.maximum(src - (period - 1), 0)
    SHIFT = U.T @ U[dst]                                        # u_t->u_dst
    # scores q.k scale by 1/sqrt(D); fold beta (softmax sharpness) into W_q
    Wq_head = beta * jnp.sqrt(D) * SHIFT                        # [H, H]
    Wk_head = P_pos

    def zeros(*s):
        return jnp.zeros(s, jnp.float32)

    blocks = {
        # LN scales 1, biases 0
        "ln1_scale": jnp.ones((L, H)), "ln1_bias": zeros(L, H),
        "ln2_scale": jnp.ones((L, H)), "ln2_bias": zeros(L, H),
        "wq": zeros(L, H, Hq * D), "bq": zeros(L, Hq * D),
        "wk": zeros(L, H, Hq * D), "bk": zeros(L, Hq * D),
        "wv": zeros(L, H, Hq * D), "bv": zeros(L, Hq * D),
        "wo": zeros(L, Hq * D, H), "bo": zeros(L, H),
        "w_up": zeros(L, H, spec.intermediate_size),
        "b_up": zeros(L, spec.intermediate_size),
        "w_down": zeros(L, spec.intermediate_size, H),
        "b_down": zeros(L, H),
        "w_gate": None, "b_gate": None,
    }
    # layer 0 = the induction head. The flat [H, Hq*D] layout slices heads
    # on COLUMNS, so using the full H x H projection matrices gives head h
    # the coordinate slice [h*D:(h+1)*D] of the positional dot — each head
    # sees 1/Hq of the signal with noise ~sqrt(D)/H, an SNR of sqrt(D)
    # per head, and beta sharpens the softmax to ~one-hot.
    assert Hq * D == H
    eye = jnp.eye(H)
    blocks = dict(blocks)
    blocks["wq"] = blocks["wq"].at[0].set(Wq_head)
    blocks["wk"] = blocks["wk"].at[0].set(Wk_head)
    # W_v strips the positional subspace so the retrieved vector is the
    # key position's TOKEN embedding (raising pos_scale sharpens attention
    # without polluting the value path)
    blocks["wv"] = blocks["wv"].at[0].set(eye - P_pos)
    blocks["wo"] = blocks["wo"].at[0].set(gain * eye)

    params = {
        "tok_embed": E,
        "pos_embed": pos_embed,
        "blocks": blocks,
        "final_scale": jnp.ones((H,)),
        "final_bias": zeros(H),
        "lm_head": None,
    }
    return params


def periodic_prompt(period: int, repeats: int, vocab: int,
                    key: Optional[jax.Array] = None) -> jnp.ndarray:
    """A [1, period*repeats] prompt of a random period-``period`` pattern."""
    key = key if key is not None else jax.random.PRNGKey(7)
    pat = jax.random.randint(key, (period,), 2, vocab)
    return jnp.tile(pat, repeats)[None].astype(jnp.int32)
