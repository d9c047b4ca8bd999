"""Fused attention kernel vs the flax MHA module (eval mode)."""
import jax
import jax.numpy as jnp
import numpy as np

from emotiongestures_tpu.nn.transformer import MultiHeadAttention
from emotiongestures_tpu.ops.pallas_attention import (
    attention_params_from_flax,
    fused_self_attention,
)


def test_fused_attention_matches_flax(rng):
    B, L, D, H, dk = 3, 60, 512, 8, 64
    mha = MultiHeadAttention(n_head=H, d_model=D, d_k=dk, d_v=dk)
    x = jnp.asarray(rng.randn(B, L, D), jnp.float32)
    variables = mha.init(jax.random.PRNGKey(0), x, x, x)
    ref, _ = mha.apply(variables, x, x, x)  # eval mode: dropout off

    params = attention_params_from_flax(variables["params"])
    got = fused_self_attention(x, *params, n_head=H, d_k=dk,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_fused_attention_short_sequence(rng):
    """Padding correctness for L < 60 as well."""
    B, L, D, H, dk = 2, 17, 128, 4, 32
    mha = MultiHeadAttention(n_head=H, d_model=D, d_k=dk, d_v=dk)
    x = jnp.asarray(rng.randn(B, L, D), jnp.float32)
    variables = mha.init(jax.random.PRNGKey(0), x, x, x)
    ref, _ = mha.apply(variables, x, x, x)
    params = attention_params_from_flax(variables["params"])
    got = fused_self_attention(x, *params, n_head=H, d_k=dk,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)
