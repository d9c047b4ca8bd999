"""Shape/semantics tests for the transformer / SE-ResNet / TCN blocks,
including golden-value checks of attention math against the reference
formula (Full_model/Modules.py:13-23)."""
import jax
import jax.numpy as jnp
import numpy as np

from emotiongestures_tpu import nn as enn
from emotiongestures_tpu.core.layers import sinusoid_position_table


def test_sinusoid_table_matches_reference_formula():
    n_pos, d = 16, 8
    table = np.asarray(sinusoid_position_table(n_pos, d))
    ref = np.array(
        [
            [p / np.power(10000, 2 * (j // 2) / d) for j in range(d)]
            for p in range(n_pos)
        ]
    )
    ref[:, 0::2] = np.sin(ref[:, 0::2])
    ref[:, 1::2] = np.cos(ref[:, 1::2])
    np.testing.assert_allclose(table, ref, rtol=1e-6, atol=1e-6)


def test_mha_is_softmax_attention(rng):
    """With H=1 and identity-ish tiny dims, verify the einsum path equals
    the straightforward QK^T/sqrt(d) softmax V computation."""
    mha = enn.MultiHeadAttention(n_head=2, d_model=16, d_k=8, d_v=8)
    x = jnp.asarray(rng.randn(3, 5, 16), dtype=jnp.float32)
    params = mha.init(jax.random.PRNGKey(0), x, x, x)
    out, attn = mha.apply(params, x, x, x)
    assert out.shape == (3, 5, 16)
    assert attn.shape == (3, 2, 5, 5)
    np.testing.assert_allclose(
        np.asarray(attn.sum(-1)), np.ones((3, 2, 5)), rtol=1e-5
    )
    # manual recomputation from the projection params
    p = params["params"]
    q = x @ p["w_qs"]["kernel"]
    k = x @ p["w_ks"]["kernel"]
    v = x @ p["w_vs"]["kernel"]
    q = q.reshape(3, 5, 2, 8)
    k = k.reshape(3, 5, 2, 8)
    v = v.reshape(3, 5, 2, 8)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(8.0)
    probs = jax.nn.softmax(scores, axis=-1)
    ref_ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(3, 5, 16)
    ref_out = ref_ctx @ p["fc"]["kernel"] + x
    mean = ref_out.mean(-1, keepdims=True)
    var = ((ref_out - mean) ** 2).mean(-1, keepdims=True)
    normed = (ref_out - mean) / jnp.sqrt(var + 1e-6)
    ref_out = normed * p["layer_norm"]["scale"] + p["layer_norm"]["bias"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               rtol=1e-4, atol=1e-4)


def test_encoder_decoder_shapes(rng):
    enc = enn.TransformerEncoder(n_layers=2, n_head=4, d_k=8, d_v=8,
                                 d_model=32, d_inner=64, n_position=60)
    x = jnp.asarray(rng.randn(2, 60, 32), dtype=jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), x)
    y = enc.apply(params, x)
    assert y.shape == (2, 60, 32)

    dec = enn.TransformerDecoder(n_layers=2, n_head=4, d_k=8, d_v=8,
                                 d_model=32, d_inner=64, n_position=60)
    trg = jnp.asarray(rng.randn(2, 60, 32), dtype=jnp.float32)
    dparams = dec.init(jax.random.PRNGKey(1), trg, y)
    z = dec.apply(dparams, trg, y)
    assert z.shape == (2, 60, 32)


def test_resnet_se_3stage_shapes(rng):
    net = enn.ResNetSE(layers=[3, 4, 6], num_filters=[32, 64, 128])
    x = jnp.asarray(rng.randn(2, 128, 124, 1), dtype=jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x)
    y = net.apply(variables, x)
    # strides 1,2,2: 128->64->32; 124->62->31 (Models_memory.py:92-133)
    assert y.shape == (2, 32, 31, 128)


def test_resnet_se_4stage_shapes(rng):
    net = enn.ResNetSE(layers=[3, 4, 6, 3], num_filters=[32, 64, 128, 256])
    x = jnp.asarray(rng.randn(2, 128, 124, 1), dtype=jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x)
    y = net.apply(variables, x)
    # 128/8=16, 124->62->31->16 (audio_emotion_classifer.py:42)
    assert y.shape == (2, 16, 16, 256)


def test_resnet_se_train_updates_batch_stats(rng):
    net = enn.ResNetSE(layers=[1, 1], num_filters=[8, 16])
    x = jnp.asarray(rng.randn(2, 32, 32, 1), dtype=jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x, train=True)
    y, new_state = net.apply(variables, x, train=True,
                             mutable=["batch_stats"])
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(new_state["batch_stats"])
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(old, new)
    )


def test_tcn_causal(rng):
    """A change at time t must not affect outputs before t."""
    tcn = enn.TemporalConvNet(num_channels=[16, 16], kernel_size=2)
    x = jnp.asarray(rng.randn(1, 20, 8), dtype=jnp.float32)
    params = tcn.init(jax.random.PRNGKey(0), x)
    y1 = tcn.apply(params, x)
    x2 = x.at[0, 10, :].add(5.0)
    y2 = tcn.apply(params, x2)
    assert y1.shape == (1, 20, 16)
    np.testing.assert_allclose(np.asarray(y1[0, :10]), np.asarray(y2[0, :10]),
                               rtol=1e-5, atol=1e-6)
    assert not np.allclose(np.asarray(y1[0, 10:]), np.asarray(y2[0, 10:]))


def test_weight_norm_initial_identity(rng):
    """g init = ||v|| so the effective kernel equals v at init."""
    from emotiongestures_tpu.nn.tcn import WNCausalConv1d

    conv = WNCausalConv1d(features=4, kernel_size=2, dilation=1)
    x = jnp.asarray(rng.randn(1, 6, 3), dtype=jnp.float32)
    params = conv.init(jax.random.PRNGKey(0), x)
    v = np.asarray(params["params"]["v"])
    g = np.asarray(params["params"]["g"])
    np.testing.assert_allclose(
        g, np.linalg.norm(v.reshape(-1, 4), axis=0), rtol=1e-6
    )


def test_resnet_se_remat_blocks_parity(rng):
    """remat_blocks must be a pure memory/scheduling option: identical
    forward outputs, BN updates, and gradients (up to fp32 noise) vs the
    unrolled module — jax.checkpoint recomputes, never changes math."""
    import jax
    import jax.numpy as jnp

    from emotiongestures_tpu.nn.resnet_se import ResNetSE

    x = jnp.asarray(rng.randn(2, 32, 30, 1), jnp.float32)
    base = ResNetSE(layers=[2, 2], num_filters=[8, 16])
    rem = ResNetSE(layers=[2, 2], num_filters=[8, 16], remat_blocks=True)
    v = base.init(jax.random.PRNGKey(0), x, train=False)

    def run(m):
        def loss(p):
            out, mut = m.apply(
                {"params": p, "batch_stats": v["batch_stats"]}, x,
                train=True, mutable=["batch_stats"])
            return jnp.sum(out ** 2), (out, mut["batch_stats"])

        (l, (out, bs)), g = jax.value_and_grad(loss, has_aux=True)(
            v["params"])
        return l, out, bs, g

    l0, out0, bs0, g0 = run(base)
    l1, out1, bs1, g1 = run(rem)
    # jax.checkpoint changes fusion/reassociation order, so allow fp32
    # noise (~1e-6 relative observed); a semantic deviation would be
    # orders of magnitude larger
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out1),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(bs0),
                    jax.tree_util.tree_leaves(bs1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
