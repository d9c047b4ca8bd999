"""Model-zoo tests: shapes, memory-module semantics vs a literal
loop-oracle of the reference's python loops, CVAE roundtrip, and the
full generator forward under jit."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emotiongestures_tpu import models as M


def test_sp_memory_v1_matches_loop_oracle(rng):
    """Vectorised SPMemoryV1 == the reference's double loop
    (Full_model/Models_memory.py:239-249)."""
    B, prior, pred_len, D, chunk = 3, 10, 50, 12, 10
    mod = M.SPMemoryV1(prior_frames=prior, pose_dim=D, chunk_length=chunk)
    init_f = jnp.asarray(rng.randn(B, prior, D), jnp.float32)
    pred_f = jnp.asarray(rng.randn(B, pred_len, D), jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), init_f, pred_f)
    out = np.asarray(mod.apply(params, init_f, pred_f))

    # loop oracle
    p = params["params"]
    flat = np.asarray(init_f[:, prior - chunk:, :]).reshape(B, -1)
    mem = flat @ np.asarray(p["enc_fc1"]["kernel"]) + np.asarray(
        p["enc_fc1"]["bias"])
    mem = mem @ np.asarray(p["enc_fc2"]["kernel"]) + np.asarray(
        p["enc_fc2"]["bias"])
    expected = np.array(pred_f)
    clone = np.array(pred_f)
    for b in range(B):
        for c in range(chunk):
            score = float(mem[b] @ clone[b, c])
            gate = 1.0 / (1.0 + np.exp(-score))
            expected[b, c] = gate * clone[b, c] + (1 - gate) * mem[b]
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-5)


def test_tm_memory_matches_loop_oracle(rng):
    """TMMemory == reference (Full_model/Models_memory.py:282-293),
    including the cross-batch mm coupling."""
    B, prior, pred_len, D, chunk = 4, 10, 50, 12, 10
    mod = M.TMMemory(prior_frames=prior, pose_dim=D, chunk_length=chunk)
    init_f = jnp.asarray(rng.randn(B, prior, D), jnp.float32)
    pred_f = jnp.asarray(rng.randn(B, pred_len, D), jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), init_f, pred_f)
    out = np.asarray(mod.apply(params, init_f, pred_f))

    p = params["params"]

    def mlp(x, pre):
        x = x @ np.asarray(p[pre + "_fc1"]["kernel"]) + np.asarray(
            p[pre + "_fc1"]["bias"])
        return x @ np.asarray(p[pre + "_fc2"]["kernel"]) + np.asarray(
            p[pre + "_fc2"]["bias"])

    mem = mlp(np.asarray(init_f[:, prior - chunk:, :]).reshape(B, -1), "chunk")
    pe = mlp(np.asarray(pred_f[:, :chunk, :]).reshape(B, -1), "mem")
    score = mem @ (mem.T @ pe)
    soft = np.exp(score - score.max(1, keepdims=True))
    soft = soft / soft.sum(1, keepdims=True)
    expected = np.array(pred_f)
    head = np.asarray(pred_f[:, :chunk, :])
    expected[:, :chunk] = head + head * soft[..., None]
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-5)


def test_sp_memory_v2_is_noop(rng):
    """Reference SP_v2 writes to a clone and returns the original
    (Models_spatial_memory.py:292-295) — behavioral no-op."""
    mod = M.SPMemoryV2(prior_frames=10, pose_dim=8, chunk_length=10)
    init_f = jnp.asarray(rng.randn(2, 10, 8), jnp.float32)
    pred_f = jnp.asarray(rng.randn(2, 50, 8), jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), init_f, pred_f)
    out = mod.apply(params, init_f, pred_f)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(pred_f))


@pytest.fixture(scope="module")
def gen_setup():
    gen = M.GestureTransformer(n_words=50, frames=60, pose_dim=282,
                               prior_frames=10, d_model=512, d_inner=2048,
                               n_layers=3, n_head=8, d_k=64, d_v=64)
    rng_np = np.random.RandomState(0)
    spec = jnp.asarray(rng_np.randn(2, 128, 124), jnp.float32)
    text = jnp.asarray(rng_np.randint(0, 50, (2, 60)))
    prior = jnp.asarray(rng_np.randn(2, 10, 282), jnp.float32)
    variables = gen.init(jax.random.PRNGKey(0), spec, text, prior)
    return gen, variables, spec, text, prior


def test_generator_forward_shapes(gen_setup):
    gen, variables, spec, text, prior = gen_setup
    out, emo, sem, emo_pred, text_emb = jax.jit(
        lambda v, s, t, p: gen.apply(v, s, t, p)
    )(variables, spec, text, prior)
    assert out.shape == (2, 60, 282)
    assert emo.shape == (2, 60, 512)
    assert sem.shape == (2, 60, 512)
    assert emo_pred.shape == (2, 8)
    assert text_emb.shape == (2, 60, 512)


def test_generator_diversity_hook(gen_setup):
    """sampled_emotion_feature swaps the fusion branch
    (Models_memory.py:551-555): different sample -> different poses."""
    gen, variables, spec, text, prior = gen_setup
    sampled = jnp.asarray(np.random.RandomState(1).randn(2, 60, 512),
                          jnp.float32)
    out_a, *_ = gen.apply(variables, spec, text, prior, sampled)
    out_b, *_ = gen.apply(variables, spec, text, prior, 2.0 * sampled)
    out_none, *_ = gen.apply(variables, spec, text, prior)
    assert not np.allclose(np.asarray(out_a), np.asarray(out_b))
    assert not np.allclose(np.asarray(out_a), np.asarray(out_none))


def test_generator_base_variant(rng):
    gen = M.GestureTransformer(n_words=30, variant="base", d_model=128,
                               d_inner=256, n_layers=1)
    spec = jnp.asarray(rng.randn(2, 128, 124), jnp.float32)
    text = jnp.asarray(rng.randint(0, 30, (2, 60)))
    prior = jnp.asarray(rng.randn(2, 10, 282), jnp.float32)
    variables = gen.init(jax.random.PRNGKey(0), spec, text, prior)
    out, *_ = gen.apply(variables, spec, text, prior)
    assert out.shape == (2, 60, 282)


def test_motion_discriminator(rng):
    disc = M.MotionDiscriminator()
    motion = jnp.asarray(rng.randn(4, 60, 282), jnp.float32)
    offsets = M.discriminator.calc_motion(motion)
    assert offsets.shape == (4, 59, 282)
    variables = disc.init(jax.random.PRNGKey(0), offsets)
    score = disc.apply(variables, offsets)
    assert score.shape == (4, 1)


def test_pose_discriminator(rng):
    disc = M.PoseDiscriminator(d_model=282, n_layers=1)
    poses = jnp.asarray(rng.randn(2, 60, 282), jnp.float32)
    variables = disc.init(jax.random.PRNGKey(0), poses)
    probs = disc.apply(variables, poses)
    assert probs.shape == (2, 60, 1)
    assert (np.asarray(probs) >= 0).all() and (np.asarray(probs) <= 1).all()


def test_emotion_net(rng):
    net = M.EmotionNet()
    spec = jnp.asarray(rng.randn(2, 128, 124), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), spec)
    logits = net.apply(variables, spec)
    assert logits.shape == (2, 8)


def test_skeleton_classifier(rng):
    clf = M.SkeletonTransformer()
    poses = jnp.asarray(rng.randn(2, 60, 282), jnp.float32)
    variables = clf.init(jax.random.PRNGKey(0), poses)
    logits, mid = clf.apply(variables, poses)
    assert logits.shape == (2, 8)
    assert mid.shape == (2, 60, 512)


def test_fgd_autoencoder(rng):
    ae = M.FGDAutoEncoder()
    poses = jnp.asarray(rng.randn(2, 60, 282), jnp.float32)
    variables = ae.init(jax.random.PRNGKey(0), poses)
    recon, latent = ae.apply(variables, poses)
    assert recon.shape == (2, 60, 282)
    assert latent.shape == (2, 60, 512)


@pytest.mark.parametrize("cls", [M.EmotionCVAEv1, M.EmotionCVAEv2,
                                 M.EmotionCVAEv3])
def test_cvae_roundtrip_and_sample(cls, rng):
    vae = cls()
    x = jnp.asarray(rng.randn(2, 60, 512), jnp.float32)
    y = jax.nn.one_hot(jnp.asarray([1, 3]), 8)
    variables = vae.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        x, y)
    recon, mu, logvar = vae.apply(
        variables, x, y, rngs={"sample": jax.random.PRNGKey(2)})
    assert recon.shape == (2, 60, 512)
    assert mu.shape == (2, 32)
    assert logvar.shape == (2, 32)
    s1 = vae.apply(variables, y, method="sample",
                   rngs={"sample": jax.random.PRNGKey(3)})
    s2 = vae.apply(variables, y, method="sample",
                   rngs={"sample": jax.random.PRNGKey(4)})
    assert s1.shape == (2, 60, 512)
    assert not np.allclose(np.asarray(s1), np.asarray(s2))  # diversity


def test_cvae_sample_vmappable():
    """The reference's iterative diversity loop as one vmapped axis."""
    vae = M.EmotionCVAEv3()
    y = jax.nn.one_hot(jnp.asarray([0, 5]), 8)
    variables = vae.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.zeros((2, 60, 512)), y)
    keys = jax.random.split(jax.random.PRNGKey(7), 4)
    samples = jax.vmap(
        lambda k: vae.apply(variables, y, method="sample",
                            rngs={"sample": k})
    )(keys)
    assert samples.shape == (4, 2, 60, 512)
    flat = np.asarray(samples).reshape(4, -1)
    assert not np.allclose(flat[0], flat[1])


def test_xavier_reinit_all(rng):
    from emotiongestures_tpu.models.generator import xavier_reinit_all

    gen = M.GestureTransformer(n_words=30, d_model=64, d_inner=128,
                               n_layers=1, variant="base")
    spec = jnp.asarray(rng.randn(1, 128, 124), jnp.float32)
    text = jnp.asarray(rng.randint(0, 30, (1, 60)))
    prior = jnp.asarray(rng.randn(1, 10, 282), jnp.float32)
    variables = gen.init(jax.random.PRNGKey(0), spec, text, prior)
    new_params = xavier_reinit_all(variables["params"], jax.random.PRNGKey(5))
    # embedding (ndim 2) is clobbered like the reference does
    old_emb = np.asarray(variables["params"]["text_encoder"]["embedding"])
    new_emb = np.asarray(new_params["text_encoder"]["embedding"])
    assert not np.allclose(old_emb, new_emb)
    kept = xavier_reinit_all(variables["params"], jax.random.PRNGKey(5),
                             keep_embedding=True)
    np.testing.assert_array_equal(
        np.asarray(kept["text_encoder"]["embedding"]), old_emb)
    # forward still works with re-initialised params
    out, *_ = gen.apply({**variables, "params": new_params},
                        spec, text, prior)
    assert np.isfinite(np.asarray(out)).all()
