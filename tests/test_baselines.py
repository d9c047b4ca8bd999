"""Shape/behavior tests for the comparison-method baselines (SURVEY §2.4)."""
import jax
import jax.numpy as jnp
import numpy as np

from emotiongestures_tpu.models import baselines as B


def test_seq2seq_teacher_forcing_and_shapes(rng):
    net = B.Seq2SeqNet(n_words=30, pose_dim=24, n_frames=12, n_pre_poses=4,
                       hidden_size=32, n_layers=2)
    text = jnp.asarray(rng.randint(0, 30, (2, 10)))
    lengths = jnp.asarray([10, 8])
    poses = jnp.asarray(rng.randn(2, 12, 24), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), text, lengths, poses)
    out = net.apply(variables, text, lengths, poses)
    assert out.shape == (2, 12, 24)
    # frame 0 is copied from the seed poses (seq2seq_net.py:241-242)
    np.testing.assert_array_equal(np.asarray(out[:, 0]),
                                  np.asarray(poses[:, 0]))


def test_speech2gesture_generator_discriminator(rng):
    gen = B.S2GGenerator(n_poses=34, pose_dim=114, n_pre_poses=4)
    spec = jnp.asarray(rng.randn(2, 128, 70), jnp.float32)
    pre = jnp.asarray(rng.randn(2, 4, 114), jnp.float32)
    variables = gen.init(jax.random.PRNGKey(0), spec, pre)
    out = gen.apply(variables, spec, pre)
    assert out.shape == (2, 34, 114)

    disc = B.S2GDiscriminator(pose_dim=114)
    dv = disc.init(jax.random.PRNGKey(1), out)
    score = disc.apply(dv, out)
    assert score.shape[0] == 2 and score.shape[-1] == 1  # patch output


def test_wav_encoder_shape(rng):
    enc = B.WavEncoder()
    wav = jnp.asarray(rng.randn(2, 64000), jnp.float32)
    variables = enc.init(jax.random.PRNGKey(0), wav)
    out = enc.apply(variables, wav)
    assert out.shape == (2, 60, 32)  # multimodal_context_net.py:13-40


def test_trimodal_pose_generator(rng):
    gen = B.PoseGenerator(n_words=30, pose_dim=24, n_poses=60,
                          hidden_size=64, n_layers=2, n_speakers=5)
    pre_seq = jnp.asarray(rng.randn(2, 60, 25), jnp.float32)  # +1 bit
    text = jnp.asarray(rng.randint(0, 30, (2, 60)))
    audio = jnp.asarray(rng.randn(2, 64000), jnp.float32)
    vids = jnp.asarray([0, 3])
    variables = gen.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        pre_seq, text, audio, vids)
    out, z, mu, logvar = gen.apply(
        variables, pre_seq, text, audio, vids,
        rngs={"sample": jax.random.PRNGKey(2)})
    assert out.shape == (2, 60, 24)
    assert z.shape == (2, 16)

    disc = B.TrimodalDiscriminator(hidden_size=64, n_layers=2)
    dv = disc.init(jax.random.PRNGKey(3), out)
    prob = disc.apply(dv, out)
    assert prob.shape == (2, 1)
    assert (np.asarray(prob) >= 0).all() and (np.asarray(prob) <= 1).all()


def test_conv_discriminator(rng):
    disc = B.ConvDiscriminator()
    poses = jnp.asarray(rng.randn(2, 60, 24), jnp.float32)
    dv = disc.init(jax.random.PRNGKey(0), poses)
    prob = disc.apply(dv, poses)
    assert prob.shape == (2, 1)


def test_hierarchical_wav_encoder(rng):
    from emotiongestures_tpu.models.baselines.hierarchy import pixel_shuffle

    # pixel_shuffle correctness vs torch semantics on a tiny example
    x = jnp.arange(1 * 2 * 2 * 8).reshape(1, 2, 2, 8).astype(jnp.float32)
    y = pixel_shuffle(x, 2)
    assert y.shape == (1, 4, 4, 2)
    import torch

    xt = torch.tensor(np.asarray(jnp.transpose(x, (0, 3, 1, 2))))
    yt = torch.nn.PixelShuffle(2)(xt).numpy()
    np.testing.assert_array_equal(
        np.asarray(jnp.transpose(y, (0, 3, 1, 2))), yt)

    enc = B.HierarchicalWavEncoder(n_out=32, pose_level=3, n_speakers=4)
    spec = jnp.asarray(rng.randn(1, 128, 124), jnp.float32)
    vids = jnp.asarray([1])
    variables = enc.init(jax.random.PRNGKey(0), spec, vids)
    weight, low, mid, high, blended = enc.apply(variables, spec, vids)
    assert weight.shape == (1, 3, 3)
    np.testing.assert_allclose(np.asarray(weight.sum(1)), 1.0, rtol=1e-5)
    assert low.shape == (1, 60, 32)
    assert mid.shape == (1, 60, 32)
    assert high.shape == (1, 60, 32)
    assert len(blended) == 3 and blended[0].shape == (1, 60, 32)


def test_hierarchical_pose_generator(rng):
    gen = B.HierarchicalPoseGenerator(n_words=30, pose_dim=24, n_poses=60,
                                      hidden_size=64, n_layers=2)
    pre_seq = jnp.asarray(rng.randn(2, 60, 25), jnp.float32)
    text = jnp.asarray(rng.randint(0, 30, (2, 60)))
    audio_feat = jnp.asarray(rng.randn(2, 60, 32), jnp.float32)
    variables = gen.init(jax.random.PRNGKey(0), pre_seq, text, audio_feat)
    out, z, mu, logvar = gen.apply(variables, pre_seq, text, audio_feat)
    assert out.shape == (2, 60, 24)


def test_embedding_net_pose_mode(rng):
    net = B.EmbeddingNet(n_words=30, pose_dim=27, n_frames=34, mode="pose")
    poses = jnp.asarray(rng.randn(2, 34, 27), jnp.float32)
    pre = jnp.asarray(rng.randn(2, 4, 27), jnp.float32)
    variables = net.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        None, None, pre, poses)
    (cf, cm, cl, pf, pm, plv, out) = net.apply(
        variables, None, None, pre, poses,
        rngs={"sample": jax.random.PRNGKey(2)})
    assert cf is None
    assert pf.shape == (2, 32)
    assert out.shape == (2, 34, 27)


def test_motion_ae(rng):
    ae = B.MotionAE(pose_dim=126, latent_dim=128)
    poses = jnp.asarray(rng.randn(4, 34, 126), jnp.float32)
    variables = ae.init(jax.random.PRNGKey(0), poses)
    pred, z = ae.apply(variables, poses)
    assert z.shape == (4, 128)
    assert pred.shape == (4, 34, 126)
