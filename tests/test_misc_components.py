"""HandCVAE, pre-emphasis, top-k accuracy, TED dataset variant, render."""
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F


def test_hand_cvae(rng):
    from emotiongestures_tpu.models.cvae import HandCVAE

    vae = HandCVAE()
    x = jnp.asarray(rng.randn(4, 90), jnp.float32)
    y = jnp.asarray(rng.randn(4, 90), jnp.float32)
    variables = vae.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        x, y)
    recon, mu, logvar = vae.apply(variables, x, y,
                                  rngs={"sample": jax.random.PRNGKey(2)})
    assert recon.shape == (4, 90)
    assert mu.shape == (4, 32)
    s = vae.apply(variables, y, method="sample",
                  rngs={"sample": jax.random.PRNGKey(3)})
    assert s.shape == (4, 90)


def test_pre_emphasis_matches_torch(rng):
    from emotiongestures_tpu.ops.audio import pre_emphasis

    x = rng.randn(2, 100).astype(np.float32)
    ours = np.asarray(pre_emphasis(jnp.asarray(x)))
    # torch reference (model/utils.py:22-38)
    xt = torch.tensor(x).unsqueeze(1)
    xt = F.pad(xt, (1, 0), "reflect")
    filt = torch.tensor([[[-0.97, 1.0]]])
    ref = F.conv1d(xt, filt).squeeze(1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_topk_accuracy():
    from emotiongestures_tpu.ops.audio import topk_accuracy

    logits = np.array([[0.1, 0.9, 0.0], [0.8, 0.1, 0.1], [0.2, 0.3, 0.5]])
    targets = np.array([1, 0, 0])
    top1, top2 = topk_accuracy(logits, targets, topk=(1, 2))
    np.testing.assert_allclose(top1, 100 * 2 / 3)
    np.testing.assert_allclose(top2, 100 * 2 / 3)  # row3 top2={2,1}, tgt 0
    (top3,) = topk_accuracy(logits, targets, topk=(3,))
    np.testing.assert_allclose(top3, 100.0)


def test_ted_dataset_variant(tmp_path, rng):
    from emotiongestures_tpu.data.dataset import TedSpeechMotionDataset
    from emotiongestures_tpu.data.store import GestureStoreWriter
    from tests.test_preprocessing import _make_clip

    clip_dir = tmp_path / "ted_train"
    with GestureStoreWriter(clip_dir) as w:
        w.append(_make_clip(rng))
    mean_dir_vec = np.zeros(9 * 3, np.float32)
    ds = TedSpeechMotionDataset(clip_dir, n_poses=34,
                                subdivision_stride=10,
                                pose_resampling_fps=15,
                                mean_dir_vec=mean_dir_vec)
    assert len(ds) > 0
    s = ds[0]
    assert s["vec_seq"].shape == (34, 27)
    # unit dir-vecs minus zero mean: rows have unit norm
    np.testing.assert_allclose(
        np.linalg.norm(s["vec_seq"].reshape(34, 9, 3), axis=-1), 1.0,
        rtol=1e-4)
    # cache is reused on second construction (no re-preprocessing crash)
    ds2 = TedSpeechMotionDataset(clip_dir, n_poses=34,
                                 subdivision_stride=10,
                                 pose_resampling_fps=15,
                                 mean_dir_vec=mean_dir_vec)
    assert len(ds2) == len(ds)


def test_render_video(tmp_path, rng):
    from emotiongestures_tpu.utils.render import create_video_and_save

    T = 8
    vecs = rng.randn(T, 27).astype(np.float32) * 0.1
    path, out_poses, tgt_poses = create_video_and_save(
        str(tmp_path), epoch=0, prefix="test", iter_idx=0,
        target=vecs, output=vecs, mean_data=np.zeros(27),
        title="smoke", audio=rng.randn(1000).astype(np.float32) * 0.1,
        fps=15)
    import os

    assert os.path.exists(path)
    assert out_poses.shape == (T, 10, 3)


def test_tts_helper_cache(tmp_path):
    """utils/tts_helper.py:9-104 semantics without the optional GCP dep:
    deterministic text-hash cache keys, cache hits short-circuit
    synthesis, voice change invalidates the key."""
    from emotiongestures_tpu.utils.tts_helper import TTSHelper

    h = TTSHelper(cache_path=str(tmp_path / "tts"))
    f1 = h._cache_file("hello world")
    assert f1 == h._cache_file("hello world")
    assert f1 != h._cache_file("other text")
    other_voice = TTSHelper(cache_path=str(tmp_path / "tts"),
                            voice_name="en-US-Wavenet-A")
    assert other_voice._cache_file("hello world") != f1
    # a pre-existing cache entry is returned without touching the client
    f1.write_bytes(b"RIFFfake")
    assert h.synthesis("hello world") == str(f1)


def test_ted_expressive_dataset_variant(tmp_path, rng):
    """TED-expressive end-to-end (lmdb_data_loader_expressive.py:58-260):
    the vendored 43-joint mean tables select the 42-pair dir-vec layout
    in preprocessing, filters run OFF (expressive preprocessor
    semantics), and clips come out as (n_poses, 126) sequences."""
    from emotiongestures_tpu.data import EXPRESSIVE_MEAN_DIR_VEC
    from emotiongestures_tpu.data.dataset import TedSpeechMotionDataset
    from emotiongestures_tpu.data.store import GestureStoreWriter
    from tests.test_preprocessing import _make_clip

    clip = _make_clip(rng)
    n_frames = clip["skeletons_3d"].shape[0]
    skel = 0.05 * rng.randn(n_frames, 43, 3).astype(np.float32)
    skel[:, 1, 1] = -0.5
    clip["skeletons_3d"] = skel
    clip_dir = tmp_path / "ted_exp"
    with GestureStoreWriter(clip_dir) as w:
        w.append(clip)

    ds = TedSpeechMotionDataset.expressive(
        clip_dir, n_poses=34, subdivision_stride=10,
        pose_resampling_fps=15)
    assert len(ds) > 0
    s = ds[0]
    assert s["vec_seq"].shape == (34, 126)
    # vec_seq = unit dir-vecs minus the vendored mean: adding the mean
    # back must restore unit-norm rows
    restored = s["vec_seq"] + np.asarray(EXPRESSIVE_MEAN_DIR_VEC)[None, :]
    np.testing.assert_allclose(
        np.linalg.norm(restored.reshape(34, 42, 3), axis=-1), 1.0,
        rtol=1e-4)


def test_ted_expressive_fallback_on_cache_without_vec_seq(tmp_path, rng):
    """An existing cache whose records lack vec_seq (built without a mean
    vector) must still serve the expressive config: __getitem__'s
    fallback conversion has to pick the 42-pair table from the 126-d
    mean instead of the 10-joint default."""
    from emotiongestures_tpu.data.dataset import TedSpeechMotionDataset
    from emotiongestures_tpu.data.store import GestureStoreWriter
    from tests.test_preprocessing import _make_clip

    clip = _make_clip(rng)
    n_frames = clip["skeletons_3d"].shape[0]
    skel = 0.05 * rng.randn(n_frames, 43, 3).astype(np.float32)
    skel[:, 1, 1] = -0.5
    clip["skeletons_3d"] = skel
    clip_dir = tmp_path / "ted_exp2"
    with GestureStoreWriter(clip_dir) as w:
        w.append(clip)
    # build the cache WITHOUT a mean vector -> records have no vec_seq
    ds0 = TedSpeechMotionDataset(clip_dir, n_poses=34,
                                 subdivision_stride=10,
                                 pose_resampling_fps=15)
    assert "vec_seq" not in ds0.store[0]
    # expressive view over the SAME cache exercises the fallback
    ds = TedSpeechMotionDataset.expressive(
        clip_dir, n_poses=34, subdivision_stride=10,
        pose_resampling_fps=15)
    s = ds[0]
    assert s["vec_seq"].shape == (34, 126)
    assert np.isfinite(s["vec_seq"]).all()


def test_legacy_submodules_factories(rng):
    """model/audio_emotion_classifer_submodules.py equivalents: factory
    ordering (core -> BN -> act), bias omitted under a normalizer, and the
    documented-fixed conv3d lets ResidualBlock construct and run."""
    from emotiongestures_tpu.models import legacy_submodules as sub

    x = jnp.asarray(rng.randn(2, 8, 8, 4), jnp.float32)

    def leaf_names(variables):
        return {"/".join(str(k.key) for k in path)
                for path, _ in jax.tree_util.tree_flatten_with_path(
                    variables["params"])[0]}

    m = sub.conv2d(6)
    variables = m.init(jax.random.PRNGKey(0), x)
    # bias=False whenever a normalizer is present (reference :30)
    assert not any(n.endswith("bias") and "Conv" in n
                   for n in leaf_names(variables))
    y = m.apply(variables, x, train=False)
    assert y.shape == (2, 8, 8, 6)
    assert float(jnp.min(y)) >= 0.0  # activation applied LAST

    mb = sub.conv2d(6, normalizer=False, activation=None)
    vb = mb.init(jax.random.PRNGKey(0), x)
    assert any(n.endswith("bias") for n in leaf_names(vb))
    assert not any(n.startswith("norm") for n in leaf_names(vb))

    lin = sub.linear(5)
    vl = lin.init(jax.random.PRNGKey(0), x.reshape(2, -1))
    out = lin.apply(vl, x.reshape(2, -1))
    assert out.shape == (2, 5) and float(jnp.min(out)) >= 0.0

    tr = sub.conv_transpose2d(3)
    vt = tr.init(jax.random.PRNGKey(0), x)
    yt = tr.apply(vt, x)
    assert yt.shape == (2, 16, 16, 3)  # k=4,s=2,p=1 doubles H,W


def test_legacy_nn_conv2d_upsample_matches_torch(rng):
    """nn_conv2d's nearest upsample == torch UpsamplingNearest2d."""
    from emotiongestures_tpu.models.legacy_submodules import (
        jnp_broadcast_nearest)

    x = rng.randn(2, 5, 7, 3).astype(np.float32)
    ours = np.asarray(jnp_broadcast_nearest(
        jnp.asarray(x)[:, :, None, :, None, :], 2, 5, 7, 3, 2))
    ref = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                        scale_factor=2, mode="nearest")
    np.testing.assert_allclose(ours, ref.permute(0, 2, 3, 1).numpy())


def test_legacy_residual_block(rng):
    """ResidualBlock constructs (NameError in the reference) and keeps the
    plain-ReLU quirk: outputs are nonnegative."""
    from emotiongestures_tpu.models.legacy_submodules import ResidualBlock

    x = jnp.asarray(rng.randn(2, 4, 4, 4, 8), jnp.float32)  # NDHWC
    blk = ResidualBlock(channel_out=8)
    variables = blk.init(jax.random.PRNGKey(0), x)
    y = blk.apply(variables, x, train=False)
    assert y.shape == x.shape
    assert float(jnp.min(y)) >= 0.0
