"""Pose-util, Human36M, and EmbeddingSpaceEvaluator tests."""
import numpy as np

from emotiongestures_tpu.ops.pose import (
    DIR_VEC_PAIRS,
    DIR_VEC_PAIRS_EXPRESSIVE,
    convert_dir_vec_to_pose,
    convert_pose_seq_to_dir_vec,
    normalize_string,
    resample_pose_seq,
)


def test_dir_vec_roundtrip(rng):
    """pose -> dir_vec -> pose is identity when bone lengths match."""
    # build a valid pose from random unit directions
    vec = rng.randn(5, len(DIR_VEC_PAIRS), 3)
    vec /= np.linalg.norm(vec, axis=-1, keepdims=True)
    pose = convert_dir_vec_to_pose(vec)
    assert pose.shape == (5, 10, 3)
    vec2 = convert_pose_seq_to_dir_vec(pose)
    np.testing.assert_allclose(vec2, vec, rtol=1e-6, atol=1e-8)
    pose2 = convert_dir_vec_to_pose(vec2)
    np.testing.assert_allclose(pose2, pose, rtol=1e-6, atol=1e-8)


def test_dir_vec_expressive_shapes(rng):
    vec = rng.randn(2, 4, len(DIR_VEC_PAIRS_EXPRESSIVE), 3)
    vec /= np.linalg.norm(vec, axis=-1, keepdims=True)
    pose = convert_dir_vec_to_pose(vec, DIR_VEC_PAIRS_EXPRESSIVE)
    assert pose.shape == (2, 4, 43, 3)
    vec2 = convert_pose_seq_to_dir_vec(pose, DIR_VEC_PAIRS_EXPRESSIVE)
    np.testing.assert_allclose(vec2, vec, rtol=1e-5, atol=1e-7)


def test_flattened_input_accepted(rng):
    vec = rng.randn(3, len(DIR_VEC_PAIRS) * 3)
    pose = convert_dir_vec_to_pose(vec)
    assert pose.shape == (3, 10, 3)


def test_resample_pose_seq(rng):
    poses = rng.randn(30, 6)
    out = resample_pose_seq(poses, duration_in_sec=2.0, fps=15)
    assert out.shape == (30, 6)  # 30 frames @ 15 fps over 2 s
    out2 = resample_pose_seq(poses, duration_in_sec=1.0, fps=15)
    assert out2.shape == (15, 6)


def test_normalize_string():
    assert normalize_string("Hello, World! it's 42") == "hello , world ! its"


def test_human36m(rng):
    from emotiongestures_tpu.data.h36m import Human36M

    # fake positions_3d dict: 2 subjects, 32-joint skeletons
    data = {
        "S1": {"Walking": rng.randn(160, 32, 3)},
        "S11": {"Eating": rng.randn(160, 32, 3)},
    }
    mean = np.zeros(9 * 3)
    train = Human36M(data, mean, is_train=True, augment=True)
    test = Human36M(data, mean, is_train=False)
    assert len(train) > len(test) > 0
    poses, dir_vec = train[0]
    assert poses.shape == (34, 10, 3)
    assert dir_vec.shape == (34, 27)
    # frontalisation: hip vector lies in the XZ half-plane after normalize
    np.testing.assert_allclose(
        np.linalg.norm(dir_vec.reshape(34, 9, 3), axis=-1), 1.0, rtol=1e-4)


def test_embedding_space_evaluator(rng):
    from emotiongestures_tpu.eval.embedding_space_evaluator import (
        EmbeddingSpaceEvaluator,
    )

    ev = EmbeddingSpaceEvaluator(pose_dim=126, n_frames=34)
    real = rng.randn(8, 34, 126).astype(np.float32)
    gen = rng.randn(8, 34, 126).astype(np.float32)
    ev.push_samples(gen, real)
    ev.push_samples(gen + 0.5, real)
    assert ev.get_no_of_samples() == 2
    fd, feat_dist = ev.get_scores()
    assert np.isfinite(fd) and feat_dist > 0
    div = ev.get_diversity_scores()
    assert div > 0
    ev.reset()
    assert ev.get_no_of_samples() == 0


def test_embedding_space_evaluator_27d(rng):
    from emotiongestures_tpu.eval.embedding_space_evaluator import (
        EmbeddingSpaceEvaluator,
    )

    ev = EmbeddingSpaceEvaluator(pose_dim=27, n_frames=34)
    real = rng.randn(4, 34, 27).astype(np.float32)
    gen = rng.randn(4, 34, 27).astype(np.float32)
    ev.push_samples(gen, real)
    fd, feat_dist = ev.get_scores()
    assert np.isfinite(fd)
