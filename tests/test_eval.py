"""Evaluation suite tests with closed-form golden values (SURVEY.md §4:
Fréchet distance on small closed-form Gaussians, onset detection on
synthetic click tracks, GAHR properties)."""
import numpy as np

from emotiongestures_tpu.eval import (
    BeatAligner,
    calculate_frechet_distance,
    compute_acc,
    diversity_score,
    frechet_from_features,
    l2_distance_pose,
    mpjre,
)


def test_frechet_identity_is_zero():
    mu = np.zeros(8)
    sigma = np.eye(8)
    assert abs(calculate_frechet_distance(mu, sigma, mu, sigma)) < 1e-8


def test_frechet_mean_shift_closed_form():
    """With equal covariances C1=C2=I: d^2 = |mu1-mu2|^2."""
    mu1 = np.zeros(4)
    mu2 = np.array([3.0, 0.0, 4.0, 0.0])  # |diff|^2 = 25
    sigma = np.eye(4)
    d = calculate_frechet_distance(mu1, sigma, mu2, sigma)
    np.testing.assert_allclose(d, 25.0, rtol=1e-8)


def test_frechet_covariance_closed_form():
    """Diagonal case: d^2 = sum((sqrt(a_i)-sqrt(b_i))^2) for equal means."""
    a = np.array([1.0, 4.0, 9.0])
    b = np.array([4.0, 9.0, 1.0])
    d = calculate_frechet_distance(
        np.zeros(3), np.diag(a), np.zeros(3), np.diag(b))
    expected = np.sum((np.sqrt(a) - np.sqrt(b)) ** 2)
    np.testing.assert_allclose(d, expected, rtol=1e-8)


def test_frechet_failure_returns_100():
    """Imaginary sqrtm components -> 100 (FHD_score.py:213-214)."""
    sigma1 = np.eye(2)
    sigma2 = np.diag([-1.0, 1.0])  # negative eigenvalue -> imaginary sqrtm
    d = calculate_frechet_distance(np.zeros(2), sigma1, np.zeros(2), sigma2)
    assert d == 100


def test_frechet_from_features_statistics(rng):
    f1 = rng.randn(2000, 8)
    f2 = rng.randn(2000, 8) + 2.0
    d = frechet_from_features(f1, f2)
    # |Δmu|^2 ≈ 8*4 = 32, covariances ≈ I
    assert 25 < d < 40


def test_diversity_score_zero_for_identical(rng):
    feats = np.tile(rng.randn(1, 60, 512), (20, 1, 1)).reshape(-1, 512)
    score, (lo, hi) = diversity_score(feats, seed=0)
    assert abs(score) < 1e-6


def test_diversity_score_positive(rng):
    feats = rng.randn(20 * 60, 512)
    score, (lo, hi) = diversity_score(feats, seed=0)
    assert score > 0
    assert lo <= score <= hi


def test_metrics_values():
    gt = np.zeros((2, 60, 282), np.float32)
    fake = np.ones((2, 60, 282), np.float32)
    np.testing.assert_allclose(
        l2_distance_pose(fake, gt), np.sqrt(282.0), rtol=1e-6)
    np.testing.assert_allclose(mpjre(gt, fake), 1.0)
    logits = np.array([[0.1, 0.9], [0.8, 0.2]])
    assert compute_acc(np.array([1, 0]), logits) == 100.0
    assert compute_acc(np.array([0, 0]), logits) == 50.0


def _click_track(beat_times, sr=16000, dur=4.0, rng=None):
    y = np.zeros(int(sr * dur), np.float32)
    if rng is not None:
        y += 0.001 * rng.randn(len(y)).astype(np.float32)
    for t in beat_times:
        i = int(t * sr)
        n = min(400, len(y) - i)
        y[i : i + n] += np.sin(
            2 * np.pi * 1000 * np.arange(n) / sr
        ).astype(np.float32) * np.exp(-np.arange(n) / 80.0)
    return y


def test_onset_detection_finds_clicks(rng):
    beat_times = [0.5, 1.0, 1.5, 2.0, 2.5, 3.0, 3.5]
    y = _click_track(beat_times, rng=rng)
    aligner = BeatAligner(0.3, 2)
    onset_raw, onset_bt, onset_bt_rms = aligner.load_audio(y)
    from emotiongestures_tpu.eval.beat import frames_to_time

    det = frames_to_time(onset_raw)
    assert len(det) >= 5
    # every true beat has a detection within 80 ms
    for t in beat_times:
        assert np.min(np.abs(det - t)) < 0.08, (t, det)
    # backtracked onsets precede (or equal) raw onsets
    assert (onset_bt <= onset_raw).all()
    assert (onset_bt_rms <= onset_raw).all()


def test_gahr_perfect_and_far():
    a = BeatAligner(0.3, 2)
    assert a.GAHR([1.0, 2.0], [1.0, 2.0], 0.3) == 1.0
    assert a.GAHR([100.0], [1.0, 2.0], 0.3) < 1e-6
    assert a.GAHR([1.0], [], 0.3) == 0.0


def test_pose_beats_and_alignment(rng):
    """Poses oscillating at the click frequency align far better than
    random poses."""
    beat_hz = 2.0
    beat_times = np.arange(0.25, 4.0, 1.0 / beat_hz)
    y = _click_track(beat_times, rng=rng)
    frames = np.arange(60) / 15.0
    pose = np.zeros((60, 282), np.float32)
    # drive the 8 tracked limb slices with beat-locked oscillation
    osc = np.sin(2 * np.pi * beat_hz * frames)[:, None]
    pose[:, 18:42] = osc
    pose[:, 150:174] = osc
    aligner = BeatAligner(0.3, 2)
    onsets = aligner.load_audio(y)
    beats = aligner.load_pose(pose, 0, 4, 15)
    assert sum(len(b) for b in beats) > 0
    aligned_score = aligner.calculate_align(*onsets, beats)

    rand_pose = rng.randn(60, 282).astype(np.float32)
    rand_beats = aligner.load_pose(rand_pose, 0, 4, 15)
    rand_score = aligner.calculate_align(*onsets, rand_beats)
    assert 0.0 <= rand_score <= 1.0
    assert 0.0 < aligned_score <= 1.0
    assert aligned_score > rand_score


def test_score_batch(rng):
    y = np.stack([_click_track([1.0, 2.0, 3.0], rng=rng)] * 2)
    poses = rng.randn(2, 60, 282).astype(np.float32)
    score = BeatAligner(0.3, 2).score_batch(y, poses)
    assert 0.0 <= score <= 1.0
