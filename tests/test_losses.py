"""Golden-value tests for the loss zoo against torch-computed semantics
(torch-cpu is available in the image, used as an independent oracle)."""
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from emotiongestures_tpu.core import losses as L


def test_cross_entropy_matches_torch(rng):
    logits = rng.randn(6, 8).astype(np.float32)
    labels = rng.randint(0, 8, size=6)
    ours = np.asarray(L.cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    ref = F.cross_entropy(
        torch.tensor(logits), torch.tensor(labels), reduction="none"
    ).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_focal_loss_matches_reference_formula(rng):
    """train_audio_classifier_K_fold.py:96-105 with per-class alpha."""
    logits = rng.randn(16, 8).astype(np.float32)
    labels = rng.randint(0, 8, size=16)
    alpha = np.array([0.2, 1, 1, 1, 1, 1, 1, 1], dtype=np.float32)
    ce = F.cross_entropy(
        torch.tensor(logits), torch.tensor(labels), reduction="none"
    )
    pt = torch.exp(-ce)
    ref = (torch.tensor(alpha)[torch.tensor(labels)] * (1 - pt) ** 2 * ce).mean()
    ours = L.focal_loss(jnp.asarray(logits), jnp.asarray(labels), alpha=alpha)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_emotion_infonce_properties(rng):
    """Paired-label emotion InfoNCE (train/gan.py contrastive_mode
    'paired_label'): same-label clusters must score lower loss than
    scrambled labels, and a batch with no same-label pairs contributes 0."""
    # two tight clusters, labels matching cluster membership
    base = rng.randn(2, 16).astype(np.float32)
    feats = np.concatenate(
        [base[i] + 0.01 * rng.randn(4, 16) for i in (0, 1)]
    ).astype(np.float32)
    labels = np.array([0, 0, 0, 0, 1, 1, 1, 1])
    good = float(L.emotion_infonce(jnp.asarray(feats), jnp.asarray(labels)))
    scrambled = np.array([0, 1, 0, 1, 0, 1, 0, 1])
    bad = float(L.emotion_infonce(jnp.asarray(feats), jnp.asarray(scrambled)))
    assert good < bad
    assert np.isfinite(good) and np.isfinite(bad)
    # no positives anywhere -> exactly zero, no NaN/inf
    solo = np.arange(8)
    zero = float(L.emotion_infonce(jnp.asarray(feats), jnp.asarray(solo)))
    assert zero == 0.0


def test_emotion_infonce_gradients_finite(rng):
    import jax

    feats = rng.randn(8, 16).astype(np.float32)
    labels = np.array([0, 0, 1, 1, 2, 2, 3, 3])
    g = jax.grad(lambda f: L.emotion_infonce(f, jnp.asarray(labels)))(
        jnp.asarray(feats))
    assert np.isfinite(np.asarray(g)).all()


def test_softmax_contrastive_matches_torch(rng):
    """test_emotion_gesture_diversity_iterative.py:111-127 oracle."""
    a = rng.randn(8, 32).astype(np.float32)
    b = rng.randn(8, 32).astype(np.float32)
    ta, tb = torch.tensor(a), torch.tensor(b)
    fa = F.normalize(ta, p=2, dim=1)
    fb = F.normalize(tb, p=2, dim=1)
    expanded = fa.expand(8, 8, 32).transpose(0, 1)
    dist = torch.norm(expanded - fb, p=2, dim=2)
    cross = torch.clamp(1.0 / (dist + 1e-8), min=1e-8)
    ref = F.cross_entropy(cross, torch.arange(8))
    ours = L.softmax_contrastive_loss(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-4)


def test_kl_divergence_zero_at_standard_normal():
    mu = jnp.zeros((4, 32))
    logvar = jnp.zeros((4, 32))
    assert float(L.kl_divergence(mu, logvar)) == 0.0


def test_bce_with_logits_matches_torch(rng):
    x = rng.randn(10, 1).astype(np.float32)
    ref1 = F.binary_cross_entropy_with_logits(
        torch.tensor(x), torch.ones(10, 1)
    )
    ref0 = F.binary_cross_entropy_with_logits(
        torch.tensor(x), torch.zeros(10, 1)
    )
    np.testing.assert_allclose(
        float(L.bce_with_logits(jnp.asarray(x), 1.0)), float(ref1), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(L.bce_with_logits(jnp.asarray(x), 0.0)), float(ref0), rtol=1e-5
    )


def test_staged_lr_ladder():
    from emotiongestures_tpu.core.schedules import staged_lr

    lr = staged_lr(2e-4)
    np.testing.assert_allclose(float(lr(0)), 2e-4, rtol=1e-6)
    np.testing.assert_allclose(float(lr(15)), 2e-4, rtol=1e-6)
    np.testing.assert_allclose(float(lr(16)), 2e-4 * 0.2, rtol=1e-6)
    np.testing.assert_allclose(float(lr(51)), 2e-4 * 0.01, rtol=1e-6)
    np.testing.assert_allclose(float(lr(81)), 2e-4 * 0.005, rtol=1e-6)
    np.testing.assert_allclose(float(lr(101)), 2e-4 * 0.001, rtol=1e-6)
