"""Loss functions reconstructed from the reference:

  * focal loss            — train_audio_classifier_K_fold.py:89-105
  * softmax contrastive   — test_emotion_gesture_diversity_iterative.py:80-127
  * GAN losses (generator/discriminator, non-saturating & LSGAN variants)
  * KL divergence for the CVAE prior — CAVE/BEAT_CVAE.py (standard VAE ELBO)
  * regression losses (L1 / L2 / Huber) with the reference's x100 weighting
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Per-sample CE with integer labels; mirrors torch CrossEntropyLoss
    (reduction='none')."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]


def focal_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    alpha: Optional[jnp.ndarray] = None,
    gamma: float = 2.0,
    reduction: str = "mean",
) -> jnp.ndarray:
    """Focal loss (train_audio_classifier_K_fold.py:96-105):
    ce = CE(logits, y); pt = exp(-ce); loss = alpha_y * (1-pt)^gamma * ce.

    `alpha` is a per-class weight vector (the reference's intent with its
    per-epoch class re-weighting, train_...py:147-151); scalar also accepted.
    """
    ce = cross_entropy(logits, labels)
    pt = jnp.exp(-ce)
    if alpha is None:
        a = 1.0
    else:
        alpha = jnp.asarray(alpha)
        a = alpha[labels] if alpha.ndim > 0 else alpha
    loss = a * (1.0 - pt) ** gamma * ce
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    return loss


def softmax_contrastive_loss(
    feat_a: jnp.ndarray, feat_b: jnp.ndarray
) -> jnp.ndarray:
    """SoftmaxContrastiveLoss (test_...py:80-127): l2-normalise both feature
    sets, build a B×B inverse-distance similarity matrix, cross-entropy
    against the diagonal (InfoNCE-style disentanglement loss)."""
    a = feat_a / jnp.maximum(
        jnp.linalg.norm(feat_a, axis=1, keepdims=True), 1e-12
    )
    b = feat_b / jnp.maximum(
        jnp.linalg.norm(feat_b, axis=1, keepdims=True), 1e-12
    )
    # pairwise l2 distance: ||a_i - b_j||
    d2 = (
        jnp.sum(a**2, axis=1)[:, None]
        - 2.0 * a @ b.T
        + jnp.sum(b**2, axis=1)[None, :]
    )
    dist = jnp.sqrt(jnp.maximum(d2, 1e-12))
    cross = jnp.clip(1.0 / (dist + 1e-8), min=1e-8)
    labels = jnp.arange(a.shape[0])
    return jnp.mean(cross_entropy(cross, labels))


def emotion_infonce(
    features: jnp.ndarray, labels: jnp.ndarray
) -> jnp.ndarray:
    """Paired-clip emotion InfoNCE (reconstruction; see train/gan.py).

    Supervised contrastive loss over pooled emotion features using the
    reference's similarity kernel (SoftmaxContrastiveLoss,
    test_emotion_gesture_diversity_iterative.py:80-127: l2-normalise,
    inverse pairwise l2 distance): clips SHARING an emotion label are
    positives, all other clips in the batch are negatives. Clips with no
    same-label partner in the batch contribute zero (standard SupCon
    handling of empty positive sets).

    `features` (B, D) pooled emotion features; `labels` (B,) int classes.
    """
    f = features / jnp.maximum(
        jnp.linalg.norm(features, axis=1, keepdims=True), 1e-12
    )
    d2 = (
        jnp.sum(f**2, axis=1)[:, None]
        - 2.0 * f @ f.T
        + jnp.sum(f**2, axis=1)[None, :]
    )
    dist = jnp.sqrt(jnp.maximum(d2, 1e-12))
    sim = jnp.clip(1.0 / (dist + 1e-8), min=1e-8)
    b = features.shape[0]
    eye = jnp.eye(b, dtype=bool)
    pos = (labels[:, None] == labels[None, :]) & ~eye
    # log-softmax over all non-self clips; positive mass aggregated
    logits = jnp.where(eye, -jnp.inf, sim)
    logp = jax.nn.log_softmax(logits, axis=1)
    pos_logp = jax.scipy.special.logsumexp(
        jnp.where(pos, logp, -jnp.inf), axis=1
    )
    has_pos = pos.any(axis=1)
    per_clip = jnp.where(has_pos, -pos_logp, 0.0)
    denom = jnp.maximum(jnp.sum(has_pos), 1)
    return jnp.sum(per_clip) / denom


def kl_divergence(mu: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
    """KL(q(z|x) || N(0, I)) summed over latent dims, averaged over batch."""
    return jnp.mean(
        -0.5 * jnp.sum(1.0 + logvar - mu**2 - jnp.exp(logvar), axis=-1)
    )


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred - target))


def l2_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - target) ** 2)


def huber_loss(
    pred: jnp.ndarray, target: jnp.ndarray, delta: float = 1.0
) -> jnp.ndarray:
    err = pred - target
    abs_err = jnp.abs(err)
    quad = jnp.minimum(abs_err, delta)
    return jnp.mean(0.5 * quad**2 + delta * (abs_err - quad))


# ---------------------------------------------------------------------------
# GAN losses. The released reference has no train loop; these reconstruct
# the standard objectives its discriminators imply: Motion_Discriminator
# emits raw scores (no sigmoid, Models_memory.py:600-603) -> BCE-with-logits
# / hinge; Pose_Discriminator emits sigmoid probs (Models.py:482-510) -> BCE.
# ---------------------------------------------------------------------------


def bce_with_logits(logits: jnp.ndarray, target: float) -> jnp.ndarray:
    t = jnp.full_like(logits, target)
    return jnp.mean(
        jnp.maximum(logits, 0) - logits * t + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def gan_d_loss(real_logits: jnp.ndarray, fake_logits: jnp.ndarray) -> jnp.ndarray:
    return bce_with_logits(real_logits, 1.0) + bce_with_logits(fake_logits, 0.0)


def gan_g_loss(fake_logits: jnp.ndarray) -> jnp.ndarray:
    return bce_with_logits(fake_logits, 1.0)


def hinge_d_loss(real_logits: jnp.ndarray, fake_logits: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jax.nn.relu(1.0 - real_logits)) + jnp.mean(
        jax.nn.relu(1.0 + fake_logits)
    )


def hinge_g_loss(fake_logits: jnp.ndarray) -> jnp.ndarray:
    return -jnp.mean(fake_logits)


def lsgan_d_loss(real: jnp.ndarray, fake: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((real - 1.0) ** 2) + jnp.mean(fake**2)


def lsgan_g_loss(fake: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((fake - 1.0) ** 2)
