"""TED-side FGD evaluator (model/embedding_space_evaluator.py:16-209):
wraps the EmbeddingNet (pose_dim 27) or MotionAE (pose_dim 126) feature
nets, accumulates real/generated latents, and reports Frechet distance,
feature distance, diversity, and reconstruction diagnostics.

Feature extraction runs jitted on device; statistics stay host-side.
UMAP visualisation is gated on the optional `umap` dependency.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models.baselines import EmbeddingNet, MotionAE
from .fgd import calculate_frechet_distance


class EmbeddingSpaceEvaluator:
    def __init__(self, pose_dim: int, n_frames: int = 34, n_words: int = 64,
                 latent_dim: int = 128, n_pre_poses: int = 4,
                 variables=None, seed: int = 0):
        self.pose_dim = pose_dim
        self.n_pre_poses = n_pre_poses
        if pose_dim == 126:
            self.net = MotionAE(pose_dim=pose_dim, latent_dim=latent_dim)
            dummy = jnp.zeros((1, n_frames, pose_dim), jnp.float32)
            self.variables = variables or self.net.init(
                jax.random.PRNGKey(seed), dummy)

            @jax.jit
            def embed(v, poses):
                recon, feat = self.net.apply(v, poses, train=False)
                return recon, feat

            self._embed = embed
        else:
            self.net = EmbeddingNet(n_words=n_words, pose_dim=pose_dim,
                                    n_frames=n_frames, mode="pose")
            dummy = jnp.zeros((1, n_frames, pose_dim), jnp.float32)
            pre = jnp.zeros((1, n_pre_poses, pose_dim), jnp.float32)
            self.variables = variables or self.net.init(
                {"params": jax.random.PRNGKey(seed),
                 "sample": jax.random.PRNGKey(seed + 1)},
                None, None, pre, dummy)

            @jax.jit
            def embed(v, poses):
                pre = poses[:, : self.n_pre_poses]
                _, _, _, feat, _, _, recon = self.net.apply(
                    v, None, None, pre, poses, input_mode="pose",
                    variational_encoding=False, train=False,
                    rngs={"sample": jax.random.PRNGKey(0)})
                return recon, feat

            self._embed = embed
        self.reset()

    def reset(self):
        self.context_feat_list = []
        self.real_feat_list = []
        self.generated_feat_list = []
        self.recon_err_diff = []
        self.cos_err_diff = []

    def get_no_of_samples(self):
        return len(self.real_feat_list)

    @staticmethod
    def _recon_err(recon, poses):
        """Per-sample L1 + pose-diff L1 (embedding_space_evaluator.py:79-98)."""
        loss = np.mean(np.abs(recon - poses), axis=(1, 2))
        target_diff = poses[:, 1:] - poses[:, :-1]
        recon_diff = recon[:, 1:] - recon[:, :-1]
        loss = loss + np.mean(np.abs(recon_diff - target_diff), axis=(1, 2))
        return np.sum(loss)

    @staticmethod
    def _cos_err(recon, poses):
        r = recon.reshape(recon.shape[0], recon.shape[1], -1, 3)
        p = poses.reshape(poses.shape[0], poses.shape[1], -1, 3)
        num = np.sum(r * p, axis=-1)
        den = np.maximum(
            np.linalg.norm(r, axis=-1) * np.linalg.norm(p, axis=-1), 1e-8)
        return np.sum(1.0 - num / den)

    def push_samples(self, generated_poses, real_poses):
        real_recon, real_feat = [np.asarray(x) for x in self._embed(
            self.variables, jnp.asarray(real_poses))]
        gen_recon, gen_feat = [np.asarray(x) for x in self._embed(
            self.variables, jnp.asarray(generated_poses))]
        self.real_feat_list.append(real_feat)
        self.generated_feat_list.append(gen_feat)
        real_poses = np.asarray(real_poses)
        generated_poses = np.asarray(generated_poses)
        self.recon_err_diff.append(
            self._recon_err(gen_recon, generated_poses)
            - self._recon_err(real_recon, real_poses))
        self.cos_err_diff.append(
            self._cos_err(gen_recon, generated_poses)
            - self._cos_err(real_recon, real_poses))

    def get_diversity_scores(self, seed: int = 0):
        """(embedding_space_evaluator.py:115-125)."""
        feat1 = np.vstack(self.generated_feat_list[:500])
        rng = np.random.RandomState(seed)
        random_idx = rng.permutation(len(self.generated_feat_list))[:500]
        feat2 = np.vstack([self.generated_feat_list[i] for i in random_idx])
        return float(np.mean(np.sum(np.abs(feat1 - feat2), axis=-1)))

    def get_scores(self):
        """(frechet_dist, feat_dist); ValueError -> 1e10
        (embedding_space_evaluator.py:127-154)."""
        generated = np.vstack(self.generated_feat_list)
        real = np.vstack(self.real_feat_list)
        mu_g, s_g = np.mean(generated, 0), np.cov(generated, rowvar=False)
        mu_r, s_r = np.mean(real, 0), np.cov(real, rowvar=False)
        fd = calculate_frechet_distance(mu_g, s_g, mu_r, s_r)
        if fd == 100:  # our fgd helper's ValueError sentinel
            fd = 1e10  # this evaluator's convention
        feat_dist = float(np.mean(
            np.sum(np.abs(real - generated[: len(real)]), axis=-1)))
        return fd, feat_dist

    def get_features_for_viz(self):
        """UMAP 2-d projection; requires the optional `umap` package."""
        import umap  # gated optional dep

        generated = np.vstack(self.generated_feat_list)
        real = np.vstack(self.real_feat_list)
        transformed = umap.UMAP().fit_transform(
            np.vstack((generated, real)))
        n = transformed.shape[0] // 2
        return transformed[n:], transformed[:n]
