"""Weight-transplant numerical parity for the frozen metric/auxiliary
nets the eval entry point restores (test_...py:148-174): the FGD feature
autoencoder, the audio EmotionNet classifier, the skeleton emotion
classifier, and the CVAE-v3 emotion prior. Same harness as
tests/test_torch_parity.py: init our flax module, transport weights into
the actual reference torch module via utils/torch_port tables, run both
forwards at fp32 in eval mode, compare.

These four nets DEFINE the reported metrics (FGD features, Emotion-Acc,
diversity sampling), so numerical parity here is what makes our metric
numbers comparable to the reference's.
"""
import sys
from pathlib import Path

import numpy as np
import pytest

REFERENCE = Path("/root/reference")

pytestmark = pytest.mark.skipif(
    not REFERENCE.exists(), reason="reference tree not mounted")


@pytest.fixture()
def ref_path():
    sys.path.insert(0, str(REFERENCE))
    # the reference files import torchvision at module scope but never
    # use it on these paths; it is not in this image — stub it out
    import types

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.models = types.ModuleType("torchvision.models")
        tv.utils = types.ModuleType("torchvision.utils")
        tv.utils.save_image = lambda *a, **k: None
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv.models
        sys.modules["torchvision.utils"] = tv.utils
    if "torch_dct" not in sys.modules:  # imported, never called (SURVEY §0)
        sys.modules["torch_dct"] = types.ModuleType("torch_dct")
    if "fasttext" not in sys.modules:  # model/vocab.py module-scope import
        sys.modules["fasttext"] = types.ModuleType("fasttext")
    yield
    sys.path.remove(str(REFERENCE))


def test_fgd_ae_matches_reference(ref_path, rng):
    """model/FGD.py:26-82 MLP_Reconstruct: per-frame MLP AE; the 512-d
    latent is the FGD feature space (test_...py:226-232)."""
    import jax
    import jax.numpy as jnp
    import torch

    from model.FGD import MLP_Reconstruct as RefFGD

    from emotiongestures_tpu.models.fgd_ae import FGDAutoEncoder
    from emotiongestures_tpu.utils.torch_port import (
        flax_fgd_ae_to_torch_state,
        load_into_torch,
    )

    B, T, D = 3, 60, 282
    ours = FGDAutoEncoder()
    x = rng.randn(B, T, D).astype(np.float32)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))
    recon_j, latent_j = ours.apply(variables, jnp.asarray(x), train=False)

    ref = RefFGD()
    missing = load_into_torch(ref, flax_fgd_ae_to_torch_state(variables))
    assert not missing, f"unmapped params: {missing[:10]}"
    ref.eval()
    with torch.no_grad():
        recon_t, latent_t = ref(torch.tensor(x))
    np.testing.assert_allclose(np.asarray(latent_j), latent_t.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(recon_j), recon_t.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_emotion_net_matches_reference(ref_path, rng):
    """model/audio_emotion_classifer.py:17-49 EmotionNet: 4-stage
    SE-ResNet over (B, 128, 124) log-mel -> flatten -> MLP -> 8 logits."""
    import jax
    import jax.numpy as jnp
    import torch

    from model.audio_emotion_classifer import EmotionNet as RefNet

    from emotiongestures_tpu.models.emotion_net import EmotionNet
    from emotiongestures_tpu.utils.torch_port import (
        flax_emotion_net_to_torch_state,
        load_into_torch,
    )

    B = 2
    spec = rng.randn(B, 128, 124).astype(np.float32)
    ours = EmotionNet()
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(spec))
    logits_j = np.asarray(ours.apply(variables, jnp.asarray(spec),
                                     train=False))

    ref = RefNet()
    missing = load_into_torch(ref, flax_emotion_net_to_torch_state(
        variables))
    assert not missing, f"unmapped params: {missing[:10]}"
    ref.eval()
    with torch.no_grad():
        logits_t = ref(torch.tensor(spec)).numpy()
    # 22-conv stack + 4096-fan-in MLP compounds fp32 reassociation error
    np.testing.assert_allclose(logits_j, logits_t, rtol=2e-3, atol=2e-4)


def test_skeleton_classifier_matches_reference(ref_path, rng):
    """skeleton_classifer/Models.py:199-283 Transformer at the eval entry
    point's construction (test_...py:158: d_model=512, d_inner=2048,
    3 layers)."""
    import jax
    import jax.numpy as jnp
    import torch

    from skeleton_classifer.Models import Transformer as RefClf

    from emotiongestures_tpu.models.skeleton_classifier import (
        SkeletonTransformer,
    )
    from emotiongestures_tpu.utils.torch_port import (
        flax_skeleton_classifier_to_torch_state,
        load_into_torch,
    )

    B, T, D = 2, 60, 282
    poses = rng.randn(B, T, D).astype(np.float32)
    ours = SkeletonTransformer()
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(poses))
    logits_j, mid_j = ours.apply(variables, jnp.asarray(poses), train=False)

    ref = RefClf(class_dim=8, pose_dim=D, d_word_vec=512, d_model=512,
                 d_inner=2048, n_layers=3, n_head=8, d_k=64, d_v=64,
                 n_position=60)
    missing = load_into_torch(ref, flax_skeleton_classifier_to_torch_state(
        variables))
    assert not missing, f"unmapped params: {missing[:10]}"
    ref.eval()
    with torch.no_grad():
        logits_t, mid_t = ref(torch.tensor(poses))
    np.testing.assert_allclose(np.asarray(mid_j), mid_t.numpy(),
                               rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(logits_j), logits_t.numpy(),
                               rtol=2e-3, atol=2e-4)


def test_cvae_v3_posterior_matches_reference(ref_path, rng):
    """CAVE/BEAT_CVAE.py:312-460 MLP_Reconstruct_v3 forward with the
    reparameterization pinned to a fixed z (mu/logvar compared exactly;
    decode compared by feeding both frameworks the same z through the
    deterministic tail)."""
    import jax
    import jax.numpy as jnp
    import torch

    from CAVE.BEAT_CVAE import MLP_Reconstruct_v3 as RefVAE

    from emotiongestures_tpu.models.cvae import EmotionCVAEv3
    from emotiongestures_tpu.utils.torch_port import (
        flax_cvae_v3_to_torch_state,
        load_into_torch,
    )

    B = 2
    x = rng.randn(B, 60, 512).astype(np.float32)
    y = np.eye(8, dtype=np.float32)[rng.randint(0, 8, B)]
    ours = EmotionCVAEv3()
    variables = ours.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.asarray(x), jnp.asarray(y))

    ref = RefVAE()
    missing = load_into_torch(ref, flax_cvae_v3_to_torch_state(variables))
    assert not missing, f"unmapped params: {missing[:10]}"
    ref.eval()

    # posterior heads: mu/logvar are deterministic
    _, mu_j, logvar_j = ours.apply(
        variables, jnp.asarray(x), jnp.asarray(y), train=False,
        rngs={"sample": jax.random.PRNGKey(2)})
    with torch.no_grad():
        _, mu_t, logvar_t = ref(torch.tensor(x), torch.tensor(y))
    np.testing.assert_allclose(np.asarray(mu_j), mu_t.numpy(),
                               rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(logvar_j), logvar_t.numpy(),
                               rtol=2e-3, atol=1e-4)

    # decoder tail incl. the two stride-2 ConvTranspose1d: drive both
    # frameworks with the same z through sample()'s deterministic path
    z = rng.randn(B, 32).astype(np.float32)

    def sample_with_fixed_z(variables, y, z):
        def inner(mdl, y, z):
            post_y = mdl.y_embed(y, train=False)
            return mdl._fuse_decode(jnp.asarray(z), post_y, y.shape[0],
                                    False)
        return ours.apply(variables, jnp.asarray(y), z, method=inner)

    out_j = np.asarray(sample_with_fixed_z(variables, y, z))
    with torch.no_grad():
        post_y = ref.Posterior_Y_embedding(torch.tensor(y))
        zz = torch.cat([torch.tensor(z), post_y], dim=1)
        zz = ref.fusion_z_posterior(zz).reshape(B, 4, 128)
        out_t = ref.Decoder(zz).numpy()
    np.testing.assert_allclose(out_j, out_t, rtol=2e-3, atol=1e-4)


# ---------------------------------------------------------------------------
# Import direction (reference .pth -> our variables): the generic
# torch_table_to_flax_state must invert every table exactly, so a
# migrating user can restore the reference's frozen aux checkpoints
# (FGD iter8100 / skeleton iter7500 / CVAE iter35200, test_...py:148-174)
# into this framework.
# ---------------------------------------------------------------------------


def _assert_trees_equal(a, b):
    import jax

    fa, ta = jax.tree_util.tree_flatten(a)
    fb, tb = jax.tree_util.tree_flatten(b)
    assert ta == tb
    for la, lb in zip(fa, fb):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


@pytest.mark.parametrize("which", ["fgd", "emotion", "skeleton", "cvae3"])
def test_aux_import_roundtrip(which, rng):
    """flax -> torch state -> flax must reproduce the variables bit-for-
    bit (validates the _FROM_TORCH inverses incl. the convT1d flip)."""
    import jax
    import jax.numpy as jnp

    from emotiongestures_tpu.utils import torch_port as tp

    if which == "fgd":
        from emotiongestures_tpu.models.fgd_ae import FGDAutoEncoder

        model, table = FGDAutoEncoder(), tp.fgd_ae_mapping()
        args = (jnp.zeros((2, 60, 282)),)
    elif which == "emotion":
        from emotiongestures_tpu.models.emotion_net import EmotionNet

        model, table = EmotionNet(), tp.emotion_net_mapping()
        args = (jnp.zeros((1, 128, 124)),)
    elif which == "skeleton":
        from emotiongestures_tpu.models.skeleton_classifier import (
            SkeletonTransformer,
        )

        model = SkeletonTransformer(d_model=64, d_inner=128, d_k=8, d_v=8)
        table = tp.skeleton_classifier_mapping(n_layers=3)
        args = (jnp.zeros((2, 60, 282)),)
    else:
        from emotiongestures_tpu.models.cvae import EmotionCVAEv3

        model, table = EmotionCVAEv3(), tp.cvae_v3_mapping()
        args = (jnp.zeros((2, 60, 512)), jnp.zeros((2, 8)))

    rngs = {"params": jax.random.PRNGKey(3), "sample": jax.random.PRNGKey(4)}
    variables = model.init(rngs, *args)
    state = tp.flax_table_to_torch_state(variables, table)
    # simulate a DataParallel-saved reference checkpoint
    state = {f"module.{k}": v for k, v in state.items()}
    restored, unmapped = tp.torch_table_to_flax_state(
        variables, state, table)
    assert not unmapped
    _assert_trees_equal(
        {k: variables[k] for k in restored}, restored)


def test_gru_import_roundtrip(rng):
    """gru_specs path of torch_table_to_flax_state: the torch nn.GRU
    gate-fold export (gru_cell_to_torch) must invert exactly through
    torch_to_gru_cell, including the r/z bias folding."""
    import jax
    import jax.numpy as jnp

    from emotiongestures_tpu.models.baselines.hierarchy import (
        HierarchicalDiscriminator,
    )
    from emotiongestures_tpu.utils import torch_port as tp

    model = HierarchicalDiscriminator(hidden_size=16, n_layers=2)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 60, 27)))
    state = tp.flax_hierarchy_discriminator_to_torch_state(
        variables, n_layers=2)
    table = []
    tp._linear(table, "out", ("out",))
    tp._linear(table, "out2", ("out2",))
    restored, unmapped = tp.torch_table_to_flax_state(
        variables, state, table,
        gru_specs=[("gru", ("gru",), 2, True)])
    assert not unmapped
    _assert_trees_equal({k: variables[k] for k in restored}, restored)


# ---------------------------------------------------------------------------
# Remaining CVAE generations + small heads: v1/v2 (forward path only —
# their reference sample() crashes on an undefined `Input`,
# CAVE/BEAT_CVAE.py:139, quirk documented in models/cvae.py), the legacy
# 90-d HandCVAE, Pose_Discriminator, DisNet.
# ---------------------------------------------------------------------------


def _pinned_z_decode_ours(model, variables, y, z):
    import jax.numpy as jnp

    def inner(mdl, y, z):
        post_y = mdl.y_embed(y, train=False)
        return mdl._fuse_decode(jnp.asarray(z), post_y, y.shape[0], False)

    return np.asarray(model.apply(variables, y, z, method=inner))


@pytest.mark.parametrize("version", ["v1", "v2"])
def test_cvae_v1_v2_matches_reference(ref_path, rng, version):
    """CAVE/BEAT_CVAE.py MLP_Reconstruct (v1, :30-154) and _v2
    (:157-308): posterior heads exact; decoder tail driven with a
    pinned z."""
    import jax
    import jax.numpy as jnp
    import torch

    import CAVE.BEAT_CVAE as ref_mod

    from emotiongestures_tpu.models.cvae import (
        EmotionCVAEv1,
        EmotionCVAEv2,
    )
    from emotiongestures_tpu.utils import torch_port as tp

    if version == "v1":
        ours, ref = EmotionCVAEv1(), ref_mod.MLP_Reconstruct()
        table = tp.cvae_v1_mapping()
    else:
        ours, ref = EmotionCVAEv2(), ref_mod.MLP_Reconstruct_v2()
        table = tp.cvae_v2_mapping()

    B = 2
    x = rng.randn(B, 60, 512).astype(np.float32)
    y = np.eye(8, dtype=np.float32)[rng.randint(0, 8, B)]
    variables = ours.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.asarray(x), jnp.asarray(y))
    missing = tp.load_into_torch(
        ref, tp.flax_table_to_torch_state(variables, table))
    assert not missing, f"unmapped params: {missing[:10]}"
    ref.eval()

    _, mu_j, logvar_j = ours.apply(
        variables, jnp.asarray(x), jnp.asarray(y), train=False,
        rngs={"sample": jax.random.PRNGKey(2)})
    with torch.no_grad():
        _, mu_t, logvar_t = ref(torch.tensor(x), torch.tensor(y))
    np.testing.assert_allclose(np.asarray(mu_j), mu_t.numpy(),
                               rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(logvar_j), logvar_t.numpy(),
                               rtol=2e-3, atol=1e-4)

    z = rng.randn(B, 32).astype(np.float32)
    out_j = _pinned_z_decode_ours(ours, variables, jnp.asarray(y), z)
    with torch.no_grad():
        post_y = ref.Posterior_Y_embedding(torch.tensor(y))
        zz = torch.cat([torch.tensor(z), post_y], dim=1)
        zz = ref.fusion_z_posterior(zz).reshape(B, 60, 32)
        out_t = ref.Decoder(zz).numpy()
    np.testing.assert_allclose(out_j, out_t, rtol=2e-3, atol=1e-4)


def test_hand_cvae_matches_reference(ref_path, rng):
    """Full_model/BEAT_CVAE.py:30-149 legacy 90-d hand CVAE (condition
    is a 90-d pose, not a class one-hot)."""
    import jax
    import jax.numpy as jnp
    import torch

    from Full_model.BEAT_CVAE import MLP_Reconstruct as RefHand

    from emotiongestures_tpu.models.cvae import HandCVAE
    from emotiongestures_tpu.utils import torch_port as tp

    B = 3
    x = rng.randn(B, 90).astype(np.float32)
    y = rng.randn(B, 90).astype(np.float32)
    ours = HandCVAE()
    variables = ours.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.asarray(x), jnp.asarray(y))
    ref = RefHand()
    missing = tp.load_into_torch(
        ref, tp.flax_table_to_torch_state(variables, tp.hand_cvae_mapping()))
    assert not missing, f"unmapped params: {missing[:10]}"
    ref.eval()

    _, mu_j, logvar_j = ours.apply(
        variables, jnp.asarray(x), jnp.asarray(y), train=False,
        rngs={"sample": jax.random.PRNGKey(2)})
    with torch.no_grad():
        _, mu_t, logvar_t = ref(torch.tensor(x), torch.tensor(y))
    np.testing.assert_allclose(np.asarray(mu_j), mu_t.numpy(),
                               rtol=2e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(logvar_j), logvar_t.numpy(),
                               rtol=2e-3, atol=1e-5)

    z = rng.randn(B, 32).astype(np.float32)

    def inner(mdl, y, z):
        import jax.numpy as jnp

        post_y = mdl.y_embed(y, train=False)
        return mdl._fuse_decode(jnp.asarray(z), post_y, False)

    out_j = np.asarray(ours.apply(variables, jnp.asarray(y), z,
                                  method=inner))
    with torch.no_grad():
        post_y = ref.Posterior_Y_embedding(torch.tensor(y))
        zz = torch.cat([torch.tensor(z), post_y], dim=1)
        out_t = ref.Decoder(ref.fusion_z_posterior(zz)).numpy()
    np.testing.assert_allclose(out_j, out_t, rtol=2e-3, atol=1e-5)


def test_pose_discriminator_matches_reference(ref_path, rng):
    """Full_model/Models.py:482-510 Pose_Discriminator at d_model=282
    (the only width where its hard-coded fc Linear(282, 64) typechecks)."""
    import jax
    import jax.numpy as jnp
    import torch

    from Full_model.Models import Pose_Discriminator as RefDis

    from emotiongestures_tpu.models.discriminator import PoseDiscriminator
    from emotiongestures_tpu.utils import torch_port as tp

    B = 2
    poses = rng.randn(B, 60, 282).astype(np.float32)
    ours = PoseDiscriminator()
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(poses))
    ref = RefDis(d_word_vec=282, d_model=282, d_inner=1024, n_layers=3)
    missing = tp.load_into_torch(
        ref, tp.flax_table_to_torch_state(
            variables, tp.pose_discriminator_mapping()))
    assert not missing, f"unmapped params: {missing[:10]}"
    ref.eval()
    out_j = np.asarray(ours.apply(variables, jnp.asarray(poses),
                                  train=False))
    with torch.no_grad():
        out_t = ref(torch.tensor(poses)).numpy()
    np.testing.assert_allclose(out_j, out_t, rtol=2e-3, atol=1e-5)


def test_disnet_matches_reference(ref_path, rng):
    """model/audio_emotion_classifer.py:51-70 DisNet."""
    import jax
    import jax.numpy as jnp
    import torch

    from model.audio_emotion_classifer import DisNet as RefDis

    from emotiongestures_tpu.models.emotion_net import DisNet
    from emotiongestures_tpu.utils import torch_port as tp

    feat = rng.randn(4, 128).astype(np.float32)
    ours = DisNet()
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(feat))
    ref = RefDis()
    missing = tp.load_into_torch(
        ref, tp.flax_table_to_torch_state(variables, tp.disnet_mapping()))
    assert not missing, f"unmapped params: {missing[:10]}"
    ref.eval()
    out_j = np.asarray(ours.apply(variables, jnp.asarray(feat)))
    with torch.no_grad():
        out_t = ref(torch.tensor(feat)).numpy()
    np.testing.assert_allclose(out_j, out_t, rtol=2e-3, atol=1e-5)
