"""Numerical-parity harness (SURVEY.md §4): transplant our flax generator
weights into the ACTUAL reference torch model
(/root/reference/Full_model/Models_memory.py) and compare full forwards
at fp32. This validates every layer's math end-to-end — attention,
post-LN ordering, SE-ResNet, TCN weight-norm, memory modules, reshapes.

Skipped when the reference tree is unavailable.
"""
import sys
import types
from pathlib import Path

import numpy as np
import pytest

REFERENCE = Path("/root/reference")

pytestmark = pytest.mark.skipif(
    not REFERENCE.exists(), reason="reference tree not mounted")


@pytest.fixture(scope="module")
def reference_transformer():
    sys.path.insert(0, str(REFERENCE))
    if "torch_dct" not in sys.modules:
        sys.modules["torch_dct"] = types.ModuleType("torch_dct")
    from Full_model.Models_memory import Transformer

    yield Transformer
    sys.path.remove(str(REFERENCE))


def test_generator_forward_matches_reference(reference_transformer, rng):
    import jax
    import jax.numpy as jnp
    import torch

    from emotiongestures_tpu.models import GestureTransformer
    from emotiongestures_tpu.utils.torch_port import (
        flax_generator_to_torch_state,
        load_into_torch,
    )

    N_WORDS, B = 24, 2
    ours = GestureTransformer(n_words=N_WORDS)  # flagship dims
    spec = rng.randn(B, 128, 124).astype(np.float32)
    text = rng.randint(0, N_WORDS, (B, 60))
    prior = rng.randn(B, 10, 282).astype(np.float32)
    sampled = rng.randn(B, 60, 512).astype(np.float32)

    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(spec),
                          jnp.asarray(text), jnp.asarray(prior))
    out_j = ours.apply(variables, jnp.asarray(spec), jnp.asarray(text),
                       jnp.asarray(prior), jnp.asarray(sampled),
                       train=False)
    poses_j, emo_j, sem_j, pred_j, text_j = [np.asarray(x) for x in out_j]

    args = types.SimpleNamespace(dropout_prob=0.1, freeze_wordembed=False,
                                 hidden_size=300, n_layers=3,
                                 wordembed_dim=300, chunk=10)
    lang = types.SimpleNamespace(n_words=N_WORDS,
                                 word_embedding_weights=None)
    ref = reference_transformer(
        args, lang, frames=60, pose_dim=282, prior_frames=10,
        d_word_vec=512, d_model=512, d_inner=2048, n_layers=3, n_head=8,
        d_k=64, d_v=64)
    state = flax_generator_to_torch_state(variables)
    missing = load_into_torch(ref, state)
    assert not missing, f"unmapped params: {missing[:10]}"
    ref.eval()
    with torch.no_grad():
        out_t = ref(torch.tensor(spec), torch.tensor(text),
                    torch.tensor(prior), torch.tensor(sampled))
    poses_t, emo_t, sem_t, pred_t, text_t = [x.numpy() for x in out_t]

    np.testing.assert_allclose(text_j, text_t, rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(emo_j, emo_t, rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(sem_j, sem_t, rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(pred_j, pred_t, rtol=2e-3, atol=5e-4)
    np.testing.assert_allclose(poses_j, poses_t, rtol=2e-3, atol=5e-4)


def test_motion_discriminator_matches_reference(rng):
    """Same harness for the Motion_Discriminator (built at d_model=282,
    the only internally consistent configuration)."""
    import jax
    import jax.numpy as jnp
    import torch

    sys.path.insert(0, str(REFERENCE))
    if "torch_dct" not in sys.modules:
        sys.modules["torch_dct"] = types.ModuleType("torch_dct")
    try:
        from Full_model.Models_memory import Motion_Discriminator
    finally:
        sys.path.remove(str(REFERENCE))

    from emotiongestures_tpu.models import MotionDiscriminator
    from emotiongestures_tpu.utils.torch_port import (
        _TO_TORCH,
        _enc_layers,
        _get,
        _seq_linears,
        load_into_torch,
    )

    B = 2
    ours = MotionDiscriminator()
    offsets = rng.randn(B, 59, 282).astype(np.float32)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(offsets))
    score_j = np.asarray(ours.apply(variables, jnp.asarray(offsets),
                                    train=False))

    ref = Motion_Discriminator(frames=59, pose_dim=282, d_word_vec=282,
                               d_model=282, d_inner=1024, n_layers=2,
                               n_head=8, d_k=64, d_v=64, n_position=59)
    table = []
    _enc_layers(table, "encoder", ("encoder",), 2, "slf_attn")
    _seq_linears(table, "fc1", (), ("fc1",), (0,))
    _seq_linears(table, "fc2", (),
                 ("fc2_0", "fc2_1", "fc2_2", "fc2_3", "fc2_4", "fc2_out"),
                 (0, 2, 4, 6, 8, 10))
    state = {k: _TO_TORCH[kind](_get(variables, path))
             for k, path, kind in table}
    missing = load_into_torch(ref, state)
    assert not missing, missing[:5]
    ref.eval()
    with torch.no_grad():
        score_t = ref(torch.tensor(offsets)).numpy()
    np.testing.assert_allclose(score_j, score_t, rtol=2e-3, atol=5e-4)


def test_reference_checkpoint_import(reference_transformer, rng):
    """Import direction: a torch state_dict (with DataParallel 'module.'
    prefixes like real reference checkpoints) loads into our variables
    and reproduces the torch forward."""
    import jax
    import jax.numpy as jnp
    import torch

    from emotiongestures_tpu.models import GestureTransformer
    from emotiongestures_tpu.utils.torch_port import (
        torch_state_to_flax_generator,
    )

    N_WORDS, B = 24, 2
    args = types.SimpleNamespace(dropout_prob=0.1, freeze_wordembed=False,
                                 hidden_size=300, n_layers=3,
                                 wordembed_dim=300, chunk=10)
    lang = types.SimpleNamespace(n_words=N_WORDS,
                                 word_embedding_weights=None)
    ref = reference_transformer(
        args, lang, frames=60, pose_dim=282, prior_frames=10,
        d_word_vec=512, d_model=512, d_inner=2048, n_layers=3, n_head=8,
        d_k=64, d_v=64)
    ref.eval()
    # simulate a DataParallel-saved checkpoint
    torch_state = {"module." + k: v.numpy()
                   for k, v in ref.state_dict().items()}

    ours = GestureTransformer(n_words=N_WORDS)
    spec = rng.randn(B, 128, 124).astype(np.float32)
    text = rng.randint(0, N_WORDS, (B, 60))
    prior = rng.randn(B, 10, 282).astype(np.float32)
    sampled = rng.randn(B, 60, 512).astype(np.float32)
    template = ours.init(jax.random.PRNGKey(0), jnp.asarray(spec),
                         jnp.asarray(text), jnp.asarray(prior))
    variables, unmapped = torch_state_to_flax_generator(template,
                                                        torch_state)
    # legitimately unmapped: buffers (pos tables), never-applied layer
    # norms, the torch TCN's duplicate `net.{i}` aliases, and the decoder
    # self-attention weights the reference constructs but never calls
    # (Full_model/Layers.py:53-54)
    assert all("pos_table" in k or "layer_norm" in k
               or "position_embeddings" in k or ".net." in k
               or k.startswith("decoder.") and ".slf_attn." in k
               for k in unmapped), unmapped

    with torch.no_grad():
        poses_t = ref(torch.tensor(spec), torch.tensor(text),
                      torch.tensor(prior), torch.tensor(sampled))[0].numpy()
    poses_j = np.asarray(ours.apply(
        variables, jnp.asarray(spec), jnp.asarray(text), jnp.asarray(prior),
        jnp.asarray(sampled), train=False)[0])
    np.testing.assert_allclose(poses_j, poses_t, rtol=2e-3, atol=5e-4)


def test_reference_dict_checkpoint_loader(tmp_path):
    """Rich dict checkpoints (utils/train_utils.py:168-213) load with
    module.-prefix stripping on every contained state_dict."""
    import torch

    from emotiongestures_tpu.utils.torch_port import (
        load_reference_dict_checkpoint,
    )

    ckpt = {"args": {"n_poses": 34}, "epoch": 7, "lang_model": None,
            "speaker_model": None, "pose_dim": 27,
            "gen_dict": {"module.fc.weight": torch.zeros(2, 3)},
            "gen_dict_1": {"module.gru.weight": torch.ones(4)},
            "audio_dict": {"module.conv.weight": torch.ones(1)}}
    p = tmp_path / "ckpt.pth"
    torch.save(ckpt, p)
    out = load_reference_dict_checkpoint(p)
    assert "fc.weight" in out["gen_dict"]
    assert "gru.weight" in out["gen_dict_1"]
    assert "conv.weight" in out["audio_dict"]
    assert out["epoch"] == 7 and out["pose_dim"] == 27


def test_checkpoint_loader_refuses_pickle_by_default(tmp_path):
    """ADVICE r3: arbitrary-object checkpoints (the reference's real rich
    dicts carry an argparse.Namespace + Vocab) must not unpickle without
    the explicit allow_pickle opt-in; with it, they load."""
    import argparse as ap

    import pytest
    import torch

    from emotiongestures_tpu.utils.torch_port import (
        load_reference_dict_checkpoint,
        load_reference_state_dict,
    )

    ckpt = {"args": ap.Namespace(n_poses=34), "epoch": 7,
            "gen_dict": {"module.fc.weight": torch.zeros(2, 3)}}
    p = tmp_path / "rich.pth"
    torch.save(ckpt, p)
    with pytest.raises(RuntimeError, match="allow_pickle"):
        load_reference_dict_checkpoint(p)
    with pytest.raises(RuntimeError, match="allow_pickle"):
        load_reference_state_dict(p)
    out = load_reference_dict_checkpoint(p, allow_pickle=True)
    assert "fc.weight" in out["gen_dict"]
    sd = load_reference_state_dict(p, allow_pickle=True)
    assert "module.fc.weight" in sd
    # plain state_dicts stay loadable with the safe default
    plain = tmp_path / "plain.pth"
    torch.save({"fc.weight": torch.zeros(2, 3)}, plain)
    assert "fc.weight" in load_reference_state_dict(plain)
