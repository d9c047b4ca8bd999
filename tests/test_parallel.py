"""Multi-chip sharding tests on the 8-device virtual CPU mesh
(SURVEY.md §4). GSPMD data-parallel must match single-device math."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emotiongestures_tpu.data import SyntheticGestureDataset, make_batch
from emotiongestures_tpu.parallel import (
    apply_shardings,
    make_mesh,
    replicate,
    shard_batch,
    tp_param_shardings,
)
from emotiongestures_tpu.train import fgd, skeleton


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    mesh2 = make_mesh(n_data=4, n_model=2)
    assert mesh2.shape["data"] == 4
    assert mesh2.shape["model"] == 2


def test_dp_fgd_train_matches_single_device(rng):
    """Same batch, same init: the sharded step must reproduce the
    single-device step bit-for-fp32-bit (GSPMD is semantics-preserving)."""
    poses = rng.randn(16, 60, 282).astype(np.float32)
    k = jax.random.PRNGKey(0)

    state_single = fgd.create_state(k)
    state_single, m_single = fgd.train_step(
        state_single, jnp.asarray(poses), jax.random.PRNGKey(1))

    mesh = make_mesh()
    state_dp = fgd.create_state(k)
    state_dp = state_dp.replace(
        params=replicate(state_dp.params, mesh),
        opt_state=replicate(state_dp.opt_state, mesh),
    )
    poses_sharded = shard_batch(jnp.asarray(poses), mesh)
    state_dp, m_dp = fgd.train_step(state_dp, poses_sharded,
                                    jax.random.PRNGKey(1))
    np.testing.assert_allclose(
        float(m_single["loss"]), float(m_dp["loss"]), rtol=1e-5)
    a = jax.tree_util.tree_leaves(state_single.params)
    b = jax.tree_util.tree_leaves(state_dp.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-4, atol=1e-5)


def test_dp_skeleton_train_runs_sharded(rng):
    mesh = make_mesh()
    ds = SyntheticGestureDataset(n_samples=16)
    batch = make_batch([ds[i] for i in range(16)])
    state = skeleton.create_state(jax.random.PRNGKey(0), d_model=64,
                                  d_inner=128)
    state = state.replace(params=replicate(state.params, mesh),
                          opt_state=replicate(state.opt_state, mesh))
    poses = shard_batch(jnp.asarray(batch["pose_seq"]), mesh)
    labels = shard_batch(jnp.asarray(batch["eid_label"]), mesh)
    for i in range(2):
        state, metrics = skeleton.train_step(state, poses, labels,
                                             jax.random.PRNGKey(i))
    assert np.isfinite(float(metrics["loss"]))


def test_dp_gan_train_step_matches_single_device(rng):
    """VERDICT round-1 item 5: the FULL flagship GAN train_step (generator
    BN mutation + TMMemory cross-batch coupling + both optimizer updates)
    must match single-device execution to fp32 tolerance when data-parallel
    sharded. Under GSPMD jit the TMMemory batch coupling and BatchNorm both
    normalise over the GLOBAL batch, so parity is exact up to float
    reassociation (see models/generator.py module docstring)."""
    from emotiongestures_tpu.train import gan

    cfg = gan.GANConfig(n_words=16, d_model=64, d_inner=128, n_layers=1,
                        n_head=4, d_k=16, d_v=16)
    ds = SyntheticGestureDataset(n_samples=16, seed=3)
    raw = make_batch([ds[i] for i in range(16)])
    batch = {k: jnp.asarray(v) for k, v in raw.items()
             if k in ("spectrogram", "text", "pose_seq", "eid_label")}

    gs1, ds1 = gan.create_states(cfg, jax.random.PRNGKey(0))
    metrics_single = []
    for step in range(2):
        gs1, ds1, m = gan.train_step(gs1, ds1, batch,
                                     jax.random.PRNGKey(1 + step),
                                     cfg, use_disc=True)
        metrics_single.append(m)

    mesh = make_mesh()
    gs2, ds2 = gan.create_states(cfg, jax.random.PRNGKey(0))
    gs2 = gs2.replace(params=replicate(gs2.params, mesh),
                      batch_stats=replicate(gs2.batch_stats, mesh),
                      opt_state=replicate(gs2.opt_state, mesh))
    ds2 = ds2.replace(
        params=replicate(ds2.params, mesh),
        batch_stats=replicate(ds2.batch_stats, mesh),
        opt_state=replicate(ds2.opt_state, mesh))
    sharded = shard_batch(batch, mesh)
    metrics_dp = []
    for step in range(2):
        gs2, ds2, m = gan.train_step(gs2, ds2, sharded,
                                     jax.random.PRNGKey(1 + step),
                                     cfg, use_disc=True)
        metrics_dp.append(m)

    # Loss parity at step 0 (tight) AND step 1 (loose: step-1 losses see
    # the step-0 Adam update, whose near-zero-grad elements legitimately
    # differ by ±lr under float reassociation — see below — which moves
    # step-1 losses at the ~1e-3 relative scale; a semantic deviation such
    # as per-shard BN shifts them by percents).
    for step, rtol in ((0, 2e-4), (1, 5e-3)):
        for k in ("g_loss", "d_loss", "g_rec", "g_emo", "g_con", "g_adv"):
            np.testing.assert_allclose(
                float(metrics_single[step][k]), float(metrics_dp[step][k]),
                rtol=rtol, atol=1e-5, err_msg=f"step{step}:{k}")
    # Param parity after 2 steps. Adam's early-step update is
    # ~±lr*sign(grad) regardless of gradient magnitude, so float
    # reassociation across the mesh can flip the SIGN of a ~1e-9 gradient
    # and move an element by up to 2*lr per step — a handful of such
    # outliers is benign. Systematic semantic deviation (e.g. per-shard
    # BN or per-shard TMMemory) moves MANY elements well beyond the LR
    # quantum and shifts the losses checked above. Criterion: outliers
    # beyond 2 steps * 2*lr must be <0.1% of elements and bounded by 5e-3.
    lr_quantum = 2 * (2 * cfg.lr)
    for tag, a, b in (("gen_params", gs1.params, gs2.params),
                      ("gen_bn", gs1.batch_stats, gs2.batch_stats),
                      ("disc_params", ds1.params, ds2.params)):
        n_out = 0
        n_tot = 0
        for x, y in zip(jax.tree_util.tree_leaves(a),
                        jax.tree_util.tree_leaves(b)):
            diff = np.abs(np.asarray(x) - np.asarray(y))
            assert diff.max() < 5e-3, (tag, diff.max())
            n_out += int(np.sum(diff > lr_quantum))
            n_tot += diff.size
        assert n_out <= max(1, n_tot // 1000), (tag, n_out, n_tot)


def test_dp_eval_pipeline_matches_single_device(rng):
    """Batch-parallel SERVING: the eval device pipeline (CVAE sample +
    generator + FGD/skeleton features) sharded over the data mesh must
    reproduce single-device outputs — production inference is DP over
    batches with replicated params."""
    from emotiongestures_tpu.models import (EmotionCVAEv3, FGDAutoEncoder,
                                            GestureTransformer,
                                            SkeletonTransformer)

    gen = GestureTransformer(n_words=16, frames=60, d_model=64,
                             d_inner=128, n_layers=1, n_head=4, d_k=16,
                             d_v=16)
    vae = EmotionCVAEv3(feat_dim=64)
    fgd_net = FGDAutoEncoder()
    skl = SkeletonTransformer(d_model=128, d_inner=128, n_layers=1)
    spec = jnp.asarray(rng.randn(16, 128, 124), jnp.float32)
    text = jnp.asarray(rng.randint(0, 16, (16, 60)))
    target = jnp.asarray(rng.randn(16, 60, 282), jnp.float32)
    y = jax.nn.one_hot(jnp.arange(16) % 8, 8)
    gv = gen.init(jax.random.PRNGKey(0), spec[:1], text[:1], target[:1, :10])
    vv = vae.init({"params": jax.random.PRNGKey(1),
                   "sample": jax.random.PRNGKey(2)},
                  jnp.zeros((1, 60, 64)), jnp.zeros((1, 8)))
    fv = fgd_net.init(jax.random.PRNGKey(3), target[:1])
    sv = skl.init(jax.random.PRNGKey(4), target[:1])

    @jax.jit
    def eval_batch(gv, vv, fv, sv, spec, text, target, y, key):
        sampled = vae.apply(vv, y, method="sample", rngs={"sample": key})
        pred, *_ = gen.apply(gv, spec, text, target[:, :10], sampled,
                             train=False)
        _, feat = fgd_net.apply(fv, pred)
        logits, _ = skl.apply(sv, pred)
        return pred, feat, logits

    key = jax.random.PRNGKey(7)
    ref = eval_batch(gv, vv, fv, sv, spec, text, target, y, key)

    mesh = make_mesh()
    rgv, rvv, rfv, rsv = (replicate(v, mesh) for v in (gv, vv, fv, sv))
    s_in = shard_batch({"spec": spec, "text": text, "target": target,
                        "y": y}, mesh)
    got = eval_batch(rgv, rvv, rfv, rsv, s_in["spec"], s_in["text"],
                     s_in["target"], s_in["y"], key)
    for name, a, b in zip(("pred", "feat", "logits"), ref, got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-4, err_msg=name)


def test_dp_gan_train_step_bf16_compute(rng):
    """Mixed precision under GSPMD: the bf16-compute train_step sharded
    over the data mesh matches its own single-device execution (step-0
    losses within bf16 reassociation tolerance) and keeps fp32 masters."""
    from emotiongestures_tpu.train import gan

    cfg = gan.GANConfig(n_words=16, d_model=64, d_inner=128, n_layers=1,
                        n_head=4, d_k=16, d_v=16,
                        compute_dtype="bfloat16")
    ds = SyntheticGestureDataset(n_samples=16, seed=3)
    raw = make_batch([ds[i] for i in range(16)])
    batch = {k: jnp.asarray(v) for k, v in raw.items()
             if k in ("spectrogram", "text", "pose_seq", "eid_label")}

    gs1, ds1 = gan.create_states(cfg, jax.random.PRNGKey(0))
    _, _, m1 = gan.train_step(gs1, ds1, batch, jax.random.PRNGKey(1), cfg)

    mesh = make_mesh()
    gs2, ds2 = gan.create_states(cfg, jax.random.PRNGKey(0))
    gs2 = gs2.replace(params=replicate(gs2.params, mesh),
                      batch_stats=replicate(gs2.batch_stats, mesh),
                      opt_state=replicate(gs2.opt_state, mesh))
    ds2 = ds2.replace(params=replicate(ds2.params, mesh),
                      batch_stats=replicate(ds2.batch_stats, mesh),
                      opt_state=replicate(ds2.opt_state, mesh))
    gs2, ds2, m2 = gan.train_step(gs2, ds2, shard_batch(batch, mesh),
                                  jax.random.PRNGKey(1), cfg)
    for k in ("g_loss", "d_loss", "g_rec"):
        a, b = float(m1[k]), float(m2[k])
        assert np.isfinite(b), (k, b)
        # bf16 accumulation order differs across shards; semantic
        # deviations (per-shard BN/TMMemory) would move losses by percents
        assert abs(a - b) <= 0.02 * max(abs(a), 1.0), (k, a, b)
    for leaf in jax.tree_util.tree_leaves(gs2.params):
        assert leaf.dtype == jnp.float32


def test_dryrun_multichip_hermetic_to_cpu():
    """VERDICT round-1 item 2: dryrun_multichip must never initialise the
    TPU client. Run it in a fresh subprocess WITHOUT JAX_PLATFORMS=cpu (so
    the axon TPU plugin is available as the default platform) and assert
    (a) it succeeds, (b) its all-CPU placement guard fired, and (c) the
    axon platform was never initialised (no xla_bridge warning)."""
    import os
    import subprocess
    import sys

    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    env.pop("XLA_FLAGS", None)  # dryrun must set the host-device flag itself
    proc = subprocess.run(
        [sys.executable, "-c",
         "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "all-CPU placement verified" in proc.stdout, proc.stdout
    assert "Platform 'axon'" not in proc.stderr, (
        "dryrun initialised the TPU client:\n" + proc.stderr[:2000])


def test_tp_generator_forward_matches_replicated(rng):
    """Tensor-parallel FFN/MHA sharding must not change the forward."""
    from emotiongestures_tpu.models import GestureTransformer

    gen = GestureTransformer(n_words=30, d_model=128, d_inner=256,
                             n_layers=2, variant="base")
    spec = jnp.asarray(rng.randn(4, 128, 124), jnp.float32)
    text = jnp.asarray(rng.randint(0, 30, (4, 60)))
    prior = jnp.asarray(rng.randn(4, 10, 282), jnp.float32)
    variables = gen.init(jax.random.PRNGKey(0), spec, text, prior)
    ref_out, *_ = gen.apply(variables, spec, text, prior)

    mesh = make_mesh(n_data=4, n_model=2)
    shardings = tp_param_shardings(variables["params"], mesh)
    # check the rules actually hit the FFN kernels
    specs = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda s: s.spec, shardings,
                               is_leaf=lambda x: hasattr(x, "spec")))
    assert any("model" in str(s) for s in specs)
    params_tp = apply_shardings(variables["params"], shardings)
    bstats = replicate(variables["batch_stats"], mesh)
    sharded_vars = {"params": params_tp, "batch_stats": bstats}
    tp_out, *_ = jax.jit(
        lambda v, s, t, p: gen.apply(v, s, t, p)
    )(sharded_vars, shard_batch(spec, mesh), shard_batch(text, mesh),
      shard_batch(prior, mesh))
    np.testing.assert_allclose(np.asarray(ref_out), np.asarray(tp_out),
                               rtol=1e-4, atol=1e-5)


def test_dp_classifier_train_matches_single_device(rng):
    """The K-fold classifier's jitted train_step under GSPMD DP must match
    single-device execution (the CLI wires this path via --num_devices;
    full-shape CLI-level compiles are too slow for CPU, so parity is
    pinned here at a small spectrogram)."""
    from emotiongestures_tpu.train import classifier

    spec = rng.randn(16, 32, 30).astype(np.float32)
    labels = np.eye(8, dtype=np.float32)[np.arange(16) % 8]
    alpha = np.ones(8, np.float32)

    s1 = classifier.create_state(jax.random.PRNGKey(0),
                                 spec_shape=(1, 32, 30))
    s1, m1 = classifier.train_step(s1, jnp.asarray(spec),
                                   jnp.asarray(labels), alpha)

    mesh = make_mesh()
    s2 = classifier.create_state(jax.random.PRNGKey(0),
                                 spec_shape=(1, 32, 30))
    s2 = s2.replace(params=replicate(s2.params, mesh),
                    batch_stats=replicate(s2.batch_stats, mesh),
                    opt_state=replicate(s2.opt_state, mesh))
    s2, m2 = classifier.train_step(s2, shard_batch(jnp.asarray(spec), mesh),
                                   shard_batch(jnp.asarray(labels), mesh),
                                   alpha)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=2e-4)
    assert float(m1["acc"]) == float(m2["acc"])
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 5e-3


def test_dp_setup_semantics():
    """--num_devices plumbing: auto mode degrades to the largest feasible
    divisor of the batch (reference DataParallel never errors on batch
    size); an explicit count that can't shard the batch errors."""
    from emotiongestures_tpu.parallel import dp_setup

    assert dp_setup(1, 7) is None
    mesh = dp_setup(0, 16)  # 8 CPU devices divide 16
    assert mesh is not None and mesh.shape["data"] == 8
    mesh = dp_setup(0, 12)  # 8 ∤ 12 -> largest divisor ≤ 8 is 6
    assert mesh is not None and mesh.shape["data"] == 6
    mesh = dp_setup(0, 7)  # prime 7 < 8 -> 7 devices, 1 sample each
    assert mesh is not None and mesh.shape["data"] == 7
    assert dp_setup(0, 1) is None  # batch 1 -> single device
    mesh = dp_setup(4, 16)
    assert mesh.shape["data"] == 4
    with pytest.raises(SystemExit):
        dp_setup(8, 12)  # explicit mesh that can't shard the batch
    with pytest.raises(SystemExit):
        dp_setup(16, 16)  # more devices than visible


def test_tp_gan_train_step_matches_single_device(rng):
    """The user-facing --model_parallel path (parallel.tp_setup +
    shard_state_tp): the FULL GAN train_step on a 4x2 (data, model) mesh
    with FFN/MHA kernels AND their Adam moments sharded on `model` must
    match single-device execution under the same outlier criterion as the
    DP parity test above."""
    from emotiongestures_tpu.parallel import shard_state_tp, tp_setup
    from emotiongestures_tpu.train import gan

    cfg = gan.GANConfig(n_words=16, d_model=64, d_inner=128, n_layers=1,
                        n_head=4, d_k=16, d_v=16)
    ds = SyntheticGestureDataset(n_samples=16, seed=3)
    raw = make_batch([ds[i] for i in range(16)])
    batch = {k: jnp.asarray(v) for k, v in raw.items()
             if k in ("spectrogram", "text", "pose_seq", "eid_label")}

    gs1, ds1 = gan.create_states(cfg, jax.random.PRNGKey(0))
    gs1, ds1, m_single = gan.train_step(gs1, ds1, batch,
                                        jax.random.PRNGKey(1), cfg,
                                        use_disc=True)

    mesh = tp_setup(8, 2, 16)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    gs2, ds2 = gan.create_states(cfg, jax.random.PRNGKey(0))
    gs2 = shard_state_tp(gs2, mesh)
    ds2 = shard_state_tp(ds2, mesh)
    # the Adam moments must actually be model-sharded next to their params
    tp_leaf_specs = [
        str(leaf.sharding.spec)
        for leaf in jax.tree_util.tree_leaves(gs2.opt_state)
        if hasattr(leaf, "sharding") and hasattr(leaf.sharding, "spec")]
    assert any("model" in s for s in tp_leaf_specs), tp_leaf_specs
    sharded = shard_batch(batch, mesh)
    gs2, ds2, m_tp = gan.train_step(gs2, ds2, sharded,
                                    jax.random.PRNGKey(1), cfg,
                                    use_disc=True)

    for k in ("g_loss", "d_loss", "g_rec", "g_emo", "g_con", "g_adv"):
        np.testing.assert_allclose(
            float(m_single[k]), float(m_tp[k]), rtol=2e-4, atol=1e-5,
            err_msg=k)
    lr_quantum = 2 * cfg.lr  # one step
    for tag, a, b in (("gen_params", gs1.params, gs2.params),
                      ("gen_bn", gs1.batch_stats, gs2.batch_stats),
                      ("disc_params", ds1.params, ds2.params)):
        n_out = 0
        n_tot = 0
        for x, y in zip(jax.tree_util.tree_leaves(a),
                        jax.tree_util.tree_leaves(b)):
            diff = np.abs(np.asarray(x) - np.asarray(y))
            assert diff.max() < 5e-3, (tag, diff.max())
            n_out += int(np.sum(diff > lr_quantum))
            n_tot += diff.size
        assert n_out <= max(1, n_tot // 1000), (tag, n_out, n_tot)


def test_tp_setup_semantics():
    from emotiongestures_tpu.parallel import tp_setup

    mesh = tp_setup(8, 4, 16)
    assert dict(mesh.shape) == {"data": 2, "model": 4}
    with pytest.raises(SystemExit):
        tp_setup(8, 3, 16)   # 3 does not divide 8
    with pytest.raises(SystemExit):
        tp_setup(8, 2, 18)   # batch 18 does not divide n_data 4


def test_tp_eval_pipeline_matches_single_device(rng):
    """Tensor-parallel SERVING (--model_parallel on the eval CLI): the
    eval device pipeline on a 4x2 (data, model) mesh with the generator/
    skeleton FFN/MHA kernels sharded on `model` (FGD AE and CVAE params
    match no TP rule and replicate) must reproduce single-device
    outputs."""
    from emotiongestures_tpu.models import (EmotionCVAEv3, FGDAutoEncoder,
                                            GestureTransformer,
                                            SkeletonTransformer)
    from emotiongestures_tpu.parallel import tp_setup

    gen = GestureTransformer(n_words=16, frames=60, d_model=64,
                             d_inner=128, n_layers=1, n_head=4, d_k=16,
                             d_v=16)
    vae = EmotionCVAEv3(feat_dim=64)
    fgd_net = FGDAutoEncoder()
    skl = SkeletonTransformer(d_model=128, d_inner=128, n_layers=1)
    spec = jnp.asarray(rng.randn(16, 128, 124), jnp.float32)
    text = jnp.asarray(rng.randint(0, 16, (16, 60)))
    target = jnp.asarray(rng.randn(16, 60, 282), jnp.float32)
    y = jax.nn.one_hot(jnp.arange(16) % 8, 8)
    gv = gen.init(jax.random.PRNGKey(0), spec[:1], text[:1], target[:1, :10])
    vv = vae.init({"params": jax.random.PRNGKey(1),
                   "sample": jax.random.PRNGKey(2)},
                  jnp.zeros((1, 60, 64)), jnp.zeros((1, 8)))
    fv = fgd_net.init(jax.random.PRNGKey(3), target[:1])
    sv = skl.init(jax.random.PRNGKey(4), target[:1])

    @jax.jit
    def eval_batch(gv, vv, fv, sv, spec, text, target, y, key):
        sampled = vae.apply(vv, y, method="sample", rngs={"sample": key})
        pred, *_ = gen.apply(gv, spec, text, target[:, :10], sampled,
                             train=False)
        _, feat = fgd_net.apply(fv, pred)
        logits, _ = skl.apply(sv, pred)
        return pred, feat, logits

    key = jax.random.PRNGKey(7)
    ref = eval_batch(gv, vv, fv, sv, spec, text, target, y, key)

    mesh = tp_setup(8, 2, 16)
    tgv, tvv, tfv, tsv = (apply_shardings(v, tp_param_shardings(v, mesh))
                          for v in (gv, vv, fv, sv))
    # the generator's FFN kernels must actually be model-sharded
    specs = [str(leaf.sharding.spec)
             for leaf in jax.tree_util.tree_leaves(tgv)]
    assert any("model" in s for s in specs)
    s_in = shard_batch({"spec": spec, "text": text, "target": target,
                        "y": y}, mesh)
    got = eval_batch(tgv, tvv, tfv, tsv, s_in["spec"], s_in["text"],
                     s_in["target"], s_in["y"], key)
    for name, a, b in zip(("pred", "feat", "logits"), ref, got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-4, err_msg=name)


def test_dp_bf16_grads_concat_d_matches_single_device(rng):
    """VERDICT r4 item 6: grad_dtype='bfloat16' (backward + DP gradient
    all-reduce in bf16) and d_concat_batch together must preserve the
    GSPMD global-batch semantics — DP-sharded execution matches
    single-device execution of the SAME config. Tolerances are bf16-wide
    but far below the percent-scale shifts a per-shard semantic deviation
    produces."""
    from emotiongestures_tpu.train import gan

    cfg = gan.GANConfig(n_words=16, d_model=64, d_inner=128, n_layers=1,
                        n_head=4, d_k=16, d_v=16,
                        compute_dtype="bfloat16", grad_dtype="bfloat16",
                        d_concat_batch=True, update_order="g_first")
    ds = SyntheticGestureDataset(n_samples=16, seed=3)
    raw = make_batch([ds[i] for i in range(16)])
    batch = {k: jnp.asarray(v) for k, v in raw.items()
             if k in ("spectrogram", "text", "pose_seq", "eid_label")}

    gs1, ds1 = gan.create_states(cfg, jax.random.PRNGKey(0))
    gs1, ds1, m1 = gan.train_step(gs1, ds1, batch, jax.random.PRNGKey(1),
                                  cfg, use_disc=True)

    mesh = make_mesh()
    gs2, ds2 = gan.create_states(cfg, jax.random.PRNGKey(0))
    gs2 = gs2.replace(params=replicate(gs2.params, mesh),
                      batch_stats=replicate(gs2.batch_stats, mesh),
                      opt_state=replicate(gs2.opt_state, mesh))
    ds2 = ds2.replace(params=replicate(ds2.params, mesh),
                      batch_stats=replicate(ds2.batch_stats, mesh),
                      opt_state=replicate(ds2.opt_state, mesh))
    gs2, ds2, m2 = gan.train_step(gs2, ds2, shard_batch(batch, mesh),
                                  jax.random.PRNGKey(1), cfg,
                                  use_disc=True)
    for k in ("g_loss", "d_loss", "g_rec", "g_emo", "g_con", "g_adv"):
        np.testing.assert_allclose(float(m1[k]), float(m2[k]),
                                   rtol=2e-2, atol=1e-4, err_msg=k)
    # and the updated params agree (the all-reduced bf16 grads fed the
    # same fp32 Adam masters)
    p1 = jax.tree_util.tree_leaves(gs1.params)
    p2 = jax.tree_util.tree_leaves(gs2.params)
    worst = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(p1, p2))
    assert worst < 5e-4, f"param divergence {worst}"


def test_grad_dtype_requires_bf16_compute():
    from emotiongestures_tpu.train import gan

    cfg = gan.GANConfig(n_words=16, d_model=64, d_inner=128, n_layers=1,
                        n_head=4, d_k=16, d_v=16, grad_dtype="bfloat16")
    ds = SyntheticGestureDataset(n_samples=4, seed=0)
    raw = make_batch([ds[i] for i in range(4)])
    batch = {k: jnp.asarray(v) for k, v in raw.items()
             if k in ("spectrogram", "text", "pose_seq", "eid_label")}
    gs, dsr = gan.create_states(cfg, jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="grad_dtype"):
        gan.train_step(gs, dsr, batch, jax.random.PRNGKey(1), cfg,
                       use_disc=True)
