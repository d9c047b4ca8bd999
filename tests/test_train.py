"""End-to-end train-step tests on the synthetic dataset: losses decrease,
gradients stay finite, and the jitted steps run (SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emotiongestures_tpu.data import SyntheticGestureDataset, make_batch
from emotiongestures_tpu.train import classifier, cvae, fgd, gan, skeleton
from emotiongestures_tpu.train.state import finite_check


@pytest.fixture(scope="module")
def dataset():
    return SyntheticGestureDataset(n_samples=64, seed=3)


@pytest.fixture(scope="module")
def batch(dataset):
    return make_batch([dataset[i] for i in range(16)])


def test_classifier_loss_decreases(batch):
    state = classifier.create_state(jax.random.PRNGKey(0))
    alpha = classifier.class_alpha(batch["eid_label"])
    losses = []
    for _ in range(8):
        state, metrics = classifier.train_step(
            state, batch["spectrogram"], batch["eid_label"], alpha)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    assert bool(finite_check(state.params))


def test_classifier_eval_and_confusion(batch):
    state = classifier.create_state(jax.random.PRNGKey(0))
    acc, preds, labels = classifier.eval_step(
        state, batch["spectrogram"], batch["eid_label"])
    assert 0.0 <= float(acc) <= 100.0
    cm = classifier.confusion_matrix(preds, labels)
    assert cm.sum() == 16


def test_class_alpha_formula():
    onehot = np.eye(8, dtype=np.float32)[np.array([0, 0, 0, 1])]
    alpha = classifier.class_alpha(onehot)
    # counts: [3,1,...(1 clamped)]; alpha_c = total/(8*count)
    np.testing.assert_allclose(alpha[0], 4.0 / (8 * 3))
    np.testing.assert_allclose(alpha[1], 4.0 / (8 * 1))


def test_gan_train_steps_run(batch):
    cfg = gan.GANConfig(n_words=64, d_model=128, d_inner=256, n_layers=1)
    gen_state, disc_state = gan.create_states(cfg, jax.random.PRNGKey(0))
    small = {k: v[:4] for k, v in batch.items()}
    metrics_hist = []
    for i in range(3):
        gen_state, disc_state, metrics = gan.train_step(
            gen_state, disc_state, small, jax.random.PRNGKey(i), cfg,
            use_disc=True)
        metrics_hist.append({k: float(v) for k, v in metrics.items()})
    for m in metrics_hist:
        assert np.isfinite(list(m.values())).all(), m
    # reconstruction loss should drop within a few steps
    assert metrics_hist[-1]["g_rec"] < metrics_hist[0]["g_rec"]
    out = gan.eval_step(gen_state, small, cfg)
    assert out["pred"].shape == (4, 60, 282)
    assert np.isfinite(float(out["l2"]))


def test_gan_bf16_compute_step(batch):
    """Mixed-precision step (compute_dtype=bfloat16): params/opt stay fp32
    masters, losses stay finite and land near the fp32 step-0 losses."""
    small = {k: v[:4] for k, v in batch.items()}
    cfg32 = gan.GANConfig(n_words=64, d_model=128, d_inner=256, n_layers=1)
    cfg16 = gan.GANConfig(n_words=64, d_model=128, d_inner=256, n_layers=1,
                          compute_dtype="bfloat16")
    g32, d32 = gan.create_states(cfg32, jax.random.PRNGKey(0))
    g16, d16 = gan.create_states(cfg16, jax.random.PRNGKey(0))
    _, _, m32 = gan.train_step(g32, d32, small, jax.random.PRNGKey(1), cfg32)
    g16, d16, m16 = gan.train_step(g16, d16, small, jax.random.PRNGKey(1),
                                   cfg16)
    for k in ("g_loss", "d_loss", "g_rec"):
        a, b = float(m32[k]), float(m16[k])
        assert np.isfinite(b), (k, b)
        assert abs(a - b) <= 0.05 * max(abs(a), 1.0), (k, a, b)
    # master copies stay fp32 through the update
    for leaf in jax.tree_util.tree_leaves(g16.params):
        assert leaf.dtype == jnp.float32
    for leaf in jax.tree_util.tree_leaves(g16.batch_stats):
        assert leaf.dtype == jnp.float32
    # and a second step still learns
    _, _, m16b = gan.train_step(g16, d16, small, jax.random.PRNGKey(2),
                                cfg16)
    assert float(m16b["g_rec"]) < float(m16["g_rec"])


def test_gan_warmup_skips_discriminator(batch):
    cfg = gan.GANConfig(n_words=64, d_model=128, d_inner=256, n_layers=1)
    gen_state, disc_state = gan.create_states(cfg, jax.random.PRNGKey(0))
    small = {k: v[:4] for k, v in batch.items()}
    d_before = np.array(jax.tree_util.tree_leaves(disc_state.params)[0])
    gen_state, disc_state, metrics = gan.train_step(
        gen_state, disc_state, small, jax.random.PRNGKey(0), cfg,
        use_disc=False)
    d_after = jax.tree_util.tree_leaves(disc_state.params)[0]
    np.testing.assert_array_equal(np.asarray(d_before), np.asarray(d_after))
    assert float(metrics["d_loss"]) == 0.0
    assert float(metrics["g_adv"]) == 0.0


@pytest.mark.parametrize("version", [1, 2, 3])
def test_cvae_loss_decreases(version):
    state = cvae.create_state(jax.random.PRNGKey(0), version=version)
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(8, 60, 512) * 0.1, jnp.float32)
    y = jax.nn.one_hot(jnp.asarray(rng.randint(0, 8, 8)), 8)
    losses = []
    for i in range(10):
        state, metrics = cvae.train_step(
            state, feats, y, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    s = cvae.sample(state, y, jax.random.PRNGKey(99))
    assert s.shape == (8, 60, 512)


def test_fgd_train_and_features(batch):
    state = fgd.create_state(jax.random.PRNGKey(0))
    poses = batch["pose_seq"]
    losses = []
    for i in range(10):
        state, metrics = fgd.train_step(state, poses, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    feats = fgd.extract_features(state, poses)
    assert feats.shape == (16 * 60, 512)


def test_skeleton_train(batch):
    state = skeleton.create_state(jax.random.PRNGKey(0), d_model=128,
                                  d_inner=256)
    losses = []
    for i in range(15):
        state, metrics = skeleton.train_step(
            state, batch["pose_seq"], batch["eid_label"],
            jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert min(losses[8:]) < losses[0]
    logits, mid = skeleton.predict(state, batch["pose_seq"])
    assert logits.shape == (16, 8)


def test_skeleton_warmup_schedule(batch):
    """warmup_steps ramps the effective LR linearly from 0: the first
    post-init step under warmup must move params far less than the
    constant-lr trainer's first step (round-4 flagship rehearsal: the
    post-LN d_model-512 head escapes chance ONLY with warmup)."""
    def first_step_delta(warmup):
        state = skeleton.create_state(jax.random.PRNGKey(0), d_model=128,
                                      d_inner=256, warmup_steps=warmup)
        new_state, _ = skeleton.train_step(
            state, batch["pose_seq"], batch["eid_label"],
            jax.random.PRNGKey(0))
        deltas = jax.tree_util.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))),
            new_state.params, state.params)
        return max(jax.tree_util.tree_leaves(deltas))

    # constant lr: Adam's first step is ~lr in magnitude; 100-step
    # warmup scales step 1 by 1/100
    assert first_step_delta(100) < 0.2 * first_step_delta(0)


def test_skeleton_grad_clip_bounds_update(batch):
    """grad_clip bounds the gradient entering Adam against spikes
    (round-5 chain: a converged classifier on class_overlap data died in
    ONE Adam step when a near-boundary batch's CE gradient met stale
    tiny second moments). Contract checked exactly on the optimizer
    state: after the first step Adam's first moment is mu = (1-b1)*g,
    so global_norm(mu) = 0.5 * min(||g||, clip)."""
    def first_mu_norm(clip):
        state = skeleton.create_state(jax.random.PRNGKey(0), d_model=128,
                                      d_inner=256, grad_clip=clip)
        new_state, m = skeleton.train_step(
            state, batch["pose_seq"], batch["eid_label"],
            jax.random.PRNGKey(0))
        assert np.isfinite(float(m["loss"]))
        mus = [leaf.mu for leaf in jax.tree_util.tree_leaves(
                   new_state.opt_state,
                   is_leaf=lambda x: hasattr(x, "mu"))
               if hasattr(leaf, "mu")]
        assert len(mus) == 1
        import optax

        return float(optax.global_norm(mus[0]))

    clip = 1e-3
    clipped, unclipped = first_mu_norm(clip), first_mu_norm(0.0)
    assert unclipped > 10 * clip  # the raw gradient really exceeds clip
    np.testing.assert_allclose(clipped, 0.5 * clip, rtol=1e-4)


def test_plateau_detector():
    """Skeleton init-lottery mitigation (VERDICT r3 Weak #4): plateau-band
    accuracy for `patience` steps triggers a bounded number of reseeds;
    the criterion is the TRAILING-WINDOW MEAN, so the ln4 plateau's
    single-step spikes (round-4 rehearsal: noise band 20-29% with spikes
    past 30 at batch 128) cannot permanently disarm it; reseed keys are
    deterministic and distinct per attempt."""
    det = skeleton.PlateauDetector(patience=5, acc_target=40.0,
                                   max_reseeds=2)
    fired_at = []
    for i in range(1, 25):
        if det.update(12.5):  # pinned at chance
            fired_at.append(i)
    assert fired_at == [5, 10]  # patience resets per attempt
    assert det.attempts == 2    # and max_reseeds bounds it

    base = jax.random.PRNGKey(0)
    k1 = skeleton.PlateauDetector().next_key(base)
    det2 = skeleton.PlateauDetector(patience=1)
    det2.update(0.0)
    k2 = det2.next_key(base)
    assert not np.array_equal(np.asarray(k1), np.asarray(k2))

    # a converging run (sustained high trailing mean) never reseeds
    det3 = skeleton.PlateauDetector(patience=2, acc_target=40.0, window=4)
    for _ in range(10):
        assert not det3.update(80.0)

    # the ln4 plateau WITH spikes past the old 30% best-acc threshold
    # still reseeds — the round-4 failure mode of the best-acc criterion
    det4 = skeleton.PlateauDetector(patience=6, acc_target=40.0,
                                    max_reseeds=2, window=5)
    accs = [22.0, 25.0, 31.2, 24.0, 26.5, 23.4, 33.6, 25.0, 24.2, 26.0]
    assert any(det4.update(a) for a in accs)

    # ADVICE r4: once converged, a later window-length dip below the
    # target must NEVER reseed — the converged flag latches for good
    det5 = skeleton.PlateauDetector(patience=3, acc_target=40.0,
                                    max_reseeds=8, window=2)
    for _ in range(4):
        assert not det5.update(90.0)  # converges (trailing mean 90)
    for _ in range(50):
        assert not det5.update(10.0)  # deep dip, far past patience
    assert det5.attempts == 0


def test_classifier_bf16_compute_step(batch):
    """Classifier mixed precision mirrors the GAN policy: fp32 masters,
    bf16 fwd/bwd, loss near the fp32 step-0 loss."""
    alpha = classifier.class_alpha(batch["eid_label"])
    s32 = classifier.create_state(jax.random.PRNGKey(0))
    s16 = classifier.create_state(jax.random.PRNGKey(0))
    s32, m32 = classifier.train_step(
        s32, batch["spectrogram"], batch["eid_label"], alpha)
    s16, m16 = classifier.train_step(
        s16, batch["spectrogram"], batch["eid_label"], alpha,
        compute_dtype="bfloat16")
    a, b = float(m32["loss"]), float(m16["loss"])
    assert np.isfinite(b)
    assert abs(a - b) <= 0.05 * max(abs(a), 1.0), (a, b)
    for leaf in jax.tree_util.tree_leaves(s16.params):
        assert leaf.dtype == jnp.float32
    acc, _, _ = classifier.eval_step(
        s16, batch["spectrogram"], batch["eid_label"],
        compute_dtype="bfloat16")
    assert 0.0 <= float(acc) <= 100.0


def test_gan_g_first_update_order(batch):
    """update_order="g_first": one shared generator forward — step runs,
    losses track the d_first step-0 losses (identical G losses: both see
    the same pre-update G params and g_rng; D sees a different fake
    realisation), and learning continues."""
    small = {k: v[:4] for k, v in batch.items()}
    cfg_d = gan.GANConfig(n_words=64, d_model=128, d_inner=256, n_layers=1)
    cfg_g = gan.GANConfig(n_words=64, d_model=128, d_inner=256, n_layers=1,
                          update_order="g_first")
    gd, dd = gan.create_states(cfg_d, jax.random.PRNGKey(0))
    gg, dg = gan.create_states(cfg_g, jax.random.PRNGKey(0))
    _, _, md = gan.train_step(gd, dd, small, jax.random.PRNGKey(1), cfg_d)
    gg, dg, mg = gan.train_step(gg, dg, small, jax.random.PRNGKey(1), cfg_g)
    # rec/emo/con are computed from the identical G pass in both orders
    for k in ("g_rec", "g_emo", "g_con"):
        np.testing.assert_allclose(float(md[k]), float(mg[k]), rtol=1e-5,
                                   err_msg=k)
    # adv differs only through D-update ordering: same magnitude regime
    assert abs(float(md["g_adv"]) - float(mg["g_adv"])) < 0.1
    assert np.isfinite(float(mg["d_loss"]))
    _, _, mg2 = gan.train_step(gg, dg, small, jax.random.PRNGKey(2), cfg_g)
    assert float(mg2["g_rec"]) < float(mg["g_rec"])


def test_gan_g_first_warmup(batch):
    small = {k: v[:4] for k, v in batch.items()}
    cfg = gan.GANConfig(n_words=64, d_model=128, d_inner=256, n_layers=1,
                        update_order="g_first")
    gs, ds = gan.create_states(cfg, jax.random.PRNGKey(0))
    d_before = np.array(jax.tree_util.tree_leaves(ds.params)[0])
    gs, ds, m = gan.train_step(gs, ds, small, jax.random.PRNGKey(0), cfg,
                               use_disc=False)
    np.testing.assert_array_equal(
        d_before, np.asarray(jax.tree_util.tree_leaves(ds.params)[0]))
    assert float(m["d_loss"]) == 0.0 and float(m["g_adv"]) == 0.0


def test_d_concat_batch_equivalent_without_dropout(rng):
    """d_concat_batch semantics (VERDICT r4 item 6): the discriminator
    has no BatchNorm, so one 2B-batch pass equals two B-batch passes
    exactly once the only stochastic element (dropout — incl. the
    attention-prob dropout the reference pins at 0.1 independent of the
    MHA dropout arg, Full_model/SubLayers.py:25 — a kept quirk) is off
    via train=False."""
    import jax
    import jax.numpy as jnp

    from emotiongestures_tpu.models.discriminator import (
        MotionDiscriminator, calc_motion)

    disc = MotionDiscriminator(frames=9, pose_dim=12, d_model=12,
                               d_inner=32, n_layers=1, n_head=2, d_k=8,
                               d_v=8)
    real = jnp.asarray(rng.randn(4, 10, 12), jnp.float32)
    fake = jnp.asarray(rng.randn(4, 10, 12), jnp.float32)
    variables = disc.init(jax.random.PRNGKey(0), calc_motion(real))
    r1 = disc.apply(variables, calc_motion(real), train=False)
    f1 = disc.apply(variables, calc_motion(fake), train=False)
    both = disc.apply(variables,
                      jnp.concatenate([calc_motion(real),
                                       calc_motion(fake)]),
                      train=False)
    r2, f2 = jnp.split(both, 2)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), rtol=1e-6,
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), rtol=1e-6,
                               atol=1e-7)


def test_train_steps_matches_sequential(rng):
    """train_steps (device-side K-step scan, VERDICT r4 item 1) advances
    states exactly like K sequential train_step calls given the same
    per-step RNGs."""
    import jax
    import jax.numpy as jnp

    from emotiongestures_tpu.data.synthetic import (SyntheticGestureDataset,
                                                    make_batch)
    from emotiongestures_tpu.train import gan

    cfg = gan.GANConfig(n_words=16, d_model=64, d_inner=128, n_layers=1,
                        n_head=4, d_k=16, d_v=16)
    ds = SyntheticGestureDataset(n_samples=12, seed=5)
    KEYS = ("spectrogram", "text", "pose_seq", "eid_label")
    micro = []
    for s in range(3):
        raw = make_batch([ds[4 * s + j] for j in range(4)], KEYS)
        micro.append({k: jnp.asarray(v) for k, v in raw.items()})
    stacked = {k: jnp.stack([m[k] for m in micro]) for k in micro[0]}

    rng0 = jax.random.PRNGKey(7)
    gs1, ds1 = gan.create_states(cfg, jax.random.PRNGKey(0))
    step_rngs = jax.random.split(rng0, 3)
    metrics_seq = []
    for s in range(3):
        gs1, ds1, m = gan.train_step(gs1, ds1, micro[s], step_rngs[s],
                                     cfg, use_disc=True)
        metrics_seq.append(m)

    gs2, ds2 = gan.create_states(cfg, jax.random.PRNGKey(0))
    gs2, ds2, ms = gan.train_steps(gs2, ds2, stacked, rng0, cfg,
                                   use_disc=True)
    for s in range(3):
        for k in ("g_loss", "d_loss", "g_rec", "g_emo"):
            np.testing.assert_allclose(float(metrics_seq[s][k]),
                                       float(ms[k][s]), rtol=5e-4,
                                       atol=1e-5, err_msg=f"{s}:{k}")
    p1 = jax.tree_util.tree_leaves(gs1.params)
    p2 = jax.tree_util.tree_leaves(gs2.params)
    worst = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(p1, p2))
    # Adam moves near-zero-grad params by ±lr (2e-4) under float
    # reassociation (see test_parallel.py DP parity comment); anything
    # semantic diverges by orders more
    assert worst < 1e-3, f"param divergence {worst}"
    assert int(gs2.step) == 3
