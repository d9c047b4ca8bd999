"""GAN training for the gesture generator — RECONSTRUCTED.

The reference never released train.py (SURVEY.md §0, §7 hard part 1);
this loop is rebuilt from the interfaces and hyper-parameters that ARE
present:
  * Motion_Discriminator on 59-frame motion offsets, raw scores
    (Models_memory.py:569-618; calc_motion test_...py:41-44)
  * loss_regression_weight = 100 (test_...py:361)
  * pose_dis_warm_epoch warm-up flag (test_...py:360)
  * emotion head on the generator (emotion_classifer_header) -> CE
  * "disentangle_emotion_infonce" checkpoint name + SoftmaxContrastiveLoss
    (test_...py:80-127)
  * Adam(lr 2e-4, betas (0.5, 0.999)) (test_...py:357-359)
  * staged LR ladder (test_...py:64-78)

Loss composition (weights configurable):
  G: w_rec * L1(pred, target) + w_adv * BCE(D(offsets(pred)), 1)
     + w_emo * CE(emotion_logits, y) + w_con * contrastive (below)
  D: BCE(D(offsets(real)), 1) + BCE(D(offsets(fake)), 0)

Reconstruction decisions (the reference never shipped train.py, so these
are documented choices, not parity claims):

  * Contrastive term (`contrastive_mode`): default "paired_label" =
    emotion InfoNCE over pooled emotion features where clips sharing an
    emotion label are positives (losses.emotion_infonce) — the reading of
    the "disentangle_emotion_infonce" checkpoint name that actually pulls
    same-emotion clips together across speakers/semantics.
    "emo_sem" instead applies the reference's two-set diagonal
    SoftmaxContrastiveLoss between pooled emotion and semantic features of
    the same clip (the literal loss module shipped in test_...py:80-127).
  * The fake batch for the D update is generated with train=True (BN in
    batch-stats mode, dropout active) — matching torch convention where G
    stays in .train() during the D step; the BN mutations from that pass
    are DISCARDED (the G update recomputes them from the same batch).
  * The real and fake discriminator passes use INDEPENDENT dropout keys
    (round-1 reused one key for both — fixed per VERDICT item 6).

Mixed precision (`compute_dtype="bfloat16"`): params and optimizer state
stay fp32 (the torch-parity master copy); the forward/backward of both
networks runs with bf16 params/activations on the MXU. Loss arithmetic is
fp32 (model outputs are upcast before any loss), BatchNorm statistics are
computed in fp32 by flax regardless of input dtype, and gradients arrive
fp32 through the transpose of the param cast. bf16 needs no loss scaling
(same exponent range as fp32). fp32 remains the default/parity dtype.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..core import losses, schedules
from ..core.precision import cast_tree
from ..models import GestureTransformer, MotionDiscriminator
from ..models.discriminator import calc_motion
from .state import TrainState, create_train_state, model_variables


@dataclass(frozen=True)
class GANConfig:
    n_words: int = 64
    frames: int = 60
    pose_dim: int = 282
    prior_frames: int = 10
    d_model: int = 512
    d_inner: int = 2048
    n_layers: int = 3
    n_head: int = 8
    d_k: int = 64
    d_v: int = 64
    lr: float = 2e-4
    beta1: float = 0.5
    beta2: float = 0.999
    weight_decay: float = 0.0
    loss_regression_weight: float = 100.0
    loss_gan_weight: float = 1.0
    loss_emotion_weight: float = 1.0
    loss_contrastive_weight: float = 0.1
    variant: str = "memory"
    # "paired_label" (emotion InfoNCE over same-label clips) or "emo_sem"
    # (reference SoftmaxContrastiveLoss between emotion/semantic features)
    contrastive_mode: str = "paired_label"
    # "d_first" (default): D updates on a dedicated fake-generation pass,
    # then G's adversarial term sees the UPDATED D — the torch-convention
    # ordering. "g_first": ONE generator forward/backward serves both
    # updates — G's adversarial term sees the PRE-update D and D trains on
    # stop_gradient of the same prediction. Both are standard GAN
    # orderings; the reconstruction defaults to d_first. g_first removes
    # a full generator forward per step — measured 1.07x at the flagship
    # config (75.5 vs 80.7 ms/step bf16: XLA recovers most of the
    # duplicated forward's cost in d_first already), with the 25-epoch
    # learning check landing on the same eval metrics (BASELINE.md).
    update_order: str = "d_first"
    # steps per epoch > 0 bakes the reference's staged LR ladder
    # (test_...py:64-78) into the optimizer schedule inside jit
    steps_per_epoch: int = 0
    # "float32" (parity default) or "bfloat16" (MXU mixed precision:
    # fp32 master params/optimizer, bf16 forward/backward — see module
    # docstring)
    compute_dtype: str = "float32"
    # jax.checkpoint the audio SE-ResNet blocks (backward recomputes
    # intra-block activations): train-batch-headroom lever for the
    # activation-dominated stage-1 memory peak; measured in BASELINE.md
    remat_audio: bool = False
    # fuse the discriminator's real+fake forwards into ONE 2B-batch pass
    # (VERDICT r4 item 6). Semantically free here: MotionDiscriminator
    # has NO BatchNorm (transformer LayerNorms + Linears only), so the
    # only difference from two passes is the dropout mask draw — one key
    # masks 2B rows instead of two keys masking B each. Measured in
    # BASELINE.md.
    d_concat_batch: bool = False
    # dtype gradients are computed (and, under GSPMD data parallelism,
    # ALL-REDUCED) in. "float32" (default): grads upcast at the param-
    # cast transpose before the collective — the parity behavior.
    # "bfloat16": differentiate w.r.t. the bf16 param copy, so the whole
    # backward, including the cross-chip gradient all-reduce XLA inserts,
    # runs in bf16 (half the ICI bytes — BASELINE.md multi-chip model);
    # grads are upcast to fp32 only at the Adam update. Requires
    # compute_dtype="bfloat16".
    grad_dtype: str = "float32"


def build_models(cfg: GANConfig):
    gen = GestureTransformer(
        n_words=cfg.n_words, frames=cfg.frames, pose_dim=cfg.pose_dim,
        prior_frames=cfg.prior_frames, d_model=cfg.d_model,
        d_inner=cfg.d_inner, n_layers=cfg.n_layers, n_head=cfg.n_head,
        d_k=cfg.d_k, d_v=cfg.d_v, variant=cfg.variant,
        remat_audio=cfg.remat_audio,
    )
    disc = MotionDiscriminator(frames=cfg.frames - 1, pose_dim=cfg.pose_dim,
                               d_model=cfg.pose_dim)
    return gen, disc


def create_states(cfg: GANConfig, key):
    gen, disc = build_models(cfg)
    kg, kd, kdrop = jax.random.split(key, 3)
    spec = jnp.zeros((1, 128, 124), jnp.float32)
    text = jnp.zeros((1, cfg.frames), jnp.int32)
    prior = jnp.zeros((1, cfg.prior_frames, cfg.pose_dim), jnp.float32)
    gvars = gen.init({"params": kg, "dropout": kdrop}, spec, text, prior)
    dvars = disc.init(kd, jnp.zeros((1, cfg.frames - 1, cfg.pose_dim)))
    if cfg.steps_per_epoch > 0:
        tx = lambda: schedules.adam_staged(
            cfg.lr, cfg.steps_per_epoch, b1=cfg.beta1, b2=cfg.beta2,
            weight_decay=cfg.weight_decay)
    else:
        tx = lambda: schedules.adam(lr=cfg.lr, b1=cfg.beta1, b2=cfg.beta2,
                                    weight_decay=cfg.weight_decay)
    return (create_train_state(gen, gvars, tx()),
            create_train_state(disc, dvars, tx()))


@functools.partial(jax.jit, static_argnames=("cfg", "use_disc"),
                   donate_argnums=(0, 1))
def train_step(gen_state: TrainState, disc_state: TrainState, batch,
               rng, cfg: GANConfig, use_disc: bool = True):
    """One generator + one discriminator update. `batch` holds
    spectrogram (B,128,T), text (B,F) int, pose_seq (B,F,D),
    eid_label (B,8). `use_disc=False` implements the warm-up epochs."""
    return _train_step_impl(gen_state, disc_state, batch, rng, cfg,
                            use_disc)


@functools.partial(jax.jit, static_argnames=("cfg", "use_disc"),
                   donate_argnums=(0, 1))
def train_steps(gen_state: TrainState, disc_state: TrainState, batches,
                rng, cfg: GANConfig, use_disc: bool = True):
    """K train steps in ONE dispatch — a device-side training loop.

    `batches` holds (K, B, ...) arrays (one shuffled K*B host window
    reshaped, so no extra copies). The K micro-steps run as a lax.scan
    whose body is the full single-step update; parameters/optimizer
    advance sequentially exactly as K train_step calls would (parity
    test: tests/test_train.py::test_train_steps_matches_sequential).

    Why: on hosted/tunneled runtimes each dispatch+H2D round trip costs
    hundreds of ms regardless of payload (BASELINE.md round-5 loop
    decomposition), while the chip step itself is 74.5 ms — so the
    per-step protocol overhead, not the data path, bounds the training
    loop. One dispatch per K steps amortizes it K-fold. Per-step RNGs
    are split from `rng`; metrics are returned stacked (K,) per key."""
    k = jax.tree_util.tree_leaves(batches)[0].shape[0]

    def body(carry, xs):
        gs, ds = carry
        batch, step_rng = xs
        gs, ds, metrics = _train_step_impl(gs, ds, batch, step_rng, cfg,
                                           use_disc)
        return (gs, ds), metrics

    # unroll=k: the HLO while-loop form of this scan executes ~140x
    # slower on this TPU runtime (85 s vs 0.6 s for K=8 at the flagship
    # config — same family as the CLAUDE.md scan-vs-unroll compile note);
    # fully unrolled it is K copies of the proven single-step graph
    (gen_state, disc_state), metrics = jax.lax.scan(
        body, (gen_state, disc_state),
        (batches, jax.random.split(rng, k)), unroll=k)
    return gen_state, disc_state, metrics


def _train_step_impl(gen_state: TrainState, disc_state: TrainState,
                     batch, rng, cfg: GANConfig, use_disc: bool):
    spec = batch["spectrogram"]
    text = batch["text"]
    target = batch["pose_seq"]
    labels = jnp.argmax(batch["eid_label"], axis=1)
    prior = target[:, : cfg.prior_frames, :]
    g_rng, d_gen_rng, d_rng_real, d_rng_fake = jax.random.split(rng, 4)

    # mixed precision: `cast_c` lowers params/float inputs to the compute
    # dtype at the jit boundary of each apply; identity in fp32 mode. Loss
    # arithmetic below is always fp32 (`f32` upcasts model outputs).
    cdtype = jnp.dtype(cfg.compute_dtype)
    cast_c = (lambda t: cast_tree(t, cdtype)) if cdtype != jnp.float32 \
        else (lambda t: t)
    f32 = lambda x: x.astype(jnp.float32)
    bf16_grads = cfg.grad_dtype == "bfloat16"
    if bf16_grads and cdtype != jnp.bfloat16:
        raise ValueError("grad_dtype='bfloat16' requires "
                         "compute_dtype='bfloat16'")

    def value_and_grad_cast(loss_fn, params, *args):
        """value_and_grad with the mixed-precision cast INSIDE or OUTSIDE
        the differentiation, per cfg.grad_dtype (see the field
        docstring). Either way `loss_fn` receives compute-dtype params
        and the returned grads are fp32 for the optimizer."""
        if bf16_grads:
            out, grads = jax.value_and_grad(loss_fn, has_aux=True)(
                cast_c(params), *args)
            return out, jax.tree_util.tree_map(f32, grads)
        return jax.value_and_grad(
            lambda p, *a: loss_fn(cast_c(p), *a), has_aux=True)(
                params, *args)

    def d_update(fake):
        """One discriminator step on `fake` (already stop-gradient'd,
        compute dtype); reads the PRE-update disc state."""
        def d_loss_fn(cdparams):
            dv = {"params": cdparams, **(
                {"batch_stats": disc_state.batch_stats}
                if disc_state.batch_stats else {})}
            real_motion = calc_motion(cast_c(target))
            if cfg.d_concat_batch:
                logits = disc_state.apply_fn(
                    dv, jnp.concatenate([real_motion, calc_motion(fake)]),
                    train=True, rngs={"dropout": d_rng_real})
                real_logits, fake_logits = jnp.split(logits, 2)
            else:
                real_logits = disc_state.apply_fn(
                    dv, real_motion, train=True,
                    rngs={"dropout": d_rng_real})
                fake_logits = disc_state.apply_fn(
                    dv, calc_motion(fake), train=True,
                    rngs={"dropout": d_rng_fake})
            loss = losses.gan_d_loss(f32(real_logits), f32(fake_logits))
            return loss, ()

        (d_loss, _), d_grads = value_and_grad_cast(
            d_loss_fn, disc_state.params)
        return d_loss, disc_state.apply_gradients(d_grads)

    def g_loss_fn(cgparams, disc_for_adv):
        gv = {"params": cgparams, "batch_stats": gen_state.batch_stats}
        (pred, emo_feat, sem_feat, emo_logits, _), mutated = \
            gen_state.apply_fn(
                gv, cast_c(spec), text, cast_c(prior), train=True,
                rngs={"dropout": g_rng}, mutable=["batch_stats"],
            )
        rec = losses.l1_loss(f32(pred), target) * cfg.loss_regression_weight
        emo = losses.cross_entropy(f32(emo_logits), labels).mean() * \
            cfg.loss_emotion_weight
        if cfg.contrastive_mode == "paired_label":
            con = losses.emotion_infonce(f32(emo_feat).mean(axis=1), labels)
        else:  # "emo_sem": the reference's literal two-set diagonal loss
            con = losses.softmax_contrastive_loss(
                f32(emo_feat).mean(axis=1), f32(sem_feat).mean(axis=1))
        con = con * cfg.loss_contrastive_weight
        if use_disc:
            fake_logits = disc_for_adv.apply_fn(
                {"params": cast_c(disc_for_adv.params), **(
                    {"batch_stats": disc_for_adv.batch_stats}
                    if disc_for_adv.batch_stats else {})},
                calc_motion(pred), train=False)
            adv = losses.gan_g_loss(f32(fake_logits)) * cfg.loss_gan_weight
        else:
            adv = jnp.zeros(())
        total = rec + emo + con + adv
        aux = {"g_rec": rec, "g_emo": emo, "g_con": con, "g_adv": adv,
               "batch_stats": mutated["batch_stats"],
               "fake": jax.lax.stop_gradient(pred)}
        return total, aux

    if cfg.update_order == "d_first":
        # --- discriminator update first (torch convention) --------------
        # fake batch generated in TRAIN mode (G stays in train mode during
        # the D step); its BN mutations are discarded — the G update below
        # recomputes them from the same batch.
        if use_disc:
            (fake, *_), _ = gen_state.apply_fn(
                {"params": cast_c(gen_state.params),
                 "batch_stats": gen_state.batch_stats},
                cast_c(spec), text, cast_c(prior),
                train=True, rngs={"dropout": d_gen_rng},
                mutable=["batch_stats"],
            )
            d_loss, new_disc = d_update(jax.lax.stop_gradient(fake))
        else:
            d_loss, new_disc = jnp.zeros(()), disc_state
        # --- generator update: adversarial term vs the UPDATED disc -----
        (g_loss, aux), g_grads = value_and_grad_cast(
            g_loss_fn, gen_state.params, new_disc)
        aux.pop("fake")
        new_gen = gen_state.apply_gradients(
            g_grads, new_batch_stats=aux.pop("batch_stats"))
    elif cfg.update_order == "g_first":
        # --- single generator fwd/bwd serves both updates ---------------
        # adversarial term vs the PRE-update disc; D then trains on
        # stop_gradient of the same prediction (saves one full generator
        # forward per step)
        (g_loss, aux), g_grads = value_and_grad_cast(
            g_loss_fn, gen_state.params, disc_state)
        fake = aux.pop("fake")
        new_gen = gen_state.apply_gradients(
            g_grads, new_batch_stats=aux.pop("batch_stats"))
        if use_disc:
            d_loss, new_disc = d_update(fake)
        else:
            d_loss, new_disc = jnp.zeros(()), disc_state
    else:
        raise ValueError(f"unknown update_order {cfg.update_order!r}")

    metrics = {"g_loss": g_loss, "d_loss": d_loss, **aux}
    return new_gen, new_disc, metrics


@functools.partial(jax.jit, static_argnames=("cfg",))
def eval_step(gen_state: TrainState, batch, cfg: GANConfig):
    spec = batch["spectrogram"]
    text = batch["text"]
    target = batch["pose_seq"]
    prior = target[:, : cfg.prior_frames, :]
    pred, *_ = gen_state.apply_fn(
        model_variables(gen_state), spec, text, prior, train=False)
    l2 = jnp.mean(jnp.linalg.norm(target - pred, axis=-1))
    return {"pred": pred, "l2": l2}
