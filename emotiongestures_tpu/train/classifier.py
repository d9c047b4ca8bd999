"""Audio emotion classifier training (train_audio_classifier_K_fold.py).

The reference's per-batch hot loop (train_...py:155-175) becomes one
jitted `train_step`; its K-fold driver (train_...py:109-204) is the
host-side `train_k_fold` below. Loss = focal(alpha per-class, gamma 2)
* 100; optimizer Adam(lr 3e-4, betas (0.5, 0.999), wd 1e-5).
"""
from __future__ import annotations

import functools
import logging
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import losses, schedules
from ..core.precision import cast_tree
from ..models import EmotionNet
from .state import TrainState, create_train_state, model_variables


def _caster(compute_dtype: str):
    """Mixed precision (same policy as train/gan.py): fp32 masters, the
    forward/backward in `compute_dtype`; identity for float32."""
    cdtype = jnp.dtype(compute_dtype)
    if cdtype == jnp.float32:
        return lambda t: t
    return lambda t: cast_tree(t, cdtype)


def create_state(rng_key, lr: float = 3e-4, beta1: float = 0.5,
                 beta2: float = 0.999, weight_decay: float = 1e-5,
                 spec_shape=(1, 128, 124)) -> TrainState:
    model = EmotionNet()
    variables = model.init(rng_key, jnp.zeros(spec_shape, jnp.float32),
                           train=False)
    tx = schedules.adam(lr=lr, b1=beta1, b2=beta2,
                        weight_decay=weight_decay)
    return create_train_state(model, variables, tx)


@functools.partial(jax.jit, static_argnames=("gamma", "compute_dtype"),
                   donate_argnums=0)
def train_step(state: TrainState, spec, labels_onehot, alpha,
               gamma: float = 2.0, compute_dtype: str = "float32"):
    """One optimizer step. labels are one-hot (collate keeps them so,
    argmax'd like train_...py:168); alpha is the per-class focal weight
    vector recomputed per epoch (train_...py:147-151).
    compute_dtype="bfloat16" runs the fwd/bwd in bf16 (fp32 masters,
    fp32 loss — same policy as train/gan.py)."""
    labels = jnp.argmax(labels_onehot, axis=1)
    cast_c = _caster(compute_dtype)

    def loss_fn(params):
        out, mutated = state.apply_fn(
            {"params": cast_c(params), "batch_stats": state.batch_stats},
            cast_c(spec), train=True, mutable=["batch_stats"],
        )
        out = out.astype(jnp.float32)
        loss = losses.focal_loss(out, labels, alpha=alpha, gamma=gamma) * 100.0
        return loss, (mutated["batch_stats"], out)

    (loss, (new_bs, out)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)
    new_state = state.apply_gradients(grads, new_batch_stats=new_bs)
    acc = 100.0 * jnp.mean(jnp.argmax(out, 1) == labels)
    return new_state, {"loss": loss, "acc": acc}


@functools.partial(jax.jit, static_argnames=("compute_dtype",))
def eval_step(state: TrainState, spec, labels_onehot,
              compute_dtype: str = "float32"):
    labels = jnp.argmax(labels_onehot, axis=1)
    cast_c = _caster(compute_dtype)
    v = model_variables(state)
    v = {**v, "params": cast_c(v["params"])}
    out = state.apply_fn(v, cast_c(spec), train=False)
    preds = jnp.argmax(out, 1)
    acc = 100.0 * jnp.mean(preds == labels)
    return acc, preds, labels


def confusion_matrix(preds, labels, n_classes: int = 8):
    """(train_...py:56-60) — rows are predictions, columns are truth."""
    cm = np.zeros((n_classes, n_classes), dtype=np.int64)
    for p, t in zip(np.asarray(preds), np.asarray(labels)):
        cm[p, t] += 1
    return cm


def vis_confusion_matrix(conf_matrix: np.ndarray, save_path: str,
                         labels=None):
    """Confusion-matrix figure (train_...py:62-87); rows = predictions,
    columns = truth, counts annotated."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ..data.dataset import EMOTION_LABELS

    labels = labels or EMOTION_LABELS
    n = len(labels)
    fig, ax = plt.subplots(figsize=(6, 5))
    ax.imshow(conf_matrix, cmap=plt.cm.Blues)
    thresh = conf_matrix.max() / 2 if conf_matrix.max() else 0.5
    for x in range(n):
        for y in range(n):
            info = int(conf_matrix[y, x])
            ax.text(x, y, info, va="center", ha="center",
                    color="white" if info > thresh else "black")
    ax.set_yticks(range(n))
    ax.set_yticklabels(labels)
    ax.set_xticks(range(n))
    ax.set_xticklabels(labels, rotation=30)
    fig.tight_layout()
    fig.savefig(save_path, dpi=200)
    plt.close(fig)
    return save_path


def class_alpha(labels_onehot: np.ndarray, n_classes: int = 8) -> np.ndarray:
    """Per-class re-weighting (train_...py:147-151):
    alpha_c = sum(count) / (n_classes * count_c)."""
    raw = labels_onehot.reshape(-1, n_classes).sum(0)
    counts = np.maximum(raw, 1.0)  # clamp absent classes (ref divides by 0)
    return (raw.sum() / (n_classes * counts)).astype(np.float32)


def k_fold_indices(n: int, n_splits: int = 10, seed: int = 0):
    """KFold(10, shuffle=True) equivalent (train_...py:301)."""
    order = np.random.RandomState(seed).permutation(n)
    folds = np.array_split(order, n_splits)
    for i in range(n_splits):
        val = folds[i]
        train = np.concatenate([folds[j] for j in range(n_splits) if j != i])
        yield train, val


def _index_batches(dataset, indices, batch_size: int):
    """Yield {"spectrogram", "eid_label"} batches over `indices`."""
    for i in range(0, len(indices) - batch_size + 1, batch_size):
        samples = [dataset[int(j)] for j in indices[i : i + batch_size]]
        yield {
            "spectrogram": np.stack([s["spectrogram"] for s in samples]),
            "eid_label": np.stack([s["eid_label"] for s in samples]),
        }


def _batch_stream(dataset, indices, batch_size: int, mesh, prefetch: int):
    """Batch iterator, optionally prefetched + mesh-sharded (the torch
    DataLoader workers+pin_memory role, train_...py:121-124)."""
    from ..data.pipeline import Prefetcher, place_batches
    from ..parallel import batch_sharding

    raw = _index_batches(dataset, indices, batch_size)
    sharding = batch_sharding(mesh) if mesh is not None else None
    if prefetch <= 0:
        return place_batches(raw, sharding=sharding)
    return Prefetcher(raw, buffer_size=prefetch, sharding=sharding)


def train_k_fold(
    dataset,
    test_dataset,
    batch_size: int = 128,
    n_splits: int = 10,
    epochs: int = 1,
    lr: float = 3e-4,
    eval_every: int = 100,
    seed: int = 0,
    max_folds: Optional[int] = None,
    checkpoint_fn=None,
    compute_dtype: str = "float32",
    mesh=None,
    prefetch: int = 2,
    should_stop=None,
    resume_from=None,
):
    """Host-side K-fold driver mirroring train_...py:109-204. Returns the
    per-fold final test accuracies.

    `resume_from`: (state, fold) from a checkpoint — folds before `fold`
    are skipped (their results were already logged by the killed run),
    and `fold` continues from state.step: the driver replays the same
    seeded epoch permutations and skips the batches already consumed, so
    the continued fold sees exactly the data order the uninterrupted run
    would have.

    `mesh`: a (data,)-axis jax Mesh for GSPMD data parallelism — the
    reference wraps the model in DataParallel when >1 GPU is visible
    (train_...py:129-130); here the state is replicated and the global
    batch sharded over the mesh, with the same jitted train_step.

    `should_stop`: zero-arg callable polled at step boundaries
    (GracefulShutdown.requested — pod preemption); when it turns true the
    current fold checkpoints and the driver returns the folds finished so
    far."""
    log = logging.getLogger("emotiongestures_tpu.classifier")
    should_stop = should_stop or (lambda: False)
    results = []
    start_fold = 0
    resume_state = None
    if resume_from is not None:
        resume_state, start_fold = resume_from
    for fold, (train_idx, val_idx) in enumerate(
        k_fold_indices(len(dataset), n_splits, seed)
    ):
        if max_folds is not None and fold >= max_folds:
            break
        if fold < start_fold:
            continue
        if should_stop():
            break
        steps_per_epoch = max(len(train_idx) // batch_size, 1)
        if resume_state is not None and fold == start_fold:
            state = resume_state
            if mesh is not None:
                from ..parallel import replicate_state

                state = replicate_state(state, mesh)
            resume_state = None
            global_iter = int(state.step)
            start_epoch = global_iter // steps_per_epoch
            skip_batches = global_iter - start_epoch * steps_per_epoch
            log.info("resuming fold %d at iter %d (epoch %d, skipping "
                     "%d consumed batches)", fold + 1, global_iter,
                     start_epoch, skip_batches)
        else:
            state = create_state(jax.random.PRNGKey(seed + fold), lr=lr)
            if mesh is not None:
                from ..parallel import replicate_state

                state = replicate_state(state, mesh)
            global_iter = 0
            start_epoch = 0
            skip_batches = 0
        for epoch in range(start_epoch, epochs):
            if should_stop():
                break
            # epoch-level class re-weighting over this fold's train split
            all_labels = np.stack(
                [dataset[int(i)]["eid_label"] for i in train_idx])
            alpha = class_alpha(all_labels)
            order = np.random.RandomState(seed + epoch).permutation(
                train_idx)
            if skip_batches:
                # replay the permutation past the consumed prefix
                order = order[skip_batches * batch_size:]
                skip_batches = 0
            for batch in _batch_stream(dataset, order, batch_size, mesh,
                                       prefetch):
                if should_stop():
                    log.warning("shutdown requested — checkpointing fold "
                                "%d at iter %d and stopping", fold + 1,
                                global_iter)
                    if checkpoint_fn is not None:
                        checkpoint_fn(state, fold, epoch, global_iter)
                    break
                state, metrics = train_step(
                    state, batch["spectrogram"], batch["eid_label"], alpha,
                    compute_dtype=compute_dtype)
                global_iter += 1
                if global_iter % eval_every == 0:
                    from ..utils.profiling import guard_finite

                    guard_finite(metrics, "train metrics")  # EGTP_DEBUG_NANS
                    val_acc = evaluate(state, dataset, val_idx, batch_size,
                                       compute_dtype, mesh=mesh,
                                       prefetch=prefetch)
                    log.info(
                        "Fold %d, Epoch %d, iter %d, loss %.4f, "
                        "Val Accuracy: %.2f%%",
                        fold + 1, epoch, global_iter,
                        float(metrics["loss"]), val_acc,
                    )
                    if checkpoint_fn is not None:
                        checkpoint_fn(state, fold, epoch, global_iter)
        if should_stop():  # skip the test pass; the fold checkpointed
            break
        test_acc, cm = test_model(state, test_dataset, batch_size,
                                  compute_dtype, mesh=mesh,
                                  prefetch=prefetch)
        log.info("Fold %d Test Accuracy: %.2f%%", fold + 1, test_acc)
        results.append({"fold": fold, "test_acc": test_acc,
                        "confusion": cm, "state": state})
    return results


def evaluate(state, dataset, indices, batch_size: int,
             compute_dtype: str = "float32", mesh=None,
             prefetch: int = 2) -> float:
    accs = []
    for batch in _batch_stream(dataset, indices, batch_size, mesh,
                               prefetch):
        acc, _, _ = eval_step(state, batch["spectrogram"],
                              batch["eid_label"],
                              compute_dtype=compute_dtype)
        accs.append(float(acc))
    return float(np.mean(accs)) if accs else 0.0


def test_model(state, dataset, batch_size: int,
               compute_dtype: str = "float32", mesh=None,
               prefetch: int = 2):
    """Test pass with confusion matrix (train_...py:206-255)."""
    accs = []
    cm = np.zeros((8, 8), dtype=np.int64)
    for batch in _batch_stream(dataset, np.arange(len(dataset)),
                               batch_size, mesh, prefetch):
        acc, preds, lab = eval_step(state, batch["spectrogram"],
                                    batch["eid_label"],
                                    compute_dtype=compute_dtype)
        accs.append(float(acc))
        cm += confusion_matrix(preds, lab)
    return (float(np.mean(accs)) if accs else 0.0), cm
