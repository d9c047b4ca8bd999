"""Trainers for the auxiliary networks the eval pipeline freezes:
  --model fgd       FGD feature autoencoder (model/FGD.py)
  --model skeleton  skeleton emotion classifier (skeleton_classifer/)
  --model cvae      emotion-prior CVAE (CAVE/BEAT_CVAE.py v1/v2/v3) over
                    emotion features from a (frozen) generator checkpoint,
                    or from the generator's random init when absent —
                    enough to exercise the full pipeline end-to-end.

Usage (synthetic smoke):
  python -m emotiongestures_tpu.cli.train_auxiliary --model fgd \
      --synthetic 64 --batch_size 16 --total_epoch 2
"""
from __future__ import annotations

import argparse
import logging
import os
import pprint
import time

import jax
import jax.numpy as jnp
import numpy as np


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", type=str, required=True,
                        choices=["fgd", "skeleton", "cvae"])
    parser.add_argument("--cvae_version", type=int, default=3)
    parser.add_argument("--motion_resampling_framerate", type=int, default=15)
    parser.add_argument("--n_poses", type=int, default=60)
    parser.add_argument("--subdivision_stride", type=int, default=30)
    parser.add_argument("--batch_size", type=int, default=128)
    parser.add_argument("--lr", type=float, default=3e-4)
    parser.add_argument("--total_epoch", type=int, default=10)
    parser.add_argument("--pose_dim", type=int, default=282)
    parser.add_argument("--kl_beta", type=float, default=0.1)
    parser.add_argument("--model_save_path", type=str,
                        default="./checkpoints/auxiliary/")
    parser.add_argument("--generator_checkpoint", type=str, default=None,
                        help="frozen generator for CVAE feature extraction")
    parser.add_argument("--d_model", type=int, default=512,
                        help="generator width — must match the checkpoint "
                             "for --model cvae; also the CVAE feat_dim")
    parser.add_argument("--latent_dim", type=int, default=2048,
                        help="generator d_inner / skeleton-classifier "
                             "d_inner — match the eval CLI's --latent_dim")
    parser.add_argument("--gen_layers", type=int, default=3)
    parser.add_argument("--train_data_path", type=str,
                        default="./data/beat_trainable_dataset/train/")
    parser.add_argument("--input_context", type=str, default="text")
    parser.add_argument("--synthetic", type=int, default=0)
    parser.add_argument("--class_overlap", type=float, default=0.0,
                        help="synthetic-set class-overlap knob "
                             "(data/synthetic.py; keeps Emotion-Acc a "
                             "graded metric)")
    parser.add_argument("--save_every", type=int, default=100)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--num_devices", type=int, default=0,
                        help="data-parallel device count (0 = all visible "
                             "devices); same GSPMD semantics as the other "
                             "train CLIs")
    parser.add_argument("--prefetch", type=int, default=2,
                        help="host->device prefetch depth; 0 = synchronous")
    parser.add_argument("--resume", action="store_true",
                        help="continue from the latest checkpoint under "
                             "<model_save_path>/<model>/ — also the "
                             "fine-tune entry for reference .pth weights "
                             "imported by egtp-convert-checkpoint")
    # multi-host (same semantics as the GAN train CLI): one process per
    # host; each process assembles only its slice of the global batch
    parser.add_argument("--coordinator_address", type=str, default=None,
                        help="host:port of process 0 (multi-host runs)")
    parser.add_argument("--num_processes", type=int, default=None,
                        help="total process count for jax.distributed")
    parser.add_argument("--process_id", type=int, default=None)
    # --model skeleton init-lottery mitigation (train/skeleton.py
    # PlateauDetector; VERDICT r3 Weak #4): the reference architecture
    # converges or sits at chance depending purely on the init seed
    parser.add_argument("--plateau_patience", type=int, default=800,
                        help="skeleton only: steps without the trailing-"
                             "window mean train acc reaching --plateau_acc "
                             "before reseeding the init (0 disables "
                             "auto-reseed); must exceed --warmup_steps or "
                             "every attempt is killed mid-warmup")
    parser.add_argument("--plateau_acc", type=float, default=40.0,
                        help="skeleton only: trailing-mean train-accuracy "
                             "%% that counts as 'escaped the plateau' "
                             "(the ln4 plateau's mean sits ~25%%)")
    parser.add_argument("--max_reseeds", type=int, default=8,
                        help="skeleton only: bound on plateau restarts")
    parser.add_argument("--warmup_steps", type=int, default=400,
                        help="skeleton only: linear LR warmup steps — the "
                             "post-LN d_model-512 classifier "
                             "(skeleton_classifer/Models.py:199-283) needs "
                             "it to escape chance at minibatch scale "
                             "(round-4 rehearsal: 0/9 seeds escaped "
                             "without it); 0 restores the constant-lr "
                             "round-3 toy protocol")
    parser.add_argument("--grad_clip", type=float, default=0.0,
                        help="skeleton only: global-norm gradient clip "
                             "(0 disables). Required on ambiguous data "
                             "(--class_overlap > 0): a converged "
                             "classifier meeting a near-boundary batch "
                             "takes an Adam-amplified step that kills "
                             "the network in one update (round-5 "
                             "ledger); clipping bounds it so training "
                             "recovers")
    return parser


def _emotion_features(args, batch, n_words: int):
    """Frozen-generator emotion_proj features for CVAE training
    (SURVEY.md §3.5)."""
    from ..models import GestureTransformer
    from ..utils import load_checkpoint

    gen = GestureTransformer(n_words=n_words, frames=args.n_poses,
                             pose_dim=args.pose_dim, d_model=args.d_model,
                             d_inner=args.latent_dim,
                             n_layers=args.gen_layers)
    spec = jnp.zeros((1, 128, 124), jnp.float32)
    text = jnp.zeros((1, args.n_poses), jnp.int32)
    prior = jnp.zeros((1, 10, args.pose_dim), jnp.float32)
    gvars = gen.init(jax.random.PRNGKey(args.seed), spec, text, prior)
    if args.generator_checkpoint:
        from ..core.schedules import adam
        from ..train.state import create_train_state

        state = create_train_state(gen, gvars, adam(args.lr))
        state, ok = load_checkpoint(state, args.generator_checkpoint)
        if ok:
            gvars = {"params": state.params,
                     "batch_stats": state.batch_stats}
            logging.info("loaded generator checkpoint for features")
    else:
        logging.warning("no --generator_checkpoint: CVAE features come "
                        "from a randomly initialised generator")

    # variables enter as an ARGUMENT: closing over them embeds ~181 MB of
    # fp32 HLO constants at the default geometry and the remote-compile
    # tunnel rejects bodies >~100 MB (the round-2 demo-CLI bug)
    @jax.jit
    def _features(gvars, spec, text, prior):
        _, emo, _, _, _ = gen.apply(gvars, spec, text, prior, train=False)
        return emo

    class _FeatureFn:
        """Callable feature extractor that also exposes lower_compile for
        the multi-host compile-alignment phase (warms the persistent XLA
        cache without executing)."""

        def __call__(self, spec, text, prior):
            return _features(gvars, spec, text, prior)

        def lower_compile(self, spec, text, prior):
            _features.lower(gvars, spec, text, prior).compile()

    return _FeatureFn()


def main(args=None):
    from ..train import cvae as cvae_train
    from ..train import fgd as fgd_train
    from ..train import skeleton as skeleton_train
    from ..utils import AsyncSaver, GracefulShutdown, set_logger
    from ..utils.profiling import guard_finite

    if args is None:
        args = build_parser().parse_args()
    multihost = (args.coordinator_address is not None
                 or args.num_processes is not None)
    if multihost:
        # must run BEFORE anything initialises the local backend
        from ..parallel import distributed

        proc_idx, proc_cnt = distributed.initialize(
            args.coordinator_address, args.num_processes, args.process_id)
    set_logger(args.model_save_path, f"train_{args.model}.log")
    logging.info("JAX devices: %s", jax.devices())
    logging.info(pprint.pformat(vars(args)))
    if multihost:
        logging.info("multi-host: process %d/%d, %d local of %d global "
                     "devices", proc_idx, proc_cnt,
                     len(jax.local_devices()), jax.device_count())

    if args.synthetic:
        from ..data.synthetic import SyntheticGestureDataset

        dataset = SyntheticGestureDataset(
            n_samples=args.synthetic, seed=args.seed,
            class_overlap=getattr(args, "class_overlap", 0.0))
        n_words = 64
    else:
        from ..data.dataset import SpeechMotionDataset

        dataset = SpeechMotionDataset(
            args.train_data_path, n_poses=args.n_poses,
            subdivision_stride=args.subdivision_stride,
            pose_resampling_fps=args.motion_resampling_framerate)
        n_words = 64

    key = jax.random.PRNGKey(args.seed)
    plateau = None
    if args.model == "fgd":
        state = fgd_train.create_state(key, lr=args.lr,
                                       pose_dim=args.pose_dim)
        step = lambda st, batch, rng: fgd_train.train_step(
            st, batch["pose_seq"], rng)
    elif args.model == "skeleton":
        # d_model stays 512 (the eval CLI always builds the skeleton
        # classifier at 512); d_inner follows --latent_dim like the eval
        state = skeleton_train.create_state(key, lr=args.lr,
                                            pose_dim=args.pose_dim,
                                            d_inner=args.latent_dim,
                                            warmup_steps=args.warmup_steps,
                                            grad_clip=args.grad_clip)
        step = lambda st, batch, rng: skeleton_train.train_step(
            st, batch["pose_seq"], batch["eid_label"], rng)
        if args.plateau_patience > 0:
            plateau = skeleton_train.PlateauDetector(
                patience=args.plateau_patience, acc_target=args.plateau_acc,
                max_reseeds=args.max_reseeds)
    else:
        state = cvae_train.create_state(key, lr=args.lr,
                                        version=args.cvae_version,
                                        feat_dim=args.d_model)
        feat_fn = _emotion_features(args, None, n_words)

        def step(st, batch, rng):
            feats = feat_fn(batch["spectrogram"], batch["text"],
                            batch["pose_seq"][:, :10, :])
            return cvae_train.train_step(st, feats, batch["eid_label"],
                                         rng, beta=args.kl_beta)

    save_dir = os.path.join(args.model_save_path, args.model)
    if args.resume:
        from ..utils import load_checkpoint

        state, ok = load_checkpoint(state, save_dir)
        if ok:
            logging.info("resumed %s from step %d", args.model,
                         int(state.step))

    from .. import parallel
    from ..data.pipeline import Prefetcher, place_batches

    if multihost:
        from ..parallel import distributed

        mesh = distributed.global_mesh()
        if args.batch_size % mesh.shape["data"]:
            raise SystemExit(
                f"--batch_size {args.batch_size} must divide over the "
                f"{mesh.shape['data']}-device global mesh")
        state = distributed.replicate_to_global(state, mesh)
        proc_rows = distributed.process_batch_slice(args.batch_size)
        place = lambda v: distributed.host_local_batch(v, mesh)
        logging.info("multi-host mesh: %s", dict(mesh.shape))
    else:
        mesh = parallel.dp_setup(args.num_devices, args.batch_size)
        if mesh is not None:
            state = parallel.replicate_state(state, mesh)
            logging.info("data-parallel mesh: %s", dict(mesh.shape))
        proc_rows = None
        place = None
    sharding = parallel.batch_sharding(mesh) if mesh is not None else None
    keys = {"fgd": ("pose_seq",),
            "skeleton": ("pose_seq", "eid_label"),
            "cvae": ("spectrogram", "text", "pose_seq", "eid_label")}[
        args.model]

    save_ok = True
    if multihost:
        # compile BEFORE the first executed collective, then align at a
        # gRPC barrier: gloo/ICI clique init has a bounded peer-wait that
        # compile-time divergence between hosts (cache hit on one, miss
        # on another) easily exceeds — same pattern as the GAN train CLI
        rows_local = proc_rows.stop - proc_rows.start
        dummy = {
            "spectrogram": np.zeros((rows_local, 128, 124), np.float32),
            "text": np.zeros((rows_local, args.n_poses), np.int32),
            "pose_seq": np.zeros((rows_local, args.n_poses, args.pose_dim),
                                 np.float32),
            "eid_label": np.zeros((rows_local, 8), np.float32),
        }
        dummy = {k: place(v) for k, v in dummy.items() if k in keys}
        rng0 = jax.random.PRNGKey(0)
        if args.model == "fgd":
            fgd_train.train_step.lower(
                state, dummy["pose_seq"], rng0).compile()
        elif args.model == "skeleton":
            skeleton_train.train_step.lower(
                state, dummy["pose_seq"], dummy["eid_label"], rng0).compile()
        else:
            # two-phase: compile the feature fn on every host, barrier,
            # THEN execute it once (its forward contains the first
            # cross-process collectives — TMMemory all-gather), and lower
            # the CVAE step against the REAL feats sharding
            feat_args = (dummy["spectrogram"], dummy["text"],
                         dummy["pose_seq"][:, :10, :])
            feat_fn.lower_compile(*feat_args)
            distributed.coordination_barrier("egtp:aux_feat_compiled")
            feats_dummy = feat_fn(*feat_args)
            cvae_train.train_step.lower(
                state, feats_dummy, dummy["eid_label"], rng0,
                beta=args.kl_beta).compile()
        distributed.coordination_barrier("egtp:aux_step_compiled")
        save_ok = distributed.is_primary()

    def epoch_batches(epoch):
        # fields=keys: the collator never assembles keys this model's
        # step won't read (fgd needs only pose_seq — 10% of the bytes)
        raw = dataset.batches(args.batch_size, shuffle=True,
                              seed=args.seed + epoch,
                              rows=proc_rows, fields=keys)
        if args.prefetch > 0:
            return Prefetcher(raw, buffer_size=args.prefetch,
                              sharding=sharding, place=place)
        return place_batches(raw, sharding=sharding, place=place)

    global_iter = 0
    start = time.time()
    # non-blocking saves + preemption-safe exit (SURVEY §5; same
    # semantics as the GAN trainer)
    saver = AsyncSaver()
    stop = GracefulShutdown().__enter__()
    for epoch in range(args.total_epoch):
        if stop.requested:
            break
        for batch in epoch_batches(epoch):
            if stop.requested:
                logging.warning(
                    "shutdown requested — checkpointing at step %d and "
                    "exiting cleanly", global_iter)
                break
            rng = jax.random.fold_in(jax.random.PRNGKey(args.seed + 1),
                                     global_iter)
            state, metrics = step(state, batch, rng)
            global_iter += 1
            if plateau is not None and plateau.update(float(metrics["acc"])):
                # init lottery (VERDICT r3 Weak #4): restart from a fresh
                # deterministic seed; the plateaued attempt's checkpoints
                # are chance-level and are dropped so resume/eval can
                # never pick one up
                logging.warning(
                    "skeleton init-lottery plateau: trailing-mean train "
                    "acc never reached %.1f%% in %d steps — reseeding "
                    "(attempt %d/%d)", args.plateau_acc,
                    args.plateau_patience, plateau.attempts,
                    args.max_reseeds)
                state = skeleton_train.create_state(
                    plateau.next_key(key), lr=args.lr,
                    pose_dim=args.pose_dim, d_inner=args.latent_dim,
                    warmup_steps=args.warmup_steps,
                    grad_clip=args.grad_clip)
                if multihost:
                    state = distributed.replicate_to_global(state, mesh)
                elif mesh is not None:
                    state = parallel.replicate_state(state, mesh)
                if save_ok:
                    import shutil

                    saver.wait()
                    shutil.rmtree(save_dir, ignore_errors=True)
            if global_iter % 10 == 0:
                guard_finite(metrics, "train metrics")  # EGTP_DEBUG_NANS=1
                logging.info("epoch %d iter %d %s [%.1fs]", epoch,
                             global_iter,
                             {k: round(float(v), 4)
                              for k, v in metrics.items()},
                             time.time() - start)
            if global_iter % args.save_every == 0 and save_ok:
                saver.save(state, save_dir)
    if save_ok:  # multi-host: only process 0 writes (states replicated)
        saver.save(state, save_dir)
    saver.close()
    stop.__exit__(None, None, None)
    logging.info("done: %d iters%s", global_iter,
                 " (clean shutdown on signal)" if stop.requested else "")
    return state


def cli() -> None:
    """Console-script entry point: run main() but swallow its return value
    so setuptools' sys.exit(main()) exits 0 (ADVICE r2: main() returns
    rich objects for programmatic/test use, which would become a nonzero
    exit status and stderr noise)."""
    main()


if __name__ == "__main__":
    main()
