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

    return lambda spec, text, prior: _features(gvars, spec, text, prior)


def main(args=None):
    from ..train import cvae as cvae_train
    from ..train import fgd as fgd_train
    from ..train import skeleton as skeleton_train
    from ..utils import save_checkpoint, set_logger
    from ..utils.profiling import guard_finite

    if args is None:
        args = build_parser().parse_args()
    set_logger(args.model_save_path, f"train_{args.model}.log")
    logging.info("JAX devices: %s", jax.devices())
    logging.info(pprint.pformat(vars(args)))

    if args.synthetic:
        from ..data.synthetic import SyntheticGestureDataset

        dataset = SyntheticGestureDataset(n_samples=args.synthetic,
                                          seed=args.seed)
        n_words = 64
    else:
        from ..data.dataset import SpeechMotionDataset

        dataset = SpeechMotionDataset(
            args.train_data_path, n_poses=args.n_poses,
            subdivision_stride=args.subdivision_stride,
            pose_resampling_fps=args.motion_resampling_framerate)
        n_words = 64

    key = jax.random.PRNGKey(args.seed)
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
                                            d_inner=args.latent_dim)
        step = lambda st, batch, rng: skeleton_train.train_step(
            st, batch["pose_seq"], batch["eid_label"], rng)
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

    mesh = parallel.dp_setup(args.num_devices, args.batch_size)
    if mesh is not None:
        state = parallel.replicate_state(state, mesh)
        logging.info("data-parallel mesh: %s", dict(mesh.shape))
    sharding = parallel.batch_sharding(mesh) if mesh is not None else None
    keys = {"fgd": ("pose_seq",),
            "skeleton": ("pose_seq", "eid_label"),
            "cvae": ("spectrogram", "text", "pose_seq", "eid_label")}[
        args.model]

    def epoch_batches(epoch):
        raw = ({k: b[k] for k in keys}
               for b in dataset.batches(args.batch_size, shuffle=True,
                                        seed=args.seed + epoch))
        if args.prefetch > 0:
            return Prefetcher(raw, buffer_size=args.prefetch,
                              sharding=sharding)
        return place_batches(raw, sharding=sharding)

    global_iter = 0
    start = time.time()
    for epoch in range(args.total_epoch):
        for batch in epoch_batches(epoch):
            rng = jax.random.fold_in(jax.random.PRNGKey(args.seed + 1),
                                     global_iter)
            state, metrics = step(state, batch, rng)
            global_iter += 1
            if global_iter % 10 == 0:
                guard_finite(metrics, "train metrics")  # EGTP_DEBUG_NANS=1
                logging.info("epoch %d iter %d %s [%.1fs]", epoch,
                             global_iter,
                             {k: round(float(v), 4)
                              for k, v in metrics.items()},
                             time.time() - start)
            if global_iter % args.save_every == 0:
                save_checkpoint(state, save_dir)
    save_checkpoint(state, save_dir)
    logging.info("done: %d iters", global_iter)
    return state


def cli() -> None:
    """Console-script entry point: run main() but swallow its return value
    so setuptools' sys.exit(main()) exits 0 (ADVICE r2: main() returns
    rich objects for programmatic/test use, which would become a nonzero
    exit status and stderr noise)."""
    main()


if __name__ == "__main__":
    main()
