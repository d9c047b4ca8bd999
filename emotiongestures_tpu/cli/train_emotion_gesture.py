"""GAN trainer for the gesture generator — the reference's missing
train.py, reconstructed (SURVEY.md §7 hard part 1) from the loss
components, hyper-parameters, and utilities that shipped:
  * Adam(lr 2e-4, betas (0.5, 0.999)) (test_...py:357-359)
  * staged LR ladder (test_...py:64-78)
  * loss_regression_weight=100, pose_dis_warm_epoch (test_...py:360-361)
  * Motion_Discriminator on 59-frame offsets, emotion CE head, InfoNCE
    disentanglement (test_...py:80-127)

Usage (synthetic smoke):
  python -m emotiongestures_tpu.cli.train_emotion_gesture \
      --synthetic 64 --batch_size 8 --total_epoch 2 --d_model 128 \
      --latent_dim 256 --gen_layers 1
"""
from __future__ import annotations

import argparse
import logging
import os
import pprint
import sys
import time

import jax
import numpy as np


def build_parser() -> argparse.ArgumentParser:
    from .test_emotion_gesture_diversity_iterative import build_parser as bp

    parser = bp()  # same flag surface as the eval CLI
    parser.add_argument("--model_save_path", type=str,
                        default="./checkpoints/fullmodel_emotion_gesture/")
    parser.add_argument("--save_every", type=int, default=100)
    # --d_model / --gen_layers come from the shared eval parser
    parser.add_argument("--variant", type=str, default="memory",
                        choices=["memory", "base", "spatial_memory",
                                 "padding_initial"])
    parser.add_argument("--loss_gan_weight", type=float, default=1.0)
    parser.add_argument("--loss_emotion_weight", type=float, default=1.0)
    parser.add_argument("--loss_contrastive_weight", type=float, default=0.1)
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--compute_dtype", type=str, default="float32",
                        choices=["float32", "bfloat16"],
                        help="bfloat16 = MXU mixed precision (fp32 master "
                             "params/optimizer, bf16 forward/backward)")
    parser.add_argument("--update_order", type=str, default="d_first",
                        choices=["d_first", "g_first"],
                        help="g_first shares one generator forward between "
                             "both updates (G adv term sees the pre-update "
                             "D) — see train/gan.py; measured speedup in "
                             "BASELINE.md")
    from .test_emotion_gesture_diversity_iterative import _str2bool

    parser.add_argument("--d_concat_batch", type=_str2bool, default=False,
                        help="fuse the discriminator's real+fake forwards "
                             "into one 2B-batch pass (no BatchNorm in the "
                             "discriminator, so semantics are unchanged "
                             "up to dropout draws — train/gan.py)")
    parser.add_argument("--grad_dtype", type=str, default="float32",
                        choices=["float32", "bfloat16"],
                        help="bfloat16: backward (and the DP gradient "
                             "all-reduce) runs in bf16; fp32 masters "
                             "still applied by Adam. Requires "
                             "--compute_dtype bfloat16")
    parser.add_argument("--cast_inputs", type=_str2bool, default=False,
                        help="cast float32 batch arrays to bfloat16 on "
                             "the HOST before transfer — halves "
                             "host->device bytes (quantizes the "
                             "regression target to bf16; quality-checked "
                             "in BASELINE.md). Meant for input-bound "
                             "links; requires --compute_dtype bfloat16")
    parser.add_argument("--data_echo", type=int, default=1,
                        help="step each transferred batch E times "
                             "(fresh dropout/GAN RNG per echo) — the "
                             "standard mitigation when the host->device "
                             "link, not the chip, bounds training "
                             "(arXiv 1907.05550); E multiplies the "
                             "steps seen per data epoch")
    # --num_devices / --prefetch are inherited from the shared eval
    # parser (train semantics: the global --batch_size shards over the
    # data mesh, params/optimizer replicated — reference DataParallel,
    # train_...py:129-130)
    # multi-host (SURVEY §2.6 "multi-host via jax.distributed over DCN"):
    # run one process per host with the same command plus these flags; on
    # TPU pods they are auto-detected (pass --num_processes alone to
    # opt in). Each process loads only ITS slice of the global batch.
    parser.add_argument("--coordinator_address", type=str, default=None,
                        help="host:port of process 0 (multi-host runs)")
    parser.add_argument("--num_processes", type=int, default=None,
                        help="total process count for jax.distributed")
    parser.add_argument("--process_id", type=int, default=None)
    # --model_parallel comes from the shared eval parser (train semantics:
    # FFN/MHA kernels AND their Adam moments shard on `model`; single-host
    # only — beyond reference parity, the reference has no model
    # parallelism)
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="capture a jax.profiler trace (TensorBoard/"
                             "Perfetto) of --profile_steps steady-state "
                             "steps into this directory (skips the first "
                             "compile-dominated steps)")
    parser.add_argument("--profile_steps", type=int, default=5)
    return parser


def main(args=None):
    from .. import parallel
    from ..core.schedules import staged_lr
    from ..data.pipeline import Prefetcher, place_batches
    from ..train import gan
    from ..utils import (AsyncSaver, GracefulShutdown, load_checkpoint,
                         set_logger)
    from ..utils.logging import MetricLogger
    from ..utils.profiling import guard_finite

    argv = sys.argv[1:] if args is None else None
    if args is None:
        args = build_parser().parse_args()
    from .presets import GAN_TRAIN_FAST, apply_preset

    args = apply_preset(args, build_parser(), GAN_TRAIN_FAST, argv=argv)
    multihost = (args.coordinator_address is not None
                 or args.num_processes is not None)
    if multihost:
        # must run BEFORE anything initialises the local backend
        from ..parallel import distributed

        proc_idx, proc_cnt = distributed.initialize(
            args.coordinator_address, args.num_processes, args.process_id)
    set_logger(args.model_save_path,
               os.path.basename(__file__).replace(".py", ".log"))
    logging.info("JAX devices: %s", jax.devices())
    logging.info(pprint.pformat(vars(args)))
    if multihost:
        logging.info("multi-host: process %d/%d, %d local of %d global "
                     "devices", proc_idx, proc_cnt,
                     len(jax.local_devices()), jax.device_count())

    if args.cast_inputs and args.compute_dtype != "bfloat16":
        raise SystemExit("--cast_inputs requires --compute_dtype bfloat16")
    if args.data_echo < 1:
        raise SystemExit("--data_echo must be >= 1")

    if args.synthetic:
        from ..data.synthetic import SyntheticGestureDataset

        dataset = SyntheticGestureDataset(
            n_samples=args.synthetic, seed=args.seed,
            class_overlap=getattr(args, "class_overlap", 0.0))
        n_words = 64
    else:
        from ..data.dataset import SpeechMotionDataset
        from ..data.vocab import build_vocab

        dataset = SpeechMotionDataset(
            args.train_data_path, n_poses=args.n_poses,
            subdivision_stride=args.subdivision_stride,
            pose_resampling_fps=args.motion_resampling_framerate,
            remove_word_timing=(args.input_context == "text"))
        lang_model = build_vocab(
            "words", [dataset.store], None, args.wordembed_path,
            args.wordembed_dim)
        dataset.set_lang_model(lang_model)
        n_words = lang_model.n_words

    # one epoch = one pass over the data; echo steps count toward it so
    # the staged LR ladder still advances per DATA epoch
    steps_per_epoch = max(len(dataset) // args.batch_size, 1) * \
        args.data_echo
    cfg = gan.GANConfig(
        n_words=n_words, frames=args.n_frames, pose_dim=args.pose_dim,
        prior_frames=args.n_pre_poses, d_model=args.d_model,
        d_inner=args.latent_dim, n_layers=args.gen_layers,
        steps_per_epoch=steps_per_epoch,
        lr=args.lr, beta1=args.beta1, beta2=args.beta2,
        loss_regression_weight=float(args.loss_regression_weight),
        loss_gan_weight=args.loss_gan_weight,
        loss_emotion_weight=args.loss_emotion_weight,
        loss_contrastive_weight=args.loss_contrastive_weight,
        variant=args.variant, compute_dtype=args.compute_dtype,
        update_order=args.update_order,
        d_concat_batch=args.d_concat_batch, grad_dtype=args.grad_dtype)
    gen_state, disc_state = gan.create_states(cfg, jax.random.PRNGKey(
        args.seed))
    tp = getattr(args, "model_parallel", 1) > 1
    if multihost:
        from ..parallel import distributed

        if tp:
            raise SystemExit("--model_parallel is single-host only "
                             "(combine with --num_devices, not "
                             "--coordinator_address)")
        mesh = distributed.global_mesh()
        if args.batch_size % mesh.shape["data"]:
            raise SystemExit(
                f"--batch_size {args.batch_size} must divide over the "
                f"{mesh.shape['data']}-device global mesh")
    elif tp:
        mesh = parallel.tp_setup(args.num_devices, args.model_parallel,
                                 args.batch_size)
    else:
        mesh = parallel.dp_setup(args.num_devices, args.batch_size)
    if args.resume:
        gen_state, ok = load_checkpoint(
            gen_state, os.path.join(args.model_save_path, "generator"))
        disc_state, _ = load_checkpoint(
            disc_state, os.path.join(args.model_save_path, "discriminator"))
        if ok:
            logging.info("resumed from step %d", int(gen_state.step))
    if mesh is not None:
        # GSPMD data parallel: params/optimizer replicated, global batch
        # sharded on the mesh's `data` axis; the jitted train_step is
        # unchanged — XLA inserts the gradient all-reduce over ICI (and
        # DCN across hosts in multi-host runs); semantics proven identical
        # to single-device by
        # tests/test_parallel.py::test_dp_gan_train_step_matches_single_device
        if multihost:
            from ..parallel import distributed

            gen_state = distributed.replicate_to_global(gen_state, mesh)
            disc_state = distributed.replicate_to_global(disc_state, mesh)
        elif tp:
            gen_state = parallel.shard_state_tp(gen_state, mesh)
            disc_state = parallel.shard_state_tp(disc_state, mesh)
        else:
            gen_state = parallel.replicate_state(gen_state, mesh)
            disc_state = parallel.replicate_state(disc_state, mesh)
        logging.info("%s mesh: %s (global batch %d -> %d/chip)",
                     "data x model" if tp else "data-parallel",
                     dict(mesh.shape), args.batch_size,
                     args.batch_size // mesh.shape["data"])

    _KEYS = ("spectrogram", "text", "pose_seq", "eid_label")
    sharding = parallel.batch_sharding(mesh) if mesh is not None else None
    if multihost:
        from ..parallel import distributed

        proc_rows = distributed.process_batch_slice(args.batch_size)
        place = lambda v: distributed.host_local_batch(v, mesh)
    else:
        proc_rows = None
        place = None

    def epoch_batches(epoch):
        """Stream batches through the host prefetcher: assembly + H2D
        transfer (sharded over the mesh when data-parallel) overlap with
        the device step — the torch DataLoader workers+pin_memory role
        (train_...py:121-124). Multi-host: every process walks the SAME
        seeded permutation but assembles only its `process_batch_slice`
        rows (`rows=`), and the global array is built from those local
        rows via make_array_from_process_local_data — no host ever
        materialises the global batch."""
        # fields=_KEYS: the collator never assembles keys the step won't
        # read (raw audio alone is 75% of a BEAT record's bytes)
        raw = dataset.batches(args.batch_size, shuffle=True,
                              seed=args.seed + epoch,
                              rows=proc_rows, fields=_KEYS)
        if args.cast_inputs:
            # halve the wire bytes on input-bound links: f32 -> bf16 on
            # the producer thread (ml_dtypes arrays transfer natively)
            import ml_dtypes

            def _cast(b):
                return {k: (v.astype(ml_dtypes.bfloat16)
                            if v.dtype == np.float32 else v)
                        for k, v in b.items()}

            raw = (_cast(b) for b in raw)
        if args.prefetch > 0:
            return Prefetcher(raw, buffer_size=args.prefetch,
                              sharding=sharding, place=place)
        return place_batches(raw, sharding=sharding, place=place)

    # multi-host: only process 0 writes checkpoints (all processes hold
    # identical replicated states)
    if multihost:
        from ..parallel.distributed import coordination_barrier, is_primary

        save_ok = is_primary()
        # AOT-compile the train step on every process, THEN barrier: the
        # first executed step initializes the cross-process collective
        # cliques (gloo on CPU, ICI/DCN on TPU) with a bounded peer
        # timeout, so the processes must reach it together — compile-time
        # divergence (cache hit on one host, miss on another) would blow
        # that window
        rows_local = proc_rows.stop - proc_rows.start
        dummy = {
            "spectrogram": np.zeros((rows_local, 128, 124), np.float32),
            "text": np.zeros((rows_local, args.n_frames), np.int32),
            "pose_seq": np.zeros((rows_local, args.n_frames,
                                  args.pose_dim), np.float32),
            "eid_label": np.zeros((rows_local, 8), np.float32),
        }
        dummy = {k: place(v) for k, v in dummy.items()}
        rng0 = jax.random.PRNGKey(0)
        for ud in ((False, True) if args.pose_dis_warm_epoch > 0
                   else (True,)):
            gan.train_step.lower(gen_state, disc_state, dummy, rng0, cfg,
                                 use_disc=ud).compile()
        # gRPC barrier (no collectives) — processes leave it together
        coordination_barrier("egtp:train_step_compiled")
    else:
        save_ok = True

    # non-blocking saves: D2H fetch on this thread (states are donated to
    # the next step), orbax write on a background worker — the device
    # keeps training through the disk write (SURVEY §5 failure recovery)
    saver = AsyncSaver()

    def save_all():
        if save_ok:
            saver.save(gen_state, os.path.join(
                args.model_save_path, "generator"))
            saver.save(disc_state, os.path.join(
                args.model_save_path, "discriminator"))

    ladder = staged_lr(args.lr)
    metrics_log = MetricLogger(
        os.path.join(args.model_save_path, "metrics.jsonl"))
    global_iter = int(gen_state.step)
    # --profile_dir: trace a steady-state window (first steps are compile
    # dominated — ~5-10 min cold on this TPU, CLAUDE.md), starting after
    # step 3 of this run
    profile_at = global_iter + 3 if args.profile_dir else None
    profiling = False
    trace_started = False
    start = time.time()
    stop = GracefulShutdown().__enter__()
    for epoch in range(args.total_epoch):
        if stop.requested:
            break
        # the ladder itself is applied inside the jitted optimizer via
        # cfg.steps_per_epoch (train/gan.py); logged here for visibility.
        # Epoch-indexed decisions use the GLOBAL epoch (restored step //
        # steps_per_epoch) like the optimizer does, not the loop epoch —
        # on a --resume the loop restarts at 0, which would both log a
        # stale LR (seen in the round-4 flagship kill+resume rehearsal)
        # and re-run the discriminator warm-up
        global_epoch = global_iter // max(steps_per_epoch, 1)
        lr_now = float(ladder(global_epoch))
        use_disc = global_epoch >= args.pose_dis_warm_epoch
        for batch in epoch_batches(epoch):
            if stop.requested:
                # SIGTERM/SIGINT (pod preemption) — leave the loop at a
                # step boundary; the final save below checkpoints a
                # consistent state and --resume continues from it
                logging.warning(
                    "shutdown requested — checkpointing at step %d and "
                    "exiting cleanly", global_iter)
                break
            if args.data_echo > 1 and mesh is None:
                # pay the host->device transfer ONCE for the E echo
                # steps (sharded runs are already placed by the
                # prefetcher)
                batch = jax.device_put(batch)
            for _echo in range(args.data_echo):
                rng = jax.random.fold_in(
                    jax.random.PRNGKey(args.seed + 1), global_iter)
                if profile_at is not None and global_iter == profile_at:
                    from ..utils.profiling import \
                        _suspend_compilation_cache

                    # a compile under an ACTIVE trace whose cache key
                    # matches an existing entry CHECK-aborts XLA's
                    # executable deserializer (jax 0.9.0, reproduced 3x
                    # on full-suite runs incl. a freshly rebuilt cache);
                    # the persistent cache is suspended for the trace
                    # window
                    _cache_restore = _suspend_compilation_cache()
                    jax.profiler.start_trace(args.profile_dir)
                    profiling = True
                    trace_started = True
                gen_state, disc_state, metrics = gan.train_step(
                    gen_state, disc_state, batch, rng, cfg,
                    use_disc=use_disc)
                global_iter += 1
                if profiling and \
                        global_iter >= profile_at + args.profile_steps:
                    jax.tree_util.tree_map(
                        lambda x: x.block_until_ready(), metrics)
                    jax.profiler.stop_trace()
                    _cache_restore()
                    profiling = False
                    logging.info("profiler trace written to %s",
                                 args.profile_dir)
                if global_iter % 10 == 0:
                    m = {k: float(v) for k, v in metrics.items()}
                    guard_finite(m, "train metrics")  # EGTP_DEBUG_NANS=1
                    logging.info(
                        "epoch %d iter %d lr %.2e g %.4f (rec %.4f emo "
                        "%.4f con %.4f adv %.4f) d %.4f [%.1fs]",
                        epoch, global_iter, lr_now, m["g_loss"],
                        m["g_rec"], m["g_emo"], m["g_con"], m["g_adv"],
                        m["d_loss"], time.time() - start)
                    if save_ok:  # one metrics stream per run/process
                        metrics_log.log(global_iter, **m)
                if global_iter % args.save_every == 0:
                    save_all()
    if profiling:  # run ended inside the window
        jax.profiler.stop_trace()
        _cache_restore()
        logging.info("profiler trace written to %s", args.profile_dir)
    if profile_at is not None and not trace_started:
        logging.warning(
            "--profile_dir was set but the run ended before the trace "
            "window opened (needs >%d steps past the resume point; ran "
            "to step %d) — no trace was written (ADVICE r3)",
            profile_at, global_iter)
    save_all()
    saver.close()  # barrier: the final checkpoint is committed
    stop.__exit__(None, None, None)
    logging.info("done: %d iters in %.1fs%s", global_iter,
                 time.time() - start,
                 " (clean shutdown on signal)" if stop.requested else "")
    return gen_state, disc_state


def cli() -> None:
    """Console-script entry point: run main() but swallow its return value
    so setuptools' sys.exit(main()) exits 0 (ADVICE r2: main() returns
    rich objects for programmatic/test use, which would become a nonzero
    exit status and stderr noise)."""
    main()


if __name__ == "__main__":
    main()
