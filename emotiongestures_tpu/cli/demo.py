"""End-to-end inference demo: waveform -> on-device log-mel frontend ->
emotion-conditioned diverse gesture generation -> (optional) rendered
animation. The one CLI that exercises the full serving path including
the audio frontend (the eval CLI consumes precomputed spectrograms).

  python -m emotiongestures_tpu.cli.demo --seconds 4 --emotion happiness \
      --num_samples 3 --out /tmp/demo
  python -m emotiongestures_tpu.cli.demo --wav speech.wav --render
"""
from __future__ import annotations

import argparse
import json
import logging
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..data.dataset import EMOTION_LABELS


def build_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--wav", type=str, default=None,
                        help="input wav (16 kHz mono); synthetic tone "
                             "when omitted")
    parser.add_argument("--seconds", type=float, default=4.0)
    parser.add_argument("--emotion", type=str, default="happiness",
                        choices=EMOTION_LABELS)
    parser.add_argument("--num_samples", type=int, default=3,
                        help="diverse samples per clip (vmapped)")
    parser.add_argument("--checkpoints_folder_path", type=str, default=None)
    parser.add_argument("--cvae_checkpoint", type=str, default=None)
    parser.add_argument("--pose_dim", type=int, default=282)
    parser.add_argument("--n_frames", type=int, default=60)
    parser.add_argument("--n_pre_poses", type=int, default=10)
    parser.add_argument("--n_words", type=int, default=64)
    parser.add_argument("--frontend", type=str, default="xla",
                        choices=["xla", "pallas"])
    parser.add_argument("--render", action="store_true")
    parser.add_argument("--out", type=str, default="./demo_out")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--precision", type=str, default="float32",
                        choices=["float32", "bfloat16"],
                        help="bfloat16 = the measured serving default "
                             "(BASELINE.md): generator+CVAE on the MXU "
                             "in bf16")
    return parser


def load_wave(args) -> np.ndarray:
    n = int(args.seconds * 16000)
    if args.wav:
        import wave as wavmod

        with wavmod.open(args.wav, "rb") as f:
            assert f.getframerate() == 16000, "expected 16 kHz wav"
            raw = f.readframes(f.getnframes())
            data = np.frombuffer(raw, dtype=np.int16).astype(np.float32)
            data /= 32768.0
            if f.getnchannels() > 1:
                data = data.reshape(-1, f.getnchannels()).mean(axis=1)
        return data[:n] if len(data) >= n else np.pad(
            data, (0, n - len(data)), mode="symmetric")
    t = np.arange(n) / 16000.0
    beat = 0.5 + 0.5 * np.square(np.sin(np.pi * 2.0 * t))
    return (0.4 * beat * np.sin(2 * np.pi * 220 * t)).astype(np.float32)


def main(args=None):
    from ..models import EmotionCVAEv3, GestureTransformer
    from ..ops.mel import calc_spectrogram_length_from_motion_length

    if args is None:
        args = build_parser().parse_args()
    logging.basicConfig(level=logging.INFO)
    os.makedirs(args.out, exist_ok=True)

    wave = load_wave(args)
    if args.frontend == "pallas":
        from ..ops.pallas_mel import extract_melspectrogram_pallas as mel_fn
    else:
        from ..ops.mel import extract_melspectrogram as mel_fn
    spec_len = calc_spectrogram_length_from_motion_length(args.n_frames, 15)
    spec = jnp.asarray(mel_fn(wave), jnp.float32)[None, :, :spec_len]

    gen = GestureTransformer(n_words=args.n_words, frames=args.n_frames,
                             pose_dim=args.pose_dim,
                             prior_frames=args.n_pre_poses)
    vae = EmotionCVAEv3()
    key = jax.random.PRNGKey(args.seed)
    text = jnp.zeros((1, args.n_frames), jnp.int32)
    prior = jnp.zeros((1, args.n_pre_poses, args.pose_dim), jnp.float32)
    gvars = gen.init(key, spec, text, prior)
    vvars = vae.init(
        {"params": jax.random.fold_in(key, 1),
         "sample": jax.random.fold_in(key, 2)},
        jnp.zeros((1, 60, 512), jnp.float32), jnp.zeros((1, 8), jnp.float32))

    if args.checkpoints_folder_path or args.cvae_checkpoint:
        from ..core.schedules import adam
        from ..train.state import create_train_state
        from ..utils import load_checkpoint

        if args.checkpoints_folder_path:
            st, ok = load_checkpoint(
                create_train_state(gen, gvars, adam(1e-4)),
                args.checkpoints_folder_path)
            if ok:
                gvars = {"params": st.params, "batch_stats": st.batch_stats}
                logging.info("loaded generator checkpoint")
        if args.cvae_checkpoint:
            st, ok = load_checkpoint(
                create_train_state(vae, vvars, adam(1e-4)),
                args.cvae_checkpoint)
            if ok:
                vvars = {"params": st.params, "batch_stats": st.batch_stats}
                logging.info("loaded CVAE checkpoint")
    else:
        logging.warning("no checkpoints given — random weights (pipeline "
                        "demo only)")

    emotion_idx = EMOTION_LABELS.index(args.emotion)
    y = jax.nn.one_hot(jnp.asarray([emotion_idx]), 8)

    if getattr(args, "precision", "float32") == "bfloat16":
        from ..core.precision import bf16_variables, cast_tree

        gvars = bf16_variables(gvars)
        vvars = cast_tree(vvars, jnp.bfloat16)
        spec = spec.astype(jnp.bfloat16)
        prior = prior.astype(jnp.bfloat16)
        y = y.astype(jnp.bfloat16)

    # params/inputs must be ARGUMENTS, not closure captures: closing over
    # them embeds ~180 MB of HLO constants, which the remote-compile
    # tunnel rejects (see CLAUDE.md)
    @jax.jit
    def generate(gv, vv, spec_in, prior_in, y_in, keys):
        def one(k):
            sampled = vae.apply(vv, y_in, method="sample",
                                rngs={"sample": k})
            out, *_ = gen.apply(gv, spec_in, text, prior_in, sampled,
                                train=False)
            return out[0].astype(jnp.float32)

        return jax.vmap(one)(keys)

    keys = jax.random.split(jax.random.fold_in(key, 3), args.num_samples)
    t0 = time.time()
    poses = np.asarray(generate(gvars, vvars, spec, prior, y, keys))
    dt = time.time() - t0
    logging.info("generated %d diverse samples of (%d, %d) in %.2fs "
                 "(emotion=%s)", args.num_samples, args.n_frames,
                 args.pose_dim, dt, args.emotion)

    out_npz = os.path.join(args.out, "gestures.npz")
    np.savez(out_npz, poses=poses, wave=wave, emotion=args.emotion)
    pairwise = float(np.mean([
        np.linalg.norm(poses[i] - poses[j])
        for i in range(len(poses)) for j in range(i + 1, len(poses))
    ])) if len(poses) > 1 else 0.0
    summary = {"out": out_npz, "samples": int(args.num_samples),
               "frames": int(args.n_frames), "pose_dim": int(args.pose_dim),
               "pairwise_sample_distance": round(pairwise, 4),
               "gen_seconds": round(dt, 3)}
    print(json.dumps(summary))

    if args.render:
        from ..utils.render import create_video_and_save

        # visualise the first 9 dir-vec dims as a 10-joint stick figure
        create_video_and_save(
            args.out, 0, "demo", 0, None, poses[0][:, :27],
            np.zeros(27), f"demo ({args.emotion})", audio=wave)
    return summary


def cli() -> None:
    """Console-script entry point: run main() but swallow its return value
    so setuptools' sys.exit(main()) exits 0 (ADVICE r2: main() returns
    rich objects for programmatic/test use, which would become a nonzero
    exit status and stderr noise)."""
    main()


if __name__ == "__main__":
    main()
