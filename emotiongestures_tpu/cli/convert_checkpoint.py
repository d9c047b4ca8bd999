"""One-shot migration of reference torch checkpoints into this
framework's orbax layout.

The eval CLI already imports reference .pth files directly at load time;
this converter is for the TRAINING side: it materialises a TrainState
(imported weights + fresh optimizer state) and saves it where the
trainers' --resume / checkpoint flags can pick it up — so a user can
fine-tune from the reference's released checkpoints
(test_...py:149,159,168: FGD iter8100, skeleton iter7500, CVAE
iter35200) or keep training their own.

Import tables: utils/torch_port (parity-pinned by
tests/test_torch_parity*.py). DataParallel 'module.' prefixes and the
rich-dict 'gen_dict' layout (utils/train_utils.py:168-213) are handled.
"""
from __future__ import annotations

import argparse
import logging


KINDS = ("generator", "fgd", "skeleton", "cvae", "cvae_v1", "cvae_v2",
         "emotion_net")


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Convert a reference torch checkpoint to an orbax "
                    "TrainState checkpoint")
    parser.add_argument("--kind", choices=KINDS, required=True)
    parser.add_argument("--input", required=True,
                        help="reference .pth file")
    parser.add_argument("--output", required=True,
                        help="orbax checkpoint directory to create")
    # model geometry (must match the checkpoint; defaults = the reference
    # eval entry point's construction, test_...py:135,148-174)
    parser.add_argument("--pose_dim", type=int, default=282)
    parser.add_argument("--class_dim", type=int, default=8)
    parser.add_argument("--d_model", type=int, default=512)
    parser.add_argument("--latent_dim", type=int, default=2048)
    parser.add_argument("--gen_layers", type=int, default=3)
    parser.add_argument("--n_frames", type=int, default=60)
    parser.add_argument("--n_pre_poses", type=int, default=10)
    parser.add_argument("--chunk", type=int, default=10)
    parser.add_argument("--n_words", type=int, default=4,
                        help="generator vocab size (match the "
                             "checkpoint's embedding table)")
    parser.add_argument("--lr", type=float, default=3e-4)
    parser.add_argument("--allow_pickle", action="store_true",
                        help="permit full-pickle torch.load for rich-dict "
                             "checkpoints (args/lang_model objects, "
                             "utils/train_utils.py:149-213). Unpickling "
                             "executes arbitrary code — only enable for "
                             "files you trust; plain state_dicts load "
                             "safely without this")
    return parser


def _build(args):
    """(model, init_args, init_needs_sample_rng, torch_import) per kind."""
    import jax.numpy as jnp

    from ..models import (EmotionCVAEv1, EmotionCVAEv2, EmotionCVAEv3,
                          EmotionNet, FGDAutoEncoder, GestureTransformer,
                          SkeletonTransformer)
    from ..utils import torch_port as tp

    pose = jnp.zeros((1, args.n_frames, args.pose_dim), jnp.float32)
    feats = jnp.zeros((1, 60, args.d_model), jnp.float32)
    y = jnp.zeros((1, args.class_dim), jnp.float32)
    if args.kind == "generator":
        model = GestureTransformer(
            n_words=args.n_words, frames=args.n_frames,
            pose_dim=args.pose_dim, prior_frames=args.n_pre_poses,
            d_model=args.d_model, d_inner=args.latent_dim,
            n_layers=args.gen_layers, n_head=8, d_k=64, d_v=64,
            chunk_length=args.chunk)
        init_args = (jnp.zeros((1, 128, 124), jnp.float32),
                     jnp.zeros((1, args.n_frames), jnp.int32),
                     jnp.zeros((1, args.n_pre_poses, args.pose_dim),
                               jnp.float32))
        imp = lambda v, sd: tp.torch_state_to_flax_generator(
            v, sd, n_layers=args.gen_layers)
        return model, init_args, False, imp
    if args.kind == "fgd":
        return (FGDAutoEncoder(pose_dim=args.pose_dim), (pose,), False,
                lambda v, sd: tp.torch_table_to_flax_state(
                    v, sd, tp.fgd_ae_mapping()))
    if args.kind == "skeleton":
        model = SkeletonTransformer(
            class_dim=args.class_dim, pose_dim=args.pose_dim,
            d_model=args.d_model, d_inner=args.latent_dim, n_layers=3,
            n_head=8, d_k=64, d_v=64, n_position=args.n_frames)
        return model, (pose,), False, \
            lambda v, sd: tp.torch_table_to_flax_state(
                v, sd, tp.skeleton_classifier_mapping(n_layers=3))
    if args.kind == "emotion_net":
        return (EmotionNet(), (jnp.zeros((1, 128, 124), jnp.float32),),
                False, lambda v, sd: tp.torch_table_to_flax_state(
                    v, sd, tp.emotion_net_mapping()))
    cls, table = {
        "cvae": (EmotionCVAEv3, tp.cvae_v3_mapping),
        "cvae_v1": (EmotionCVAEv1, tp.cvae_v1_mapping),
        "cvae_v2": (EmotionCVAEv2, tp.cvae_v2_mapping),
    }[args.kind]
    model = (cls(feat_dim=args.d_model) if args.kind == "cvae" else cls())
    return (model, (feats, y), True,
            lambda v, sd, table=table: tp.torch_table_to_flax_state(
                v, sd, table()))


def main(args=None):
    if args is None:
        args = build_parser().parse_args()
    import jax

    from ..core import schedules
    from ..train.state import create_train_state
    from ..utils import save_checkpoint
    from ..utils.torch_port import load_reference_state_dict

    model, init_args, needs_sample, torch_import = _build(args)
    rngs = {"params": jax.random.PRNGKey(0)}
    if needs_sample:
        rngs["sample"] = jax.random.PRNGKey(1)
    variables = model.init(rngs, *init_args)

    new_vars, unmapped = torch_import(
        variables, load_reference_state_dict(
            args.input, allow_pickle=getattr(args, "allow_pickle", False)))

    state = create_train_state(
        model, new_vars, schedules.adam(lr=args.lr))
    save_checkpoint(state, args.output)
    logging.info("converted %s -> %s (%d torch-side-only keys left at "
                 "init)", args.input, args.output, len(unmapped))
    return args.output


def cli() -> None:
    logging.basicConfig(level=logging.INFO)
    main()


if __name__ == "__main__":
    cli()
