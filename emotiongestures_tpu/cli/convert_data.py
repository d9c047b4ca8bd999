"""One-shot data migration CLI: reference LMDB caches -> GestureStore.

The reference stores its datasets as pyarrow-0.14-serialized LMDBs
(`data_loader/lmdb_loader_BEAT_full.py:171-180`,
`data_loader/data_preprocessor.py:44-75`); modern pyarrow removed
`deserialize`, so this framework keeps its own mmap'd record store
(data/store.py). A reference user migrates once with:

  # windowed train/val/test caches (BEAT or TED layouts, auto-detected)
  python -m emotiongestures_tpu.cli.convert_data cache \
      --lmdb ./data/beat_trainable_dataset/train/beat_cache \
      --out  ./data/egtp/train

  # RAW clip LMDBs (one video per record), for re-running preprocessing
  python -m emotiongestures_tpu.cli.convert_data clips \
      --lmdb ./data/raw_clips --out ./data/egtp_clips

  # fasttext/GloVe word vectors -> aligned .npy for the runtime gather
  python -m emotiongestures_tpu.cli.convert_data wordvec \
      --vocab ./data/vocab_cache.pkl --vectors ./crawl-300d-2M.vec \
      --out ./data/word_vectors.npy

`cache`/`clips` need the optional `lmdb` + old-pyarrow (<=0.16) deps of
the SOURCE format (install them in a throwaway env, run once, delete);
the resulting stores need neither.
"""
from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    sub = parser.add_subparsers(dest="command", required=True)

    cache = sub.add_parser(
        "cache", help="windowed sample cache LMDB -> GestureStore")
    cache.add_argument("--lmdb", required=True,
                       help="reference LMDB directory (pyarrow 0.14)")
    cache.add_argument("--out", required=True,
                       help="output GestureStore directory")

    clips = sub.add_parser(
        "clips", help="raw clip LMDB (one video/record) -> GestureStore")
    clips.add_argument("--lmdb", required=True)
    clips.add_argument("--out", required=True)

    syn = sub.add_parser(
        "synthetic",
        help="materialise the synthetic set into a BEAT-shaped "
             "GestureStore (rehearsal data for store-fed training)")
    syn.add_argument("--out", required=True,
                     help="output GestureStore directory (pass the "
                          "trainer `--train_data_path <out minus "
                          "_cache>` or point at it with "
                          "use_cache_suffix semantics)")
    syn.add_argument("--n", type=int, default=1024)
    syn.add_argument("--seed", type=int, default=0)
    syn.add_argument("--class_overlap", type=float, default=0.0,
                     help="postural class-overlap knob "
                          "(data/synthetic.py)")

    wv = sub.add_parser(
        "wordvec",
        help="fasttext .vec / GloVe .txt -> vocab-aligned .npy")
    wv.add_argument("--vocab", required=True,
                    help="pickled Vocab (data/vocab.py Vocab.save)")
    wv.add_argument("--vectors", required=True,
                    help="text-format word vectors (fasttext/GloVe)")
    wv.add_argument("--out", required=True, help="output .npy path")
    wv.add_argument("--dim", type=int, default=300)
    return parser


def main(args=None):
    if args is None:
        args = build_parser().parse_args()
    if args.command == "cache":
        from ..data.store import GestureStore, convert_lmdb_cache

        convert_lmdb_cache(args.lmdb, args.out)
        n = len(GestureStore(args.out))
        print(f"converted {n} records -> {args.out}")
        return n
    if args.command == "clips":
        from ..data.store import GestureStore, convert_clip_lmdb

        convert_clip_lmdb(args.lmdb, args.out)
        n = len(GestureStore(args.out))
        print(f"converted {n} clip records -> {args.out}")
        return n
    if args.command == "synthetic":
        from ..data.synthetic import materialize_store

        n = materialize_store(args.out, args.n, seed=args.seed,
                              log_every=max(args.n // 10, 1),
                              class_overlap=args.class_overlap)
        print(f"materialized {n} synthetic records -> {args.out}")
        return n
    if args.command == "wordvec":
        import numpy as np

        from ..data.vocab import Vocab

        vocab = Vocab.load(args.vocab)
        vocab.load_glove_vectors(args.vectors, embedding_dim=args.dim)
        np.save(args.out, vocab.word_embedding_weights)
        print(f"exported ({vocab.n_words}, {args.dim}) matrix -> "
              f"{args.out}")
        return vocab.n_words
    raise SystemExit(f"unknown command {args.command}")  # pragma: no cover


def cli() -> None:
    """Console-script + `python -m` entry point: errors raise; a
    successful conversion exits 0 even for an empty source (0 records
    usually means a wrong --lmdb path, so warn). main() itself returns
    the record count for programmatic/test use — returning that from the
    entry point would turn a successful run into a nonzero exit status
    (ADVICE r2)."""
    if main() == 0:
        print("warning: 0 records converted — check the source path",
              file=sys.stderr)


if __name__ == "__main__":
    cli()
    sys.exit(0)
