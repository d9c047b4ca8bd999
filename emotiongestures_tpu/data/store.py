"""GestureStore — memory-mapped record store replacing the reference's
LMDB sample caches (data_loader/lmdb_loader_BEAT_full.py:153-156).

Layout on disk (directory):
  data.bin    append-only concatenation of EGTP records
  index.npy   int64 (n+1,) record byte offsets (offsets[i]..offsets[i+1])

Readers mmap data.bin; `__getitem__` decodes zero-copy ndarray views —
the host-side hot path the torch DataLoader workers used to be
(SURVEY.md §3.4). The optional C++ codec accelerates batch decode.
An LMDB adapter is provided for environments where the original caches
and the `lmdb` package exist.
"""
from __future__ import annotations

import mmap
import os
from pathlib import Path

import numpy as np

from .codec import decode_json_fields, decode_record, encode_record


def _load_native():
    """ctypes binding to native/libegtp_codec.so (built by
    `make -C emotiongestures_tpu/native`); None when absent."""
    import ctypes

    native_dir = Path(__file__).resolve().parent.parent / "native"
    lib_path = native_dir / "libegtp_codec.so"
    if not lib_path.exists():
        # lazy build (best-effort; falls back to pure python)
        import subprocess

        try:
            subprocess.run(["make", "-C", str(native_dir)], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    if not lib_path.exists():
        return None
    try:
        lib = ctypes.CDLL(str(lib_path))
    except OSError:
        return None
    lib.egtp_batch_gather_f32.restype = ctypes.c_int
    lib.egtp_batch_gather_f32.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int64, ctypes.c_char_p, ctypes.c_void_p,
        ctypes.c_int64, ctypes.c_int,
    ]
    if hasattr(lib, "egtp_batch_gather_f32_shaped"):
        lib.egtp_batch_gather_f32_shaped.restype = ctypes.c_int
        lib.egtp_batch_gather_f32_shaped.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_char_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ]
    lib.egtp_field_shape.restype = ctypes.c_int
    lib.egtp_field_shape.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_char_p, ctypes.c_void_p, ctypes.c_void_p,
    ]
    return lib


_NATIVE = _load_native()


class GestureStoreWriter:
    """Atomic store writer: records stream into `<path>.tmp-<pid>` and the
    directory is renamed onto `path` only on clean close. An exception
    inside the `with` block (e.g. the preprocessor's NaN guard) aborts and
    removes the temp dir, so a dataset's `cache_dir.exists()` check can
    never see a truncated half-written cache as complete."""

    def __init__(self, path: str | os.PathLike):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._tmp = Path(f"{self.path}.tmp-{os.getpid()}")
        self._tmp.mkdir(parents=True, exist_ok=True)
        self._data = open(self._tmp / "data.bin", "wb")
        self._offsets = [0]
        self._done = False

    def append(self, record: dict):
        buf = encode_record(record)
        self._data.write(buf)
        self._offsets.append(self._offsets[-1] + len(buf))

    def close(self):
        """Commit: finalize the index and atomically publish the dir."""
        if self._done:
            return
        self._data.close()
        np.save(self._tmp / "index.npy",
                np.asarray(self._offsets, dtype=np.int64))
        if self.path.exists():  # overwrite semantics (rebuilding a cache)
            import shutil

            shutil.rmtree(self.path)
        os.rename(self._tmp, self.path)
        self._done = True

    def abort(self):
        """Discard everything written so far; leaves `path` untouched."""
        if self._done:
            return
        import shutil

        self._data.close()
        shutil.rmtree(self._tmp, ignore_errors=True)
        self._done = True

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc, tb):
        if exc_type is None:
            self.close()
        else:
            self.abort()


class GestureStore:
    """Read-only mmap view over a GestureStoreWriter output."""

    def __init__(self, path: str | os.PathLike):
        self.path = Path(path)
        self.offsets = np.load(self.path / "index.npy")
        self._file = open(self.path / "data.bin", "rb")
        size = self.offsets[-1]
        self._mmap = (
            mmap.mmap(self._file.fileno(), size, access=mmap.ACCESS_READ)
            if size
            else b""
        )
        self._view = memoryview(self._mmap)

    def __len__(self):
        return len(self.offsets) - 1

    def __getitem__(self, idx: int) -> dict:
        lo, hi = int(self.offsets[idx]), int(self.offsets[idx + 1])
        return decode_record(self._view[lo:hi])

    def json_fields(self, idx: int) -> dict:
        """Only the json-kind fields (aux_info, word_seq) of record `idx`
        — skips ndarray payloads entirely; pairs with `batch_field` for
        the fast batch-assembly path."""
        lo, hi = int(self.offsets[idx]), int(self.offsets[idx + 1])
        return decode_json_fields(self._view[lo:hi])

    def batch_field(self, indices, name: str, n_threads: int = 0,
                    expected_shape=None) -> np.ndarray:
        """Gather field `name` of many records into one (n, *shape) f32
        array — the host hot path. Uses the multithreaded C++ decoder
        when built, pure-python otherwise.

        `expected_shape` pins the canonical per-record shape (e.g. the
        dataset probe's record-0 layout): EVERY record — including the
        batch's first — must match it exactly or ValueError is raised,
        so a shuffled batch whose records all deviate identically (two
        tail windows with the same short audio, say) cannot be returned
        silently un-fixed-up (ADVICE r4). Without it the batch's first
        record defines the shape, as before."""
        import ctypes

        indices = np.ascontiguousarray(indices, dtype=np.int64)
        n = len(indices)
        if n == 0:
            raise ValueError("empty index list")
        if expected_shape is None:
            shape = tuple(self[int(indices[0])][name].shape)
        else:
            shape = tuple(int(s) for s in expected_shape)
        elem_count = int(np.prod(shape))
        out = np.empty((n,) + shape, dtype=np.float32)
        if _NATIVE is not None and len(self._view) > 0:
            # zero-copy address of the (read-only) mmap via numpy
            base = np.frombuffer(self._mmap, dtype=np.uint8)
            if (expected_shape is not None
                    and hasattr(_NATIVE, "egtp_batch_gather_f32_shaped")):
                cshape = np.asarray(shape, dtype=np.int64)
                rc = _NATIVE.egtp_batch_gather_f32_shaped(
                    base.ctypes.data,
                    self.offsets.ctypes.data_as(ctypes.c_void_p),
                    indices.ctypes.data_as(ctypes.c_void_p),
                    n, name.encode(),
                    out.ctypes.data_as(ctypes.c_void_p),
                    cshape.ctypes.data_as(ctypes.c_void_p),
                    len(shape), n_threads)
            else:
                rc = _NATIVE.egtp_batch_gather_f32(
                    base.ctypes.data,
                    self.offsets.ctypes.data_as(ctypes.c_void_p),
                    indices.ctypes.data_as(ctypes.c_void_p),
                    n, name.encode(),
                    out.ctypes.data_as(ctypes.c_void_p),
                    elem_count, n_threads)
            if rc == 0:
                return out
            raise ValueError(
                f"native decode failed at batch position {-rc - 1}")
        for i, idx in enumerate(indices):
            arr = np.asarray(self[int(idx)][name], dtype=np.float32)
            if arr.shape != shape:
                raise ValueError(
                    f"record {int(idx)} field {name!r} shape {arr.shape} "
                    f"!= expected {shape}")
            out[i] = arr
        return out

    @property
    def native_available(self) -> bool:
        return _NATIVE is not None

    def close(self):
        """Best-effort close: decoded records hold zero-copy views into the
        map, which keep it alive until they are garbage-collected."""
        try:
            self._view.release()
            if self._mmap:
                self._mmap.close()
        except BufferError:
            pass
        self._file.close()


def _iter_lmdb(lmdb_dir: str):
    """(key, value) pairs from a reference LMDB env, in key order.
    Primary path is the pure-python parser (data/lmdb_reader.py — no
    `lmdb` package needed); if the `lmdb` package IS installed it is
    preferred as the battle-tested implementation of the same format."""
    try:
        import lmdb  # noqa: F401 — optional
    except ImportError:
        from .lmdb_reader import iter_entries

        yield from iter_entries(lmdb_dir)
        return
    env = lmdb.open(str(lmdb_dir), readonly=True, lock=False)
    try:
        with env.begin() as txn:
            cursor = txn.cursor()
            for key, value in cursor:
                yield bytes(key), bytes(value)
    finally:
        env.close()


def window_record_from_serialized(buf) -> dict:
    """One pyarrow-0.14-serialized cache value -> GestureStore record.
    Decodes with the self-owned wire-format reader (data/arrow014.py —
    no pyarrow needed) and maps both reference layouts:
      BEAT 5-tuple (word_seq, pose_seq, audio, spectrogram, aux_info) —
        lmdb_loader_BEAT_full.py:171-180
      TED 6-tuple with vec_seq inserted third — lmdb_data_loader.py:104-113
    """
    from .arrow014 import deserialize

    sample = deserialize(buf)
    if len(sample) == 5:  # BEAT layout (lmdb_loader_BEAT_full)
        word_seq, pose_seq, audio, spectrogram, aux_info = sample
        vec_seq = None
    elif len(sample) == 6:  # TED layout w/ dir-vecs (lmdb_data_loader*)
        word_seq, pose_seq, vec_seq, audio, spectrogram, aux_info = sample
    else:
        raise ValueError(
            f"unrecognized cache record layout ({len(sample)} fields)")
    record = {
        "word_seq": [list(w) for w in word_seq],
        "pose_seq": np.asarray(pose_seq),
        "audio": np.asarray(audio),
        "spectrogram": np.asarray(spectrogram),
        "aux_info": dict(aux_info),
    }
    if vec_seq is not None:
        record["vec_seq"] = np.asarray(vec_seq)
    return record


def convert_lmdb_cache(lmdb_dir: str, out_dir: str):
    """Converter from the reference's pyarrow-0.14 LMDB caches. The
    record payloads are decoded by the self-owned format reader
    (data/arrow014.py), so NO pyarrow is needed; the LMDB container is
    read via the pure-python reader (data/lmdb_reader.py) with the
    `lmdb` package as an optional fallback. Run once offline, after
    which only GestureStore is needed."""
    with GestureStoreWriter(out_dir) as writer:
        for _, value in _iter_lmdb(lmdb_dir):
            writer.append(window_record_from_serialized(value))


def convert_clip_lmdb(lmdb_dir: str, out_dir: str):
    """Converter for the reference's RAW clip LMDBs (one video with nested
    clips per record, data_preprocessor.py:44-75) into the flat
    one-record-per-clip store that preprocessing.DataPreprocessor reads.
    Self-owned LMDB + pyarrow-0.14 readers — no legacy deps needed."""
    from .arrow014 import deserialize

    with GestureStoreWriter(out_dir) as writer:
        for _, value in _iter_lmdb(lmdb_dir):
            video = deserialize(value)
            vid = video["vid"]
            for clip in video["clips"]:
                writer.append({
                    "skeletons_3d": np.asarray(clip["skeletons_3d"]),
                    "audio_feat": np.asarray(clip["audio_feat"]),
                    "audio_raw": np.asarray(clip["audio_raw"]),
                    "words": [list(w) for w in clip["words"]],
                    "aux_info": {
                        "vid": vid,
                        "eid": clip.get("eid", vid),
                        "start_frame_no": int(clip["start_frame_no"]),
                        "end_frame_no": int(clip["end_frame_no"]),
                        "start_time": float(clip["start_time"]),
                        "end_time": float(clip["end_time"]),
                    },
                })
