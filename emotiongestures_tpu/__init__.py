"""emotiongestures_tpu — a TPU-native (JAX/XLA/Pallas) framework for
audio-driven, diverse, emotional co-speech 3D gesture generation.

Re-designed from scratch with the capabilities of the EmotionGestures
reference (arXiv 2305.18891): a fused mel-spectrogram frontend, an SE-ResNet
audio encoder, a TCN text encoder, a transformer gesture generator with
spatial/temporal prior-pose memory, an emotion-conditioned CVAE prior for
batched diversity sampling, GAN training, and a full evaluation suite
(FGD, diversity, beat alignment, emotion accuracy, L2, MPJRE).

Layout:
  core/      losses, LR schedules, init schemes, precision policy
  ops/       mel-spectrogram (JAX + Pallas), fused attention, memory ops
  nn/        transformer blocks (post-LN), SE-ResNet, TCN
  models/    generator, discriminators, classifiers, CVAE, FGD AE, baselines
  data/      record codec + store (C++/python), datasets, vocab, pipelines
  train/     jit-compiled train steps (classifier, GAN, CVAE, FGD, skeleton)
  eval/      FGD/diversity/beat-align/L2/MPJRE metrics
  parallel/  device-mesh sharding (data/tensor parallel)
  cli/       reference-compatible command-line entry points
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache: first compiles of the big models take
# tens of seconds on TPU; cache them across processes (CLI runs, bench).
import os as _os

try:
    import jax as _jax

    _cache_dir = _os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        _os.path.join(_os.path.expanduser("~"), ".cache", "egtp_xla_cache"),
    )
    _os.makedirs(_cache_dir, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # jax's LRUCache.put writes entries with a bare write_bytes — NOT
    # atomic. A concurrent reader (another trainer/test process sharing
    # this cache) or a crash mid-write can expose a torn entry whose
    # zstd prefix still decompresses, and XLA's executable deserializer
    # SEGFAULTS on the truncated payload (observed twice on full-suite
    # runs, 2026-08-18: crash inside compilation_cache.get_executable_
    # and_time -> backend.deserialize_executable). Write temp + rename
    # instead: os.replace is atomic on POSIX, so readers only ever see
    # complete entries. Eviction-enabled caches keep the original
    # (locked) path.
    from jax._src import lru_cache as _lru

    if not getattr(_lru.LRUCache.put, "_egtp_atomic", False):
        _orig_put = _lru.LRUCache.put
        _orig_get = _lru.LRUCache.get
        # keys this process put: reading one back re-deserializes an
        # executable this process ALREADY holds in memory, and XLA's CPU
        # AOT loader segfaults/aborts on exactly that pattern at deep
        # process state (3 deterministic full-suite crashes inside
        # backend.deserialize_executable, each reading a same-process
        # entry; cross-process reads never crashed in hundreds observed).
        # Treat such reads as misses — worst case a redundant recompile.
        _this_process_keys = set()

        def _atomic_put(self, key: str, val: bytes) -> None:
            if not key:
                raise ValueError("key cannot be empty")
            _this_process_keys.add(key)
            if getattr(self, "eviction_enabled", True):
                return _orig_put(self, key, val)
            path = self.path / f"{key}{_lru._CACHE_SUFFIX}"
            if path.exists():
                return
            tmp = self.path / f".{key}.{_os.getpid()}.tmp"
            try:
                tmp.write_bytes(val)
                _os.replace(tmp, path)
            finally:
                tmp.unlink(missing_ok=True)

        def _guarded_get(self, key: str):
            if key in _this_process_keys:
                return None
            return _orig_get(self, key)

        _atomic_put._egtp_atomic = True
        _lru.LRUCache.put = _atomic_put
        _lru.LRUCache.get = _guarded_get

        # put_executable_and_time calls executable.serialize() BEFORE the
        # existence check in cache.put — and XLA:CPU executable
        # (de)serialization segfaults at deep process state (full-suite
        # crash #5 landed exactly there, re-serializing an executable
        # whose entry already existed). Skip the serialize entirely when
        # the entry file is already on disk.
        from jax._src import compilation_cache as _cc

        _orig_pet = _cc.put_executable_and_time

        def _guarded_pet(cache_key, module_name, executable, backend,
                         compile_time):
            cache = _cc._get_cache(backend)
            path = getattr(cache, "path", None)
            if path is not None and (
                    path / f"{cache_key}{_lru._CACHE_SUFFIX}").exists():
                _this_process_keys.add(cache_key)
                return
            return _orig_pet(cache_key, module_name, executable, backend,
                             compile_time)

        _cc.put_executable_and_time = _guarded_pet
except Exception:  # pragma: no cover — cache is best-effort
    pass
