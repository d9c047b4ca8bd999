"""Native C++ batch decoder vs the pure-python codec (parity + speed).
Skipped when the shared lib hasn't been built
(`make -C emotiongestures_tpu/native`)."""
import time

import numpy as np
import pytest

from emotiongestures_tpu.data import GestureStore, GestureStoreWriter


@pytest.fixture(scope="module")
def store(tmp_path_factory):
    rng = np.random.RandomState(0)
    path = tmp_path_factory.mktemp("store") / "cache"
    with GestureStoreWriter(path) as w:
        for i in range(64):
            w.append({
                "word_seq": [["hi", 0.1, 0.2]],
                "pose_seq": rng.randn(60, 282).astype(np.float32),
                "spectrogram": rng.randn(128, 124).astype(np.float16),
                "audio": rng.randn(1000).astype(np.float32),
                "aux_info": {"eid": f"1_x_0_{65 + i % 8}_{65 + i % 8}"},
            })
    return GestureStore(path)


def test_native_lib_built(store):
    assert store.native_available, (
        "libegtp_codec.so missing — run make -C emotiongestures_tpu/native")


def test_batch_gather_matches_python(store):
    idx = np.array([3, 0, 17, 42], dtype=np.int64)
    got = store.batch_field(idx, "pose_seq")
    assert got.shape == (4, 60, 282)
    for i, j in enumerate(idx):
        np.testing.assert_array_equal(got[i], store[int(j)]["pose_seq"])


def test_batch_gather_f16_conversion(store):
    idx = np.arange(8, dtype=np.int64)
    got = store.batch_field(idx, "spectrogram")
    assert got.dtype == np.float32
    for i in range(8):
        np.testing.assert_array_equal(
            got[i], store[i]["spectrogram"].astype(np.float32))


def test_batch_gather_missing_field(store):
    with pytest.raises(KeyError):
        store.batch_field(np.array([0], dtype=np.int64), "nonexistent")


def test_native_faster_than_python(store):
    """Not a strict perf gate — just sanity that the C++ path works at
    scale and isn't pathologically slow."""
    idx = np.tile(np.arange(64, dtype=np.int64), 8)
    t0 = time.perf_counter()
    native = store.batch_field(idx, "pose_seq")
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    python = np.stack([
        np.asarray(store[int(i)]["pose_seq"], np.float32) for i in idx])
    t_python = time.perf_counter() - t0
    np.testing.assert_array_equal(native, python)
    assert t_native < t_python * 2  # typically much faster
