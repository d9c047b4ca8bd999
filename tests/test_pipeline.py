"""Prefetcher / store_batches pipeline tests."""
import numpy as np

from emotiongestures_tpu.data import (
    GestureStore,
    GestureStoreWriter,
    SyntheticGestureDataset,
)
from emotiongestures_tpu.data.dataset import one_hot_eid
from emotiongestures_tpu.data.pipeline import Prefetcher, store_batches


def test_prefetcher_default_numpy_handoff():
    """Default mode hands batches off as numpy (assembly-only overlap —
    eager background device_put measured 1.5-3x slower on the tunnel
    runtime; BASELINE.md round 3)."""
    import numpy as _np

    ds = SyntheticGestureDataset(n_samples=12)
    seen = 0
    with Prefetcher(ds.batches(4, shuffle=False), buffer_size=2) as it:
        for batch in it:
            assert isinstance(batch["pose_seq"], _np.ndarray)
            assert batch["pose_seq"].shape == (4, 60, 282)
            seen += 1
    assert seen == 3


def test_prefetcher_device_put_when_requested():
    import jax

    ds = SyntheticGestureDataset(n_samples=8)
    dev = jax.devices()[0]
    with Prefetcher(ds.batches(4, shuffle=False), device=dev,
                    host_keys=("audio",)) as it:
        for batch in it:
            assert isinstance(batch["pose_seq"], jax.Array)
            assert not isinstance(batch["audio"], jax.Array)  # host key


def test_prefetcher_matches_sequential():
    ds = SyntheticGestureDataset(n_samples=8)
    direct = list(ds.batches(4, shuffle=False))
    with Prefetcher(ds.batches(4, shuffle=False)) as it:
        prefetched = list(it)
    for a, b in zip(direct, prefetched):
        np.testing.assert_array_equal(a["pose_seq"], np.asarray(
            b["pose_seq"]))


def test_place_batches_shards_like_prefetcher():
    """The synchronous (--prefetch 0) path must land batches on the mesh
    sharding exactly like the Prefetcher does — a data-parallel mesh with
    prefetching disabled previously got unsharded numpy batches."""
    import jax

    from emotiongestures_tpu.data.pipeline import place_batches
    from emotiongestures_tpu.parallel import batch_sharding, make_mesh

    mesh = make_mesh(n_data=4)
    sharding = batch_sharding(mesh)
    ds = SyntheticGestureDataset(n_samples=8)
    placed = list(place_batches(ds.batches(4, shuffle=False),
                                sharding=sharding, host_keys=("audio",)))
    assert len(placed) == 2
    for batch in placed:
        assert isinstance(batch["pose_seq"], jax.Array)
        assert batch["pose_seq"].sharding.is_equivalent_to(
            sharding, batch["pose_seq"].ndim)
        assert isinstance(batch["audio"], np.ndarray)  # host key
    # passthrough when no placement requested
    plain = next(iter(place_batches(ds.batches(4, shuffle=False))))
    assert isinstance(plain["pose_seq"], np.ndarray)


def test_batches_rows_slice_assembles_only_local_rows():
    """dataset.batches(rows=...): every process walks the same permutation
    but assembles only its process_batch_slice rows (multi-host host-side
    scaling — no host materialises the global batch)."""
    ds = SyntheticGestureDataset(n_samples=8)
    full = list(ds.batches(4, shuffle=True, seed=3))
    lo = list(ds.batches(4, shuffle=True, seed=3, rows=slice(0, 2)))
    hi = list(ds.batches(4, shuffle=True, seed=3, rows=slice(2, 4)))
    assert len(full) == len(lo) == len(hi) == 2
    for f, a, b in zip(full, lo, hi):
        assert a["pose_seq"].shape[0] == 2
        np.testing.assert_array_equal(f["pose_seq"][:2], a["pose_seq"])
        np.testing.assert_array_equal(f["pose_seq"][2:], b["pose_seq"])


def test_batches_rows_requires_drop_last():
    """ADVICE r3: rows= with drop_last=False would slice ragged tail
    windows into mismatched per-process batches — both dataset kinds
    refuse the combination up front."""
    import pytest

    from emotiongestures_tpu.data.dataset import SpeechMotionDataset

    ds = SyntheticGestureDataset(n_samples=10)
    with pytest.raises(ValueError, match="drop_last"):
        next(ds.batches(4, drop_last=False, rows=slice(0, 2)))
    real = SpeechMotionDataset.__new__(SpeechMotionDataset)  # no store I/O
    with pytest.raises(ValueError, match="drop_last"):
        next(SpeechMotionDataset.batches(real, 4, drop_last=False,
                                         rows=slice(0, 2)))


def test_prefetcher_propagates_errors():
    def bad_iter():
        yield {"x": np.zeros(3)}
        raise RuntimeError("boom")

    import pytest

    with pytest.raises(RuntimeError, match="boom"):
        with Prefetcher(bad_iter()) as it:
            list(it)


def test_store_batches_native(tmp_path, rng):
    with GestureStoreWriter(tmp_path / "c") as w:
        for i in range(10):
            w.append({
                "pose_seq": rng.randn(60, 8).astype(np.float32),
                "spectrogram": rng.randn(16, 12).astype(np.float16),
                "aux_info": {"eid": f"1_x_0_{65 + i % 8}_{65 + i % 8}"},
            })
    store = GestureStore(tmp_path / "c")
    batches = list(store_batches(
        store, ["pose_seq", "spectrogram"], batch_size=4,
        labels_fn=lambda rec: one_hot_eid(rec["aux_info"]["eid"]),
        shuffle=False))
    assert len(batches) == 2
    assert batches[0]["pose_seq"].shape == (4, 60, 8)
    assert batches[0]["spectrogram"].dtype == np.float32
    assert batches[0]["eid_label"].shape == (4, 8)
    np.testing.assert_array_equal(batches[0]["pose_seq"][0],
                                  store[0]["pose_seq"])
