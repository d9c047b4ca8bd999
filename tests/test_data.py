"""Data layer tests: codec roundtrip, mmap store, vocab semantics,
synthetic dataset invariants, emotion one-hot ranges."""
import numpy as np
import pytest

from emotiongestures_tpu.data import (
    GestureStore,
    GestureStoreWriter,
    SyntheticGestureDataset,
    Vocab,
    decode_record,
    encode_record,
    make_batch,
)


def test_codec_roundtrip(rng):
    rec = {
        "pose_seq": rng.randn(60, 282).astype(np.float32),
        "audio": rng.randn(64000).astype(np.float32),
        "spectrogram": rng.randn(128, 124).astype(np.float16),
        "word_seq": [["hello", 0.1, 0.4], ["world", 0.5, 0.9]],
        "aux_info": {"eid": "1_wayne_0_66_66", "start_time": 0.0},
    }
    out = decode_record(encode_record(rec))
    np.testing.assert_array_equal(out["pose_seq"], rec["pose_seq"])
    np.testing.assert_array_equal(out["audio"], rec["audio"])
    np.testing.assert_array_equal(out["spectrogram"], rec["spectrogram"])
    assert out["spectrogram"].dtype == np.float16
    assert out["word_seq"] == rec["word_seq"]
    assert out["aux_info"]["eid"] == "1_wayne_0_66_66"


def test_codec_bad_magic():
    with pytest.raises(ValueError, match="bad magic"):
        decode_record(b"XXXX" + b"\x00" * 16)


def test_store_roundtrip(tmp_path, rng):
    records = [
        {"pose_seq": rng.randn(60, 8).astype(np.float32),
         "aux_info": {"eid": f"1_x_0_{65 + i}_{65 + i}"}}
        for i in range(5)
    ]
    with GestureStoreWriter(tmp_path / "train_cache") as w:
        for r in records:
            w.append(r)
    store = GestureStore(tmp_path / "train_cache")
    assert len(store) == 5
    for i, rec in enumerate(records):
        got = store[i]
        np.testing.assert_array_equal(got["pose_seq"], rec["pose_seq"])
        assert got["aux_info"]["eid"] == rec["aux_info"]["eid"]
    store.close()


def test_vocab_semantics():
    v = Vocab("words")
    assert v.n_words == 4  # PAD/SOS/EOS/UNK
    v.index_word("hello")
    v.index_word("hello")
    v.index_word("world")
    assert v.get_word_index("hello") == 4
    assert v.get_word_index("nope") == Vocab.UNK_token
    assert v.word2count["hello"] == 2
    v.trim(2)  # drops 'world'
    assert v.get_word_index("world") == Vocab.UNK_token
    assert v.get_word_index("hello") == 4


def test_one_hot_eid_ranges():
    """Emotion ranges (lmdb_loader_BEAT_full.py:77-118)."""
    from emotiongestures_tpu.data.dataset import one_hot_eid

    cases = {64: 0, 1: 0, 65: 1, 72: 1, 73: 2, 80: 2, 81: 3, 86: 3,
             87: 4, 94: 4, 95: 5, 102: 5, 103: 6, 110: 6, 111: 7, 118: 7}
    for idx, cls in cases.items():
        onehot = one_hot_eid(f"1_wayne_0_{idx}_{idx}")
        assert onehot.argmax() == cls, (idx, cls)
        assert onehot.sum() == 1.0


def test_synthetic_dataset_shapes():
    ds = SyntheticGestureDataset(n_samples=16)
    s = ds[0]
    assert s["audio"].shape == (64000,)
    assert s["spectrogram"].shape == (128, 124)
    assert s["pose_seq"].shape == (60, 282)
    assert s["eid_label"].shape == (8,)
    assert s["text"].shape == (60,)
    # determinism
    s2 = SyntheticGestureDataset(n_samples=16)[0]
    np.testing.assert_array_equal(s["pose_seq"], s2["pose_seq"])
    # emotion signal differs across classes
    other = ds[1]
    assert other["eid_label"].argmax() != s["eid_label"].argmax()
    batch = make_batch([ds[i] for i in range(4)])
    assert batch["spectrogram"].shape == (4, 128, 124)


def test_synthetic_batches_iterator():
    ds = SyntheticGestureDataset(n_samples=10)
    batches = list(ds.batches(batch_size=4, shuffle=True, seed=0))
    assert len(batches) == 2  # drop_last
    assert batches[0]["pose_seq"].shape == (4, 60, 282)
