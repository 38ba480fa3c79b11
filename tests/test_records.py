"""Tests for the NovaRecords format, native reader, and loader."""

import numpy as np
import pytest

from nova_pointcloud_tpu.data.records import (
    FeatureDataLoader,
    RecordReader,
    RecordWriter,
    decode_record,
    encode_record,
)


def test_encode_decode_roundtrip():
    fields = {
        "moments": np.random.RandomState(0).randn(4, 4, 8).astype(np.float16),
        "label": np.asarray([7], np.int64),
        "text": "a chair",
        "flag": np.asarray(True),
    }
    out = decode_record(encode_record(fields))
    np.testing.assert_array_equal(out["moments"], fields["moments"])
    assert out["label"][0] == 7
    assert out["text"] == b"a chair"
    assert bool(out["flag"]) is True


def make_dataset(path, n=32):
    w = RecordWriter(str(path))
    rng = np.random.RandomState(0)
    for i in range(n):
        w.write({"moments": rng.randn(2, 2, 8).astype(np.float16),
                 "caption_embed": rng.randn(4, 16).astype(np.float16),
                 "label": np.asarray([i], np.int64)})
    w.close({"source": "test"})


class TestReader:
    def test_native_reader(self, tmp_path):
        make_dataset(tmp_path)
        r = RecordReader(str(tmp_path))
        assert r.native, "native C++ reader must build and load"
        assert len(r) == 32
        rec = r[5]
        assert rec["label"][0] == 5
        assert rec["moments"].shape == (2, 2, 8)
        r.prefetch([6, 7, 8])  # must not crash
        r.close()

    def test_python_fallback_matches_native(self, tmp_path):
        make_dataset(tmp_path)
        rn = RecordReader(str(tmp_path), use_native=True)
        rp = RecordReader(str(tmp_path), use_native=False)
        assert not rp.native
        for i in (0, 13, 31):
            np.testing.assert_array_equal(rn[i]["moments"], rp[i]["moments"])
        rn.close()

    def test_out_of_range(self, tmp_path):
        make_dataset(tmp_path, 4)
        r = RecordReader(str(tmp_path))
        with pytest.raises(IndexError):
            r[99]
        r.close()


class TestLoader:
    def test_batches(self, tmp_path):
        make_dataset(tmp_path)
        loader = FeatureDataLoader(str(tmp_path), batch_size=4, seed=0,
                                   shard_id=0, num_shards=1)
        seen = set()
        for _ in range(8):  # one epoch
            batch = loader.next()
            assert batch["moments"].shape == (4, 2, 2, 8)
            assert batch["moments"].dtype == np.float32
            assert batch["text_embeds"].shape == (4, 4, 16)
            seen.update(batch["labels"].flatten().tolist())
        assert seen == set(range(32))  # full epoch coverage
        loader.shutdown()

    def test_sharding(self, tmp_path):
        make_dataset(tmp_path)
        l0 = FeatureDataLoader(str(tmp_path), 4, shard_id=0, num_shards=2,
                               shuffle=False)
        l1 = FeatureDataLoader(str(tmp_path), 4, shard_id=1, num_shards=2,
                               shuffle=False)
        b0, b1 = l0.next(), l1.next()
        assert set(b0["labels"].flatten()) & set(b1["labels"].flatten()) == set()
        l0.shutdown(), l1.shutdown()
