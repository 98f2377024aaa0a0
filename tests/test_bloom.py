"""Bloom/cuckoo seen-set: zero false negatives (property), low FP."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from cianparser_spark.engine.bloom import BloomFilter, CuckooBucket, PartitionedBloom


@given(st.lists(st.text(min_size=1, max_size=40), min_size=1, max_size=300))
@settings(max_examples=30, deadline=None)
def test_bloom_never_false_negative(keys):
    bf = BloomFilter.build(keys)
    assert bf.contains(np.asarray(keys, dtype=object)).all()


def test_bloom_fp_rate_bounded():
    keys = [f"k{i}" for i in range(20000)]
    bf = BloomFilter.build(keys, bits_per_key=12)
    other = np.asarray([f"x{i}" for i in range(20000)], dtype=object)
    assert bf.contains(other).mean() < 0.01


def test_bloom_serialization_roundtrip():
    bf = BloomFilter.build(["a", "b", "c"])
    bf2 = BloomFilter.from_bytes(bf.to_bytes())
    assert bf2.contains(np.asarray(["a", "b", "c"], dtype=object)).all()


def test_partitioned_bloom():
    keys = [f"url/{i}" for i in range(5000)]
    pb = PartitionedBloom.build(keys, n_buckets=8)
    assert pb.contains(keys).all()
    pb2 = PartitionedBloom.from_blobs(pb.to_blobs())
    assert pb2.contains(keys).all()


def test_bloom_incremental_or_merge():
    # fixed-size filters OR-merge associatively (the store's update path)
    a = BloomFilter(1 << 12)
    b = BloomFilter(1 << 12)
    a.add(np.asarray(["one", "two"], dtype=object))
    b.add(np.asarray(["three"], dtype=object))
    a.bits |= b.bits
    assert a.contains(np.asarray(["one", "two", "three"], dtype=object)).all()


def test_cuckoo_supports_delete():
    ck = CuckooBucket(2048)
    keys = [f"u{i}" for i in range(1000)]
    for k in keys:
        assert ck.add(k)
    assert all(ck.contains(k) for k in keys)
    assert ck.remove("u7")
    assert not ck.contains("u7")
    assert ck.contains("u8")


def test_or_merge_blob_group_refuses_mismatched_geometry():
    """OR-merging blobs of different n_bits must refuse loudly — a
    silent truncating merge would turn Bloom false-positives into
    false NEGATIVES (dropped dedup keys)."""
    import numpy as np
    import pandas as pd
    import pytest as _pytest

    from cianparser_spark.engine.bloom import (
        BloomFilter, blob_n_bits, or_merge_blob_group)

    a = BloomFilter(1 << 12)
    b = BloomFilter(1 << 12)
    a.add(np.asarray(["x", "y"], dtype=object))
    b.add(np.asarray(["z"], dtype=object))
    merged = or_merge_blob_group(pd.DataFrame(
        {"bucket": [3, 3], "blob": [a.to_bytes(), b.to_bytes()]}))
    m = BloomFilter.from_bytes(bytes(merged["blob"].iloc[0]))
    assert m.contains(["x", "y", "z"]).all()
    assert blob_n_bits(merged["blob"].iloc[0]) == 1 << 12

    c = BloomFilter(1 << 13)  # different geometry
    with _pytest.raises(ValueError, match="geometry mismatch"):
        or_merge_blob_group(pd.DataFrame(
            {"bucket": [3, 3], "blob": [a.to_bytes(), c.to_bytes()]}))


# ------------------------------------------------- cuckoo sidecar (J4d)

def test_cuckoo_roundtrip_and_vectorized_probe():
    from cianparser_spark.engine.bloom import CuckooBucket, sidecar_from_bytes
    import numpy as np

    c = CuckooBucket(64)
    keys = [f"1|{i}" for i in range(200)]
    for k in keys:
        assert c.add(k)
    arr = np.array(keys + ["1|absent", "2|nope"], dtype=object)
    got = c.contains_many(arr)
    assert got[:200].all()
    # scalar and vectorized probes agree everywhere
    assert [c.contains(str(k)) for k in arr] == list(got)
    # blob round-trip preserves table + saturation flag
    c2 = sidecar_from_bytes(c.to_bytes())
    assert isinstance(c2, CuckooBucket)
    assert (c2.contains_many(arr) == got).all()
    assert not c2.saturated


def test_cuckoo_duplicate_fp_delete_safety():
    """Two inserted keys that collide on (bucket, fingerprint) hold two
    slot copies; deleting one key must leave the other maybe-seen."""
    from cianparser_spark.engine.bloom import CuckooBucket

    c = CuckooBucket(8)
    # find two distinct keys with identical fp and primary bucket
    seen = {}
    pair = None
    for i in range(100_000):
        k = f"k{i}"
        fp, i1, _ = c._fp_and_idx(k)
        if (fp, i1) in seen:
            pair = (seen[(fp, i1)], k)
            break
        seen[(fp, i1)] = k
    assert pair is not None
    a, b = pair
    c.add(a)
    c.add(b)
    assert c.remove(a)
    assert c.contains(b)  # b's copy survives a's delete


def test_cuckoo_saturation_never_false_negative():
    from cianparser_spark.engine.bloom import CuckooBucket
    import numpy as np

    c = CuckooBucket(8)  # 8*4 = 32 slots
    inserted = []
    for i in range(200):
        ok = c.add(f"x{i}")
        inserted.append(f"x{i}")
        if not ok:
            break
    assert c.saturated
    # saturated: EVERYTHING answers maybe-seen (incl. the key whose
    # insert failed) — degraded to the exact tier, never a false miss
    arr = np.array(inserted + ["neverseen"], dtype=object)
    assert c.contains_many(arr).all()
    rt = CuckooBucket.from_bytes(c.to_bytes())
    assert rt.saturated and rt.contains("anything")
