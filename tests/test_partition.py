"""Partition-hash laws: the key→partition map is a LAKE FORMAT property.

v2 is the fast Arrow-buffer suffix hash used by new lakes; v1 (pandas
hash_array) remains readable for manifests written before the field
existed. Both must be pure functions of the string value — independent of
Arrow representation (slicing, chunking, large_string) and of process.
"""

import numpy as np
import pyarrow as pa
import pytest

from raycdc import partition as P


IDS = ["", "a", "conv-000123", "x" * 40, "conv-000124", "日本語テキスト",
       "a" * 15, "a" * 16, "a" * 17, "b" + "a" * 16]


class TestHashV2Representation:
    """Same values, different Arrow layouts → same hashes."""

    def test_large_string_matches_string(self):
        h = P.hash_conv(pa.array(IDS, pa.string()), 2)
        hl = P.hash_conv(pa.array(IDS, pa.large_string()), 2)
        assert (h == hl).all()

    def test_sliced_array_matches(self):
        arr = pa.array(IDS)
        h = P.hash_conv(arr, 2)
        assert (P.hash_conv(arr.slice(3, 5), 2) == h[3:8]).all()

    def test_chunked_array_matches(self):
        arr = pa.array(IDS)
        h = P.hash_conv(arr, 2)
        ch = pa.chunked_array([arr.slice(0, 4), arr.slice(4)])
        assert (P.hash_conv(ch, 2) == h).all()

    def test_numpy_object_matches(self):
        arr = pa.array(IDS)
        h = P.hash_conv(arr, 2)
        assert (P.hash_conv(np.array(IDS, dtype=object), 2) == h).all()

    def test_batch_composition_independent(self):
        # hash of a value never depends on its neighbours
        solo = P.hash_conv(pa.array(["conv-000123"]), 2)[0]
        packed = P.hash_conv(pa.array(IDS + ["conv-000123"]), 2)[-1]
        assert solo == packed

    def test_all_empty_column(self):
        h = P.hash_conv(pa.array(["", "", ""]), 2)
        assert len(h) == 3 and h[0] == h[1] == h[2]

    def test_integer_keys(self):
        h = P.hash_conv(pa.array([1, 2, 3], pa.int64()), 2)
        assert len(np.unique(h)) == 3
        hc = P.hash_conv(pa.chunked_array([pa.array([1, 2, 3], pa.int64())]), 2)
        assert (h == hc).all()


class TestHashV2Quality:
    def test_sequential_ids_distinct(self):
        # regression: dependent multipliers once collapsed 200k sequential
        # ids to ~300 hash values
        ids = pa.array([f"conv-{i:08d}" for i in range(50_000)])
        h = P.hash_conv(ids, 2)
        assert len(np.unique(h)) == 50_000

    def test_partition_balance_sequential(self):
        ids = pa.array([f"conv-{i:08d}" for i in range(50_000)])
        cnt = np.bincount(P.assign_part(ids, 64, 2), minlength=64)
        mean = 50_000 / 64
        assert cnt.min() > mean * 0.8 and cnt.max() < mean * 1.2

    def test_length_distinguishes_shared_suffix(self):
        # same 16-byte suffix, different lengths → length term separates
        h = P.hash_conv(pa.array(["a" * 16, "b" + "a" * 16, "ba" + "a" * 16]), 2)
        assert len(np.unique(h)) == 3

    def test_salted_keeps_key_whole(self):
        # a (conv, turn) pair always lands in exactly one sub-partition
        ids = pa.array(["c1", "c2"] * 10)
        turns = pa.array(list(range(10)) * 2 + [])[:20]
        turns = pa.array([i // 2 for i in range(20)])
        s1 = P.assign_salted(ids, turns, 8, 4, 2)
        s2 = P.assign_salted(ids, turns, 8, 4, 2)
        assert (s1 == s2).all()


class TestHashVersionPinnedPerLake:
    def test_new_lake_pins_v2(self, tmp_path):
        from raycdc.lake import Lake
        lake = Lake(str(tmp_path / "lake"), num_partitions=4)
        assert lake.hash_version == 2

    def test_legacy_manifest_defaults_to_v1(self, tmp_path):
        import json
        from raycdc.lake import Lake
        root = tmp_path / "lake"
        lake = Lake(str(root), num_partitions=4)
        m = dict(lake.manifest)
        m.pop("hash_version")
        (root / "manifest.json").write_text(json.dumps(m))
        reopened = Lake(str(root))
        assert reopened.hash_version == 1

    def test_v1_assignment_unchanged(self):
        # v1 must keep matching pandas hash_array forever (old lakes)
        import pandas as pd
        ids = np.array([f"conv-{i}" for i in range(100)], dtype=object)
        expect = (pd.util.hash_array(ids) % np.uint64(8)).astype(np.int32)
        assert (P.assign_part(ids, 8, 1) == expect).all()
        assert (P.assign_part(pa.array(list(ids)), 8, 1) == expect).all()
