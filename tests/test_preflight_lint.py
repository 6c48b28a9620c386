"""The dtype-class lint that makes the r3/r4 oracle-cast failure class
(`doc_pack_offsets`, `users_pareto_frontier`: DuckDB sum(BIGINT)→HUGEINT→
float64 vs Ray int64 — values equal, driver hash red) unrepeatable: the
preflight must flag int-vs-float column class disagreement on the RAW
frames even though canon()'d values compare equal."""
from __future__ import annotations

import pandas as pd

from scripts.preflight import canon, dtype_class_mismatches


def test_uncast_hugeint_oracle_is_flagged():
    # Ray side: int64 aggregate. Oracle side: the same values arriving as
    # float64 (what an uncast DuckDB HUGEINT sum degrades to in .df()).
    got = pd.DataFrame({"user_id": [1, 2], "sum_cents": pd.array([10, 20], dtype="int64")})
    want = pd.DataFrame({"user_id": [1, 2], "sum_cents": pd.array([10.0, 20.0], dtype="float64")})
    # values ARE equal after canon — exactly why the old preflight missed it
    pd.testing.assert_frame_equal(canon(got), canon(want), check_dtype=False)
    assert dtype_class_mismatches(got, want) == ["sum_cents:int!=float"]


def test_matching_classes_pass():
    got = pd.DataFrame({"a": [1, 2], "b": [0.5, 1.5], "c": ["x", "y"]})
    want = pd.DataFrame({"a": [1, 2], "b": [0.5, 1.5], "c": ["x", "y"]})
    assert dtype_class_mismatches(got, want) == []


def test_int_width_difference_is_not_flagged():
    # int32 vs int64 is canon-coerced and hashes identically downstream —
    # only CLASS disagreement (int vs float vs bool) is the failure mode.
    got = pd.DataFrame({"a": pd.array([1, 2], dtype="int32")})
    want = pd.DataFrame({"a": pd.array([1, 2], dtype="int64")})
    assert dtype_class_mismatches(got, want) == []


def test_bool_vs_int_is_flagged():
    got = pd.DataFrame({"flag": pd.array([True, False], dtype="bool")})
    want = pd.DataFrame({"flag": pd.array([1, 0], dtype="int64")})
    assert dtype_class_mismatches(got, want) == ["flag:bool!=int"]
