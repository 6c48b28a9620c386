"""Property-based tests (hypothesis) for the merge kernel — the CDC
crown-jewel semantics checked against an independent in-test reference
fold over randomized event streams, plus the two algebraic properties the
engine's architecture leans on:

  * fold(all events) == fold(fold(first half) + second half) when split at
    a cursor boundary — the base+delta fragment / incremental-merge law;
  * re-merging an already-applied batch is a no-op — the at-least-once
    duplicate-push law.

Kernel-level (no Ray session needed): ``merge.merge_partition_table`` is a
pure Arrow-in/Arrow-out function.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from raycdc import merge as M

KEYS = [("conv-a", 0), ("conv-a", 1), ("conv-b", 0)]
PAYLOAD = ["text", "tool"]

_event = st.tuples(
    st.sampled_from(KEYS),
    st.sampled_from(["insert", "update", "delete"]),
    st.integers(min_value=1, max_value=60),  # cursor
    st.integers(min_value=0, max_value=2),  # seq
    st.one_of(st.none(), st.text(alphabet="xyz", min_size=1, max_size=3)),
    st.one_of(st.none(), st.sampled_from(["t1", "t2"])),
)

_streams = st.lists(_event, min_size=0, max_size=40)


def _dedup(events: list) -> list:
    """Unique (key, cursor, seq): ties between DIFFERENT payloads are
    ill-defined on both sides (the engine breaks them deterministically,
    the spec doesn't), so the property quantifies over well-formed streams."""
    seen, out = set(), []
    for ev in events:
        k = (ev[0], ev[2], ev[3])
        if k not in seen:
            seen.add(k)
            out.append(ev)
    return out


def _table(events: list) -> pa.Table:
    return pa.table(
        {
            "conv_id": pa.array([e[0][0] for e in events], pa.string()),
            "turn_idx": pa.array([e[0][1] for e in events], pa.int32()),
            "text": pa.array(
                [e[4] if e[1] != "delete" else None for e in events], pa.string()
            ),
            "tool": pa.array(
                [e[5] if e[1] != "delete" else None for e in events], pa.string()
            ),
            "cursor": pa.array([e[2] for e in events], pa.int64()),
            "seq": pa.array([e[3] for e in events], pa.int32()),
            "op": pa.array([e[1] for e in events], pa.string()),
        }
    )


def _reference_fold(events: list) -> dict:
    """Independent spec implementation: strict (cursor, seq) guard, insert
    replaces, update patches non-null (upsert-creates), delete tombstones
    but keeps the watermark."""
    state: dict = {}
    marks: dict = {}
    for key, op, cursor, seq, text, tool in sorted(
        events, key=lambda e: (e[2], e[3])
    ):
        mark = (cursor, seq)
        if key in marks and mark <= marks[key]:
            continue
        marks[key] = mark
        if op == "delete":
            state[key] = None
        elif op == "insert":
            state[key] = {"text": text, "tool": tool}
        else:
            cur = dict(state.get(key) or {"text": None, "tool": None})
            if text is not None:
                cur["text"] = text
            if tool is not None:
                cur["tool"] = tool
            state[key] = cur
    return {
        k: (
            state[k] is None,
            (state[k] or {}).get("text"),
            (state[k] or {}).get("tool"),
            marks[k][0],
            marks[k][1],
        )
        for k in marks
    }


def _kernel_rows(out: pa.Table) -> dict:
    df = out.to_pandas()
    return {
        (df["conv_id"].iat[i], int(df["turn_idx"].iat[i])): (
            bool(df[M.DELETED_COL].iat[i]),
            None if pd.isna(df["text"].iat[i]) else df["text"].iat[i],
            None if pd.isna(df["tool"].iat[i]) else df["tool"].iat[i],
            int(df["cursor"].iat[i]),
            int(df["seq"].iat[i]),
        )
        for i in range(len(df))
    }


@settings(max_examples=200, deadline=None)
@given(_streams)
def test_merge_kernel_matches_reference_fold(raw):
    events = _dedup(raw)
    if not events:
        return
    out = M.merge_partition_table(None, _table(events), PAYLOAD)
    assert _kernel_rows(out) == _reference_fold(events)


@settings(max_examples=200, deadline=None)
@given(_streams, st.integers(min_value=0, max_value=60))
def test_incremental_merge_equals_one_shot(raw, mid):
    """base+delta law: folding a prefix into a fragment, then merging the
    suffix against it, equals one whole-stream fold — for any cursor split
    (the engine always splits on round cursor ranges)."""
    events = _dedup(raw)
    first = [e for e in events if e[2] <= mid]
    second = [e for e in events if e[2] > mid]
    if not events:
        return
    whole = M.merge_partition_table(None, _table(events), PAYLOAD)
    if not first or not second:
        return
    frag = M.merge_partition_table(None, _table(first), PAYLOAD)
    stepped = M.merge_partition_table(frag, _table(second), PAYLOAD)
    assert _kernel_rows(stepped) == _kernel_rows(whole)


@settings(max_examples=100, deadline=None)
@given(_streams, _streams)
def test_prefold_guard_preserves_merge_semantics(lake_raw, round_raw):
    """Salted pre-fold law: merging the PRE-FOLDED round into a fragment
    equals merging the raw round, for ANY round stream — including
    contract-violating stale re-deliveries (cursor < the round watermark),
    novel stale events, and round events patching keys the lake already
    holds. Precondition mirrors production: every lake cursor precedes the
    round's cursor_lo (rounds are cursor-monotone)."""
    from raycdc import lake as L
    from raycdc import partition as P
    from raycdc.engine import _PreFold

    LO = 30
    lake_events = [e for e in _dedup(lake_raw) if e[2] < LO]
    round_events = _dedup(round_raw)
    if not round_events:
        return
    frag = (
        M.merge_partition_table(None, _table(lake_events), PAYLOAD)
        if lake_events
        else None
    )

    raw_tbl = _table(round_events)
    direct = M.merge_partition_table(frag, raw_tbl, PAYLOAD)

    nparts = 4
    part = P.assign_part(
        raw_tbl.column("conv_id").to_numpy(zero_copy_only=False), nparts
    )
    grouped = raw_tbl.append_column("part", pa.array(part, pa.int32()))
    pf = _PreFold(L._schema_to_str(raw_tbl.schema), nparts, cursor_lo=LO)
    folded = pf(grouped)
    stepped = M.merge_partition_table(frag, folded, PAYLOAD)
    assert _kernel_rows(stepped) == _kernel_rows(direct)


@settings(max_examples=100, deadline=None)
@given(_streams)
def test_duplicate_push_is_noop(raw):
    """at-least-once law: re-merging the identical batch against the state
    it produced changes nothing (exact (key, cursor, seq) dedup keeps the
    lake row)."""
    events = _dedup(raw)
    if not events:
        return
    once = M.merge_partition_table(None, _table(events), PAYLOAD)
    twice = M.merge_partition_table(once, _table(events), PAYLOAD)
    assert _kernel_rows(twice) == _kernel_rows(once)


@settings(max_examples=150, deadline=None)
@given(_streams, st.integers(min_value=0, max_value=60), st.integers(min_value=0, max_value=60))
def test_fused_runs_merge_equals_fold_then_merge(raw, cut1, cut2):
    """LSM fusion law: passing the base+delta RUN LIST straight into
    merge_partition_table equals folding the runs first and merging the
    round against the folded state — for any two cursor splits (runs are
    cursor-range fragments in production, but the law must hold for any
    split the incremental-merge law already admits)."""
    lo, hi = min(cut1, cut2), max(cut1, cut2)
    events = _dedup(raw)
    if not events:
        return
    r1 = [e for e in events if e[2] <= lo]
    r2 = [e for e in events if lo < e[2] <= hi]
    ev = [e for e in events if e[2] > hi]
    runs = []
    prev = None
    for chunk in (r1, r2):
        if not chunk:
            continue
        prev = M.merge_partition_table(prev, _table(chunk), PAYLOAD)
        runs.append(prev)
    if not ev:
        return
    two_pass = M.merge_partition_table(
        M.fold_fragments_table(runs, PAYLOAD), _table(ev), PAYLOAD
    )
    fused = M.merge_partition_table(runs, _table(ev), PAYLOAD)
    assert _kernel_rows(fused) == _kernel_rows(two_pass)
    # and both equal the one-shot whole-stream fold
    whole = M.merge_partition_table(None, _table(events), PAYLOAD)
    assert _kernel_rows(fused) == _kernel_rows(whole)


# -- lexicographic searchsorted (windowed-aggregate kernel) ------------------

_pairs = st.lists(
    st.tuples(st.integers(0, 5), st.integers(-20, 20)), min_size=0, max_size=50
)


@given(data=_pairs, queries=_pairs)
@settings(max_examples=200, deadline=None)
def test_lex_searchsorted_left_matches_bruteforce(data, queries):
    """lex_searchsorted_left(a, q) == count of data pairs lexicographically
    smaller than each query pair — the law the rolling-window frame start
    depends on (ties must resolve to the FIRST equal data row)."""
    from raycdc.queries.common import lex_searchsorted_left

    data = sorted(data)
    a1 = np.array([x for x, _ in data], np.int64)
    a2 = np.array([y for _, y in data], np.int64)
    q1 = np.array([x for x, _ in queries], np.int64)
    q2 = np.array([y for _, y in queries], np.int64)
    got = lex_searchsorted_left(a1, a2, q1, q2)
    want = [sum(1 for d in data if d < q) for q in queries]
    assert got.tolist() == want


# -- scrub kernels vs brute-force references ---------------------------------

_doc_text = st.lists(
    st.sampled_from(["a", "b", "ab", "user", "batch", ""]),
    min_size=0, max_size=12,
).map(" ".join)


@given(st.lists(_doc_text, min_size=1, max_size=8))
@settings(max_examples=60, deadline=None)
def test_repetition_kernel_matches_bruteforce(texts):
    """docs_repetition's vectorized batch kernel == a per-doc Python
    reference on arbitrary token streams (incl. empty/whitespace docs and
    batch-composition edges)."""
    from raycdc.queries import common as C
    from raycdc.queries.scrub import REP_N, docs_repetition

    captured = {}

    class FakeDS:
        def map_batches(self, fn, **kw):
            captured["fn"] = fn
            return self

    orig = C.read
    C.read = lambda *a, **k: FakeDS()
    try:
        docs_repetition("/unused")
    finally:
        C.read = orig

    b = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    out = captured["fn"](b).set_index("doc_id")

    from raycdc import phash as H

    for i, t in enumerate(texts):
        toks = t.split()
        grams = [
            " ".join(toks[j : j + REP_N])
            for j in range(max(len(toks) - REP_N + 1, 0))
        ]
        hashes = list(H.poly_hash(np.asarray(grams, dtype=object))) if grams else []
        n_dup = len(hashes) - len(set(hashes))
        adj = sum(1 for j in range(len(toks) - 1) if toks[j] == toks[j + 1])
        assert out.loc[i, "n_grams"] == len(grams)
        assert out.loc[i, "n_dup_grams"] == n_dup
        assert out.loc[i, "n_adjacent_repeats"] == adj


@given(st.lists(
    st.text(alphabet="abe@.r 0123456789", min_size=0, max_size=30),
    min_size=1, max_size=6,
))
@settings(max_examples=60, deadline=None)
def test_redact_kernel_matches_python_re(texts):
    """docs_redact's Arrow RE2 pass == Python re applied pattern-by-pattern
    (the patterns use only RE2/'s and re's common subset)."""
    import re

    import pyarrow as pa

    from raycdc.queries import common as C
    from raycdc.queries.scrub import REDACT_PATTERNS, REDACT_TOKEN, docs_redact

    captured = {}

    class FakeDS:
        def map_batches(self, fn, **kw):
            captured["fn"] = fn
            return self

    orig = C.read
    C.read = lambda *a, **k: FakeDS()
    try:
        docs_redact("/unused")
    finally:
        C.read = orig

    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    out = captured["fn"](t).to_pandas().set_index("doc_id")

    for i, txt in enumerate(texts):
        n = 0
        for _, pat in REDACT_PATTERNS:
            n += len(re.findall(pat, txt))
            txt = re.sub(pat, REDACT_TOKEN, txt)
        assert out.loc[i, "clean_text"] == txt
        assert out.loc[i, "n_redacted"] == n


# -- adaptive batcher invariants ---------------------------------------------

@given(
    size=st.integers(1, 64),
    events=st.lists(st.booleans(), max_size=60),  # True = retriable failure
    cooldown=st.integers(1, 5),
)
@settings(max_examples=100, deadline=None)
def test_adaptive_batcher_size_always_in_bounds(size, events, cooldown):
    """Whatever the failure/success interleaving, the width stays within
    [floor, cap] and a retriable failure never RAISES above the floor."""
    from raycdc.adaptive import AdaptiveBatcher

    b = AdaptiveBatcher(size=size, cooldown=cooldown, give_up=10_000)
    for is_failure in events:
        before = b.size
        if is_failure:
            assert b.failure(TimeoutError("t"))
            assert b.size <= before
        else:
            b.success()
            assert b.size >= before
        assert b.floor <= b.size <= b.cap


@given(
    size=st.integers(1, 32),
    fail_above=st.integers(0, 32),
)
@settings(max_examples=50, deadline=None)
def test_adaptive_batcher_run_converges(size, fail_above):
    """run() terminates for any fn that succeeds at SOME width ≥ floor:
    either immediately or after halving down to a workable width."""
    from raycdc.adaptive import AdaptiveBatcher

    calls = []

    def fn(width):
        calls.append(width)
        if width > max(1, fail_above):
            raise TimeoutError("too wide")
        return width

    b = AdaptiveBatcher(size=size)
    out = b.run(fn)
    assert out <= max(1, fail_above)
    assert len(calls) <= size.bit_length() + 1  # halving is geometric


# -- perceptual-hash kernel invariants --------------------------------------

_blob_texts = st.lists(
    st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF),
        min_size=0, max_size=40,
    ),
    min_size=1, max_size=12,
)


@given(_blob_texts)
@settings(max_examples=40, deadline=None)
def test_phash_invariant_under_segment_swaps(texts):
    """The planted 're-encode' (swap the first two pixels of every pooling
    segment) must NEVER move a blob out of its perceptual group: segment
    sums — and therefore every pHash bit — are invariant by construction,
    for arbitrary text-derived blobs, not just the shipped fixtures."""
    import pyarrow as pa

    from raycdc.queries.multimodal import (
        MediaPHasher,
        _synthesize_batch,
        swap_segment_heads,
    )

    ids = np.arange(len(texts), dtype=np.int64)
    blobs = _synthesize_batch(ids, np.asarray(texts, dtype=object))
    swapped = swap_segment_heads(blobs)

    hasher = MediaPHasher()
    mk = lambda media: pa.table(  # noqa: E731
        {"doc_id": pa.array(ids), "variant": pa.array(ids * 0), "media": media}
    )
    h0 = hasher(mk(blobs)).column("phash").to_pylist()
    h1 = hasher(mk(swapped)).column("phash").to_pylist()
    assert h0 == h1


@given(_blob_texts)
@settings(max_examples=40, deadline=None)
def test_phash_matches_bruteforce_pooling(texts):
    """The flat-buffer reduceat kernel equals a plain per-blob Python
    recomputation of the segment-pooled threshold bits."""
    import pyarrow as pa

    from raycdc.queries.multimodal import (
        PHASH_SEGS,
        MediaPHasher,
        _synthesize_batch,
    )

    ids = np.arange(len(texts), dtype=np.int64)
    blobs = _synthesize_batch(ids, np.asarray(texts, dtype=object))
    got = (
        MediaPHasher()(
            pa.table(
                {
                    "doc_id": pa.array(ids),
                    "variant": pa.array(ids * 0),
                    "media": blobs,
                }
            )
        )
        .column("phash")
        .to_pylist()
    )
    for k, blob in enumerate(blobs.to_pylist()):
        pix = np.frombuffer(blob[16:], dtype=np.uint8).astype(np.int64)
        n = len(pix)
        total = int(pix.sum())
        want = 0
        for j in range(PHASH_SEGS):
            lo, hi = n * j // PHASH_SEGS, n * (j + 1) // PHASH_SEGS
            if int(pix[lo:hi].sum()) * n > total * (hi - lo):
                want |= 1 << j
        assert got[k] == want


# -- priority-sampling combiner ---------------------------------------------

@given(
    st.lists(st.integers(0, 500), min_size=1, max_size=60),
    st.integers(1, 8),
    st.integers(1, 6),
)
@settings(max_examples=60, deadline=None)
def test_priority_topk_combiner_is_superset_stable(ntoks, k, nchunks):
    """Merging per-chunk top-Ks then taking the global top-K equals the
    top-K over everything — the invariant that lets docs_weighted_sample
    prune per batch without a shuffle."""
    from raycdc import phash as H

    ids = np.arange(len(ntoks), dtype=np.int64)
    h = H.poly_hash([f"doc-{i}" for i in ids]).astype("int64")
    w = np.asarray(ntoks, dtype=np.int64)
    pr = (w * (H.P + 1)).astype("float64") / (h + 1).astype("float64")
    df = pd.DataFrame({"doc_id": ids, "priority": pr})

    def topk(d):
        return d.sort_values(
            ["priority", "doc_id"], ascending=[False, True], kind="stable"
        ).head(k)

    merged = topk(
        pd.concat(
            [topk(c) for _, c in df.groupby(df.doc_id % nchunks)],
            ignore_index=True,
        )
    ).reset_index(drop=True)
    want = topk(df).reset_index(drop=True)
    pd.testing.assert_frame_equal(merged, want)


# -- SCD2 kernel vs row-by-row reference --------------------------------------

_scd2_events = st.lists(
    st.tuples(
        st.integers(0, 2),                      # conv (small: force collisions)
        st.integers(0, 2),                      # turn
        st.sampled_from(["insert", "update", "delete"]),
        st.one_of(st.none(), st.sampled_from(["a", "b", "c"])),  # role
        st.one_of(st.none(), st.sampled_from(["x", "y"])),       # text
    ),
    min_size=0,
    max_size=40,
)


def _scd2_reference(rows):
    """Obviously-correct per-key simulation: walk events in wm order,
    maintain the patch-folded state, emit one version per event."""
    from collections import defaultdict

    by_key = defaultdict(list)
    seen = set()
    for wm, (conv, turn, op, role, text) in enumerate(rows):
        key = (conv, turn, wm)
        if key in seen:  # exact re-delivery: collapses
            continue
        seen.add(key)
        by_key[(conv, turn)].append((wm, op, role, text))
    out = []
    for (conv, turn), evs in by_key.items():
        state = {"role": None, "text": None}
        for i, (wm, op, role, text) in enumerate(evs):
            if op in ("insert", "delete"):
                state = {"role": None, "text": None}
            if role is not None:
                state["role"] = role
            if text is not None:
                state["text"] = text
            nxt = evs[i + 1][0] if i + 1 < len(evs) else -1
            out.append(
                {
                    "conv_id": f"c{conv}",
                    "turn_idx": turn,
                    "ver": i + 1,
                    "ver_op": op,
                    "role": state["role"],
                    "text": state["text"],
                    "valid_from": wm,
                    "valid_to": nxt,
                    "is_current": int(nxt == -1 and op != "delete"),
                }
            )
    return pd.DataFrame(out)


@given(_scd2_events, st.data())
@settings(max_examples=60, deadline=None)
def test_scd2_kernel_matches_reference(rows, data):
    """The vectorized SCD2 fold must equal the per-event simulation on any
    stream, including exact re-deliveries (a sampled subset of events is
    delivered twice at the same wm)."""
    from raycdc.queries.cdc import _scd2_kernel

    recs = []
    for wm, (conv, turn, op, role, text) in enumerate(rows):
        rec = {
            "conv_id": f"c{conv}", "turn_idx": turn, "role": role,
            "text": text, "tool": None,
            "ts": pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=wm),
            "op": op, "wm": wm,
        }
        recs.append(rec)
        if data.draw(st.booleans(), label=f"dup@{wm}"):
            recs.append(dict(rec))  # exact duplicate re-delivery
    g = pd.DataFrame(
        recs,
        columns=["conv_id", "turn_idx", "role", "text", "tool", "ts",
                 "op", "wm"],
    )
    got = _scd2_kernel(g)
    want = _scd2_reference(rows)
    if len(want) == 0:
        assert len(got) == 0
        return
    cols = ["conv_id", "turn_idx", "ver", "ver_op", "role", "text",
            "valid_from", "valid_to", "is_current"]
    got = got[cols].sort_values(cols, kind="stable").reset_index(drop=True)
    want = (
        want[cols]
        .astype(got.dtypes.to_dict())
        .sort_values(cols, kind="stable")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-5, max_value=5),
            st.integers(min_value=0, max_value=5),
        ),
        max_size=40,
    )
)
def test_skyline2d_matches_bruteforce(pts):
    """_skyline2d == the O(k²) domination definition, including ties on
    one or both coordinates (exact duplicates all survive)."""
    from raycdc.queries.events import _skyline2d

    s = np.array([p[0] for p in pts], np.int64)
    n = np.array([p[1] for p in pts], np.int64)
    got = _skyline2d(s, n)
    for i in range(len(pts)):
        dominated = any(
            s[j] >= s[i]
            and n[j] >= n[i]
            and (s[j] > s[i] or n[j] > n[i])
            for j in range(len(pts))
        )
        assert got[i] == (not dominated), (i, pts)


# -- multi-probe LSH probe-set laws -----------------------------------------

@settings(deadline=None, max_examples=50)
@given(st.integers(min_value=0, max_value=2**31 - 1))
def test_multiprobe_probe_set_laws(seed):
    """For any query vector: every band's probe set contains the query's
    own band code (superset law — what makes multiprobe recall dominate
    single-probe by construction), has at most 1 + MULTIPROBE_T codes, and
    every code is a valid BAND_BITS-bit bucket. Probes differ from the
    base code by exactly one bit (the 1-bit-flip construction)."""
    from raycdc.queries.ann import (
        LSH_BAND_BITS,
        LSH_NBANDS,
        MULTIPROBE_T,
        _band_codes,
        _lsh_planes,
        _multiprobe_codes,
    )

    rng = np.random.RandomState(seed)
    q = rng.standard_normal(64)
    planes = _lsh_planes()
    base = _band_codes(q[None, :], planes)[0]
    probes = _multiprobe_codes(q, planes)
    assert len(probes) == LSH_NBANDS
    for b, pset in enumerate(probes):
        assert int(base[b]) in pset
        assert len(pset) <= 1 + MULTIPROBE_T
        for c in pset:
            assert 0 <= c < (1 << LSH_BAND_BITS)
            flipped = c ^ int(base[b])
            assert flipped == 0 or bin(flipped).count("1") == 1
