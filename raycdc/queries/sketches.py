"""Distributed sketch operators: HyperLogLog distinct-count registers and
exact heavy hitters via a Misra-Gries candidate pass.

These are the bounded-state aggregation primitives a 100-TB pipeline needs
when the key space itself is too large to shuffle: both operators move only
O(sketch size) rows per block regardless of key cardinality, never one row
per distinct key. (Reference analog: the seen-key dicts and counter caches
scattered through /root/reference ``indexer/jobs/*`` — re-expressed as
mergeable sketches so the state stays bounded per worker.)

Both are SQL-oracle-verifiable: the HLL registers are built on the portable
poly-hash family (raycdc.phash) so DuckDB reproduces every register
exactly, and the heavy-hitter output is EXACT (the sketch only proposes
candidates; a second exact counting pass decides), so the oracle is a plain
GROUP BY ... HAVING.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ray.data.aggregate import Max

from raycdc import phash as H
from raycdc.queries import common as C

# -- HyperLogLog registers ---------------------------------------------------

HLL_M = 256          # 2^8 buckets → ~6.5% relative error on the estimate
_REM_BITS = 23       # poly_hash < 2^31; bucket eats 8 bits, 23 remain


def _bucket_rho(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-key HLL (bucket, rho) from the portable poly-hash.

    rho = 1 + leading zeros of the 23-bit remainder = 24 - bit_length(rem).
    bit_length via ``np.frexp`` exponents — exact for integers < 2^53,
    no per-row Python."""
    h = H.poly_hash(keys)
    bucket = (h % np.uint64(HLL_M)).astype("int64")
    rem = (h // np.uint64(HLL_M)).astype("int64")
    bitlen = np.frexp(rem.astype("float64"))[1]  # frexp(0) → exponent 0
    rho = (_REM_BITS + 1) - bitlen
    return bucket, rho.astype("int64")


def _registers(keys: np.ndarray) -> pd.DataFrame:
    """(bucket, max_rho) partial registers for a batch of string keys."""
    bucket, rho = _bucket_rho(keys)
    df = pd.DataFrame({"bucket": bucket, "max_rho": rho})
    return df.groupby("bucket", as_index=False)["max_rho"].max()


def hll_registers(sf_dir: str):
    """HLL register table for COUNT(DISTINCT event_id) over ``events``:
    ≤256 rows of (bucket, max_rho). Scale shape: each batch collapses to
    ≤256 partial rows inside ``map_batches`` (the combiner), then one tiny
    bounded-key groupby-max merges them — the shuffle moves O(256 × blocks)
    rows, never O(distinct keys). The register table IS the mergeable
    sketch: union of two corpora = elementwise max of their registers."""
    ds = C.read(sf_dir, "events", ["event_id"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return _registers(b["event_id"].astype("string").to_numpy(dtype=object))

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("bucket")
        .aggregate(Max("max_rho", alias_name="max_rho"))
        .to_pandas()
    )
    out["max_rho"] = out["max_rho"].astype("int64")
    return out[["bucket", "max_rho"]]


def hll_estimate(registers: pd.DataFrame, n_buckets: int = HLL_M) -> float:
    """Flajolet et al. estimate from a register table (buckets with no
    entry count as rho=0). Driver-side: the registers are the distributed
    artifact; this fold is O(m)."""
    rho = np.zeros(n_buckets)
    rho[registers["bucket"].to_numpy()] = registers["max_rho"].to_numpy()
    alpha = 0.7213 / (1 + 1.079 / n_buckets)
    est = alpha * n_buckets * n_buckets / np.sum(np.exp2(-rho))
    zeros = np.count_nonzero(rho == 0)
    if est <= 2.5 * n_buckets and zeros:  # small-range linear counting
        est = n_buckets * np.log(n_buckets / zeros)
    return float(est)


HLL_SQL = f"""
WITH h AS (
    SELECT {H.sql_poly("CAST(event_id AS VARCHAR)")} AS h FROM events
), r AS (
    SELECT h % {HLL_M} AS bucket, h // {HLL_M} AS rem FROM h
)
SELECT bucket,
       CAST(max({_REM_BITS + 1} -
            CASE WHEN rem = 0 THEN 0 ELSE length(bin(rem)) END) AS BIGINT)
           AS max_rho
FROM r GROUP BY bucket
"""


# grouped HLL: per-day distinct-user registers — the GROUP BY form every
# real pipeline runs (daily actives at corpus scale). Per-group state stays
# bounded (≤256 registers/day), so the shuffle moves O(days × 256 × blocks)
# rows, never one row per distinct user.
def hll_daily_users(sf_dir: str):
    """Per-day HLL register tables for COUNT(DISTINCT user_id): ≤256 rows
    of (day, bucket, max_rho) per day. Each batch collapses to day×bucket
    partials inside ``map_batches``; one bounded-key groupby-max merges
    them. ``hll_estimate`` on any day's slice gives that day's distinct
    estimate; registers merge across corpora by elementwise max."""
    ds = C.read(sf_dir, "events", ["ts", "user_id"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        bucket, rho = _bucket_rho(
            b["user_id"].astype("string").to_numpy(dtype=object)
        )
        df = pd.DataFrame(
            {"day": b["ts"].dt.floor("D"), "bucket": bucket, "max_rho": rho}
        )
        return df.groupby(["day", "bucket"], as_index=False)["max_rho"].max()

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["day", "bucket"])
        .aggregate(Max("max_rho", alias_name="max_rho"))
        .to_pandas()
    )
    out["max_rho"] = out["max_rho"].astype("int64")
    return out[["day", "bucket", "max_rho"]]


HLL_DAILY_SQL = f"""
WITH h AS (
    SELECT date_trunc('day', ts) AS day,
           {H.sql_poly("CAST(user_id AS VARCHAR)")} AS h
    FROM events
), r AS (
    SELECT day, h % {HLL_M} AS bucket, h // {HLL_M} AS rem FROM h
)
SELECT day, bucket,
       CAST(max({_REM_BITS + 1} -
            CASE WHEN rem = 0 THEN 0 ELSE length(bin(rem)) END) AS BIGINT)
           AS max_rho
FROM r GROUP BY day, bucket
"""


# -- HLL set algebra: segment registers + lossless union merge ---------------

HLL_SPLIT_DAY = 16  # segment A = days 1-15, segment B = the rest


def hll_user_overlap(sf_dir: str):
    """Sketch ALGEBRA, not just sketching: per-segment HLL register tables
    for two user populations (first vs second half of the month) plus
    their union merged by elementwise register max — the property that
    makes HLL mergeable across shards/segments with NO rescan, which is
    the whole reason to store registers in a lake (the reference keeps
    daily aggregate tables and re-joins them,
    ``indexer/aggr_jobs/order_jobs/period_wallet_addresses_aggregates.sql``;
    register tables compose by max instead). Output is all-integer
    (segment, bucket, max_rho) rows; the intersection ESTIMATE
    |A| + |B| − |A∪B| is derived from these rows by
    :func:`hll_estimate` (pinned against the exact overlap in pytest —
    the float estimate stays out of the hash contract)."""
    ds = C.read(sf_dir, "events", ["ts", "user_id"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        bucket, rho = _bucket_rho(
            b["user_id"].astype("string").to_numpy(dtype=object)
        )
        seg = np.where(b["ts"].dt.day.to_numpy() < HLL_SPLIT_DAY, "a", "b")
        df = pd.DataFrame({"segment": seg, "bucket": bucket, "max_rho": rho})
        return df.groupby(["segment", "bucket"], as_index=False)["max_rho"].max()

    regs = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["segment", "bucket"])
        .aggregate(Max("max_rho", alias_name="max_rho"))
        .to_pandas()
    )
    regs["max_rho"] = regs["max_rho"].astype("int64")
    # union = elementwise max over the two segments' registers — pure
    # bounded-table algebra, no rescan of the fact table
    union = (
        regs.groupby("bucket", as_index=False)["max_rho"]
        .max()
        .assign(segment="union")
    )
    out = pd.concat(
        [regs[["segment", "bucket", "max_rho"]], union[["segment", "bucket", "max_rho"]]],
        ignore_index=True,
    )
    return out.sort_values(["segment", "bucket"], kind="stable").reset_index(
        drop=True
    )


HLL_OVERLAP_SQL = f"""
WITH h AS (
    SELECT CASE WHEN EXTRACT(day FROM ts) < {HLL_SPLIT_DAY}
                THEN 'a' ELSE 'b' END AS segment,
           {H.sql_poly("CAST(user_id AS VARCHAR)")} AS h
    FROM events
), r AS (
    SELECT segment, h % {HLL_M} AS bucket, h // {HLL_M} AS rem FROM h
), segs AS (
    SELECT segment, bucket,
           CAST(max({_REM_BITS + 1} -
                CASE WHEN rem = 0 THEN 0 ELSE length(bin(rem)) END) AS BIGINT)
               AS max_rho
    FROM r GROUP BY segment, bucket
)
SELECT segment, bucket, max_rho FROM segs
UNION ALL
SELECT 'union' AS segment, bucket, max(max_rho) AS max_rho
FROM segs GROUP BY bucket
ORDER BY segment, bucket
"""


# -- exact heavy hitters (Misra-Gries candidates + exact verify) -------------

HH_PHI_INV = 128   # report keys with count ≥ ceil(n / 128)
HH_CAP = 192       # MG capacity; guarantee needs cap + 1 > HH_PHI_INV


def _mg_summary(vc: pd.Series, cap: int) -> pd.Series:
    """Misra-Gries reduction of exact batch counts to ≤``cap`` survivors:
    subtract the (cap+1)-th largest count from everyone, keep positives.
    Residual undercounts each key by ≤ batch_n/(cap+1)."""
    if len(vc) <= cap:
        return vc
    cut = vc.sort_values(ascending=False, kind="stable").iloc[cap]
    out = vc - cut
    return out[out > 0]


def heavy_hitter_users(sf_dir: str):
    """Exact heavy hitters: users with ≥ ceil(n/128) of all events, found
    WITHOUT shuffling the full user key space.

    Pass 1 (sketch): each batch emits a ≤192-row Misra-Gries residual
    summary (vectorized value_counts + one subtraction). Summed residuals
    undercount any key by at most n/193, so every true ≥n/128 key clears
    the slack-adjusted candidate bar — a guaranteed superset, O(192 ×
    blocks) rows total. Pass 2 (verify): exact per-batch counts restricted
    to the broadcast candidate set, folded to exact totals; the output is
    EXACT, which is what makes the plain GROUP BY/HAVING SQL oracle valid.
    """
    import pyarrow.parquet as pq

    import ray

    n_total = pq.ParquetFile(f"{sf_dir}/events.parquet").metadata.num_rows
    threshold = -(-n_total // HH_PHI_INV)  # ceil
    slack = n_total // (HH_CAP + 1)

    ds = C.read(sf_dir, "events", ["user_id"])

    def mg_partial(b: pd.DataFrame) -> pd.DataFrame:
        vc = _mg_summary(b["user_id"].value_counts(), HH_CAP)
        return pd.DataFrame(
            {
                "user_id": vc.index.to_numpy(),
                "n": vc.to_numpy().astype("int64"),
            }
        )

    summaries = ds.map_batches(mg_partial, batch_format="pandas").to_pandas()
    folded = summaries.groupby("user_id")["n"].sum()
    candidates = folded[folded >= threshold - slack].index.to_numpy()

    empty = pd.DataFrame(
        {
            "user_id": pd.Series(dtype="int64"),
            "n": pd.Series(dtype="int64"),
        }
    )
    if len(candidates) == 0:
        return empty

    ref = ray.put(frozenset(candidates.tolist()))

    class ExactCount:
        def __init__(self):
            self.cand = ray.get(ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            u = b["user_id"]
            vc = u[u.isin(self.cand)].value_counts()
            return pd.DataFrame(
                {
                    "user_id": vc.index.to_numpy(),
                    "n": vc.to_numpy().astype("int64"),
                }
            )

    exact = (
        ds.map_batches(ExactCount, batch_format="pandas", concurrency=(1, 4))
        .to_pandas()
    )
    if len(exact) == 0:
        return empty
    tot = exact.groupby("user_id", as_index=False)["n"].sum()
    out = tot[tot["n"] >= threshold].reset_index(drop=True)
    out["user_id"] = out["user_id"].astype("int64")
    out["n"] = out["n"].astype("int64")
    return out[["user_id", "n"]]


HH_SQL = f"""
SELECT user_id, count(*) AS n
FROM events
GROUP BY user_id
HAVING count(*) * {HH_PHI_INV} >= (SELECT count(*) FROM events)
"""


# -- quantile-histogram sketch (DDSketch-shaped, integer-exact buckets) ------
#
# the sketch path the exact-quantiles operator documents for UNBOUNDED
# groups: factor-2 log buckets keyed by the bit length of the value in
# cents — integer-exact on both engines (numpy frexp / DuckDB length(bin)),
# so the register table is SQL-oracle-checkable cell by cell. Mergeable:
# union of two corpora = elementwise sum of (n, sum_cents) per bucket.
# The per-bucket sum lets the estimator answer inside the bucket with the
# bucket mean, so the relative error is bounded by the bucket width (≤2×)
# and in practice far tighter.


def value_quantile_sketch(sf_dir: str):
    """Bounded-state quantile registers over ``events.value``: one row per
    occupied factor-2 bucket with (n, sum_cents). Each batch collapses to
    ≤64 partial rows inside ``map_batches``; a tiny bounded-key groupby
    folds them — O(64 × blocks) shuffled rows at any corpus size."""
    from ray.data.aggregate import Sum

    ds = C.read(sf_dir, "events", ["value"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(b["value"].to_numpy() * 100.0).astype(np.int64)
        bitlen = np.frexp(np.maximum(cents, 0).astype("float64"))[1]
        bucket = np.where(cents <= 0, 0, bitlen).astype("int64")
        df = pd.DataFrame({"bucket": bucket, "cents": cents})
        g = df.groupby("bucket", as_index=False)["cents"].agg(["count", "sum"])
        return pd.DataFrame(
            {
                "bucket": g["bucket"].astype("int64"),
                "n": g["count"].astype("int64"),
                "sum_cents": g["sum"].astype("int64"),
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("bucket")
        .aggregate(
            Sum("n", alias_name="n"), Sum("sum_cents", alias_name="sum_cents")
        )
        .to_pandas()
    )
    for c in ("bucket", "n", "sum_cents"):
        out[c] = out[c].astype("int64")
    return out[["bucket", "n", "sum_cents"]]


def quantile_sketch_estimate(registers: pd.DataFrame, q: float) -> float:
    """Driver-side O(buckets) fold: walk the cumulative counts to the
    bucket holding rank q·n, answer with that bucket's mean (in the
    original value units). Error ≤ the bucket's factor-2 width."""
    r = registers.sort_values("bucket")
    n = r["n"].to_numpy()
    target = q * n.sum()
    i = int(np.searchsorted(np.cumsum(n), target))
    i = min(i, len(r) - 1)
    return float(r["sum_cents"].to_numpy()[i] / n[i] / 100.0)


QSKETCH_SQL = """
WITH c AS (
    SELECT CAST(floor(value * 100) AS BIGINT) AS cents FROM events
), b AS (
    SELECT CASE WHEN cents <= 0 THEN 0 ELSE length(bin(cents)) END AS bucket,
           cents
    FROM c
)
SELECT CAST(bucket AS BIGINT) AS bucket, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(cents) AS BIGINT) AS sum_cents
FROM b GROUP BY bucket
"""


# -- count-min sketch registers ----------------------------------------------

CMS_W = 512  # slots per depth
CMS_D = 4    # independent hash rows
# data-independent affine family over the poly-hash (fixed seed: part of
# the format spec, mirrored as literals in the SQL oracle)
CMS_A, CMS_C = H._family(777, CMS_D)


def cms_point_estimate(registers: pd.DataFrame, key: str) -> int:
    """CMS point query: min over depths of the key's cell — always an
    OVERcount (one-sided error ≤ 2n/W per depth w.h.p.)."""
    # exact python-int math: numpy 1.x promotes uint64 SCALAR % python-int
    # to float64 (losing low bits above 2^53); the array path in
    # cms_registers stays uint64 and is exact
    h = int(H.poly_hash(np.asarray([key], dtype=object))[0])
    est = None
    for d in range(CMS_D):
        slot = ((h * int(CMS_A[d]) + int(CMS_C[d])) % int(H.P)) % CMS_W
        cell = registers[
            (registers["depth"] == d) & (registers["slot"] == slot)
        ]["n"]
        v = int(cell.iloc[0]) if len(cell) else 0
        est = v if est is None else min(est, v)
    return est


def cms_registers(sf_dir: str):
    """Count-min sketch register table for per-user event frequencies:
    ≤ ``CMS_D × CMS_W`` rows of (depth, slot, n) — the mergeable
    approximate-counting sketch that pairs with the HLL registers (distinct
    count) and the exact heavy-hitter pass (top keys). Scale shape: each
    batch collapses to ≤2048 partial rows via ``bincount`` inside
    ``map_batches``, then one bounded-key groupby-sum merges them — the
    shuffle moves O(2048 × blocks) rows, never O(distinct users). Union of
    two corpora = elementwise sum of registers. The registers are EXACT
    counts of hash cells (the approximation is only in point queries, see
    :func:`cms_point_estimate`), which is what makes the SQL oracle exact:
    DuckDB recomputes every cell from the portable poly-hash literals."""
    ds = C.read(sf_dir, "events", ["user_id"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        h = H.poly_hash(b["user_id"].astype("string").to_numpy(dtype=object))
        frames = []
        for d in range(CMS_D):
            # h, a < P < 2^31 → product < 2^62: exact in uint64
            slot = ((h * CMS_A[d] + CMS_C[d]) % H.P) % np.uint64(CMS_W)
            n = np.bincount(slot.astype(np.int64), minlength=CMS_W)
            nz = np.flatnonzero(n)
            frames.append(
                pd.DataFrame(
                    {
                        "depth": np.full(len(nz), d, np.int64),
                        "slot": nz.astype(np.int64),
                        "n": n[nz].astype(np.int64),
                    }
                )
            )
        return pd.concat(frames, ignore_index=True)

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["depth", "slot"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    for c in ("depth", "slot", "n"):
        out[c] = out[c].astype("int64")
    return out[["depth", "slot", "n"]]


def _cms_depth_sql(d: int) -> str:
    return (
        f"SELECT {d} AS depth, "
        f"((h * {int(CMS_A[d])} + {int(CMS_C[d])}) % {H.P}) % {CMS_W} AS slot "
        f"FROM h"
    )


CMS_SQL = (
    f"WITH h AS (SELECT {H.sql_poly('CAST(user_id AS VARCHAR)')} AS h "
    "FROM events),\n"
    "s AS (" + "\n     UNION ALL ".join(_cms_depth_sql(d) for d in range(CMS_D))
    + ")\n"
    "SELECT CAST(depth AS BIGINT) AS depth, CAST(slot AS BIGINT) AS slot,\n"
    "       CAST(count(*) AS BIGINT) AS n\n"
    "FROM s GROUP BY depth, slot"
)


# -- sketch-driven balanced range layout ------------------------------------

NRANGES = 8
RANGE_LAYOUT_VERSION = 1


def _range_fingerprint(sf_dir: str) -> str:
    import hashlib
    import os

    st = os.stat(os.path.join(sf_dir, "events.parquet"))
    key = (
        f"v{RANGE_LAYOUT_VERSION}:{os.path.abspath(sf_dir)}:{st.st_size}:"
        f"{st.st_mtime_ns}:{NRANGES}"
    )
    return hashlib.sha256(key.encode()).hexdigest()[:16]


def range_layout(sf_dir: str, root: str = "/tmp/raycdc-range") -> str:
    """Build-once (atomic-publish, concurrent-safe) hive-partitioned
    BALANCED RANGE layout of the events table keyed by ``value`` — the
    shuffle-free range partitioner a sorted/clustered lake write needs at
    scale. Pass 1 is the bounded-state quantile sketch (≤64 registers,
    one streaming pass — no sample gather, no sort); the driver folds the
    registers into a bucket → range map by cumulative position:
    ``range_id = ((cum_n − 1) · NRANGES) // total`` — integer-exact, so
    the SQL oracle recomputes the identical mapping. Pass 2 stamps each
    row's range (broadcast ≤64-entry map) and writes
    ``write_parquet(partition_cols=['range_id'])``. Balance is
    bucket-granular by design: a single hot factor-2 bucket cannot split
    (the documented sketch trade-off)."""
    import os
    import shutil

    import ray

    from raycdc.gen import atomic_publish

    out_dir = os.path.join(root, _range_fingerprint(sf_dir))
    if os.path.exists(os.path.join(out_dir, "_DONE")):
        return out_dir

    reg = value_quantile_sketch(sf_dir).sort_values("bucket")
    n = reg["n"].to_numpy(np.int64)
    cum = np.cumsum(n)
    rid = (cum - 1) * NRANGES // cum[-1]
    bmap = dict(zip(reg["bucket"].astype(int), rid.astype(int)))
    ref = ray.put(bmap)

    stage = f"{out_dir}.stage-{os.getpid()}"
    shutil.rmtree(stage, ignore_errors=True)
    os.makedirs(stage, exist_ok=True)

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        import ray as _r

        bm = _r.get(ref)
        cents = np.floor(b["value"].to_numpy() * 100.0).astype(np.int64)
        bitlen = np.frexp(np.maximum(cents, 0).astype("float64"))[1]
        bucket = np.where(cents <= 0, 0, bitlen).astype("int64")
        b = b.copy()
        b["range_id"] = pd.Series(bucket).map(bm).astype("int64").to_numpy()
        return b

    C.read(sf_dir, "events").map_batches(
        assign, batch_format="pandas"
    ).write_parquet(stage, partition_cols=["range_id"])
    with open(os.path.join(stage, "_DONE"), "w") as f:
        f.write("ok")
    return atomic_publish(stage, out_dir)


def events_range_layout(sf_dir: str):
    """Occupancy of the persisted balanced range layout: (range_id,
    n_rows) per range directory, read from parquet FOOTERS only
    (metadata — zero data IO), the stats-read every partitioned lake
    supports. The oracle recomputes the bucket → range map in SQL from
    the same integer register law."""
    import os

    import pyarrow.parquet as pq

    lay = range_layout(sf_dir)
    rows = []
    for name in sorted(os.listdir(lay)):
        if not name.startswith("range_id="):
            continue
        d = os.path.join(lay, name)
        cnt = sum(
            pq.ParquetFile(os.path.join(d, f)).metadata.num_rows
            for f in os.listdir(d)
            if f.endswith(".parquet")
        )
        rows.append((int(name.split("=", 1)[1]), cnt))
    return pd.DataFrame(
        {
            "range_id": pd.Series([r[0] for r in rows], dtype="int64"),
            "n_rows": pd.Series([r[1] for r in rows], dtype="int64"),
        }
    )


RANGE_LAYOUT_SQL = f"""
WITH c AS (
    SELECT CAST(floor(value * 100) AS BIGINT) AS cents FROM events
), b AS (
    SELECT CASE WHEN cents <= 0 THEN 0 ELSE length(bin(cents)) END AS bucket
    FROM c
), reg AS (
    SELECT bucket, count(*) AS n FROM b GROUP BY bucket
), m AS (
    SELECT bucket, n,
           CAST((sum(n) OVER (ORDER BY bucket) - 1) * {NRANGES}
                // (SELECT sum(n) FROM reg) AS BIGINT) AS range_id
    FROM reg
)
SELECT range_id, CAST(sum(n) AS BIGINT) AS n_rows
FROM m GROUP BY range_id
"""


QUERIES = {
    "hll_registers": hll_registers,
    "events_range_layout": events_range_layout,
    "hll_daily_users": hll_daily_users,
    "hll_user_overlap": hll_user_overlap,
    "heavy_hitter_users": heavy_hitter_users,
    "cms_registers": cms_registers,
    "value_quantile_sketch": value_quantile_sketch,
}

ORACLE_SQL = {
    "value_quantile_sketch": QSKETCH_SQL,
    "events_range_layout": RANGE_LAYOUT_SQL,
    "hll_registers": HLL_SQL,
    "hll_daily_users": HLL_DAILY_SQL,
    "hll_user_overlap": HLL_OVERLAP_SQL,
    "heavy_hitter_users": HH_SQL,
    "cms_registers": CMS_SQL,
}
