"""Event-analytics operators: two-step funnel, ROLLUP subtotals, fixed-width
histogram, weekly cohort retention.

Reference analog: the period/daily aggregate SQL jobs
(``indexer/aggr_jobs/order_jobs/period_wallet_addresses_aggregates.sql``,
``indexer/aggr_jobs/disorder_jobs/daily_*``) which compute exactly these
shapes (first-seen cohorts, per-period rollups, bucketed distributions) as
warehouse SQL — re-expressed as Ray Data combiner pipelines.

Scale shapes used here (see each docstring):
  * bounded-key aggregates (rollup, histogram) = per-batch partial rows
    folded on the driver — O(groups × blocks) movement, no shuffle;
  * unbounded-key aggregates (funnel: per-user) = per-batch partials then a
    native Ray hash-shuffle ``groupby().aggregate(Min/Max)`` over already
    REDUCED rows (one row per user per block) — the combiner halves the
    exchange and the native aggregate is vectorized, never per-group Python;
  * retention = ``by_partition(user_id)`` so each user's history is
    co-located, ONE vectorized kernel per bounded partition, partial
    (cohort, offset) counts summed on the driver (users are disjoint across
    partitions, so partial counts add exactly).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.compute as pc
import pyarrow.dataset as pads

from ray.data.aggregate import Max, Min

from raycdc.queries import common as C

_US_WEEK = 604_800_000_000  # microseconds per week

# int64 sentinels for "no such event" so Ray's native Min/Max aggregates
# (which are null-averse across block boundaries) stay on dense int64
_NO_MIN = np.iinfo("int64").max
_NO_MAX = np.int64(-1)


# -- two-step funnel: first signup → any later purchase ----------------------

def events_funnel(sf_dir: str):
    """Users whose LAST ``purchase`` is strictly after their FIRST
    ``signup`` (the classic two-step funnel reduces to two per-user
    extremes: max(purchase ts) > min(signup ts)).

    Scale shape: both event types are pruned AT THE READ (predicate
    pushdown), each batch collapses to one (min_signup, max_purchase) row
    per user seen in that batch, and the per-user fold is a native
    ``groupby().aggregate(Min/Max)`` hash shuffle over those reduced rows —
    fine at any user cardinality because the aggregate is vectorized
    (no per-group Python callable anywhere)."""
    ds = C.read(
        sf_dir,
        "events",
        ["user_id", "event_type", "ts"],
        filter=pads.field("event_type").isin(["signup", "purchase"]),
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        us = b["ts"].astype("datetime64[us]").to_numpy().view("int64")
        sign = np.where(b["event_type"].to_numpy() == "signup", us, _NO_MIN)
        buy = np.where(b["event_type"].to_numpy() == "purchase", us, _NO_MAX)
        df = pd.DataFrame({"user_id": b["user_id"], "s": sign, "p": buy})
        return df.groupby("user_id", as_index=False).agg(
            s=("s", "min"), p=("p", "max")
        )

    folded = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("user_id")
        .aggregate(Min("s", alias_name="s"), Max("p", alias_name="p"))
        .to_pandas()
    )
    hit = folded[(folded["s"] != _NO_MIN) & (folded["p"] > folded["s"])]
    out = pd.DataFrame(
        {
            "user_id": hit["user_id"].astype("int64"),
            "first_signup": hit["s"].astype("datetime64[us]"),
            "last_purchase": hit["p"].astype("datetime64[us]"),
        }
    )
    return out.reset_index(drop=True)


FUNNEL_SQL = """
SELECT user_id,
       min(CASE WHEN event_type = 'signup' THEN ts END)   AS first_signup,
       max(CASE WHEN event_type = 'purchase' THEN ts END) AS last_purchase
FROM events
GROUP BY user_id
HAVING min(CASE WHEN event_type = 'signup' THEN ts END) IS NOT NULL
   AND max(CASE WHEN event_type = 'purchase' THEN ts END)
     > min(CASE WHEN event_type = 'signup' THEN ts END)
"""


# -- ROLLUP subtotals over (event_type, day) ---------------------------------

def events_rollup(sf_dir: str):
    """GROUP BY ROLLUP(event_type, day): the finest grain plus per-type and
    grand-total subtotal rows ('ALL' sentinel instead of SQL NULL so the
    value-hash compare is total-order-stable).

    Scale shape: the finest grain is BOUNDED (types × days), so each batch
    emits ≤ groups partial rows and the driver folds O(groups × blocks)
    rows; the coarser rollup levels are derived from the folded finest
    grain (a pure driver-side re-aggregation of an already-tiny table) —
    no shuffle at any level."""
    ds = C.read(sf_dir, "events", ["event_type", "ts", "value"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "event_type": b["event_type"],
                "day": b["ts"].dt.strftime("%Y-%m-%d"),
                "n": np.int64(1),
                "sum_value": b["value"],
            }
        )
        return df.groupby(["event_type", "day"], as_index=False).agg(
            n=("n", "sum"), sum_value=("sum_value", "sum")
        )

    fine = (
        ds.map_batches(partial, batch_format="pandas")
        .to_pandas()
        .groupby(["event_type", "day"], as_index=False)
        .sum()
    )
    by_type = fine.groupby("event_type", as_index=False).agg(
        n=("n", "sum"), sum_value=("sum_value", "sum")
    )
    by_type["day"] = "ALL"
    total = pd.DataFrame(
        {
            "event_type": ["ALL"],
            "day": ["ALL"],
            "n": [fine["n"].sum()],
            "sum_value": [fine["sum_value"].sum()],
        }
    )
    out = pd.concat([fine, by_type, total], ignore_index=True)
    out["n"] = out["n"].astype("int64")
    out = out[["event_type", "day", "n", "sum_value"]]
    return C.round_cols(out, ["sum_value"])


ROLLUP_SQL = """
WITH b AS (
    SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, value FROM events
)
SELECT COALESCE(event_type, 'ALL') AS event_type,
       COALESCE(day, 'ALL')        AS day,
       count(*)                    AS n,
       round(sum(value), 4)        AS sum_value
FROM b
GROUP BY ROLLUP (event_type, day)
"""


# -- fixed-width value histogram ---------------------------------------------

_BIN_W = 25.0


def events_value_histogram(sf_dir: str):
    """Fixed-width histogram of ``value`` (bin = floor(value / 25)): a
    bounded-key aggregate, so per-batch partial counts + a driver fold —
    O(bins × blocks) movement. The bin edge arithmetic is ONE IEEE divide
    + floor on both the numpy and the DuckDB side, so bin assignment is
    bit-identical and the count hash is exact."""
    ds = C.read(sf_dir, "events", ["value"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        bins = np.floor(b["value"].to_numpy() / _BIN_W).astype("int64")
        vc = pd.Series(bins).value_counts()
        return pd.DataFrame(
            {"bin": vc.index.to_numpy(), "n": vc.to_numpy().astype("int64")}
        )

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    out = parts.groupby("bin", as_index=False)["n"].sum()
    out["lo"] = out["bin"].astype("float64") * _BIN_W
    out["n"] = out["n"].astype("int64")
    return out[["bin", "lo", "n"]]


HISTOGRAM_SQL = f"""
SELECT CAST(floor(value / {_BIN_W}) AS BIGINT)        AS bin,
       floor(value / {_BIN_W}) * {_BIN_W}             AS lo,
       count(*)                                       AS n
FROM events
GROUP BY 1, 2
"""


# -- weekly cohort retention ---------------------------------------------------

def user_retention_cohorts(sf_dir: str):
    """Cohort retention matrix: users grouped by their first active week
    (epoch-week index — integer microseconds // one week, identical
    arithmetic both sides, no week-start convention to disagree on), counted
    in each later week offset they were active.

    Scale shape: ``by_partition(user_id)`` co-locates each user's full
    history in one bounded partition; ONE vectorized kernel per partition
    dedups (user, week), computes the per-user cohort with a C-speed
    ``groupby().transform('min')``, and emits partial (cohort, offset)
    counts. Users are DISJOINT across partitions, so the driver's final
    fold of O(weeks² × partitions) tiny partials sums to exact distinct-user
    counts — no count-distinct shuffle."""
    ds = C.read(sf_dir, "events", ["user_id", "ts"])

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        week = (
            g["ts"].astype("datetime64[us]").to_numpy().view("int64") // _US_WEEK
        )
        uw = pd.DataFrame(
            {"user_id": g["user_id"].to_numpy(), "week": week}
        ).drop_duplicates()
        cohort = uw.groupby("user_id")["week"].transform("min")
        mat = pd.DataFrame(
            {"cohort_week": cohort, "week_offset": uw["week"] - cohort}
        )
        out = mat.groupby(["cohort_week", "week_offset"], as_index=False).size()
        return out.rename(columns={"size": "n_users"})

    parts = C.by_partition(ds, "user_id", kernel).to_pandas()
    out = parts.groupby(["cohort_week", "week_offset"], as_index=False)[
        "n_users"
    ].sum()
    out["cohort_week"] = out["cohort_week"].astype("int64")
    out["week_offset"] = out["week_offset"].astype("int64")
    out["n_users"] = out["n_users"].astype("int64")
    return out


RETENTION_SQL = f"""
WITH uw AS (
    SELECT DISTINCT user_id, epoch_us(ts) // {_US_WEEK} AS week FROM events
), c AS (
    SELECT user_id, week, min(week) OVER (PARTITION BY user_id) AS cohort
    FROM uw
)
SELECT cohort AS cohort_week, week - cohort AS week_offset,
       count(*) AS n_users
FROM c GROUP BY 1, 2
"""


# -- CUBE over (event_type, day) ----------------------------------------------

def events_cube(sf_dir: str):
    """GROUP BY CUBE(event_type, day): all four grouping sets — the finest
    grain, per-type, per-day, and the grand total ('ALL' sentinel instead
    of SQL NULL so the value-hash compare is total-order-stable). Extends
    :func:`events_rollup` with the day-only set that ROLLUP omits.

    Scale shape: identical to the rollup — the finest grain is BOUNDED
    (types × days), ONE distributed pass emits per-batch partial rows,
    and every coarser set is a driver-side re-aggregation of the folded
    finest grain (provably exact: count and sum are distributive over the
    partition of rows by the finest grain). No shuffle at any level."""
    ds = C.read(sf_dir, "events", ["event_type", "ts", "value"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "event_type": b["event_type"],
                "day": b["ts"].dt.strftime("%Y-%m-%d"),
                "n": np.int64(1),
                "sum_value": b["value"],
            }
        )
        return df.groupby(["event_type", "day"], as_index=False).agg(
            n=("n", "sum"), sum_value=("sum_value", "sum")
        )

    fine = (
        ds.map_batches(partial, batch_format="pandas")
        .to_pandas()
        .groupby(["event_type", "day"], as_index=False)
        .sum()
    )

    def coarse(keys: list[str]) -> pd.DataFrame:
        g = fine.groupby(keys, as_index=False).agg(
            n=("n", "sum"), sum_value=("sum_value", "sum")
        )
        for col in ("event_type", "day"):
            if col not in keys:
                g[col] = "ALL"
        return g

    total = pd.DataFrame(
        {
            "event_type": ["ALL"],
            "day": ["ALL"],
            "n": [fine["n"].sum()],
            "sum_value": [fine["sum_value"].sum()],
        }
    )
    out = pd.concat(
        [fine, coarse(["event_type"]), coarse(["day"]), total],
        ignore_index=True,
    )
    out["n"] = out["n"].astype("int64")
    out = out[["event_type", "day", "n", "sum_value"]]
    return C.round_cols(out, ["sum_value"])


CUBE_SQL = """
WITH b AS (
    SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, value FROM events
)
SELECT COALESCE(event_type, 'ALL') AS event_type,
       COALESCE(day, 'ALL')        AS day,
       count(*)                    AS n,
       round(sum(value), 4)        AS sum_value
FROM b
GROUP BY CUBE (event_type, day)
"""


# -- trailing-24h sliding-window distinct users --------------------------------

_WINDOW_H = 24


def events_sliding_distinct(sf_dir: str):
    """Trailing-24-hour DISTINCT active users per active hour — the
    sliding-window COUNT(DISTINCT) class (DAU-style health metrics) that
    naive plans answer with a per-anchor distinct over a re-scanned window
    (24× re-read) or a giant `COUNT(DISTINCT) OVER RANGE` single-node sort.

    Scale shape: distinct-ness first collapses to (user, hour) PAIRS inside
    each batch (≤ one row per pair per block); ``by_partition(user_id)``
    co-locates each user's pairs so the window expansion is per-user-exact
    with NO cross-partition distinct needed — each pair fans out to the ≤24
    ACTIVE anchor hours it covers (anchors are the globally-observed active
    hours, O(corpus span), gathered in one tiny pre-pass and shipped in the
    task closure), pairs are deduped per (user, anchor) inside the
    partition, and the partition emits O(anchors) partial counts. Users are
    disjoint across partitions → the driver fold of O(anchors × partitions)
    tiny rows sums to exact distinct counts. Hour arithmetic is integer
    microseconds // 3.6e9 on both sides — no timezone/convention drift."""
    _US_H = 3_600_000_000
    ds = C.read(sf_dir, "events", ["user_id", "ts"])

    def hours_partial(b: pd.DataFrame) -> pd.DataFrame:
        h = b["ts"].astype("datetime64[us]").to_numpy().view("int64") // _US_H
        return pd.DataFrame({"h": np.unique(h)})

    anchors = np.sort(
        ds.map_batches(hours_partial, batch_format="pandas")
        .to_pandas()["h"]
        .unique()
    )  # O(active hours) — bounded by corpus span, not corpus size

    def pairs_partial(b: pd.DataFrame) -> pd.DataFrame:
        h = b["ts"].astype("datetime64[us]").to_numpy().view("int64") // _US_H
        df = pd.DataFrame({"user_id": b["user_id"].astype("int64"), "h": h})
        return df.drop_duplicates()

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["user_id", "h"])
        u = d["user_id"].to_numpy()
        h = d["h"].to_numpy()
        lo = np.searchsorted(anchors, h, side="left")
        hi = np.searchsorted(anchors, h + _WINDOW_H - 1, side="right")
        counts = hi - lo
        total = int(counts.sum())
        if total == 0:
            return pd.DataFrame(
                {"hour_idx": pd.Series(dtype="int64"),
                 "n_users": pd.Series(dtype="int64")}
            )
        # concatenated per-row aranges: anchor indices covered by each pair
        off = np.cumsum(counts)
        aidx = np.arange(total) - np.repeat(off - counts, counts) + np.repeat(
            lo, counts
        )
        ur = np.repeat(u, counts)
        # dedup (user, anchor): a user active in several hours of one
        # window must count once
        order = np.lexsort((aidx, ur))
        ur, aidx = ur[order], aidx[order]
        first = np.ones(total, bool)
        first[1:] = (ur[1:] != ur[:-1]) | (aidx[1:] != aidx[:-1])
        cnt = np.bincount(aidx[first], minlength=len(anchors))
        nz = np.nonzero(cnt)[0]
        return pd.DataFrame(
            {"hour_idx": anchors[nz], "n_users": cnt[nz].astype("int64")}
        )

    parts = C.by_partition(
        ds.map_batches(pairs_partial, batch_format="pandas"), "user_id", kernel
    ).to_pandas()
    out = parts.groupby("hour_idx", as_index=False)["n_users"].sum()
    out["hour_idx"] = out["hour_idx"].astype("int64")
    out["n_users"] = out["n_users"].astype("int64")
    return out.sort_values("hour_idx").reset_index(drop=True)


SLIDING_DISTINCT_SQL = f"""
WITH p AS (
    SELECT DISTINCT user_id, epoch_us(ts) // 3600000000 AS h FROM events
), a AS (
    SELECT DISTINCT h AS anchor FROM p
), w AS (
    SELECT DISTINCT a.anchor, p.user_id
    FROM a JOIN p ON p.h BETWEEN a.anchor - {_WINDOW_H - 1} AND a.anchor
)
SELECT anchor AS hour_idx, count(*) AS n_users
FROM w GROUP BY anchor ORDER BY anchor
"""


# -- geometric-decay weighted value features (16-lag EWMA numerator) -----------

_DECAY_LAGS = 16


def events_value_decay(sf_dir: str):
    """Per-event geometric-decay feature over the user's trailing 16 events
    (the recency-weighted spend signal feature pipelines feed to models —
    an exact, windowed stand-in for the inherently sequential EWMA
    recurrence). For event i of a user (ordered by ts, event_id):

        decay_num = Σ_{{j=0..15}} cents[i−j] · 2^(15−j)   (existing lags)
        decay_den = Σ_{{j=0..15}} 2^(15−j)                 (existing lags)

    so decay_num/decay_den is the weight-halving average, but BOTH are
    exact int64 (cents ≤ ~1e7 × 2^15 × 16 ≪ 2^63) → hash-stable with no
    float law. The fixed window makes it vectorizable where the infinite
    EWMA recurrence is not: the kernel is 16 SHIFTED-ARRAY adds per
    bounded user partition (a loop over LAGS, never over rows), with the
    user boundary masked by the shifted user array."""
    ds = C.read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        u = d["user_id"].to_numpy()
        c = np.round(d["value"].to_numpy() * 100).astype(np.int64)
        n = len(d)
        num = np.zeros(n, np.int64)
        den = np.zeros(n, np.int64)
        for j in range(_DECAY_LAGS):
            w = np.int64(1) << (_DECAY_LAGS - 1 - j)
            if j == 0:
                num += c * w
                den += w
                continue
            if j >= n:
                break
            valid = u[j:] == u[:-j]  # lag stays inside the user's run
            num[j:] += np.where(valid, c[:-j], 0) * w
            den[j:] += np.where(valid, w, 0)
        return pd.DataFrame(
            {
                "event_id": d["event_id"].astype("int64").to_numpy(),
                "user_id": u.astype("int64"),
                "decay_num": num,
                "decay_den": den,
            }
        )

    out = C.by_partition(ds, "user_id", kernel).to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


def _decay_sql() -> str:
    terms_num, terms_den = [], []
    for j in range(_DECAY_LAGS):
        w = 1 << (_DECAY_LAGS - 1 - j)
        lag = "c" if j == 0 else f"lag(c, {j}) OVER w"
        terms_num.append(f"COALESCE({lag}, 0) * {w}")
        terms_den.append(f"CASE WHEN {lag} IS NOT NULL THEN {w} ELSE 0 END")
    return f"""
WITH o AS (
    SELECT event_id, user_id, ts,
           CAST(round(value * 100) AS BIGINT) AS c
    FROM events
)
SELECT CAST(event_id AS BIGINT) AS event_id,
       CAST(user_id AS BIGINT)  AS user_id,
       CAST({' + '.join(terms_num)} AS BIGINT) AS decay_num,
       CAST({' + '.join(terms_den)} AS BIGINT) AS decay_den
FROM o
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY event_id
"""


QUERIES = {
    "events_funnel": events_funnel,
    "events_rollup": events_rollup,
    "events_cube": events_cube,
    "events_value_histogram": events_value_histogram,
    "user_retention_cohorts": user_retention_cohorts,
    "events_sliding_distinct": events_sliding_distinct,
    "events_value_decay": events_value_decay,
}

ORACLE_SQL = {
    "events_sliding_distinct": SLIDING_DISTINCT_SQL,
    "events_value_decay": _decay_sql(),
    "events_funnel": FUNNEL_SQL,
    "events_rollup": ROLLUP_SQL,
    "events_cube": CUBE_SQL,
    "events_value_histogram": HISTOGRAM_SQL,
    "user_retention_cohorts": RETENTION_SQL,
}
