"""Stream-shaped operators over the ``events`` table: guarded-LWW latest
state (the CDC merge kernel expressed relationally), hourly bucketing,
daily per-entity aggregates, and gap-based sessionization.

Parity targets in /root/reference: the arg-max-by-cursor reducer
(`indexer/utils/collection_utils.py:8-19`,
`indexer/jobs/export_token_balances_job.py:66-86`), the hourly block-ts
mapper (`indexer/jobs/export_blocks_job.py:105-113`), and the daily wallet
aggregates (`indexer/aggr_jobs/disorder_jobs/daily_wallet_addresses_aggregates.sql`).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Count, Max, Mean, Min, Sum

from raycdc.queries import common as C

EVENT_COLS = ["event_id", "ts", "user_id", "event_type", "value"]


# -- latest event per user: the LWW upsert kernel as a query ---------------

def events_latest_per_user(sf_dir: str):
    """Per-user arg-max by (ts, event_id) — exactly the per-key guarded-LWW
    fold the CDC merger applies, so this query is the SQL-checkable witness
    for the merge kernel. Scale shape: a per-batch combiner (sort + keep
    last per user, vectorized) shrinks the stream to ≤ one row per (batch,
    user) BEFORE the shuffle, then a bounded-partition vectorized argmax —
    never one Python call per user (near-unique keys at corpus scale)."""
    ds = C.read(sf_dir, "events", EVENT_COLS)

    def keep_last(b: pd.DataFrame) -> pd.DataFrame:
        return b.sort_values(
            ["user_id", "ts", "event_id"], kind="stable"
        ).drop_duplicates("user_id", keep="last")

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        last = keep_last(g)
        return pd.DataFrame(
            {
                "user_id": last["user_id"].to_numpy(),
                "last_event_id": last["event_id"].to_numpy(),
                "last_event_type": last["event_type"].to_numpy(),
                "last_value": last["value"].round(C.ROUND_DIGITS).to_numpy(),
                "last_ts": last["ts"].to_numpy(),
            }
        )

    partial = ds.map_batches(keep_last, batch_format="pandas")
    return C.by_partition(partial, "user_id", finish)


LATEST_SQL = """
SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
       round(value, 4) AS last_value, ts AS last_ts
FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) WHERE rn = 1
"""


# -- hourly bucket stats (block-ts mapper analog) --------------------------

def events_hourly_stats(sf_dir: str):
    ds = C.read(sf_dir, "events", ["event_id", "ts", "value"])

    def bucket(t: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(t.column("ts"), unit="hour")
        return t.append_column("hour", hour)

    out = (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby("hour")
        .aggregate(
            Count(alias_name="n_events"),
            Min("event_id", alias_name="first_event_id"),
            Sum("value", alias_name="sum_value"),
        )
        .to_pandas()
    )
    return C.round_cols(out, ["sum_value"])


HOURLY_SQL = """
SELECT date_trunc('hour', ts) AS hour, count(*) AS n_events,
       min(event_id) AS first_event_id, round(sum(value), 4) AS sum_value
FROM events GROUP BY 1
"""


# -- daily per-user aggregates (daily wallet aggregates analog) ------------

def events_user_daily(sf_dir: str):
    ds = C.read(sf_dir, "events", ["ts", "user_id", "event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        day = pc.floor_temporal(t.column("ts"), unit="day")
        purchase = pc.cast(pc.equal(t.column("event_type"), "purchase"), pa.int64())
        return (
            t.select(["user_id", "value"])
            .append_column("day", day)
            .append_column("n_purchases", purchase)
        )

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["user_id", "day"])
        .aggregate(
            Count(alias_name="n_events"),
            Sum("n_purchases", alias_name="n_purchases"),
            Sum("value", alias_name="sum_value"),
        )
        .to_pandas()
    )
    return C.round_cols(out, ["sum_value"])


USER_DAILY_SQL = """
SELECT user_id, date_trunc('day', ts) AS day, count(*) AS n_events,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases,
       round(sum(value), 4) AS sum_value
FROM events GROUP BY 1, 2
"""


# -- per-type aggregate ----------------------------------------------------

def events_type_stats(sf_dir: str):
    out = (
        C.read(sf_dir, "events", ["event_type", "value"])
        .groupby("event_type")
        .aggregate(
            Count(alias_name="n"),
            Sum("value", alias_name="sum_value"),
            Mean("value", alias_name="avg_value"),
            Max("value", alias_name="max_value"),
        )
        .to_pandas()
    )
    return C.round_cols(out, ["sum_value", "avg_value", "max_value"])


TYPE_STATS_SQL = """
SELECT event_type, count(*) AS n, round(sum(value), 4) AS sum_value,
       round(avg(value), 4) AS avg_value, round(max(value), 4) AS max_value
FROM events GROUP BY event_type
"""


# -- gap sessionization (streaming window over an ordered partition) -------

SESSION_GAP_MIN = 30


def events_sessionize(sf_dir: str):
    """Session windows per user with a 30-minute inactivity gap, computed
    over bounded partitions (all events of a user co-located): one sort by
    (user, ts, event_id) per partition, session breaks as a vectorized
    boolean cumsum (a new user OR a >gap jump starts a session), per-user
    session numbering by ffill of the counter at each user's first row,
    then a C-speed pandas hash aggregate — zero per-group Python on the
    near-unique user key."""
    ds = C.read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def sessionize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        new_user = g["user_id"].ne(g["user_id"].shift())
        gap = g["ts"].diff() > pd.Timedelta(minutes=SESSION_GAP_MIN)
        new_sess = new_user | gap
        counter = new_sess.cumsum()
        first_of_user = counter.where(new_user).ffill()
        g["session_id"] = (counter - first_of_user + 1).astype("int64")
        agg = g.groupby(["user_id", "session_id"], as_index=False).agg(
            n_events=("event_id", "size"),
            start_ts=("ts", "min"),
            end_ts=("ts", "max"),
            sum_value=("value", "sum"),
        )
        agg["sum_value"] = agg["sum_value"].round(C.ROUND_DIGITS)
        return agg

    return C.by_partition(ds, "user_id", sessionize)


# shared by SESSIONIZE_SQL and SESSION_OVERLAP_SQL so the session law can
# never diverge between the two oracles
_SESSIONS_CTES = f"""flagged AS (
    SELECT user_id, event_id, ts, value,
           CASE WHEN ts - lag(ts) OVER w > INTERVAL {SESSION_GAP_MIN} MINUTE
                THEN 1 ELSE 0 END AS new_session
    FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
    SELECT user_id, event_id, ts, value,
           sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) + 1 AS session_id
    FROM flagged
)"""

SESSIONIZE_SQL = f"""
WITH {_SESSIONS_CTES}
SELECT user_id, CAST(session_id AS BIGINT) AS session_id, count(*) AS n_events,
       min(ts) AS start_ts, max(ts) AS end_ts, round(sum(value), 4) AS sum_value
FROM sessions GROUP BY 1, 2
"""


# -- interval-overlap join (grid-bucket replication) ------------------------

# 1-hour grid cells: replication factor = mean session span / cell + 1
OVERLAP_CELL_US = 3_600_000_000


def events_session_overlap(sf_dir: str):
    """For every session, how many OTHER sessions (any user) overlap it in
    time (closed intervals) — the interval-interval join class, which
    neither equi-join nor as-of/range join expresses. Ray shape is the
    canonical distributed interval join: each interval is replicated to
    every grid cell it spans (bounded copies: span/cell + 1), cells
    co-locate via ONE bounded-key shuffle, and inside a cell the counting
    is two searchsorted passes against the cell's sorted endpoint arrays —
    no pair is ever materialized (the output is session-grain, the work is
    Σ per-cell n·log n). Double-count-free by the standard ownership rule:
    pair (i, j) is counted at i exactly once — in bucket(start_i) when
    start_j <= start_i (j covers i's start point, which replication
    guarantees is present there), else in bucket(start_j) (j starts inside
    i, counted where j is native). The DuckDB oracle states the same
    predicate declaratively (its IEJoin materializes the pairs — the
    non-scalable formulation this operator replaces). All-integer output."""
    sess = events_sessionize(sf_dir)

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        s = b["start_ts"].astype("datetime64[us]").astype("int64").to_numpy()
        e = b["end_ts"].astype("datetime64[us]").astype("int64").to_numpy()
        b0, b1 = s // OVERLAP_CELL_US, e // OVERLAP_CELL_US
        reps = (b1 - b0 + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(b)), reps)
        off = np.arange(int(reps.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(reps) - reps, reps
        )
        bucket = b0[idx] + off
        return pd.DataFrame(
            {
                "bucket": bucket,
                "user_id": b["user_id"].to_numpy()[idx].astype(np.int64),
                "session_id": b["session_id"].to_numpy()[idx].astype(np.int64),
                "s": s[idx],
                "e": e[idx],
                "native": (bucket == b0[idx]).astype(np.int8),
            }
        )

    copies = sess.map_batches(explode, batch_format="pandas")

    def count_cell(g: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for _, gb in g.groupby("bucket"):
            s = gb["s"].to_numpy()
            e = gb["e"].to_numpy()
            nat = gb["native"].to_numpy().astype(bool)
            order_s, order_e = np.sort(s), np.sort(e)
            nat_starts = np.sort(s[nat])
            cnt = np.zeros(len(gb), np.int64)
            # ownership case 1 (native copies only): js covering my start
            cnt[nat] = (
                np.searchsorted(order_s, s[nat], "right")
                - np.searchsorted(order_e, s[nat], "left")
                - 1  # self
            )
            # ownership case 2 (every copy): js STARTING inside me, native here
            cnt += np.searchsorted(nat_starts, e, "right") - np.searchsorted(
                nat_starts, s, "right"
            )
            frames.append(
                pd.DataFrame(
                    {
                        "user_id": gb["user_id"].to_numpy(),
                        "session_id": gb["session_id"].to_numpy(),
                        "n": cnt,
                    }
                )
            )
        if not frames:
            return pd.DataFrame(
                {
                    "user_id": pd.Series(dtype="int64"),
                    "session_id": pd.Series(dtype="int64"),
                    "n": pd.Series(dtype="int64"),
                }
            )
        return pd.concat(frames, ignore_index=True)

    per_cell = C.by_partition(copies, "bucket", count_cell)
    out = (
        per_cell.groupby(["user_id", "session_id"])
        .aggregate(Sum("n", alias_name="n_overlap"))
        .to_pandas()
    )
    out["n_overlap"] = out["n_overlap"].astype("int64")
    return out.sort_values(["user_id", "session_id"], kind="stable").reset_index(
        drop=True
    )


SESSION_OVERLAP_SQL = f"""
WITH {_SESSIONS_CTES},
sess AS (
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           min(ts) AS start_ts, max(ts) AS end_ts
    FROM sessions GROUP BY 1, 2
)
SELECT a.user_id, a.session_id, CAST(count(*) - 1 AS BIGINT) AS n_overlap
FROM sess a JOIN sess b
  ON b.start_ts <= a.end_ts AND b.end_ts >= a.start_ts
GROUP BY 1, 2
ORDER BY 1, 2
"""


# -- as-of join (custom operator: Ray Data has none) -----------------------

ASOF_BUCKETS = 8


def events_asof_orders(sf_dir: str):
    """Keyed as-of join: for each event (ts shifted into the order-date
    domain), the latest order in its key bucket with o_orderdate <= ts.
    Ray has no as-of join — composed as: distributed pre-aggregation of the
    right side to unique (bucket, date) rows (deterministic arg-max
    tie-break) → broadcast → vectorized ``pd.merge_asof(by=bucket)`` per
    batch (the guide's documented as-of pattern). DuckDB oracle uses its
    native ASOF LEFT JOIN."""
    import ray

    right = (
        C.read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_orderdate"])
        .map_batches(
            lambda b: pd.DataFrame(
                {
                    "bucket": (b["o_custkey"] % ASOF_BUCKETS).astype("int64"),
                    "o_orderdate": b["o_orderdate"],
                    "o_orderkey": b["o_orderkey"],
                }
            ),
            batch_format="pandas",
        )
        # bounded (buckets x dates) grain: fold per-batch PARTIAL maxes,
        # finish on the tiny driver frame — no shuffle (the native hash
        # aggregate's spin-up dominates at this key-space size)
        .map_batches(
            lambda b: b.groupby(
                ["bucket", "o_orderdate"], as_index=False
            )["o_orderkey"].max(),
            batch_format="pandas",
        )
        .to_pandas()
        .groupby(["bucket", "o_orderdate"], as_index=False)["o_orderkey"]
        .max()
        .sort_values(["o_orderdate", "bucket"], kind="stable")
        .reset_index(drop=True)
    )
    ref = ray.put(right)

    ds = C.read(sf_dir, "events", ["event_id", "ts", "user_id"])

    class AsOf:
        def __init__(self):
            self.right = ray.get(ref).copy()
            self.right["o_orderdate"] = pd.to_datetime(
                self.right["o_orderdate"]
            ).astype("datetime64[ns]")

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            left = pd.DataFrame(
                {
                    "event_id": b["event_id"],
                    "bucket": (b["user_id"] % ASOF_BUCKETS).astype("int64"),
                    # shift event time into the order-date domain
                    "ts_asof": (b["ts"] - pd.DateOffset(years=29)).astype(
                        "datetime64[ns]"
                    ),
                }
            ).sort_values("ts_asof", kind="stable")
            out = pd.merge_asof(
                left,
                self.right,
                left_on="ts_asof",
                right_on="o_orderdate",
                by="bucket",
                direction="backward",
            )
            return pd.DataFrame(
                {
                    "event_id": out["event_id"],
                    "bucket": out["bucket"],
                    "asof_orderkey": out["o_orderkey"],
                    "asof_orderdate": out["o_orderdate"],
                }
            )

    return ds.map_batches(AsOf, batch_format="pandas", concurrency=(1, 4))


ASOF_SQL = f"""
WITH o AS (
    SELECT o_custkey % {ASOF_BUCKETS} AS bucket, o_orderdate,
           max(o_orderkey) AS o_orderkey
    FROM orders GROUP BY 1, 2
), e AS (
    SELECT event_id, user_id % {ASOF_BUCKETS} AS bucket,
           ts - INTERVAL 29 YEAR AS ts_asof
    FROM events
)
SELECT e.event_id, e.bucket, o.o_orderkey AS asof_orderkey,
       o.o_orderdate AS asof_orderdate
FROM e ASOF LEFT JOIN o ON e.bucket = o.bucket AND e.ts_asof >= o.o_orderdate
"""


# -- windowed aggregate (trailing time-RANGE frame, custom operator) -------

ROLLING_WINDOW_MIN = 60


def events_rolling_window(sf_dir: str):
    """Trailing 1-hour windowed aggregate per user (SQL RANGE frame,
    peers included): for every event, the count and sum of the user's
    events with ts in ``[ts - 1h, ts]``. Ray Data has no window operator —
    composed as bounded partitions (all rows of a user co-located) + ONE
    vectorized kernel per partition: sort by (user, ts, event_id), window
    starts via a 2-key lexicographic searchsorted (merge-by-sorting — no
    composite-key int64 overflow at corpus scale), window ends as peer-run
    boundaries, and exact int64 prefix-sum differences for the sums (so
    the value hash matches SQL's direct summation bit-for-bit)."""
    ds = C.read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    w_ns = np.int64(ROLLING_WINDOW_MIN) * 60 * 1_000_000_000

    def window(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        uc = pd.factorize(g["user_id"])[0].astype(np.int64)  # monotonic: g sorted
        ts = g["ts"].to_numpy().astype("datetime64[ns]").astype(np.int64)
        micros = np.floor(g["value"].to_numpy() * 1e6 + 0.5).astype(np.int64)
        lo = C.lex_searchsorted_left(uc, ts, uc, ts - w_ns)
        # frame end = end of the (user, ts) peer run (RANGE includes peers)
        new_run = np.ones(len(g), bool)
        new_run[1:] = (uc[1:] != uc[:-1]) | (ts[1:] != ts[:-1])
        run_starts = np.flatnonzero(new_run)
        run_ends = np.append(run_starts[1:], len(g))
        hi = run_ends[np.cumsum(new_run) - 1]
        cum = np.concatenate([np.zeros(1, np.int64), np.cumsum(micros)])
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(),
                "user_id": g["user_id"].to_numpy(),
                "ts": g["ts"].to_numpy(),
                "w_n": (hi - lo).astype("int64"),
                "w_sum": np.round((cum[hi] - cum[lo]) / 1e6, C.ROUND_DIGITS),
            }
        )

    return C.by_partition(ds, "user_id", window)


ROLLING_SQL = f"""
SELECT event_id, user_id, ts,
       count(*) OVER w AS w_n,
       round(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT)) OVER w
             / 1000000.0, 4) AS w_sum
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL {ROLLING_WINDOW_MIN} MINUTE PRECEDING
                       AND CURRENT ROW)
"""


def events_type_assoc(sf_dir: str):
    """Market-basket association over per-user type sets: for every
    unordered event-type pair, the users exhibiting both, support,
    both directional confidences, and lift — the co-occurrence-mining
    class (Apriori's counting core; baskets here are each user's DISTINCT
    type set). Scale shape: partition-local distinct inside bounded
    user-keyed partitions (the basket is tiny — ≤ types per user), pair
    expansion per basket via one merge on the co-located frame, then
    bounded (types²)-grain count partials to the driver. Ratios are
    single divisions of exact int64 products (< 2⁵³) — bit-identical in
    both engines, no rounding."""
    ds = C.read(sf_dir, "events", ["user_id", "event_type"])

    def baskets(g: pd.DataFrame) -> pd.DataFrame:
        u = g.drop_duplicates(["user_id", "event_type"])
        p = u.merge(u, on="user_id")
        p = p[p["event_type_x"] < p["event_type_y"]]
        pairs = (
            p.groupby(["event_type_x", "event_type_y"], as_index=False)
            .size()
            .rename(columns={"event_type_x": "t1", "event_type_y": "t2",
                             "size": "n_both"})
        )
        deg = (
            u.groupby("event_type", as_index=False)
            .size()
            .rename(columns={"event_type": "t1", "size": "n_t"})
        )
        deg["t2"] = ""
        nu = pd.DataFrame(
            {"t1": [""], "t2": [""], "n_both": [u["user_id"].nunique()]}
        )
        pairs["n_t"] = 0
        deg["n_both"] = 0
        nu["n_t"] = 0
        cols = ["t1", "t2", "n_both", "n_t"]
        return pd.concat([pairs[cols], deg[cols], nu[cols]], ignore_index=True)

    parts = C.by_partition(ds, "user_id", baskets).to_pandas()
    agg = parts.groupby(["t1", "t2"], as_index=False).sum()
    n_users = int(agg.loc[(agg["t1"] == "") & (agg["t2"] == ""), "n_both"].sum())
    deg = {
        r["t1"]: int(r["n_t"])
        for _, r in agg[(agg["t2"] == "") & (agg["t1"] != "")].iterrows()
    }
    pairs = agg[(agg["t1"] != "") & (agg["t2"] != "")].copy()
    n_both = pairs["n_both"].to_numpy(dtype=np.int64)
    d1 = pairs["t1"].map(deg).to_numpy(dtype=np.int64)
    d2 = pairs["t2"].map(deg).to_numpy(dtype=np.int64)
    out = pd.DataFrame(
        {
            "t1": pairs["t1"].astype(object),
            "t2": pairs["t2"].astype(object),
            "n_both": n_both,
            "support": n_both / np.float64(n_users),
            "conf_1_2": n_both / d1.astype(np.float64),
            "conf_2_1": n_both / d2.astype(np.float64),
            "lift": (n_both * np.int64(n_users)).astype(np.float64)
            / (d1 * d2).astype(np.float64),
        }
    )
    return out.sort_values(["t1", "t2"], kind="stable").reset_index(drop=True)


TYPE_ASSOC_SQL = """
WITH ut AS (
    SELECT DISTINCT user_id, event_type FROM events
), deg AS (
    SELECT event_type, count(*) AS n FROM ut GROUP BY 1
), total AS (
    SELECT count(DISTINCT user_id) AS n FROM ut
), pairs AS (
    SELECT a.event_type AS t1, b.event_type AS t2, count(*) AS n_both
    FROM ut a JOIN ut b
      ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY 1, 2
)
SELECT t1, t2, CAST(n_both AS BIGINT) AS n_both,
       n_both / CAST(total.n AS DOUBLE)                    AS support,
       n_both / CAST(d1.n AS DOUBLE)                       AS conf_1_2,
       n_both / CAST(d2.n AS DOUBLE)                       AS conf_2_1,
       (n_both * total.n) / CAST(d1.n * d2.n AS DOUBLE)    AS lift
FROM pairs, total
JOIN deg d1 ON d1.event_type = t1
JOIN deg d2 ON d2.event_type = t2
ORDER BY t1, t2
"""


def events_user_modal_type(sf_dir: str):
    """Grouped MODE — each user's most frequent event type, with the
    deterministic tie-break SQL's unspecified ``mode()`` lacks (max count,
    then lexicographically smallest type; the oracle states the same law
    via ``row_number``). The argmax-of-count aggregate class: per-batch
    (user, type) count partials collapse the fact table to the bounded
    users × types grain; the bounded partition on user folds partials and
    takes one vectorized sort + drop_duplicates per partition — no
    per-group Python on the near-unique user key."""
    ds = C.read(sf_dir, "events", ["user_id", "event_type"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(["user_id", "event_type"], as_index=False).size()
        g["size"] = g["size"].astype("int64")
        return g.rename(columns={"size": "n"})

    parts = ds.map_batches(partial, batch_format="pandas")

    def argmax(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby(["user_id", "event_type"], as_index=False)["n"].sum()
        c = c.sort_values(
            ["user_id", "n", "event_type"],
            ascending=[True, False, True],
            kind="stable",
        ).drop_duplicates("user_id")
        return pd.DataFrame(
            {
                "user_id": c["user_id"].astype("int64"),
                "modal_type": c["event_type"].astype(object),
                "n_events": c["n"].astype("int64"),
            }
        )

    return C.by_partition(parts, "user_id", argmax)


MODAL_TYPE_SQL = """
WITH c AS (
    SELECT user_id, event_type, count(*) AS n FROM events GROUP BY 1, 2
), r AS (
    SELECT user_id, event_type, n,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY n DESC, event_type) AS rn
    FROM c
)
SELECT user_id, event_type AS modal_type, CAST(n AS BIGINT) AS n_events
FROM r WHERE rn = 1 ORDER BY user_id
"""


ROLL_MEDIAN_W = 5


def events_rolling_median(sf_dir: str):
    """Sliding-window ORDER STATISTIC per user — ``median(v) OVER
    (PARTITION BY user ORDER BY ts, event_id ROWS BETWEEN 4 PRECEDING AND
    CURRENT ROW)`` — the rank-inside-a-moving-frame window class (the
    RANGE-frame op above is sum/count decomposable; a rolling median is
    not, which is exactly why it gets its own kernel). Bounded partitions
    co-locate each user; inside, pandas' C rolling-median engine runs once
    per partition over the (user, ts, event_id)-sorted frame with
    ``min_periods=1`` (SQL frames truncate at the partition head the same
    way). Values fold in integer cents; a window's median is either an
    int or an int + 0.5 — exact in fp64 on both engines, no rounding."""
    ds = C.read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        v = pd.Series(
            np.floor(g["value"].to_numpy() * 100.0).astype(np.int64),
            index=g.index,
        )
        med = (
            v.groupby(g["user_id"].to_numpy(), sort=False)
            .rolling(ROLL_MEDIAN_W, min_periods=1)
            .median()
            .reset_index(level=0, drop=True)
        )
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(),
                "user_id": g["user_id"].to_numpy(),
                "roll_median_cents": med.to_numpy(dtype=np.float64),
            }
        )

    return C.by_partition(ds, "user_id", kernel)


ROLL_MEDIAN_SQL = f"""
SELECT event_id, user_id,
       median(CAST(floor(value * 100) AS BIGINT)) OVER
         (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN {ROLL_MEDIAN_W - 1} PRECEDING AND CURRENT ROW)
         AS roll_median_cents
FROM events
"""


# -- range join (interval containment, custom operator) ---------------------

RANGE_JOIN_DAYS = 7


def events_range_join_orders(sf_dir: str):
    """Range join: for each event, the count and revenue of orders in its
    key bucket whose o_orderdate falls in the trailing
    ``[ts_asof - 7d, ts_asof]`` window. Ray Data has only equi-joins —
    composed as: distributed pre-aggregation of the right side to one row
    per (bucket, date) with exact int64 revenue cents → broadcast as
    per-bucket sorted date arrays + prefix sums → per batch, two
    ``np.searchsorted`` calls per bucket (≤ ASOF_BUCKETS vectorized
    iterations, never per row) turn interval containment into prefix-sum
    differences. The right side stays small BY CONSTRUCTION (pre-agg
    bounds it to buckets × distinct dates); a big-big range join would
    instead bucket both sides by (key, coarse time range) and run this
    same kernel per co-partition."""
    import ray

    right = (
        C.read(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_totalprice"])
        .map_batches(
            lambda b: pd.DataFrame(
                {
                    "bucket": (b["o_custkey"] % ASOF_BUCKETS).astype("int64"),
                    "o_orderdate": b["o_orderdate"],
                    "cents": np.round(b["o_totalprice"].to_numpy() * 100)
                    .astype(np.int64),
                }
            ),
            batch_format="pandas",
        )
        # bounded grain: per-batch partial (count, sum) -> driver fold
        # (see events_asof_orders for the rationale)
        .map_batches(
            lambda b: b.groupby(
                ["bucket", "o_orderdate"], as_index=False
            ).agg(n=("cents", "size"), cents=("cents", "sum")),
            batch_format="pandas",
        )
        .to_pandas()
        .groupby(["bucket", "o_orderdate"], as_index=False)
        .sum()
        .sort_values(["bucket", "o_orderdate"], kind="stable")
    )
    idx = {}
    for bk, grp in right.groupby("bucket", sort=True):
        dates = (
            pd.to_datetime(grp["o_orderdate"])
            .to_numpy()
            .astype("datetime64[ns]")
            .astype(np.int64)
        )
        n = grp["n"].to_numpy().astype(np.int64)
        cents = grp["cents"].to_numpy().astype(np.int64)
        idx[int(bk)] = (
            dates,
            np.concatenate([np.zeros(1, np.int64), np.cumsum(n)]),
            np.concatenate([np.zeros(1, np.int64), np.cumsum(cents)]),
        )
    ref = ray.put(idx)
    w_ns = np.int64(RANGE_JOIN_DAYS) * 86_400 * 1_000_000_000

    ds = C.read(sf_dir, "events", ["event_id", "ts", "user_id"])

    class RangeJoin:
        def __init__(self):
            self.idx = ray.get(ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            bucket = (b["user_id"] % ASOF_BUCKETS).astype("int64").to_numpy()
            ts_asof = (
                (b["ts"] - pd.DateOffset(years=29))
                .astype("datetime64[ns]")
                .to_numpy()
                .astype(np.int64)
            )
            n_out = np.zeros(len(b), np.int64)
            cents_out = np.zeros(len(b), np.int64)
            for bk, (dates, cum_n, cum_c) in self.idx.items():
                m = bucket == bk
                if not m.any():
                    continue
                t = ts_asof[m]
                lo = np.searchsorted(dates, t - w_ns, side="left")
                hi = np.searchsorted(dates, t, side="right")
                n_out[m] = cum_n[hi] - cum_n[lo]
                cents_out[m] = cum_c[hi] - cum_c[lo]
            return pd.DataFrame(
                {
                    "event_id": b["event_id"].to_numpy(),
                    "bucket": bucket,
                    "n_orders": n_out,
                    "window_revenue": np.round(cents_out / 100.0, C.ROUND_DIGITS),
                }
            )

    return ds.map_batches(RangeJoin, batch_format="pandas", concurrency=(1, 4))


RANGE_JOIN_SQL = f"""
WITH e AS (
    SELECT event_id, user_id % {ASOF_BUCKETS} AS bucket,
           ts - INTERVAL 29 YEAR AS ts_asof
    FROM events
)
SELECT e.event_id, e.bucket,
       count(o.o_orderkey) AS n_orders,
       round(coalesce(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)), 0)
             / 100.0, 4) AS window_revenue
FROM e LEFT JOIN orders o
  ON (o.o_custkey % {ASOF_BUCKETS}) = e.bucket
 AND o.o_orderdate BETWEEN e.ts_asof - INTERVAL {RANGE_JOIN_DAYS} DAY
                       AND e.ts_asof
GROUP BY e.event_id, e.bucket
"""


# -- grouped top-k -----------------------------------------------------------

TOPK_PER_USER = 3


def events_top_per_user(sf_dir: str):
    """Top-3 events per user by (value DESC, event_id ASC): a per-batch
    C-speed combiner (``groupby().head`` on a sorted frame — keeps ≤ k rows
    per (batch, user), a superset of the global top-k) shrinks the stream
    before the shuffle; the bounded-partition finisher repeats the same
    kernel and ranks with ``cumcount`` — zero per-group Python."""
    ds = C.read(sf_dir, "events", ["event_id", "user_id", "value"])

    def localtop(b: pd.DataFrame) -> pd.DataFrame:
        return (
            b.sort_values(
                ["user_id", "value", "event_id"],
                ascending=[True, False, True],
                kind="stable",
            )
            .groupby("user_id", sort=False)
            .head(TOPK_PER_USER)
        )

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        top = localtop(g)
        rnk = top.groupby("user_id", sort=False).cumcount() + 1
        return pd.DataFrame(
            {
                "user_id": top["user_id"].to_numpy(),
                "rnk": rnk.to_numpy().astype("int64"),
                "event_id": top["event_id"].to_numpy(),
                "value": top["value"].round(C.ROUND_DIGITS).to_numpy(),
            }
        )

    partial = ds.map_batches(localtop, batch_format="pandas")
    return C.by_partition(partial, "user_id", finish)


TOP_PER_USER_SQL = f"""
SELECT user_id,
       CAST(row_number() OVER w AS BIGINT) AS rnk,
       event_id, round(value, 4) AS value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY value DESC, event_id)
QUALIFY row_number() OVER w <= {TOPK_PER_USER}
"""


# -- wide pivot (crosstab) -----------------------------------------------------


def events_daily_type_pivot(sf_dir: str):
    """Wide pivot: one row per day, one count column per event type. The
    type axis is DISCOVERED with a distributed per-batch unique partial
    (the driver sees one row per (batch, type) — bounded by type
    cardinality, never the event stream); each batch then emits a per-day
    partial crosstab via vectorized comparisons, and a small distributed
    groupby sums day × type CELLS, not rows."""
    types_ds = C.read(sf_dir, "events", ["event_type"])
    types = sorted(
        types_ds.map_batches(
            lambda b: pd.DataFrame({"event_type": b["event_type"].unique()}),
            batch_format="pandas",
        )
        .to_pandas()["event_type"]
        .unique()
    )

    ds = C.read(sf_dir, "events", ["ts", "event_type"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"day": b["ts"].dt.floor("D")})
        for t in types:
            out[f"n_{t}"] = (b["event_type"] == t).to_numpy().astype("int64")
        return out.groupby("day", as_index=False).sum()

    agg = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("day")
        .aggregate(*[Sum(f"n_{t}", alias_name=f"n_{t}") for t in types])
        .to_pandas()
    )
    for t in types:
        agg[f"n_{t}"] = agg[f"n_{t}"].astype("int64")
    return agg


PIVOT_SQL = """
SELECT date_trunc('day', ts) AS day,
       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
       CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view
FROM events GROUP BY 1
"""


# -- exact distributed quantiles ---------------------------------------------

QUANTILES = (0.25, 0.5, 0.75, 0.95)


def events_value_quantiles(sf_dir: str):
    """Exact per-type value quantiles (linear interpolation, matching
    DuckDB's ``quantile_cont``). The grouping key space is bounded (few
    event types), so all rows of a type are co-located by the bounded
    shuffle and ONE vectorized numpy quantile runs per partition — the
    exact-order-statistics path. At an unbounded value-column scale the
    same query would switch to a mergeable sketch (t-digest) with an
    approximate oracle; exact quantiles fundamentally need the full sorted
    column per group."""
    ds = C.read(sf_dir, "events", ["event_type", "value"])

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        gb = g.groupby("event_type", sort=True)["value"]
        frames = []
        for q in QUANTILES:
            s = gb.quantile(q, interpolation="linear")
            frames.append(
                pd.DataFrame(
                    {
                        "event_type": s.index.to_numpy(),
                        "q": np.full(len(s), q),
                        "value_q": np.floor(
                            s.to_numpy() * 10**C.ROUND_DIGITS + 0.5
                        )
                        / 10**C.ROUND_DIGITS,
                    }
                )
            )
        return pd.concat(frames, ignore_index=True)

    return C.by_partition(ds, "event_type", kernel)


QUANTILES_SQL = "\nUNION ALL\n".join(
    f"""SELECT event_type, CAST({q} AS DOUBLE) AS q,
       floor(quantile_cont(value, {q}) * {10**4} + 0.5) / {10**4}.0 AS value_q
FROM events GROUP BY event_type"""
    for q in QUANTILES
)


# -- payload field extraction (parser/decoder family) ----------------------

_PROPS_K_RE = r'"k"\s*:\s*(-?\d+)'


def events_props_extract(sf_dir: str):
    """Vectorized field extraction from raw JSON payloads — the
    parser/decoder family analog (the reference's ENS / bridge / user-ops
    jobs decode raw log payloads into typed columns,
    ``indexer/modules/user_ops/export_user_ops_job.py``,
    ``indexer/modules/custom/hemera_ens``): a compiled-regex fast path on
    the known payload shape (C regex engine via ``Series.str.extract`` —
    no per-row Python, the ABI-selector fast-path pattern), then partial
    aggregation per extracted field.

    Scale shape: extraction is a stateless map; the per-type aggregate is
    a 5-group native distributed aggregate."""
    ds = C.read(sf_dir, "events", ["event_type", "props"])

    def extract(b: pd.DataFrame) -> pd.DataFrame:
        k = (
            b["props"]
            .str.extract(_PROPS_K_RE, expand=False)
            .astype("int64")
        )
        return pd.DataFrame({"event_type": b["event_type"], "k": k})

    out = (
        ds.map_batches(extract, batch_format="pandas")
        .groupby("event_type")
        .aggregate(
            Count(alias_name="n_events"),
            Sum("k", alias_name="sum_k"),
            Mean("k", alias_name="avg_k"),
        )
        .to_pandas()
    )
    out["n_events"] = out["n_events"].astype("int64")
    out["sum_k"] = out["sum_k"].astype("int64")
    return C.round_cols(out, ["avg_k"])


PROPS_EXTRACT_SQL = r"""
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(CAST(regexp_extract(props, '"k"\s*:\s*(-?\d+)', 1)
                     AS BIGINT)) AS BIGINT) AS sum_k,
       round(avg(CAST(regexp_extract(props, '"k"\s*:\s*(-?\d+)', 1)
                      AS BIGINT)), 4) AS avg_k
FROM events GROUP BY event_type
"""


# -- window offset functions (LAG) -------------------------------------------

def events_value_delta(sf_dir: str):
    """Per-user LAG: each event's previous value (user stream ordered by
    ``(ts, event_id)``) and the delta — the window OFFSET family (the
    rolling-window query covers frames; this covers lag/lead). Composed as
    bounded partitions (all rows of a user co-located via ``by_partition``)
    + one vectorized kernel per partition: sort, shift, mask the first row
    of each user run. The subtraction uses the identical double operands
    on both sides, so the hash needs no float tolerance."""
    ds = C.read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        u = g["user_id"].to_numpy()
        v = g["value"].to_numpy()
        prev = np.empty_like(v, dtype=np.float64)
        prev[1:] = v[:-1]
        prev[:1] = np.nan  # slice-assign: safe on an empty partition frame
        same = np.empty(len(u), bool)
        same[1:] = u[1:] == u[:-1]
        same[:1] = False
        prev = np.where(same, prev, np.nan)
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(),
                "user_id": u,
                "prev_value": prev,
                "delta": v - prev,
            }
        )

    return C.by_partition(ds, "user_id", kernel)


VALUE_DELTA_SQL = """
SELECT event_id, user_id,
       lag(value) OVER w AS prev_value,
       value - lag(value) OVER w AS delta
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


# -- exact z-score outlier detection ------------------------------------------

OUTLIER_SIGMA_NUM, OUTLIER_SIGMA_DEN = 5, 2  # 2.5 sigma, kept rational


def events_value_outliers(sf_dir: str):
    """Per-type z-score outliers (value > mean + 2.5·stddev) with EXACT
    set membership — no float tolerance at the decision boundary.

    The float comparison ``v > m + 2.5·s`` is rounded differently by
    numpy and DuckDB in the last ulp, which can flip boundary rows; so
    both sides decide on integers instead. The condition in value-cents
    is ``(n·v − S) > 0  AND  4·(n·v − S)²·(n−1) > 25·n·(n·SSQ − S²)``
    (S, SSQ = per-group sum / sum-of-squares of cents) — monotone in v,
    so it is equivalent to ``v ≥ T`` for a per-group integer threshold.
    The oracle evaluates the inequality directly in HUGEINT; this side
    binary-searches T per group with Python ints (exact, driver-side,
    O(groups·log(max_cents))) and ships the tiny {type: T} dict to a
    pure filter pass.

    Scale shape: pass 1 collapses each batch to ≤|types| moment rows
    (n, S, SSQ are mergeable); pass 2 is a broadcast-threshold filter —
    the event table is never shuffled."""
    ds = C.read(sf_dir, "events", ["event_id", "event_type", "value"])

    def moments(b: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(b["value"].to_numpy() * 100.0).astype(np.int64)
        df = pd.DataFrame(
            {"event_type": b["event_type"], "c": cents, "sq": cents * cents}
        )
        return df.groupby("event_type", as_index=False).agg(
            n=("c", "size"), s=("c", "sum"), ssq=("sq", "sum")
        )

    stats = (
        ds.map_batches(moments, batch_format="pandas")
        .to_pandas()
        .groupby("event_type")
        .sum()
    )
    thr: dict[str, int] = {}
    for t, row in stats.iterrows():
        n, s, ssq = int(row["n"]), int(row["s"]), int(row["ssq"])
        rhs = (
            OUTLIER_SIGMA_NUM * OUTLIER_SIGMA_NUM * n * (n * ssq - s * s)
        )

        def cond(c: int) -> bool:
            d = n * c - s
            return d > 0 and (
                OUTLIER_SIGMA_DEN * OUTLIER_SIGMA_DEN * d * d * (n - 1) > rhs
            )

        lo, hi = 0, 10**9  # cents upper bound (values are ≤ ~1e7 cents)
        while lo < hi:
            mid = (lo + hi) // 2
            if cond(mid):
                hi = mid
            else:
                lo = mid + 1
        thr[t] = lo

    def keep(b: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(b["value"].to_numpy() * 100.0).astype(np.int64)
        t = b["event_type"].map(thr).to_numpy()
        out = b[cents >= t]
        return out[["event_id", "event_type", "value"]]

    return ds.map_batches(keep, batch_format="pandas")


OUTLIERS_SQL = f"""
WITH c AS (
    SELECT event_id, event_type, value,
           CAST(floor(value * 100) AS BIGINT) AS cents
    FROM events
), g AS (
    SELECT event_type, count(*) AS n, sum(cents) AS s,
           sum(cents * cents) AS ssq
    FROM c GROUP BY event_type
)
SELECT e.event_id, e.event_type, e.value
FROM c e JOIN g USING (event_type)
WHERE (CAST(g.n AS HUGEINT) * e.cents - g.s) > 0
  AND {OUTLIER_SIGMA_DEN * OUTLIER_SIGMA_DEN}
      * (CAST(g.n AS HUGEINT) * e.cents - g.s)
      * (CAST(g.n AS HUGEINT) * e.cents - g.s) * (g.n - 1)
      > {OUTLIER_SIGMA_NUM * OUTLIER_SIGMA_NUM} * CAST(g.n AS HUGEINT)
        * (CAST(g.n AS HUGEINT) * g.ssq - CAST(g.s AS HUGEINT) * g.s)
"""


# -- exact mergeable moments (sufficient statistics for mean/variance) ------

def events_type_moments(sf_dir: str):
    """Mergeable EXACT moments per event type: (n, sum_cents,
    sumsq_cents) over integer cents — the combiner-friendly sufficient
    statistics for mean/variance that stay exact under ANY merge order
    (integer adds commute; float Welford merges do not), i.e. the shape
    incremental aggregate maintenance wants. Per-batch partials →
    bounded-key groupby sum. int64 bound: cents² ≤ ~1e12 per event, so
    the per-type sum is exact to ~9×10⁶ events/type; past that the
    partials split into two int64 limbs (the HUGEINT analog the z-score
    oracle already uses)."""
    ds = C.read(sf_dir, "events", ["event_type", "value"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(b["value"].to_numpy() * 100.0).astype(np.int64)
        df = pd.DataFrame(
            {
                "event_type": b["event_type"].to_numpy(),
                "n": np.ones(len(b), np.int64),
                "sum_cents": cents,
                "sumsq_cents": cents * cents,
            }
        )
        return df.groupby("event_type", as_index=False).sum()

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sum_cents", alias_name="sum_cents"),
            Sum("sumsq_cents", alias_name="sumsq_cents"),
        )
        .to_pandas()
    )
    for c in ("n", "sum_cents", "sumsq_cents"):
        out[c] = out[c].astype("int64")
    return out


TYPE_MOMENTS_SQL = """
WITH c AS (
    SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS cents FROM events
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(cents) AS BIGINT) AS sum_cents,
       CAST(sum(cents * cents) AS BIGINT) AS sumsq_cents
FROM c GROUP BY event_type
"""


# -- exact distributed order statistics: median / MAD outliers --------------

MAD_K = 5  # robust threshold: |x - median| > K · MAD


def _kth_smallest(ds, col: str, k: int) -> int:
    """EXACT k-th smallest (0-indexed) of an int64 column, distributed —
    the sketch-guided selection pattern: pass 1 builds the factor-2
    bucket histogram (≤64 partial rows per batch, bounded groupby), the
    driver walks cumulative counts to the bucket holding rank k; pass 2
    counts DISTINCT VALUES within that one bucket only and the driver
    walks to the exact value. Driver state is O(buckets) + O(distinct
    values in the selected bucket) — at corpus scale a hot bucket recurses
    into finer sub-buckets instead (same law, one more pass); two levels
    suffice for the test tiers. No global sort anywhere."""

    def hist(b: pd.DataFrame) -> pd.DataFrame:
        v = b[col].to_numpy(np.int64)
        bl = np.frexp(np.maximum(v, 0).astype("float64"))[1]
        bk = np.where(v <= 0, 0, bl).astype(np.int64)
        g = pd.DataFrame({"b": bk}).groupby("b", as_index=False).size()
        return pd.DataFrame(
            {"b": g["b"].astype("int64"), "n": g["size"].astype("int64")}
        )

    reg = (
        ds.map_batches(hist, batch_format="pandas")
        .groupby("b")
        .sum("n")
        .to_pandas()
        .sort_values("b")
    )
    cum = np.cumsum(reg["sum(n)"].to_numpy(np.int64))
    i = int(np.searchsorted(cum, k + 1))
    bstar = int(reg["b"].iloc[i])
    r = int(k - (cum[i - 1] if i else 0))

    def within(b: pd.DataFrame) -> pd.DataFrame:
        v = b[col].to_numpy(np.int64)
        bl = np.frexp(np.maximum(v, 0).astype("float64"))[1]
        bk = np.where(v <= 0, 0, bl)
        v = v[bk == bstar]
        u, c = np.unique(v, return_counts=True)
        return pd.DataFrame({"v": u, "n": c.astype(np.int64)})

    vc = (
        ds.map_batches(within, batch_format="pandas")
        .groupby("v")
        .sum("n")
        .to_pandas()
        .sort_values("v")
    )
    cum2 = np.cumsum(vc["sum(n)"].to_numpy(np.int64))
    j = int(np.searchsorted(cum2, r + 1))
    return int(vc["v"].iloc[j])


def events_value_mad_outliers(sf_dir: str):
    """Robust (median/MAD) outlier flagging — the heavy-tail-safe
    complement to ``events_value_outliers``'s z-score: flag events with
    ``|cents − median| > MAD_K · MAD`` where median and MAD (median
    absolute deviation) are EXACT lower-median order statistics over
    integer cents (same floor law as the quantile sketch), found by the
    sketch-guided distributed selection in :func:`_kth_smallest` — four
    bounded passes, zero global sorts, integer-exact so the SQL oracle
    (row_number-based k-th element) matches bit-for-bit."""
    ds = C.read(sf_dir, "events", ["event_id", "value"])

    def to_cents(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_id": b["event_id"].astype("int64"),
                "v": np.floor(b["value"].to_numpy() * 100.0).astype(np.int64),
            }
        )

    cents = ds.map_batches(to_cents, batch_format="pandas").materialize()
    n = cents.count()
    k = (n - 1) // 2  # lower median, 0-indexed
    med = _kth_smallest(cents, "v", k)

    def to_dev(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["dv"] = np.abs(b["v"].to_numpy(np.int64) - med)
        return b

    dev = cents.map_batches(to_dev, batch_format="pandas").materialize()
    mad = _kth_smallest(dev, "dv", k)
    thr = MAD_K * mad

    def flag(b: pd.DataFrame) -> pd.DataFrame:
        m = b["dv"].to_numpy(np.int64) > thr
        return pd.DataFrame(
            {
                "event_id": b["event_id"].to_numpy(np.int64)[m],
                "cents": b["v"].to_numpy(np.int64)[m],
                "abs_dev": b["dv"].to_numpy(np.int64)[m],
            }
        )

    return dev.map_batches(flag, batch_format="pandas")


MAD_OUTLIERS_SQL = f"""
WITH c AS (
    SELECT event_id, CAST(floor(value * 100) AS BIGINT) AS cents FROM events
), med AS (
    SELECT cents AS m
    FROM (SELECT cents, row_number() OVER (ORDER BY cents) AS rn,
                 count(*) OVER () AS n
          FROM c)
    WHERE rn = (n - 1) // 2 + 1
), dev AS (
    SELECT event_id, cents, abs(cents - (SELECT m FROM med)) AS dv FROM c
), mad AS (
    SELECT dv AS m
    FROM (SELECT dv, row_number() OVER (ORDER BY dv) AS rn,
                 count(*) OVER () AS n
          FROM dev)
    WHERE rn = (n - 1) // 2 + 1
)
SELECT event_id, cents, dv AS abs_dev
FROM dev WHERE dv > {MAD_K} * (SELECT m FROM mad)
"""


# -- sweep-line session concurrency (distributed two-phase prefix scan) -----

_DAY_US = 86_400_000_000


def events_session_concurrency(sf_dir: str):
    """Time-at-concurrency histogram over the GLOBAL session timeline:
    for each concurrency level (number of simultaneously-open sessions,
    any user), the total microseconds the system spent at that level —
    the capacity-planning sweep-line. Sessions are ``events_sessionize``'s
    windows; a session occupies [start_ts, end_ts] with net-change
    collapsing at equal instants (ends cancel starts, zero-length
    sessions are level-neutral).

    This is the one operator class that needs a GLOBAL ordered prefix
    sum, and the scale shape is the classic two-phase scan — no global
    sort, no driver-side timeline: (1) ±1 deltas collapse to per-instant
    nets (pre-aggregated int groupby); (2) per-DAY partials (min/max
    instant, net sum) fold on the driver into day offsets — driver state
    is O(occupied days), bounded, NOT O(points); (3) each day's
    partition computes its local prefix + broadcast offset and emits
    per-level duration partials; inter-day gap segments are the O(days)
    carry rows the driver already holds. A final tiny groupby folds
    partials + carries."""
    import ray

    sess = events_sessionize(sf_dir)

    def pts(b: pd.DataFrame) -> pd.DataFrame:
        s = b["start_ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        e = b["end_ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        df = pd.DataFrame(
            {
                "ts_us": np.concatenate([s, e]),
                "d": np.concatenate(
                    [np.ones(len(s), np.int64), -np.ones(len(e), np.int64)]
                ),
            }
        )
        return df.groupby("ts_us", as_index=False)["d"].sum()

    nets = sess.map_batches(pts, batch_format="pandas").groupby("ts_us").sum("d")

    def with_day(t: pa.Table) -> pa.Table:
        ts = t.column("ts_us").to_numpy(zero_copy_only=False).astype(np.int64)
        d = t.column("sum(d)").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.Table.from_arrays(
            [
                pa.array(ts, pa.int64()),
                pa.array(d, pa.int64()),
                pa.array(ts // _DAY_US, pa.int64()),
            ],
            schema=pa.schema(
                [("ts_us", pa.int64()), ("d", pa.int64()), ("day", pa.int64())]
            ),
        )

    points = nets.map_batches(with_day, batch_format="pyarrow").materialize()

    # day summaries → offsets + inter-day carry segments (O(days) driver
    # state: the bounded fold of the two-phase scan)
    daysum = (
        points.groupby("day")
        .aggregate(
            Min("ts_us", alias_name="min_ts"),
            Max("ts_us", alias_name="max_ts"),
            Sum("d", alias_name="net"),
        )
        .to_pandas()
        .sort_values("day")
    )
    net = daysum["net"].to_numpy(np.int64)
    offset_before = np.concatenate([[0], np.cumsum(net)[:-1]]).astype(np.int64)
    offsets = dict(zip(daysum["day"].astype(int), offset_before))
    level_after = offset_before + net  # level once the day's points are done
    carry = pd.DataFrame(
        {
            "concurrency": level_after[:-1],
            "total_us": (
                daysum["min_ts"].to_numpy(np.int64)[1:]
                - daysum["max_ts"].to_numpy(np.int64)[:-1]
            ),
        }
    )
    ref = ray.put(offsets)

    def day_scan(g: pd.DataFrame) -> pd.DataFrame:
        import ray as _r

        off = _r.get(ref)
        frames = []
        for day, sub in g.groupby("day"):
            s = sub.sort_values("ts_us")
            ts = s["ts_us"].to_numpy(np.int64)
            lvl = off[int(day)] + np.cumsum(s["d"].to_numpy(np.int64))
            if len(ts) < 2:
                continue
            seg = pd.DataFrame(
                {"concurrency": lvl[:-1], "total_us": np.diff(ts)}
            )
            frames.append(
                seg.groupby("concurrency", as_index=False)["total_us"].sum()
            )
        if not frames:
            return pd.DataFrame(
                {
                    "concurrency": pd.Series(dtype="int64"),
                    "total_us": pd.Series(dtype="int64"),
                }
            )
        return pd.concat(frames, ignore_index=True)

    partials = C.by_partition(points, "day", day_scan)
    carry_ds = ray.data.from_pandas(
        carry.astype({"concurrency": "int64", "total_us": "int64"})
        if len(carry)
        else pd.DataFrame(
            {
                "concurrency": pd.Series(dtype="int64"),
                "total_us": pd.Series(dtype="int64"),
            }
        )
    )
    out = (
        partials.union(carry_ds)
        .groupby("concurrency")
        .sum("total_us")
        .to_pandas()
    )
    return pd.DataFrame(
        {
            "concurrency": out["concurrency"].astype("int64"),
            "total_us": out["sum(total_us)"].astype("int64"),
        }
    )


SESSION_CONCURRENCY_SQL = f"""
WITH flagged AS (
    SELECT user_id, event_id, ts,
           CASE WHEN ts - lag(ts) OVER w > INTERVAL {{gap}} MINUTE
                THEN 1 ELSE 0 END AS new_session
    FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
    SELECT user_id, ts,
           sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) + 1 AS session_id
    FROM flagged
), s AS (
    SELECT user_id, session_id, min(ts) AS start_ts, max(ts) AS end_ts
    FROM sess GROUP BY 1, 2
), pts AS (
    SELECT start_ts AS ts, 1 AS d FROM s
    UNION ALL
    SELECT end_ts, -1 FROM s
), agg AS (
    SELECT ts, sum(d) AS d FROM pts GROUP BY ts
), sw AS (
    SELECT ts, sum(d) OVER (ORDER BY ts ROWS UNBOUNDED PRECEDING) AS level,
           lead(ts) OVER (ORDER BY ts) AS nxt
    FROM agg
)
SELECT CAST(level AS BIGINT) AS concurrency,
       CAST(sum(epoch_us(nxt) - epoch_us(ts)) AS BIGINT) AS total_us
FROM sw WHERE nxt IS NOT NULL GROUP BY 1
"""


# -- grouped exact selection + trimmed statistics ---------------------------

TRIM_FRAC = 0.1  # fraction trimmed from EACH tail


def _ranks_smallest_by(ds, gcol: str, col: str, ks: dict) -> dict:
    """EXACT k-th smallest (0-indexed) per GROUP, for several ranks at
    once: ``ks[group] = [k0, k1, ...]`` → ``{(group, k): value}``.

    The grouped generalization of :func:`_kth_smallest`, still two
    bounded passes TOTAL for all groups and all ranks: pass 1 builds the
    per-(group, factor-2 bucket) histogram (≤ groups×64 partial rows per
    batch); the driver walks each group's cumulative counts to the bucket
    holding each rank; pass 2 counts distinct values inside only the
    selected (group, bucket) cells and the driver walks to the exact
    values. Driver state is O(groups × buckets) + O(distinct values in
    selected buckets) — never a sort, never corpus-sized."""
    import ray as _ray

    def hist(b: pd.DataFrame) -> pd.DataFrame:
        v = b[col].to_numpy(np.int64)
        bl = np.frexp(np.maximum(v, 0).astype("float64"))[1]
        bk = np.where(v <= 0, 0, bl).astype(np.int64)
        g = (
            pd.DataFrame({"g": b[gcol].to_numpy(dtype=object), "b": bk})
            .groupby(["g", "b"], as_index=False)
            .size()
        )
        return pd.DataFrame(
            {"g": g["g"], "b": g["b"].astype("int64"), "n": g["size"].astype("int64")}
        )

    reg = ds.map_batches(hist, batch_format="pandas").to_pandas()
    reg = reg.groupby(["g", "b"], as_index=False)["n"].sum()

    want: dict = {}  # (group, bucket) -> [(k, rank-within-bucket)]
    for g, sub in reg.groupby("g"):
        sub = sub.sort_values("b")
        cum = np.cumsum(sub["n"].to_numpy(np.int64))
        for k in ks[g]:
            i = int(np.searchsorted(cum, k + 1))
            bstar = int(sub["b"].iloc[i])
            r = int(k - (cum[i - 1] if i else 0))
            want.setdefault((g, bstar), []).append((k, r))
    wanted = pd.DataFrame(
        [(g, bs) for (g, bs) in want], columns=["g", "b"]
    ).astype({"b": "int64"})
    wref = C.broadcast(wanted)

    def within(b: pd.DataFrame) -> pd.DataFrame:
        sel = _ray.get(wref)
        v = b[col].to_numpy(np.int64)
        bl = np.frexp(np.maximum(v, 0).astype("float64"))[1]
        bk = np.where(v <= 0, 0, bl).astype(np.int64)
        df = pd.DataFrame({"g": b[gcol].to_numpy(dtype=object), "b": bk, "v": v})
        m = df.merge(sel, on=["g", "b"])
        out = m.groupby(["g", "b", "v"], as_index=False).size()
        return pd.DataFrame(
            {
                "g": out["g"],
                "b": out["b"].astype("int64"),
                "v": out["v"].astype("int64"),
                "n": out["size"].astype("int64"),
            }
        )

    vc = ds.map_batches(within, batch_format="pandas").to_pandas()
    vc = vc.groupby(["g", "b", "v"], as_index=False)["n"].sum()
    res: dict = {}
    for (g, bs), pairs in want.items():
        sub = vc[(vc["g"] == g) & (vc["b"] == bs)].sort_values("v")
        cum = np.cumsum(sub["n"].to_numpy(np.int64))
        for k, r in pairs:
            j = int(np.searchsorted(cum, r + 1))
            res[(g, k)] = int(sub["v"].iloc[j])
    return res


def events_trimmed_stats(sf_dir: str):
    """EXACT 10%-each-tail trimmed mean of ``value`` per event type — the
    robust aggregate that normally forces a per-group global sort. Here:
    one count pass, the two-pass grouped selection of both trim
    boundaries (:func:`_ranks_smallest_by` — all groups and both ranks
    share the same two passes), then one conditional-sum pass with the
    boundaries broadcast. Integer cents throughout (the house floor law),
    with exact tie accounting at both boundaries, so the SQL oracle's
    row_number window matches bit-for-bit. Four bounded passes, zero
    sorts, driver state O(types)."""
    import ray as _ray

    ds = C.read(sf_dir, "events", ["event_type", "value"])

    def to_cents(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": b["event_type"].astype(object),
                "v": np.floor(b["value"].to_numpy() * 100.0).astype(np.int64),
            }
        )

    cents = ds.map_batches(to_cents, batch_format="pandas").materialize()

    def pcount(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("event_type", as_index=False).size()
        return pd.DataFrame(
            {"event_type": g["event_type"], "n": g["size"].astype("int64")}
        )

    counts = (
        cents.map_batches(pcount, batch_format="pandas")
        .to_pandas()
        .groupby("event_type", as_index=False)["n"]
        .sum()
    )
    n_by = dict(zip(counts["event_type"], counts["n"].astype(int)))
    k_by = {g: int(np.floor(TRIM_FRAC * n)) for g, n in n_by.items()}
    ks = {g: sorted({k_by[g], n_by[g] - k_by[g] - 1}) for g in n_by}
    sel = _ranks_smallest_by(cents, "event_type", "v", ks)
    lo_by = {g: sel[(g, k_by[g])] for g in n_by}
    hi_by = {g: sel[(g, n_by[g] - k_by[g] - 1)] for g in n_by}
    bounds = C.broadcast((lo_by, hi_by))

    def psums(b: pd.DataFrame) -> pd.DataFrame:
        lo_d, hi_d = _ray.get(bounds)
        v = b["v"].to_numpy(np.int64)
        lo = b["event_type"].map(lo_d).to_numpy(np.int64)
        hi = b["event_type"].map(hi_d).to_numpy(np.int64)
        mid = (v > lo) & (v < hi)
        df = pd.DataFrame(
            {
                "event_type": b["event_type"],
                "n_lt_lo": (v < lo).astype(np.int64),
                "n_eq_lo": (v == lo).astype(np.int64),
                "sum_mid": np.where(mid, v, 0),
                "n_eq_hi": (v == hi).astype(np.int64),
                "n_gt_hi": (v > hi).astype(np.int64),
            }
        )
        return df.groupby("event_type", as_index=False).sum()

    parts = cents.map_batches(psums, batch_format="pandas").to_pandas()
    agg = parts.groupby("event_type", as_index=False).sum()

    rows = []
    for _, r in agg.iterrows():
        g = r["event_type"]
        n, k, lo, hi = n_by[g], k_by[g], lo_by[g], hi_by[g]
        kept = n - 2 * k
        if lo == hi:  # whole window is one value
            total = lo * kept
        else:
            # copies of lo trimmed from the bottom tail: k - count(v < lo)
            lo_in = int(r["n_eq_lo"]) - (k - int(r["n_lt_lo"]))
            hi_in = int(r["n_eq_hi"]) - (k - int(r["n_gt_hi"]))
            total = int(r["sum_mid"]) + lo * lo_in + hi * hi_in
        rows.append(
            {
                "event_type": g,
                "trimmed_mean": round(total / (100.0 * kept), C.ROUND_DIGITS),
                "n_kept": int(kept),
            }
        )
    out = pd.DataFrame(rows).sort_values("event_type").reset_index(drop=True)
    out["n_kept"] = out["n_kept"].astype("int64")
    return out


TRIMMED_STATS_SQL = f"""
WITH c AS (
  SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS v FROM events
), r AS (
  SELECT event_type, v,
         row_number() OVER (PARTITION BY event_type ORDER BY v) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM c
)
SELECT event_type,
       round(sum(v) / (100.0 * count(*)), 4) AS trimmed_mean,
       count(*) AS n_kept
FROM r
WHERE rn > floor({TRIM_FRAC} * n) AND rn <= n - floor({TRIM_FRAC} * n)
GROUP BY event_type ORDER BY event_type
"""


# -- exact grouped NTILE without a per-group sort -----------------------------

def events_percent_rank(sf_dir: str):
    """Per-row relative standing — ``PERCENT_RANK()`` and ``CUME_DIST()``
    OVER (PARTITION BY event_type ORDER BY value) — the window class that
    decorates EVERY row with a rank-derived statistic (NTILE buckets
    aggregates; this keeps row grain). No per-group sort of the fact
    table: pass 1 folds per-batch (type, value-cents) histograms — the
    grain is bounded (types × distinct 2-decimal cents), the classic
    broadcast-CDF trick — and pass 2 decorates each row with two
    ``searchsorted`` gathers against its type's broadcast cumulative
    histogram. ranks/counts are exact ints; the one division per output
    column is the same int-ratio in both engines, so the doubles are
    bit-identical (no rounding needed). Single-row groups define
    percent_rank = 0 (the SQL law)."""
    import ray as _ray

    ds = C.read(sf_dir, "events", ["event_id", "event_type", "value"])

    def phist(b: pd.DataFrame) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "event_type": b["event_type"].astype(object),
                "v": np.floor(b["value"].to_numpy() * 100.0).astype(np.int64),
            }
        )
        g = df.groupby(["event_type", "v"], as_index=False).size()
        g["size"] = g["size"].astype("int64")
        return g.rename(columns={"size": "n"})

    hist = (
        ds.map_batches(phist, batch_format="pandas")
        .to_pandas()
        .groupby(["event_type", "v"], as_index=False)["n"]
        .sum()
    )
    cdf: dict = {}
    for t, sub in hist.groupby("event_type"):
        sub = sub.sort_values("v")
        counts = sub["n"].to_numpy(dtype=np.int64)
        cum = np.cumsum(counts)
        # n_lt(uniq[i]) = cum[i-1]; n_le(uniq[i]) = cum[i]
        cdf[t] = (
            sub["v"].to_numpy(dtype=np.int64),
            np.concatenate([[0], cum[:-1]]),
            cum,
            int(cum[-1]),
        )
    ref = C.broadcast(cdf)

    def decorate(b: pd.DataFrame) -> pd.DataFrame:
        cdf_ = _ray.get(ref)
        v = np.floor(b["value"].to_numpy() * 100.0).astype(np.int64)
        types = b["event_type"].to_numpy(dtype=object)
        pr = np.zeros(len(b), np.float64)
        cd = np.zeros(len(b), np.float64)
        for t in pd.unique(types):
            uniq, n_lt, n_le, n = cdf_[t]
            m = types == t
            pos = np.searchsorted(uniq, v[m])
            pr[m] = n_lt[pos] / (n - 1) if n > 1 else 0.0
            cd[m] = n_le[pos] / n
        return pd.DataFrame(
            {
                "event_id": b["event_id"].astype("int64"),
                "event_type": types,
                "pct_rank": pr,
                "cume_dist": cd,
            }
        )

    return ds.map_batches(decorate, batch_format="pandas")


PERCENT_RANK_SQL = """
SELECT event_id, event_type,
       percent_rank() OVER w AS pct_rank,
       cume_dist()    OVER w AS cume_dist
FROM (SELECT event_id, event_type,
             CAST(floor(value * 100) AS BIGINT) AS v FROM events)
WINDOW w AS (PARTITION BY event_type ORDER BY v)
ORDER BY event_id
"""


NTILE_K = 4


def events_value_ntile(sf_dir: str):
    """Per (event_type, quartile) row count and value sum under
    ``NTILE(4) OVER (PARTITION BY event_type ORDER BY value)`` — the
    window-function class that naive plans answer with a per-group global
    sort. The aggregated output is order-independent (ties at a tile
    boundary carry equal values, so any tie assignment yields the same
    per-tile sums), which lets the whole window collapse to ORDER
    STATISTICS: tile sizes follow from the group count (first ``n % k``
    tiles take the extra row, SQL NTILE law), the 3 interior boundary
    values come from :func:`_ranks_smallest_by` (two bounded passes for
    ALL groups and ranks), and one final pass accumulates per-boundary
    (count, sum) of strictly-smaller values so each prefix sum
    ``S(c) = sum_lt(b) + b·(c − n_lt(b))`` is exact under ties. Integer
    cents throughout (the house floor law). Four bounded passes, zero
    sorts, driver state O(types × k)."""
    import ray as _ray

    ds = C.read(sf_dir, "events", ["event_type", "value"])

    def to_cents(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": b["event_type"].astype(object),
                "v": np.floor(b["value"].to_numpy() * 100.0).astype(np.int64),
            }
        )

    cents = ds.map_batches(to_cents, batch_format="pandas").materialize()

    def pcount(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("event_type", as_index=False).size()
        return pd.DataFrame(
            {"event_type": g["event_type"], "n": g["size"].astype("int64")}
        )

    counts = (
        cents.map_batches(pcount, batch_format="pandas")
        .to_pandas()
        .groupby("event_type", as_index=False)["n"]
        .sum()
    )
    n_by = dict(zip(counts["event_type"], counts["n"].astype(int)))

    # cumulative tile-boundary ranks per group (SQL NTILE sizing)
    cuts_by: dict = {}
    ks: dict = {}
    for g, n in n_by.items():
        q, r = divmod(n, NTILE_K)
        sizes = [q + 1] * r + [q] * (NTILE_K - r)
        cuts = list(np.cumsum(sizes))  # c_1..c_K (c_K == n)
        cuts_by[g] = cuts
        ks[g] = sorted({c - 1 for c in cuts[:-1] if c >= 1})
    sel = _ranks_smallest_by(cents, "event_type", "v", ks)
    # per group: the ≤ K-1 interior (cut, boundary-value) pairs
    bounds_by = {
        g: [(c, sel[(g, c - 1)]) for c in cuts_by[g][:-1] if c >= 1]
        for g in n_by
    }
    pad = np.iinfo("int64").max
    bmaps = [
        {
            g: (bl[i][1] if i < len(bl) else pad)
            for g, bl in bounds_by.items()
        }
        for i in range(NTILE_K - 1)
    ]
    bref = C.broadcast(bmaps)

    def psums(b: pd.DataFrame) -> pd.DataFrame:
        maps = _ray.get(bref)
        v = b["v"].to_numpy(np.int64)
        cols = {"event_type": b["event_type"], "sum_all": v}
        for i, mp in enumerate(maps):
            bi = b["event_type"].map(mp).to_numpy(np.int64)
            lt = v < bi
            cols[f"n_lt_{i}"] = lt.astype(np.int64)
            cols[f"sum_lt_{i}"] = np.where(lt, v, 0)
        return pd.DataFrame(cols).groupby("event_type", as_index=False).sum()

    agg = (
        cents.map_batches(psums, batch_format="pandas")
        .to_pandas()
        .groupby("event_type", as_index=False)
        .sum()
    )

    rows = []
    for _, r in agg.iterrows():
        g = r["event_type"]
        bl = bounds_by[g]
        prefix = [0]  # S(c_0)=0, then S at each cut
        for i, (c, bv) in enumerate(bl):
            prefix.append(
                int(r[f"sum_lt_{i}"]) + bv * (c - int(r[f"n_lt_{i}"]))
            )
        prefix.append(int(r["sum_all"]))  # S(n)
        cuts = [0] + cuts_by[g][: len(bl)] + [n_by[g]]
        for t in range(len(cuts) - 1):
            nt = cuts[t + 1] - cuts[t]
            if nt <= 0:
                continue
            rows.append(
                {
                    "event_type": g,
                    "tile": t + 1,
                    "n": nt,
                    "sum_value": round(
                        (prefix[t + 1] - prefix[t]) / 100.0, C.ROUND_DIGITS
                    ),
                }
            )
    out = pd.DataFrame(rows).sort_values(
        ["event_type", "tile"], kind="stable"
    ).reset_index(drop=True)
    out["tile"] = out["tile"].astype("int64")
    out["n"] = out["n"].astype("int64")
    return out


NTILE_SQL = f"""
WITH c AS (
  SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS v FROM events
), t AS (
  SELECT event_type, v,
         ntile({NTILE_K}) OVER (PARTITION BY event_type ORDER BY v) AS tile
  FROM c
)
SELECT event_type, tile, count(*) AS n, round(sum(v) / 100.0, 4) AS sum_value
FROM t GROUP BY event_type, tile
ORDER BY event_type, tile
"""


# -- ratio-to-report: share of each day's events per type ---------------------

def events_share_of_day(sf_dir: str):
    """Per (day, event_type): event count and its share of that DAY's
    total — the ratio-to-report window class (``n / sum(n) OVER
    (PARTITION BY day)``). The grain is bounded (days × types), so one
    distributed pass folds per-batch partial counts and the window
    itself is a driver-side transform of the tiny folded frame; the
    share is INTEGER BASIS POINTS (``n·10⁴ // day_total``) — float
    rounding of small-int ratios hits exact half-ties (5/32 = 0.15625)
    where numpy rounds half-even and SQL half-away, so the contract is
    floor division, tie-free on both sides."""
    ds = C.read(sf_dir, "events", ["event_type", "ts"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "day": b["ts"].dt.strftime("%Y-%m-%d"),
                "event_type": b["event_type"],
                "n": np.int64(1),
            }
        )
        return df.groupby(["day", "event_type"], as_index=False)["n"].sum()

    fine = (
        ds.map_batches(partial, batch_format="pandas")
        .to_pandas()
        .groupby(["day", "event_type"], as_index=False)["n"]
        .sum()
    )
    day_tot = fine.groupby("day")["n"].transform("sum")
    fine["n"] = fine["n"].astype("int64")
    fine["share_bp"] = (
        fine["n"].to_numpy(np.int64) * 10_000 // day_tot.to_numpy(np.int64)
    ).astype("int64")
    return fine.sort_values(["day", "event_type"], kind="stable").reset_index(
        drop=True
    )


SHARE_OF_DAY_SQL = """
WITH b AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day, event_type FROM events
), c AS (
  SELECT day, event_type, count(*) AS n FROM b GROUP BY day, event_type
)
SELECT day, event_type, CAST(n AS BIGINT) AS n,
       CAST(n * 10000 // sum(n) OVER (PARTITION BY day) AS BIGINT)
           AS share_bp
FROM c ORDER BY day, event_type
"""


def events_seasonal_outliers(sf_dir: str):
    """Seasonal anomaly flags: for each (event_type, day, hour-of-day)
    cell, compare its count against that type×hour's MEAN across every
    day in the data (the hour-of-day seasonal baseline) and flag cells
    more than 2× the baseline — the burst detector every event pipeline
    runs against its traffic shape. Integer-exact contract: flag iff
    ``n · n_days > 2 · hour_total`` (cross-multiplied — no float mean),
    with ``ratio_bp = n · n_days · 10⁴ // hour_total`` as the reported
    magnitude (floor division, tie-free both engines).

    Scale shape: grain is bounded (types × days × 24), so one distributed
    pass folds per-batch partial cell counts and the baseline join is a
    driver-side transform of the tiny folded frame (the
    ``events_share_of_day`` pattern); n_days is the distinct days of the
    folded frame itself — never a second corpus pass."""
    ds = C.read(sf_dir, "events", ["event_type", "ts"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "event_type": b["event_type"],
                "day": b["ts"].dt.strftime("%Y-%m-%d"),
                "hour": b["ts"].dt.hour.astype("int64"),
                "n": np.int64(1),
            }
        )
        return df.groupby(
            ["event_type", "day", "hour"], as_index=False
        )["n"].sum()

    fine = (
        ds.map_batches(partial, batch_format="pandas")
        .to_pandas()
        .groupby(["event_type", "day", "hour"], as_index=False)["n"]
        .sum()
    )
    n_days = np.int64(fine["day"].nunique())
    tot = fine.groupby(["event_type", "hour"])["n"].transform("sum")
    n = fine["n"].to_numpy(np.int64)
    hour_total = tot.to_numpy(np.int64)
    out = fine.assign(
        n=n,
        hour_total=hour_total,
        ratio_bp=(n * n_days * 10_000 // hour_total).astype("int64"),
    )
    out = out[n * n_days > 2 * hour_total]
    return out.sort_values(
        ["event_type", "day", "hour"], kind="stable"
    ).reset_index(drop=True)


SEASONAL_OUTLIERS_SQL = """
WITH cells AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
         CAST(hour(ts) AS BIGINT) AS hour, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2, 3
), d AS (
  SELECT CAST(count(DISTINCT day) AS BIGINT) AS n_days FROM cells
), tot AS (
  SELECT event_type, hour, CAST(sum(n) AS BIGINT) AS hour_total
  FROM cells GROUP BY 1, 2
)
SELECT c.event_type, c.day, c.hour, c.n, t.hour_total,
       CAST(c.n * d.n_days * 10000 // t.hour_total AS BIGINT) AS ratio_bp
FROM cells c
JOIN tot t USING (event_type, hour)
CROSS JOIN d
WHERE c.n * d.n_days > 2 * t.hour_total
ORDER BY c.event_type, c.day, c.hour
"""


def events_cusum_drift(sf_dir: str):
    """CUSUM change-point detection per event type over the daily value
    series — the sequential drift detector (Page 1954) that flags when a
    metric's level shifts. The recurrence ``S_d = max(0, S_{d-1} + (x_d −
    k))`` is not directly a SQL window, but the identity ``S_d = P_d −
    min(P_1..P_d)`` with ``P = cumsum(x − k)`` makes it one (prefix sum
    minus running minimum) — so both engines compute the exact same
    integer series. Reference level ``k`` = the type's mean daily cents
    (floor division — integer, shared derivation); drift flag when the
    CUSUM exceeds ``k`` (one mean-day of accumulated excess). Output one
    row per (event_type, day): cusum_cents, drift_flag.

    Scale shape: per-batch partial (type, day, cents) sums → a bounded
    types×days fold; the window algebra runs vectorized on the tiny
    driver frame (the ``events_share_of_day`` pattern)."""
    ds = C.read(sf_dir, "events", ["event_type", "ts", "value"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        # floor(x*100): the repo's established exact cents convention
        cents = np.floor(b["value"].to_numpy("float64") * 100.0).astype("int64")
        df = pd.DataFrame(
            {
                "event_type": b["event_type"],
                "day": b["ts"].dt.strftime("%Y-%m-%d"),
                "cents": cents,
            }
        )
        return df.groupby(["event_type", "day"], as_index=False)["cents"].sum()

    fine = (
        ds.map_batches(partial, batch_format="pandas")
        .to_pandas()
        .groupby(["event_type", "day"], as_index=False)["cents"]
        .sum()
        .sort_values(["event_type", "day"], kind="stable")
        .reset_index(drop=True)
    )
    et = fine["event_type"].to_numpy(dtype=object)
    cents = fine["cents"].to_numpy(np.int64)
    new = np.ones(len(fine), bool)
    new[1:] = et[1:] != et[:-1]
    starts = np.flatnonzero(new)
    counts = np.diff(np.append(starts, len(fine)))
    totals = np.add.reduceat(cents, starts)
    k = np.repeat(totals // counts, counts)  # per-type mean daily cents
    dev = cents - k
    # segmented cumsum: global cumsum minus each segment's pre-offset
    csum = np.cumsum(dev)
    seg_off = np.repeat(
        np.concatenate(([0], csum[starts[1:] - 1])), counts
    )
    p = csum - seg_off
    # segmented running min: accumulate restarted per type segment
    # (O(types) loop, vector body)
    runmin = p.copy()
    for i, s0 in enumerate(starts):
        e0 = s0 + counts[i]
        runmin[s0:e0] = np.minimum.accumulate(p[s0:e0])
    cusum = p - np.minimum(runmin, 0)
    out = pd.DataFrame(
        {
            "event_type": et,
            "day": fine["day"].to_numpy(dtype=object),
            "cusum_cents": cusum.astype("int64"),
            "drift_flag": (cusum > np.repeat(totals // counts, counts)),
        }
    )
    return out


CUSUM_SQL = """
WITH daily AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
         CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
), k AS (
  SELECT event_type, CAST(sum(cents) // count(*) AS BIGINT) AS kref
  FROM daily GROUP BY 1
), pf AS (
  SELECT d.event_type, d.day, k.kref,
         sum(d.cents - k.kref) OVER (
           PARTITION BY d.event_type ORDER BY d.day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
  FROM daily d JOIN k USING (event_type)
), r AS (
  SELECT event_type, day, kref, p,
         min(p) OVER (PARTITION BY event_type ORDER BY day
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS runmin
  FROM pf
)
SELECT event_type, day,
       CAST(p - least(runmin, 0) AS BIGINT) AS cusum_cents,
       (p - least(runmin, 0)) > kref AS drift_flag
FROM r ORDER BY event_type, day
"""


BURST_WINDOW_US = 86_400_000_000  # trailing 24 h


def events_burst_velocity(sf_dir: str):
    """Per-user BURST VELOCITY: the maximum number of events in any
    trailing 24-hour window — the time-RANGE window-frame class (``RANGE
    BETWEEN x PRECEDING AND CURRENT ROW``), distinct from the ROWS-frame
    family (``events_rolling_window``): the frame is defined by VALUE
    distance, so peers with equal timestamps count together. The
    rate-limit / abuse-velocity primitive.

    Scale shape: user-keyed bounded partitions; inside each partition ONE
    vectorized two-rank pass — ``lex_searchsorted_left`` (the composite-
    key-overflow-safe merge-by-sorting helper) gives, per event, the
    count of same-user events in ``(t − 24h, t]`` as a difference of two
    lexicographic ranks; the per-user max folds with ``maximum.reduceat``.
    Integer µs arithmetic end to end — no timezone or float drift."""
    ds = C.read(sf_dir, "events", ["user_id", "event_id", "ts"])

    _EMPTY = pd.DataFrame(
        {
            "user_id": pd.Series(dtype="int64"),
            "max_burst": pd.Series(dtype="int64"),
        }
    )

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return _EMPTY
        d = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        u = d["user_id"].to_numpy(np.int64)
        t = d["ts"].astype("datetime64[us]").to_numpy().view("int64")
        hi = C.lex_searchsorted_left(u, t, u, t + 1)
        lo = C.lex_searchsorted_left(u, t, u, t - BURST_WINDOW_US + 1)
        c = hi - lo
        newu = np.ones(len(u), bool)
        newu[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(newu)
        mx = np.maximum.reduceat(c, starts)
        return pd.DataFrame(
            {
                "user_id": u[starts].astype("int64"),
                "max_burst": mx.astype("int64"),
            }
        )

    return C.by_partition(ds, "user_id", kernel)


BURST_VELOCITY_SQL = f"""
WITH e AS (
  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS t FROM events
), w AS (
  SELECT user_id,
         count(*) OVER (PARTITION BY user_id ORDER BY t
                        RANGE BETWEEN {BURST_WINDOW_US - 1} PRECEDING
                        AND CURRENT ROW) AS c
  FROM e
)
SELECT user_id, CAST(max(c) AS BIGINT) AS max_burst
FROM w GROUP BY user_id
"""


# -- exact Pearson correlation from integer moment sums ------------------------

def events_value_time_corr(sf_dir: str):
    """Pearson correlation between ``value`` and hour-of-day per event
    type, EXACT to the bit across engines: the five moment sums
    (Σx, Σy, Σxy, Σx², Σy²) fold as int64 (x = value cents, y = hour) —
    distributive, mergeable, order-independent — and both sides evaluate
    the SAME fixed float expression on those exact integers (every step
    correctly rounded: cast, ·, −, √, ÷), so no Welford-order noise can
    flip the 4th digit. One bounded pass, driver state O(types).
    Overflow bound: Σx² < 2^63 holds to ~3·10^9 rows per type at this
    value range; beyond that the partials fold in float128/two int64
    limbs — the pipeline shape is unchanged."""
    ds = C.read(sf_dir, "events", ["event_type", "ts", "value"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        x = np.floor(b["value"].to_numpy() * 100.0).astype(np.int64)
        y = b["ts"].dt.hour.to_numpy().astype(np.int64)
        df = pd.DataFrame(
            {
                "event_type": b["event_type"],
                "n": np.int64(1),
                "sx": x,
                "sy": y,
                "sxy": x * y,
                "sxx": x * x,
                "syy": y * y,
            }
        )
        return df.groupby("event_type", as_index=False).sum()

    agg = (
        ds.map_batches(partial, batch_format="pandas")
        .to_pandas()
        .groupby("event_type", as_index=False)
        .sum()
    )
    n = agg["n"].astype("float64")
    sx = agg["sx"].astype("float64")
    sy = agg["sy"].astype("float64")
    cov = n * agg["sxy"].astype("float64") - sx * sy
    vx = n * agg["sxx"].astype("float64") - sx * sx
    vy = n * agg["syy"].astype("float64") - sy * sy
    out = pd.DataFrame(
        {
            "event_type": agg["event_type"],
            "n": agg["n"].astype("int64"),
            "corr_value_hour": (cov / (np.sqrt(vx) * np.sqrt(vy))).round(
                C.ROUND_DIGITS
            ),
        }
    )
    return out.sort_values("event_type", kind="stable").reset_index(drop=True)


VALUE_TIME_CORR_SQL = """
WITH m AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         sum(CAST(floor(value * 100) AS BIGINT)) AS sx,
         sum(CAST(hour(ts) AS BIGINT)) AS sy,
         sum(CAST(floor(value * 100) AS BIGINT) * hour(ts)) AS sxy,
         sum(CAST(floor(value * 100) AS BIGINT)
             * CAST(floor(value * 100) AS BIGINT)) AS sxx,
         sum(CAST(hour(ts) AS BIGINT) * hour(ts)) AS syy
  FROM events GROUP BY event_type
)
SELECT event_type, n,
       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 4)
           AS corr_value_hour
FROM m ORDER BY event_type
"""


# -- set difference over derived audiences -------------------------------------

def events_audience_except(sf_dir: str):
    """Signed-up users who never purchased — the EXCEPT / set-difference
    class, collapsed to ONE conditional aggregate pass: each batch emits
    per-user (has_signup, has_purchase) flag partials (max is the
    distributive OR), the user-keyed fold is a native vectorized
    aggregate, and the difference is a flag filter — no second scan, no
    anti-join shuffle of two derived sets."""
    import pyarrow.dataset as pads

    from ray.data.aggregate import Max as AggMax

    ds = C.read(
        sf_dir,
        "events",
        ["user_id", "event_type"],
        filter=pads.field("event_type").isin(["signup", "purchase"]),
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        et = b["event_type"].to_numpy()
        df = pd.DataFrame(
            {
                "user_id": b["user_id"].astype("int64"),
                "s": (et == "signup").astype(np.int64),
                "p": (et == "purchase").astype(np.int64),
            }
        )
        return df.groupby("user_id", as_index=False).max()

    folded = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("user_id")
        .aggregate(AggMax("s", alias_name="s"), AggMax("p", alias_name="p"))
        .to_pandas()
    )
    hit = folded[(folded["s"] == 1) & (folded["p"] == 0)]
    out = pd.DataFrame({"user_id": hit["user_id"].astype("int64")})
    return out.sort_values("user_id", kind="stable").reset_index(drop=True)


AUDIENCE_EXCEPT_SQL = """
SELECT DISTINCT user_id FROM events WHERE event_type = 'signup'
EXCEPT
SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
ORDER BY user_id
"""


# -- period-over-period growth (LAG on the aggregate grain) --------------------

def events_daily_growth(sf_dir: str):
    """Per (event_type, day): event count and the integer delta vs the
    type's PREVIOUS ACTIVE day — LAG at the aggregate grain. The grain is
    bounded (types × days), so the distributed work is one partial-count
    pass; the window is a driver-side shift over the tiny folded frame
    (first day of a type ships delta 0, matching COALESCE(n − lag(n), 0)).
    All-integer — no float anywhere."""
    ds = C.read(sf_dir, "events", ["event_type", "ts"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "event_type": b["event_type"],
                "day": b["ts"].dt.strftime("%Y-%m-%d"),
                "n": np.int64(1),
            }
        )
        return df.groupby(["event_type", "day"], as_index=False)["n"].sum()

    fine = (
        ds.map_batches(partial, batch_format="pandas")
        .to_pandas()
        .groupby(["event_type", "day"], as_index=False)["n"]
        .sum()
        .sort_values(["event_type", "day"], kind="stable")
        .reset_index(drop=True)
    )
    prev = fine.groupby("event_type")["n"].shift(1)
    fine["n"] = fine["n"].astype("int64")
    fine["delta"] = (fine["n"] - prev.fillna(fine["n"])).astype("int64")
    return fine


DAILY_GROWTH_SQL = """
WITH c AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, count(*) AS n
  FROM events GROUP BY event_type, day
)
SELECT event_type, day, CAST(n AS BIGINT) AS n,
       CAST(COALESCE(n - lag(n) OVER (PARTITION BY event_type ORDER BY day),
                     0) AS BIGINT) AS delta
FROM c ORDER BY event_type, day
"""


# -- per-day P50/P95 bands via sort-free selection -------------------------------

def events_daily_p50_p95(sf_dir: str):
    """Per-day P50/P95 value bands (discrete order statistics at ranks
    ``floor(f·(n−1))``, integer cents) — the ops-dashboard staple, done
    the SCALABLE way: where :func:`events_value_quantiles` co-locates
    each group (fine for a bounded type axis), days × values here run
    through :func:`_ranks_smallest_by` — two bounded histogram passes
    serve ALL days and BOTH ranks at once, no per-group sort, driver
    state O(days × buckets). All-integer output."""
    import ray as _ray  # noqa: F401  (parallel with sibling selection ops)

    ds = C.read(sf_dir, "events", ["ts", "value"])

    def to_cents(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "day": b["ts"].dt.strftime("%Y-%m-%d").astype(object),
                "v": np.floor(b["value"].to_numpy() * 100.0).astype(np.int64),
            }
        )

    cents = ds.map_batches(to_cents, batch_format="pandas").materialize()

    def pcount(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("day", as_index=False).size()
        return pd.DataFrame({"day": g["day"], "n": g["size"].astype("int64")})

    counts = (
        cents.map_batches(pcount, batch_format="pandas")
        .to_pandas()
        .groupby("day", as_index=False)["n"]
        .sum()
    )
    n_by = dict(zip(counts["day"], counts["n"].astype(int)))
    k50 = {d: int(np.floor(0.5 * (n - 1))) for d, n in n_by.items()}
    k95 = {d: int(np.floor(0.95 * (n - 1))) for d, n in n_by.items()}
    ks = {d: sorted({k50[d], k95[d]}) for d in n_by}
    sel = _ranks_smallest_by(cents, "day", "v", ks)
    out = pd.DataFrame(
        {
            "day": sorted(n_by),
            "p50_cents": [sel[(d, k50[d])] for d in sorted(n_by)],
            "p95_cents": [sel[(d, k95[d])] for d in sorted(n_by)],
        }
    )
    out["p50_cents"] = out["p50_cents"].astype("int64")
    out["p95_cents"] = out["p95_cents"].astype("int64")
    return out.reset_index(drop=True)


DAILY_P50_P95_SQL = """
WITH c AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day,
         CAST(floor(value * 100) AS BIGINT) AS v
  FROM events
), r AS (
  SELECT day, v,
         row_number() OVER (PARTITION BY day ORDER BY v) - 1 AS rk,
         count(*) OVER (PARTITION BY day) AS n
  FROM c
)
SELECT day,
       max(CASE WHEN rk = CAST(floor(0.5 * (n - 1)) AS BIGINT)
                THEN v END) AS p50_cents,
       max(CASE WHEN rk = CAST(floor(0.95 * (n - 1)) AS BIGINT)
                THEN v END) AS p95_cents
FROM r GROUP BY day ORDER BY day
"""


# -- daily type-mix diversity (Gini impurity) ------------------------------------

def events_daily_gini(sf_dir: str):
    """Per-day Gini impurity of the event-type mix — the diversity /
    concentration screen (a day dominated by one type scores near 0).
    Integer basis points end-to-end: ``gini_bp = (n² − Σcᵢ²)·10⁴ // n²``
    from exact int64 cell counts over the bounded (day × type) grain —
    the float ratio form lands on dyadic half-ties (the share_of_day
    lesson). One distributed partial-count pass; the driver fold is
    O(days × types)."""
    ds = C.read(sf_dir, "events", ["event_type", "ts"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "day": b["ts"].dt.strftime("%Y-%m-%d"),
                "event_type": b["event_type"],
                "n": np.int64(1),
            }
        )
        return df.groupby(["day", "event_type"], as_index=False)["n"].sum()

    cells = (
        ds.map_batches(partial, batch_format="pandas")
        .to_pandas()
        .groupby(["day", "event_type"], as_index=False)["n"]
        .sum()
    )
    # unbounded-width Python ints over the bounded grain: n²·10⁴ would
    # overflow int64 once a day carries >~10⁹ events (SQL side: HUGEINT)
    rows = []
    for d, sub in cells.groupby("day"):
        n = int(sub["n"].sum())
        s2 = sum(int(c) ** 2 for c in sub["n"])
        rows.append(
            {"day": d, "n": n, "gini_bp": (n * n - s2) * 10_000 // (n * n)}
        )
    out = pd.DataFrame(rows)
    out["n"] = out["n"].astype("int64")
    out["gini_bp"] = out["gini_bp"].astype("int64")
    return out.sort_values("day", kind="stable").reset_index(drop=True)


DAILY_GINI_SQL = """
WITH cell AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day, event_type, count(*) AS c
  FROM events GROUP BY day, event_type
), d AS (
  SELECT day, sum(c) AS n, sum(c * c) AS s2 FROM cell GROUP BY day
)
SELECT day, CAST(n AS BIGINT) AS n,
       CAST((n * n - s2) * 10000 // (n * n) AS BIGINT) AS gini_bp
FROM d ORDER BY day
"""


# -- contingency-table independence (chi-square cells) --------------------------

def events_type_hour_indep(sf_dir: str):
    """Per-cell chi-square decomposition of the (event_type × hour)
    contingency table — observed count, independence-expected count, and
    the cell's χ² contribution (the data-drift / feature-dependence
    screen). Exactness: all marginals fold as int64 over the BOUNDED
    grain (one distributed partial-count pass, driver state
    O(types × 24)); the derived cells are INTEGER BASIS POINTS via pure
    integer floor division — ``E_bp = r·c·10⁴ // n`` and
    ``χ²_bp = (o·n − r·c)²·10⁴ // (n·r·c)`` — because the float ratios
    land on exact half-ties (dyadic rationals) where numpy rounds
    half-even and SQL half-away. The squared numerator exceeds int64, so
    the bounded driver-side cells use Python ints (SQL side: HUGEINT)."""
    ds = C.read(sf_dir, "events", ["event_type", "ts"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "event_type": b["event_type"],
                "hour": b["ts"].dt.hour.astype("int64"),
                "obs": np.int64(1),
            }
        )
        return df.groupby(["event_type", "hour"], as_index=False)["obs"].sum()

    cells = (
        ds.map_batches(partial, batch_format="pandas")
        .to_pandas()
        .groupby(["event_type", "hour"], as_index=False)["obs"]
        .sum()
    )
    r = cells.groupby("event_type")["obs"].transform("sum").astype("int64")
    c = cells.groupby("hour")["obs"].transform("sum").astype("int64")
    n = int(cells["obs"].sum())
    # unbounded-width integer arithmetic over the tiny bounded grain
    exp_bp = [int(ri) * int(ci) * 10_000 // n for ri, ci in zip(r, c)]
    chi_bp = [
        (int(oi) * n - int(ri) * int(ci)) ** 2 * 10_000
        // (n * int(ri) * int(ci))
        for oi, ri, ci in zip(cells["obs"], r, c)
    ]
    cells["obs"] = cells["obs"].astype("int64")
    cells["expected_bp"] = pd.Series(exp_bp, dtype="int64")
    cells["chi2_bp"] = pd.Series(chi_bp, dtype="int64")
    return cells.sort_values(
        ["event_type", "hour"], kind="stable"
    ).reset_index(drop=True)


TYPE_HOUR_INDEP_SQL = """
WITH cell AS (
  SELECT event_type, CAST(hour(ts) AS BIGINT) AS hour, count(*) AS o
  FROM events GROUP BY event_type, hour
), m AS (
  SELECT event_type, hour, o,
         sum(o) OVER (PARTITION BY event_type) AS r,
         sum(o) OVER (PARTITION BY hour) AS c,
         sum(o) OVER () AS n
  FROM cell
)
SELECT event_type, hour, CAST(o AS BIGINT) AS obs,
       CAST(r * c * 10000 // n AS BIGINT) AS expected_bp,
       CAST((o * n - r * c) * (o * n - r * c) * 10000
            // (n * r * c) AS BIGINT) AS chi2_bp
FROM m ORDER BY event_type, hour
"""


# -- UNPIVOT (melt) back to long form -------------------------------------------

def events_daily_type_unpivot(sf_dir: str):
    """UNPIVOT: the wide per-day crosstab melted back to long
    (day, metric, n) rows — the melt half of the pivot/unpivot pair
    (wide telemetry → long for storage/joins). Composes the still-lazy
    pivot with one vectorized per-batch melt (`pd.melt` is a reshape,
    no per-row Python); zero-count cells are kept, mirroring SQL
    UNPIVOT INCLUDE NULLS semantics on a dense crosstab. The melt
    multiplies rows only by the bounded type axis."""
    wide = events_daily_type_pivot(sf_dir)

    value_cols = [c for c in wide.columns if c.startswith("n_")]
    out = wide.melt(
        id_vars=["day"], value_vars=value_cols,
        var_name="metric", value_name="n",
    )
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["day", "metric"], kind="stable").reset_index(
        drop=True
    )


UNPIVOT_SQL = f"""
WITH wide AS ({{pivot}})
SELECT day, metric, CAST(n AS BIGINT) AS n
FROM wide UNPIVOT INCLUDE NULLS (n FOR metric IN (
  n_click, n_error, n_purchase, n_signup, n_view))
ORDER BY day, metric
"""


# -- strict 3-step ordered funnel -------------------------------------------------

def events_funnel3(sf_dir: str):
    """Users completing the strictly-ordered view → click → purchase
    funnel, with each stage's timestamp — the greedy earliest-chain
    (first view, first click strictly after it, first purchase strictly
    after that), which is exact for existence: if ANY ordered triple
    exists, the greedy one does. Unlike the 2-step funnel's per-type
    extremes, the chain is order-dependent, so users co-locate in bounded
    partitions and one vectorized kernel runs three masked groupby-mins
    (no row loops). Read pruned to the three stage types."""
    import pyarrow.dataset as pads

    STAGES = ("view", "click", "purchase")
    ds = C.read(
        sf_dir,
        "events",
        ["user_id", "event_type", "ts"],
        filter=pads.field("event_type").isin(list(STAGES)),
    )

    _EMPTY = pd.DataFrame(
        {
            "user_id": pd.Series(dtype="int64"),
            "view_ts": pd.Series(dtype="datetime64[us]"),
            "click_ts": pd.Series(dtype="datetime64[us]"),
            "purchase_ts": pd.Series(dtype="datetime64[us]"),
        }
    )

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return _EMPTY
        u = g["user_id"].to_numpy(np.int64)
        t = g["ts"].astype("datetime64[us]").to_numpy().view("int64")
        et = g["event_type"].to_numpy()
        NOMIN = np.iinfo(np.int64).max

        def chain_min(mask: np.ndarray, after: "pd.Series | None") -> pd.Series:
            tt = np.where(mask, t, NOMIN)
            if after is not None:
                lo = after.reindex(u).to_numpy()
                tt = np.where(np.isnan(lo) | (tt <= lo), NOMIN, tt)
            s = pd.DataFrame({"u": u, "t": tt}).groupby("u")["t"].min()
            return s[s != NOMIN].astype("float64")

        mv = chain_min(et == STAGES[0], None)
        mc = chain_min(et == STAGES[1], mv)
        mp = chain_min(et == STAGES[2], mc)
        if not len(mp):
            return _EMPTY
        users = mp.index.to_numpy(np.int64)
        return pd.DataFrame(
            {
                "user_id": users,
                "view_ts": mv.reindex(users).astype("int64")
                .to_numpy().view("datetime64[us]"),
                "click_ts": mc.reindex(users).astype("int64")
                .to_numpy().view("datetime64[us]"),
                "purchase_ts": mp.reindex(users).astype("int64")
                .to_numpy().view("datetime64[us]"),
            }
        )

    out = C.by_partition(ds, "user_id", kernel).to_pandas()
    if len(out) == 0:
        return _EMPTY
    return out.sort_values("user_id", kind="stable").reset_index(drop=True)


FUNNEL3_SQL = """
WITH v AS (
  SELECT user_id, min(ts) AS view_ts FROM events
  WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, min(e.ts) AS click_ts
  FROM events e JOIN v USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > v.view_ts
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, min(e.ts) AS purchase_ts
  FROM events e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > c.click_ts
  GROUP BY e.user_id
)
SELECT p.user_id, v.view_ts, c.click_ts, p.purchase_ts
FROM p JOIN c USING (user_id) JOIN v USING (user_id)
ORDER BY p.user_id
"""


# -- conversion-lag distribution ------------------------------------------------

def events_conversion_lag(sf_dir: str):
    """Histogram of signup→purchase conversion lag in whole days: for each
    user, the FIRST purchase at-or-after their FIRST signup — the funnel
    variant that needs an ORDER-dependent pair (min-over-a-conditional-
    subset is not distributive from per-type extremes alone). Shape:
    read pruned to the two event types, user-keyed bounded partitions,
    one vectorized kernel per partition (each user's events co-locate, so
    per-user firsts are exact), per-partition partial histograms over the
    BOUNDED day grain fold on the driver. Lag arithmetic is integer µs →
    floor-div days — no float anywhere."""
    import pyarrow.dataset as pads

    ds = C.read(
        sf_dir,
        "events",
        ["user_id", "event_type", "ts"],
        filter=pads.field("event_type").isin(["signup", "purchase"]),
    )
    _US_DAY = 86_400_000_000

    _EMPTY = pd.DataFrame(
        {
            "lag_days": pd.Series(dtype="int64"),
            "n_users": pd.Series(dtype="int64"),
        }
    )

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return _EMPTY
        t = g["ts"].astype("datetime64[us]").to_numpy().view("int64")
        u = g["user_id"].to_numpy(np.int64)
        is_s = g["event_type"].to_numpy() == "signup"
        d = pd.DataFrame(
            {
                "u": u,
                "s": np.where(is_s, t, np.iinfo(np.int64).max),
                "p": np.where(~is_s, t, np.iinfo(np.int64).max),
            }
        )
        first = d.groupby("u").min()  # first signup per user (exact: co-located)
        # first purchase AT-OR-AFTER the first signup: mask then min
        pp = pd.DataFrame(
            {
                "u": u[~is_s],
                "t": t[~is_s],
                "su": first["s"].reindex(u[~is_s]).to_numpy(),
            }
        )
        pp = pp[pp["t"] >= pp["su"]]
        if not len(pp):
            return _EMPTY
        conv = pp.groupby("u")["t"].min()
        lag = (
            conv.to_numpy() - first["s"].reindex(conv.index).to_numpy()
        ) // _US_DAY
        vc = pd.Series(lag).value_counts()
        return pd.DataFrame(
            {
                "lag_days": vc.index.to_numpy(np.int64),
                "n_users": vc.to_numpy(np.int64),
            }
        )

    parts = C.by_partition(ds, "user_id", kernel).to_pandas()
    if len(parts) == 0:
        return _EMPTY
    out = parts.groupby("lag_days", as_index=False)["n_users"].sum()
    out["lag_days"] = out["lag_days"].astype("int64")
    out["n_users"] = out["n_users"].astype("int64")
    return out.sort_values("lag_days", kind="stable").reset_index(drop=True)


CONVERSION_LAG_SQL = """
WITH s AS (
  SELECT user_id, min(epoch_us(ts)) AS su FROM events
  WHERE event_type = 'signup' GROUP BY user_id
), p AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS pu
  FROM events e JOIN s ON s.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= s.su
  GROUP BY e.user_id
)
SELECT CAST((p.pu - s.su) // 86400000000 AS BIGINT) AS lag_days,
       CAST(count(*) AS BIGINT) AS n_users
FROM p JOIN s ON s.user_id = p.user_id
GROUP BY lag_days ORDER BY lag_days
"""


# -- event-type transition matrix (sequence mining) ----------------------------

def events_type_transitions(sf_dir: str):
    """Markov transition counts between CONSECUTIVE event types within
    each user's timeline — the sequence-mining grain behind session-flow
    and next-action models. Distributed shape: user-keyed bounded
    partitions (adjacency needs co-located, ordered users), one
    vectorized kernel — lexsort by (user, ts, event_id), shifted type
    arrays with a user-boundary mask — emitting per-partition partial
    counts over the BOUNDED (types × types) grain; the driver folds
    O(types² × partitions) rows. All-integer."""
    ds = C.read(sf_dir, "events", ["user_id", "event_id", "ts", "event_type"])

    _EMPTY = pd.DataFrame(
        {
            "from_type": pd.Series(dtype=object),
            "to_type": pd.Series(dtype=object),
            "n": pd.Series(dtype="int64"),
        }
    )

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return _EMPTY
        d = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        u = d["user_id"].to_numpy(np.int64)
        et = d["event_type"].to_numpy(dtype=object)
        same = u[:-1] == u[1:]
        pairs = pd.DataFrame(
            {"from_type": et[:-1][same], "to_type": et[1:][same]}
        )
        out = pairs.groupby(
            ["from_type", "to_type"], as_index=False
        ).size().rename(columns={"size": "n"})
        out["n"] = out["n"].astype("int64")
        return out

    parts = C.by_partition(ds, "user_id", kernel).to_pandas()
    if len(parts) == 0:
        return _EMPTY
    out = parts.groupby(["from_type", "to_type"], as_index=False)["n"].sum()
    out["n"] = out["n"].astype("int64")
    return out.sort_values(
        ["from_type", "to_type"], kind="stable"
    ).reset_index(drop=True)


TYPE_TRANSITIONS_SQL = """
WITH o AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events
)
SELECT event_type AS from_type, next_type AS to_type,
       CAST(count(*) AS BIGINT) AS n
FROM o WHERE next_type IS NOT NULL
GROUP BY from_type, to_type
ORDER BY from_type, to_type
"""


PATH_TRIGRAMS_TOPK = 20


def events_path_trigrams(sf_dir: str):
    """User-journey mining: the top-{k} most common CONSECUTIVE
    three-event type sequences across all user timelines (the 3-gram
    extension of ``events_type_transitions`` — the grain funnel-discovery
    and next-action models train on). Deterministic contract: top
    {k} by count desc, path string asc on ties. Distributed shape:
    user-keyed bounded partitions (adjacency needs co-located, ordered
    users), one vectorized kernel — lexsort, doubly-shifted type arrays
    with a user-boundary mask — emitting partial counts over the bounded
    (types³) grain; the driver folds O(types³ × partitions) rows and
    takes the top k.""".format(k=PATH_TRIGRAMS_TOPK)
    ds = C.read(sf_dir, "events", ["user_id", "event_id", "ts", "event_type"])

    _EMPTY = pd.DataFrame(
        {"path": pd.Series(dtype=object), "n": pd.Series(dtype="int64")}
    )

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 3:
            return _EMPTY
        d = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        u = d["user_id"].to_numpy(np.int64)
        et = d["event_type"].to_numpy(dtype=object)
        same = (u[:-2] == u[1:-1]) & (u[1:-1] == u[2:])
        if not same.any():
            return _EMPTY
        a, b, c = et[:-2][same], et[1:-1][same], et[2:][same]
        path = pd.Series(a) + ">" + pd.Series(b) + ">" + pd.Series(c)
        out = path.value_counts().rename_axis("path").reset_index(name="n")
        out["n"] = out["n"].astype("int64")
        return out[["path", "n"]]

    parts = C.by_partition(ds, "user_id", kernel).to_pandas()
    if len(parts) == 0:
        return _EMPTY
    out = parts.groupby("path", as_index=False)["n"].sum()
    out["n"] = out["n"].astype("int64")
    out = out.sort_values(
        ["n", "path"], ascending=[False, True], kind="stable"
    ).head(PATH_TRIGRAMS_TOPK)
    return out.reset_index(drop=True)


PATH_TRIGRAMS_SQL = f"""
WITH o AS (
  SELECT user_id, event_type,
         lead(event_type, 1) OVER w AS t2,
         lead(event_type, 2) OVER w AS t3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT event_type || '>' || t2 || '>' || t3 AS path,
       CAST(count(*) AS BIGINT) AS n
FROM o WHERE t3 IS NOT NULL
GROUP BY path
ORDER BY n DESC, path ASC
LIMIT {PATH_TRIGRAMS_TOPK}
"""


# -- time-weighted average over irregular samples ------------------------------

def events_time_weighted_avg(sf_dir: str):
    """Per-user time-weighted average of ``value`` — each observation
    holds until the next one (the step-function integral every
    monitoring/market pipeline computes over irregular samples; a plain
    mean over-weights bursts). Exactness: the integral folds as
    Σ vᵢ·Δtᵢ in int64 (cents × µs — bounded by max_cents · user_span
    < 2^63 for spans to ~5 years at this value range), the divisor
    Σ Δtᵢ likewise; ONE IEEE division at the end. Distributed shape:
    user-keyed bounded partitions, one vectorized kernel (lexsort by
    (user, ts, event_id), shifted arrays with a user-boundary mask) —
    adjacent-pair semantics need co-located users, never a global sort."""
    ds = C.read(sf_dir, "events", ["user_id", "event_id", "ts", "value"])

    _EMPTY = pd.DataFrame(
        {
            "user_id": pd.Series(dtype="int64"),
            "twa": pd.Series(dtype="float64"),
        }
    )

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return _EMPTY
        d = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        u = d["user_id"].to_numpy(np.int64)
        t = d["ts"].astype("datetime64[us]").to_numpy().view("int64")
        v = np.floor(d["value"].to_numpy() * 100.0).astype(np.int64)
        same = np.zeros(len(d), bool)
        same[:-1] = u[:-1] == u[1:]
        gap = np.zeros(len(d), np.int64)
        gap[:-1] = t[1:] - t[:-1]
        gap[~same] = 0
        w = pd.DataFrame({"user_id": u, "num": v * gap, "den": gap})
        agg = w.groupby("user_id", as_index=False).sum()
        agg = agg[agg["den"] > 0]
        return pd.DataFrame(
            {
                "user_id": agg["user_id"].astype("int64"),
                "twa": (
                    agg["num"].to_numpy(np.float64)
                    / (100.0 * agg["den"].to_numpy(np.float64))
                ).round(C.ROUND_DIGITS),
            }
        )

    out = C.by_partition(ds, "user_id", kernel).to_pandas()
    if len(out) == 0:
        return _EMPTY
    return out.sort_values("user_id", kind="stable").reset_index(drop=True)


TIME_WEIGHTED_AVG_SQL = """
WITH o AS (
  SELECT user_id, CAST(floor(value * 100) AS BIGINT) AS v,
         epoch_us(ts) AS t,
         lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS nt
  FROM events
)
SELECT user_id,
       round(CAST(sum(v * (nt - t)) AS DOUBLE)
             / (100.0 * CAST(sum(nt - t) AS DOUBLE)), 4) AS twa
FROM o WHERE nt IS NOT NULL
GROUP BY user_id HAVING sum(nt - t) > 0
ORDER BY user_id
"""


# -- distributed skyline (Pareto frontier) -------------------------------------

def _skyline2d(s: np.ndarray, n: np.ndarray) -> np.ndarray:
    """Keep mask of the 2-D maxima skyline: point i survives iff no point
    has (s ≥ sᵢ, n ≥ nᵢ) with one strict. Vectorized: one descending
    lexsort; a point is dominated iff the max n over STRICTLY-greater-s
    points reaches its n, or an equal-s point strictly exceeds its n
    (ties on both coordinates survive together). O(k log k), no pairs."""
    k = len(s)
    if k == 0:
        return np.zeros(0, bool)
    order = np.lexsort((-n, -s))
    ss, nn = s[order], n[order]
    new_blk = np.ones(k, bool)
    new_blk[1:] = ss[1:] != ss[:-1]
    bid = np.cumsum(new_blk) - 1
    nb = int(bid[-1]) + 1
    blk_max = np.full(nb, np.iinfo(np.int64).min, np.int64)
    np.maximum.at(blk_max, bid, nn)
    prior = np.full(nb, np.iinfo(np.int64).min, np.int64)
    if nb > 1:
        prior[1:] = np.maximum.accumulate(blk_max)[:-1]
    keep_sorted = (nn > prior[bid]) & (nn == blk_max[bid])
    keep = np.zeros(k, bool)
    keep[order] = keep_sorted
    return keep


def users_pareto_frontier(sf_dir: str):
    """Users on the (total spend, event count) Pareto frontier — the
    multi-criteria top-k ("skyline") operator. Exactness: spend folds in
    integer cents, domination is pure int64 comparison. Scale shape:
    skylines COMPOSE — ``skyline(A ∪ B) ⊆ skyline(A) ∪ skyline(B)``, so
    each bounded user partition reduces to its local skyline (vectorized
    lexsort + running block max, :func:`_skyline2d`, never the O(k²)
    pair join the SQL oracle runs) and the driver takes the skyline of
    the partial skylines — expected O(log) points per partition, never
    the user table."""
    ds = C.read(sf_dir, "events", ["user_id", "value"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "user_id": b["user_id"].astype("int64"),
                "sum_cents": np.floor(
                    b["value"].to_numpy() * 100.0
                ).astype(np.int64),
                "n_events": np.int64(1),
            }
        )
        return df.groupby("user_id", as_index=False).sum()

    partials = ds.map_batches(partial, batch_format="pandas")

    def local_sky(g: pd.DataFrame) -> pd.DataFrame:
        u = g.groupby("user_id", as_index=False).sum()
        keep = _skyline2d(
            u["sum_cents"].to_numpy(np.int64), u["n_events"].to_numpy(np.int64)
        )
        return u[keep]

    sky = C.by_partition(partials, "user_id", local_sky).to_pandas()
    keep = _skyline2d(
        sky["sum_cents"].to_numpy(np.int64), sky["n_events"].to_numpy(np.int64)
    )
    out = sky[keep].copy()
    out["user_id"] = out["user_id"].astype("int64")
    out["sum_cents"] = out["sum_cents"].astype("int64")
    out["n_events"] = out["n_events"].astype("int64")
    return out.sort_values("user_id", kind="stable").reset_index(drop=True)


PARETO_SQL = """
WITH u AS (
  SELECT user_id,
         CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY user_id
)
SELECT user_id, sum_cents, n_events
FROM u a
WHERE NOT EXISTS (
  SELECT 1 FROM u b
  WHERE b.sum_cents >= a.sum_cents AND b.n_events >= a.n_events
    AND (b.sum_cents > a.sum_cents OR b.n_events > a.n_events))
ORDER BY user_id
"""


# -- cumulative distinct users (running distinct-count) ----------------------

def events_new_users_hourly(sf_dir: str):
    """Hourly new-user counts and the running total of distinct users ever
    seen — the cumulative-COUNT(DISTINCT) class that naive plans answer
    with a per-bucket distinct over an ever-growing prefix (quadratic). The
    scale shape: distinct-ness collapses to each user's FIRST-SEEN hour
    (per-batch arg-min partials → one user-keyed bounded aggregate), the
    per-hour histogram folds to O(hours) driver rows, and the running total
    is a driver cumsum over hours — the prefix-scan state is O(hours),
    never O(users)."""
    from ray.data.aggregate import Min as AggMin

    ds = C.read(sf_dir, "events", ["user_id", "ts"])

    def first_partial(b: pd.DataFrame) -> pd.DataFrame:
        d = b["ts"].dt.floor("h")
        return (
            pd.DataFrame({"user_id": b["user_id"].astype("int64"), "hour": d})
            .groupby("user_id", as_index=False)["hour"]
            .min()
        )

    first = (
        ds.map_batches(first_partial, batch_format="pandas")
        .groupby("user_id")
        .aggregate(AggMin("hour", alias_name="hour"))
    )

    def day_hist(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("hour", as_index=False).size()
        return pd.DataFrame({"hour": g["hour"], "n_new": g["size"].astype("int64")})

    hist = (
        first.map_batches(day_hist, batch_format="pandas")
        .to_pandas()
        .groupby("hour", as_index=False)["n_new"]
        .sum()
        .sort_values("hour")
        .reset_index(drop=True)
    )
    hist["cum_users"] = hist["n_new"].cumsum().astype("int64")
    hist["n_new"] = hist["n_new"].astype("int64")
    return hist


NEW_USERS_SQL = """
WITH f AS (
  SELECT user_id, min(CAST(date_trunc('hour', ts) AS TIMESTAMP)) AS hour
  FROM events GROUP BY user_id
), d AS (
  SELECT hour, count(*) AS n_new FROM f GROUP BY hour
)
SELECT hour, n_new,
       CAST(sum(n_new) OVER (ORDER BY hour) AS BIGINT) AS cum_users
FROM d ORDER BY hour
"""


# -- deterministic per-group sample (portable-hash reservoir) ----------------

GROUP_SAMPLE_K = 10


def events_group_sample(sf_dir: str):
    """Deterministic k-per-group sample: for each event type, the K events
    with the smallest portable hash of their id (ties by id). The
    hash-rank law makes the sample stable across runs, re-shards and
    corpus growth (a kept event only changes if a smaller-hash event
    ARRIVES in its group) — the distributed reservoir-sample stand-in for
    training-data subset selection. Per-batch local top-K per group (bounded K×groups
    rows leave each block), one driver fold of the partials — no shuffle,
    no sort of the corpus."""
    from raycdc import phash as H

    ds = C.read(sf_dir, "events", ["event_id", "event_type"])

    def local(b: pd.DataFrame) -> pd.DataFrame:
        h = H.poly_hash(
            b["event_id"].astype("string").to_numpy(dtype=object)
        ).astype(np.int64)
        df = pd.DataFrame(
            {
                "event_type": b["event_type"].astype(object),
                "event_id": b["event_id"].astype("int64"),
                "h": h,
            }
        )
        return (
            df.sort_values(["event_type", "h", "event_id"], kind="stable")
            .groupby("event_type", as_index=False)
            .head(GROUP_SAMPLE_K)
        )

    cand = ds.map_batches(local, batch_format="pandas").to_pandas()
    out = (
        cand.sort_values(["event_type", "h", "event_id"], kind="stable")
        .groupby("event_type", as_index=False)
        .head(GROUP_SAMPLE_K)
        .reset_index(drop=True)
    )
    return out


def _group_sample_sql() -> str:
    from raycdc import phash as H

    return f"""
WITH h AS (
  SELECT event_type, event_id,
         {H.sql_poly("CAST(event_id AS VARCHAR)")} AS h
  FROM events
)
SELECT event_type, CAST(event_id AS BIGINT) AS event_id, CAST(h AS BIGINT) AS h
FROM (SELECT *, row_number() OVER (
        PARTITION BY event_type ORDER BY h, event_id) AS rn FROM h)
WHERE rn <= {GROUP_SAMPLE_K}
"""


def events_hourly_locf(sf_dir: str):
    """Per-user HOURLY RESAMPLE with last-observation-carried-forward gap
    fill — the time-series regularization step every metrics/feature
    pipeline runs before windowed models (irregular event times → a dense
    hourly grid, missing hours inheriting the last observed value). Grid
    span is per user (first observed hour → last), so output is bounded by
    Σ user spans, never |users| × |corpus span|.

    Shape: ONE bounded-partition shuffle on user_id; inside the partition
    everything is C-speed pandas — hour floor, last-event-per-hour
    dedup (order law: (ts, event_id), the house tie-break), vectorized
    repeat/arange grid synthesis, and a single ``merge_asof`` backward
    join (the LOCF itself). The carried value is an exact COPY of an
    observed double (no arithmetic) → hash-exact cross-engine. The SQL
    oracle is DuckDB's ASOF JOIN — the non-distributed formulation this
    operator replaces at scale."""
    ds = C.read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        d = d.assign(hour=d["ts"].dt.floor("h"))
        obs = d.drop_duplicates(["user_id", "hour"], keep="last")[
            ["user_id", "hour", "value"]
        ]
        spans = obs.groupby("user_id", sort=True)["hour"].agg(["min", "max"])
        h0 = spans["min"].to_numpy()
        h1 = spans["max"].to_numpy()
        counts = (
            (h1 - h0) // np.timedelta64(1, "h")
        ).astype(np.int64) + 1
        total = int(counts.sum())
        uids = np.repeat(spans.index.to_numpy().astype(np.int64), counts)
        cum = np.concatenate([[0], np.cumsum(counts)])
        offs = np.arange(total) - np.repeat(cum[:-1], counts)
        hours = np.repeat(h0, counts) + offs * np.timedelta64(1, "h")
        grid = pd.DataFrame({"user_id": uids, "hour": hours}).sort_values(
            ["hour", "user_id"], kind="stable"
        )
        obs_s = obs.sort_values(["hour", "user_id"], kind="stable")
        m = pd.merge_asof(
            grid, obs_s, on="hour", by="user_id", direction="backward"
        )
        m = m.merge(
            obs[["user_id", "hour"]].assign(observed=np.int64(1)),
            on=["user_id", "hour"],
            how="left",
        )
        return pd.DataFrame(
            {
                "user_id": m["user_id"].astype("int64"),
                "hour": m["hour"].astype("datetime64[us]"),
                "value": m["value"].astype("float64"),
                "observed": m["observed"].fillna(0).astype("int64"),
            }
        )

    return C.by_partition(ds, "user_id", kernel)


HOURLY_LOCF_SQL = """
WITH obs AS (
  SELECT user_id, hour, value FROM (
    SELECT user_id, date_trunc('hour', ts) AS hour, value,
           row_number() OVER (
             PARTITION BY user_id, date_trunc('hour', ts)
             ORDER BY ts DESC, event_id DESC) AS rn
    FROM events)
  WHERE rn = 1
), span AS (
  SELECT user_id, min(hour) AS h0, max(hour) AS h1 FROM obs GROUP BY 1
), grid AS (
  SELECT user_id,
         unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
  FROM span
)
SELECT g.user_id, g.hour, o.value,
       CAST(e.user_id IS NOT NULL AS BIGINT) AS observed
FROM grid g
ASOF JOIN obs o ON o.user_id = g.user_id AND g.hour >= o.hour
LEFT JOIN obs e ON e.user_id = g.user_id AND e.hour = g.hour
"""


QUERIES = {
    "events_hourly_locf": events_hourly_locf,
    "events_new_users_hourly": events_new_users_hourly,
    "events_trimmed_stats": events_trimmed_stats,
    "events_value_ntile": events_value_ntile,
    "events_percent_rank": events_percent_rank,
    "events_share_of_day": events_share_of_day,
    "events_seasonal_outliers": events_seasonal_outliers,
    "events_path_trigrams": events_path_trigrams,
    "events_burst_velocity": events_burst_velocity,
    "events_cusum_drift": events_cusum_drift,
    "events_value_time_corr": events_value_time_corr,
    "users_pareto_frontier": users_pareto_frontier,
    "events_audience_except": events_audience_except,
    "events_daily_growth": events_daily_growth,
    "events_time_weighted_avg": events_time_weighted_avg,
    "events_type_transitions": events_type_transitions,
    "events_conversion_lag": events_conversion_lag,
    "events_funnel3": events_funnel3,
    "events_daily_type_unpivot": events_daily_type_unpivot,
    "events_type_hour_indep": events_type_hour_indep,
    "events_daily_p50_p95": events_daily_p50_p95,
    "events_daily_gini": events_daily_gini,
    "events_group_sample": events_group_sample,
    "events_session_concurrency": events_session_concurrency,
    "events_value_mad_outliers": events_value_mad_outliers,
    "events_type_moments": events_type_moments,
    "events_asof_orders": events_asof_orders,
    "events_value_outliers": events_value_outliers,
    "events_value_delta": events_value_delta,
    "events_latest_per_user": events_latest_per_user,
    "events_hourly_stats": events_hourly_stats,
    "events_user_daily": events_user_daily,
    "events_type_stats": events_type_stats,
    "events_sessionize": events_sessionize,
    "events_session_overlap": events_session_overlap,
    "events_props_extract": events_props_extract,
    "events_rolling_window": events_rolling_window,
    "events_rolling_median": events_rolling_median,
    "events_user_modal_type": events_user_modal_type,
    "events_type_assoc": events_type_assoc,
    "events_range_join_orders": events_range_join_orders,
    "events_top_per_user": events_top_per_user,
    "events_value_quantiles": events_value_quantiles,
    "events_daily_type_pivot": events_daily_type_pivot,
}

ORACLE_SQL = {
    "events_hourly_locf": HOURLY_LOCF_SQL,
    "events_new_users_hourly": NEW_USERS_SQL,
    "events_trimmed_stats": TRIMMED_STATS_SQL,
    "events_value_ntile": NTILE_SQL,
    "events_percent_rank": PERCENT_RANK_SQL,
    "events_share_of_day": SHARE_OF_DAY_SQL,
    "events_seasonal_outliers": SEASONAL_OUTLIERS_SQL,
    "events_path_trigrams": PATH_TRIGRAMS_SQL,
    "events_burst_velocity": BURST_VELOCITY_SQL,
    "events_cusum_drift": CUSUM_SQL,
    "events_value_time_corr": VALUE_TIME_CORR_SQL,
    "users_pareto_frontier": PARETO_SQL,
    "events_audience_except": AUDIENCE_EXCEPT_SQL,
    "events_daily_growth": DAILY_GROWTH_SQL,
    "events_time_weighted_avg": TIME_WEIGHTED_AVG_SQL,
    "events_type_transitions": TYPE_TRANSITIONS_SQL,
    "events_conversion_lag": CONVERSION_LAG_SQL,
    "events_funnel3": FUNNEL3_SQL,
    "events_daily_type_unpivot": UNPIVOT_SQL.format(pivot=PIVOT_SQL),
    "events_type_hour_indep": TYPE_HOUR_INDEP_SQL,
    "events_daily_p50_p95": DAILY_P50_P95_SQL,
    "events_daily_gini": DAILY_GINI_SQL,
    "events_group_sample": _group_sample_sql(),
    "events_session_concurrency": SESSION_CONCURRENCY_SQL.format(
        gap=SESSION_GAP_MIN
    ),
    "events_value_mad_outliers": MAD_OUTLIERS_SQL,
    "events_type_moments": TYPE_MOMENTS_SQL,
    "events_asof_orders": ASOF_SQL,
    "events_value_outliers": OUTLIERS_SQL,
    "events_value_delta": VALUE_DELTA_SQL,
    "events_latest_per_user": LATEST_SQL,
    "events_hourly_stats": HOURLY_SQL,
    "events_user_daily": USER_DAILY_SQL,
    "events_type_stats": TYPE_STATS_SQL,
    "events_sessionize": SESSIONIZE_SQL,
    "events_session_overlap": SESSION_OVERLAP_SQL,
    "events_props_extract": PROPS_EXTRACT_SQL,
    "events_rolling_window": ROLLING_SQL,
    "events_rolling_median": ROLL_MEDIAN_SQL,
    "events_user_modal_type": MODAL_TYPE_SQL,
    "events_type_assoc": TYPE_ASSOC_SQL,
    "events_range_join_orders": RANGE_JOIN_SQL,
    "events_top_per_user": TOP_PER_USER_SQL,
    "events_value_quantiles": QUANTILES_SQL,
    "events_daily_type_pivot": PIVOT_SQL,
}
