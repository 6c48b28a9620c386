"""Pre-flight the driver's CORRECTNESS contract at any scale factor.

Runs every ``queries()`` entry through Ray AND its ``oracle_sql()`` entry
through DuckDB on the same parquet dir, compares row count, schema
(column names sorted) and order-insensitive values — the same check the
graft driver records per round. Usage::

    python scripts/preflight.py [SF_DIR] [query ...]

Exits non-zero if any query mismatches.
"""
from __future__ import annotations

import json
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck(sf_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).df()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64").round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def _dtype_class(dtype) -> str:
    """Coarse dtype class for driver-hash parity: the driver's value hash
    distinguishes int64 from float64 even when every value compares equal
    (the r3 ``doc_pack_offsets`` / r4 ``users_pareto_frontier`` class —
    DuckDB ``sum(BIGINT)`` silently widening to HUGEINT→float64 while the
    Ray side stays int64). ``canon()`` deliberately coerces before the
    value compare, so class agreement must be checked on the RAW frames."""
    kind = getattr(dtype, "kind", "?")
    if kind in "iu":
        return "int"
    if kind == "f":
        return "float"
    if kind == "b":
        return "bool"
    if kind == "M":
        return "datetime"
    return "other"


def dtype_class_mismatches(got: pd.DataFrame, want: pd.DataFrame) -> list[str]:
    """Columns whose raw dtype CLASS differs between the Ray result and the
    oracle (int vs float etc.) — a guaranteed driver hash mismatch even when
    ``canon()``'d values agree. Returns ``col:gotclass!=wantclass`` items."""
    out = []
    for c in sorted(set(got.columns) & set(want.columns)):
        g, w = _dtype_class(got[c].dtype), _dtype_class(want[c].dtype)
        if g != w and {g, w} <= {"int", "float", "bool"}:
            out.append(f"{c}:{g}!={w}")
    return out


def to_df(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    import os

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAYCDC_PREFLIGHT_CPUS", "16")),
                 include_dashboard=False, ignore_reinit_error=True)

    import __ray_entry__ as entry

    qs, oracles = entry.queries(), entry.oracle_sql_for(sf_dir)
    names = [n for n in sorted(qs) if not only or n in only]
    failures = []
    for name in names:
        t0 = time.time()
        status = "ok"
        detail = ""
        try:
            got_raw = to_df(qs[name](sf_dir))
            want_raw = duck(sf_dir, oracles[name])
            got, want = canon(got_raw), canon(want_raw)
            if list(got.columns) != list(want.columns):
                status, detail = "SCHEMA", f"{list(got.columns)} vs {list(want.columns)}"
            elif len(got) != len(want):
                status, detail = "ROWS", f"{len(got)} vs {len(want)}"
            else:
                bad_kinds = dtype_class_mismatches(got_raw, want_raw)
                try:
                    pd.testing.assert_frame_equal(
                        got, want, check_dtype=False, check_exact=False,
                        rtol=1e-6, atol=1e-9)
                except AssertionError as exc:
                    status, detail = "VALUES", str(exc).splitlines()[-1][:200]
                else:
                    if bad_kinds:
                        status, detail = "DTYPE", ",".join(bad_kinds)
        except Exception as exc:  # noqa: BLE001
            status, detail = "ERROR", f"{type(exc).__name__}: {exc}"[:300]
        dt = time.time() - t0
        rows = len(got) if status in ("ok", "VALUES") else "-"
        print(f"{name:35s} {status:7s} {dt:6.2f}s rows={rows} {detail}")
        if status != "ok":
            failures.append(name)
    print(json.dumps({"checked": len(names), "failed": failures}))
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
