"""File exporters: write the lake (or any Dataset) as cursor-ranged CSV /
JSON / Parquet file sets — the analog of the reference's
``CSVFileItemExporter`` / ``JSONFileItemExporter``
(``indexer/exporters/csv_file_item_exporter.py:18-122``,
``json_file_item_exporter.py:18-121`` in /root/reference): sort by the
range key, split into files of ``rows_per_file`` rows, name each file
``{table}-{lo}-{hi}.{ext}`` so re-exports are idempotent and consumers can
range-prune on filenames. A ``console`` exporter (``ds.show`` analog) and a
``void`` exporter complete the reference's exporter factory surface
(``indexer/exporters/item_exporter.py:9-79``)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.csv as pacsv
import pyarrow.parquet as pq


def _chunks(ds, range_key: str, rows_per_file: int):
    """Exact fixed-size chunks from a sorted Dataset (last chunk ragged)."""
    buf, n = [], 0
    for b in ds.iter_batches(batch_size=rows_per_file, batch_format="pyarrow"):
        if b.num_rows == 0:
            continue
        buf.append(b)
        n += b.num_rows
        while n >= rows_per_file:
            t = pa.concat_tables(buf, promote_options="permissive")
            yield t.slice(0, rows_per_file)
            rest = t.slice(rows_per_file)
            buf = [rest] if rest.num_rows else []
            n = rest.num_rows
    if n:
        yield pa.concat_tables(buf, promote_options="permissive")


def _write(tbl: pa.Table, path: str, fmt: str) -> None:
    if fmt == "csv":
        with pa.OSFile(path, "wb") as f:  # explicit truncate
            pacsv.write_csv(tbl, f)
    elif fmt == "json":
        tbl.to_pandas().to_json(
            path, orient="records", lines=True, date_format="iso"
        )
    elif fmt == "parquet":
        pq.write_table(tbl, path)
    else:
        raise ValueError(f"unknown export format {fmt!r}")


def export_ranged(
    ds,
    out_dir: str,
    table: str = "transcripts",
    fmt: str = "csv",
    range_key: str = "cursor",
    rows_per_file: int = 100_000,
) -> list[str]:
    """Deterministic ranged file export. Sorts by ``range_key`` (the
    reference sorts by block number before splitting,
    ``csv_file_item_exporter.py:46-49``), then writes fixed-size files
    named by each file's actual key range; a ``-pN`` suffix disambiguates
    the rare case of two chunks sharing an identical range."""
    os.makedirs(out_dir, exist_ok=True)
    paths: list = []
    used: set = set()
    for tbl in _chunks(ds.sort(range_key), range_key, rows_per_file):
        lo = tbl.column(range_key)[0].as_py()
        hi = tbl.column(range_key)[tbl.num_rows - 1].as_py()
        name = f"{table}-{lo}-{hi}"
        if name in used:
            i = 1
            while f"{name}-p{i}" in used:
                i += 1
            name = f"{name}-p{i}"
        used.add(name)
        path = os.path.join(out_dir, f"{name}.{fmt}")
        _write(tbl, path, fmt)
        paths.append(path)
    return paths


def read_ranged_csv(paths_or_dir, lo: int | None = None, hi: int | None = None):
    """CSV source with filename range pruning (``CSVSourceJob`` analog,
    ``indexer/jobs/source_job/csv_source_job.py:34-108``): skip files whose
    ``-lo-hi.`` range cannot intersect [lo, hi], then row-filter exactly."""
    import glob as _glob
    import re

    import ray.data

    if isinstance(paths_or_dir, str) and os.path.isdir(paths_or_dir):
        paths = sorted(_glob.glob(os.path.join(paths_or_dir, "*.csv")))
    else:
        paths = list(paths_or_dir)
    rng = re.compile(r"-(\d+)-(\d+)(?:-p\d+)?\.csv$")
    kept = []
    for p in paths:
        m = rng.search(p)
        if m and lo is not None and int(m.group(2)) < lo:
            continue
        if m and hi is not None and int(m.group(1)) > hi:
            continue
        kept.append(p)
    ds = ray.data.read_csv(kept)
    if lo is not None or hi is not None:
        import pyarrow.compute as pc

        def rowfilter(t: pa.Table) -> pa.Table:
            m = pa.array([True] * t.num_rows)
            if lo is not None:
                m = pc.and_(m, pc.greater_equal(t.column("cursor"), lo))
            if hi is not None:
                m = pc.and_(m, pc.less_equal(t.column("cursor"), hi))
            return t.filter(m)

        ds = ds.map_batches(rowfilter, batch_format="pyarrow")
    return ds


def export_console(ds, limit: int = 20) -> int:
    """Console exporter (``console_item_exporter`` analog)."""
    rows = ds.take(limit)
    for r in rows:
        print(r)
    return len(rows)


def export_void(ds) -> int:
    """Void exporter: consume and drop (``base_exporter`` analog)."""
    return ds.count()
