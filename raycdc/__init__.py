"""raycdc — a Ray-Data-native CDC / incremental-ingest engine.

From-scratch engine with the query and data-processing capabilities of
HemeraProtocol/hemera-indexer (see SURVEY.md), re-targeted at replaying
ordered change logs (insert/update/delete/rollback events keyed by
``(conv_id, turn_idx)`` with a monotone ``cursor`` — the block-number
analog) into a partitioned Parquet lake of multi-turn agent transcripts.

Layout:
    schema.py     Arrow schemas + schema-evolution helpers
    gen.py        deterministic synthetic change-log generator
    oracle.py     single-threaded reference reducer (test oracle)
    merge.py      vectorized LWW sorted-merge fold kernel (pure Arrow/pandas)
    partition.py  hash / salted partitioner
    lake.py       fragment IO, commit manifest, epoch fencing, undo buffer
    engine.py     the Ray Data pipeline (read → map_batches → groupby-merge)
    queries/      the general operator surface (TPC-H-ish, dedup, text, ANN)
"""

from raycdc.schema import TRANSCRIPT_SCHEMA, CHANGE_SCHEMA  # noqa: F401
