"""Multimodal-column plumbing: opaque ``binary`` payloads with typed
metadata, decoded / feature-extracted in actor-pool ``map_batches`` stages.

The container ships no image/audio codecs, so the DECODE step is a
deterministic stub (documented ``NotImplementedError`` escape hatch for the
real codec); everything Ray-side — schema, batch sizing for wide binary
rows, actor signature, output layout — is real and tested (task brief).
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
import pyarrow as pa

from raycdc.queries import common as C

MAGIC = b"FAKEIMG1"
HAVE_REAL_CODECS = False  # no PIL/ffmpeg in this container


def _synthesize_blob(doc_id: int, text: str) -> bytes:
    """Deterministic fake media blob: 8-byte magic, u32 width/height, then
    pseudo-pixels derived from the text hash. Stands in for real image
    bytes so the binary-column plumbing is exercised end to end."""
    h = int(pd.util.hash_array(np.array([text], dtype=object))[0])
    w = 16 + (h % 48)
    ht = 16 + ((h >> 8) % 48)
    rng = np.random.RandomState(h % (2**31))
    pixels = rng.randint(0, 256, size=w * ht, dtype=np.uint8).tobytes()
    return MAGIC + struct.pack("<II", w, ht) + pixels


def attach_blobs(sf_dir: str):
    """documents → (doc_id, media:binary, media_type) — the writer side of
    a multimodal column. large_binary + small batch_size keeps blocks sane
    for wide rows."""
    ds = C.read(sf_dir, "documents", ["doc_id", "text"])

    def synth(t: pa.Table) -> pa.Table:
        blobs = [
            _synthesize_blob(int(d), s)
            for d, s in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist())
        ]
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "media": pa.array(blobs, pa.large_binary()),
                "media_type": pa.array(["image/fake"] * len(blobs)),
            }
        )

    return ds.map_batches(synth, batch_format="pyarrow", batch_size=256)


class MediaDecoder:
    """Actor-pool decode/feature stage. Real codec init would happen ONCE
    here (model load / library handle); per batch it parses headers and
    extracts features. With no codec available it runs the deterministic
    header-parse path; ``strict=True`` raises the documented
    NotImplementedError where the real decode would go."""

    def __init__(self, strict: bool = False):
        self.strict = strict
        if strict and not HAVE_REAL_CODECS:
            raise NotImplementedError(
                "real image decode needs PIL/ffmpeg (not in this container); "
                "run with strict=False for the header-parse stub"
            )

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, widths, heights, nbytes, means = [], [], [], [], []
        for doc_id, blob in zip(
            t.column("doc_id").to_pylist(), t.column("media").to_pylist()
        ):
            if not blob.startswith(MAGIC):
                raise ValueError(f"doc {doc_id}: bad media magic")
            w, h = struct.unpack_from("<II", blob, 8)
            px = np.frombuffer(blob, dtype=np.uint8, offset=16)
            ids.append(doc_id)
            widths.append(w)
            heights.append(h)
            nbytes.append(len(blob))
            means.append(round(float(px.mean()), 4) if len(px) else 0.0)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "width": pa.array(widths, pa.int32()),
                "height": pa.array(heights, pa.int32()),
                "n_bytes": pa.array(nbytes, pa.int64()),
                "pixel_mean": pa.array(means, pa.float64()),
            }
        )


def media_features(sf_dir: str):
    """Full multimodal pipeline: synthesize binary column → actor-pool
    decode/feature-extract → typed metadata table."""
    blobs = attach_blobs(sf_dir)
    return blobs.map_batches(
        MediaDecoder,
        batch_format="pyarrow",
        batch_size=128,  # wide binary rows → small batches
        concurrency=(1, 4),
        num_cpus=1,
    )


QUERIES = {
    "media_features": media_features,
}

ORACLE_SQL: dict = {}  # binary synthesis/decoding is not SQL-expressible
