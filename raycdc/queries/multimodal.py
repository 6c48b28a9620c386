"""Multimodal-column plumbing: opaque ``binary`` payloads with typed
metadata, decoded / feature-extracted in actor-pool ``map_batches`` stages.

The container ships no image/audio codecs, so the DECODE step is a
deterministic stub (documented ``NotImplementedError`` escape hatch for the
real codec); everything Ray-side — schema, batch sizing for wide binary
rows, actor signature, output layout — is real and tested (task brief).

The fake blob format derives entirely from the portable poly hash
(raycdc.phash): header dims and the pseudo-pixel sequence are affine in
H(text), so the WHOLE pipeline (synthesize → binary column → header parse
→ pixel stats) is reproduced exactly by the DuckDB oracle SQL below.
Both the synthesizer and the decoder are zero-Python-per-row: blobs are
assembled/parsed as one flat uint8 buffer with vectorized scatter/gather
over the Arrow large_binary offsets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from raycdc import phash as H
from raycdc.queries import common as C

MAGIC = b"FAKEIMG1"
_MAGIC_ARR = np.frombuffer(MAGIC, dtype=np.uint8)
HAVE_REAL_CODECS = False  # no PIL/ffmpeg in this container


def _blob_dims(h: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Header dims from the text hash: w,h ∈ [16, 64)."""
    w = 16 + (h % np.uint64(48))
    ht = 16 + ((h >> np.uint64(8)) % np.uint64(48))
    return w.astype(np.int64), ht.astype(np.int64)


def _synthesize_batch(doc_ids: np.ndarray, texts: np.ndarray) -> pa.Array:
    """Deterministic fake media blobs, one flat buffer for the whole batch:
    8-byte magic, u32 LE width/height, then ``w*h`` pseudo-pixels
    ``pixel[i] = ((H + (i+1)·B) mod P) mod 256`` — the SQL-expressible
    stand-in for real image bytes. Returns a ``large_binary`` array built
    directly from (offsets, data) buffers — no per-row Python."""
    n = len(doc_ids)
    hs = H.poly_hash(list(texts))
    w, ht = _blob_dims(hs)
    npix = w * ht
    lens = 16 + npix
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    data = np.zeros(int(offsets[-1]), dtype=np.uint8)

    # headers: (n, 16) uint8 scattered to each blob start
    hdr = np.empty((n, 16), dtype=np.uint8)
    hdr[:, :8] = _MAGIC_ARR[None, :]
    hdr[:, 8:12] = w.astype("<u4").view(np.uint8).reshape(n, 4)
    hdr[:, 12:16] = ht.astype("<u4").view(np.uint8).reshape(n, 4)
    data[offsets[:-1][:, None] + np.arange(16)[None, :]] = hdr

    # pixels: flat affine sequence per blob
    total = int(npix.sum())
    if total:
        starts = np.repeat(offsets[:-1] - np.concatenate(([0], np.cumsum(npix)[:-1])), npix)
        i_flat = np.arange(total, dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(npix)[:-1])), npix
        ) + 1
        vals = (
            (np.repeat(hs, npix) + i_flat.astype(np.uint64) * np.uint64(H.B))
            % np.uint64(H.P)
        ) % np.uint64(256)
        pix_pos = np.arange(total, dtype=np.int64) + starts + 16
        data[pix_pos] = vals.astype(np.uint8)

    return pa.Array.from_buffers(
        pa.large_binary(), n,
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(data.tobytes())],
    )


def attach_blobs(sf_dir: str):
    """documents → (doc_id, media:binary, media_type) — the writer side of
    a multimodal column. large_binary + small batch_size keeps blocks sane
    for wide rows."""
    ds = C.read(sf_dir, "documents", ["doc_id", "text"])

    def synth(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        texts = np.asarray(t.column("text").to_pylist(), dtype=object)
        blobs = _synthesize_batch(ids, texts)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "media": blobs,
                "media_type": pa.array(["image/fake"] * len(ids)),
            }
        )

    return ds.map_batches(synth, batch_format="pyarrow", batch_size=256)


class MediaDecoder:
    """Actor-pool decode/feature stage. Real codec init would happen ONCE
    here (model load / library handle); per batch it parses headers and
    extracts features. With no codec available it runs the deterministic
    header-parse path; ``strict=True`` raises the documented
    NotImplementedError where the real decode would go.

    The parse is fully vectorized: one ``np.frombuffer`` over the Arrow
    data buffer, u32 header fields via 4-byte gathers, per-blob pixel sums
    via a cumulative-sum difference over the flat buffer."""

    def __init__(self, strict: bool = False):
        self.strict = strict
        if strict and not HAVE_REAL_CODECS:
            raise NotImplementedError(
                "real image decode needs PIL/ffmpeg (not in this container); "
                "run with strict=False for the header-parse stub"
            )

    def __call__(self, t: pa.Table) -> pa.Table:
        col = t.column("media")
        ids_all, w_all, h_all, nb_all, mean_all = [], [], [], [], []
        pos = 0
        chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
        doc_ids = t.column("doc_id").to_numpy()
        for arr in chunks:
            n = len(arr)
            if n == 0:
                continue
            off = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
                arr.offset : arr.offset + n + 1
            ]
            data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
            starts = off[:-1]
            magic = data[starts[:, None] + np.arange(8)[None, :]]
            if not (magic == _MAGIC_ARR[None, :]).all():
                bad = int(np.flatnonzero((magic != _MAGIC_ARR[None, :]).any(axis=1))[0])
                raise ValueError(f"doc {doc_ids[pos + bad]}: bad media magic")
            b4 = np.asarray([1, 256, 65536, 16777216], dtype=np.int64)
            w = (data[starts[:, None] + (8 + np.arange(4))[None, :]].astype(np.int64) * b4).sum(axis=1)
            h = (data[starts[:, None] + (12 + np.arange(4))[None, :]].astype(np.int64) * b4).sum(axis=1)
            lens = np.diff(off)
            npix = (lens - 16).astype(np.int64)
            cs = np.concatenate(([0], np.cumsum(data, dtype=np.int64)))
            psum = cs[off[1:]] - cs[starts + 16]
            mean = np.where(npix > 0, psum / np.maximum(npix, 1), 0.0)
            mean = np.floor(mean * 1e4 + 0.5) / 1e4  # half-up, matches SQL
            ids_all.append(doc_ids[pos : pos + n])
            w_all.append(w)
            h_all.append(h)
            nb_all.append(lens)
            mean_all.append(mean)
            pos += n
        cat = lambda xs, dt: np.concatenate(xs).astype(dt) if xs else np.zeros(0, dt)  # noqa: E731
        return pa.table(
            {
                "doc_id": pa.array(cat(ids_all, np.int64), pa.int64()),
                "width": pa.array(cat(w_all, np.int64), pa.int64()),
                "height": pa.array(cat(h_all, np.int64), pa.int64()),
                "n_bytes": pa.array(cat(nb_all, np.int64), pa.int64()),
                "pixel_mean": pa.array(cat(mean_all, np.float64), pa.float64()),
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


def _binary_offsets(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(offsets, data) numpy views of a large_binary array (slice-aware)."""
    off = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
        arr.offset : arr.offset + len(arr) + 1
    ]
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    return off, data


class MediaResizer:
    """Actor-pool RESIZE stage: factor-2 block-mean downsample, binary
    blob in → binary blob out (a real transform of the multimodal column,
    not just metadata). Fully vectorized: every output pixel's four source
    positions are computed with batch-flat offset arithmetic — one gather
    per corner over the whole batch, no per-row Python."""

    def __call__(self, t: pa.Table) -> pa.Table:
        col = t.column("media")
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        off, data = _binary_offsets(arr)
        n = len(arr)
        starts = off[:-1]
        b4 = np.asarray([1, 256, 65536, 16777216], dtype=np.int64)
        w = (data[starts[:, None] + (8 + np.arange(4))[None, :]].astype(np.int64) * b4).sum(axis=1)
        h = (data[starts[:, None] + (12 + np.arange(4))[None, :]].astype(np.int64) * b4).sum(axis=1)
        w2, h2 = w // 2, h // 2
        npix2 = w2 * h2
        out_off = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(16 + npix2, out=out_off[1:])
        out = np.zeros(int(out_off[-1]), dtype=np.uint8)

        hdr = np.empty((n, 16), dtype=np.uint8)
        hdr[:, :8] = _MAGIC_ARR[None, :]
        hdr[:, 8:12] = w2.astype("<u4").view(np.uint8).reshape(n, 4)
        hdr[:, 12:16] = h2.astype("<u4").view(np.uint8).reshape(n, 4)
        out[out_off[:-1][:, None] + np.arange(16)[None, :]] = hdr

        total2 = int(npix2.sum())
        if total2:
            pfx = np.concatenate(([0], np.cumsum(npix2)[:-1]))
            k = np.arange(total2, dtype=np.int64) - np.repeat(pfx, npix2)
            w2r = np.repeat(w2, npix2)
            r, c = k // w2r, k % w2r
            src0 = np.repeat(starts + 16, npix2) + 2 * r * np.repeat(w, npix2) + 2 * c
            wr = np.repeat(w, npix2)
            block = (
                data[src0].astype(np.int64) + data[src0 + 1]
                + data[src0 + wr] + data[src0 + wr + 1]
            )
            dst = np.repeat(out_off[:-1] + 16, npix2) + k
            out[dst] = (block // 4).astype(np.uint8)

        blobs = pa.Array.from_buffers(
            pa.large_binary(), n,
            [None, pa.py_buffer(out_off.tobytes()), pa.py_buffer(out.tobytes())],
        )
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "media": blobs,
                "media_type": t.column("media_type"),
            }
        )


def media_resize(sf_dir: str):
    """Resize pipeline: synthesize → actor-pool block-mean downsample →
    decode features of the RESIZED blobs (dims halved, pixel_mean over the
    block means)."""
    return (
        attach_blobs(sf_dir)
        .map_batches(
            MediaResizer, batch_format="pyarrow", batch_size=128,
            concurrency=(1, 4), num_cpus=1,
        )
        .map_batches(
            MediaDecoder, batch_format="pyarrow", batch_size=128,
            concurrency=(1, 4), num_cpus=1,
        )
    )


# -- video analog: frame container + sampling ------------------------------

VMAGIC = b"FAKEVID1"
_VMAGIC_ARR = np.frombuffer(VMAGIC, dtype=np.uint8)


def attach_video_blobs(sf_dir: str):
    """documents → (doc_id, media:binary) fake VIDEO containers:
    8-byte magic, u32 n_frames ∈ [4,16), u32 frame_len ∈ [64,256), then
    ``n_frames·frame_len`` affine pseudo-bytes (same family as the image
    blobs, so the oracle reproduces every frame arithmetically)."""
    ds = C.read(sf_dir, "documents", ["doc_id", "text"])

    def synth(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        texts = np.asarray(t.column("text").to_pylist(), dtype=object)
        n = len(ids)
        hs = H.poly_hash(list(texts))
        nf = (4 + (hs % np.uint64(12))).astype(np.int64)
        fl = (64 + ((hs >> np.uint64(8)) % np.uint64(192))).astype(np.int64)
        nbytes = nf * fl
        off = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(16 + nbytes, out=off[1:])
        data = np.zeros(int(off[-1]), dtype=np.uint8)
        hdr = np.empty((n, 16), dtype=np.uint8)
        hdr[:, :8] = _VMAGIC_ARR[None, :]
        hdr[:, 8:12] = nf.astype("<u4").view(np.uint8).reshape(n, 4)
        hdr[:, 12:16] = fl.astype("<u4").view(np.uint8).reshape(n, 4)
        data[off[:-1][:, None] + np.arange(16)[None, :]] = hdr
        total = int(nbytes.sum())
        if total:
            pfx = np.concatenate(([0], np.cumsum(nbytes)[:-1]))
            i_flat = np.arange(total, dtype=np.int64) - np.repeat(pfx, nbytes) + 1
            vals = (
                (np.repeat(hs, nbytes) + i_flat.astype(np.uint64) * np.uint64(H.B))
                % np.uint64(H.P)
            ) % np.uint64(256)
            data[np.repeat(off[:-1] + 16, nbytes) + i_flat - 1] = vals.astype(np.uint8)
        blobs = pa.Array.from_buffers(
            pa.large_binary(), n,
            [None, pa.py_buffer(off.tobytes()), pa.py_buffer(data.tobytes())],
        )
        return pa.table({"doc_id": t.column("doc_id"), "media": blobs})

    return ds.map_batches(synth, batch_format="pyarrow", batch_size=256)


class FrameSampler:
    """Actor-pool FRAME-SAMPLE stage (1→N explode): keep every
    ``stride``-th frame, emit per-frame features. One cumulative sum over
    the batch's flat buffer; sampled frame sums are two gathers at frame
    boundaries — no per-row or per-frame Python."""

    def __init__(self, stride: int = 2):
        self.stride = int(stride)

    def __call__(self, t: pa.Table) -> pa.Table:
        col = t.column("media")
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        off, data = _binary_offsets(arr)
        starts = off[:-1]
        n = len(arr)
        if n == 0 or not len(data):
            return pa.table({
                "doc_id": pa.array([], pa.int64()),
                "frame_idx": pa.array([], pa.int32()),
                "frame_mean": pa.array([], pa.float64()),
            })
        magic = data[starts[:, None] + np.arange(8)[None, :]]
        if not (magic == _VMAGIC_ARR[None, :]).all():
            raise ValueError("bad video magic")
        b4 = np.asarray([1, 256, 65536, 16777216], dtype=np.int64)
        nf = (data[starts[:, None] + (8 + np.arange(4))[None, :]].astype(np.int64) * b4).sum(axis=1)
        fl = (data[starts[:, None] + (12 + np.arange(4))[None, :]].astype(np.int64) * b4).sum(axis=1)
        n_samp = (nf + self.stride - 1) // self.stride
        pfx = np.concatenate(([0], np.cumsum(n_samp)[:-1]))
        total = int(n_samp.sum())
        j = np.arange(total, dtype=np.int64) - np.repeat(pfx, n_samp)
        frame = j * self.stride
        doc = np.repeat(t.column("doc_id").to_numpy(), n_samp)
        s_rep = np.repeat(starts + 16, n_samp)
        fl_rep = np.repeat(fl, n_samp)
        cs = np.concatenate(([0], np.cumsum(data, dtype=np.int64)))
        fsum = cs[s_rep + (frame + 1) * fl_rep] - cs[s_rep + frame * fl_rep]
        mean = fsum / fl_rep
        mean = np.floor(mean * 1e4 + 0.5) / 1e4
        return pa.table({
            "doc_id": pa.array(doc.astype(np.int64), pa.int64()),
            "frame_idx": pa.array(frame.astype(np.int32), pa.int32()),
            "frame_mean": pa.array(mean, pa.float64()),
        })


def video_frame_sample(sf_dir: str):
    """Frame-sampling pipeline: synthesize video containers → actor-pool
    every-2nd-frame sampler → per-frame feature rows."""
    return attach_video_blobs(sf_dir).map_batches(
        FrameSampler, batch_format="pyarrow", batch_size=64,
        concurrency=(1, 4), num_cpus=1,
    )


SCENE_K = 4  # scene cut iff |Σframe − Σprev| > K · frame_len (integer law)


class SceneDetector:
    """Actor-pool SCENE-CHANGE stage: flag frames whose byte-sum jumps by
    more than SCENE_K · frame_len from the previous frame — the
    cut-detection analog over the fake codec (a real codec would diff
    decoded luma histograms; the Ray-side plumbing — flat-buffer parse,
    per-video boundary-masked consecutive diff, integer threshold — is
    the real part). All-frame sums come from ONE cumulative sum over the
    batch's flat buffer (two gathers per frame); the law is
    integer-exact, so the SQL oracle matches bit-for-bit."""

    def __call__(self, t: pa.Table) -> pa.Table:
        col = t.column("media")
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        off, data = _binary_offsets(arr)
        starts = off[:-1]
        n = len(arr)
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "frame_idx": pa.array([], pa.int64()),
                "delta": pa.array([], pa.int64()),
            }
        )
        if n == 0 or not len(data):
            return empty
        magic = data[starts[:, None] + np.arange(8)[None, :]]
        if not (magic == _VMAGIC_ARR[None, :]).all():
            raise ValueError("bad video magic")
        b4 = np.asarray([1, 256, 65536, 16777216], dtype=np.int64)
        nf = (
            data[starts[:, None] + (8 + np.arange(4))[None, :]].astype(np.int64)
            * b4
        ).sum(axis=1)
        fl = (
            data[starts[:, None] + (12 + np.arange(4))[None, :]].astype(np.int64)
            * b4
        ).sum(axis=1)
        pfx = np.concatenate(([0], np.cumsum(nf)[:-1]))
        total = int(nf.sum())
        j = np.arange(total, dtype=np.int64) - np.repeat(pfx, nf)  # frame idx
        s_rep = np.repeat(starts + 16, nf)
        fl_rep = np.repeat(fl, nf)
        cs = np.concatenate(([0], np.cumsum(data, dtype=np.int64)))
        fsum = cs[s_rep + (j + 1) * fl_rep] - cs[s_rep + j * fl_rep]
        doc = np.repeat(t.column("doc_id").to_numpy(), nf)
        delta = np.zeros(total, np.int64)
        if total > 1:
            delta[1:] = np.abs(fsum[1:] - fsum[:-1])
        first = j == 0  # no predecessor within the video
        m = (~first) & (delta > SCENE_K * fl_rep)
        return pa.table(
            {
                "doc_id": pa.array(doc[m].astype(np.int64), pa.int64()),
                "frame_idx": pa.array(j[m], pa.int64()),
                "delta": pa.array(delta[m], pa.int64()),
            }
        )


def video_scene_changes(sf_dir: str):
    """Scene-cut detection pipeline: synthesize video containers →
    actor-pool consecutive-frame byte-sum diff → flagged cut rows."""
    return attach_video_blobs(sf_dir).map_batches(
        SceneDetector, batch_format="pyarrow", batch_size=64,
        concurrency=(1, 4), num_cpus=1,
    )


# -- audio analog: PCM container + windowed loudness / silence ---------------

AMAGIC = b"FAKEAUD1"
_AMAGIC_ARR = np.frombuffer(AMAGIC, dtype=np.uint8)
AUDIO_WIN = 256          # samples per loudness window
SILENCE_SUM = 63 * AUDIO_WIN  # window abs-dev sum below this = silent


def attach_audio_blobs(sf_dir: str):
    """documents → (doc_id, media:binary) fake AUDIO containers: 8-byte
    magic, u32 sample_rate ∈ {8,16,22,44}kHz-ish, u32 n_samples ∈
    [512, 2048), then ``n_samples`` affine pseudo-samples (uint8 centered
    at 128) — the same SQL-expressible byte family as the image/video
    blobs."""
    ds = C.read(sf_dir, "documents", ["doc_id", "text"])

    def synth(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        texts = np.asarray(t.column("text").to_pylist(), dtype=object)
        n = len(ids)
        hs = H.poly_hash(list(texts))
        sr = (8000 * (1 + (hs % np.uint64(4)))).astype(np.int64)
        ns = (512 + ((hs >> np.uint64(8)) % np.uint64(1536))).astype(np.int64)
        off = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(16 + ns, out=off[1:])
        data = np.zeros(int(off[-1]), dtype=np.uint8)
        hdr = np.empty((n, 16), dtype=np.uint8)
        hdr[:, :8] = _AMAGIC_ARR[None, :]
        hdr[:, 8:12] = sr.astype("<u4").view(np.uint8).reshape(n, 4)
        hdr[:, 12:16] = ns.astype("<u4").view(np.uint8).reshape(n, 4)
        data[off[:-1][:, None] + np.arange(16)[None, :]] = hdr
        total = int(ns.sum())
        if total:
            pfx = np.concatenate(([0], np.cumsum(ns)[:-1]))
            i_flat = np.arange(total, dtype=np.int64) - np.repeat(pfx, ns) + 1
            vals = (
                (np.repeat(hs, ns) + i_flat.astype(np.uint64) * np.uint64(H.B))
                % np.uint64(H.P)
            ) % np.uint64(256)
            data[np.repeat(off[:-1] + 16, ns) + i_flat - 1] = vals.astype(np.uint8)
        blobs = pa.Array.from_buffers(
            pa.large_binary(), n,
            [None, pa.py_buffer(off.tobytes()), pa.py_buffer(data.tobytes())],
        )
        return pa.table({"doc_id": t.column("doc_id"), "media": blobs})

    return ds.map_batches(synth, batch_format="pyarrow", batch_size=256)


class AudioAnalyzer:
    """Actor-pool windowed-loudness stage: per doc, count silent windows
    and find the peak window (first-index tie-break) over fixed
    ``AUDIO_WIN``-sample windows of abs deviation from the midpoint — the
    VAD/silence-trim shape of an audio prep pipeline. All integer until
    the reported loudness, so the ranking needs no float tolerance.
    Vectorized: one |data-128| cumsum per batch, window sums as boundary
    gathers, per-doc reduction via ``reduceat`` (windows are contiguous
    per doc)."""

    def __call__(self, t: pa.Table) -> pa.Table:
        col = t.column("media")
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        off, data = _binary_offsets(arr)
        starts = off[:-1]
        n = len(arr)
        empty = pa.table({
            "doc_id": pa.array([], pa.int64()),
            "sample_rate": pa.array([], pa.int64()),
            "n_windows": pa.array([], pa.int64()),
            "n_silent": pa.array([], pa.int64()),
            "peak_idx": pa.array([], pa.int64()),
            "peak_loudness": pa.array([], pa.float64()),
        })
        if n == 0 or not len(data):
            return empty
        magic = data[starts[:, None] + np.arange(8)[None, :]]
        if not (magic == _AMAGIC_ARR[None, :]).all():
            raise ValueError("bad audio magic")
        b4 = np.asarray([1, 256, 65536, 16777216], dtype=np.int64)
        sr = (data[starts[:, None] + (8 + np.arange(4))[None, :]].astype(np.int64) * b4).sum(axis=1)
        ns = (data[starts[:, None] + (12 + np.arange(4))[None, :]].astype(np.int64) * b4).sum(axis=1)
        nw = ns // AUDIO_WIN  # trailing partial window dropped
        if int(nw.sum()) == 0:
            return empty
        absdev = np.abs(data.astype(np.int64) - 128)
        cs = np.concatenate(([0], np.cumsum(absdev)))
        pfx = np.concatenate(([0], np.cumsum(nw)[:-1]))
        total = int(nw.sum())
        k = np.arange(total, dtype=np.int64) - np.repeat(pfx, nw)
        ws = np.repeat(starts + 16, nw) + k * AUDIO_WIN
        wsum = cs[ws + AUDIO_WIN] - cs[ws]
        # per-doc reduction over contiguous window runs
        red = pfx  # reduceat boundaries (every doc here has nw >= 1)
        peak = np.maximum.reduceat(wsum, red)
        silent = np.add.reduceat((wsum < SILENCE_SUM).astype(np.int64), red)
        is_peak = wsum == np.repeat(peak, nw)
        idx_or_big = np.where(is_peak, k, np.iinfo(np.int64).max)
        peak_idx = np.minimum.reduceat(idx_or_big, red)  # first max
        loud = np.floor(peak / AUDIO_WIN * 1e4 + 0.5) / 1e4
        return pa.table({
            "doc_id": pa.array(t.column("doc_id").to_numpy().astype(np.int64), pa.int64()),
            "sample_rate": pa.array(sr, pa.int64()),
            "n_windows": pa.array(nw, pa.int64()),
            "n_silent": pa.array(silent, pa.int64()),
            "peak_idx": pa.array(peak_idx, pa.int64()),
            "peak_loudness": pa.array(loud, pa.float64()),
        })


def audio_loudness(sf_dir: str):
    """Audio pipeline: synthesize PCM containers → actor-pool windowed
    loudness / silence / peak-window analysis."""
    return attach_audio_blobs(sf_dir).map_batches(
        AudioAnalyzer, batch_format="pyarrow", batch_size=128,
        concurrency=(1, 4), num_cpus=1,
    )


AUDIO_LOUDNESS_SQL = f"""
WITH h AS (
    SELECT doc_id, {H.sql_poly('text')} AS hv FROM documents
), a AS (
    SELECT doc_id, 8000 * (1 + hv % 4) AS sr,
           512 + (hv // 256) % 1536 AS ns, hv
    FROM h
), w AS (
    SELECT doc_id, sr, ns // {AUDIO_WIN} AS nw,
        list_transform(generate_series(0, CAST(ns // {AUDIO_WIN} - 1 AS BIGINT)), k ->
            list_aggregate(
                list_transform(
                    generate_series(CAST(k * {AUDIO_WIN} + 1 AS BIGINT),
                                    CAST((k + 1) * {AUDIO_WIN} AS BIGINT)),
                    i -> abs(CAST(((hv + i * {H.B}) % {H.P}) % 256 AS BIGINT) - 128)),
                'sum')) AS wsums
    FROM a
)
SELECT doc_id,
    CAST(sr AS BIGINT) AS sample_rate,
    CAST(nw AS BIGINT) AS n_windows,
    CAST(len(list_filter(wsums, x -> x < {SILENCE_SUM})) AS BIGINT) AS n_silent,
    CAST(list_position(wsums, list_max(wsums)) - 1 AS BIGINT) AS peak_idx,
    floor(CAST(list_max(wsums) AS DOUBLE) / {AUDIO_WIN} * 10000 + 0.5) / 10000
        AS peak_loudness
FROM w
"""


# the oracle reproduces the blob FORMAT from the text hash: dims, byte
# count, and the affine pseudo-pixel average — everything the decoder emits
MEDIA_FEATURES_SQL = f"""
WITH h AS (
    SELECT doc_id, {H.sql_poly('text')} AS hv FROM documents
), dims AS (
    SELECT doc_id, 16 + hv % 48 AS width, 16 + (hv // 256) % 48 AS height, hv
    FROM h
)
SELECT doc_id,
    CAST(width AS BIGINT) AS width,
    CAST(height AS BIGINT) AS height,
    CAST(16 + width * height AS BIGINT) AS n_bytes,
    floor(list_aggregate(
        list_transform(generate_series(1, CAST(width * height AS BIGINT)),
                       i -> CAST(((hv + i * {H.B}) % {H.P}) % 256 AS DOUBLE)),
        'avg') * 10000 + 0.5) / 10000 AS pixel_mean
FROM dims
"""


# resized pixel (r,c) = floor-mean of its 2×2 source block; the affine
# pixel formula makes every corner SQL-computable
def _px(j: str) -> str:
    return f"CAST(((hv + ({j}) * {H.B}) % {H.P}) % 256 AS BIGINT)"


MEDIA_RESIZE_SQL = f"""
WITH h AS (
    SELECT doc_id, {H.sql_poly('text')} AS hv FROM documents
), dims AS (
    SELECT doc_id, 16 + hv % 48 AS w, 16 + (hv // 256) % 48 AS ht, hv FROM h
), d2 AS (
    SELECT doc_id, w, w // 2 AS w2, ht // 2 AS h2, hv FROM dims
)
SELECT doc_id,
    CAST(w2 AS BIGINT) AS width,
    CAST(h2 AS BIGINT) AS height,
    CAST(16 + w2 * h2 AS BIGINT) AS n_bytes,
    floor(list_aggregate(flatten(
        list_transform(generate_series(0, CAST(h2 - 1 AS BIGINT)), r ->
            list_transform(generate_series(0, CAST(w2 - 1 AS BIGINT)), c ->
                CAST(({_px('2*r*w + 2*c + 1')} + {_px('2*r*w + 2*c + 2')}
                    + {_px('(2*r+1)*w + 2*c + 1')} + {_px('(2*r+1)*w + 2*c + 2')}
                    ) // 4 AS DOUBLE)))),
        'avg') * 10000 + 0.5) / 10000 AS pixel_mean
FROM d2
"""

VIDEO_FRAME_SAMPLE_SQL = f"""
WITH h AS (
    SELECT doc_id, {H.sql_poly('text')} AS hv FROM documents
), v AS (
    SELECT doc_id, 4 + hv % 12 AS nf, 64 + (hv // 256) % 192 AS fl, hv FROM h
)
SELECT doc_id,
    CAST(f AS INT) AS frame_idx,
    floor(list_aggregate(
        list_transform(
            generate_series(CAST(f * fl + 1 AS BIGINT), CAST((f + 1) * fl AS BIGINT)),
            i -> CAST(((hv + i * {H.B}) % {H.P}) % 256 AS DOUBLE)),
        'avg') * 10000 + 0.5) / 10000 AS frame_mean
FROM v
JOIN (SELECT unnest(range(0, 16)) AS f) frames ON f < nf
WHERE f % 2 = 0
"""

VIDEO_SCENE_SQL = f"""
WITH h AS (
    SELECT doc_id, {H.sql_poly('text')} AS hv FROM documents
), v AS (
    SELECT doc_id, 4 + hv % 12 AS nf, 64 + (hv // 256) % 192 AS fl, hv FROM h
), fs AS (
    SELECT doc_id, f, fl,
        CAST(list_aggregate(
            list_transform(
                generate_series(CAST(f * fl + 1 AS BIGINT),
                                CAST((f + 1) * fl AS BIGINT)),
                i -> CAST(((hv + i * {H.B}) % {H.P}) % 256 AS BIGINT)),
            'sum') AS BIGINT) AS fsum
    FROM v
    JOIN (SELECT unnest(range(0, 16)) AS f) frames ON f < nf
), d AS (
    SELECT doc_id, f, fl,
           abs(fsum - lag(fsum) OVER (PARTITION BY doc_id ORDER BY f)) AS delta
    FROM fs
)
SELECT doc_id, CAST(f AS BIGINT) AS frame_idx, CAST(delta AS BIGINT) AS delta
FROM d WHERE delta > {SCENE_K} * fl
"""


# -- content-addressable media dedup (bytes-level, codec-free) ---------------

class MediaChecksummer:
    """Actor-pool stage: position-weighted checksum over the PIXEL BYTES of
    each blob — content addressing computed from the binary payload itself
    (never from the source text), so two blobs group iff their bytes match.
    sig = Σ pixel_i · i (1-based) mod P: per-term < 2^20, per-blob sum
    < 2^32 (npix < 4096), exact in int64. Fully vectorized: one flat
    uint8 view of the Arrow data buffer, per-blob segment sums via
    ``add.reduceat``."""

    def __call__(self, t: pa.Table) -> pa.Table:
        col = t.column("media")
        doc_ids = t.column("doc_id").to_numpy()
        ids_all, w_all, h_all, sig_all = [], [], [], []
        pos = 0
        chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
        b4 = np.asarray([1, 256, 65536, 16777216], dtype=np.int64)
        for arr in chunks:
            n = len(arr)
            if n == 0:
                continue
            off = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
                arr.offset : arr.offset + n + 1
            ]
            data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
            starts = off[:-1]
            w = (data[starts[:, None] + (8 + np.arange(4))[None, :]]
                 .astype(np.int64) * b4).sum(axis=1)
            h = (data[starts[:, None] + (12 + np.arange(4))[None, :]]
                 .astype(np.int64) * b4).sum(axis=1)
            npix = (np.diff(off) - 16).astype(np.int64)
            total = int(npix.sum())
            if total:
                seg0 = np.concatenate(([0], np.cumsum(npix)[:-1]))
                i_flat = np.arange(total, dtype=np.int64) - np.repeat(seg0, npix) + 1
                pix_pos = np.arange(total, dtype=np.int64) - np.repeat(
                    seg0, npix
                ) + np.repeat(starts + 16, npix)
                contrib = data[pix_pos].astype(np.int64) * i_flat
                padded = np.concatenate([contrib, np.zeros(1, np.int64)])
                sums = np.add.reduceat(padded, np.minimum(seg0, total))
                sums[npix == 0] = 0
                sig = sums % H.P
            else:
                sig = np.zeros(n, np.int64)
            ids_all.append(doc_ids[pos : pos + n])
            w_all.append(w)
            h_all.append(h)
            sig_all.append(sig)
            pos += n
        cat = lambda xs: np.concatenate(xs).astype(np.int64) if xs else np.zeros(0, np.int64)  # noqa: E731
        return pa.table(
            {
                "doc_id": pa.array(cat(ids_all), pa.int64()),
                "width": pa.array(cat(w_all), pa.int64()),
                "height": pa.array(cat(h_all), pa.int64()),
                "checksum": pa.array(cat(sig_all), pa.int64()),
            }
        )


def media_content_dedup(sf_dir: str):
    """Exact dedup for MULTIMODAL payloads: synthesize the binary column,
    checksum each blob's bytes in an actor-pool stage, then keep one winner
    (min doc_id) per (width, height, checksum) content group with its copy
    count — the binary-column analog of ``dedup_exact``, grouped on a
    signature of the BYTES so it ports unchanged to real codecs. The
    group step is one bounded-partition pandas kernel keyed on the
    checksum (``C.by_partition``): the shuffle moves 32 B/row signatures,
    never blobs."""
    import pandas as pd

    sigs = attach_blobs(sf_dir).map_batches(
        MediaChecksummer,
        batch_format="pyarrow",
        batch_size=128,
        concurrency=(1, 4),
        num_cpus=1,
    )

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.groupby(["width", "height", "checksum"], as_index=False)
            .agg(doc_id=("doc_id", "min"), n_copies=("doc_id", "size"))
        )
        out["n_copies"] = out["n_copies"].astype("int64")
        return out[["doc_id", "width", "height", "checksum", "n_copies"]]

    return C.by_partition(sigs, "checksum", kernel)


MEDIA_CONTENT_DEDUP_SQL = f"""
WITH h AS (
    SELECT doc_id, {H.sql_poly('text')} AS hv FROM documents
), dims AS (
    SELECT doc_id, 16 + hv % 48 AS width, 16 + (hv // 256) % 48 AS height, hv
    FROM h
), sig AS (
    SELECT doc_id, width, height,
           list_aggregate(
               list_transform(
                   generate_series(1, CAST(width * height AS BIGINT)),
                   i -> (((hv + i * {H.B}) % {H.P}) % 256) * i),
               'sum') % {H.P} AS checksum
    FROM dims
)
SELECT CAST(min(doc_id) AS BIGINT) AS doc_id,
       CAST(width AS BIGINT) AS width,
       CAST(height AS BIGINT) AS height,
       CAST(checksum AS BIGINT) AS checksum,
       CAST(count(*) AS BIGINT) AS n_copies
FROM sig GROUP BY width, height, checksum
"""


# -- perceptual near-dup (pHash-style) over the binary payloads ------------

PHASH_SEGS = 16  # pooling segments per blob → 16-bit perceptual hash
PHASH_VARIANT_EVERY = 7  # every 7th doc gets a planted "re-encoded" variant


def _seg_bounds(npix: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(n, SEGS) inclusive-exclusive pixel-index bounds of the equal-split
    pooling segments (exact integer floors, mirrored by the SQL)."""
    j = np.arange(PHASH_SEGS, dtype=np.int64)
    lo = (npix[:, None] * j[None, :]) // PHASH_SEGS
    hi = (npix[:, None] * (j + 1)[None, :]) // PHASH_SEGS
    return lo, hi


def swap_segment_heads(blobs: pa.Array) -> pa.Array:
    """The planted "re-encode" transform: swap the first two pixel bytes of
    EVERY pooling segment of every blob. Bytes (and the exact content
    checksum) change; segment sums — and therefore every pHash bit — are
    invariant by construction. Shared by ``attach_blob_variants`` (which
    plants the variants) and the pHash-invariance property test (which
    must validate the SAME transform the query plants)."""
    off, data = _binary_offsets(blobs)
    data = data.copy()  # writable: swap in place, then rebuild
    npix = (np.diff(off) - 16).astype(np.int64)
    lo, _ = _seg_bounds(npix)
    a = (off[:-1] + 16)[:, None] + lo  # (n, SEGS) byte pos of seg starts
    tmp = data[a].copy()
    data[a] = data[a + 1]
    data[a + 1] = tmp
    return pa.Array.from_buffers(
        pa.large_binary(), len(blobs),
        [None, pa.py_buffer(off.tobytes()), pa.py_buffer(data.tobytes())],
    )


def attach_blob_variants(sf_dir: str):
    """Originals plus planted near-duplicate variants: every
    ``PHASH_VARIANT_EVERY``-th doc also emits a "re-encoded" copy whose
    first two pixels of EACH pooling segment are swapped — bytes (and thus
    the exact content checksum) change, segment sums (and thus the
    perceptual hash) are invariant by construction. This is the
    deterministic stand-in for a real JPEG re-encode: visually identical,
    binary different."""
    ds = C.read(sf_dir, "documents", ["doc_id", "text"])

    def synth(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        texts = np.asarray(t.column("text").to_pylist(), dtype=object)
        blobs = _synthesize_batch(ids, texts)
        sel = ids % PHASH_VARIANT_EVERY == 0
        v_ids = ids[sel]
        out_ids = np.concatenate([ids, v_ids])
        variant = np.concatenate(
            [np.zeros(len(ids), np.int64), np.ones(len(v_ids), np.int64)]
        )
        if len(v_ids):
            vb = swap_segment_heads(_synthesize_batch(v_ids, texts[sel]))
            media = pa.concat_arrays([blobs, vb])
        else:
            media = blobs
        return pa.table(
            {
                "doc_id": pa.array(out_ids, pa.int64()),
                "variant": pa.array(variant, pa.int64()),
                "media": media,
            }
        )

    return ds.map_batches(synth, batch_format="pyarrow", batch_size=256)


class MediaPHasher:
    """Actor-pool stage: 16-bit perceptual hash from the PIXEL BYTES —
    equal-split segment pooling, bit j set iff segment j's mean exceeds the
    blob mean (exact integer compare ``seg_sum·npix > total·seg_len``, no
    float thresholds). One flat gather + one ``add.reduceat`` over all
    segment boundaries of the batch — no per-row Python."""

    def __call__(self, t: pa.Table) -> pa.Table:
        col = t.column("media")
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        off, data = _binary_offsets(arr)
        n = len(arr)
        if n == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "variant": pa.array([], pa.int64()),
                    "phash": pa.array([], pa.int64()),
                }
            )
        npix = (np.diff(off) - 16).astype(np.int64)
        total_pix = int(npix.sum())
        seg0 = np.concatenate(([0], np.cumsum(npix)[:-1]))  # blob starts, flat
        flat = np.arange(total_pix, dtype=np.int64)
        pix_pos = flat - np.repeat(seg0, npix) + np.repeat(off[:-1] + 16, npix)
        vals = data[pix_pos].astype(np.int64)
        lo, hi = _seg_bounds(npix)
        cuts = (seg0[:, None] + lo).ravel()  # (n*SEGS,) ascending reduceat cuts
        seg_sums = np.add.reduceat(vals, cuts).reshape(n, PHASH_SEGS)
        totals = seg_sums.sum(axis=1)
        bits = seg_sums * npix[:, None] > totals[:, None] * (hi - lo)
        phash = (
            bits.astype(np.int64) << np.arange(PHASH_SEGS, dtype=np.int64)[None, :]
        ).sum(axis=1)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "variant": t.column("variant"),
                "phash": pa.array(phash, pa.int64()),
            }
        )


def media_phash_neardup(sf_dir: str):
    """Perceptual near-dup for MULTIMODAL payloads: pHash each blob's bytes
    in an actor-pool stage, co-locate by hash, report every perceptual
    group with >1 member. The planted re-encoded variants
    (``attach_blob_variants``) are byte-different — exact content dedup
    (``media_content_dedup``) cannot pair them — but segment-sum invariant,
    so they land in their original's group here. Shuffle moves 24 B/row
    hashes, never blobs; with a real codec only ``MediaPHasher``'s pixel
    source changes."""
    import pandas as pd

    sigs = attach_blob_variants(sf_dir).map_batches(
        MediaPHasher,
        batch_format="pyarrow",
        batch_size=128,
        concurrency=(1, 4),
        num_cpus=1,
    )

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["n_members"] = (
            g.groupby("phash")["doc_id"].transform("size").astype("int64")
        )
        g = g[g["n_members"] > 1]
        return g[["phash", "n_members", "doc_id", "variant"]]

    return C.by_partition(sigs, "phash", kernel)


# the oracle reproduces the pooling bits from the pixel FORMULA; the
# variant's phash equals its original's by the sum-invariance of the swap,
# so the SQL computes it from the same affine sequence
MEDIA_PHASH_SQL = f"""
WITH h AS (
    SELECT doc_id, {H.sql_poly('text')} AS hv FROM documents
), dims AS (
    SELECT doc_id, hv,
           CAST((16 + hv % 48) * (16 + (hv // 256) % 48) AS BIGINT) AS npix
    FROM h
), base AS (
    SELECT doc_id, CAST(0 AS BIGINT) AS variant, hv, npix FROM dims
    UNION ALL
    SELECT doc_id, CAST(1 AS BIGINT), hv, npix FROM dims
    WHERE doc_id % {PHASH_VARIANT_EVERY} = 0
), segs AS (
    SELECT doc_id, variant, npix, hv, j,
           (npix * j) // {PHASH_SEGS} AS lo,
           (npix * (j + 1)) // {PHASH_SEGS} AS hi
    FROM base CROSS JOIN generate_series(0, {PHASH_SEGS - 1}) AS t(j)
), sums AS (
    SELECT doc_id, variant, npix, j, hi - lo AS seg_len,
           list_aggregate(
               list_transform(generate_series(lo + 1, hi),
                   i -> ((hv + i * {H.B}) % {H.P}) % 256),
               'sum') AS seg_sum
    FROM segs
), tot AS (
    SELECT *, sum(seg_sum) OVER (PARTITION BY doc_id, variant) AS total
    FROM sums
), ph AS (
    SELECT doc_id, variant,
           CAST(sum(CAST(seg_sum * npix > total * seg_len AS BIGINT)
                    * (CAST(1 AS BIGINT) << j)) AS BIGINT) AS phash
    FROM tot GROUP BY doc_id, variant
)
SELECT phash,
       CAST(count(*) OVER (PARTITION BY phash) AS BIGINT) AS n_members,
       CAST(doc_id AS BIGINT) AS doc_id, variant
FROM ph QUALIFY n_members > 1
"""


QUERIES = {
    "media_features": media_features,
    "media_content_dedup": media_content_dedup,
    "media_phash_neardup": media_phash_neardup,
    "media_resize": media_resize,
    "video_frame_sample": video_frame_sample,
    "video_scene_changes": video_scene_changes,
    "audio_loudness": audio_loudness,
}

ORACLE_SQL = {
    "video_scene_changes": VIDEO_SCENE_SQL,
    "media_features": MEDIA_FEATURES_SQL,
    "media_content_dedup": MEDIA_CONTENT_DEDUP_SQL,
    "media_phash_neardup": MEDIA_PHASH_SQL,
    "media_resize": MEDIA_RESIZE_SQL,
    "video_frame_sample": VIDEO_FRAME_SAMPLE_SQL,
    "audio_loudness": AUDIO_LOUDNESS_SQL,
}
