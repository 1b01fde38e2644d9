"""Postings blob sidecar — byte-range reads for cold term lookups.

The reference delegates posting storage to Lucene, whose terms dictionary
points at byte ranges in a separate ``.doc`` postings file. This module is
that layout for the Ray engine: each segment's big encoded-postings byte
columns (``doc_ids_enc`` / ``tfs_enc`` / ``positions_enc``) move out of the
terms parquet into one consolidated sidecar binary
(``terms/segment=K/postings-0.bin``); the parquet keeps only the small
dictionary columns plus ``(blob_off, doc_nbytes, tf_nbytes, pos_nbytes)``
byte ranges, laid out ROW-MAJOR (``doc | tf | pos`` contiguous per term) so
one ranged read per term fetches everything a scorer needs.

Why: parquet predicate pushdown prunes ROW GROUPS, but a surviving row
group materializes its whole projected column chunk — a 2-term cold query
against a 10k-row group decompressed megabytes of other terms' postings
(measured ~0.7 ms/file x segments of pure overhead at 4M docs). With the
sidecar, the dictionary read touches only small columns and the postings
cost is exactly the bytes asked for, served by ``os.pread`` (or one
whole-file read when the request covers most of it). On an object store
this maps to ranged GETs — the layout a 100-TB index needs.

Format compatibility: readers detect the layout from the schema
(``blob_off`` present -> sidecar; ``doc_ids_enc`` present -> inline).
Inline stays the written format when ``BuildConfig.postings_compression``
!= "none" (compressed postings can't be range-read) and for indexes built
before this round; every search/merge path handles both.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

BLOB_NAME = "postings-0.bin"
ENC_COLUMNS = ("doc_ids_enc", "tfs_enc", "positions_enc")
RANGE_COLUMNS = ("blob_off", "doc_nbytes", "tf_nbytes", "pos_nbytes")
# coalesce ranged reads whose gap is under this many bytes: one pread of a
# slightly larger span beats two seeks (and two object-store GETs)
COALESCE_GAP = 1 << 16


def blob_path(terms_parquet_path: str) -> str:
    return os.path.join(os.path.dirname(terms_parquet_path), BLOB_NAME)


def has_sidecar(schema: pa.Schema) -> bool:
    return "blob_off" in schema.names


def has_positions(schema: pa.Schema) -> bool:
    """True when the index records positions (either layout)."""
    return "positions_enc" in schema.names or "pos_nbytes" in schema.names


def split_for_write(terms: pa.Table) -> tuple[pa.Table, bytes]:
    """Logical terms table (with enc columns) -> (physical dict table with
    byte-range columns, sidecar blob bytes)."""
    doc_encs = terms["doc_ids_enc"].combine_chunks().to_pylist()
    tf_encs = terms["tfs_enc"].combine_chunks().to_pylist()
    with_pos = "positions_enc" in terms.column_names
    pos_encs = (terms["positions_enc"].combine_chunks().to_pylist()
                if with_pos else None)
    n = terms.num_rows
    doc_n = np.fromiter((len(b) for b in doc_encs), np.int64, n)
    tf_n = np.fromiter((len(b) for b in tf_encs), np.int64, n)
    if with_pos:
        pos_n = np.fromiter(
            (-1 if b is None else len(b) for b in pos_encs), np.int64, n)
    else:
        pos_n = None
    row_n = doc_n + tf_n + (np.maximum(pos_n, 0) if with_pos else 0)
    offs = np.zeros(n, dtype=np.int64)
    if n:
        np.cumsum(row_n[:-1], out=offs[1:])
    parts: list[bytes] = []
    for i in range(n):
        parts.append(doc_encs[i])
        parts.append(tf_encs[i])
        if with_pos and pos_encs[i] is not None:
            parts.append(pos_encs[i])
    blob = b"".join(parts)
    phys = terms.drop_columns([c for c in ENC_COLUMNS
                               if c in terms.column_names])
    phys = phys.append_column("blob_off", pa.array(offs, pa.int64()))
    phys = phys.append_column("doc_nbytes", pa.array(doc_n, pa.int64()))
    phys = phys.append_column("tf_nbytes", pa.array(tf_n, pa.int64()))
    if with_pos:
        phys = phys.append_column("pos_nbytes", pa.array(pos_n, pa.int64()))
    return phys, blob


class _FdCache:
    """Tiny keep-open fd cache for sidecar files. POSIX semantics make a
    cached fd safe across merges (the old file stays readable until the fd
    closes; new segments live at new paths)."""

    def __init__(self, cap: int = 128):
        self.cap = cap
        self._fds: dict[str, int] = {}

    def get(self, path: str) -> int:
        fd = self._fds.get(path)
        if fd is None:
            fd = os.open(path, os.O_RDONLY)
            while len(self._fds) >= self.cap:  # FIFO eviction
                os.close(self._fds.pop(next(iter(self._fds))))
            self._fds[path] = fd
        return fd


_FDS = _FdCache()


def _read_ranges(path: str, starts: np.ndarray,
                 ends: np.ndarray) -> list[bytes]:
    """Fetch [start, end) byte ranges (any order) from ``path``.

    Ranges are sorted and coalesced (gap < COALESCE_GAP) into few preads;
    when the coalesced spans cover most of the file, one whole-file read
    wins (the merge/compaction access pattern)."""
    k = len(starts)
    if k == 0:
        return []
    order = np.argsort(starts, kind="stable")
    s_s, e_s = starts[order], ends[order]
    # coalesced spans
    brk = np.r_[True, s_s[1:] > (np.maximum.accumulate(e_s)[:-1] + COALESCE_GAP)]
    span_ids = np.cumsum(brk) - 1
    span_starts = s_s[brk]
    span_ends = np.maximum.reduceat(e_s, np.flatnonzero(brk))
    fd = _FDS.get(path)
    total_span = int((span_ends - span_starts).sum())
    fsize = os.fstat(fd).st_size
    if total_span >= fsize // 2:
        whole = os.pread(fd, fsize, 0)
        out_sorted = [whole[int(s):int(e)] for s, e in zip(s_s, e_s)]
    else:
        bufs = [os.pread(fd, int(e - s), int(s))
                for s, e in zip(span_starts, span_ends)]
        out_sorted = []
        for i in range(k):
            sp = int(span_ids[i])
            rel = int(s_s[i] - span_starts[sp])
            out_sorted.append(bufs[sp][rel:rel + int(e_s[i] - s_s[i])])
    out: list[bytes] = [b""] * k
    for j, i in enumerate(order):
        out[int(i)] = out_sorted[j]
    return out


def materialize_enc(tbl: pa.Table, path_of_segment,
                    want_positions: bool = False) -> pa.Table:
    """Append ``doc_ids_enc`` / ``tfs_enc`` (and ``positions_enc``) columns
    to a sidecar-layout dictionary table by ranged reads.

    ``tbl`` must carry ``segment_id`` plus the RANGE_COLUMNS;
    ``path_of_segment(seg_id) -> terms parquet path`` locates each blob.
    No-op for inline-layout tables (enc columns already present)."""
    if "doc_ids_enc" in tbl.column_names:
        return tbl
    n = tbl.num_rows
    segs = tbl["segment_id"].to_numpy()
    offs = tbl["blob_off"].to_numpy()
    doc_n = tbl["doc_nbytes"].to_numpy()
    tf_n = tbl["tf_nbytes"].to_numpy()
    want_positions = want_positions and "pos_nbytes" in tbl.column_names
    pos_n = (tbl["pos_nbytes"].to_numpy() if want_positions
             else np.zeros(n, dtype=np.int64))
    # one fetch per row spanning doc|tf|pos (row-major layout): a single
    # coalesced range covers everything the scorer needs for that term
    ends = offs + doc_n + tf_n + np.maximum(pos_n, 0)
    doc_encs: list[bytes | None] = [None] * n
    tf_encs: list[bytes | None] = [None] * n
    pos_encs: list[bytes | None] = [None] * n
    for sid in np.unique(segs):
        rows = np.flatnonzero(segs == sid)
        path = blob_path(path_of_segment(int(sid)))
        chunks = _read_ranges(path, offs[rows], ends[rows])
        for r, buf in zip(rows, chunks):
            dn, tn = int(doc_n[r]), int(tf_n[r])
            doc_encs[r] = buf[:dn]
            tf_encs[r] = buf[dn:dn + tn]
            if want_positions:
                pn = int(pos_n[r])
                pos_encs[r] = buf[dn + tn:dn + tn + pn] if pn >= 0 else None
    out = tbl.append_column("doc_ids_enc", pa.array(doc_encs, pa.binary()))
    out = out.append_column("tfs_enc", pa.array(tf_encs, pa.binary()))
    if want_positions:
        out = out.append_column("positions_enc",
                                pa.array(pos_encs, pa.binary()))
    return out
