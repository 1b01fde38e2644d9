"""Posting-list codec: delta-gap + LEB128 varint, block-max metadata.

The reference delegates posting-list storage to ElasticSearch/Lucene
(``/root/reference/config/search_scheme.json`` declares the fields; Lucene
compresses postings). This engine owns that layer: doc_ids are delta-gap
encoded then LEB128-varint packed; term frequencies are varint packed; every
posting list carries block-max metadata (per BLOCK_SIZE postings: last doc_id
and the max BM25 tf/dl impact) for block-max WAND / MaxScore pruning at query
time.

Everything here is numpy-vectorized: the encoder loops over *byte positions*
(<= 10) and the segment builder loops over nothing — per-term slicing is done
with offset arithmetic so one call encodes an entire segment's postings.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128
BM25_K1 = 1.2
BM25_B = 0.75


# --- varint (LEB128) ------------------------------------------------------

def varint_byte_lengths(values: np.ndarray) -> np.ndarray:
    """Bytes each value needs under LEB128 (1..10 for uint64).

    One comparison over the full array; the (usually tiny) multi-byte
    subset iterates further — values < 128 are the overwhelming common
    case for tf streams and dense gap lists."""
    v = values.astype(np.uint64, copy=False)
    lens = np.ones(len(v), dtype=np.int64)
    big = np.flatnonzero(v >= np.uint64(128))
    k = 1
    while len(big):
        lens[big] += 1
        k += 1
        if k >= 10:  # uint64 ceiling: 7*10 bits covers all values
            break
        big = big[v[big] >= np.uint64(1) << np.uint64(7 * k)]
    return lens


def varint_encode(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Encode uint values -> (bytes: uint8 array, per-value byte lengths).

    Vectorized: byte 0 of every value is ONE scatter; bytes 1+ iterate
    only over the (rare) multi-byte subset. All-1-byte streams return the
    cast directly."""
    v = values.astype(np.uint64, copy=False)
    lens = varint_byte_lengths(v)
    if len(v) == 0:
        return np.zeros(0, dtype=np.uint8), lens
    if int(lens.max()) == 1:  # pure 1-byte stream: bytes ARE the values
        return v.astype(np.uint8), lens
    ends = np.cumsum(lens)
    starts = ends - lens
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    multi = lens > 1
    out[starts] = ((v & np.uint64(0x7F)).astype(np.uint8)
                   | (multi.astype(np.uint8) << 7))
    rest = np.flatnonzero(multi)
    j = 1
    while len(rest):
        chunk = ((v[rest] >> np.uint64(7 * j)) & np.uint64(0x7F)).astype(np.uint8)
        cont = ((lens[rest] - 1 > j).astype(np.uint8)) << 7
        out[starts[rest] + j] = chunk | cont
        j += 1
        rest = rest[lens[rest] > j]
    return out, lens


def varint_decode(buf: np.ndarray, count: int | None = None) -> np.ndarray:
    """Decode a uint8 LEB128 stream -> uint64 values (vectorized).

    Fast path: a stream with no continuation bits (every value < 128 — the
    common case for dense head-term gap lists) IS the value array. General
    path uses buffered np.add.reduceat over per-value byte groups.
    """
    b = np.frombuffer(buf, dtype=np.uint8) if isinstance(buf, (bytes, bytearray)) else buf
    if len(b) == 0:
        return np.empty(0, dtype=np.uint64)
    cont = b & np.uint8(0x80)
    if not cont.any():
        vals = b.astype(np.uint64)
        if count is not None:
            assert len(vals) == count, (len(vals), count)
        return vals
    # mostly-1-byte path: first bytes give every value's low 7 bits; only
    # values with continuation bytes (typically a handful per run — e.g.
    # the absolute first doc id of a gap list) loop, vectorized over the
    # shrinking multi-byte set. O(n + n_multi * maxlen) with no
    # searchsorted/reduceat over the whole stream.
    ends = np.flatnonzero(cont == 0)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lens = ends - starts + 1
    vals = b[starts].astype(np.uint64) & np.uint64(0x7F)
    rest = np.flatnonzero(lens > 1)
    j = 1
    while len(rest):
        vals[rest] |= ((b[starts[rest] + j].astype(np.uint64)
                        & np.uint64(0x7F)) << np.uint64(7 * j))
        j += 1
        rest = rest[lens[rest] > j]
    if count is not None:
        assert len(vals) == count, (len(vals), count)
    return vals


# --- delta-gap ------------------------------------------------------------

def delta_encode_runs(sorted_ids: np.ndarray, run_starts: np.ndarray) -> np.ndarray:
    """Delta-gap encode concatenated ascending runs.

    ``sorted_ids`` is the concatenation of per-term ascending doc_id lists;
    ``run_starts`` marks each run's first index. Within a run the first value
    is stored absolute and the rest as gaps (id[i] - id[i-1]).
    """
    gaps = np.empty_like(sorted_ids)
    if len(sorted_ids) == 0:
        return gaps
    gaps[0] = sorted_ids[0]
    gaps[1:] = sorted_ids[1:] - sorted_ids[:-1]
    gaps[run_starts] = sorted_ids[run_starts]
    return gaps


def delta_decode(gaps: np.ndarray) -> np.ndarray:
    """Inverse of a single-run delta encode: cumulative sum."""
    return np.cumsum(gaps.astype(np.int64, copy=False))


def delta_decode_runs(gaps: np.ndarray, run_starts: np.ndarray) -> np.ndarray:
    """Inverse of :func:`delta_encode_runs`: per-run cumulative sums,
    vectorized via one global cumsum minus each run's prefix."""
    n = len(gaps)
    if n == 0:
        return np.empty(0, np.int64)
    c = np.cumsum(gaps.astype(np.int64, copy=False))
    prev = np.r_[0, c[run_starts[1:] - 1]] if len(run_starts) > 1 else np.array([0])
    counts = np.diff(np.r_[run_starts, n])
    return c - np.repeat(prev, counts)


# --- BM25 impact ----------------------------------------------------------

def bm25_tf_impact(tf: np.ndarray, dl: np.ndarray, avgdl: float | None,
                   k1: float = BM25_K1, b: float = BM25_B) -> np.ndarray:
    """Per-posting BM25 term factor  tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl)).

    Multiplied by idf(term) this is the posting's score contribution; the
    per-block max of it is the block-max bound used for pruning.

    ``avgdl=None`` gives the avgdl-free UPPER BOUND (the dl/avgdl -> 0
    limit) — used when encoding fields whose global avgdl is not yet known;
    always >= the true impact, so pruning stays correct.
    """
    tf = tf.astype(np.float64, copy=False)
    if avgdl is None:
        return tf * (k1 + 1.0) / (tf + k1 * (1.0 - b))
    dl = dl.astype(np.float64, copy=False)
    return tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / float(avgdl)))


def bm25_idf(df: np.ndarray | int, n_docs: int) -> np.ndarray | float:
    """ES/Lucene BM25 idf: ln(1 + (N - df + 0.5) / (df + 0.5))."""
    df_f = np.asarray(df, dtype=np.float64)
    return np.log(1.0 + (n_docs - df_f + 0.5) / (df_f + 0.5))


# --- segment posting-table builder ---------------------------------------

def build_posting_table(
    terms_sorted: np.ndarray,
    doc_ids_sorted: np.ndarray,
    tfs_sorted: np.ndarray,
    dls_sorted: np.ndarray,
    avgdl: float,
) -> dict[str, np.ndarray | list]:
    """Build an entire segment's encoded posting table in one vectorized pass.

    Inputs are the segment's postings lex-sorted by (term, doc_id):
    ``terms_sorted`` (object/str array), parallel ``doc_ids_sorted`` (int64),
    ``tfs_sorted`` (int), ``dls_sorted`` (doc length of each posting's doc).

    Returns columns for the segment's term table:
      term, df, doc_ids_enc (bytes), tfs_enc (bytes),
      block_last_doc (list<int64>), block_max_impact (list<float64>),
      max_impact (float64 per term).
    """
    n = len(terms_sorted)
    if n == 0:
        return {
            "term": np.empty(0, object), "df": np.empty(0, np.int64),
            "doc_ids_enc": [], "tfs_enc": [],
            "block_last_flat": np.empty(0, np.int64),
            "block_max_flat": np.empty(0, np.float64),
            "block_doc_off_flat": np.empty(0, np.int64),
            "block_tf_off_flat": np.empty(0, np.int64),
            "block_offsets": np.zeros(1, np.int64),
            "max_impact": np.empty(0, np.float64),
        }
    # term run boundaries over the sorted term column
    change = np.empty(n, dtype=bool)
    change[0] = True
    change[1:] = terms_sorted[1:] != terms_sorted[:-1]
    run_starts = np.flatnonzero(change)
    run_ends = np.r_[run_starts[1:], n]
    dfs = run_ends - run_starts
    uniq_terms = terms_sorted[run_starts]

    # delta + varint over the whole concatenated stream; per-term byte slices
    gaps = delta_encode_runs(doc_ids_sorted.astype(np.uint64, copy=False), run_starts)
    id_bytes, id_lens = varint_encode(gaps)
    tf_bytes, tf_lens = varint_encode(tfs_sorted.astype(np.uint64, copy=False))
    id_byte_ends = np.cumsum(id_lens)
    tf_byte_ends = np.cumsum(tf_lens)

    def slices(stream: np.ndarray, byte_ends: np.ndarray) -> list[bytes]:
        term_end = byte_ends[run_ends - 1]
        term_start = np.r_[0, term_end[:-1]]
        buf = stream.tobytes()
        return [buf[int(s):int(e)] for s, e in zip(term_start, term_end)]

    # block-max metadata per term, BLOCK_SIZE postings per block; the flat
    # block index is non-decreasing over the (term, doc)-sorted stream, so
    # buffered reduceat reductions apply (ufunc.at would be 10-100x slower)
    impact = bm25_tf_impact(tfs_sorted, dls_sorted, avgdl)
    posting_pos = np.arange(n, dtype=np.int64) - np.repeat(run_starts, dfs)
    block_of_posting = posting_pos // BLOCK_SIZE
    n_blocks = (dfs + BLOCK_SIZE - 1) // BLOCK_SIZE
    block_base = np.r_[0, np.cumsum(n_blocks)[:-1]]
    flat_block = block_base[np.repeat(np.arange(len(dfs)), dfs)] + block_of_posting
    blk_starts = np.flatnonzero(np.r_[True, flat_block[1:] != flat_block[:-1]])
    blk_max = np.maximum.reduceat(impact, blk_starts)
    # doc ids ascend within a block: the last element is the block max
    blk_last = doc_ids_sorted[np.r_[blk_starts[1:] - 1, n - 1]].astype(np.int64)
    term_max = np.maximum.reduceat(blk_max, block_base)

    # per-block byte offsets RELATIVE to each term's slice start, for both
    # streams — enables lazy per-block decode (block-max WAND skipping)
    id_byte_starts = np.r_[0, id_byte_ends[:-1]]
    tf_byte_starts = np.r_[0, tf_byte_ends[:-1]]
    term_of_block = np.repeat(np.arange(len(dfs)), n_blocks)
    term_id_base = np.r_[0, id_byte_ends[run_ends - 1][:-1]]
    term_tf_base = np.r_[0, tf_byte_ends[run_ends - 1][:-1]]
    blk_doc_off = (id_byte_starts[blk_starts]
                   - term_id_base[term_of_block]).astype(np.int64)
    blk_tf_off = (tf_byte_starts[blk_starts]
                  - term_tf_base[term_of_block]).astype(np.int64)

    # flat block arrays + per-term offsets (zero-copy Arrow ListArray later)
    block_offsets = np.r_[0, np.cumsum(n_blocks)]

    return {
        "term": uniq_terms,
        "df": dfs.astype(np.int64),
        "doc_ids_enc": slices(id_bytes, id_byte_ends),
        "tfs_enc": slices(tf_bytes, tf_byte_ends),
        "block_last_flat": blk_last,
        "block_max_flat": blk_max,
        "block_doc_off_flat": blk_doc_off,
        "block_tf_off_flat": blk_tf_off,
        "block_offsets": block_offsets,
        "max_impact": term_max,
    }


class BlockedPostings:
    """Lazy per-block reader over one term's encoded postings.

    ``block_last`` gives each block's max doc id (ascending across blocks);
    ``doc_offs``/``tf_offs`` are byte offsets of each block's start within
    the term's encoded streams. Blocks decode on demand and are cached —
    the block-max WAND building block: skip whole blocks via ``block_last``
    without touching their bytes.
    """

    def __init__(self, doc_enc: bytes, tf_enc: bytes, df: int,
                 block_last: np.ndarray, doc_offs: np.ndarray,
                 tf_offs: np.ndarray):
        self.doc_enc = doc_enc
        self.tf_enc = tf_enc
        self.df = int(df)
        self.block_last = block_last
        self.doc_offs = doc_offs
        self.tf_offs = tf_offs
        self.n_blocks = len(block_last)
        self._cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        self._full: tuple[np.ndarray, np.ndarray] | None = None
        self.blocks_decoded = 0

    def block(self, b: int) -> tuple[np.ndarray, np.ndarray]:
        """Decode block ``b`` -> (doc_ids asc, tfs). First gap of a block
        b>0 is relative to the previous block's last doc id. Blocks are
        self-delimiting (byte-offset bounded) — no fixed 128 count is
        assumed, so merged lists with short interior tail blocks decode
        correctly."""
        got = self._cache.get(b)
        if got is not None:
            return got
        d_end = (int(self.doc_offs[b + 1]) if b + 1 < self.n_blocks
                 else len(self.doc_enc))
        t_end = (int(self.tf_offs[b + 1]) if b + 1 < self.n_blocks
                 else len(self.tf_enc))
        gaps = varint_decode(np.frombuffer(
            self.doc_enc[int(self.doc_offs[b]):d_end], dtype=np.uint8))
        tfs = varint_decode(np.frombuffer(
            self.tf_enc[int(self.tf_offs[b]):t_end], dtype=np.uint8))
        assert len(gaps) == len(tfs), (len(gaps), len(tfs))
        ids = np.cumsum(gaps.astype(np.int64))
        if b > 0:
            ids += int(self.block_last[b - 1])
        out = (ids, tfs.astype(np.int64))
        self._cache[b] = out
        self.blocks_decoded += 1
        return out

    def lookup(self, doc_id: int) -> int:
        """tf of ``doc_id`` in this posting list, or 0 — decodes only the
        one block that could contain it."""
        if self._full is not None:
            ids, tfs = self._full
        else:
            b = int(np.searchsorted(self.block_last, doc_id))
            if b >= self.n_blocks:
                return 0
            ids, tfs = self.block(b)
        j = int(np.searchsorted(ids, doc_id))
        if j < len(ids) and int(ids[j]) == doc_id:
            return int(tfs[j])
        return 0

    def decode_full(self) -> tuple[np.ndarray, np.ndarray]:
        """Whole-list decode in two vectorized passes (cached): block gap
        streams chain (block b>0's first gap is relative to block b-1's
        last id), so ONE global cumsum over the concatenated gaps
        reconstructs absolute ids across every block."""
        if self._full is None:
            gaps = varint_decode(np.frombuffer(self.doc_enc, dtype=np.uint8))
            tfs = varint_decode(np.frombuffer(self.tf_enc, dtype=np.uint8))
            ids = np.cumsum(gaps.astype(np.int64))
            self._full = (ids, tfs.astype(np.int64))
            self.blocks_decoded = self.n_blocks
        return self._full

    def lookup_many(self, doc_ids: np.ndarray) -> np.ndarray:
        """Vectorized membership+tf for ascending candidate doc ids.

        Decodes only blocks containing at least one candidate — unless the
        candidates hit more than a third of the blocks, where per-block
        decode overhead exceeds one whole-list decode (the measured
        pathology: a rare term's candidates spread uniformly touch every
        common term's block; 17k per-block decodes vs one two-pass bulk
        decode). Candidates are ascending, so per-block groups are
        contiguous slices, not O(n) masks."""
        out = np.zeros(len(doc_ids), dtype=np.int64)
        if len(doc_ids) == 0:
            return out

        def _fill(sel: np.ndarray, ids: np.ndarray, tfs: np.ndarray,
                  cand: np.ndarray) -> None:
            pos = np.searchsorted(ids, cand)
            ok = pos < len(ids)
            pos_c = np.clip(pos, 0, len(ids) - 1)
            ok &= ids[pos_c] == cand
            vals = np.zeros(len(cand), dtype=np.int64)
            vals[ok] = tfs[pos_c][ok]
            out[sel] = vals

        if self._full is not None:
            ids, tfs = self._full
            _fill(slice(None), ids, tfs, doc_ids)
            return out
        blocks = np.searchsorted(self.block_last, doc_ids)
        uniq, first = np.unique(blocks, return_index=True)
        n_needed = int((uniq < self.n_blocks).sum())
        # absolute floor keeps genuinely sparse probes lazy — bulk decode
        # only pays off once per-block Python overhead (~30 us x blocks)
        # beats the two-pass whole-list decode
        if n_needed > 32 and 3 * n_needed > self.n_blocks:
            ids, tfs = self.decode_full()
            _fill(slice(None), ids, tfs, doc_ids)
            return out
        bounds = np.r_[first, len(doc_ids)]
        for i, b in enumerate(uniq):
            if b >= self.n_blocks:
                continue
            sel = slice(int(bounds[i]), int(bounds[i + 1]))
            ids, tfs = self.block(int(b))
            _fill(sel, ids, tfs, doc_ids[sel])
        return out


def block_lists(table: dict) -> tuple[list[list[int]], list[list[float]]]:
    """Per-term block metadata as Python lists (test/debug convenience)."""
    offs = table["block_offsets"]
    last = [table["block_last_flat"][int(s):int(e)].tolist()
            for s, e in zip(offs[:-1], offs[1:])]
    mx = [table["block_max_flat"][int(s):int(e)].tolist()
          for s, e in zip(offs[:-1], offs[1:])]
    return last, mx


def decode_postings(doc_ids_enc: bytes, tfs_enc: bytes, df: int) -> tuple[np.ndarray, np.ndarray]:
    """Decode one term's postings -> (doc_ids int64 ascending, tfs int64)."""
    gaps = varint_decode(np.frombuffer(doc_ids_enc, dtype=np.uint8), df)
    tfs = varint_decode(np.frombuffer(tfs_enc, dtype=np.uint8), df)
    return delta_decode(gaps), tfs.astype(np.int64)
