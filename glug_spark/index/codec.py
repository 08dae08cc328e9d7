"""Posting-list codec: delta-gap + varbyte + block-max metadata.

Pure NumPy, fully vectorized (no per-element Python loops on the hot
path) — this code runs inside Arrow-batched ``applyInPandas`` workers, so
its per-batch cost is what bounds index-build throughput.

Layout per (term, segment) row:

- ``doc_gaps``  varbyte(delta(doc_ids)) with first gap = doc_id[0] + 1
                (gaps are ≥1 so varbyte never emits a zero-length run)
- ``tfs``       varbyte(tf per doc, same order)
- ``dls``       varbyte(document length per doc, same order — kept so
                query-time BM25 math reproduces the full-scan doubles
                bit-exactly; no doc-side join needed at query time)
- ``positions`` varbyte(concat(delta-encoded positions per doc)); per-doc
                counts are the tfs, so no extra length array
- ``block_last`` / ``block_max_tf``: per 128-posting block, the last
                doc_id and max tf — block-skip metadata for WAND.

Varbyte: little-endian 7-bit groups, high bit set on continuation bytes
(the classic scheme; see e.g. Manning/Raghavan/Schütze IR ch. 5).
"""

from __future__ import annotations

import numpy as np

BLOCK = 128


def varbyte_encode(values: np.ndarray) -> bytes:
    """Vectorized varbyte encode of a uint64 array."""
    if len(values) == 0:
        return b""
    v = values.astype(np.uint64, copy=True)
    # number of 7-bit groups per value (at least 1)
    nbits = np.zeros(len(v), dtype=np.int64)
    tmp = v.copy()
    while True:
        active = tmp > 0
        if not active.any():
            break
        nbits[active] += 1
        tmp >>= np.uint64(7)
    nbits[nbits == 0] = 1

    total = int(nbits.sum())
    out = np.zeros(total, dtype=np.uint8)
    ends = np.cumsum(nbits)
    starts = ends - nbits
    # byte slot index within each value, vectorized via repeat arithmetic
    idx = np.arange(total, dtype=np.int64) - np.repeat(starts, nbits)
    vals = np.repeat(v, nbits)
    shifted = vals >> (idx.astype(np.uint64) * np.uint64(7))
    out[:] = (shifted & np.uint64(0x7F)).astype(np.uint8)
    # continuation bit on all but the last byte of each value
    is_last = np.zeros(total, dtype=bool)
    is_last[ends - 1] = True
    out[~is_last] |= 0x80
    return out.tobytes()


def varbyte_decode(data: bytes) -> np.ndarray:
    """Vectorized varbyte decode → uint64 array."""
    if not data:
        return np.zeros(0, dtype=np.uint64)
    raw = np.frombuffer(data, dtype=np.uint8)
    is_last = (raw & 0x80) == 0
    ends = np.flatnonzero(is_last)
    starts = np.concatenate(([0], ends[:-1] + 1))
    lengths = ends - starts + 1
    total = len(raw)
    idx = np.arange(total, dtype=np.int64) - np.repeat(starts, lengths)
    payload = (raw & 0x7F).astype(np.uint64) << (idx.astype(np.uint64) * np.uint64(7))
    out = np.zeros(len(ends), dtype=np.uint64)
    np.add.at(out, np.repeat(np.arange(len(ends)), lengths), payload)
    return out


def delta_encode(sorted_ids: np.ndarray) -> np.ndarray:
    """Strictly-increasing ids → gaps (first gap = id0 + 1, all ≥ 1)."""
    ids = sorted_ids.astype(np.uint64)
    gaps = np.empty(len(ids), dtype=np.uint64)
    if len(ids):
        gaps[0] = ids[0] + np.uint64(1)
        gaps[1:] = ids[1:] - ids[:-1]
    return gaps


def delta_decode(gaps: np.ndarray) -> np.ndarray:
    ids = np.cumsum(gaps, dtype=np.uint64)
    return ids - np.uint64(1)


def encode_positions(positions_per_doc: list[np.ndarray]) -> bytes:
    """Concat of per-doc delta-encoded position lists (first = pos0 + 1)."""
    if not positions_per_doc:
        return b""
    chunks = []
    for p in positions_per_doc:
        p = np.asarray(p, dtype=np.uint64)
        d = np.empty(len(p), dtype=np.uint64)
        if len(p):
            d[0] = p[0] + np.uint64(1)
            d[1:] = p[1:] - p[:-1]
        chunks.append(d)
    return varbyte_encode(np.concatenate(chunks))


def decode_positions(data: bytes, tfs: np.ndarray) -> list[np.ndarray]:
    """Inverse of :func:`encode_positions`; ``tfs`` gives per-doc counts."""
    flat = varbyte_decode(data)
    out = []
    offset = 0
    for tf in tfs.astype(np.int64):
        d = flat[offset : offset + tf]
        offset += tf
        p = np.cumsum(d, dtype=np.uint64) - np.uint64(1)
        out.append(p)
    return out


def block_meta(doc_ids: np.ndarray, tfs: np.ndarray,
               block: int = BLOCK) -> tuple[np.ndarray, np.ndarray]:
    """(block_last_doc, block_max_tf) per block of ``block`` postings."""
    n = len(doc_ids)
    if n == 0:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
    n_blocks = (n + block - 1) // block
    last = doc_ids[np.minimum(np.arange(1, n_blocks + 1) * block - 1, n - 1)]
    pad = (-n) % block
    padded = np.pad(tfs.astype(np.int64), (0, pad), constant_values=0)
    max_tf = padded.reshape(n_blocks, block).max(axis=1)
    return last.astype(np.int64), max_tf


def _block_offsets(data_lens: np.ndarray, block: int) -> list[int]:
    """Byte offset of each block's start given per-value encoded lengths."""
    n = len(data_lens)
    n_blocks = (n + block - 1) // block
    cum = np.concatenate(([0], np.cumsum(data_lens)))
    return [int(cum[min(b * block, n)]) for b in range(n_blocks)]


def _varbyte_lengths(values: np.ndarray) -> np.ndarray:
    """Encoded byte length per value (7 bits per byte, min 1)."""
    v = values.astype(np.uint64)
    lens = np.ones(len(v), dtype=np.int64)
    tmp = v >> np.uint64(7)
    while (tmp > 0).any():
        lens[tmp > 0] += 1
        tmp >>= np.uint64(7)
    return lens


def encode_segment(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    positions_per_doc: list[np.ndarray] | None = None,
    block: int = BLOCK,
) -> dict:
    """Encode one (term, segment) posting run (doc_ids must be sorted).

    Blocks are independently decodable: delta-gaps restart at each block
    (first gap of block b is relative to ``block_last[b-1]``), and
    ``gap_offsets`` / ``tf_offsets`` / ``dl_offsets`` give each block's
    byte start — WAND skips whole blocks without decoding them.
    """
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    dls = np.asarray(dls, dtype=np.int64)
    order = np.argsort(doc_ids, kind="stable")
    doc_ids, tfs, dls = doc_ids[order], tfs[order], dls[order]
    if positions_per_doc is not None:
        positions_per_doc = [positions_per_doc[i] for i in order]

    # standard delta-gaps are already block-restartable: the first gap of
    # block b is relative to the previous element, which is exactly
    # block_last[b-1] — so selective decode seeds from block metadata.
    gaps = delta_encode(doc_ids.astype(np.uint64))
    n = len(doc_ids)

    block_last, block_max_tf = block_meta(doc_ids, tfs, block)
    tf_u, dl_u = tfs.astype(np.uint64), dls.astype(np.uint64)

    pos_blob = b""
    pos_offsets: list[int] = []
    if positions_per_doc is not None:
        pos_blob = encode_positions(positions_per_doc)
        # per-doc encoded byte lengths → per-BLOCK byte starts, so the
        # phrase path can decode positions block-selectively too
        per_doc_lens = np.array(
            [
                int(_varbyte_lengths(_pos_deltas(p)).sum()) if len(p) else 0
                for p in positions_per_doc
            ],
            dtype=np.int64,
        )
        pos_offsets = _block_offsets(per_doc_lens, block)

    return {
        "df_local": n,
        "doc_gaps": varbyte_encode(gaps),
        "tfs": varbyte_encode(tf_u),
        "dls": varbyte_encode(dl_u),
        "positions": pos_blob,
        "block_last": block_last.tolist(),
        "block_max_tf": block_max_tf.tolist(),
        "gap_offsets": _block_offsets(_varbyte_lengths(gaps), block),
        "tf_offsets": _block_offsets(_varbyte_lengths(tf_u), block),
        "dl_offsets": _block_offsets(_varbyte_lengths(dl_u), block),
        "pos_offsets": pos_offsets,
    }


def _pos_deltas(p) -> np.ndarray:
    p = np.asarray(p, dtype=np.uint64)
    d = np.empty(len(p), dtype=np.uint64)
    if len(p):
        d[0] = p[0] + np.uint64(1)
        d[1:] = p[1:] - p[:-1]
    return d


def encode_runs(
    term_codes: np.ndarray,
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    positions_flat: np.ndarray,
    block: int = BLOCK,
) -> list[dict]:
    """Vectorized multi-term encode: one varbyte pass over a whole
    (bucket, segment) group instead of one per term.

    Inputs must be term-major, doc_id-minor sorted; ``term_codes`` is the
    dense code per row (row-aligned); ``positions_flat`` is the
    concatenation of per-row position lists (row i contributes tfs[i]
    values). Per-term byte slices of the shared blobs are byte-identical
    to :func:`encode_segment` output (gaps restart at each term run).
    Returns one dict per term run, in run order, with a ``run_start``
    row index for caller bookkeeping.
    """
    n = len(term_codes)
    if n == 0:
        return []
    starts = np.flatnonzero(np.diff(term_codes, prepend=term_codes[0] - 1))
    ends = np.append(starts[1:], n)

    ids_u = doc_ids.astype(np.uint64)
    gaps = np.empty(n, dtype=np.uint64)
    gaps[1:] = ids_u[1:] - ids_u[:-1]
    gaps[starts] = ids_u[starts] + np.uint64(1)
    tf_u = tfs.astype(np.uint64)
    dl_u = dls.astype(np.uint64)

    glens = _varbyte_lengths(gaps)
    tlens = _varbyte_lengths(tf_u)
    dlens = _varbyte_lengths(dl_u)
    gblob = varbyte_encode(gaps)
    tblob = varbyte_encode(tf_u)
    dblob = varbyte_encode(dl_u)
    gcum = np.concatenate(([0], np.cumsum(glens)))
    tcum = np.concatenate(([0], np.cumsum(tlens)))
    dcum = np.concatenate(([0], np.cumsum(dlens)))

    # per-doc position deltas with per-row restarts
    pos_u = positions_flat.astype(np.uint64)
    row_pos_starts = np.concatenate(([0], np.cumsum(tfs)))[:-1].astype(np.int64)
    pdeltas = np.empty(len(pos_u), dtype=np.uint64)
    if len(pos_u):
        pdeltas[1:] = pos_u[1:] - pos_u[:-1]
        restarts = row_pos_starts[tfs > 0]  # rows with tf=0 own no positions
        pdeltas[restarts] = pos_u[restarts] + np.uint64(1)
    plens = _varbyte_lengths(pdeltas) if len(pos_u) else np.zeros(0, np.int64)
    pblob = varbyte_encode(pdeltas) if len(pos_u) else b""
    # byte offset of each ROW's positions in pblob
    pcum = np.concatenate(([0], np.cumsum(plens)))
    row_pos_byte = pcum[row_pos_starts]
    total_pos_bytes = pcum[-1] if len(pos_u) else 0

    out = []
    for k in range(len(starts)):
        s, e = int(starts[k]), int(ends[k])
        ids_run, tf_run = doc_ids[s:e], tfs[s:e]
        block_last, block_max_tf = block_meta(ids_run, tf_run, block)
        pos_start = int(row_pos_byte[s])
        pos_end = int(row_pos_byte[e]) if e < n else int(total_pos_bytes)
        out.append({
            "run_start": s,
            "df_local": e - s,
            "doc_gaps": gblob[gcum[s]:gcum[e]],
            "tfs": tblob[tcum[s]:tcum[e]],
            "dls": dblob[dcum[s]:dcum[e]],
            "positions": pblob[pos_start:pos_end],
            "block_last": block_last.tolist(),
            "block_max_tf": block_max_tf.tolist(),
            "gap_offsets": _block_offsets(glens[s:e], block),
            "tf_offsets": _block_offsets(tlens[s:e], block),
            "dl_offsets": _block_offsets(dlens[s:e], block),
            "pos_offsets": [
                int(row_pos_byte[r] - pos_start) for r in range(s, e, block)
            ],
        })
    return out


def decode_segment(row) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(doc_ids int64, tfs int64, dls int64) from an encoded row/dict."""
    get = row.get if hasattr(row, "get") else row.__getitem__
    doc_ids = delta_decode(varbyte_decode(get("doc_gaps"))).astype(np.int64)
    tfs = varbyte_decode(get("tfs")).astype(np.int64)
    dls = varbyte_decode(get("dls")).astype(np.int64)
    return doc_ids, tfs, dls


def decode_position_blocks(row, blocks, tfs_concat: np.ndarray,
                           block: int = BLOCK) -> list[np.ndarray]:
    """Per-doc position lists for the given blocks ONLY — skipped
    blocks' position bytes are never touched (``pos_offsets`` gives
    each block's byte start; deltas restart per doc, so any block
    decodes standalone). ``tfs_concat`` is the tf array
    :func:`decode_blocks` returned for the same ``blocks``."""
    get = row.get if hasattr(row, "get") else row.__getitem__
    pos_off = get("pos_offsets")
    pblob = get("positions")
    n = int(get("df_local"))
    n_blocks = len(get("gap_offsets"))
    out: list[np.ndarray] = []
    k = 0
    for b in [int(x) for x in blocks]:
        rows_in_b = min(block, n - b * block)
        tfs_b = np.asarray(tfs_concat[k:k + rows_in_b], dtype=np.int64)
        k += rows_in_b
        end = pos_off[b + 1] if b + 1 < n_blocks else len(pblob)
        out.extend(decode_positions(pblob[pos_off[b]:end], tfs_b))
    return out


def decode_blocks(row, blocks: np.ndarray,
                  block: int = BLOCK) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Selective decode of the given block indices (sorted, unique).

    Skipped blocks' bytes are never touched — this is the WAND skip.
    """
    get = row.get if hasattr(row, "get") else row.__getitem__
    n = int(get("df_local"))
    gap_off = get("gap_offsets")
    tf_off = get("tf_offsets")
    dl_off = get("dl_offsets")
    block_last = get("block_last")
    doc_gaps, tf_blob, dl_blob = get("doc_gaps"), get("tfs"), get("dls")
    n_blocks = len(gap_off)

    def _slice(blob, offsets, b):
        end = offsets[b + 1] if b + 1 < n_blocks else len(blob)
        return blob[offsets[b] : end]

    ids_parts, tf_parts, dl_parts = [], [], []
    for b in [int(b) for b in blocks]:
        gaps = varbyte_decode(_slice(doc_gaps, gap_off, b))
        base = np.uint64(block_last[b - 1] + 1) if b > 0 else np.uint64(0)
        ids = (base + np.cumsum(gaps, dtype=np.uint64) - np.uint64(1)).astype(np.int64)
        ids_parts.append(ids)
        tf_parts.append(varbyte_decode(_slice(tf_blob, tf_off, b)).astype(np.int64))
        dl_parts.append(varbyte_decode(_slice(dl_blob, dl_off, b)).astype(np.int64))
    if not ids_parts:
        z = np.zeros(0, dtype=np.int64)
        return z, z.copy(), z.copy()
    return (
        np.concatenate(ids_parts),
        np.concatenate(tf_parts),
        np.concatenate(dl_parts),
    )
