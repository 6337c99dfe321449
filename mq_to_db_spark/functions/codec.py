"""Gorilla-style time-series codec — fully vectorized numpy, no Python
row loops (BASELINE.json input_hint: "no per-row Python").

Scheme (north_rule: "Gorilla/delta-of-delta compression"):

  * **timestamps** — delta-of-delta exactly as in the Gorilla paper
    (Pelkonen et al., *Gorilla: A Fast, Scalable, In-Memory Time Series
    Database*, VLDB 2015, §4.1): most series tick at a near-constant
    interval so the second difference is ~0.  We zigzag the dod and store
    it byte-aligned.
  * **float values** — XOR with the previous value (paper §4.2): adjacent
    values share sign/exponent/top-of-mantissa so the XOR is mostly
    zeros.  We store the XOR's nonzero *byte* span (trailing-zero-byte
    count + significant-byte count).

Deviation from the paper, by design: the paper packs variable *bit*
fields inline, which forces bit-serial decode (each field's position
depends on previous control bits).  We use a **split-stream, byte-aligned**
layout instead — all control bytes in one fixed-stride stream, all payload
bytes in a second stream — so both encode *and* decode are pure vector
ops (cumsum for offsets, scatter/gather for bytes, `bitwise_xor.accumulate`
for reconstruction).  This trades a little compression ratio (byte vs bit
granularity) for SIMD/Arrow-friendly throughput, the same trade made by
byte-oriented Gorilla descendants; round-trips are bit-exact (ts int64
exact, float64 bit-pattern exact, NaN-safe).

Layout of each blob (little-endian):
    ts blob:   [n:u32][first:i64][first_delta:i64][ctrl:u8×(n-2)][payload]
    val blob:  [n:u32][first:f64-bits u64][ctrl:u8×(n-1)][payload]
    str blob:  [n:u32][offsets:i32×(n+1)][zlib(utf8 concat)]  (-1 len = null)
"""

from __future__ import annotations

import zlib

import numpy as np

_U32 = np.dtype("<u4")
_I64 = np.dtype("<i8")
_U64 = np.dtype("<u8")
_I32 = np.dtype("<i4")


# -- byte scatter/gather helpers (the shared vectorized core) -----------------


def _pack_varbytes(words: np.ndarray, start_byte: np.ndarray, nbytes: np.ndarray) -> np.ndarray:
    """Extract, for each uint64 word, bytes [start, start+nbytes) into one
    concatenated payload stream.  Vectorized: repeat/arange index magic."""
    n = len(words)
    if n == 0:
        return np.empty(0, dtype=np.uint8)
    mat = words.astype(_U64, copy=False).view(np.uint8).reshape(n, 8)
    total = int(nbytes.sum())
    if total == 0:
        return np.empty(0, dtype=np.uint8)
    row = np.repeat(np.arange(n), nbytes)
    within = np.arange(total) - np.repeat(np.cumsum(nbytes) - nbytes, nbytes)
    col = np.repeat(start_byte, nbytes) + within
    return mat[row, col]


def _unpack_varbytes(payload: np.ndarray, start_byte: np.ndarray, nbytes: np.ndarray) -> np.ndarray:
    """Inverse of _pack_varbytes: scatter payload bytes back into zeroed
    uint64 words."""
    n = len(nbytes)
    mat = np.zeros((n, 8), dtype=np.uint8)
    total = int(nbytes.sum())
    if total:
        row = np.repeat(np.arange(n), nbytes)
        within = np.arange(total) - np.repeat(np.cumsum(nbytes) - nbytes, nbytes)
        col = np.repeat(start_byte, nbytes) + within
        mat[row, col] = payload[:total]
    return mat.reshape(-1).view(_U64)


def _zigzag(x: np.ndarray) -> np.ndarray:
    return ((x.astype(np.int64) << 1) ^ (x.astype(np.int64) >> 63)).view(np.uint64)


def _unzigzag(u: np.ndarray) -> np.ndarray:
    u = u.astype(np.uint64, copy=False)
    return ((u >> np.uint64(1)).view(np.int64)) ^ -((u & np.uint64(1)).view(np.int64))


def _sig_bytes(words: np.ndarray) -> np.ndarray:
    """Number of significant (from LSB) bytes per uint64: 0 for 0."""
    n = len(words)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    mat = words.astype(_U64, copy=False).view(np.uint8).reshape(n, 8)
    nz = mat != 0
    # highest nonzero byte index + 1; 0 if all zero
    return np.where(nz.any(axis=1), 8 - np.argmax(nz[:, ::-1], axis=1), 0).astype(np.int64)


# -- timestamp codec (delta-of-delta) ----------------------------------------


def encode_ts(ts: np.ndarray) -> bytes:
    """ts: int64 array (e.g. epoch microseconds), any monotonicity."""
    ts = np.ascontiguousarray(ts, dtype=np.int64)
    n = len(ts)
    head = np.empty(1, dtype=_U32)
    head[0] = n
    if n == 0:
        return head.tobytes()
    if n == 1:
        return head.tobytes() + ts[:1].astype(_I64).tobytes()
    deltas = np.diff(ts)
    dod = np.diff(deltas)  # length n-2
    z = _zigzag(dod)
    nbytes = _sig_bytes(z)
    payload = _pack_varbytes(z, np.zeros(len(z), dtype=np.int64), nbytes)
    return (
        head.tobytes()
        + ts[:1].astype(_I64).tobytes()
        + deltas[:1].astype(_I64).tobytes()
        + nbytes.astype(np.uint8).tobytes()
        + payload.tobytes()
    )


def decode_ts(blob: bytes) -> np.ndarray:
    buf = np.frombuffer(blob, dtype=np.uint8)
    n = int(buf[:4].view(_U32)[0])
    if n == 0:
        return np.empty(0, dtype=np.int64)
    first = int(buf[4:12].view(_I64)[0])
    if n == 1:
        return np.array([first], dtype=np.int64)
    first_delta = int(buf[12:20].view(_I64)[0])
    m = n - 2
    ctrl = buf[20 : 20 + m].astype(np.int64)
    payload = buf[20 + m :]
    z = _unpack_varbytes(payload, np.zeros(m, dtype=np.int64), ctrl)
    dod = _unzigzag(z)
    deltas = np.empty(n - 1, dtype=np.int64)
    deltas[0] = first_delta
    deltas[1:] = first_delta + np.cumsum(dod)
    out = np.empty(n, dtype=np.int64)
    out[0] = first
    out[1:] = first + np.cumsum(deltas)
    return out


# -- float value codec (XOR) --------------------------------------------------


def encode_xor(vals: np.ndarray) -> bytes:
    """vals: float64 array; bit-exact round-trip incl. NaN/Inf/-0.0."""
    v = np.ascontiguousarray(vals, dtype=np.float64).view(_U64)
    n = len(v)
    head = np.empty(1, dtype=_U32)
    head[0] = n
    if n == 0:
        return head.tobytes()
    if n == 1:
        return head.tobytes() + v[:1].tobytes()
    xor = v[1:] ^ v[:-1]
    m = n - 1
    mat = xor.view(np.uint8).reshape(m, 8)
    nz = mat != 0
    any_nz = nz.any(axis=1)
    first_nz = np.where(any_nz, np.argmax(nz, axis=1), 0)  # trailing zero bytes
    last_nz = np.where(any_nz, 7 - np.argmax(nz[:, ::-1], axis=1), -1)
    sig = np.where(any_nz, last_nz - first_nz + 1, 0).astype(np.int64)
    ctrl = (first_nz.astype(np.uint8) << np.uint8(4)) | sig.astype(np.uint8)
    payload = _pack_varbytes(xor, first_nz.astype(np.int64), sig)
    return head.tobytes() + v[:1].tobytes() + ctrl.tobytes() + payload.tobytes()


def decode_xor(blob: bytes) -> np.ndarray:
    buf = np.frombuffer(blob, dtype=np.uint8)
    n = int(buf[:4].view(_U32)[0])
    if n == 0:
        return np.empty(0, dtype=np.float64)
    first = buf[4:12].view(_U64).copy()
    if n == 1:
        return first.view(np.float64)
    m = n - 1
    ctrl = buf[12 : 12 + m]
    start = (ctrl >> 4).astype(np.int64)
    sig = (ctrl & 0x0F).astype(np.int64)
    payload = buf[12 + m :]
    xor = _unpack_varbytes(payload, start, sig)
    words = np.empty(n, dtype=_U64)
    words[0] = first[0]
    words[1:] = xor
    return np.bitwise_xor.accumulate(words).view(np.float64)


# -- int64 codec (turn_idx etc.) — reuse the ts scheme ------------------------

encode_i64 = encode_ts
decode_i64 = decode_ts


# -- string codec (offsets + zlib) — the text archive -------------------------


def encode_strings(texts) -> bytes:
    """texts: sequence of str|None.  Byte-exact UTF-8 round-trip; nulls
    preserved (offset length -1).  zlib is the entropy stage (vectorized C,
    the role the paper leaves to block compression)."""
    n = len(texts)
    head = np.empty(1, dtype=_U32)
    head[0] = n
    lens = np.fromiter(
        (-1 if t is None else len(t.encode("utf-8")) for t in texts),
        dtype=np.int64,
        count=n,
    )
    concat = b"".join(t.encode("utf-8") for t in texts if t is not None)
    comp = zlib.compress(concat, 6)
    return head.tobytes() + lens.astype(_I32).tobytes() + comp


def decode_strings(blob: bytes) -> list:
    buf = memoryview(blob)
    n = int(np.frombuffer(buf[:4], dtype=_U32)[0])
    lens = np.frombuffer(buf[4 : 4 + 4 * n], dtype=_I32).astype(np.int64)
    raw = zlib.decompress(buf[4 + 4 * n :])
    sizes = np.where(lens < 0, 0, lens)
    ends = np.cumsum(sizes)
    starts = ends - sizes
    return [
        None if lens[i] < 0 else raw[starts[i] : ends[i]].decode("utf-8")
        for i in range(n)
    ]


# -- dictionary codec (role / tool — tiny vocab) ------------------------------


def encode_dict(values) -> bytes:
    """Categorical column: vocab + uint8 codes (255 = null)."""
    vocab: list[str] = []
    index: dict[str, int] = {}
    codes = np.empty(len(values), dtype=np.uint8)
    for i, v in enumerate(values):
        if v is None:
            codes[i] = 255
            continue
        j = index.get(v)
        if j is None:
            j = index[v] = len(vocab)
            vocab.append(v)
            if j >= 255:
                raise ValueError("dictionary codec supports <255 distinct values")
        codes[i] = j
    vocab_blob = encode_strings(vocab)
    head = np.empty(2, dtype=_U32)
    head[0] = len(values)
    head[1] = len(vocab_blob)
    return head.tobytes() + vocab_blob + codes.tobytes()


def decode_dict(blob: bytes) -> list:
    buf = memoryview(blob)
    n, vlen = (int(x) for x in np.frombuffer(buf[:8], dtype=_U32))
    vocab = decode_strings(bytes(buf[8 : 8 + vlen]))
    codes = np.frombuffer(buf[8 + vlen : 8 + vlen + n], dtype=np.uint8)
    return [None if c == 255 else vocab[c] for c in codes]


# -- multi-group (batch) encoders --------------------------------------------
#
# The chunk archive processes thousands of (conv, chunk) groups per Arrow
# batch; calling the single-series encoders per group costs ~50 µs of
# numpy setup each, which dominates when chunks are small (e.g. sparse
# per-user event streams).  These variants run ONE vectorized pass over
# the whole concatenated batch (boundary-safe slicing of diff/xor
# streams) and then assemble each group's blob with O(1) slices —
# byte-identical output to the per-group encoders (asserted in tests).


def encode_ts_grouped(ts: np.ndarray, starts: np.ndarray, ends: np.ndarray) -> list:
    """Per-group ``encode_ts(ts[s:e])`` blobs from one vectorized pass.

    ``dd = diff(ts, 2)`` is computed over the full array; group g's
    delta-of-deltas are exactly ``dd[s : e-2]`` (every term uses only
    in-group elements), so boundary-contaminated entries are simply never
    sliced.  Packing runs once over the whole dd stream; per-group
    payloads are byte-range slices via the cumulative significant-byte
    counts."""
    ts = np.ascontiguousarray(ts, dtype=np.int64)
    n_all = len(ts)
    if n_all == 0:
        return [encode_ts(ts[0:0]) for _ in range(len(starts))]
    d = np.diff(ts) if n_all > 1 else np.empty(0, dtype=np.int64)
    dd = np.diff(d) if n_all > 2 else np.empty(0, dtype=np.int64)
    z = _zigzag(dd)
    nbytes = _sig_bytes(z)
    packed = _pack_varbytes(z, np.zeros(len(z), dtype=np.int64), nbytes).tobytes()
    bcum = np.r_[0, np.cumsum(nbytes)]
    ctrl_all = nbytes.astype(np.uint8)
    ts_raw = ts.astype(_I64)
    d_raw = d.astype(_I64)

    head_all = (np.asarray(ends) - np.asarray(starts)).astype(_U32).tobytes()
    out = []
    for i, (s, e) in enumerate(zip(starts.tolist(), ends.tolist())):
        n = e - s
        head = head_all[4 * i : 4 * i + 4]
        if n == 0:
            out.append(head)
            continue
        if n == 1:
            out.append(head + ts_raw[s : s + 1].tobytes())
            continue
        lo, hi = s, e - 2  # dod slice within dd
        out.append(
            head
            + ts_raw[s : s + 1].tobytes()
            + d_raw[s : s + 1].tobytes()
            + ctrl_all[lo:hi].tobytes()
            + packed[int(bcum[lo]) : int(bcum[hi])]
        )
    return out


encode_i64_grouped = encode_ts_grouped


def encode_xor_grouped(vals: np.ndarray, starts: np.ndarray, ends: np.ndarray) -> list:
    """Per-group ``encode_xor(vals[s:e])`` blobs from one vectorized pass
    (group g's xor stream is exactly ``xor[s : e-1]``)."""
    v = np.ascontiguousarray(vals, dtype=np.float64).view(_U64)
    n_all = len(v)
    if n_all == 0:
        return [encode_xor(np.empty(0)) for _ in range(len(starts))]
    xor = v[1:] ^ v[:-1] if n_all > 1 else np.empty(0, dtype=_U64)
    m = len(xor)
    if m:
        mat = xor.view(np.uint8).reshape(m, 8)
        nz = mat != 0
        any_nz = nz.any(axis=1)
        first_nz = np.where(any_nz, np.argmax(nz, axis=1), 0)
        last_nz = np.where(any_nz, 7 - np.argmax(nz[:, ::-1], axis=1), -1)
        sig = np.where(any_nz, last_nz - first_nz + 1, 0).astype(np.int64)
        ctrl_all = (first_nz.astype(np.uint8) << np.uint8(4)) | sig.astype(np.uint8)
        packed = _pack_varbytes(xor, first_nz.astype(np.int64), sig).tobytes()
        bcum = np.r_[0, np.cumsum(sig)]
    else:
        ctrl_all = np.empty(0, dtype=np.uint8)
        packed = b""
        bcum = np.zeros(1, dtype=np.int64)

    head_all = (np.asarray(ends) - np.asarray(starts)).astype(_U32).tobytes()
    out = []
    for i, (s, e) in enumerate(zip(starts.tolist(), ends.tolist())):
        n = e - s
        head = head_all[4 * i : 4 * i + 4]
        if n == 0:
            out.append(head)
            continue
        if n == 1:
            out.append(head + v[s : s + 1].tobytes())
            continue
        lo, hi = s, e - 1  # xor slice
        out.append(
            head
            + v[s : s + 1].tobytes()
            + ctrl_all[lo:hi].tobytes()
            + packed[int(bcum[lo]) : int(bcum[hi])]
        )
    return out


def encode_strings_grouped(texts: list, starts: np.ndarray, ends: np.ndarray):
    """Per-group ``encode_strings(texts[s:e])`` blobs: every text is
    UTF-8-encoded exactly once for the whole batch; per-group zlib runs
    on a byte-range slice of the concatenated stream.  (zlib per group is
    inherent — each blob must decompress independently.)

    Returns ``(blobs, raw_bytes_per_group)`` — the second array is the
    uncompressed UTF-8 byte count per group (free by-product of the
    single encode pass; callers need it for compression-ratio metrics)."""
    enc = [None if t is None else t.encode("utf-8") for t in texts]
    lens = np.fromiter(
        (-1 if b is None else len(b) for b in enc), dtype=np.int64, count=len(enc)
    )
    concat = b"".join(b for b in enc if b is not None)
    sizes = np.where(lens < 0, 0, lens)
    bcum = np.r_[0, np.cumsum(sizes)]
    lens32 = lens.astype(_I32)

    head_all = (np.asarray(ends) - np.asarray(starts)).astype(_U32).tobytes()
    bcum_l = bcum.tolist()
    out = []
    raw = np.empty(len(starts), dtype=np.int64)
    for i, (s, e) in enumerate(zip(starts.tolist(), ends.tolist())):
        comp = zlib.compress(concat[bcum_l[s] : bcum_l[e]], 6)
        out.append(head_all[4 * i : 4 * i + 4] + lens32[s:e].tobytes() + comp)
        raw[i] = bcum_l[e] - bcum_l[s]
    return out, raw


def _gather_regions(buf: np.ndarray, starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Concatenate buf[starts[i] : starts[i]+lens[i]] for all i (vectorized
    repeat/arange gather)."""
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.uint8)
    within = np.arange(total) - np.repeat(np.cumsum(lens) - lens, lens)
    pos = np.repeat(starts, lens) + within
    return buf[pos]


def decode_ts_grouped(blobs: list) -> tuple:
    """Decode many ts/i64 blobs in one vectorized pass.

    Returns ``(values, counts)`` — the concatenation of every blob's
    decoded int64 array plus per-blob lengths.  Works because sequential
    per-blob payload concatenation IS the packed stream of all words in
    order, so one ``_unpack_varbytes`` call decodes everything; segmented
    cumsums (global cumsum minus per-segment base) rebuild deltas and
    values without a per-blob loop."""
    k = len(blobs)
    if k == 0:
        return np.empty(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
    blens = np.fromiter((len(b) for b in blobs), dtype=np.int64, count=k)
    buf = np.frombuffer(b"".join(blobs), dtype=np.uint8)
    off = np.r_[0, np.cumsum(blens)][:-1]

    n = _gather_regions(buf, off, np.full(k, 4, dtype=np.int64)).view(_U32).astype(np.int64)
    has1 = n >= 1
    has2 = n >= 2
    first = np.zeros(k, dtype=np.int64)
    first[has1] = (
        _gather_regions(buf, off[has1] + 4, np.full(int(has1.sum()), 8, dtype=np.int64))
        .view(_I64)
    )
    first_delta = np.zeros(k, dtype=np.int64)
    first_delta[has2] = (
        _gather_regions(buf, off[has2] + 12, np.full(int(has2.sum()), 8, dtype=np.int64))
        .view(_I64)
    )
    m = np.maximum(n - 2, 0)  # ctrl/dod count per blob
    ctrl_all = _gather_regions(buf, off + 20, m).astype(np.int64)
    pay_lens = np.where(has2, blens - 20 - m, 0)
    payload_all = _gather_regions(buf, off + 20 + m, pay_lens)
    z = _unpack_varbytes(payload_all, np.zeros(len(ctrl_all), dtype=np.int64), ctrl_all)
    dod = _unzigzag(z).astype(np.int64)

    # segmented reconstruction
    counts = n
    total = int(n.sum())
    values = np.empty(total, dtype=np.int64)
    # deltas per blob: length n-1 (first_delta then first_delta+cumsum(dod))
    dstarts = np.r_[0, np.cumsum(m)][:-1]
    g = np.cumsum(dod) if len(dod) else dod
    seg_base = np.where(dstarts > 0, g[dstarts - 1] if len(g) else 0, 0)
    # cum dod within segment, aligned to dod stream
    cum_in_seg = (g - np.repeat(seg_base, m)) if len(dod) else dod
    # build delta stream: per blob n-1 entries
    dl = np.maximum(n - 1, 0)
    delta_total = int(dl.sum())
    deltas = np.empty(delta_total, dtype=np.int64)
    dpos = np.r_[0, np.cumsum(dl)][:-1]
    deltas[dpos[dl > 0]] = first_delta[dl > 0]
    # positions after the first delta of each blob get first_delta + cum_in_seg
    if len(dod):
        tail_mask = np.ones(delta_total, dtype=bool)
        tail_mask[dpos[dl > 0]] = False
        deltas[tail_mask] = np.repeat(first_delta, m) + cum_in_seg
    # values: first, then first + segmented cumsum of deltas
    gd = np.cumsum(deltas) if delta_total else deltas
    dseg_base = np.where(dpos > 0, gd[dpos - 1] if delta_total else 0, 0)
    vpos = np.r_[0, np.cumsum(n)][:-1]
    values[vpos[has1]] = first[has1]
    if delta_total:
        vmask = np.ones(total, dtype=bool)
        vmask[vpos[has1]] = False
        values[vmask] = np.repeat(first, dl) + (gd - np.repeat(dseg_base, dl))
    return values, counts


decode_i64_grouped = decode_ts_grouped


def decode_xor_grouped(blobs: list) -> tuple:
    """Decode many XOR-float blobs in one pass; returns (values, counts).
    Segmented xor-accumulate: with ``acc`` the global running xor over
    the word stream, the value at i within segment [s..] is
    ``acc[i] ^ acc[s-1]`` (xor is its own inverse)."""
    k = len(blobs)
    if k == 0:
        return np.empty(0, dtype=np.float64), np.zeros(0, dtype=np.int64)
    blens = np.fromiter((len(b) for b in blobs), dtype=np.int64, count=k)
    buf = np.frombuffer(b"".join(blobs), dtype=np.uint8)
    off = np.r_[0, np.cumsum(blens)][:-1]

    n = _gather_regions(buf, off, np.full(k, 4, dtype=np.int64)).view(_U32).astype(np.int64)
    has1 = n >= 1
    first = np.zeros(k, dtype=_U64)
    first[has1] = (
        _gather_regions(buf, off[has1] + 4, np.full(int(has1.sum()), 8, dtype=np.int64))
        .view(_U64)
    )
    m = np.maximum(n - 1, 0)
    ctrl_all = _gather_regions(buf, off + 12, np.where(n >= 2, m, 0))
    pay_lens = np.where(n >= 2, blens - 12 - m, 0)
    payload_all = _gather_regions(buf, off + 12 + m, pay_lens)
    start = (ctrl_all >> 4).astype(np.int64)
    sig = (ctrl_all & 0x0F).astype(np.int64)
    xor = _unpack_varbytes(payload_all, start, sig)

    # word stream per blob: [first, xor...]; segmented xor-accumulate
    total = int(n.sum())
    words = np.empty(total, dtype=_U64)
    vpos = np.r_[0, np.cumsum(n)][:-1]
    words[vpos[has1]] = first[has1]
    if len(xor):
        wmask = np.ones(total, dtype=bool)
        wmask[vpos[has1]] = False
        words[wmask] = xor
    acc = np.bitwise_xor.accumulate(words) if total else words
    seg_base = np.zeros(k, dtype=_U64)
    nz = vpos > 0
    seg_base[nz] = acc[vpos[nz] - 1]
    out = acc ^ np.repeat(seg_base, n)
    return out.view(np.float64), n


import struct as _struct


def encode_dict_grouped(values, starts: np.ndarray, ends: np.ndarray) -> list:
    """Per-group ``encode_dict(values[s:e])`` blobs from ONE pass over the
    batch (byte-identical; asserted in tests).

    Group-local codes must number the group's vocab in first-appearance
    order, so a global factorize alone is not enough: we take the global
    distinct table, find each (group, global-code) pair's first row, and
    rank pairs within their group by that row.  Vocab *blobs* are memoized
    by vocab tuple — chunked categorical columns (role/tool) repeat the
    same tiny vocab across thousands of groups, so ``encode_strings`` runs
    once per distinct vocab, not once per group."""
    starts = np.asarray(starts, dtype=np.int64)
    ends = np.asarray(ends, dtype=np.int64)
    k = len(starts)
    n = len(values)
    empty_vocab = encode_strings([])
    if n == 0 or k == 0:
        return [
            _struct.pack("<II", 0, len(empty_vocab)) + empty_vocab for _ in range(k)
        ]
    arr = np.array(values, dtype=object)
    notnull = np.fromiter((v is not None for v in values), dtype=bool, count=n)
    rows = np.flatnonzero(notnull)
    gid = np.repeat(np.arange(k, dtype=np.int64), ends - starts)

    local = np.full(n, 255, dtype=np.uint8)
    vocab_blobs = [empty_vocab] * k
    if len(rows):
        uniques, inv = np.unique(arr[rows].astype(str), return_inverse=True)
        V = len(uniques)
        key = gid[rows] * V + inv
        uk, ui = np.unique(key, return_index=True)
        first_row = rows[ui]
        order = np.argsort(first_row, kind="stable")
        uk_o = uk[order]  # distinct (group, value) in first-appearance order
        g_o = uk_o // V
        c_o = uk_o % V
        newg = np.r_[True, g_o[1:] != g_o[:-1]]
        idx = np.arange(len(uk_o), dtype=np.int64)
        seg_start = np.maximum.accumulate(np.where(newg, idx, 0))
        local_o = idx - seg_start
        if local_o.max() >= 255:
            raise ValueError("dictionary codec supports <255 distinct values")
        local_by_uk = np.empty(len(uk), dtype=np.uint8)
        local_by_uk[order] = local_o.astype(np.uint8)
        local[rows] = local_by_uk[np.searchsorted(uk, key)]

        seg_bounds = np.flatnonzero(newg)
        seg_ends = np.r_[seg_bounds[1:], len(uk_o)]
        cache: dict = {}
        for b, e2, g in zip(seg_bounds.tolist(), seg_ends.tolist(), g_o[seg_bounds].tolist()):
            tup = tuple(uniques[c_o[b:e2]])
            blob = cache.get(tup)
            if blob is None:
                blob = cache[tup] = encode_strings(list(tup))
            vocab_blobs[g] = blob

    codes_bytes = local.tobytes()
    out = []
    for g, (s, e) in enumerate(zip(starts.tolist(), ends.tolist())):
        vb = vocab_blobs[g]
        out.append(_struct.pack("<II", e - s, len(vb)) + vb + codes_bytes[s:e])
    return out


def decode_strings_grouped(blobs: list) -> tuple:
    """Decode many string blobs in one vectorized pass (header/offset
    parsing batched; zlib per blob is inherent — each blob decompresses
    independently).  Returns ``(values, counts)``: the concatenation of
    every blob's decoded list plus per-blob lengths."""
    k = len(blobs)
    if k == 0:
        return [], np.zeros(0, dtype=np.int64)
    blens = np.fromiter((len(b) for b in blobs), dtype=np.int64, count=k)
    joined = b"".join(blobs)
    buf = np.frombuffer(joined, dtype=np.uint8)
    off = np.r_[0, np.cumsum(blens)][:-1]
    n = _gather_regions(buf, off, np.full(k, 4, dtype=np.int64)).view(_U32).astype(np.int64)
    lens_all = _gather_regions(buf, off + 4, 4 * n).view(_I32).astype(np.int64)
    mv = memoryview(joined)
    pay_off = (off + 4 + 4 * n).tolist()
    raw = b"".join(
        zlib.decompress(mv[pay_off[i] : int(off[i] + blens[i])]) for i in range(k)
    )
    sizes = np.where(lens_all < 0, 0, lens_all)
    ends_ = np.cumsum(sizes)
    starts_ = (ends_ - sizes).tolist()
    ends_l = ends_.tolist()
    null = (lens_all < 0).tolist()
    values = [
        None if null[i] else raw[starts_[i] : ends_l[i]].decode("utf-8")
        for i in range(len(null))
    ]
    return values, n


def decode_dict_grouped(blobs: list) -> tuple:
    """Decode many dict blobs in one pass.  Vocab lists are memoized by
    their raw blob bytes (tiny repeated vocabs decode once); code→value
    mapping is a single object-array gather.  Returns ``(values, counts)``
    with ``values`` an object ndarray (None for null codes)."""
    k = len(blobs)
    if k == 0:
        return np.empty(0, dtype=object), np.zeros(0, dtype=np.int64)
    blens = np.fromiter((len(b) for b in blobs), dtype=np.int64, count=k)
    joined = b"".join(blobs)
    buf = np.frombuffer(joined, dtype=np.uint8)
    off = np.r_[0, np.cumsum(blens)][:-1]
    heads = (
        _gather_regions(buf, off, np.full(k, 8, dtype=np.int64))
        .view(_U32)
        .astype(np.int64)
        .reshape(k, 2)
    )
    n = np.ascontiguousarray(heads[:, 0])
    vlen = heads[:, 1]
    mv = memoryview(joined)
    cache: dict = {}
    flat_vocab: list = []
    voff = np.empty(k, dtype=np.int64)
    off_l, vlen_l = off.tolist(), vlen.tolist()
    for i in range(k):
        vb = bytes(mv[off_l[i] + 8 : off_l[i] + 8 + vlen_l[i]])
        vl = cache.get(vb)
        if vl is None:
            vl = cache[vb] = decode_strings(vb)
        voff[i] = len(flat_vocab)
        flat_vocab.extend(vl)
    codes = _gather_regions(buf, off + 8 + vlen, n).astype(np.int64)
    vocab_arr = np.array(flat_vocab + [None], dtype=object)
    null_pos = len(flat_vocab)
    gid = np.repeat(np.arange(k, dtype=np.int64), n)
    idx = np.where(codes == 255, null_pos, voff[gid] + codes)
    return vocab_arr[idx], n
