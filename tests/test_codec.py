"""Pure-numpy codec round-trip tests — property-based (hypothesis) plus the
edge-case table the reference's golden tests model (SURVEY.md §5 point 1):
constant series, single point, empty, NaN/Inf/-0.0, non-ASCII, nulls."""

import math

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mq_to_db_spark.functions.codec import (
    decode_dict,
    decode_strings,
    decode_ts,
    decode_xor,
    encode_dict,
    encode_strings,
    encode_ts,
    encode_xor,
)

# -- timestamps ---------------------------------------------------------------


@pytest.mark.parametrize(
    "ts",
    [
        [],
        [0],
        [5, 5],
        [0, 60, 120, 180],  # constant delta → dod 0
        [0, 1, 100, 101, 10**15],
        list(range(0, 10_000_000, 60)),
    ],
)
def test_ts_roundtrip_cases(ts):
    a = np.array(ts, dtype=np.int64)
    assert np.array_equal(decode_ts(encode_ts(a)), a)


@given(st.lists(st.integers(min_value=-(2**62), max_value=2**62), max_size=300))
@settings(max_examples=200, deadline=None)
def test_ts_roundtrip_property(xs):
    a = np.array(xs, dtype=np.int64)
    assert np.array_equal(decode_ts(encode_ts(a)), a)


def test_ts_compression_ratio_regular_series():
    # 1 Hz series with small jitter — the Gorilla sweet spot.
    rng = np.random.default_rng(0)
    ts = (np.arange(100_000) * 1_000_000 + rng.integers(-100, 100, 100_000)).astype(np.int64)
    blob = encode_ts(ts)
    ratio = (len(ts) * 8) / len(blob)
    assert ratio > 3.0  # raw 8 B/point → ~2.1 B/point (ctrl+2-byte dod)


# -- floats -------------------------------------------------------------------


@pytest.mark.parametrize(
    "vals",
    [
        [],
        [3.14],
        [1.0, 1.0, 1.0],
        [0.0, -0.0, float("nan"), float("inf"), -float("inf")],
        [1e-300, 1e300, -1e-300],
    ],
)
def test_xor_roundtrip_cases(vals):
    a = np.array(vals, dtype=np.float64)
    out = decode_xor(encode_xor(a))
    assert a.view(np.uint64).tolist() == out.view(np.uint64).tolist()  # bit-exact


@given(st.lists(st.floats(allow_nan=True, allow_infinity=True, width=64), max_size=300))
@settings(max_examples=200, deadline=None)
def test_xor_roundtrip_property(xs):
    a = np.array(xs, dtype=np.float64)
    out = decode_xor(encode_xor(a))
    assert np.array_equal(a.view(np.uint64), out.view(np.uint64))


def test_xor_compression_ratio():
    # integer-valued doubles (text lengths, counts) — the engine's actual
    # value series; XOR leaves few significant bytes.
    rng = np.random.default_rng(1)
    counts = rng.integers(0, 500, 50_000).astype(np.float64)
    assert (len(counts) * 8) / len(encode_xor(counts)) > 1.8
    # noisy continuous gauge: byte-aligned XOR still beats raw, modestly.
    v = np.cumsum(rng.normal(0, 0.5, 50_000)) + 1000.0
    assert (len(v) * 8) / len(encode_xor(v)) > 1.05


# -- strings ------------------------------------------------------------------


@pytest.mark.parametrize(
    "texts",
    [
        [],
        [""],
        [None],
        ["hello", None, "", "日本語テキスト", "naïve 🚀", "a" * 10_000],
    ],
)
def test_strings_roundtrip_cases(texts):
    assert decode_strings(encode_strings(texts)) == texts


@given(st.lists(st.one_of(st.none(), st.text(max_size=200)), max_size=100))
@settings(max_examples=100, deadline=None)
def test_strings_roundtrip_property(texts):
    assert decode_strings(encode_strings(texts)) == texts


# -- dictionary ---------------------------------------------------------------


def test_dict_roundtrip():
    vals = ["user", "assistant", None, "tool", "user", None, "assistant"] * 10
    assert decode_dict(encode_dict(vals)) == vals


def test_dict_overflow():
    with pytest.raises(ValueError, match="<255"):
        encode_dict([str(i) for i in range(300)])


def test_grouped_encoders_byte_identical():
    """Batch (multi-group) encoders must produce byte-identical blobs to
    the per-group encoders for every group — including length-1/2/3
    groups where the dod/xor streams are empty or single-element."""
    import numpy as np
    from mq_to_db_spark.functions import codec

    rng = np.random.default_rng(77)
    lens = [1, 2, 3, 1, 50, 2, 17, 1, 4]
    ends = np.cumsum(lens)
    starts = ends - np.array(lens)
    n = int(ends[-1])

    ts = np.cumsum(rng.integers(1, 10_000_000, n)).astype(np.int64)
    vals = np.where(rng.random(n) < 0.1, 0.0, rng.normal(0, 1e6, n))
    texts = [
        None if rng.random() < 0.1 else ("naïve 🚀 " * int(rng.integers(0, 5)) + str(i))
        for i in range(n)
    ]

    for got, ref in zip(
        codec.encode_ts_grouped(ts, starts, ends),
        [codec.encode_ts(ts[s:e]) for s, e in zip(starts, ends)],
    ):
        assert got == ref
    for got, ref in zip(
        codec.encode_xor_grouped(vals, starts, ends),
        [codec.encode_xor(vals[s:e]) for s, e in zip(starts, ends)],
    ):
        assert got == ref
    blobs, raw = codec.encode_strings_grouped(texts, starts, ends)
    for i, (s, e) in enumerate(zip(starts, ends)):
        assert blobs[i] == codec.encode_strings(texts[s:e])
        assert raw[i] == sum(len(t.encode("utf-8")) for t in texts[s:e] if t is not None)
    # decode round-trip through the grouped path
    ts_blobs_g = codec.encode_ts_grouped(ts, starts, ends)
    for i, (s, e) in enumerate(zip(starts, ends)):
        assert np.array_equal(codec.decode_ts(ts_blobs_g[i]), ts[s:e])
        assert codec.decode_strings(blobs[i]) == texts[s:e]


def test_grouped_decoders_match_single():
    """Grouped ts/xor decode ≡ per-blob decode, across group lengths
    1/2/3/long, including all-zero dods, NaN/Inf floats, and negative
    deltas (out-of-order timestamps)."""
    import numpy as np
    from mq_to_db_spark.functions import codec

    rng = np.random.default_rng(99)
    lens = [1, 2, 3, 40, 1, 2, 25, 7, 1]
    arrays_ts, arrays_v = [], []
    for L in lens:
        base = int(rng.integers(10**14, 10**15))
        steps = rng.integers(-50, 10_000_000, L - 1) if L > 1 else np.empty(0, dtype=np.int64)
        arrays_ts.append(np.r_[base, base + np.cumsum(steps)].astype(np.int64))
        v = rng.normal(0, 1e9, L)
        if L > 2:
            v[1] = np.nan
            v[2] = np.inf
        arrays_v.append(v)
    ts_blobs = [codec.encode_ts(a) for a in arrays_ts]
    v_blobs = [codec.encode_xor(a) for a in arrays_v]

    vals, counts = codec.decode_ts_grouped(ts_blobs)
    assert list(counts) == lens
    assert np.array_equal(vals, np.concatenate(arrays_ts))

    fvals, fcounts = codec.decode_xor_grouped(v_blobs)
    assert list(fcounts) == lens
    want = np.concatenate(arrays_v)
    assert np.array_equal(fvals.view(np.uint64), want.view(np.uint64))  # bit-exact incl NaN


def test_dict_grouped_byte_identical_and_decode():
    """encode_dict_grouped ≡ per-group encode_dict byte-for-byte (group-
    local first-appearance vocab order, vocab-blob memoization across
    groups, None codes, empty groups); decode_dict_grouped and
    decode_strings_grouped round-trip the concatenated values."""
    import numpy as np
    from mq_to_db_spark.functions import codec

    rng = np.random.default_rng(123)
    lens = [1, 2, 0, 3, 50, 2, 17, 1, 4, 0, 8]
    ends = np.cumsum(lens)
    starts = ends - np.array(lens)
    n = int(ends[-1])
    vocab = ["click", "view", "buy", "naïve 🚀"]
    vals = [
        None if rng.random() < 0.25 else vocab[int(rng.integers(0, len(vocab)))]
        for _ in range(n)
    ]
    got = codec.encode_dict_grouped(vals, starts, ends)
    ref = [codec.encode_dict(vals[s:e]) for s, e in zip(starts, ends)]
    assert got == ref

    dv, dc = codec.decode_dict_grouped(got)
    assert list(dc) == lens
    assert dv.tolist() == vals

    texts = [
        None if rng.random() < 0.1 else ("payload " * int(rng.integers(0, 4)) + str(i))
        for i in range(n)
    ]
    blobs = [codec.encode_strings(texts[s:e]) for s, e in zip(starts, ends)]
    sv, sc = codec.decode_strings_grouped(blobs)
    assert sv == texts
    assert list(sc) == lens


def test_dict_grouped_local_vocab_order_differs_from_global():
    """Two groups seeing the same values in different first-appearance
    order must get different vocab blobs — the global factorize cannot
    leak its ordering into the per-group dictionaries."""
    import numpy as np
    from mq_to_db_spark.functions import codec

    vals = ["b", "a", "b", "a", "b", "a"]  # g0 sees b-first, g1 sees a-first
    starts = np.array([0, 3])
    ends = np.array([3, 6])
    got = codec.encode_dict_grouped(vals, starts, ends)
    assert got[0] == codec.encode_dict(["b", "a", "b"])
    assert got[1] == codec.encode_dict(["a", "b", "a"])
    assert codec.decode_dict(got[0]) == ["b", "a", "b"]
    assert codec.decode_dict(got[1]) == ["a", "b", "a"]


def test_dict_grouped_overflow_raises():
    import numpy as np
    from mq_to_db_spark.functions import codec

    vals = [str(i) for i in range(300)]
    with pytest.raises(ValueError, match="<255"):
        codec.encode_dict_grouped(vals, np.array([0]), np.array([300]))
