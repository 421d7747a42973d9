"""Property-based tests for the binary format codecs (xls CFB+BIFF8,
BMP) and the BPE merge fold — the components where a writer and reader
implemented by the same hand could be wrong together; hypothesis hunts
the coordinate cases a golden fixture misses."""

from __future__ import annotations

import pytest

pytest.importorskip("hypothesis")
import numpy as np  # noqa: E402
from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

from auto_ml_platform_with_timeseries_data_spark.operators.multimodal import (  # noqa: E402
    _encode_bmp,
    _parse_bmp,
)
from auto_ml_platform_with_timeseries_data_spark.sources import xls  # noqa: E402

# Cell strategy: the value families BIFF8 carries. Text includes BMP
# unicode AND astral-plane chars (UTF-16 surrogate pairs — cch counts
# code units, the classic writer bug).
_text = st.text(
    alphabet=st.characters(
        codec="utf-16", exclude_categories=("Cs",), min_codepoint=32),
    max_size=12,
)
_cell = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**50), max_value=2**50),
    st.floats(allow_nan=False, allow_infinity=False,
              min_value=-1e12, max_value=1e12),
    _text,
)


@settings(max_examples=25, deadline=None)
@given(data=st.data(), ncols=st.integers(1, 6), nrows=st.integers(0, 12))
def test_xls_roundtrip_property(tmp_path_factory, data, ncols, nrows):
    header = [f"c{i}" for i in range(ncols)]
    body = [
        [data.draw(_cell) for _ in range(ncols)] for _ in range(nrows)
    ]
    p = str(tmp_path_factory.mktemp("xlsprop") / "t.xls")
    xls.write_xls_minimal([header] + body, p)
    pdf = xls.read_xls_stdlib(p)
    assert list(pdf.columns) == header
    # sparse-cell contract (same as the .xlsx parser): a row with no
    # populated cell is never materialized — compact the expectation
    body = [row for row in body if any(v is not None for v in row)]
    nrows = len(body)
    assert len(pdf) == nrows
    for r in range(nrows):
        for c in range(ncols):
            want = body[r][c]
            got = pdf.iloc[r, c]
            if want is None:
                assert got is None or (isinstance(got, float) and np.isnan(got))
            elif isinstance(want, bool):
                assert bool(got) is want
            elif isinstance(want, int):
                # ints ride an IEEE double: exact under 2^53
                assert int(got) == want
            elif isinstance(want, float):
                assert float(got) == want or (
                    want.is_integer() and float(got) == want)
            else:
                assert got == want


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 24), w=st.integers(1, 24),
    seed=st.integers(0, 2**31 - 1), topdown=st.booleans(),
)
def test_bmp_roundtrip_property(h, w, seed, topdown):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    blob = bytearray(_encode_bmp(img))
    if topdown:
        # flip the height sign to the top-down variant; pixel rows in the
        # file are bottom-up, so reinterpret accordingly
        import struct

        struct.pack_into("<i", blob, 22, -h)
        assert np.array_equal(_parse_bmp(bytes(blob)), img[::-1])
    else:
        assert np.array_equal(_parse_bmp(bytes(blob)), img)


def _py_merge(syms, left, right):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


@settings(max_examples=8, deadline=None)
@given(data=st.data())
def test_bpe_merge_fold_property(data):
    from pyspark.sql import functions as F

    from auto_ml_platform_with_timeseries_data_spark.operators.text import (
        _apply_merge,
    )
    from auto_ml_platform_with_timeseries_data_spark.session import get_spark

    sym = st.sampled_from(["a", "b", "c", "aa", "ab"])
    rows = data.draw(st.lists(st.lists(sym, min_size=0, max_size=8),
                              min_size=1, max_size=6))
    left, right = data.draw(sym), data.draw(sym)
    spark = get_spark("tests", cores=8, shuffle_partitions=8)
    df = spark.createDataFrame([(r,) for r in rows], "syms array<string>")
    got = [r[0] for r in
           df.select(_apply_merge(F.col("syms"), left, right)).collect()]
    assert got == [_py_merge(r, left, right) for r in rows]
