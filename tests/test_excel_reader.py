"""S2 Excel scan (data_analysis.py:18) without openpyxl: the stdlib
xlsx parser must read a spec-conformant workbook — shared strings,
inline strings, numerics, booleans, sparse cells — with pandas-like
defaults (first row = header)."""

from __future__ import annotations

import zipfile

import pytest

from auto_ml_platform_with_timeseries_data_spark.sources import readers

_CT = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
 <Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
 <Default Extension="xml" ContentType="application/xml"/>
 <Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
 <Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
 <Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>
</Types>"""

_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
 <Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WORKBOOK = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
 xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
 <sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
</workbook>"""

_WB_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
 <Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
</Relationships>"""

_SHARED = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="3" uniqueCount="3">
 <si><t>engine_no</t></si>
 <si><t>sensor_1</t></si>
 <si><r><t>rich </t></r><r><t>text</t></r></si>
</sst>"""

# row 1: header (shared strings + inline). row 2: ints + float.
# row 3: sparse (B3 missing), bool, rich-text shared string.
_SHEET = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
 <sheetData>
  <row r="1">
   <c r="A1" t="s"><v>0</v></c>
   <c r="B1" t="s"><v>1</v></c>
   <c r="C1" t="inlineStr"><is><t>label</t></is></c>
  </row>
  <row r="2">
   <c r="A2"><v>1</v></c>
   <c r="B2"><v>641.82</v></c>
   <c r="C2"><v>112</v></c>
  </row>
  <row r="3">
   <c r="A3"><v>2</v></c>
   <c r="C3" t="s"><v>2</v></c>
  </row>
  <row r="4">
   <c r="A4" t="b"><v>1</v></c>
   <c r="B4"><v>1e3</v></c>
  </row>
 </sheetData>
</worksheet>"""


@pytest.fixture()
def xlsx_path(tmp_path):
    p = tmp_path / "train_data.xlsx"
    with zipfile.ZipFile(p, "w") as z:
        z.writestr("[Content_Types].xml", _CT)
        z.writestr("_rels/.rels", _RELS)
        z.writestr("xl/workbook.xml", _WORKBOOK)
        z.writestr("xl/_rels/workbook.xml.rels", _WB_RELS)
        z.writestr("xl/sharedStrings.xml", _SHARED)
        z.writestr("xl/worksheets/sheet1.xml", _SHEET)
    return str(p)


@pytest.fixture()
def xlsx_clean_path(tmp_path):
    """Homogeneous columns (the C-MAPSS shape) for the Spark round-trip —
    Spark's createDataFrame needs a mergeable type per column."""
    sheet = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
 <sheetData>
  <row r="1">
   <c r="A1" t="s"><v>0</v></c>
   <c r="B1" t="s"><v>1</v></c>
   <c r="C1" t="inlineStr"><is><t>label</t></is></c>
  </row>
  <row r="2"><c r="A2"><v>1</v></c><c r="B2"><v>641.82</v></c><c r="C2"><v>112</v></c></row>
  <row r="3"><c r="A3"><v>2</v></c><c r="B3"><v>642.15</v></c><c r="C3"><v>98</v></c></row>
  <row r="4"><c r="A4"><v>3</v></c><c r="B4"><v>1e3</v></c><c r="C4"><v>75</v></c></row>
 </sheetData>
</worksheet>"""
    p = tmp_path / "clean.xlsx"
    with zipfile.ZipFile(p, "w") as z:
        z.writestr("[Content_Types].xml", _CT)
        z.writestr("_rels/.rels", _RELS)
        z.writestr("xl/workbook.xml", _WORKBOOK)
        z.writestr("xl/_rels/workbook.xml.rels", _WB_RELS)
        z.writestr("xl/sharedStrings.xml", _SHARED)
        z.writestr("xl/worksheets/sheet1.xml", sheet)
    return str(p)


def test_stdlib_xlsx_parser_values(xlsx_path):
    import pandas as pd

    pdf = readers._read_xlsx_stdlib(xlsx_path)
    assert list(pdf.columns) == ["engine_no", "sensor_1", "label"]
    assert pdf.shape == (3, 3)
    assert pdf.iloc[0].tolist() == [1, 641.82, 112]
    row2 = pdf.iloc[1].tolist()
    # missing numeric cell → NaN (pd.read_excel behavior)
    assert row2[0] == 2 and pd.isna(row2[1]) and row2[2] == "rich text"
    assert pdf.iloc[2, 0] is True
    assert pdf.iloc[2, 1] == 1000.0


def test_read_excel_to_spark(spark, xlsx_clean_path):
    # no openpyxl in this image → read_excel exercises the stdlib path
    df = readers.read_excel(spark, xlsx_clean_path)
    assert df.count() == 3
    assert df.columns == ["engine_no", "sensor_1", "label"]
    rows = sorted(df.collect(), key=lambda r: r["engine_no"])
    assert rows[0]["sensor_1"] == pytest.approx(641.82)
    assert rows[2]["sensor_1"] == pytest.approx(1000.0)


def test_read_any_dispatches_xlsx(spark, xlsx_clean_path):
    df = readers.read_any(spark, xlsx_clean_path)
    assert df.count() == 3


def test_col_index_letters():
    assert readers._xlsx_col_index("A1") == 0
    assert readers._xlsx_col_index("Z9") == 25
    assert readers._xlsx_col_index("AA10") == 26
    assert readers._xlsx_col_index("AB7") == 27


def test_cells_without_ref_attribute_use_implied_position(tmp_path, spark):
    """r= is optional in the spec (streaming writers omit it; position
    is implied by document order)."""
    sheet = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
 <sheetData>
  <row><c t="inlineStr"><is><t>a</t></is></c><c t="inlineStr"><is><t>b</t></is></c></row>
  <row><c><v>1</v></c><c><v>2.5</v></c></row>
  <row><c><v>3</v></c><c><v>4.5</v></c></row>
 </sheetData>
</worksheet>"""
    p = tmp_path / "noref.xlsx"
    with zipfile.ZipFile(p, "w") as z:
        z.writestr("[Content_Types].xml", _CT)
        z.writestr("_rels/.rels", _RELS)
        z.writestr("xl/workbook.xml", _WORKBOOK)
        z.writestr("xl/_rels/workbook.xml.rels", _WB_RELS)
        z.writestr("xl/worksheets/sheet1.xml", sheet)
    pdf = readers._read_xlsx_stdlib(str(p))
    assert list(pdf.columns) == ["a", "b"]
    assert pdf.shape == (2, 2)
    assert pdf.iloc[0].tolist() == [1, 2.5]
    assert pdf.iloc[1].tolist() == [3, 4.5]


def test_first_sheet_resolved_by_workbook_order_not_zip_name(tmp_path):
    """Tab order comes from workbook.xml+rels; zip-entry names lie after
    tabs are deleted/reordered in Excel."""
    wb = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
 xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
 <sheets>
  <sheet name="Data" sheetId="3" r:id="rId2"/>
  <sheet name="Old" sheetId="1" r:id="rId1"/>
 </sheets>
</workbook>"""
    wb_rels = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
 <Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
 <Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet3.xml"/>
</Relationships>"""
    first = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
 <sheetData>
  <row r="1"><c r="A1" t="inlineStr"><is><t>right</t></is></c></row>
  <row r="2"><c r="A2"><v>1</v></c></row>
 </sheetData>
</worksheet>"""
    wrong = first.replace("right", "wrong")
    p = tmp_path / "reordered.xlsx"
    with zipfile.ZipFile(p, "w") as z:
        z.writestr("[Content_Types].xml", _CT)
        z.writestr("_rels/.rels", _RELS)
        z.writestr("xl/workbook.xml", wb)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        z.writestr("xl/worksheets/sheet1.xml", wrong)   # lexicographically first
        z.writestr("xl/worksheets/sheet3.xml", first)   # actual first tab
    pdf = readers._read_xlsx_stdlib(str(p))
    assert list(pdf.columns) == ["right"]


# ---------------------------------------------------------------------------
# Legacy .xls (CFB + BIFF8) — stdlib reader/writer
# ---------------------------------------------------------------------------

import struct

from auto_ml_platform_with_timeseries_data_spark.sources import xls


def test_xls_roundtrip_small_ministream(tmp_path):
    """< 4096-byte workbook stream → stored in the CFB mini stream; the
    reader must walk root → miniFAT → mini sectors."""
    rows = [
        ["name", "age", "score", "flag", "note"],
        ["alice", 30, 91.5, True, "hello"],
        ["bob", 25, 88.25, False, None],
        ["carol", 41, 100, True, "hello"],       # SST dedup
        ["dénis", 33, -0.07, False, "ünïcode ☃"],  # wide (UTF-16) strings
    ]
    p = xls.write_xls_minimal(rows, str(tmp_path / "small.xls"))
    pdf = xls.read_xls_stdlib(p)
    assert list(pdf.columns) == rows[0]
    assert pdf["name"].tolist() == ["alice", "bob", "carol", "dénis"]
    assert pdf["age"].tolist() == [30, 25, 41, 33]
    assert pdf["score"].tolist() == [91.5, 88.25, 100, -0.07]
    assert pdf["flag"].tolist() == [True, False, True, False]
    assert pdf["note"].tolist()[0] == "hello"
    assert pdf["note"].tolist()[3] == "ünïcode ☃"
    assert pdf["note"].isna().tolist() == [False, True, False, False]


def test_xls_roundtrip_large_regular_sectors(tmp_path):
    """≥ 4096-byte stream → regular 512-byte FAT sectors."""
    rows = [["id", "val"]] + [[i, i * 1.5] for i in range(500)]
    p = xls.write_xls_minimal(rows, str(tmp_path / "big.xls"))
    pdf = xls.read_xls_stdlib(p)
    assert len(pdf) == 500
    assert pdf["id"].tolist() == list(range(500))
    assert pdf["val"].tolist() == [i * 1.5 for i in range(500)]


def test_xls_through_read_excel_into_spark(spark, tmp_path):
    p = xls.write_xls_minimal(
        [["a", "b"], [1, "x"], [2, "y"]], str(tmp_path / "t.xls"))
    df = readers.read_excel(spark, p)
    got = sorted((r["a"], r["b"]) for r in df.collect())
    assert got == [(1, "x"), (2, "y")]


def test_rk_value_decodings():
    # integer RK: 100 encoded as (100<<2)|2
    assert xls._rk_value((100 << 2) | 2) == 100
    # negative 30-bit integer
    assert xls._rk_value(((-7 & 0x3FFFFFFF) << 2) | 2) == -7
    # float RK: top 30 bits of the IEEE double for 1.0
    assert xls._rk_value(0x3FF00000) == 1.0
    # div-100 flag on an int: 12345 → 123.45
    assert xls._rk_value(((12345 << 2) | 2) | 1) == 123.45


def test_biff8_rk_and_mulrk_records():
    """Hand-crafted sheet using RK/MULRK (which the minimal writer never
    emits) so the reader's compact-number paths are pinned."""
    def rec(rid, payload):
        return struct.pack("<HH", rid, len(payload)) + payload

    sheet = (
        xls._bof(0x0010)
        + rec(xls._RK, struct.pack("<HHHI", 1, 0, 15, (42 << 2) | 2))
        + rec(xls._MULRK,
              struct.pack("<HH", 2, 1)
              + struct.pack("<HI", 15, (7 << 2) | 2)
              + struct.pack("<HI", 15, 0x3FF00000)
              + struct.pack("<H", 2))
        + rec(xls._EOF, b"")
    )
    name = b"S"
    globals_len = len(
        xls._bof(0x0005)
        + rec(xls._BOUNDSHEET, struct.pack("<IHBB", 0, 0, 1, 0) + name)
        + rec(xls._EOF, b"")
    )  # BOUNDSHEET payload size is offset-independent
    book = (
        xls._bof(0x0005)
        + rec(xls._BOUNDSHEET,
              struct.pack("<IHBB", globals_len, 0, 1, 0) + name)
        + rec(xls._EOF, b"")
        + sheet
    )
    rows = xls.parse_biff8(book)
    assert rows[1][0] == 42
    assert rows[2][1] == 7 and rows[2][2] == 1.0


def test_sst_continue_split_mid_string():
    """An SST string split across a CONTINUE record re-emits its
    compression flag at the boundary ([MS-XLS] 2.5.293): segment 1 ends
    mid-string, segment 2 switches to wide chars."""
    seg1 = struct.pack("<II", 2, 2)                 # 2 refs, 2 unique
    seg1 += struct.pack("<HB", 3, 0) + b"abc"       # string 0, compressed
    seg1 += struct.pack("<HB", 6, 0) + b"de"        # string 1: 2 of 6 chars
    seg2 = bytes([1]) + "fghi".encode("utf-16-le")  # rest wide
    got = xls._read_sst([seg1, seg2])
    assert got == ["abc", "defghi"]


def test_cfb_rejects_garbage(tmp_path):
    import pytest

    p = tmp_path / "bad.xls"
    p.write_bytes(b"not an ole2 file" * 40)
    with pytest.raises(ValueError):
        xls.read_xls_stdlib(str(p))


def test_biff8_formula_and_inline_label_records():
    """FORMULA cached results (numeric, bool, and string-via-STRING) and
    inline LABEL strings — paths the minimal writer never emits."""
    def rec(rid, payload):
        return struct.pack("<HH", rid, len(payload)) + payload

    sheet = (
        xls._bof(0x0010)
        # numeric formula result: 2.5
        + rec(xls._FORMULA,
              struct.pack("<HHH", 0, 0, 15) + struct.pack("<d", 2.5)
              + b"\x00\x00\x00\x00\x00\x00")
        # bool formula result: TRUE  (special encoding, tail 0xFFFF)
        + rec(xls._FORMULA,
              struct.pack("<HHH", 0, 1, 15)
              + bytes([1, 0, 1, 0, 0, 0, 0xFF, 0xFF])
              + b"\x00\x00\x00\x00\x00\x00")
        # string formula result: value arrives in the STRING record
        + rec(xls._FORMULA,
              struct.pack("<HHH", 0, 2, 15)
              + bytes([0, 0, 0, 0, 0, 0, 0xFF, 0xFF])
              + b"\x00\x00\x00\x00\x00\x00")
        + rec(xls._STRING, struct.pack("<HB", 2, 0) + b"hi")
        # inline label (compressed)
        + rec(xls._LABEL, struct.pack("<HHHHB", 1, 0, 15, 3, 0) + b"abc")
        # inline label (wide)
        + rec(xls._LABEL, struct.pack("<HHHHB", 1, 1, 15, 2, 1)
              + "é☃".encode("utf-16-le"))
        + rec(xls._EOF, b"")
    )
    name = b"S"
    globals_len = len(
        xls._bof(0x0005)
        + rec(xls._BOUNDSHEET, struct.pack("<IHBB", 0, 0, 1, 0) + name)
        + rec(xls._EOF, b"")
    )
    book = (
        xls._bof(0x0005)
        + rec(xls._BOUNDSHEET,
              struct.pack("<IHBB", globals_len, 0, 1, 0) + name)
        + rec(xls._EOF, b"")
        + sheet
    )
    rows = xls.parse_biff8(book)
    assert rows[0][0] == 2.5
    assert rows[0][1] is True
    assert rows[0][2] == "hi"
    assert rows[1][0] == "abc"
    assert rows[1][1] == "é☃"
