"""Dependency-free legacy ``.xls`` (BIFF8) reader + minimal writer.

Closes the reference's Excel-ingest surface (S2, `data_analysis.py:18`)
for the pre-2007 binary format WITHOUT xlrd, which this image lacks.
Two well-documented layers, both implemented from the public Microsoft
specs:

- **MS-CFB** (Compound File Binary, the OLE2 container): 512-byte
  sectors chained through a FAT; streams under 4096 bytes live in a
  64-byte-sector *mini stream* chained through a miniFAT hanging off
  the root directory entry. `_cfb_stream` walks header → DIFAT → FAT →
  directory → (mini)FAT chains and returns the named stream's bytes.
- **MS-XLS** (BIFF8): the Workbook stream is a sequence of
  [u16 id][u16 length][payload] records. The globals substream carries
  the shared-string table (SST — strings may split across CONTINUE
  records, re-emitting a compression flag at each split) and the
  BOUNDSHEET offsets; each sheet substream carries cell records
  (NUMBER / RK / MULRK / LABELSST / LABEL / BOOLERR / FORMULA).

Like the stdlib .xlsx parser, this is a DRIVER-side ingest: .xls files
are small by construction (the format's hard cap is 65,536 rows × 256
columns ≈ a few MB), so parse-then-`createDataFrame` via Arrow is the
right physical plan; bulk columnar data enters through CSV / parquet /
JSONL. Known divergence, same as the .xlsx path: DATE cells surface as
raw Excel serial numbers (date-ness lives in XF format records, not in
the cell), convert downstream or install xlrd for native datetimes.

`write_xls_minimal` emits a spec-literal single-sheet BIFF8 workbook in
a minimal CFB container (both the mini-stream and regular-sector
layouts, picked by the 4096-byte rule) — the fixture generator for the
reader's tests and a small-table sink.
"""

from __future__ import annotations

import struct

FREESECT = 0xFFFFFFFF
ENDOFCHAIN = 0xFFFFFFFE
FATSECT = 0xFFFFFFFD
DIFSECT = 0xFFFFFFFC
NOSTREAM = 0xFFFFFFFF
_CFB_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_MINI_CUTOFF = 4096


def _u16(b: bytes, o: int) -> int:
    return struct.unpack_from("<H", b, o)[0]


def _u32(b: bytes, o: int) -> int:
    return struct.unpack_from("<I", b, o)[0]


# ---------------------------------------------------------------------------
# MS-CFB container
# ---------------------------------------------------------------------------


def _cfb_stream(data: bytes, *names: str) -> bytes:
    """Return the bytes of the first directory stream whose name matches
    one of `names` (case-sensitive, as the spec stores them)."""
    if data[:8] != _CFB_MAGIC:
        raise ValueError("not an OLE2/CFB file (bad magic)")
    ssz = 1 << _u16(data, 30)
    mssz = 1 << _u16(data, 32)
    nfat = _u32(data, 44)
    dir_start = _u32(data, 48)
    minifat_start = _u32(data, 60)
    difat_start = _u32(data, 68)

    def sector(n: int) -> bytes:
        off = ssz * (n + 1)
        return data[off : off + ssz]

    # DIFAT: 109 header entries + optional chained DIFAT sectors
    difat = [_u32(data, 76 + 4 * i) for i in range(109)]
    s, hops = difat_start, 0
    while s not in (ENDOFCHAIN, FREESECT) and hops < 1 << 16:
        sec = sector(s)
        difat += [_u32(sec, 4 * i) for i in range(ssz // 4 - 1)]
        s = _u32(sec, ssz - 4)
        hops += 1
    fat_sectors = [x for x in difat if x not in (FREESECT, ENDOFCHAIN)][:nfat]
    fat: list[int] = []
    for fs in fat_sectors:
        sec = sector(fs)
        fat += [_u32(sec, 4 * i) for i in range(ssz // 4)]

    def chain(start: int) -> list[int]:
        out, s = [], start
        while s not in (ENDOFCHAIN, FREESECT) and len(out) <= len(fat):
            if s >= len(fat):
                raise ValueError(f"FAT chain out of range at sector {s}")
            out.append(s)
            s = fat[s]
        return out

    def read_chain(start: int) -> bytes:
        return b"".join(sector(s) for s in chain(start))

    dirdata = read_chain(dir_start)
    entries = []
    for off in range(0, len(dirdata), 128):
        e = dirdata[off : off + 128]
        if len(e) < 128:
            break
        nlen = _u16(e, 64)
        name = e[: max(0, nlen - 2)].decode("utf-16-le", "replace")
        entries.append({
            "name": name,
            "type": e[66],
            "start": _u32(e, 116),
            "size": struct.unpack_from("<Q", e, 120)[0] & 0xFFFFFFFF,
        })
    if not entries or entries[0]["type"] != 5:
        raise ValueError("CFB directory has no root entry")
    root = entries[0]

    target = next(
        (e for e in entries[1:] if e["type"] == 2 and e["name"] in names),
        None)
    if target is None:
        raise ValueError(f"no stream named {names} in CFB directory")

    if target["size"] < _MINI_CUTOFF:
        ministream = read_chain(root["start"])[: root["size"]]
        minifat: list[int] = []
        if minifat_start not in (ENDOFCHAIN, FREESECT):
            mdata = read_chain(minifat_start)
            minifat = [_u32(mdata, 4 * i) for i in range(len(mdata) // 4)]
        out, s = [], target["start"]
        while s not in (ENDOFCHAIN, FREESECT) and len(out) <= len(minifat):
            out.append(ministream[mssz * s : mssz * (s + 1)])
            s = minifat[s] if s < len(minifat) else ENDOFCHAIN
        return b"".join(out)[: target["size"]]
    return read_chain(target["start"])[: target["size"]]


# ---------------------------------------------------------------------------
# BIFF8 records
# ---------------------------------------------------------------------------

_BOF = 0x0809
_EOF = 0x000A
_SST = 0x00FC
_CONTINUE = 0x003C
_BOUNDSHEET = 0x0085
_NUMBER = 0x0203
_RK = 0x027E
_MULRK = 0x00BD
_LABELSST = 0x00FD
_LABEL = 0x0204
_BOOLERR = 0x0205
_FORMULA = 0x0006
_STRING = 0x0207


def _records(b: bytes, start: int = 0):
    pos = start
    while pos + 4 <= len(b):
        rid, ln = struct.unpack_from("<HH", b, pos)
        if rid == 0:
            return
        yield rid, b[pos + 4 : pos + 4 + ln], pos
        pos += 4 + ln


class _SegCursor:
    """Cursor over an SST payload split across CONTINUE records: raw
    reads cross segment boundaries transparently; `chars` re-reads the
    compression flag at each boundary, as [MS-XLS] 2.5.293 requires."""

    def __init__(self, segs: list[bytes]):
        self.segs, self.i, self.p = segs, 0, 0

    def _avail(self) -> int:
        return len(self.segs[self.i]) - self.p

    def _advance(self) -> None:
        while self.i < len(self.segs) - 1 and self._avail() == 0:
            self.i += 1
            self.p = 0

    def read(self, n: int) -> bytes:
        out = bytearray()
        while n > 0:
            self._advance()
            take = min(n, self._avail())
            if take == 0:
                raise ValueError("truncated SST stream")
            out += self.segs[self.i][self.p : self.p + take]
            self.p += take
            n -= take
        return bytes(out)

    def u8(self) -> int:
        return self.read(1)[0]

    def u16(self) -> int:
        return struct.unpack("<H", self.read(2))[0]

    def u32(self) -> int:
        return struct.unpack("<I", self.read(4))[0]

    def chars(self, cch: int, wide: bool) -> str:
        out = []
        while cch > 0:
            self._advance()
            avail = self._avail()
            if avail == 0:
                raise ValueError("truncated SST string")
            if out:  # crossed into a CONTINUE: fresh compression flag
                wide = bool(self.u8() & 1)
                avail -= 1
            width = 2 if wide else 1
            take = min(cch, avail // width)
            if take == 0:
                # flag byte was the segment's last byte — loop again
                if avail // width == 0 and self._avail() == 0:
                    continue
                raise ValueError("SST split inside a character")
            raw = self.read(take * width)
            out.append(raw.decode("utf-16-le" if wide else "latin-1"))
            cch -= take
        return "".join(out)


def _read_sst(segs: list[bytes]) -> list[str]:
    cur = _SegCursor(segs)
    cur.u32()  # total string refs (unused)
    unique = cur.u32()
    out = []
    for _ in range(unique):
        cch = cur.u16()
        flags = cur.u8()
        wide = bool(flags & 1)
        n_runs = cur.u16() if flags & 8 else 0
        cb_ext = cur.u32() if flags & 4 else 0
        out.append(cur.chars(cch, wide))
        if n_runs:
            cur.read(4 * n_runs)  # rich-text runs: skip
        if cb_ext:
            cur.read(cb_ext)      # phonetic/ext block: skip
    return out


def _rk_value(v: int):
    div100 = v & 1
    if v & 2:  # 30-bit signed integer
        x = v >> 2
        if x & 0x20000000:
            x -= 0x40000000
        return x / 100 if div100 else x
    # high 30 bits are the top of an IEEE double
    x = struct.unpack("<d", struct.pack("<Q", (v & 0xFFFFFFFC) << 32))[0]
    return x / 100 if div100 else x


def _norm_num(x):
    """BIFF stores every number as a double; surface integral values as
    int to match the .xlsx parser's inference."""
    if isinstance(x, float) and x.is_integer() and abs(x) < 2**53:
        return int(x)
    return x


def parse_biff8(book: bytes) -> dict[int, dict[int, object]]:
    """Workbook stream → sparse {row: {col: value}} for the FIRST sheet
    (the pd.read_excel default this engine mirrors)."""
    sst: list[str] = []
    sheet_offsets: list[int] = []
    pending_sst: list[bytes] | None = None
    for rid, payload, _pos in _records(book):
        if rid == _SST:
            pending_sst = [payload]
        elif rid == _CONTINUE and pending_sst is not None:
            pending_sst.append(payload)
        else:
            if pending_sst is not None:
                sst = _read_sst(pending_sst)
                pending_sst = None
            if rid == _BOUNDSHEET:
                sheet_offsets.append(_u32(payload, 0))
            elif rid == _EOF:
                break
    if pending_sst is not None:
        sst = _read_sst(pending_sst)
    if not sheet_offsets:
        raise ValueError("BIFF8 workbook has no sheets")

    rows: dict[int, dict[int, object]] = {}

    def put(r: int, c: int, v) -> None:
        rows.setdefault(r, {})[c] = v

    recs = _records(book, sheet_offsets[0])
    for rid, payload, _pos in recs:
        if rid == _EOF:
            break
        if rid == _NUMBER:
            r, c = _u16(payload, 0), _u16(payload, 2)
            put(r, c, _norm_num(struct.unpack_from("<d", payload, 6)[0]))
        elif rid == _RK:
            r, c = _u16(payload, 0), _u16(payload, 2)
            put(r, c, _norm_num(_rk_value(_u32(payload, 6))))
        elif rid == _MULRK:
            r, c0 = _u16(payload, 0), _u16(payload, 2)
            n = (len(payload) - 6) // 6
            for i in range(n):  # entry i: ixfe at 4+6i, RK at 6+6i
                put(r, c0 + i,
                    _norm_num(_rk_value(_u32(payload, 6 + 6 * i))))
        elif rid == _LABELSST:
            r, c = _u16(payload, 0), _u16(payload, 2)
            put(r, c, sst[_u32(payload, 6)])
        elif rid == _LABEL:
            r, c = _u16(payload, 0), _u16(payload, 2)
            cch = _u16(payload, 6)
            wide = bool(payload[8] & 1)
            raw = payload[9 : 9 + cch * (2 if wide else 1)]
            put(r, c, raw.decode("utf-16-le" if wide else "latin-1"))
        elif rid == _BOOLERR:
            r, c = _u16(payload, 0), _u16(payload, 2)
            if payload[7] == 0:  # a bool, not an error code
                put(r, c, bool(payload[6]))
        elif rid == _FORMULA:
            r, c = _u16(payload, 0), _u16(payload, 2)
            res = payload[6:14]
            if res[6:8] != b"\xff\xff":
                put(r, c, _norm_num(struct.unpack("<d", res)[0]))
            elif res[0] == 0:  # string result: value in trailing STRING
                nxt = next(recs, None)
                if nxt and nxt[0] == _STRING:
                    sp = nxt[1]
                    cch = _u16(sp, 0)
                    wide = bool(sp[2] & 1)
                    raw = sp[3 : 3 + cch * (2 if wide else 1)]
                    put(r, c, raw.decode("utf-16-le" if wide else "latin-1"))
            elif res[0] == 1:  # bool result
                put(r, c, bool(res[2]))
    return rows


def read_xls_stdlib(path: str):
    """.xls → pandas DataFrame (first sheet, first row = header) — the
    xlrd-free fallback `readers.read_excel` uses."""
    from auto_ml_platform_with_timeseries_data_spark.sources.readers import _cells_to_pdf

    with open(path, "rb") as f:
        data = f.read()
    book = _cfb_stream(data, "Workbook", "Book")
    return _cells_to_pdf(parse_biff8(book))


# ---------------------------------------------------------------------------
# Minimal writer (fixtures + small-table sink)
# ---------------------------------------------------------------------------


def _rec(rid: int, payload: bytes) -> bytes:
    return struct.pack("<HH", rid, len(payload)) + payload


def _bof(dt: int) -> bytes:
    return _rec(_BOF, struct.pack("<HHHHII", 0x0600, dt, 0x0DBB, 0x07CC,
                                  0x000000C9, 0x00000206))


def _biff_workbook(rows: list[list[object]]) -> bytes:
    """rows (header first) → single-sheet BIFF8 Workbook stream bytes."""
    strings: list[str] = []
    index: dict[str, int] = {}
    cells = bytearray()
    nref = 0
    for r, row in enumerate(rows):
        for c, v in enumerate(row):
            if v is None:
                continue
            if isinstance(v, bool):
                cells += _rec(_BOOLERR,
                              struct.pack("<HHHBB", r, c, 15, int(v), 0))
            elif isinstance(v, (int, float)):
                cells += _rec(_NUMBER,
                              struct.pack("<HHHd", r, c, 15, float(v)))
            else:
                s = str(v)
                if s not in index:
                    index[s] = len(strings)
                    strings.append(s)
                nref += 1
                cells += _rec(_LABELSST,
                              struct.pack("<HHHI", r, c, 15, index[s]))
    sheet = _bof(0x0010) + bytes(cells) + _rec(_EOF, b"")

    sst = b""
    if strings:
        body = bytearray(struct.pack("<II", nref, len(strings)))
        for s in strings:
            wide = any(ord(ch) > 0xFF for ch in s)
            raw = s.encode("utf-16-le" if wide else "latin-1")
            # cch counts UTF-16 CODE UNITS, not Python characters —
            # astral-plane chars occupy two units (surrogate pair)
            cch = len(raw) // 2 if wide else len(raw)
            body += struct.pack("<HB", cch, 1 if wide else 0) + raw
        sst = _rec(_SST, bytes(body))

    name = b"Sheet1"
    bsheet_payload = struct.pack("<IHBB", 0, 0, len(name), 0) + name
    globals_part = (_bof(0x0005) + sst
                    + _rec(_BOUNDSHEET, bsheet_payload) + _rec(_EOF, b""))
    # patch the BOUNDSHEET lbPlyPos with the sheet substream offset
    sheet_off = len(globals_part)
    pos = globals_part.index(_rec(_BOUNDSHEET, bsheet_payload)) + 4
    globals_part = (globals_part[:pos] + struct.pack("<I", sheet_off)
                    + globals_part[pos + 4:])
    return globals_part + sheet


def _cfb_wrap(stream: bytes, name: str = "Workbook") -> bytes:
    """Wrap one stream in a minimal v3 CFB container: 1 FAT sector,
    1 directory sector (Root + stream + 2 free), and — per the 4096-byte
    rule — either a miniFAT + mini stream or regular stream sectors."""
    ssz, mssz = 512, 64

    def pad(b: bytes, unit: int) -> bytes:
        return b + b"\x00" * (-len(b) % unit)

    fat = [FREESECT] * (ssz // 4)
    fat[0] = FATSECT
    fat[1] = ENDOFCHAIN  # directory: one sector

    small = len(stream) < _MINI_CUTOFF
    sectors: list[bytes] = []
    if small:
        mini = pad(stream, mssz)
        nmini = len(mini) // mssz
        minifat = [FREESECT] * (ssz // 4)
        for i in range(nmini):
            minifat[i] = i + 1 if i + 1 < nmini else ENDOFCHAIN
        fat[2] = ENDOFCHAIN  # miniFAT: one sector
        mini_padded = pad(mini, ssz)
        n_mini_secs = len(mini_padded) // ssz
        for i in range(n_mini_secs):
            fat[3 + i] = 3 + i + 1 if i + 1 < n_mini_secs else ENDOFCHAIN
        sectors.append(struct.pack(f"<{ssz // 4}I", *minifat))
        sectors += [mini_padded[i * ssz:(i + 1) * ssz]
                    for i in range(n_mini_secs)]
        minifat_start, n_minifat = 2, 1
        root_start, root_size = 3, len(mini)
        stream_start = 0  # mini-sector index
    else:
        padded = pad(stream, ssz)
        nsec = len(padded) // ssz
        for i in range(nsec):
            fat[2 + i] = 2 + i + 1 if i + 1 < nsec else ENDOFCHAIN
        sectors += [padded[i * ssz:(i + 1) * ssz] for i in range(nsec)]
        minifat_start, n_minifat = ENDOFCHAIN, 0
        root_start, root_size = ENDOFCHAIN, 0
        stream_start = 2

    def direntry(ename: str, etype: int, child: int, start: int,
                 size: int) -> bytes:
        wname = ename.encode("utf-16-le") + b"\x00\x00"
        e = bytearray(128)
        e[: len(wname)] = wname
        struct.pack_into("<H", e, 64, len(wname))
        e[66] = etype
        e[67] = 1  # black
        struct.pack_into("<III", e, 68, NOSTREAM, NOSTREAM, child)
        struct.pack_into("<I", e, 116, start)
        struct.pack_into("<Q", e, 120, size)
        return bytes(e)

    directory = (
        direntry("Root Entry", 5, 1, root_start, root_size)
        + direntry(name, 2, NOSTREAM, stream_start, len(stream))
        + direntry("", 0, NOSTREAM, 0, 0) * 2
    )

    header = bytearray(512)
    header[:8] = _CFB_MAGIC
    struct.pack_into("<HH", header, 24, 0x003E, 0x0003)
    struct.pack_into("<H", header, 28, 0xFFFE)
    struct.pack_into("<HH", header, 30, 9, 6)
    struct.pack_into("<I", header, 44, 1)          # FAT sector count
    struct.pack_into("<I", header, 48, 1)          # directory start
    struct.pack_into("<I", header, 56, _MINI_CUTOFF)
    struct.pack_into("<I", header, 60, minifat_start)
    struct.pack_into("<I", header, 64, n_minifat)
    struct.pack_into("<I", header, 68, ENDOFCHAIN)  # no extra DIFAT
    struct.pack_into("<I", header, 72, 0)
    for i in range(109):
        struct.pack_into("<I", header, 76 + 4 * i,
                         0 if i == 0 else FREESECT)
    body = struct.pack(f"<{ssz // 4}I", *fat) + directory + b"".join(sectors)
    return bytes(header) + body


def write_xls_minimal(rows: list[list[object]], path: str) -> str:
    """Write rows (header row first; str/int/float/bool/None cells) as a
    single-sheet legacy .xls file."""
    with open(path, "wb") as f:
        f.write(_cfb_wrap(_biff_workbook(rows)))
    return path
