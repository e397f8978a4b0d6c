"""Minimal legacy ``.xls`` (BIFF8) read/write on the Python stdlib
(``struct`` only).

Beyond-reference: the reference's spreadsheet backend
(`src/databases/sheet/base.rs`) is xlsx-only (its umya-spreadsheet
dependency has no BIFF support — DIVERGENCES #18), so this closes the
one format gap it left open.  Same contract as
:mod:`multisql_spark.sources.xlsx`: one table per sheet, header-row
discernment, whole-book load and rewrite-on-write.

Scope (the subset the sheet-database semantics need):

- **Container**: OLE2/CFB compound file — FAT chains, directory,
  miniFAT/ministream on read; single-stream FAT layout on write (the
  workbook stream is padded to the 4,096-byte mini-stream cutoff so the
  writer never needs a ministream; BIFF parsing stops at EOF records,
  so the padding is invisible).
- **Records read**: BOF/EOF, BOUNDSHEET, SST (+CONTINUE, including
  strings split across records with a re-sent flags byte), LABELSST,
  LABEL, NUMBER, RK, MULRK, BOOLERR; BLANK/MULBLANK yield None.
  Formula records are skipped (cached values are a non-goal here, as in
  the xlsx backend).
- **Records written**: workbook-globals BOF + BOUNDSHEET fixups + EOF;
  per sheet BOF + NUMBER/LABEL/BOOLERR cells + EOF.  Strings are
  written uncompressed UTF-16LE (fHighByte=1) — unambiguous and
  round-trip safe for any Python str.

Like the xlsx backend this is an embedded small-data format: whole-book
driver-side materialization by design; the BIFF8 grid limit is 65,536
rows × 256 columns and the writer enforces it.
"""

from __future__ import annotations

import struct

Cell = None | bool | int | float | str

_CFB_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_FREESECT = -1
_ENDOFCHAIN = -2
_FATSECT = -3

XLS_MAX_ROWS = 65_536
XLS_MAX_COLS = 256


# ---------------------------------------------------------------- CFB read

def _cfb_read_stream(data: bytes, names=("Workbook", "Book")) -> bytes:
    if data[:8] != _CFB_MAGIC:
        raise ValueError("not an OLE2 compound file (bad magic)")
    sect_shift = struct.unpack_from("<H", data, 30)[0]
    mini_shift = struct.unpack_from("<H", data, 32)[0]
    n_fat = struct.unpack_from("<I", data, 44)[0]
    dir_start = struct.unpack_from("<i", data, 48)[0]
    mini_cutoff = struct.unpack_from("<I", data, 56)[0]
    minifat_start = struct.unpack_from("<i", data, 60)[0]
    difat_start = struct.unpack_from("<i", data, 68)[0]
    n_difat = struct.unpack_from("<I", data, 72)[0]
    ssz = 1 << sect_shift
    per = ssz // 4

    def sector(i: int) -> bytes:
        # sector 0 starts after one full sector, not after the 512-byte
        # header struct: for v3 those coincide (ssz=512), for v4 CFB
        # (4096-byte sectors) sector 0 sits at offset 4096 (ADVICE r7 #5)
        off = (i + 1) * ssz
        return data[off : off + ssz]

    difat = list(struct.unpack_from("<109i", data, 76))
    s = difat_start
    for _ in range(n_difat):
        ids = struct.unpack(f"<{per}i", sector(s))
        difat += ids[:-1]
        s = ids[-1]

    fat: list[int] = []
    for fs in difat:
        if fs < 0:
            continue
        if len(fat) >= n_fat * per:
            break
        fat += struct.unpack(f"<{per}i", sector(fs))

    def chain(start: int) -> bytes:
        out = bytearray()
        s = start
        seen = 0
        while s >= 0:
            out += sector(s)
            s = fat[s]
            seen += 1
            if seen > len(fat):
                raise ValueError("FAT chain cycle")
        return bytes(out)

    dirdata = chain(dir_start)
    entries = []
    for off in range(0, len(dirdata) - 127, 128):
        e = dirdata[off : off + 128]
        nlen = struct.unpack_from("<H", e, 64)[0]
        if nlen < 2:
            continue
        name = e[: nlen - 2].decode("utf-16-le", "ignore")
        etype = e[66]
        start = struct.unpack_from("<i", e, 116)[0]
        size = struct.unpack_from("<I", e, 120)[0]
        entries.append((name, etype, start, size))
    root = next(e for e in entries if e[1] == 5)
    try:
        target = next(e for e in entries if e[1] == 2 and e[0] in names)
    except StopIteration:
        raise ValueError(
            f"no workbook stream in .xls file (streams: "
            f"{[e[0] for e in entries if e[1] == 2]})"
        ) from None
    _, _, start, size = target
    if size >= mini_cutoff:
        return chain(start)[:size]
    # small stream: lives in the root entry's ministream, chained by miniFAT
    ministream = chain(root[2])[: root[3]]
    minifat: list[int] = []
    s = minifat_start
    while s >= 0:
        minifat += struct.unpack(f"<{per}i", sector(s))
        s = fat[s]
    msz = 1 << mini_shift
    out = bytearray()
    s = start
    while s >= 0:
        out += ministream[s * msz : (s + 1) * msz]
        s = minifat[s]
    return bytes(out)[:size]


# --------------------------------------------------------------- CFB write

def _cfb_wrap(stream: bytes, name: str = "Workbook") -> bytes:
    """Wrap one stream in a minimal v3 compound file (512-byte sectors,
    stream padded to the 4,096-byte cutoff so it is always FAT-chained)."""
    size = max(len(stream), 4096)
    stream = stream.ljust(size, b"\x00")
    n_stream = (size + 511) // 512
    # sectors: [FAT x n_fat][DIR x 1][stream x n_stream]; find the fixed
    # point of n_fat = ceil(total/128)
    n_fat = 1
    while True:
        total = n_fat + 1 + n_stream
        need = (total + 127) // 128
        if need <= n_fat:
            break
        n_fat = need
    total = n_fat + 1 + n_stream
    dir_sect = n_fat
    first_stream = n_fat + 1

    fat = [_FREESECT] * (n_fat * 128)
    for i in range(n_fat):
        fat[i] = _FATSECT
    fat[dir_sect] = _ENDOFCHAIN
    for i in range(n_stream):
        s = first_stream + i
        fat[s] = s + 1 if i < n_stream - 1 else _ENDOFCHAIN

    def dirent(ename: str, etype: int, start: int, esize: int,
               child: int = -1) -> bytes:
        raw = ename.encode("utf-16-le") + b"\x00\x00"
        e = bytearray(128)
        e[0 : len(raw)] = raw
        struct.pack_into("<H", e, 64, len(raw))
        e[66] = etype
        e[67] = 1  # black
        struct.pack_into("<i", e, 68, -1)  # left sibling
        struct.pack_into("<i", e, 72, -1)  # right sibling
        struct.pack_into("<i", e, 76, child)
        struct.pack_into("<i", e, 116, start)
        struct.pack_into("<I", e, 120, esize)
        return bytes(e)

    directory = (
        dirent("Root Entry", 5, _ENDOFCHAIN, 0, child=1)
        + dirent(name, 2, first_stream, size)
        + dirent("", 0, 0, 0) * 2
    )

    header = bytearray(512)
    header[0:8] = _CFB_MAGIC
    struct.pack_into("<H", header, 24, 0x003E)  # minor version
    struct.pack_into("<H", header, 26, 0x0003)  # major version 3
    struct.pack_into("<H", header, 28, 0xFFFE)  # little-endian
    struct.pack_into("<H", header, 30, 9)  # 512-byte sectors
    struct.pack_into("<H", header, 32, 6)  # 64-byte minisectors
    struct.pack_into("<I", header, 44, n_fat)
    struct.pack_into("<i", header, 48, dir_sect)
    struct.pack_into("<I", header, 56, 4096)  # mini cutoff
    struct.pack_into("<i", header, 60, _ENDOFCHAIN)  # no miniFAT
    struct.pack_into("<I", header, 64, 0)
    struct.pack_into("<i", header, 68, _ENDOFCHAIN)  # no DIFAT sectors
    struct.pack_into("<I", header, 72, 0)
    for i in range(109):
        struct.pack_into(
            "<i", header, 76 + 4 * i, i if i < n_fat else _FREESECT
        )

    body = bytearray()
    for i in range(n_fat):
        body += struct.pack("<128i", *fat[i * 128 : (i + 1) * 128])
    body += directory.ljust(512, b"\x00")
    body += stream
    pad = (-len(body)) % 512
    body += b"\x00" * pad
    return bytes(header) + bytes(body)


# -------------------------------------------------------------- BIFF write

def _rec(rid: int, payload: bytes) -> bytes:
    return struct.pack("<HH", rid, len(payload)) + payload


# LABEL record cap: BIFF8 records carry at most 8,224 payload bytes; a
# cell string head is 6 (rw/col/ixfe) + 3 (cch/flags), leaving
# (8224 - 9) // 2 UTF-16 code units.  Longer strings would need
# CONTINUE-spanning cells — out of scope, so the writer raises up front
# instead of emitting a file real Excel rejects (ADVICE r7 #4).
_MAX_CELL_CU = (8224 - 9) // 2


def _unistr(s: str, short: bool = False) -> bytes:
    """XLUnicodeString: cch (u8 if short else u16), flags, UTF-16LE.

    cch counts UTF-16 CODE UNITS — ``len(raw) // 2``, not Python code
    points: a non-BMP character (emoji) occupies two units, and an
    undercounted cch makes the reader decode half a surrogate pair and
    misparse every following record (ADVICE r7 #2)."""
    raw = s.encode("utf-16-le")
    n = len(raw) // 2
    if short:
        if n > 255:
            raise ValueError(
                f"xls short string exceeds 255 UTF-16 units ({n})"
            )
        head = struct.pack("<BB", n, 1)
    else:
        if n > _MAX_CELL_CU:
            raise ValueError(
                f"xls cell string of {n} UTF-16 units exceeds the BIFF8 "
                f"single-record limit of {_MAX_CELL_CU}"
            )
        head = struct.pack("<HB", n, 1)
    return head + raw


def write_workbook(path: str, sheets: dict[str, list[list[Cell]]]) -> None:
    """Whole-book BIFF8 write (same contract as xlsx.write_workbook)."""
    sheet_payloads: list[bytes] = []
    for rows in sheets.values():
        if len(rows) > XLS_MAX_ROWS:
            raise ValueError(
                f"xls sheet exceeds BIFF8's {XLS_MAX_ROWS}-row limit "
                f"({len(rows)} rows)"
            )
        body = bytearray(
            _rec(0x0809, struct.pack("<HHHHII", 0x0600, 0x0010, 0, 0, 0, 0))
        )
        for r, row in enumerate(rows):
            if len(row) > XLS_MAX_COLS:
                raise ValueError(
                    f"xls sheet exceeds BIFF8's {XLS_MAX_COLS}-column "
                    f"limit ({len(row)} columns)"
                )
            for c, v in enumerate(row):
                if v is None:
                    continue
                if isinstance(v, bool):
                    body += _rec(
                        0x0205, struct.pack("<HHHBB", r, c, 15, int(v), 0)
                    )
                elif isinstance(v, (int, float)):
                    body += _rec(
                        0x0203, struct.pack("<HHHd", r, c, 15, float(v))
                    )
                else:
                    body += _rec(
                        0x0204,
                        struct.pack("<HHH", r, c, 15) + _unistr(str(v)),
                    )
        body += _rec(0x000A, b"")
        sheet_payloads.append(bytes(body))

    # workbook globals; BOUNDSHEET lbPlyPos needs the final offsets, so
    # build with placeholders, measure, then patch
    def globals_block(offsets: list[int]) -> bytes:
        out = bytearray(
            _rec(0x0809, struct.pack("<HHHHII", 0x0600, 0x0005, 0, 0, 0, 0))
        )
        for off, sname in zip(offsets, sheets.keys()):
            out += _rec(
                0x0085,
                struct.pack("<IBB", off, 0, 0) + _unistr(sname, short=True),
            )
        out += _rec(0x000A, b"")
        return bytes(out)

    glb = globals_block([0] * len(sheets))
    offsets = []
    pos = len(glb)
    for payload in sheet_payloads:
        offsets.append(pos)
        pos += len(payload)
    glb = globals_block(offsets)
    stream = glb + b"".join(sheet_payloads)
    with open(path, "wb") as fh:
        fh.write(_cfb_wrap(stream))


# --------------------------------------------------------------- BIFF read

def _iter_records(stream: bytes, start: int = 0):
    pos = start
    n = len(stream)
    while pos + 4 <= n:
        rid, ln = struct.unpack_from("<HH", stream, pos)
        payload = stream[pos + 4 : pos + 4 + ln]
        yield rid, payload, pos
        pos += 4 + ln
        if rid == 0x000A and start > 0:
            return


class _Chunks:
    """SST payload + its CONTINUE payloads as one cursor; a string that
    spans a boundary re-sends the flags byte at the start of the next
    chunk (MS-XLS 2.5.293)."""

    def __init__(self, chunks: list[bytes]):
        self.chunks = chunks
        self.ci = 0
        self.pos = 0

    def _advance(self) -> None:
        while self.ci < len(self.chunks) and self.pos >= len(
            self.chunks[self.ci]
        ):
            self.ci += 1
            self.pos = 0

    def take(self, n: int) -> bytes:
        """n raw bytes, never splitting across a boundary mid-call unless
        necessary (caller handles flag re-reads via take_chars)."""
        out = bytearray()
        while n > 0:
            self._advance()
            chunk = self.chunks[self.ci]
            got = chunk[self.pos : self.pos + n]
            out += got
            self.pos += len(got)
            n -= len(got)
        return bytes(out)

    def at_boundary(self) -> bool:
        self._advance()
        return self.pos == 0 and self.ci > 0

    def take_chars(self, cch: int, high: bool) -> str:
        """cch characters, re-reading the flags byte at each chunk
        boundary crossed mid-string."""
        out = []
        remaining = cch
        while remaining > 0:
            self._advance()
            chunk = self.chunks[self.ci]
            avail = len(chunk) - self.pos
            if avail == 0:
                continue
            if self.pos == 0 and self.ci > 0 and out:
                # continuation of a split string: fresh grbit byte
                high = bool(chunk[0] & 0x01)
                self.pos = 1
                avail -= 1
            width = 2 if high else 1
            n_here = min(remaining, avail // width)
            if n_here == 0:
                # char straddles the boundary (can't happen for width=1;
                # for width=2 the spec forbids splitting a code unit)
                raise ValueError("SST string splits a UTF-16 code unit")
            raw = chunk[self.pos : self.pos + n_here * width]
            out.append(
                raw.decode("utf-16-le") if high else raw.decode("latin-1")
            )
            self.pos += n_here * width
            remaining -= n_here
        return "".join(out)


def _parse_sst(chunks: list[bytes]) -> list[str]:
    cur = _Chunks(chunks)
    cur.take(4)  # cstTotal
    (n_unique,) = struct.unpack("<i", cur.take(4))
    out: list[str] = []
    for _ in range(n_unique):
        (cch,) = struct.unpack("<H", cur.take(2))
        flags = cur.take(1)[0]
        high = bool(flags & 0x01)
        ext = bool(flags & 0x04)
        rich = bool(flags & 0x08)
        c_run = struct.unpack("<H", cur.take(2))[0] if rich else 0
        cb_ext = struct.unpack("<i", cur.take(4))[0] if ext else 0
        out.append(cur.take_chars(cch, high))
        if c_run:
            cur.take(4 * c_run)
        if cb_ext:
            cur.take(cb_ext)
    return out


def _rk_value(v: int) -> float:
    div100 = v & 1
    if v & 2:  # 30-bit signed integer (arithmetic shift of the i32)
        num = float((v - (1 << 32) if v & 0x80000000 else v) >> 2)
    else:  # high 30 bits of an IEEE double
        (num,) = struct.unpack("<d", struct.pack("<Q", (v & 0xFFFFFFFC) << 32))
    return num / 100.0 if div100 else num


def _num(x: float) -> Cell:
    return int(x) if float(x).is_integer() else x


def read_workbook(path: str) -> dict[str, list[list[Cell]]]:
    """All sheets as row-major cell grids (same contract as
    xlsx.read_workbook)."""
    with open(path, "rb") as fh:
        stream = _cfb_read_stream(fh.read())

    bound: list[tuple[str, int]] = []
    sst: list[str] = []
    sst_chunks: list[bytes] | None = None
    for rid, payload, _pos in _iter_records(stream):
        if rid == 0x003C and sst_chunks is not None:  # CONTINUE of SST
            sst_chunks.append(payload)
            continue
        if sst_chunks is not None:  # any other record ends the SST run
            sst = _parse_sst(sst_chunks)
            sst_chunks = None
        if rid == 0x000A:  # EOF of the globals substream
            break
        if rid == 0x0085:  # BOUNDSHEET
            (lb,) = struct.unpack_from("<I", payload, 0)
            cch = payload[6]
            flags = payload[7]
            raw = payload[8 : 8 + cch * (2 if flags & 1 else 1)]
            name = (
                raw.decode("utf-16-le")
                if flags & 1
                else raw.decode("latin-1")
            )
            bound.append((name, lb))
        elif rid == 0x00FC:  # SST
            sst_chunks = [payload]
    if sst_chunks is not None:
        sst = _parse_sst(sst_chunks)

    book: dict[str, list[list[Cell]]] = {}
    for name, lb in bound:
        cells: dict[tuple[int, int], Cell] = {}
        for rid, payload, _pos in _iter_records(stream, lb):
            if rid == 0x0203:  # NUMBER
                r, c, _x, num = struct.unpack("<HHHd", payload)
                cells[(r, c)] = _num(num)
            elif rid == 0x027E:  # RK
                r, c, _x, v = struct.unpack("<HHHI", payload)
                cells[(r, c)] = _num(_rk_value(v))
            elif rid == 0x00BD:  # MULRK
                r, c0 = struct.unpack_from("<HH", payload, 0)
                n_rk = (len(payload) - 6) // 6
                for i in range(n_rk):
                    (v,) = struct.unpack_from("<I", payload, 4 + 6 * i + 2)
                    cells[(r, c0 + i)] = _num(_rk_value(v))
            elif rid == 0x00FD:  # LABELSST
                r, c, _x, isst = struct.unpack("<HHHI", payload)
                cells[(r, c)] = sst[isst] if isst < len(sst) else None
            elif rid == 0x0204:  # LABEL
                r, c, _x, cch, flags = struct.unpack_from("<HHHHB", payload)
                raw = payload[9 : 9 + cch * (2 if flags & 1 else 1)]
                cells[(r, c)] = (
                    raw.decode("utf-16-le")
                    if flags & 1
                    else raw.decode("latin-1")
                )
            elif rid == 0x0205:  # BOOLERR
                r, c, _x, v, f_err = struct.unpack("<HHHBB", payload)
                if not f_err:
                    cells[(r, c)] = bool(v)
        if cells:
            n_rows = max(r for r, _ in cells) + 1
            n_cols = max(c for _, c in cells) + 1
            book[name] = [
                [cells.get((r, c)) for c in range(n_cols)]
                for r in range(n_rows)
            ]
        else:
            book[name] = []
    return book
