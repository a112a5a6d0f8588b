"""Excel (xlsx + xls) codecs — stdlib-only, executor-side.

Reference semantics:
  read:  connector-file-base/.../source/reader/ExcelReadStrategy.java
         (POI path: getCellValue — STRING/BOOLEAN raw, NUMERIC =
         LocalDateTime when date-formatted else formatted string,
         BLANK = "") + excel/ExcelCellUtils.java convert (MAP/ARRAY =
         JSON parse, ROW = field_delimiter split, numerics via
         Double.parseDouble, STRING strips a trailing ".0" from
         doubles, BYTES = UTF-8, DATE/TIME/TIMESTAMP accept a
         LocalDateTime cell or parse with the configured patterns).
  write: sink/util/ExcelGenerator.java (header row of field names;
         strings/map/array/row as text cells — map/array JSON, row
         joined by field_delimiter; numerics as numbers; bytes as the
         signed-byte list string; date/time/timestamp as date-styled
         serials).

This container has no POI/openpyxl, so the codecs are hand-rolled on
zipfile+ElementTree (xlsx) and a minimal OLE2+BIFF8 reader (xls).
They run inside mapInPandas/foreachPartition — one Excel file is the
parallelism unit (the format is non-splittable), matching the
reference's file-per-reader model.
"""

from __future__ import annotations

import datetime as _dt
import io
import json
import re
import struct
import zipfile
from decimal import Decimal
from xml.etree import ElementTree as ET

_EPOCH = _dt.datetime(1899, 12, 30)  # Excel 1900 date system base

# ---------------------------------------------------------------------------
# shared: number-format date detection (POI DateUtil.isADateFormat analog)

_BUILTIN_DATE_FMTS = set(range(14, 23)) | set(range(45, 48)) | {27, 28, 29, 30,
                                                                31, 32, 33, 34,
                                                                35, 36, 50, 57,
                                                                58}


def _is_date_format(fmt_id: int, fmt_code: str | None) -> bool:
    if fmt_id in _BUILTIN_DATE_FMTS:
        return True
    if not fmt_code:
        return False
    # strip quoted sections, color/locale prefixes, escapes
    code = re.sub(r'"[^"]*"|\[[^\]]*\]|\\.', "", fmt_code)
    if re.search(r"[0#]", code) and not re.search(r"[ymdhs]", code, re.I):
        return False
    return bool(re.search(r"[ymdhs]", code, re.I))


def _serial_to_datetime(serial: float) -> _dt.datetime:
    # POI DateUtil.getJavaDate rounds to the nearest millisecond
    ms = round(serial * 86400_000)
    return _EPOCH + _dt.timedelta(milliseconds=ms)


def _datetime_to_serial(value: _dt.datetime) -> float:
    delta = value - _EPOCH
    return delta.days + delta.seconds / 86400 + delta.microseconds / 86400e6


# ---------------------------------------------------------------------------
# xlsx reader

def _xlsx_shared_strings(z: zipfile.ZipFile) -> list[str]:
    try:
        data = z.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    ns = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
    out = []
    for si in ET.fromstring(data):
        # plain <t> or rich runs <r><t>
        out.append("".join(t.text or "" for t in si.iter(f"{ns}t")))
    return out


def _xlsx_date_styles(z: zipfile.ZipFile) -> set[int]:
    """Indexes into cellXfs whose number format is a date format."""
    try:
        data = z.read("xl/styles.xml")
    except KeyError:
        return set()
    ns = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
    root = ET.fromstring(data)
    custom = {}
    for nf in root.iter(f"{ns}numFmt"):
        custom[int(nf.get("numFmtId"))] = nf.get("formatCode", "")
    date_styles = set()
    xfs = root.find(f"{ns}cellXfs")
    if xfs is None:
        return set()
    for i, xf in enumerate(xfs):
        fmt_id = int(xf.get("numFmtId", "0"))
        if _is_date_format(fmt_id, custom.get(fmt_id)):
            date_styles.add(i)
    return date_styles


_CELL_REF = re.compile(r"([A-Z]+)(\d+)")


def _col_index(ref: str) -> int:
    m = _CELL_REF.match(ref)
    n = 0
    for ch in (m.group(1) if m else "A"):
        n = n * 26 + (ord(ch) - 64)
    return n - 1


def read_xlsx(blob: bytes, sheet_name: str | None = None) -> list[list]:
    """Rows of raw cell values: str | bool | float | datetime | None.

    Mirrors ExcelReadStrategy.getCellValue: shared/inline strings as-is,
    booleans, numerics as datetime when date-styled else float (the
    DataFormatter string render happens later in convert_cell), blank
    cells as "".
    """
    z = zipfile.ZipFile(io.BytesIO(blob))
    sst = _xlsx_shared_strings(z)
    date_styles = _xlsx_date_styles(z)
    ns = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
    rel_ns = ("{http://schemas.openxmlformats.org/officeDocument/2006/"
              "relationships}")
    # resolve sheet path (first sheet, or by name)
    wb = ET.fromstring(z.read("xl/workbook.xml"))
    rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
    rel_map = {r.get("Id"): r.get("Target") for r in rels}
    target = None
    for sh in wb.iter(f"{ns}sheet"):
        if sheet_name is None or sh.get("name") == sheet_name:
            target = rel_map.get(sh.get(f"{rel_ns}id"))
            break
    if target is None:
        return []
    if not target.startswith("/"):
        target = "xl/" + target.removeprefix("xl/")
    sheet = ET.fromstring(z.read(target.lstrip("/")))
    rows: list[list] = []
    for row_el in sheet.iter(f"{ns}row"):
        row: list = []
        for c in row_el:
            if not c.tag.endswith("}c"):
                continue
            idx = _col_index(c.get("r", ""))
            while len(row) < idx:
                row.append(None)
            ctype = c.get("t", "n")
            style = int(c.get("s", "-1"))
            v = c.find(f"{ns}v")
            raw = v.text if v is not None else None
            if ctype == "s":
                val = sst[int(raw)] if raw is not None else ""
            elif ctype == "inlineStr":
                is_el = c.find(f"{ns}is")
                val = _unesc_ooxml(
                    "".join(t.text or "" for t in is_el.iter(f"{ns}t"))
                    if is_el is not None else "")
            elif ctype == "str":
                val = raw if raw is not None else ""
            elif ctype == "b":
                val = raw in ("1", "true")
            elif raw is None:
                val = ""  # BLANK -> "" (ExcelReadStrategy.getCellValue)
            else:
                num = float(raw)
                if style in date_styles:
                    val = _serial_to_datetime(num)
                else:
                    val = num
            row.append(val)
        rows.append(row)
    return rows


# ---------------------------------------------------------------------------
# xls (OLE2 + BIFF8) reader

def _ole2_stream(blob: bytes, names=("Workbook", "Book")) -> bytes:
    """Extract a named stream from an OLE2 compound document."""
    if blob[:8] != b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1":
        raise ValueError("not an OLE2 compound document")
    sector_size = 1 << struct.unpack_from("<H", blob, 30)[0]
    mini_size = 1 << struct.unpack_from("<H", blob, 32)[0]
    first_dir = struct.unpack_from("<i", blob, 48)[0]
    mini_cutoff = struct.unpack_from("<I", blob, 56)[0]
    first_minifat = struct.unpack_from("<i", blob, 60)[0]
    n_minifat = struct.unpack_from("<I", blob, 64)[0]
    first_difat = struct.unpack_from("<i", blob, 68)[0]
    n_difat = struct.unpack_from("<I", blob, 72)[0]

    def sector(sid: int) -> bytes:
        off = 512 + sid * sector_size
        return blob[off:off + sector_size]

    # DIFAT: 109 header entries + chained DIFAT sectors
    difat = list(struct.unpack_from("<109i", blob, 76))
    sid = first_difat
    for _ in range(n_difat):
        if sid < 0:
            break
        data = sector(sid)
        ints = struct.unpack(f"<{sector_size // 4}i", data)
        difat.extend(ints[:-1])
        sid = ints[-1]
    fat: list[int] = []
    for fsid in difat:
        if fsid < 0:
            continue
        fat.extend(struct.unpack(f"<{sector_size // 4}i", sector(fsid)))

    def chain(start: int) -> bytes:
        out, sid, seen = [], start, set()
        while sid >= 0 and sid not in seen:
            seen.add(sid)
            out.append(sector(sid))
            sid = fat[sid]
        return b"".join(out)

    # directory entries
    dir_data = chain(first_dir)
    entries = []
    for off in range(0, len(dir_data) - 127, 128):
        raw_name_len = struct.unpack_from("<H", dir_data, off + 64)[0]
        name = dir_data[off:off + max(0, raw_name_len - 2)].decode(
            "utf-16-le", errors="ignore")
        etype = dir_data[off + 66]
        start = struct.unpack_from("<i", dir_data, off + 116)[0]
        size = struct.unpack_from("<I", dir_data, off + 120)[0]
        entries.append((name, etype, start, size))
    root = next(e for e in entries if e[1] == 5)
    target = next((e for e in entries if e[0] in names and e[1] == 2), None)
    if target is None:
        raise ValueError(f"no {names} stream in xls file")
    _, _, start, size = target
    if size >= mini_cutoff:
        return chain(start)[:size]
    # mini stream: root's chain holds 64-byte mini sectors
    mini_stream = chain(root[2])
    minifat: list[int] = []
    sid = first_minifat
    while sid >= 0 and len(minifat) // (sector_size // 4) < n_minifat:
        minifat.extend(struct.unpack(f"<{sector_size // 4}i", sector(sid)))
        sid = fat[sid]
    out, sid = [], start
    while sid >= 0:
        out.append(mini_stream[sid * mini_size:(sid + 1) * mini_size])
        sid = minifat[sid]
    return b"".join(out)[:size]


def _rk_value(rk: int) -> float:
    cents = rk & 1
    if rk & 2:  # integer
        val = float(rk >> 2 if rk >= 0 else -((-rk) >> 2))
        # arithmetic shift for signed
        val = float(struct.unpack("<i", struct.pack("<I", rk & 0xFFFFFFFF))[0]
                    >> 2)
    else:
        val = struct.unpack("<d", b"\0\0\0\0" +
                            struct.pack("<I", rk & 0xFFFFFFFC))[0]
    return val / 100 if cents else val


class _BiffStrings:
    """SST parser that handles strings split across CONTINUE records."""

    def __init__(self, parts: list[bytes]):
        self.parts = parts
        self.ipart = 0
        self.pos = 8  # skip cstTotal/cstUnique of the SST record

    def _remaining(self) -> int:
        return len(self.parts[self.ipart]) - self.pos

    def _advance(self):
        while (self.ipart < len(self.parts)
               and self.pos >= len(self.parts[self.ipart])):
            self.ipart += 1
            self.pos = 0

    def read_raw(self, n: int) -> bytes:
        out = b""
        while n > 0:
            self._advance()
            part = self.parts[self.ipart]
            take = min(n, len(part) - self.pos)
            out += part[self.pos:self.pos + take]
            self.pos += take
            n -= take
        return out

    def read_string(self) -> str:
        cch = struct.unpack("<H", self.read_raw(2))[0]
        grbit = self.read_raw(1)[0]
        crun = struct.unpack("<H", self.read_raw(2))[0] if grbit & 0x08 else 0
        cbext = struct.unpack("<i", self.read_raw(4))[0] if grbit & 0x04 else 0
        chars: list[str] = []
        remaining = cch
        wide = bool(grbit & 0x01)
        while remaining > 0:
            self._advance()
            avail = self._remaining()
            if avail == 0:
                break
            if self.pos == 0 and self.ipart > 0:
                # continuation boundary: fresh option byte
                wide = bool(self.read_raw(1)[0] & 0x01)
                avail -= 1
            width = 2 if wide else 1
            take = min(remaining, avail // width)
            if take == 0:
                break
            data = self.read_raw(take * width)
            chars.append(data.decode("utf-16-le" if wide else "latin-1"))
            remaining -= take
        self.read_raw(crun * 4 + cbext)
        return "".join(chars)


def read_xls(blob: bytes, sheet_name: str | None = None) -> list[list]:
    """BIFF8 reader producing the same raw cell values as read_xlsx."""
    stream = _ole2_stream(blob)
    records: list[tuple[int, bytes]] = []
    pos = 0
    while pos + 4 <= len(stream):
        rid, rlen = struct.unpack_from("<HH", stream, pos)
        records.append((rid, stream[pos + 4:pos + 4 + rlen]))
        pos += 4 + rlen
        if rid == 0x000A and pos >= len(stream):
            break

    # pass 1: globals — SST, XF->ifmt, custom FORMATs, sheet order
    sst: list[str] = []
    xf_fmts: list[int] = []
    fmt_codes: dict[int, str] = {}
    sheet_names: list[str] = []
    i = 0
    while i < len(records):
        rid, data = records[i]
        if rid == 0x00FC:  # SST (+ CONTINUEs)
            parts = [data]
            j = i + 1
            while j < len(records) and records[j][0] == 0x003C:
                parts.append(records[j][1])
                j += 1
            rdr = _BiffStrings(parts)
            total = struct.unpack_from("<i", data, 4)[0]
            for _ in range(total):
                sst.append(rdr.read_string())
        elif rid == 0x00E0:  # XF
            xf_fmts.append(struct.unpack_from("<H", data, 2)[0])
        elif rid == 0x041E:  # FORMAT
            ifmt = struct.unpack_from("<H", data, 0)[0]
            cch = struct.unpack_from("<H", data, 2)[0]
            grbit = data[4]
            raw = data[5:5 + cch * (2 if grbit & 1 else 1)]
            fmt_codes[ifmt] = raw.decode(
                "utf-16-le" if grbit & 1 else "latin-1")
        elif rid == 0x0085:  # BOUNDSHEET
            cch = data[6]
            grbit = data[7]
            raw = data[8:8 + cch * (2 if grbit & 1 else 1)]
            sheet_names.append(raw.decode(
                "utf-16-le" if grbit & 1 else "latin-1"))
        elif rid == 0x000A:
            i += 1
            break
        i += 1

    want = 0
    if sheet_name is not None and sheet_name in sheet_names:
        want = sheet_names.index(sheet_name)

    def is_date_xf(ixfe: int) -> bool:
        if ixfe >= len(xf_fmts):
            return False
        ifmt = xf_fmts[ixfe]
        return _is_date_format(ifmt, fmt_codes.get(ifmt))

    # pass 2: worksheet substreams
    cells: dict[tuple[int, int], object] = {}
    sheet_idx = -1
    in_sheet = False
    for rid, data in records[i:]:
        if rid == 0x0809:  # BOF
            dt = struct.unpack_from("<H", data, 2)[0]
            if dt == 0x0010:
                sheet_idx += 1
                in_sheet = sheet_idx == want
            else:
                in_sheet = False
            continue
        if not in_sheet:
            continue
        if rid == 0x00FD:  # LABELSST
            rw, col, _, isst = struct.unpack_from("<HHHi", data)
            cells[(rw, col)] = sst[isst] if isst < len(sst) else ""
        elif rid == 0x0203:  # NUMBER
            rw, col, ixfe = struct.unpack_from("<HHH", data)
            num = struct.unpack_from("<d", data, 6)[0]
            cells[(rw, col)] = (_serial_to_datetime(num)
                                if is_date_xf(ixfe) else num)
        elif rid == 0x027E:  # RK
            rw, col, ixfe, rk = struct.unpack_from("<HHHi", data)
            num = _rk_value(rk)
            cells[(rw, col)] = (_serial_to_datetime(num)
                                if is_date_xf(ixfe) else num)
        elif rid == 0x00BD:  # MULRK
            rw, col_first = struct.unpack_from("<HH", data)
            n = (len(data) - 6) // 6
            for k in range(n):
                ixfe, rk = struct.unpack_from("<Hi", data, 4 + 6 * k)
                num = _rk_value(rk)
                cells[(rw, col_first + k)] = (
                    _serial_to_datetime(num) if is_date_xf(ixfe) else num)
        elif rid == 0x0205:  # BOOLERR
            rw, col, _, val, is_err = struct.unpack_from("<HHHBB", data)
            cells[(rw, col)] = None if is_err else bool(val)
        elif rid == 0x0204:  # LABEL (non-SST string)
            rw, col, _, cch = struct.unpack_from("<HHHH", data)
            grbit = data[8]
            raw = data[9:9 + cch * (2 if grbit & 1 else 1)]
            cells[(rw, col)] = raw.decode(
                "utf-16-le" if grbit & 1 else "latin-1")
        elif rid == 0x0201:  # BLANK
            rw, col, _ = struct.unpack_from("<HHH", data)
            cells[(rw, col)] = ""
        elif rid == 0x0006:  # FORMULA (numeric results only)
            rw, col, ixfe = struct.unpack_from("<HHH", data)
            raw8 = data[6:14]
            if raw8[6:8] != b"\xff\xff":
                num = struct.unpack("<d", raw8)[0]
                cells[(rw, col)] = (_serial_to_datetime(num)
                                    if is_date_xf(ixfe) else num)
    if not cells:
        return []
    max_row = max(r for r, _ in cells)
    max_col = max(c for _, c in cells)
    return [[cells.get((r, c)) for c in range(max_col + 1)]
            for r in range(max_row + 1)]


def read_excel(blob: bytes, sheet_name: str | None = None) -> list[list]:
    """Dispatch by magic bytes (PK zip = xlsx, OLE2 = xls) — the
    reference dispatches by extension (ExcelReadStrategy.readProcess),
    magic is equivalent and survives archive member renames."""
    if blob[:2] == b"PK":
        return read_xlsx(blob, sheet_name)
    return read_xls(blob, sheet_name)


# ---------------------------------------------------------------------------
# cell -> declared type (ExcelCellUtils.convert analog)

def _java_double_str(val: float) -> str:
    """Java Double.toString rendering for the DataFormatter/parse path:
    integral doubles get a trailing .0 (stripped for STRING targets),
    large magnitudes go scientific."""
    if val != val or val in (float("inf"), float("-inf")):
        return str(val)
    if val == int(val) and abs(val) < 1e16:
        return f"{int(val)}.0"
    return repr(val)


def convert_cell(value, dtype, *, delimiter: str = ",",
                 date_fmt: str | None = None, datetime_fmt: str | None = None,
                 time_fmt: str | None = None):
    """ExcelCellUtils.convert: raw cell value -> declared SeaTunnel type.

    value: str | bool | float | datetime | None (from read_xlsx/read_xls)
    dtype: pyspark.sql.types.DataType
    """
    from pyspark.sql import types as T

    if value is None:
        return None
    is_string_target = isinstance(dtype, T.StringType)
    if isinstance(value, str):
        field_value = value
    elif isinstance(value, bool):
        field_value = "true" if value else "false"
    elif isinstance(value, float):
        field_value = _java_double_str(value)
    else:
        field_value = str(value)
    if field_value == "" and not is_string_target:
        return None

    if isinstance(dtype, (T.MapType, T.ArrayType)):
        parsed = json.loads(field_value)
        if isinstance(dtype, T.ArrayType):
            return [convert_cell(
                e if isinstance(e, str) else json.dumps(e), dtype.elementType,
                delimiter=delimiter, date_fmt=date_fmt,
                datetime_fmt=datetime_fmt, time_fmt=time_fmt)
                for e in parsed]
        return {str(k): (str(v) if not isinstance(v, str) else v)
                for k, v in parsed.items()}
    if is_string_target:
        if isinstance(value, float):
            s = _java_double_str(value)
            return s[:-2] if s.endswith(".0") else s
        return field_value
    if isinstance(dtype, T.BooleanType):
        return field_value.strip().lower() == "true"
    if isinstance(dtype, T.DoubleType):
        return float(field_value)
    if isinstance(dtype, T.FloatType):
        return float(field_value)
    if isinstance(dtype, T.LongType):
        return int(float(field_value))
    if isinstance(dtype, T.IntegerType):
        return int(float(field_value))
    if isinstance(dtype, T.ShortType):
        return int(float(field_value))
    if isinstance(dtype, T.ByteType):
        return int(float(field_value))
    if isinstance(dtype, T.DecimalType):
        return Decimal(repr(float(field_value)))
    if isinstance(dtype, T.DateType):
        if isinstance(value, _dt.datetime):
            return value.date()
        return _dt.datetime.strptime(
            field_value, _java_to_strptime(date_fmt or "yyyy-MM-dd")).date()
    if hasattr(T, "TimeType") and isinstance(dtype, T.TimeType):
        if isinstance(value, _dt.datetime):
            return value.time()
        return _dt.datetime.strptime(
            field_value, _java_to_strptime(time_fmt or "HH:mm:ss")).time()
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        if isinstance(value, _dt.datetime):
            return value
        return _dt.datetime.strptime(
            field_value,
            _java_to_strptime(datetime_fmt or "yyyy-MM-dd HH:mm:ss"))
    if isinstance(dtype, T.NullType):
        return None
    if isinstance(dtype, T.BinaryType):
        return field_value.encode("utf-8")
    if isinstance(dtype, T.StructType):
        parts = re.split(delimiter, field_value)
        return {
            f.name: (convert_cell(parts[i], f.dataType, delimiter=delimiter,
                                  date_fmt=date_fmt, datetime_fmt=datetime_fmt,
                                  time_fmt=time_fmt)
                     if i < len(parts) else None)
            for i, f in enumerate(dtype.fields)
        }
    return field_value


def _java_to_strptime(pattern: str) -> str:
    """Java DateTimeFormatter pattern -> strptime (the subset the
    reference's default patterns use)."""
    return (pattern.replace("yyyy", "%Y").replace("MM", "%m")
            .replace("dd", "%d").replace("HH", "%H").replace("mm", "%M")
            .replace("ss", "%S").replace(".SSSSSS", ".%f")
            .replace("SSS", "%f").replace("'T'", "T"))


# ---------------------------------------------------------------------------
# xlsx writer (ExcelGenerator analog)

_XLSX_CT = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>
</Types>"""

_XLSX_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_XLSX_WB_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>
</Relationships>"""


def _unesc_ooxml(s: str) -> str:
    """Decode OOXML _xHHHH_ escapes (ECMA-376 string escaping) on read;
    single non-overlapping pass keeps _x005F_-escaped literals right."""
    if "_x" not in s:
        return s
    import re as _re

    return _re.sub(r"_x([0-9A-Fa-f]{4})_",
                   lambda m: chr(int(m.group(1), 16)), s)


def _esc(s: str) -> str:
    out = (s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
           .replace('"', "&quot;"))
    if any(ord(c) < 0x20 and c not in "\t\n\r" for c in out) \
            or "_x" in out:
        # control characters are ILLEGAL in XML 1.0 even escaped —
        # OOXML's convention (ECMA-376 §22.4.2.4 / SpreadsheetML
        # string escaping) encodes them as _xHHHH_; a literal _x that
        # could collide is itself escaped as _x005F_x
        import re as _re

        out = _re.sub(r"_(?=x[0-9A-Fa-f]{4}_)", "_x005F_", out)
        out = "".join(c if ord(c) >= 0x20 or c in "\t\n\r"
                      else f"_x{ord(c):04X}_" for c in out)
    return out


# cellXfs style indexes used by the writer
_STYLE_GENERAL, _STYLE_TEXT, _STYLE_DATE, _STYLE_DATETIME, _STYLE_TIME = \
    0, 1, 2, 3, 4


def _xlsx_styles(date_fmt: str, datetime_fmt: str, time_fmt: str) -> str:
    # POI keeps the Java pattern text as the format code
    # (ExcelGenerator.createStyle) — readers detect date-ness from the
    # y/m/d/h/s letters, which survive as-is.
    return f"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
<numFmts count="3">
<numFmt numFmtId="164" formatCode="{_esc(date_fmt)}"/>
<numFmt numFmtId="165" formatCode="{_esc(datetime_fmt)}"/>
<numFmt numFmtId="166" formatCode="{_esc(time_fmt)}"/>
</numFmts>
<fonts count="1"><font><sz val="11"/><name val="Calibri"/></font></fonts>
<fills count="1"><fill><patternFill patternType="none"/></fill></fills>
<borders count="1"><border/></borders>
<cellStyleXfs count="1"><xf numFmtId="0"/></cellStyleXfs>
<cellXfs count="5">
<xf numFmtId="0" applyNumberFormat="0"/>
<xf numFmtId="49" applyNumberFormat="1"/>
<xf numFmtId="164" applyNumberFormat="1"/>
<xf numFmtId="165" applyNumberFormat="1"/>
<xf numFmtId="166" applyNumberFormat="1"/>
</cellXfs>
</styleSheet>"""


def _write_cell_xml(value, dtype, delimiter: str, fmts: dict) -> str:
    """One <c> element body (ExcelGenerator.setCellValue analog).
    Returns (style, type, inner-xml) pre-rendered."""
    from pyspark.sql import types as T

    def text_cell(s: str) -> str:
        return (f'<c s="{_STYLE_TEXT}" t="inlineStr">'
                f"<is><t xml:space=\"preserve\">{_esc(s)}</t></is></c>")

    if value is None:
        return f'<c s="{_STYLE_GENERAL}"/>'  # setBlank()
    if isinstance(dtype, T.StringType):
        return text_cell(str(value))
    if isinstance(dtype, T.BooleanType):
        return (f'<c s="{_STYLE_GENERAL}" t="b">'
                f"<v>{1 if value else 0}</v></c>")
    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType,
                          T.LongType, T.FloatType, T.DoubleType,
                          T.DecimalType)):
        num = float(value)
        out = repr(num) if num != int(num) else str(int(num))
        return f'<c s="{_STYLE_GENERAL}"><v>{out}</v></c>'
    if isinstance(dtype, T.BinaryType):
        signed = [b - 256 if b > 127 else b for b in bytes(value)]
        return text_cell(str(signed))  # Java arrayData.toString
    if isinstance(dtype, (T.MapType, T.ArrayType)):
        return text_cell(_json_like(value, dtype))
    if isinstance(dtype, T.StructType):
        return text_cell(_row_string(value, dtype, delimiter, fmts))
    if isinstance(dtype, T.DateType):
        serial = (_dt.datetime.combine(value, _dt.time()) - _EPOCH).days
        return f'<c s="{_STYLE_DATE}"><v>{serial}</v></c>'
    if hasattr(T, "TimeType") and isinstance(dtype, T.TimeType):
        serial = _datetime_to_serial(
            _dt.datetime.combine(_dt.date(1970, 1, 1), value))
        return f'<c s="{_STYLE_TIME}"><v>{serial!r}</v></c>'
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        serial = _datetime_to_serial(value.replace(tzinfo=None))
        return f'<c s="{_STYLE_DATETIME}"><v>{serial!r}</v></c>'
    return text_cell(str(value))


def _json_like(value, dtype) -> str:
    """Jackson toJsonString analog for map/array cells."""
    def plain(v):
        if isinstance(v, Decimal):
            return float(v)
        if isinstance(v, (_dt.date, _dt.datetime, _dt.time)):
            return str(v)
        if isinstance(v, dict):
            return {k: plain(x) for k, x in v.items()}
        if isinstance(v, (list, tuple)):
            return [plain(x) for x in v]
        if hasattr(v, "asDict"):
            return {k: plain(x) for k, x in v.asDict().items()}
        return v

    return json.dumps(plain(value), separators=(",", ":"), ensure_ascii=False)


def _row_string(value, dtype, delimiter: str, fmts: dict) -> str:
    """ExcelGenerator.convert for ROW cells: join by field_delimiter."""
    from pyspark.sql import types as T

    parts = []
    as_dict = value.asDict() if hasattr(value, "asDict") else value
    for f in dtype.fields:
        v = as_dict.get(f.name)
        if v is None:
            parts.append("")
        elif isinstance(f.dataType, (T.MapType, T.ArrayType)):
            parts.append(_json_like(v, f.dataType))
        elif isinstance(f.dataType, T.StructType):
            parts.append(_row_string(v, f.dataType, delimiter, fmts))
        elif isinstance(f.dataType, T.BinaryType):
            parts.append(bytes(v).decode("utf-8", errors="replace"))
        elif isinstance(f.dataType, T.DateType):
            parts.append(v.strftime(_java_to_strptime(
                fmts.get("date") or "yyyy-MM-dd")))
        elif isinstance(f.dataType, (T.TimestampType, T.TimestampNTZType)):
            parts.append(v.strftime(_java_to_strptime(
                fmts.get("datetime") or "yyyy-MM-dd HH:mm:ss")))
        elif isinstance(f.dataType, T.BooleanType):
            parts.append("true" if v else "false")
        else:
            parts.append(str(v))
    return delimiter.join(parts)


def write_xlsx(rows, schema, *, sheet_name: str = "Sheet1",
               delimiter: str = ",", fmts: dict | None = None) -> bytes:
    """Serialize rows (pyspark Rows / dicts) to one xlsx blob.

    Layout mirrors ExcelGenerator: row 1 = field names, then data rows
    with per-type cell styles.
    """
    fmts = fmts or {}
    date_fmt = fmts.get("date") or "yyyy-MM-dd"
    datetime_fmt = fmts.get("datetime") or "yyyy-MM-dd HH:mm:ss"
    time_fmt = fmts.get("time") or "HH:mm:ss"
    body = [
        "<row r=\"1\">" + "".join(
            f'<c t="inlineStr"><is><t>{_esc(f.name)}</t></is></c>'
            for f in schema.fields) + "</row>"
    ]
    for r, row in enumerate(rows, start=2):
        as_dict = row.asDict() if hasattr(row, "asDict") else row
        cells = "".join(
            _write_cell_xml(as_dict.get(f.name), f.dataType, delimiter,
                            fmts)
            for f in schema.fields)
        body.append(f'<row r="{r}">{cells}</row>')
    sheet = ("<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>"
             "<worksheet xmlns=\"http://schemas.openxmlformats.org/"
             "spreadsheetml/2006/main\"><sheetData>"
             + "".join(body) + "</sheetData></worksheet>")
    wb = ("<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>"
          "<workbook xmlns=\"http://schemas.openxmlformats.org/"
          "spreadsheetml/2006/main\" xmlns:r=\"http://schemas."
          "openxmlformats.org/officeDocument/2006/relationships\">"
          f"<sheets><sheet name=\"{_esc(sheet_name)}\" sheetId=\"1\" "
          "r:id=\"rId1\"/></sheets></workbook>")
    bio = io.BytesIO()
    with zipfile.ZipFile(bio, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _XLSX_CT)
        z.writestr("_rels/.rels", _XLSX_RELS)
        z.writestr("xl/workbook.xml", wb)
        z.writestr("xl/_rels/workbook.xml.rels", _XLSX_WB_RELS)
        z.writestr("xl/styles.xml",
                   _xlsx_styles(date_fmt, datetime_fmt, time_fmt))
        z.writestr("xl/worksheets/sheet1.xml", sheet)
    return bio.getvalue()
