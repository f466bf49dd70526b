"""PDF text-layer word extraction — dependency-free.

Parity target: VGT's grid-input preparation
(reference DocumentUnderstanding/VGT/object_detection/
create_grid_input.py:86 create_grid_dict), which consumes pdfplumber's
`page.extract_words()` — word dicts {"text", "x0", "x1", "top",
"bottom"} in top-left-origin page coordinates. No PDF library ships in
this image, so this module implements the required subset of ISO 32000
natively:

- classic xref tables AND cross-reference streams (incl. PNG predictors
  on /DecodeParms), compressed objects in /ObjStm object streams;
- FlateDecode; object/array/dict/name/string/number/ref tokenization;
- page-tree traversal with inheritable /Resources and /MediaBox;
- the text-object operator machine (BT/ET, Tf/Td/TD/Tm/T*/TL/Tc/Tw/Tz,
  Tj/TJ/'/" , q/Q/cm) with per-glyph advance from simple-font /Widths
  (+ /MissingWidth) or Type0 /W + /DW CID widths;
- ToUnicode CMaps (bfchar/bfrange) for text recovery, latin-1 fallback
  for unmapped simple fonts;
- pdfplumber-style word grouping (split on spaces, x-gaps and baseline
  changes).

Scope notes (documented, not silent): rotated text is extracted with
axis-aligned boxes around its origin/advance (pdfplumber's `use_text_flow`
corner cases differ); Type3 fonts and encryption are unsupported and
raise. Word boxes use a 0.8/0.2 ascent/descent approximation of the font
bounding box — adequate for VGT's 1-pt grid rasterization.
"""

from __future__ import annotations

import re
import zlib
from typing import Any, Dict, List, Optional, Tuple

__all__ = ["PdfDocument", "extract_pdf_words", "extract_pdf_page_sizes"]


# ---------------- object model ----------------


class Ref:
    __slots__ = ("num", "gen")

    def __init__(self, num: int, gen: int):
        self.num, self.gen = num, gen

    def __repr__(self):
        return f"{self.num} {self.gen} R"

    def __eq__(self, o):
        return isinstance(o, Ref) and (self.num, self.gen) == (o.num, o.gen)

    def __hash__(self):
        return hash((self.num, self.gen))


class Name(str):
    """PDF name object (distinct from strings)."""


class Stream:
    __slots__ = ("dict", "raw")

    def __init__(self, d: Dict, raw: bytes):
        self.dict, self.raw = d, raw


_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class _Lexer:
    """Tokenizer over the raw PDF byte buffer."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def _skip_ws(self):
        d = self.data
        n = len(d)
        while self.pos < n:
            c = d[self.pos]
            if c in _WS:
                self.pos += 1
            elif c == 0x25:  # '%' comment
                e = d.find(b"\n", self.pos)
                self.pos = n if e < 0 else e + 1
            else:
                return

    def read_token(self) -> Optional[bytes]:
        self._skip_ws()
        d = self.data
        if self.pos >= len(d):
            return None
        c = d[self.pos]
        if c == 0x3C:  # '<'
            if d[self.pos:self.pos + 2] == b"<<":
                self.pos += 2
                return b"<<"
            return b"<"
        if c == 0x3E:  # '>'
            if d[self.pos:self.pos + 2] == b">>":
                self.pos += 2
                return b">>"
            self.pos += 1
            return b">"
        if c in b"[]{}()/":
            self.pos += 1
            return bytes([c])
        start = self.pos
        while self.pos < len(d) and d[self.pos] not in _WS and \
                d[self.pos] not in _DELIM:
            self.pos += 1
        return d[start:self.pos]

    def peek_token(self) -> Optional[bytes]:
        save = self.pos
        t = self.read_token()
        self.pos = save
        return t

    # -- object parsing --

    def read_object(self) -> Any:
        t = self.read_token()
        if t is None:
            raise ValueError("unexpected EOF in PDF object")
        if t == b"<<":
            return self._read_dict_or_stream()
        if t == b"[":
            arr = []
            while True:
                if self.peek_token() == b"]":
                    self.read_token()
                    return arr
                arr.append(self.read_object())
        if t == b"/":
            return Name(self._read_name())
        if t == b"(":
            return self._read_literal_string()
        if t == b"<":
            return self._read_hex_string()
        if t == b"true":
            return True
        if t == b"false":
            return False
        if t == b"null":
            return None
        # number or reference
        try:
            if re.fullmatch(rb"[+-]?\d+", t):
                save = self.pos
                t2 = self.read_token()
                if t2 is not None and re.fullmatch(rb"\d+", t2):
                    t3 = self.read_token()
                    if t3 == b"R":
                        return Ref(int(t), int(t2))
                self.pos = save
                return int(t)
            return float(t)
        except ValueError:
            raise ValueError(f"bad PDF token {t!r} at {self.pos}")

    def _read_name(self) -> str:
        d = self.data
        start = self.pos
        while self.pos < len(d) and d[self.pos] not in _WS and \
                d[self.pos] not in _DELIM:
            self.pos += 1
        raw = d[start:self.pos]
        # #xx escapes
        out = re.sub(rb"#([0-9A-Fa-f]{2})",
                     lambda m: bytes([int(m.group(1), 16)]), raw)
        return out.decode("latin-1")

    def _read_literal_string(self) -> bytes:
        d = self.data
        depth = 1
        out = bytearray()
        while self.pos < len(d):
            c = d[self.pos]
            self.pos += 1
            if c == 0x5C:  # backslash
                if self.pos >= len(d):   # trailing backslash at EOF
                    break
                e = d[self.pos]
                self.pos += 1
                esc = {0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12,
                       0x28: 40, 0x29: 41, 0x5C: 92}
                if e in esc:
                    out.append(esc[e])
                elif 0x30 <= e <= 0x37:  # octal
                    oct_s = bytes([e])
                    for _ in range(2):
                        if self.pos < len(d) and 0x30 <= d[self.pos] <= 0x37:
                            oct_s += bytes([d[self.pos]])
                            self.pos += 1
                        else:
                            break
                    out.append(int(oct_s, 8) & 0xFF)
                elif e in (10, 13):  # line continuation
                    if e == 13 and d[self.pos] == 10:
                        self.pos += 1
                else:
                    out.append(e)
            elif c == 0x28:
                depth += 1
                out.append(c)
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    return bytes(out)
                out.append(c)
            else:
                out.append(c)
        raise ValueError("unterminated string")

    def _read_hex_string(self) -> bytes:
        d = self.data
        end = d.find(b">", self.pos)
        if end < 0:                      # unterminated: consume to EOF, never
            end = len(d)                 # move the lexer backwards
            hexs = re.sub(rb"[^0-9A-Fa-f]", b"", d[self.pos:end])
            self.pos = end
        else:
            hexs = re.sub(rb"[^0-9A-Fa-f]", b"", d[self.pos:end])
            self.pos = end + 1
        if len(hexs) % 2:
            hexs += b"0"
        return bytes.fromhex(hexs.decode("ascii"))

    def _read_dict_or_stream(self) -> Any:
        d: Dict = {}
        while True:
            t = self.read_token()
            if t == b">>":
                break
            if t != b"/":
                raise ValueError(f"dict key must be a name, got {t!r}")
            key = self._read_name()
            d[key] = self.read_object()
        save = self.pos
        t = self.read_token()
        if t == b"stream":
            # EOL after 'stream' keyword: CRLF or LF
            if self.data[self.pos:self.pos + 2] == b"\r\n":
                self.pos += 2
            elif self.data[self.pos:self.pos + 1] in (b"\n", b"\r"):
                self.pos += 1
            start = self.pos
            return Stream(d, self.data[start:])  # raw sliced later w/ Length
        self.pos = save
        return d


# ---------------- filters ----------------


def _png_unpredict(data: bytes, columns: int, colors: int = 1,
                   bpc: int = 8) -> bytes:
    """PNG predictors (sub/up/avg/paeth) — xref streams use these."""
    rb = (columns * colors * bpc + 7) // 8
    stride = rb + 1
    out = bytearray()
    prev = bytearray(rb)
    bpp = max(1, colors * bpc // 8)
    for r in range(0, len(data) - stride + 1, stride):
        ft = data[r]
        row = bytearray(data[r + 1:r + 1 + rb])
        if ft == 1:   # Sub
            for i in range(bpp, rb):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ft == 2:  # Up
            for i in range(rb):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(rb):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + (left + prev[i]) // 2) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(rb):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[i] = (row[i] + pred) & 0xFF
        out += row
        prev = row
    return bytes(out)


def _decode_stream(stream: Stream, doc: "PdfDocument") -> bytes:
    d = stream.dict
    length = doc.resolve(d.get("Length", 0))
    data = stream.raw[:int(length)]
    filters = doc.resolve(d.get("Filter"))
    if filters is None:
        return data
    if not isinstance(filters, list):
        filters = [filters]
    parms = doc.resolve(d.get("DecodeParms"))
    if not isinstance(parms, list):
        parms = [parms] * len(filters)
    for f, pm in zip(filters, parms):
        f = doc.resolve(f)
        pm = doc.resolve(pm) or {}
        if f == "FlateDecode":
            data = zlib.decompress(data)
            pred = int(doc.resolve(pm.get("Predictor", 1)) or 1)
            if pred >= 10:
                data = _png_unpredict(
                    data, int(doc.resolve(pm.get("Columns", 1))),
                    int(doc.resolve(pm.get("Colors", 1))),
                    int(doc.resolve(pm.get("BitsPerComponent", 8))))
            elif pred != 1:
                raise ValueError(f"unsupported TIFF predictor {pred}")
        elif f == "ASCIIHexDecode":
            data = bytes.fromhex(
                re.sub(rb"[^0-9A-Fa-f]", b"", data.rstrip(b">"))
                .decode("ascii"))
        else:
            raise ValueError(f"unsupported PDF filter {f}")
    return data


# ---------------- document ----------------


class PdfDocument:
    """Minimal random-access PDF reader (xref tables, xref streams,
    object streams)."""

    def __init__(self, data: bytes):
        self.data = data
        self.offsets: Dict[int, int] = {}           # obj num → byte offset
        self.in_objstm: Dict[int, Tuple[int, int]] = {}  # → (stm num, idx)
        self.trailer: Dict = {}
        self._cache: Dict[int, Any] = {}
        self._objstm_cache: Dict[int, Dict[int, Any]] = {}
        self._parse_xrefs()
        if "Encrypt" in self.trailer:
            raise ValueError("encrypted PDFs are not supported")

    @classmethod
    def open(cls, path: str) -> "PdfDocument":
        with open(path, "rb") as f:
            return cls(f.read())

    # -- xref machinery --

    def _parse_xrefs(self):
        m = list(re.finditer(rb"startxref\s+(\d+)", self.data))
        if not m:
            raise ValueError("no startxref found (not a PDF?)")
        seen = set()
        pos = int(m[-1].group(1))
        while pos is not None and pos not in seen:
            seen.add(pos)
            pos = self._parse_xref_section(pos)

    def _parse_xref_section(self, pos: int) -> Optional[int]:
        lex = _Lexer(self.data, pos)
        t = lex.peek_token()
        if t == b"xref":
            lex.read_token()
            while True:
                t = lex.peek_token()
                if t == b"trailer":
                    lex.read_token()
                    trailer = lex.read_object()
                    for k, v in trailer.items():
                        self.trailer.setdefault(k, v)
                    if "XRefStm" in trailer:   # hybrid files
                        self._parse_xref_section(
                            int(trailer["XRefStm"]))
                    prev = trailer.get("Prev")
                    return int(prev) if prev is not None else None
                first = int(lex.read_token())
                count = int(lex.read_token())
                lex._skip_ws()
                for i in range(count):
                    line = self.data[lex.pos:lex.pos + 20]
                    fields = line.split()
                    off, _gen, kind = (int(fields[0]), int(fields[1]),
                                       fields[2])
                    num = first + i
                    if kind == b"n" and num not in self.offsets and \
                            num not in self.in_objstm:
                        self.offsets[num] = off
                    # advance exactly one 20- or 19-byte entry
                    adv = 20
                    if line[18:20] not in (b"\r\n", b" \n", b" \r"):
                        adv = line.find(b"\n") + 1 or 20
                    lex.pos += adv
        else:
            # xref stream: "N G obj << ... >> stream"
            obj = self._parse_object_at(pos)
            if not isinstance(obj, Stream):
                raise ValueError("bad xref stream")
            self._load_xref_stream(obj)
            for k, v in obj.dict.items():
                if k not in ("Length", "Filter", "DecodeParms", "W",
                             "Index", "Type"):
                    self.trailer.setdefault(k, v)
            prev = obj.dict.get("Prev")
            return int(prev) if prev is not None else None

    def _load_xref_stream(self, stream: Stream):
        data = _decode_stream(stream, self)
        w = [int(self.resolve(x)) for x in stream.dict["W"]]
        size = int(self.resolve(stream.dict["Size"]))
        index = self.resolve(stream.dict.get("Index", [0, size]))
        rw = sum(w)
        pos = 0
        for i in range(0, len(index), 2):
            first, count = int(index[i]), int(index[i + 1])
            for n in range(first, first + count):
                if pos + rw > len(data):
                    return
                fields = []
                for width in w:
                    v = int.from_bytes(data[pos:pos + width], "big") \
                        if width else None
                    pos += width
                    fields.append(v)
                ftype = fields[0] if w[0] else 1
                if n in self.offsets or n in self.in_objstm:
                    continue
                if ftype == 1:
                    self.offsets[n] = fields[1]
                elif ftype == 2:
                    self.in_objstm[n] = (fields[1], fields[2])

    # -- object access --

    def _parse_object_at(self, pos: int) -> Any:
        lex = _Lexer(self.data, pos)
        lex.read_token()          # obj num
        lex.read_token()          # gen
        t = lex.read_token()
        if t != b"obj":
            raise ValueError(f"expected 'obj' at {pos}")
        return lex.read_object()

    def get(self, num: int) -> Any:
        if num in self._cache:
            return self._cache[num]
        if num in self.offsets:
            obj = self._parse_object_at(self.offsets[num])
        elif num in self.in_objstm:
            stm_num, idx = self.in_objstm[num]
            obj = self._get_from_objstm(stm_num, idx)
        else:
            obj = None
        self._cache[num] = obj
        return obj

    def _get_from_objstm(self, stm_num: int, idx: int) -> Any:
        objs = self._objstm_cache.get(stm_num)
        if objs is None:
            stream = self.get(stm_num)
            data = _decode_stream(stream, self)
            n = int(self.resolve(stream.dict["N"]))
            first = int(self.resolve(stream.dict["First"]))
            hdr = _Lexer(data, 0)
            pairs = [(int(hdr.read_token()), int(hdr.read_token()))
                     for _ in range(n)]
            objs = {}
            for i, (_num, off) in enumerate(pairs):
                objs[i] = _Lexer(data, first + off).read_object()
            self._objstm_cache[stm_num] = objs
        return objs.get(idx)

    def resolve(self, obj: Any) -> Any:
        seen = 0
        while isinstance(obj, Ref):
            obj = self.get(obj.num)
            seen += 1
            if seen > 32:
                raise ValueError("reference cycle")
        return obj

    def stream_bytes(self, obj: Any) -> bytes:
        obj = self.resolve(obj)
        if not isinstance(obj, Stream):
            raise ValueError("expected a stream")
        return _decode_stream(obj, self)

    # -- page tree --

    def pages(self) -> List[Dict]:
        root = self.resolve(self.trailer["Root"])
        out: List[Dict] = []

        def walk(node_ref, inherited):
            node = self.resolve(node_ref)
            inh = dict(inherited)
            for k in ("Resources", "MediaBox", "Rotate"):
                if k in node:
                    inh[k] = node[k]
            if self.resolve(node.get("Type")) == "Pages" or "Kids" in node:
                for kid in self.resolve(node["Kids"]):
                    walk(kid, inh)
            else:
                page = dict(node)
                for k, v in inh.items():
                    page.setdefault(k, v)
                out.append(page)

        walk(root["Pages"], {})
        return out

    def page_content(self, page: Dict) -> bytes:
        contents = self.resolve(page.get("Contents"))
        if contents is None:
            return b""
        if isinstance(contents, list):
            return b"\n".join(self.stream_bytes(c) for c in contents)
        return self.stream_bytes(contents)


# ---------------- fonts ----------------


class _Font:
    """Width + unicode lookup for one page font."""

    def __init__(self, doc: PdfDocument, font_dict: Dict):
        fd = doc.resolve(font_dict)
        self.subtype = doc.resolve(fd.get("Subtype"))
        self.two_byte = False
        self.widths: Dict[int, float] = {}
        self.default_width = 500.0
        self.to_unicode: Dict[int, str] = {}

        if self.subtype == "Type0":
            desc = doc.resolve(fd["DescendantFonts"])
            cid = doc.resolve(desc[0])
            self.two_byte = True     # Identity-H/V (the common case)
            self.default_width = float(doc.resolve(cid.get("DW", 1000)))
            warr = doc.resolve(cid.get("W", []))
            i = 0
            while i < len(warr):
                c = int(doc.resolve(warr[i]))
                nxt = doc.resolve(warr[i + 1])
                if isinstance(nxt, list):
                    for j, wv in enumerate(nxt):
                        self.widths[c + j] = float(doc.resolve(wv))
                    i += 2
                else:
                    c2 = int(nxt)
                    wv = float(doc.resolve(warr[i + 2]))
                    for cc in range(c, c2 + 1):
                        self.widths[cc] = wv
                    i += 3
        else:
            first = int(doc.resolve(fd.get("FirstChar", 0)) or 0)
            widths = doc.resolve(fd.get("Widths", []) or [])
            for j, wv in enumerate(widths):
                self.widths[first + j] = float(doc.resolve(wv))
            descr = doc.resolve(fd.get("FontDescriptor")) or {}
            self.default_width = float(
                doc.resolve(descr.get("MissingWidth", 500)) or 500)

        tu = fd.get("ToUnicode")
        if tu is not None:
            try:
                self.to_unicode = _parse_tounicode(doc.stream_bytes(tu))
            except Exception:
                self.to_unicode = {}

    def iter_codes(self, raw: bytes):
        """Yield (code, is_space, applies_tw) glyph codes from a PDF
        string. `is_space` drives word segmentation (ToUnicode-aware);
        `applies_tw` follows ISO 32000-1 §9.3.3: word spacing Tw applies
        ONLY to the single-byte code 32, never to multi-byte codes."""
        if self.two_byte:
            for i in range(0, len(raw) - 1, 2):
                code = (raw[i] << 8) | raw[i + 1]
                yield code, self.to_unicode.get(code) == " ", False
        else:
            for b in raw:
                is_space = (b == 32 if not self.to_unicode
                            else self.to_unicode.get(b, chr(b)) == " ")
                yield b, is_space, b == 32

    def width(self, code: int) -> float:
        return self.widths.get(code, self.default_width)

    def unicode(self, code: int) -> str:
        if code in self.to_unicode:
            return self.to_unicode[code]
        if self.two_byte:
            return "�"
        return bytes([code]).decode("latin-1")


def _parse_tounicode(data: bytes) -> Dict[int, str]:
    """bfchar/bfrange sections of a ToUnicode CMap → {code: text}."""
    out: Dict[int, str] = {}

    def _utf16(hexs: bytes) -> str:
        b = bytes.fromhex(hexs.decode("ascii"))
        try:
            return b.decode("utf-16-be")
        except UnicodeDecodeError:
            return "�"

    for m in re.finditer(rb"beginbfchar(.*?)endbfchar", data, re.S):
        for src, dst in re.findall(rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>",
                                   m.group(1)):
            out[int(src, 16)] = _utf16(dst)
    for m in re.finditer(rb"beginbfrange(.*?)endbfrange", data, re.S):
        body = m.group(1)
        for lo, hi, dst in re.findall(
                rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>",
                body):
            lo_i, hi_i = int(lo, 16), int(hi, 16)
            base = int(dst, 16)
            width = len(dst)
            for c in range(lo_i, hi_i + 1):
                out[c] = _utf16(b"%0*X" % (width, base + (c - lo_i)))
        for lo, arr in re.findall(rb"<([0-9A-Fa-f]+)>\s*<[0-9A-Fa-f]+>\s*"
                                  rb"\[(.*?)\]", body, re.S):
            lo_i = int(lo, 16)
            for j, dst in enumerate(re.findall(rb"<([0-9A-Fa-f]+)>", arr)):
                out[lo_i + j] = _utf16(dst)
    return out


# ---------------- content-stream text machine ----------------


def _mat_mul(a, b):
    """3x3 affine as 6-tuple (a b c d e f): row-vector convention."""
    a0, a1, a2, a3, a4, a5 = a
    b0, b1, b2, b3, b4, b5 = b
    return (a0 * b0 + a1 * b2, a0 * b1 + a1 * b3,
            a2 * b0 + a3 * b2, a2 * b1 + a3 * b3,
            a4 * b0 + a5 * b2 + b4, a4 * b1 + a5 * b3 + b5)


def _apply(m, x, y):
    return (m[0] * x + m[2] * y + m[4], m[1] * x + m[3] * y + m[5])


_IDENT = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)


def _extract_page_chars(doc: PdfDocument, page: Dict) -> List[Dict]:
    """Run the text machine over one page's content → char records
    [{c, x, y, w, size}] in PDF device space (origin bottom-left)."""
    res = doc.resolve(page.get("Resources")) or {}
    font_dicts = doc.resolve(res.get("Font")) or {}
    fonts = {name: _Font(doc, fd) for name, fd in font_dicts.items()}

    content = doc.page_content(page)
    lex = _Lexer(content, 0)
    chars: List[Dict] = []

    ctm = _IDENT
    stack: List[Tuple] = []
    tm = tlm = _IDENT
    font: Optional[_Font] = None
    tfs = 0.0
    tc = tw = ts_rise = 0.0
    th = 1.0
    tl = 0.0
    operands: List[Any] = []

    def show(raw: bytes):
        nonlocal tm
        if font is None:
            return
        for code, is_space, applies_tw in font.iter_codes(raw):
            w0 = font.width(code) / 1000.0
            trm = _mat_mul((tfs * th, 0.0, 0.0, tfs, 0.0, ts_rise),
                           _mat_mul(tm, ctm))
            x, y = trm[4], trm[5]
            scale = (trm[0] ** 2 + trm[1] ** 2) ** 0.5 / max(tfs * th, 1e-9) \
                if tfs else 1.0
            adv = (w0 * tfs + tc + (tw if applies_tw else 0.0)) * th
            chars.append({"c": font.unicode(code), "x": x, "y": y,
                          "w": w0 * tfs * th * scale,
                          "size": tfs * scale,
                          "space": is_space})
            tm = _mat_mul((1.0, 0.0, 0.0, 1.0, adv, 0.0), tm)

    while True:
        save = lex.pos
        lex._skip_ws()
        if lex.pos >= len(content):
            break
        c = content[lex.pos]
        if c in b"/([<" or c == 0x3C or (chr(c).isdigit() or c in b"+-."):
            lex.pos = save
            try:
                operands.append(lex.read_object())
            except ValueError:
                lex.pos = save
                lex.read_token()   # skip junk
            continue
        op = lex.read_token()
        if op is None:
            break
        op = op.decode("latin-1", "replace")
        try:
            if op == "BT":
                tm = tlm = _IDENT
            elif op == "ET":
                pass
            elif op == "Tf" and len(operands) >= 2:
                font = fonts.get(str(operands[-2]))
                tfs = float(operands[-1])
            elif op == "Td" and len(operands) >= 2:
                tlm = _mat_mul((1, 0, 0, 1, float(operands[-2]),
                                float(operands[-1])), tlm)
                tm = tlm
            elif op == "TD" and len(operands) >= 2:
                tl = -float(operands[-1])
                tlm = _mat_mul((1, 0, 0, 1, float(operands[-2]),
                                float(operands[-1])), tlm)
                tm = tlm
            elif op == "Tm" and len(operands) >= 6:
                tm = tlm = tuple(float(v) for v in operands[-6:])
            elif op == "T*":
                tlm = _mat_mul((1, 0, 0, 1, 0.0, -tl), tlm)
                tm = tlm
            elif op == "TL":
                tl = float(operands[-1])
            elif op == "Tc":
                tc = float(operands[-1])
            elif op == "Tw":
                tw = float(operands[-1])
            elif op == "Tz":
                th = float(operands[-1]) / 100.0
            elif op == "Ts":
                ts_rise = float(operands[-1])
            elif op == "Tj" and operands:
                show(operands[-1])
            elif op == "'" and operands:
                tlm = _mat_mul((1, 0, 0, 1, 0.0, -tl), tlm)
                tm = tlm
                show(operands[-1])
            elif op == '"' and len(operands) >= 3:
                tw = float(operands[-3])
                tc = float(operands[-2])
                tlm = _mat_mul((1, 0, 0, 1, 0.0, -tl), tlm)
                tm = tlm
                show(operands[-1])
            elif op == "TJ" and operands:
                for el in operands[-1]:
                    if isinstance(el, (bytes, bytearray)):
                        show(bytes(el))
                    else:
                        tm = _mat_mul(
                            (1, 0, 0, 1,
                             -float(el) / 1000.0 * tfs * th, 0.0), tm)
            elif op == "cm" and len(operands) >= 6:
                ctm = _mat_mul(tuple(float(v) for v in operands[-6:]), ctm)
            elif op == "q":
                stack.append(ctm)
            elif op == "Q":
                ctm = stack.pop() if stack else _IDENT
        except (TypeError, ValueError, IndexError):
            pass
        operands = []
    return chars


# ---------------- word grouping (pdfplumber-style) ----------------


def _group_words(chars: List[Dict], page_height: float,
                 x_tolerance: float = 3.0,
                 y_tolerance: float = 3.0) -> List[Dict]:
    """Char records → word dicts {"text","x0","x1","top","bottom"} in
    top-left-origin coordinates (pdfplumber extract_words semantics:
    split on space glyphs, horizontal gaps > x_tolerance, and baseline
    jumps > y_tolerance)."""
    words: List[Dict] = []
    cur: List[Dict] = []

    def flush():
        if not cur:
            return
        x0 = min(ch["x"] for ch in cur)
        x1 = max(ch["x"] + ch["w"] for ch in cur)
        size = max(ch["size"] for ch in cur)
        base = sum(ch["y"] for ch in cur) / len(cur)
        words.append({
            "text": "".join(ch["c"] for ch in cur),
            "x0": x0, "x1": x1,
            "top": page_height - (base + 0.8 * size),
            "bottom": page_height - (base - 0.2 * size),
        })
        cur.clear()

    for ch in chars:
        if ch["space"] or not ch["c"].strip():
            flush()
            continue
        if cur:
            prev = cur[-1]
            gap = ch["x"] - (prev["x"] + prev["w"])
            if abs(ch["y"] - prev["y"]) > y_tolerance or \
                    gap > x_tolerance or gap < -2 * x_tolerance:
                flush()
        cur.append(ch)
    flush()
    return words


def extract_pdf_words(path_or_bytes, x_tolerance: float = 3.0,
                      y_tolerance: float = 3.0) -> List[List[Dict]]:
    """PDF → per-page lists of pdfplumber-style word dicts
    ({"text","x0","x1","top","bottom"}, top-left origin) — the `words`
    input of models/vgt.py build_grid_input / grid_ids_from_words
    (reference create_grid_input.py:86)."""
    doc = (PdfDocument(path_or_bytes) if isinstance(path_or_bytes, bytes)
           else PdfDocument.open(path_or_bytes))
    out = []
    for page in doc.pages():
        box = [float(doc.resolve(v))
               for v in doc.resolve(page.get("MediaBox", [0, 0, 612, 792]))]
        height = box[3] - box[1]
        chars = _extract_page_chars(doc, page)
        # shift device coords to MediaBox origin
        for ch in chars:
            ch["x"] -= box[0]
            ch["y"] -= box[1]
        out.append(_group_words(chars, height, x_tolerance, y_tolerance))
    return out


def extract_pdf_page_sizes(path_or_bytes) -> List[Tuple[float, float]]:
    """Per-page (width, height) in PDF points."""
    doc = (PdfDocument(path_or_bytes) if isinstance(path_or_bytes, bytes)
           else PdfDocument.open(path_or_bytes))
    sizes = []
    for page in doc.pages():
        box = [float(doc.resolve(v))
               for v in doc.resolve(page.get("MediaBox", [0, 0, 612, 792]))]
        sizes.append((box[2] - box[0], box[3] - box[1]))
    return sizes
