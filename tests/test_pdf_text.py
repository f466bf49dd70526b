"""Dependency-free PDF text-layer extraction (pipelines/pdf_text.py).

Fixtures are authored in-test: a classic-xref PDF with uncompressed
content (hand-computed word boxes from /Widths), and a modern PDF with
FlateDecode content, an /ObjStm object stream, and a cross-reference
stream with PNG Up-predictor — the layouts real generators emit. The
extracted words feed models/vgt.py build_grid_input exactly like
pdfplumber's extract_words feeds the reference create_grid_input.py:86.
"""

import zlib

import numpy as np
import pytest

from advancedliteratemachinery_tpu.pipelines.pdf_text import (
    PdfDocument,
    extract_pdf_page_sizes,
    extract_pdf_words,
)


def _classic_pdf(with_contents: bool = True) -> bytes:
    """One page (200x100), Helvetica-like font with explicit /Widths:
    'AB CD' at 12pt from (20, 40) via Tj, then 'E' via TJ with kerning."""
    # glyph widths (units/1000): A=600, B=700, space=250, C=500, D=500, E=400
    widths = "[600 700 250 500 500 400]"  # FirstChar 65 ('A')... but space=32
    # use FirstChar 32: space at index 0, then pad up to 'A'
    w = [250] + [0] * 32 + [600, 700, 500, 500, 400]   # 32..69
    widths = "[" + " ".join(str(v) for v in w) + "]"
    content = b"""BT
/F1 12 Tf
20 40 Td
(AB CD) Tj
[700 (E)] TJ
ET"""
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 200 100] "
            b"/Resources << /Font << /F1 4 0 R >> >> "
            + (b"/Contents 5 0 R " if with_contents else b"") + b">>"),
        4: (b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
            b"/FirstChar 32 /Widths " + widths.encode() +
            b" /FontDescriptor << /MissingWidth 999 >> >>"),
        5: (b"<< /Length " + str(len(content)).encode() + b" >>\nstream\n"
            + content + b"\nendstream"),
    }
    out = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objs[num] + b"\nendobj\n"
    xref_pos = len(out)
    out += b"xref\n0 6\n0000000000 65535 f \n"
    for num in sorted(objs):
        out += f"{offsets[num]:010d} 00000 n \n".encode()
    out += (b"trailer\n<< /Size 6 /Root 1 0 R >>\nstartxref\n"
            + str(xref_pos).encode() + b"\n%%EOF")
    return bytes(out)


class TestClassicPdf:
    def test_words_and_boxes(self):
        words = extract_pdf_words(_classic_pdf())
        assert len(words) == 1
        page = words[0]
        assert [w["text"] for w in page] == ["AB", "CD", "E"]

        ab, cd, e = page
        # 'AB' starts at x=20; A=600/1000*12=7.2, B=700→8.4 wide
        assert ab["x0"] == pytest.approx(20.0)
        assert ab["x1"] == pytest.approx(20.0 + 7.2 + 8.4)
        # space advances 250/1000*12=3.0 → 'CD' at 38.6, C=D=6.0
        assert cd["x0"] == pytest.approx(38.6)
        assert cd["x1"] == pytest.approx(38.6 + 12.0)
        # TJ kerning: positive array value moves LEFT by 700/1000*12 = 8.4:
        # E starts at 50.6 - 8.4 = 42.2 — the overlap (gap < -2·tol) splits
        # it into its own word
        assert e["x0"] == pytest.approx(42.2)
        # top-left origin: baseline y=40, size 12 → top = 100-(40+9.6)
        assert ab["top"] == pytest.approx(100 - 49.6)
        assert ab["bottom"] == pytest.approx(100 - 37.6)

    def test_page_sizes(self):
        assert extract_pdf_page_sizes(_classic_pdf()) == [(200.0, 100.0)]

    def test_grid_input_chain(self):
        """Words flow into the VGT grid builder (create_grid_input.py:86)."""
        from advancedliteratemachinery_tpu.models.vgt import build_grid_input

        words = extract_pdf_words(_classic_pdf())[0]
        tokenize = lambda texts: [[7, 8] if t == "AB" else [9]    # noqa: E731
                                  for t in texts]
        grid = build_grid_input(words, tokenize)
        assert grid["texts"] == ["AB", "CD", "E"]
        assert list(grid["input_ids"]) == [7, 8, 9, 9]
        # AB's box is split between its two subwords
        b = grid["bbox_subword_list"]
        assert b[0][2] == pytest.approx(b[1][2])
        assert b[1][0] == pytest.approx(b[0][0] + b[0][2])


def _modern_pdf() -> bytes:
    """Flate content + catalog/pages/font inside an /ObjStm + xref stream
    with PNG Up predictor (the PDF 1.5+ layout)."""
    content_raw = b"BT /F1 10 Tf 1 0 0 1 10 80 Tm (Hi there) Tj ET"
    content = zlib.compress(content_raw)

    # objects 1 (catalog), 2 (pages), 4 (font) live in object stream 6
    inner = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        4: None,  # filled below (computed /Widths)
    }
    w = [0] * 90
    w[ord(" ") - 32] = 250
    w[ord("H") - 32] = 500
    w[ord("i") - 32] = 600
    for ch in "there":
        w[ord(ch) - 32] = 400
    inner[4] = (b"<< /Type /Font /Subtype /TrueType /BaseFont /Arial "
                b"/FirstChar 32 /Widths [" +
                " ".join(str(v) for v in w).encode() + b"] >>")
    # ObjStm: header "num offset ..." then objects
    body = b""
    pairs = []
    for num in (1, 2, 4):
        pairs.append(f"{num} {len(body)}".encode())
        body += inner[num] + b" "
    header = b" ".join(pairs) + b" "
    stm_data = zlib.compress(header + body)

    out = bytearray(b"%PDF-1.5\n")
    offsets = {}

    def add(num, payload):
        offsets[num] = len(out)
        out.extend(f"{num} 0 obj\n".encode() + payload + b"\nendobj\n")

    add(3, (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 300 120] "
            b"/Resources << /Font << /F1 4 0 R >> >> /Contents 5 0 R >>"))
    add(5, (b"<< /Length " + str(len(content)).encode() +
            b" /Filter /FlateDecode >>\nstream\n" + content + b"\nendstream"))
    add(6, (b"<< /Type /ObjStm /N 3 /First " + str(len(header)).encode() +
            b" /Length " + str(len(stm_data)).encode() +
            b" /Filter /FlateDecode >>\nstream\n" + stm_data +
            b"\nendstream"))

    # xref stream (object 7): W [1 4 2], entries for objects 0..7
    xref_pos_placeholder = len(out)
    rows = []
    rows.append((0, 0, 65535))                  # obj 0: free
    rows.append((2, 6, 0))                      # obj 1: in objstm 6, idx 0
    rows.append((2, 6, 1))                      # obj 2: idx 1
    rows.append((1, offsets[3], 0))             # obj 3
    rows.append((2, 6, 2))                      # obj 4: idx 2
    rows.append((1, offsets[5], 0))             # obj 5
    rows.append((1, offsets[6], 0))             # obj 6
    rows.append((1, xref_pos_placeholder, 0))   # obj 7: the xref stream
    raw = b""
    prev = bytes(7)
    for t, f2, f3 in rows:
        row = bytes([t]) + f2.to_bytes(4, "big") + f3.to_bytes(2, "big")
        # PNG Up predictor: filter byte 2, then row - prev
        raw += bytes([2]) + bytes((row[i] - prev[i]) & 0xFF
                                  for i in range(7))
        prev = row
    xdata = zlib.compress(raw)
    add(7, (b"<< /Type /XRef /Size 8 /W [1 4 2] /Root 1 0 R "
            b"/Filter /FlateDecode /DecodeParms << /Predictor 12 "
            b"/Columns 7 >> /Length " + str(len(xdata)).encode() +
            b" >>\nstream\n" + xdata + b"\nendstream"))
    assert offsets[7] == xref_pos_placeholder
    out += (b"startxref\n" + str(offsets[7]).encode() + b"\n%%EOF")
    return bytes(out)


class TestModernPdf:
    def test_objstm_xrefstream_flate(self):
        words = extract_pdf_words(_modern_pdf())
        assert [w["text"] for w in words[0]] == ["Hi", "there"]
        hi = words[0][0]
        # H=500,i=600 at 10pt from x=10 → x1 = 10 + 5.0 + 6.0
        assert hi["x0"] == pytest.approx(10.0)
        assert hi["x1"] == pytest.approx(21.0)
        # Tm baseline 80, size 10 → top = 120 - 88
        assert hi["top"] == pytest.approx(32.0)

    def test_document_internals(self):
        doc = PdfDocument(_modern_pdf())
        assert doc.resolve(doc.trailer["Root"])["Type"] == "Catalog"
        # object 4 (font) resolves out of the object stream
        font = doc.get(4)
        assert font["Subtype"] == "TrueType"


class TestRobustness:
    def test_not_a_pdf(self):
        with pytest.raises(ValueError, match="startxref"):
            extract_pdf_words(b"plain text, no pdf here")

    def test_empty_page_no_contents(self):
        words = extract_pdf_words(_classic_pdf(with_contents=False))
        assert words == [[]]

    def test_unterminated_hex_string_no_hang(self):
        """ADVICE r4: a hex string with no '>' used to rewind the lexer
        (find() == -1 → pos = 0) and loop forever; it must consume to EOF."""
        from advancedliteratemachinery_tpu.pipelines.pdf_text import _Lexer

        lex = _Lexer(b"<48656C6C6F", 0)
        obj = lex.read_object()
        assert obj == b"Hello"
        assert lex.pos == 11            # at EOF, not rewound

    def test_trailing_backslash_literal_string(self):
        """A literal string ending in a lone backslash at EOF must not
        IndexError (ADVICE r4)."""
        from advancedliteratemachinery_tpu.pipelines.pdf_text import _Lexer

        lex = _Lexer(b"(abc\\", 0)
        with pytest.raises(ValueError, match="unterminated"):
            lex.read_object()           # clean error, not IndexError

    def test_tw_only_single_byte_code32(self):
        """ISO 32000-1 9.3.3: word spacing Tw applies only to single-byte
        code 32 — two-byte Type0 codes mapping to ' ' get is_space (word
        segmentation) but never applies_tw (ADVICE r4)."""
        from advancedliteratemachinery_tpu.pipelines.pdf_text import _Font

        f = _Font.__new__(_Font)
        f.two_byte = True
        f.to_unicode = {0x0003: " ", 0x0041: "A"}
        codes = list(f.iter_codes(b"\x00\x41\x00\x03"))
        assert codes == [(0x41, False, False), (0x03, True, False)]

        f1 = _Font.__new__(_Font)
        f1.two_byte = False
        f1.to_unicode = {}
        codes = list(f1.iter_codes(b"a b"))
        assert [c[2] for c in codes] == [False, True, False]

    def test_tounicode_cmap(self):
        from advancedliteratemachinery_tpu.pipelines.pdf_text import (
            _parse_tounicode)

        cmap = (b"/CIDInit /ProcSet findresource begin\n"
                b"beginbfchar\n<0041> <0058>\nendbfchar\n"
                b"beginbfrange\n<0030> <0032> <0061>\nendbfrange\n")
        m = _parse_tounicode(cmap)
        assert m[0x41] == "X"
        assert m[0x30] == "a" and m[0x32] == "c"


def test_cli_pdf_grid(tmp_path):
    pdf = tmp_path / "doc.pdf"
    pdf.write_bytes(_classic_pdf())
    out_dir = tmp_path / "grids"

    from advancedliteratemachinery_tpu.cli import main

    rc = main(["pdf-grid", str(pdf), str(out_dir)])
    assert rc == 0
    data = np.load(out_dir / "doc_page_0.npz", allow_pickle=True)
    assert list(data["texts"]) == ["AB", "CD", "E"]
    assert data["bbox_subword_list"].shape[1] == 4
    assert data["page_size"].tolist() == [200.0, 100.0]
    # grid boxes line up with the extracted word boxes (x, y, w, h)
    assert data["bbox_texts_list"][0][0] == pytest.approx(20.0)
