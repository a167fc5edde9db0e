#!/usr/bin/env python3
"""PDF fixture matrix for PdfSpec.

Every file is assembled from the ISO 32000-1 object syntax by this
script (python stdlib only — zlib for FlateDecode, an LZW encoder
below for LZWDecode), with the expected extracted text written next to
it (<name>.txt). The expectation is exact by construction: PDF text
extraction is deterministic — the strings placed in the content
streams are the strings a conformant extractor yields, so unlike the
lossy audio codecs no external decoder is needed to pin a convention.

Matrix:
  minimal       classic xref, uncompressed stream, Tj/TD lines
  flate         FlateDecode content
  xrefstream    PDF 1.5 xref stream (PNG up-predictor) + ObjStm
  tj_kerning    TJ arrays, inter-word gaps from kerning adjustments
  multipage     3 pages, /Resources inherited from the Pages node
  winansi_diffs WinAnsi base + /Differences glyph names + uniXXXX
  type0         Identity-H 2-byte codes, ToUnicode bfchar + bfrange
  filters       pages via ASCIIHex / ASCII85+Flate / RunLength / LZW
  escapes       literal-string escapes, octal, hex strings
  incremental   appended update replaces the page content
  badxref       garbage xref offsets -> reconstruction scan
  form          text inside a Form XObject via Do
  meta          Info dict (UTF-16BE + PDFDocEncoding), 2 pages
  encrypted     trailer /Encrypt present -> pdf_text NULL

Run from the repo root: python3 tools/make_pdf_fixtures.py
"""
import os
import zlib

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources", "pdf")
os.makedirs(OUT, exist_ok=True)


def lzw_encode(data: bytes, early_change=1) -> bytes:
    """PDF/TIFF LZW: MSB-first 9..12-bit codes, 256=clear, 257=EOD."""
    out_bits = []
    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9

    def emit(code):
        out_bits.append((code, width))

    emit(256)
    w = b""
    for ch in data:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
        else:
            emit(table[w])
            if next_code < 4096:
                table[wc] = next_code
                next_code += 1
            if next_code + early_change - 1 >= (1 << width) and width < 12:
                width += 1
            w = bytes([ch])
    if w:
        emit(table[w])
    emit(257)
    # pack MSB-first
    buf = bytearray()
    acc = 0
    nbits = 0
    for code, wd in out_bits:
        acc = (acc << wd) | code
        nbits += wd
        while nbits >= 8:
            buf.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
    if nbits:
        buf.append((acc << (8 - nbits)) & 0xFF)
    return bytes(buf)


def a85_encode(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 4):
        chunk = data[i:i + 4]
        pad = 4 - len(chunk)
        n = int.from_bytes(chunk + b"\0" * pad, "big")
        if n == 0 and pad == 0:
            out.append(ord("z"))
            continue
        enc = bytearray(5)
        for k in range(4, -1, -1):
            enc[k] = n % 85 + 33
            n //= 85
        out += enc[: 5 - pad]
    out += b"~>"
    return bytes(out)


def rl_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data):
        run = 1
        while i + run < len(data) and data[i + run] == data[i] and run < 128:
            run += 1
        if run >= 3:
            out.append(257 - run)
            out.append(data[i])
            i += run
        else:
            j = i
            while j < len(data) and j - i < 128:
                if j + 2 < len(data) and data[j] == data[j + 1] == data[j + 2]:
                    break
                j += 1
            out.append(j - i - 1)
            out += data[i:j]
            i = j
    out.append(128)
    return bytes(out)


class Builder:
    """Assemble a classic-xref PDF from numbered objects."""

    def __init__(self, version=b"1.4"):
        self.version = version
        self.objs = {}  # num -> bytes (body, no "N 0 obj" wrapper)

    def add(self, num, body):
        if isinstance(body, str):
            body = body.encode("latin-1")
        self.objs[num] = body
        return num

    def stream(self, num, dict_extra, data, filters=None):
        d = b"<< /Length " + str(len(data)).encode() + b" "
        if filters:
            d += b"/Filter " + filters + b" "
        if dict_extra:
            d += dict_extra + b" "
        d += b">>"
        body = d + b"\nstream\n" + data + b"\nendstream"
        return self.add(num, body)

    def build(self, root, info=None, extra_trailer=b""):
        out = bytearray(b"%PDF-" + self.version + b"\n%\xe2\xe3\xcf\xd3\n")
        offsets = {}
        for num in sorted(self.objs):
            offsets[num] = len(out)
            out += str(num).encode() + b" 0 obj\n" + self.objs[num] + b"\nendobj\n"
        xref_off = len(out)
        maxnum = max(self.objs) if self.objs else 0
        out += b"xref\n0 " + str(maxnum + 1).encode() + b"\n"
        out += b"0000000000 65535 f \n"
        for num in range(1, maxnum + 1):
            if num in offsets:
                out += b"%010d 00000 n \n" % offsets[num]
            else:
                out += b"0000000000 65535 f \n"
        trailer = b"trailer\n<< /Size " + str(maxnum + 1).encode()
        trailer += b" /Root " + str(root).encode() + b" 0 R"
        if info:
            trailer += b" /Info " + str(info).encode() + b" 0 R"
        trailer += extra_trailer
        trailer += b" >>\nstartxref\n" + str(xref_off).encode() + b"\n%%EOF\n"
        out += trailer
        return bytes(out)


def skeleton(b, content_nums, resources=b"<< /Font << /F1 10 0 R >> >>",
             res_on_pages=False):
    """catalog(1) -> pages(2) -> page per content obj; F1 = Helvetica(10)."""
    b.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    kids = b" ".join(b"%d 0 R" % (100 + i) for i in range(len(content_nums)))
    pages_dict = b"<< /Type /Pages /Kids [" + kids + b"] /Count " + str(
        len(content_nums)).encode()
    if res_on_pages:
        pages_dict += b" /Resources " + resources
    pages_dict += b" >>"
    b.add(2, pages_dict)
    for i, cn in enumerate(content_nums):
        pd = b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents " + \
            str(cn).encode() + b" 0 R"
        if not res_on_pages:
            pd += b" /Resources " + resources
        pd += b" >>"
        b.add(100 + i, pd)
    b.add(10, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")


def write(name, data, expected):
    with open(os.path.join(OUT, name + ".pdf"), "wb") as f:
        f.write(data)
    with open(os.path.join(OUT, name + ".txt"), "w", encoding="utf-8") as f:
        f.write(expected)
    print("%-14s %6d bytes" % (name, len(data)))


# ---------------------------------------------------------------- minimal
b = Builder()
content = (b"BT /F1 12 Tf 72 720 Td (Hello, World!) Tj "
           b"0 -14 TD (Second line.) Tj ET")
b.stream(3, b"", content)
skeleton(b, [3])
write("minimal", b.build(1), "Hello, World!\nSecond line.")

# ------------------------------------------------------------------ flate
b = Builder()
raw = (b"BT /F1 12 Tf 72 720 Td (Compressed content stream.) Tj "
       b"T* (Via zlib.) Tj ET")
b.stream(3, b"", zlib.compress(raw), b"/FlateDecode")
skeleton(b, [3])
write("flate", b.build(1), "Compressed content stream.\nVia zlib.")

# -------------------------------------------------------------- tj_kerning
b = Builder()
content = (b"BT /F1 12 Tf 72 720 Td "
           b"[(Ker) 10 (ned) -250 (words) -500 (apart.)] TJ ET")
b.stream(3, b"", content)
skeleton(b, [3])
write("tj_kerning", b.build(1), "Kerned words apart.")

# -------------------------------------------------------------- multipage
b = Builder()
for i in range(3):
    b.stream(3 + i, b"", b"BT /F1 12 Tf 72 720 Td (Page %d body.) Tj ET" % (i + 1))
skeleton(b, [3, 4, 5], res_on_pages=True)
write("multipage", b.build(1), "Page 1 body.\fPage 2 body.\fPage 3 body.")

# ----------------------------------------------------------- winansi_diffs
b = Builder()
# \205 -> eacute, \206 -> emdash, \207 -> uni20AC, \210 -> Euro (AGL)
content = (b"BT /F2 12 Tf 72 720 Td "
           b"(caf\205 \206 \207\210 na\213ve \222quote\222) Tj ET")
b.stream(3, b"", content)
b.add(11, b"<< /Type /Encoding /BaseEncoding /WinAnsiEncoding /Differences "
          b"[ 133 /eacute 134 /emdash 135 /uni20AC 136 /Euro 139 /idieresis ] >>")
b.add(12, b"<< /Type /Font /Subtype /Type1 /BaseFont /Times-Roman "
          b"/Encoding 11 0 R >>")
skeleton(b, [3], resources=b"<< /Font << /F2 12 0 R >> >>")
write("winansi_diffs", b.build(1),
      "café — €€ naïve ’quote’")

# ------------------------------------------------------------------ type0
b = Builder()
cmap = (b"/CIDInit /ProcSet findresource begin\n"
        b"12 dict begin\nbegincmap\n"
        b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
        b"2 beginbfchar\n<0041> <0048>\n<0042> <00E9>\nendbfchar\n"
        b"1 beginbfrange\n<0100> <0102> <0061>\nendbfrange\n"
        b"1 beginbfrange\n<0200> <0201> [<0058> <01310131>]\nendbfrange\n"
        b"endcmap\nCMapName currentdict /CMap defineresource pop\nend\nend")
b.stream(20, b"", cmap)
b.add(21, b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /Fake "
          b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) "
          b"/Supplement 0 >> >>")
b.add(12, b"<< /Type /Font /Subtype /Type0 /BaseFont /Fake "
          b"/Encoding /Identity-H /DescendantFonts [21 0 R] /ToUnicode 20 0 R >>")
# codes: 0041 0042 0100 0101 0102 0200 0201 -> H e a b c X ii
content = (b"BT /F2 12 Tf 72 720 Td "
           b"<0041004201000101010202000201> Tj ET")
b.stream(3, b"", content)
skeleton(b, [3], resources=b"<< /Font << /F2 12 0 R >> >>")
write("type0", b.build(1), "HéabcXıı")

# ---------------------------------------------------------------- filters
b = Builder()
p1 = b"BT /F1 12 Tf 72 720 Td (Hex page.) Tj ET"
b.stream(3, b"", p1.hex().encode() + b">", b"/ASCIIHexDecode")
p2 = b"BT /F1 12 Tf 72 720 Td (A85 then flate.) Tj ET"
b.stream(4, b"", a85_encode(zlib.compress(p2)), b"[/ASCII85Decode /FlateDecode]")
p3 = b"BT /F1 12 Tf 72 720 Td (Run     length page.) Tj ET"
b.stream(5, b"", rl_encode(p3), b"/RunLengthDecode")
p4 = b"BT /F1 12 Tf 72 720 Td (LZW page, abcabcabcabc.) Tj ET"
b.stream(6, b"", lzw_encode(p4), b"/LZWDecode")
skeleton(b, [3, 4, 5, 6])
write("filters", b.build(1),
      "Hex page.\fA85 then flate.\fRun     length page.\fLZW page, abcabcabcabc.")

# ---------------------------------------------------------------- escapes
b = Builder()
content = (b"BT /F1 12 Tf 72 720 Td "
           b"(Paren \\(nested\\) pair \\\\ back\\134slash \\110i line\\nbreak) Tj "
           b"T* <48657820 7374 72696E67 7> Tj ET")
b.stream(3, b"", content)
skeleton(b, [3])
# the \n escape is byte 0x0A — no glyph in StandardEncoding, dropped
write("escapes",
      b.build(1),
      "Paren (nested) pair \\ back\\slash Hi linebreak\nHex stringp")

# ------------------------------------------------------------ incremental
b = Builder()
b.stream(3, b"", b"BT /F1 12 Tf 72 720 Td (Original text.) Tj ET")
skeleton(b, [3])
base = b.build(1)
# append an update: new object 3, new xref pointing to it, /Prev to old
upd_content = b"BT /F1 12 Tf 72 720 Td (Updated text.) Tj ET"
new3 = b"<< /Length " + str(len(upd_content)).encode() + b" >>\nstream\n" + \
    upd_content + b"\nendstream"
prev_xref = base.rfind(b"xref")
upd = bytearray(base)
off3 = len(upd)
upd += b"3 0 obj\n" + new3 + b"\nendobj\n"
xref_off = len(upd)
upd += b"xref\n0 1\n0000000000 65535 f \n3 1\n%010d 00000 n \n" % off3
upd += b"trailer\n<< /Size 11 /Root 1 0 R /Prev " + str(prev_xref).encode() + \
    b" >>\nstartxref\n" + str(xref_off).encode() + b"\n%%EOF\n"
write("incremental", bytes(upd), "Updated text.")

# ---------------------------------------------------------------- badxref
b = Builder()
b.stream(3, b"", b"BT /F1 12 Tf 72 720 Td (Reconstructed fine.) Tj ET")
skeleton(b, [3])
good = b.build(1)
# poison every xref offset
bad = bytearray(good)
x = good.rfind(b"xref")
i = x
while i < len(bad) - 10:
    if bad[i:i + 10].isdigit() and bad[i + 10] == 0x20 and bad[i + 16] == 0x20:
        bad[i:i + 10] = b"9999999999"
        i += 18
    else:
        i += 1
write("badxref", bytes(bad), "Reconstructed fine.")

# ------------------------------------------------------------------- form
b = Builder()
form_content = b"BT /F1 10 Tf 10 10 Td (Inside the form.) Tj ET"
b.stream(30, b"/Type /XObject /Subtype /Form /BBox [0 0 100 100] "
             b"/Resources << /Font << /F1 10 0 R >> >>", form_content)
content = (b"BT /F1 12 Tf 72 720 Td (Before form.) Tj ET /Fm1 Do "
           b"BT 72 600 Td (After form.) Tj ET")
b.stream(3, b"", content)
skeleton(b, [3], resources=b"<< /Font << /F1 10 0 R >> "
                           b"/XObject << /Fm1 30 0 R >> >>")
write("form", b.build(1), "Before form.\nInside the form.\nAfter form.")

# ------------------------------------------------------------------- meta
b = Builder(version=b"1.6")
b.stream(3, b"", b"BT /F1 12 Tf 72 720 Td (Meta body.) Tj ET")
b.stream(4, b"", b"BT /F1 12 Tf 72 720 Td (Second.) Tj ET")
skeleton(b, [3, 4])
title_utf16 = "Título — résumé".encode("utf-16-be")
b.add(50, b"<< /Title (\xfe\xff" +
      title_utf16.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)") +
      b") /Author (Caf\x8e writer) "  # 0x8E = quotedblright in PDFDocEncoding
      b"/Producer (graft fixtures) /CreationDate (D:20240102030405Z) >>")
write("meta", b.build(1, info=50), "Meta body.\fSecond.")

# -------------------------------------------------------------- encrypted
b = Builder()
b.stream(3, b"", b"\x13\x37\xde\xad\xbe\xef garbage bytes")
skeleton(b, [3])
b.add(60, b"<< /Filter /Standard /V 1 /R 2 /O <0102> /U <0304> /P -44 >>")
write("encrypted", b.build(1, extra_trailer=b" /Encrypt 60 0 R"), "")

# -------------------------------------------------------------- xrefstream
# hand-rolled PDF 1.5 file: catalog/pages/page/font live in an ObjStm,
# the xref is a stream with PNG up-predictor
out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
offsets = {}
content = b"BT /F1 12 Tf 72 720 Td (Object streams work.) Tj ET"


def emit(num, body):
    offsets[num] = len(out)
    out.extend(str(num).encode() + b" 0 obj\n" + body + b"\nendobj\n")


emit(4, b"<< /Length " + str(len(content)).encode() + b" >>\nstream\n" +
     content + b"\nendstream")
# ObjStm with objects 1 (catalog), 2 (pages), 3 (page), 5 (font)
members = [
    (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
    (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
    (3, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>"),
    (5, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"),
]
pairs = b""
payload = b""
for num, body in members:
    pairs += b"%d %d " % (num, len(payload))
    payload += body + b" "
objstm_data = pairs + payload
first = len(pairs)
objstm = zlib.compress(objstm_data)
emit(6, b"<< /Type /ObjStm /N 4 /First " + str(first).encode() +
     b" /Length " + str(len(objstm)).encode() +
     b" /Filter /FlateDecode >>\nstream\n" + objstm + b"\nendstream")
xref_off = len(out)
# xref stream obj 7: W [1 2 1]; entries for objects 0..7
rows = []
rows.append(bytes([0, 0, 0, 255]))           # 0: free
for num in (1, 2, 3):
    idx = [m[0] for m in members].index(num)
    rows.append(bytes([2]) + (6).to_bytes(2, "big") + bytes([idx]))
rows.append(bytes([1]) + offsets[4].to_bytes(2, "big") + bytes([0]))
rows.append(bytes([2]) + (6).to_bytes(2, "big") + bytes([3]))
rows.append(bytes([1]) + offsets[6].to_bytes(2, "big") + bytes([0]))
rows.append(bytes([1]) + xref_off.to_bytes(2, "big") + bytes([0]))
# PNG predictor 2 (up) rows: tag 2 + row xor... (up = minus prior row)
rowlen = 4
pred = bytearray()
prior = bytes(rowlen)
for r in rows:
    pred.append(2)
    pred.extend(((r[i] - prior[i]) & 0xFF) for i in range(rowlen))
    prior = r
xstream = zlib.compress(bytes(pred))
out.extend(b"7 0 obj\n<< /Type /XRef /Size 8 /W [1 2 1] /Index [0 8] "
           b"/Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns 4 >> "
           b"/Root 1 0 R /Length " + str(len(xstream)).encode() +
           b" >>\nstream\n" + xstream + b"\nendstream\nendobj\n")
out.extend(b"startxref\n" + str(xref_off).encode() + b"\n%%EOF\n")
write("xrefstream", bytes(out), "Object streams work.")

print("fixtures ->", os.path.abspath(OUT))
