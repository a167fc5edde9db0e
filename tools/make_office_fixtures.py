#!/usr/bin/env python3
"""Office/EPUB/ZIP fixtures for OfficeTextSpec.

Archives are built by python's INDEPENDENT zipfile writer (deflate via
zlib), documents are hand-authored ECMA-376 / ODF / OPF XML; the
expected extraction is exact by construction. Run from the repo root.
"""
import os
import zipfile

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources", "office")
os.makedirs(OUT, exist_ok=True)


def write_zip(name, entries, expected, comment=None, compression=zipfile.ZIP_DEFLATED):
    path = os.path.join(OUT, name)
    with zipfile.ZipFile(path, "w", compression) as z:
        if comment:
            z.comment = comment
        for ename, data in entries:
            if isinstance(data, str):
                data = data.encode("utf-8")
            z.writestr(ename, data)
    if expected is not None:
        with open(path + ".txt", "w", encoding="utf-8") as f:
            f.write(expected)
    print("%-12s %6d bytes" % (name, os.path.getsize(path)))


# ------------------------------------------------------------- plain zip
write_zip("plain.zip", [
    ("a.txt", "hello zip"),
    ("dir/b.txt", "b" * 400),
    ("日本.txt", "unicode name"),
], None, comment=b"trailing archive comment to make the EOCD scan work")

# ----------------------------------------------------------------- docx
document = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">
 <w:body>
  <w:p><w:r><w:t>First paragraph with </w:t></w:r>
    <w:r><w:rPr><w:b/></w:rPr><w:t xml:space="preserve">bold run</w:t></w:r>
    <w:r><w:t>.</w:t></w:r></w:p>
  <w:p><w:r><w:t>Tabbed:</w:t><w:tab/><w:t>value &amp; more &lt;x&gt;</w:t></w:r></w:p>
  <w:p><w:r><w:t>Line one</w:t><w:br/><w:t>line two</w:t></w:r></w:p>
  <w:tbl><w:tr><w:tc><w:p><w:r><w:t>cell A</w:t></w:r></w:p></w:tc>
   <w:tc><w:p><w:r><w:t>cell B</w:t></w:r></w:p></w:tc></w:tr></w:tbl>
 </w:body>
</w:document>"""
write_zip("doc.docx", [
    ("[Content_Types].xml", "<Types/>"),
    ("word/document.xml", document),
], "First paragraph with bold run.\nTabbed:\tvalue & more <x>\n"
   "Line one\nline two\ncell A\ncell B")

# ----------------------------------------------------------------- pptx
slide1 = """<p:sld xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main"
 xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main">
 <p:txBody><a:p><a:r><a:t>Slide one title</a:t></a:r></a:p>
 <a:p><a:r><a:t>Bullet A</a:t></a:r></a:p></p:txBody></p:sld>"""
slide2 = """<p:sld xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main"
 xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main">
 <p:txBody><a:p><a:r><a:t>Second </a:t></a:r><a:r><a:t>slide</a:t></a:r></a:p>
 </p:txBody></p:sld>"""
write_zip("pres.pptx", [
    ("[Content_Types].xml", "<Types/>"),
    ("ppt/presentation.xml", "<p:presentation/>"),
    # slide10 before slide2 in the archive: numeric sort must win
    ("ppt/slides/slide10.xml", slide1.replace("Slide one title", "Tenth slide")),
    ("ppt/slides/slide2.xml", slide2),
    ("ppt/slides/slide1.xml", slide1),
], "Slide one title\nBullet A\fSecond slide\fTenth slide\nBullet A")

# ----------------------------------------------------------------- xlsx
shared = """<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="3" uniqueCount="3">
 <si><t>Name</t></si>
 <si><r><t>Sp</t></r><r><t>lit rich</t></r></si>
 <si><t>Total</t></si>
</sst>"""
sheet1 = """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
 <sheetData>
  <row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>
  <row r="2"><c r="A2"><v>42</v></c>
    <c r="B2" t="inlineStr"><is><t>inline text</t></is></c></row>
 </sheetData>
</worksheet>"""
sheet2 = """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
 <sheetData><row r="1"><c r="A1" t="s"><v>2</v></c><c r="B1"><v>3.5</v></c></row></sheetData>
</worksheet>"""
write_zip("book.xlsx", [
    ("[Content_Types].xml", "<Types/>"),
    ("xl/workbook.xml", "<workbook/>"),
    ("xl/sharedStrings.xml", shared),
    ("xl/worksheets/sheet1.xml", sheet1),
    ("xl/worksheets/sheet2.xml", sheet2),
], "Name\tSplit rich\n42\tinline text\fTotal\t3.5")

# ------------------------------------------------------------------ odt
content = """<?xml version="1.0" encoding="UTF-8"?>
<office:document-content xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0"
 xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">
 <office:automatic-styles><style:style name="P1">hidden style text</style:style></office:automatic-styles>
 <office:body><office:text>
  <text:h>Heading</text:h>
  <text:p>Body <text:span>span text</text:span> end.</text:p>
  <text:p>Tab<text:tab/>then<text:line-break/>break</text:p>
 </office:text></office:body>
</office:document-content>"""
write_zip("text.odt", [
    ("mimetype", "application/vnd.oasis.opendocument.text"),
    ("content.xml", content),
], "Heading\nBody span text end.\nTab\tthen\nbreak")

# ----------------------------------------------------------------- epub
container = """<?xml version="1.0"?>
<container version="1.0" xmlns="urn:oasis:names:tc:opendocument:xmlns:container">
 <rootfiles><rootfile full-path="OEBPS/content.opf"
  media-type="application/oebps-package+xml"/></rootfiles>
</container>"""
opf = """<?xml version="1.0"?>
<package xmlns="http://www.idpf.org/2007/opf" version="3.0">
 <manifest>
  <item id="ch2" href="ch2.xhtml" media-type="application/xhtml+xml"/>
  <item id="ch1" href="ch1.xhtml" media-type="application/xhtml+xml"/>
  <item id="css" href="style.css" media-type="text/css"/>
 </manifest>
 <spine><itemref idref="ch1"/><itemref idref="ch2"/></spine>
</package>"""
ch1 = """<html xmlns="http://www.w3.org/1999/xhtml"><head>
<title>t</title><style>p { color: red }</style></head>
<body><h1>Chapter One</h1><p>It was a dark and stormy night;
the rain fell in torrents.</p>
<script>var hidden = "should not appear";</script>
<p>Second paragraph.</p></body></html>"""
ch2 = """<html xmlns="http://www.w3.org/1999/xhtml"><body>
<p>Chapter two text with <em>emphasis</em> inline.</p></body></html>"""
write_zip("book.epub", [
    ("mimetype", "application/epub+zip"),
    ("META-INF/container.xml", container),
    # archive order is ch2 first: spine order must win
    ("OEBPS/ch2.xhtml", ch2),
    ("OEBPS/ch1.xhtml", ch1),
    ("OEBPS/style.css", "p { margin: 0 }"),
    ("OEBPS/content.opf", opf),
], "Chapter One\nIt was a dark and stormy night; the rain fell in torrents.\n"
   "Second paragraph.\fChapter two text with emphasis inline.")

print("fixtures ->", os.path.abspath(OUT))
