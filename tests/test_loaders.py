"""Loader plumbing: binaryFile source → converter mapInPandas, file routing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_graph_rag_spark.sources.loaders import (
    convert_binary_documents,
    fetch_url_documents,
    route_files,
)


def _has(mod: str) -> bool:
    import importlib.util

    return importlib.util.find_spec(mod) is not None


def test_route_files_dispatch(spark):
    paths = [
        "https://example.com/page",
        "a/report.PDF",
        "b/doc.docx",
        "c/notes.txt",
        "c/readme.md",
        "d/index.html",
        "e/data.xlsx",
        "f/old.doc",
    ]
    listing = spark.createDataFrame([(p,) for p in paths], "path string")
    kinds = {r.path: r.kind for r in route_files(listing).collect()}
    assert kinds == {
        "https://example.com/page": "url",
        "a/report.PDF": "pdf",
        "b/doc.docx": "docx",
        "c/notes.txt": "text",
        "c/readme.md": "text",
        "d/index.html": "html",
        "e/data.xlsx": "unsupported",
        "f/old.doc": "doc_legacy",  # markitdown-gated: self-describing kind
    }


def test_convert_binary_text_documents(spark, tmp_path):
    (tmp_path / "a.txt").write_text("hello spark")
    (tmp_path / "b.md").write_text("# title\nbody")
    df = spark.read.format("binaryFile").load(str(tmp_path))
    out = {
        r.path.rsplit("/", 1)[-1]: (r.text, r.n_bytes)
        for r in convert_binary_documents(df).collect()
    }
    assert out["a.txt"] == ("hello spark", 11)
    assert out["b.md"][0].startswith("# title")


def test_convert_binary_unsupported_raises(spark, tmp_path):
    # .doc decodes since r14 (sources/ole2.py) — a spreadsheet is now the
    # representative extension no in-container path decodes; the gate must
    # still raise.
    (tmp_path / "x.xlsx").write_bytes(b"PK\x03\x04 fake xlsx")
    df = spark.read.format("binaryFile").load(str(tmp_path))
    if _has("markitdown"):
        pytest.skip("markitdown present; gate branch not reachable")
    with pytest.raises(Exception) as ei:
        convert_binary_documents(df).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_fetch_url_without_libs_raises(spark):
    df = spark.createDataFrame([("https://example.com/a",)], "url string")
    if _has("requests"):
        pytest.skip("requests present; the NotImplementedError gate is unreachable")
    with pytest.raises(Exception) as ei:
        fetch_url_documents(df).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


@pytest.mark.skipif(not _has("markitdown"), reason="markitdown not installed")
def test_convert_binary_real_decode(spark, tmp_path):
    """Activates outside this container: markitdown decodes an HTML doc."""
    (tmp_path / "p.html").write_text("<html><body><p>real decode</p></body></html>")
    df = spark.read.format("binaryFile").load(str(tmp_path))
    out = {r.path.rsplit("/", 1)[-1]: r.text for r in convert_binary_documents(df).collect()}
    assert "real decode" in out["p.html"]


@pytest.mark.skipif(not _has("requests"), reason="requests not installed")
def test_fetch_url_error_capture_without_network(spark):
    """r13: requests IS in this container, so the per-row error-capture
    contract runs here — a guaranteed-unresolvable host is captured as an
    error row, never failing the job (url_fetcher.py:146-149)."""
    df = spark.createDataFrame([("http://invalid.invalid/x",)], "url string")
    rows = fetch_url_documents(df).collect()
    assert rows[0]["text"] is None and "Failed to fetch" in rows[0]["error"]


def test_multiformat_document_roundtrip(spark, tmp_path):
    from tests.conftest import SF_SMOKE
    from vector_graph_rag_spark.sources.formats import read_documents, write_documents
    from vector_graph_rag_spark.sources.tables import load_table

    base = load_table(spark, SF_SMOKE, "documents")
    want = sorted(map(tuple, base.collect()))
    for fmt in ("csv", "json", "orc", "parquet"):
        path = str(tmp_path / f"docs_{fmt}")
        write_documents(base, path, format=fmt)
        got = sorted(map(tuple, read_documents(spark, path, format=fmt).collect()))
        assert got == want, f"round-trip mismatch for {fmt}"

    import pytest

    with pytest.raises(ValueError):
        read_documents(spark, "/nope", format="avro")


def test_load_table_pins_utc_on_foreign_tz_session(spark):
    """An externally created session on a non-UTC zone (explicit or JVM
    default — indistinguishable) gets pinned to UTC with a warning, BEFORE
    any action, so the NTZ→TIMESTAMP cast is value-preserving (ADVICE r4)."""
    import warnings

    from tests.conftest import SF_SMOKE
    from vector_graph_rag_spark.sources.tables import load_table

    baseline = load_table(spark, SF_SMOKE, "events").select("ts").orderBy("event_id").limit(5).collect()
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            df = load_table(spark, SF_SMOKE, "events")
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
        ntz = [c for c, t in df.dtypes if t == "timestamp_ntz"]
        if ntz:  # warning fires only when the file carries NTZ columns
            assert any("pinning" in str(w.message) for w in caught)
        rows = df.select("ts").orderBy("event_id").limit(5).collect()
        assert rows == baseline
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")


# --- stdlib extractors (r13): DOCX / simple-PDF / HTML decode in-container ---


def _make_docx(paragraphs: list[str]) -> bytes:
    """Minimal valid DOCX: the three required zip members, one <w:p> per
    paragraph (tab characters become <w:tab/> runs)."""
    import io
    import zipfile

    W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
    body = []
    for p in paragraphs:
        runs = []
        for i, part in enumerate(p.split("\t")):
            if i:
                runs.append("<w:tab/>")
            runs.append(f'<w:t xml:space="preserve">{part}</w:t>')
        body.append(f"<w:p><w:r>{''.join(runs)}</w:r></w:p>")
    doc = (
        f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<w:document xmlns:w="{W}"><w:body>{"".join(body)}</w:body></w:document>'
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr(
            "[Content_Types].xml",
            '<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
            '<Default Extension="xml" ContentType="application/xml"/>'
            '<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/></Types>',
        )
        z.writestr(
            "_rels/.rels",
            '<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/></Relationships>',
        )
        z.writestr("word/document.xml", doc)
    return buf.getvalue()


def _make_pdf(lines: list[str], compress: bool = True) -> bytes:
    """Minimal valid one-page PDF whose content stream shows each line with
    Tj (last line via a TJ array with kerning, plus escaped parens) —
    Flate-compressed when `compress`, raw otherwise."""
    import zlib

    def esc(s: str) -> str:
        return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")

    ops = ["BT /F1 12 Tf 72 720 Td"]
    for i, line in enumerate(lines):
        if i == len(lines) - 1 and len(lines) > 1:
            ops.append(f"[({esc(line)}) -250 (tail)] TJ")
        else:
            ops.append(f"({esc(line)}) Tj 0 -14 Td")
    ops.append("ET")
    stream = " ".join(ops).encode()
    if compress:
        stream_body, filt = zlib.compress(stream), b"/Filter /FlateDecode "
    else:
        stream_body, filt = stream, b""
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents 4 0 R "
        b"/Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length %d %s>>\nstream\n%s\nendstream" % (len(stream_body), filt, stream_body),
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, o in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + o + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n0000000000 65535 f \n" % (len(objs) + 1)
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_at)
    )
    return bytes(out)


def test_stdlib_docx_extraction_through_spark(spark, tmp_path):
    from vector_graph_rag_spark.sources.loaders import extract_docx_text

    docx = _make_docx(["Hello DOCX world", "second\tparagraph"])
    assert extract_docx_text(docx) == "Hello DOCX world\nsecond\tparagraph"
    if _has("markitdown"):
        pytest.skip("markitdown present; stdlib branch not reachable")
    (tmp_path / "d.docx").write_bytes(docx)
    df = spark.read.format("binaryFile").load(str(tmp_path))
    rows = convert_binary_documents(df).collect()
    assert rows[0]["text"] == "Hello DOCX world\nsecond\tparagraph"


def test_stdlib_pdf_extraction_through_spark(spark, tmp_path):
    from vector_graph_rag_spark.sources.loaders import extract_pdf_text

    lines = ["Simple PDF text", "with (escaped) parens", "and a TJ array"]
    for compress in (True, False):
        pdf = _make_pdf(lines, compress=compress)
        got = extract_pdf_text(pdf)
        for expected in ("Simple PDF text", "with (escaped) parens", "and a TJ arraytail"):
            assert expected in got, (compress, got)
    if _has("markitdown"):
        pytest.skip("markitdown present; stdlib branch not reachable")
    (tmp_path / "p.pdf").write_bytes(_make_pdf(lines))
    df = spark.read.format("binaryFile").load(str(tmp_path))
    rows = convert_binary_documents(df).collect()
    assert "Simple PDF text" in rows[0]["text"]


def test_stdlib_html_extraction_through_spark(spark, tmp_path):
    from vector_graph_rag_spark.sources.loaders import extract_html_text

    html = (
        "<html><head><style>p{color:red}</style><script>var x=1;</script></head>"
        "<body><h1>Title &amp; more</h1><p>first para</p><div>second</div></body></html>"
    )
    assert extract_html_text(html.encode()) == "Title & more\nfirst para\nsecond"
    if _has("markitdown"):
        pytest.skip("markitdown present; stdlib branch not reachable")
    (tmp_path / "h.html").write_text(html)
    df = spark.read.format("binaryFile").load(str(tmp_path))
    rows = convert_binary_documents(df).collect()
    assert rows[0]["text"] == "Title & more\nfirst para\nsecond"


def test_stdlib_mixed_format_batch(spark, tmp_path):
    """One binaryFile scan mixing txt/docx/pdf/html decodes every row in a
    single mapInPandas pass — the multi-format corpus-ingest shape."""
    if _has("markitdown"):
        pytest.skip("markitdown present; stdlib branch not reachable")
    (tmp_path / "a.txt").write_text("plain")
    (tmp_path / "b.docx").write_bytes(_make_docx(["from docx"]))
    (tmp_path / "c.pdf").write_bytes(_make_pdf(["from pdf"]))
    (tmp_path / "d.html").write_text("<p>from html</p>")
    df = spark.read.format("binaryFile").load(str(tmp_path))
    out = {
        r.path.rsplit("/", 1)[-1]: r.text for r in convert_binary_documents(df).collect()
    }
    assert out == {
        "a.txt": "plain",
        "b.docx": "from docx",
        "c.pdf": "from pdf",
        "d.html": "from html",
    }


@pytest.mark.skipif(not _has("requests"), reason="requests not installed")
def test_fetch_url_real_loopback_fetch_and_extract(spark):
    """r13: the URL fetcher runs END-TO-END in this container against a
    loopback HTTP server — requests GETs the page inside the mapInPandas
    batch, the extract half falls back to the stdlib HTML text strip
    (trafilatura absent), a 404 row captures its error without failing the
    job, and an empty page reports 'No content extracted'."""
    import http.server
    import threading

    pages = {
        "/good": "<html><body><h1>Fetched Title</h1><p>fetched body text</p>"
                 "<script>skip()</script></body></html>",
        "/empty": "<html><body><script>only_script()</script></body></html>",
    }

    class _H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path in pages:
                body = pages[self.path].encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self.send_error(404)

        def log_message(self, *a):  # quiet
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), _H)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        df = spark.createDataFrame(
            [(f"http://127.0.0.1:{port}/good",),
             (f"http://127.0.0.1:{port}/empty",),
             (f"http://127.0.0.1:{port}/missing",)],
            "url string",
        )
        rows = {r["url"].rsplit("/", 1)[-1]: r for r in fetch_url_documents(df).collect()}
    finally:
        srv.shutdown()
    assert rows["good"]["error"] is None
    assert rows["good"]["text"] == "Fetched Title\nfetched body text"
    assert rows["empty"]["text"] is None and "No content extracted" in rows["empty"]["error"]
    assert rows["missing"]["text"] is None and "Failed to fetch" in rows["missing"]["error"]


def test_pdf_hex_string_operators():
    """Hex-string text (<48656C6C6F> Tj and hex members inside TJ arrays,
    odd-digit implicit trailing zero per PDF 32000-1 §7.3.4.3) decodes like
    the literal form — many simple-PDF writers emit hex."""
    import zlib

    from vector_graph_rag_spark.sources.loaders import extract_pdf_text

    stream = (
        b"BT /F1 12 Tf 72 720 Td "
        b"<48656C6C6F20686578> Tj 0 -14 Td "          # "Hello hex"
        b"[(lit) <2068 657> ] TJ "                     # 7 digits: implicit trailing 0 -> " hep"
        b"ET"
    )
    body = zlib.compress(stream)
    pdf = (
        b"%%PDF-1.4\n1 0 obj\n<< /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream\nendobj\n"
        b"trailer\n<< /Size 2 >>\n%%%%EOF\n" % (len(body), body)
    )
    got = extract_pdf_text(pdf)
    assert "Hello hex" in got
    assert "lit hep" in got  # "2068657"+implicit 0 -> 0x20 0x68 0x65 0x70


def test_docx_pdf_extractors_roundtrip_property():
    """Property check (fixed seed battery): arbitrary printable paragraphs
    survive the make→extract round trip for BOTH from-scratch formats,
    including parens, backslashes, unicode, and tabs (docx)."""
    import random

    from vector_graph_rag_spark.sources.loaders import (
        extract_docx_text,
        extract_pdf_text,
    )

    rng = random.Random(1337)
    alphabet = "abc XYZ 019 ()\\\\%<>[]{}#&*+-_=;:'\",.?! éü中"
    for trial in range(25):
        paras = [
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 60))).strip()
            or "x"
            for _ in range(rng.randint(1, 5))
        ]
        docx_paras = [p.replace("<", "&lt;").replace(">", "&gt;").replace("&", p and "&amp;") for p in paras]
        # docx: XML-escape via ElementTree-safe build is the writer's job;
        # our minimal writer interpolates raw, so feed XML-safe paragraphs.
        safe = ["".join(c for c in p if c not in "<>&") or "x" for p in paras]
        assert extract_docx_text(_make_docx(safe)) == "\n".join(safe), (trial, safe)
        pdf_lines = [p for p in paras]
        got = extract_pdf_text(_make_pdf(pdf_lines, compress=bool(trial % 2)))
        for line in pdf_lines[:-1] if len(pdf_lines) > 1 else pdf_lines:
            # latin-1 content streams can't carry 中/é exactly; assert the
            # ascii-only lines round-trip verbatim
            if line.isascii():
                assert line in got, (trial, line, got)


def test_pdf_paren_depth_and_line_continuation():
    """r14 (r13-verdict Next #4 + advisor): literal strings with balanced
    UNESCAPED parens extract verbatim via the paren-depth scanner (the old
    regex truncated at the first ')'), backslash-EOL is a line
    continuation where the WHOLE sequence including CRLF is dropped
    (PDF 32000-1 §7.3.4.2), and operands consumed by other operators
    never leak into Tj output."""
    import zlib

    from vector_graph_rag_spark.sources.loaders import (
        _pdf_unescape,
        extract_pdf_text,
    )

    def mkpdf(stream: bytes) -> bytes:
        body = zlib.compress(stream)
        return b"%PDF-1.4\nstream\n" + body + b"\nendstream\n%%EOF"

    s = b"BT /F1 12 Tf 72 720 Td (a (nested (deep)) paren) Tj ET"
    assert extract_pdf_text(mkpdf(s)) == "a (nested (deep)) paren"

    # backslash-EOL continuation: LF, CRLF, and CR forms all vanish
    assert _pdf_unescape(b"ab\\\ncd") == "abcd"
    assert _pdf_unescape(b"ab\\\r\ncd") == "abcd"
    assert _pdf_unescape(b"ab\\\rcd") == "abcd"
    assert extract_pdf_text(mkpdf(b"BT (long \\\r\nline) Tj ET")) == "long line"

    # an operand consumed by a non-show operator clears pending state
    assert extract_pdf_text(mkpdf(b"BT (gone) junkop (kept) Tj ET")) == "kept"

    # dicts, names, comments, stray delimiters don't derail the scanner
    s = b"BT <</K 1>> /Name % comment (not text)\n(real) Tj ) } { ET"
    assert extract_pdf_text(mkpdf(s)) == "real"

    # TJ arrays still mix literal + hex members with kerning numbers
    s = b"BT [(He) -20 (l) 5 <6C6F>] TJ ET"
    assert extract_pdf_text(mkpdf(s)) == "Hello"


def test_extract_main_html_boilerplate_removal():
    """r14: readability-lite main-content extraction — nav/header/footer/
    aside/ad/breadcrumb containers and link-farm blocks are dropped by
    structure + link-density scoring; article prose and headings survive;
    a page that is ALL boilerplate falls back to the full tag-strip
    (safety valve)."""
    from vector_graph_rag_spark.sources.loaders import (
        extract_html_text,
        extract_main_html_text,
    )

    page = b"""<html><body>
    <header class="site-header"><a href="/">Home</a><a href="/about">About</a></header>
    <nav><ul><li><a href="/a">Products</a></li><li><a href="/b">Pricing information</a></li></ul></nav>
    <div class="breadcrumb"><a href="/">Home</a> &gt; <a href="/news">News</a></div>
    <main><article>
    <h1>The Actual Headline of the Article</h1>
    <p>This is the first real paragraph of the article body, long enough to score as content.</p>
    <p>Second paragraph with a single <a href="/ref">reference link</a> inline but mostly prose text around it to keep density low.</p>
    <div class="ad-banner">Buy now! <a href="/buy">Click here</a></div>
    </article></main>
    <aside class="sidebar"><p>Related: <a href="/x">Another story that is quite long indeed</a></p></aside>
    <footer><p>Copyright 2026 Example Corp. All rights reserved. <a href="/tos">Terms</a></p></footer>
    </body></html>"""
    main = extract_main_html_text(page)
    assert "Actual Headline" in main
    assert "first real paragraph" in main and "mostly prose text" in main
    for boiler in ("Products", "Pricing", "Copyright", "Buy now",
                   "Another story", "News", "About"):
        assert boiler not in main, boiler

    plain = b"<html><body><p>Just one short paragraph here.</p></body></html>"
    assert "Just one short paragraph" in extract_main_html_text(plain)

    links = b"<body><p><a href='/1'>one</a></p><p><a href='/2'>two</a></p></body>"
    assert extract_main_html_text(links) == extract_html_text(links)


# --- legacy .doc (r14): OLE2/CFB + MS-DOC piece table -------------------------


def test_doc_extraction_roundtrip_variants():
    """Word 97 .doc fixtures round-trip through the real binary format:
    CP1252 and UTF-16LE text, single- and multi-piece CLX tables, and
    both CFB stream paths (mini stream for small WordDocument, regular
    sectors when it crosses the 4096-byte cutoff)."""
    from vector_graph_rag_spark.sources.ole2 import (
        extract_doc_text,
        make_doc,
        parse_cfb,
    )

    t = "Hello legacy Word.\nSecond paragraph with accents: café naïve.\nEnd."
    for compressed in (True, False):
        for pieces in (1, 3):
            assert extract_doc_text(make_doc(t, compressed=compressed, pieces=pieces)) == t

    t2 = "Unicode: 中文 текст beyond cp1252.\nDone."
    assert extract_doc_text(make_doc(t2, compressed=False, pieces=2)) == t2

    big = ("Long line of text for the big-stream path. " * 200).strip()
    doc = make_doc(big)
    assert len(parse_cfb(doc)["WordDocument"]) >= 4096  # regular sectors
    assert extract_doc_text(doc).startswith("Long line of text")

    import pytest as _pytest

    with _pytest.raises(ValueError, match="OLE2"):
        extract_doc_text(b"\xd0\xcf\x11\xe0 truncated junk")


def test_doc_through_spark_converter(spark, tmp_path):
    """.doc rides the binaryFile → mapInPandas converter like every other
    format; a corrupt OLE2 file becomes a per-row decode error."""
    from vector_graph_rag_spark.sources.ole2 import make_doc

    (tmp_path / "legacy.doc").write_bytes(
        make_doc("ant bites bee bee stings cat cat chases dog end")
    )
    (tmp_path / "broken.doc").write_bytes(b"\xd0\xcf\x11\xe0 not a real cfb")
    df = spark.read.format("binaryFile").load(str(tmp_path))
    rows = {r.path.rsplit("/", 1)[-1]: r for r in convert_binary_documents(df).collect()}
    assert rows["legacy.doc"].text.startswith("ant bites bee")
    assert rows["broken.doc"].text is None
    assert "ValueError" in rows["broken.doc"].error


def test_doc_v4_4096_byte_sectors():
    """Major-version-4 CFB (4096-byte sectors): sector 0 begins at byte
    4096, not 512+n*4096 — MS-CFB §2.1 (r14 advisor item).  Round trip
    through the real v4 container, both encodings, multi-piece."""
    from vector_graph_rag_spark.sources.ole2 import extract_doc_text, make_doc

    t = "V4 container text.\nSecond paragraph: café."
    for compressed in (True, False):
        doc = make_doc(t, compressed=compressed, pieces=2, sector_size=4096)
        assert doc[26:28] == b"\x04\x00"  # major version 4
        assert extract_doc_text(doc) == t


def test_encrypted_doc_is_per_row_data_error(spark, tmp_path):
    """fEncrypted is a property of the file DATA, not of this container's
    capabilities (r14 advisor, medium): extract_doc_text raises ValueError
    and the converter captures it per-row — one encrypted file must not
    fail the batch."""
    import struct

    import pytest as _pytest

    from vector_graph_rag_spark.sources.ole2 import (
        _make_cfb,
        extract_doc_text,
        make_doc,
        parse_cfb,
    )

    plain = make_doc("readable text survives the batch")
    streams = parse_cfb(plain)
    wd = bytearray(streams["WordDocument"])
    struct.pack_into("<H", wd, 0x0A, 0x0100)  # set fEncrypted
    encrypted = _make_cfb({"WordDocument": bytes(wd), "0Table": streams["0Table"]})
    with _pytest.raises(ValueError, match="fEncrypted"):
        extract_doc_text(encrypted)

    (tmp_path / "plain.doc").write_bytes(plain)
    (tmp_path / "enc.doc").write_bytes(encrypted)
    df = spark.read.format("binaryFile").load(str(tmp_path))
    rows = {r.path.rsplit("/", 1)[-1]: r for r in convert_binary_documents(df).collect()}
    assert rows["plain.doc"].text == "readable text survives the batch"
    assert rows["enc.doc"].text is None
    assert "fEncrypted" in rows["enc.doc"].error


def test_pdf_dict_body_strings_do_not_leak():
    """String-valued dict entries (e.g. /ActualText in a BDC property
    list) are operands of the dict, not show-text: balanced << … >>
    bodies are skipped wholesale (r14 advisor item) — including nested
    dicts, parens and hex strings inside them."""
    from vector_graph_rag_spark.sources.loaders import (
        _pdf_skip_dict,
        extract_pdf_text,
    )

    def _mkpdf(stream: bytes) -> bytes:
        return (
            b"%PDF-1.4\n1 0 obj\n<< /Length "
            + str(len(stream)).encode()
            + b" >>\nstream\n"
            + stream
            + b"\nendstream\nendobj\n"
        )

    # the advisor's exact scenario: dict string followed by a text operator
    got = extract_pdf_text(
        _mkpdf(b"/Span << /ActualText (LEAK) >> BDC BT (real) Tj ET EMC")
    )
    assert got == "real"

    # dict string then a malformed Tj with NO operand: nothing leaks
    got = extract_pdf_text(_mkpdf(b"/Span << /Alt (boiler) >> BDC Tj (ok) Tj"))
    assert got == "ok"

    s = b"<< /A << /B (x(y)z) /C <414243> >> /D [1 2] % c\n >> tail"
    assert s[_pdf_skip_dict(s, 0) :] == b" tail"


def _make_cid_pdf(text: str, use_tj_array: bool = False) -> bytes:
    """One-page PDF showing `text` through an Identity-H Type0 font whose
    ToUnicode CMap is a bfchar table over synthetic 2-byte CIDs."""
    codes = {ch: 0x100 + i for i, ch in enumerate(sorted(set(text)))}
    hexstr = "".join(f"{codes[ch]:04X}" for ch in text)
    bfchar = "\n".join(
        f"<{codes[ch]:04X}> <{ord(ch):04X}>" for ch in sorted(set(text))
    )
    cmap = (
        "/CIDInit /ProcSet findresource begin\n"
        "12 dict begin begincmap\n"
        "1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
        f"{len(codes)} beginbfchar\n{bfchar}\nendbfchar\n"
        "endcmap CMapName currentdict /CMap defineresource pop end end"
    ).encode()
    if use_tj_array:
        half = (len(text) // 2) * 4  # char boundary: 4 hex digits per CID
        show = f"[<{hexstr[:half]}> -250 <{hexstr[half:]}>] TJ"
    else:
        show = f"<{hexstr}> Tj"
    stream = f"BT /F9 12 Tf 72 720 Td {show} ET".encode()
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
        b"/Resources << /Font << /F9 5 0 R >> >> >>",
        b"<< /Length %d >>\nstream\n%s\nendstream" % (len(stream), stream),
        b"<< /Type /Font /Subtype /Type0 /BaseFont /Fake-Identity-H "
        b"/Encoding /Identity-H /ToUnicode 6 0 R >>",
        b"<< /Length %d >>\nstream\n%s\nendstream" % (len(cmap), cmap),
    ]
    out = bytearray(b"%PDF-1.4\n")
    for i, o in enumerate(objs, start=1):
        out += b"%d 0 obj\n" % i + o + b"\nendobj\n"
    out += b"trailer\n<< /Size 7 /Root 1 0 R >>\n"
    return bytes(out)


def test_pdf_cid_tounicode_extraction():
    """CID/Type0 text with a ToUnicode CMap extracts verbatim (r14
    verdict, Next #7) — via Tj hex strings and TJ arrays, including
    non-latin destination code points; a font WITHOUT a CMap still falls
    through to the raw path."""
    from vector_graph_rag_spark.sources.loaders import extract_pdf_text

    assert extract_pdf_text(_make_cid_pdf("Hello CID world")) == "Hello CID world"
    assert extract_pdf_text(_make_cid_pdf("ab cd", use_tj_array=True)) == "ab cd"
    assert extract_pdf_text(_make_cid_pdf("中文 mixed")) == "中文 mixed"
    # simple fonts in the same file keep the raw latin-1 path
    assert "Simple PDF text" in extract_pdf_text(_make_pdf(["Simple PDF text"]))


def test_parse_tounicode_cmap_forms():
    """bfrange increment form, bfrange array form, bfchar pairs, and
    codespacerange width detection (PDF 32000-1 §9.10.3)."""
    from vector_graph_rag_spark.sources.loaders import (
        _apply_cmap,
        _parse_tounicode_cmap,
    )

    data = (
        b"1 begincodespacerange <0000> <FFFF> endcodespacerange\n"
        b"1 beginbfrange <0041> <0043> <0061> endbfrange\n"
        b"1 beginbfrange <0050> <0051> [<0058> <0059>] endbfrange\n"
        b"1 beginbfchar <0001> <00480069> endbfchar"
    )
    cmap, ranges = _parse_tounicode_cmap(data)
    assert ranges == [(2, 0x0000, 0xFFFF)]
    assert [cmap[c] for c in (0x41, 0x42, 0x43, 0x50, 0x51)] == list("abcXY")
    assert cmap[0x0001] == "Hi"  # multi-code-unit destination
    # raw 2-byte codes map through; unmapped multi-byte CIDs still drop
    # (a CID has no latin-1 identity — raw bytes would be garbage)
    assert _apply_cmap("\x00\x41\x00\x50\x7f\x7f", cmap, ranges) == "aX"


def test_apply_cmap_mixed_width_and_raw_fallback():
    """r15 ADVICE regressions: (1) mixed-width codespaceranges consume
    each code at its own range's width (prefix matching, §9.7.6.2) —
    not one collapsed max width; (2) a PARTIAL CMap over a 1-byte font
    falls back to the raw latin-1 character for unmapped codes instead
    of dropping/shifting the text; (3) bytes outside every codespace
    range pass through raw one at a time."""
    from vector_graph_rag_spark.sources.loaders import (
        _apply_cmap,
        _parse_tounicode_cmap,
    )

    # Shift-JIS-like layout: 1-byte <00>-<7F>, 2-byte <8140>-<FCFC>
    data = (
        b"2 begincodespacerange <00> <7F> <8140> <FCFC> endcodespacerange\n"
        b"2 beginbfchar <41> <0058> <8140> <4E2D> endbfchar"
    )
    cmap, ranges = _parse_tounicode_cmap(data)
    assert ranges == [(1, 0x00, 0x7F), (2, 0x8140, 0xFCFC)]
    # A(1-byte, mapped)  0x8140(2-byte, mapped)  B(1-byte, UNmapped→raw)
    assert _apply_cmap("\x41\x81\x40\x42", cmap, ranges) == "X中B"
    # 0x8150: inside the 2-byte range but unmapped → dropped (CID);
    # 0xFE: outside every range → raw byte passthrough
    assert _apply_cmap("\x81\x50\xfe", cmap, ranges) == "\xfe"

    # Partial 1-byte CMap: the unmapped tail stays readable
    data1 = (
        b"1 begincodespacerange <00> <FF> endcodespacerange\n"
        b"1 beginbfchar <41> <005A> endbfchar"
    )
    cmap1, ranges1 = _parse_tounicode_cmap(data1)
    assert _apply_cmap("A plain tail", cmap1, ranges1) == "Z plain tail"


def test_pdf_cid_font_inside_object_stream():
    """PDF 1.5+ packs non-stream objects into /ObjStm containers — the
    compressed-xref layout modern writers emit.  A CID font dict living
    inside an ObjStm must still resolve to its ToUnicode CMap (the CMap
    stream itself stays a regular object: streams cannot live in object
    streams, §7.5.7)."""
    import zlib

    from vector_graph_rag_spark.sources.loaders import extract_pdf_text

    text = "ObjStm CID"
    codes = {ch: 0x200 + i for i, ch in enumerate(sorted(set(text)))}
    hexstr = "".join(f"{codes[ch]:04X}" for ch in text)
    bfchar = "\n".join(
        f"<{codes[ch]:04X}> <{ord(ch):04X}>" for ch in sorted(set(text))
    )
    cmap = (
        "1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
        f"{len(codes)} beginbfchar\n{bfchar}\nendbfchar"
    ).encode()
    stream = f"BT /F9 12 Tf 72 720 Td <{hexstr}> Tj ET".encode()

    # the font dict is object 5, packed inside ObjStm object 7
    font_body = (
        b"<< /Type /Font /Subtype /Type0 /Encoding /Identity-H "
        b"/ToUnicode 6 0 R >>"
    )
    pad_body = b"<< /Dummy true >>"
    header = b"4 0 5 %d" % (len(pad_body) + 1)
    first = len(header) + 1
    objstm_data = header + b" " + pad_body + b" " + font_body
    objstm_z = zlib.compress(objstm_data)

    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
           b"/Resources << /Font << /F9 5 0 R >> >> >>",
        4: b"<< /Length %d >>\nstream\n%s\nendstream" % (len(stream), stream),
        6: b"<< /Length %d >>\nstream\n%s\nendstream" % (len(cmap), cmap),
        7: b"<< /Type /ObjStm /N 2 /First %d /Length %d "
           b"/Filter /FlateDecode >>\nstream\n%s\nendstream"
           % (first, len(objstm_z), objstm_z),
    }
    out = bytearray(b"%PDF-1.5\n")
    for num, body in objs.items():
        out += b"%d 0 obj\n" % num + body + b"\nendobj\n"
    assert extract_pdf_text(bytes(out)) == "ObjStm CID"


def test_pdf_font_resources_inside_object_stream():
    """r15 ADVICE regression: the common PDF 1.5+ layout packs the PAGE
    dict — whose /Resources /Font fragment names the fonts — inside an
    /ObjStm container.  The /Font resource scan must cover the expanded
    member bodies, not just the raw file bytes, or the font never binds
    to its ToUnicode CMap and CID text comes out garbled/empty."""
    import zlib

    from vector_graph_rag_spark.sources.loaders import extract_pdf_text

    text = "Packed page"
    codes = {ch: 0x300 + i for i, ch in enumerate(sorted(set(text)))}
    hexstr = "".join(f"{codes[ch]:04X}" for ch in text)
    bfchar = "\n".join(
        f"<{codes[ch]:04X}> <{ord(ch):04X}>" for ch in sorted(set(text))
    )
    cmap = (
        "1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
        f"{len(codes)} beginbfchar\n{bfchar}\nendbfchar"
    ).encode()
    stream = f"BT /F9 12 Tf 72 720 Td <{hexstr}> Tj ET".encode()

    # The PAGE dict (object 3, carrying the /Font resource) lives inside
    # ObjStm object 7; font dict 5 rides along in the same container.
    page_body = (
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
        b"/Resources << /Font << /F9 5 0 R >> >> >>"
    )
    font_body = (
        b"<< /Type /Font /Subtype /Type0 /Encoding /Identity-H "
        b"/ToUnicode 6 0 R >>"
    )
    header = b"3 0 5 %d" % (len(page_body) + 1)
    first = len(header) + 1
    objstm_data = header + b" " + page_body + b" " + font_body
    objstm_z = zlib.compress(objstm_data)

    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        4: b"<< /Length %d >>\nstream\n%s\nendstream" % (len(stream), stream),
        6: b"<< /Length %d >>\nstream\n%s\nendstream" % (len(cmap), cmap),
        7: b"<< /Type /ObjStm /N 2 /First %d /Length %d "
           b"/Filter /FlateDecode >>\nstream\n%s\nendstream"
           % (first, len(objstm_z), objstm_z),
    }
    out = bytearray(b"%PDF-1.5\n")
    for num, body in objs.items():
        out += b"%d 0 obj\n" % num + body + b"\nendobj\n"
    assert extract_pdf_text(bytes(out)) == "Packed page"


def test_pdf_malformed_cmap_and_objstm_degrade_not_crash():
    """Hostile/corrupt metadata degrades instead of failing the document:
    (1) a bfrange whose increment would run past U+10FFFF stops at the
    boundary and keeps every in-range mapping; (2) an ObjStm whose header
    is junk is simply not expanded; extraction of the rest continues."""
    from vector_graph_rag_spark.sources.loaders import (
        _parse_tounicode_cmap,
        extract_pdf_text,
    )

    # (1) dst starts 2 below the ceiling, range spans 10 codes: the first
    # three map (10FFFD..10FFFF), the overflow tail is dropped.
    data = (b"1 beginbfrange <0000> <0009> <DBFFDFFD> endbfrange")
    cmap, _ranges = _parse_tounicode_cmap(data)
    assert cmap[0x0000] == "\U0010fffd" and cmap[0x0002] == "\U0010ffff"
    assert 0x0003 not in cmap and len(cmap) == 3

    # (2) junk ObjStm header: the container is skipped, the plain-text
    # content stream still extracts.
    stream = b"BT (still works) Tj ET"
    junk = b"not numbers at all"
    objs = [
        b"<< /Length %d >>\nstream\n%s\nendstream" % (len(stream), stream),
        b"<< /Type /ObjStm /N 3 /First %d /Length %d >>\nstream\n%s\nendstream"
        % (len(junk), len(junk), junk),
        b"<< /ToUnicode 9 0 R >>",  # forces the font-cmap walk to run
    ]
    out = bytearray(b"%PDF-1.5\n")
    for i, o in enumerate(objs, start=1):
        out += b"%d 0 obj\n" % i + o + b"\nendobj\n"
    assert extract_pdf_text(bytes(out)) == "still works"


def _make_truetype_cmap4(uni_to_gid: dict) -> bytes:
    """Minimal sfnt containing ONE table: a format-4 'cmap' (3,1) whose
    segments map each codepoint to its glyph id — the fixture for the
    no-ToUnicode fallback."""
    import struct

    items = sorted(uni_to_gid.items())
    segs = [(u, u, (g - u) & 0xFFFF) for u, g in items] + [(0xFFFF, 0xFFFF, 1)]
    n = len(segs)
    sub = struct.pack(
        ">HHHHHHH", 4, 16 + 8 * n + 2, 0, 2 * n, 0, 0, 0
    )
    sub += struct.pack(f">{n}H", *[e for _s, e, _d in segs])
    sub += b"\x00\x00"  # reservedPad
    sub += struct.pack(f">{n}H", *[s for s, _e, _d in segs])
    sub += struct.pack(f">{n}H", *[d for _s, _e, d in segs])
    sub += struct.pack(f">{n}H", *([0] * n))  # idRangeOffset
    cmap = struct.pack(">HH", 0, 1) + struct.pack(">HHI", 3, 1, 12) + sub
    header = struct.pack(">IHHHH", 0x00010000, 1, 0, 0, 0)
    record = struct.pack(">4sIII", b"cmap", 0, 28, len(cmap))
    return header + record + cmap


def _make_no_tounicode_cid_pdf(text: str, cid_of, font_extra: bytes,
                               extra_objs: list) -> bytes:
    hexstr = "".join(f"{cid_of(ch):04X}" for ch in text)
    stream = f"BT /F9 12 Tf 72 720 Td <{hexstr}> Tj ET".encode()
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
        b"/Resources << /Font << /F9 5 0 R >> >> >>",
        b"<< /Length %d >>\nstream\n%s\nendstream" % (len(stream), stream),
        b"<< /Type /Font /Subtype /Type0 /Encoding /Identity-H "
        b"/DescendantFonts [6 0 R] >>",
        b"<< /Type /Font /Subtype /CIDFontType2 /FontDescriptor 7 0 R "
        + font_extra + b" >>",
        b"<< /Type /FontDescriptor /FontFile2 8 0 R >>",
        *extra_objs,
    ]
    out = bytearray(b"%PDF-1.4\n")
    for i, o in enumerate(objs, start=1):
        out += b"%d 0 obj\n" % i + o + b"\nendobj\n"
    out += b"trailer\n<< /Size %d /Root 1 0 R >>\n" % (len(objs) + 1)
    return bytes(out)


def test_pdf_no_tounicode_cid_via_embedded_truetype_cmap():
    """r16: a Type0/CIDFontType2 font WITHOUT /ToUnicode — previously the
    documented garbled-output limit — now decodes by reversing the
    embedded TrueType's own cmap table (unicode→GID inverted, composed
    with CIDToGIDMap), the pdfminer/PyMuPDF recovery path.  Covers both
    the /Identity default (CID == GID) and the 2-byte-per-CID stream
    form of /CIDToGIDMap."""
    from vector_graph_rag_spark.sources.loaders import extract_pdf_text

    text = "NoToUni works"
    gid_of = {ch: 0x30 + i for i, ch in enumerate(sorted(set(text)))}
    font = _make_truetype_cmap4({ord(ch): g for ch, g in gid_of.items()})
    font_obj = b"<< /Length %d >>\nstream\n%s\nendstream" % (len(font), font)

    # Identity CIDToGIDMap: show-string CIDs ARE the glyph ids
    pdf = _make_no_tounicode_cid_pdf(
        text, lambda ch: gid_of[ch], b"/CIDToGIDMap /Identity", [font_obj]
    )
    assert extract_pdf_text(pdf) == text

    # Stream CIDToGIDMap: cid = gid - 7, mapped through a 2-byte stream
    max_cid = max(gid_of.values()) - 7
    c2g = bytearray()
    for cid in range(max_cid + 1):
        g = cid + 7
        c2g += bytes([(g >> 8) & 0xFF, g & 0xFF])
    c2g_obj = b"<< /Length %d >>\nstream\n%s\nendstream" % (len(c2g), bytes(c2g))
    pdf2 = _make_no_tounicode_cid_pdf(
        text, lambda ch: gid_of[ch] - 7, b"/CIDToGIDMap 9 0 R",
        [font_obj, c2g_obj],
    )
    assert extract_pdf_text(pdf2) == text

    # a corrupt font program degrades to the old behavior, never a crash
    bad_font_obj = b"<< /Length 9 >>\nstream\nnot a ttf\nendstream"
    pdf3 = _make_no_tounicode_cid_pdf(
        text, lambda ch: gid_of[ch], b"/CIDToGIDMap /Identity", [bad_font_obj]
    )
    assert isinstance(extract_pdf_text(pdf3), str)


def test_pdf_simple_truetype_not_hijacked_by_cid_fallback():
    """r17 (r16 ADVICE, high): a SIMPLE (non-Type0) TrueType font without
    /ToUnicode must NOT trigger the CID fallback, even when the file also
    carries an /ObjStm token (any PDF 1.5+) that opens the object-graph
    walk: its show-strings are 1-byte codes, and consuming them pairwise
    as bogus CIDs drops the text ("Hello World" came out "d").  The
    fallback now requires a real Type0/CID declaration — /DescendantFonts
    or an inline /Subtype /CIDFontType2 — so simple fonts stay on the raw
    latin-1 path."""
    from vector_graph_rag_spark.sources.loaders import extract_pdf_text

    text = "Hello World"
    font = _make_truetype_cmap4(
        {ord(ch): 0x30 + i for i, ch in enumerate(sorted(set(text)))}
    )
    stream = b"BT /F9 12 Tf 72 720 Td (Hello World) Tj ET"
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
        b"/Resources << /Font << /F9 5 0 R >> >> >>",
        b"<< /Length %d >>\nstream\n%s\nendstream" % (len(stream), stream),
        # simple TrueType: /FontDescriptor present, NO DescendantFonts,
        # NO ToUnicode — the ADVICE repro shape
        b"<< /Type /Font /Subtype /TrueType /BaseFont /F1 "
        b"/FontDescriptor 6 0 R >>",
        b"<< /Type /FontDescriptor /FontFile2 7 0 R >>",
        b"<< /Length %d >>\nstream\n%s\nendstream" % (len(font), font),
        # an empty-but-valid object stream: its mere presence opens the
        # CID object-graph walk
        b"<< /Type /ObjStm /N 0 /First 0 /Length 0 >>\nstream\n\nendstream",
    ]
    out = bytearray(b"%PDF-1.5\n")
    for i, o in enumerate(objs, start=1):
        out += b"%d 0 obj\n" % i + o + b"\nendobj\n"
    out += b"trailer\n<< /Size %d /Root 1 0 R >>\n" % (len(objs) + 1)
    assert extract_pdf_text(bytes(out)) == text


def test_truetype_cmap_hostile_segment_flood_bounded():
    """r17 (r16 ADVICE, low): a hostile font declaring thousands of
    overlapping 0..0xFFFF format-4 segments must not cost billions of
    iterations — the reverse-cmap walk carries a global work budget and
    bails once the BMP-sized map is full.  The call must return (quickly)
    rather than hang; correctness of the prefix it keeps is still pinned
    by the first-binding rule."""
    import struct
    import time

    from vector_graph_rag_spark.sources.loaders import _truetype_gid_to_unicode

    # 4000 segments, each spanning the full BMP
    n = 4000
    segs = [(0, 0xFFFE, 1)] * (n - 1) + [(0xFFFF, 0xFFFF, 1)]
    sub = struct.pack(">HHHHHHH", 4, 16 + 8 * n + 2, 0, 2 * n, 0, 0, 0)
    sub += struct.pack(f">{n}H", *[e for _s, e, _d in segs])
    sub += b"\x00\x00"
    sub += struct.pack(f">{n}H", *[s for s, _e, _d in segs])
    sub += struct.pack(f">{n}H", *[d for _s, _e, d in segs])
    sub += struct.pack(f">{n}H", *([0] * n))
    cmap = struct.pack(">HH", 0, 1) + struct.pack(">HHI", 3, 1, 12) + sub
    header = struct.pack(">IHHHH", 0x00010000, 1, 0, 0, 0)
    record = struct.pack(">4sIII", b"cmap", 0, 28, len(cmap))
    t0 = time.monotonic()
    out = _truetype_gid_to_unicode(header + record + cmap)
    assert time.monotonic() - t0 < 10.0, "segment flood not bounded"
    assert isinstance(out, dict)


def test_pdf_extractor_corrupt_streams_never_raise():
    """extract_pdf_text's contract is graceful degradation: ANY byte
    corruption yields a (possibly empty/partial) string, never an
    exception (r16 fuzz pass — 5000 seeded mutations over simple, CID,
    and no-ToUnicode-TrueType fixtures; the one hole found was non-hex
    garbage inside <…> hex show-strings escaping bytes.fromhex)."""
    import random

    from vector_graph_rag_spark.sources.loaders import extract_pdf_text

    text = "Fuzz target text"
    gid_of = {ch: 0x30 + i for i, ch in enumerate(sorted(set(text)))}
    font = _make_truetype_cmap4({ord(ch): g for ch, g in gid_of.items()})
    font_obj = b"<< /Length %d >>\nstream\n%s\nendstream" % (len(font), font)
    fixtures = [
        _make_cid_pdf("Hello CID world"),
        _make_no_tounicode_cid_pdf(
            text, lambda ch: gid_of[ch], b"/CIDToGIDMap /Identity", [font_obj]
        ),
        _make_pdf(["plain text line", "another line"]),
    ]
    rng = random.Random(99)
    for _ in range(400):
        s = bytearray(rng.choice(fixtures))
        op = rng.random()
        if op < 0.4:
            i = rng.randrange(len(s))
            s[i] = rng.randrange(256)
        elif op < 0.7:
            s = s[: rng.randrange(2, len(s))]
        else:
            for _ in range(rng.randrange(1, 10)):
                i = rng.randrange(len(s))
                s[i] = rng.randrange(256)
        assert isinstance(extract_pdf_text(bytes(s)), str)
