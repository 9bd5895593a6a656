"""Document loaders: chunker, file-type router, converter/fetcher stubs.

- TextChunker parity (reference loaders/chunker.py:17-98): greedy packing on
  the FIRST separator present in the text (priority "\\n\\n", "\\n", ". ",
  " "), chunk_size=1000 / overlap=200, character-window fallback both for
  separator-free text and for single parts longer than chunk_size; texts
  within chunk_size pass through unchunked.  The kernel is a pure Python
  function (unit-testable) wrapped in an Arrow-batched pandas UDF; 1→N
  expansion is `posexplode` — the UDTF-shaped pattern from SURVEY §2.2.

- File-type router (reference loaders/__init__.py:52-143): dispatch by
  extension over a file-listing DataFrame with when/otherwise.

- PDF/DOCX converter and URL fetcher (converter.py:45-90,
  url_fetcher.py:91-155): real Spark plumbing (binary source → mapInPandas
  batch iterator → text column) with the decode step behind an import-try:
  markitdown / requests+trafilatura activate when importable, and degrade
  to NotImplementedError otherwise (neither lib nor network exists in this
  container — sanctioned by the task brief).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SEPARATORS = ["\n\n", "\n", ". ", " "]


def chunk_text(
    text: str,
    chunk_size: int = 1000,
    chunk_overlap: int = 200,
    separators: list[str] | None = None,
) -> list[str]:
    """Pure-Python chunking kernel, behavior-equivalent to the reference
    TextChunker (chunker.py:57-98)."""
    seps = separators or DEFAULT_SEPARATORS
    if len(text) <= chunk_size:
        return [text]

    step = chunk_size - chunk_overlap
    sep = next((s for s in seps if s in text), None)
    if sep is None:
        # Character-window fallback.
        return [text[i : i + chunk_size] for i in range(0, len(text), step)]

    chunks: list[str] = []
    current = ""
    for part in text.split(sep):
        candidate = current + sep + part if current else part
        if len(candidate) <= chunk_size:
            current = candidate
            continue
        if current:
            chunks.append(current)
        if len(part) > chunk_size:
            # Oversized part: character windows, and the running chunk resets.
            chunks.extend(part[i : i + chunk_size] for i in range(0, len(part), step))
            current = ""
        else:
            current = part
    if current:
        chunks.append(current)
    return chunks


def chunk_documents(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 1000,
    chunk_overlap: int = 200,
) -> DataFrame:
    """docs → one row per chunk: (id_col, chunk_index, total_chunks, chunk).

    Matches TextChunker.chunk metadata stamping (chunker.py:36-48).
    """

    @F.pandas_udf("array<string>")
    def _chunks(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: chunk_text(t or "", chunk_size, chunk_overlap)
        )

    with_chunks = docs.withColumn("__chunks", _chunks(F.col(text_col)))
    return with_chunks.select(
        id_col,
        F.size("__chunks").alias("total_chunks"),
        F.posexplode("__chunks").alias("chunk_index", "chunk"),
    ).select(id_col, "chunk_index", "total_chunks", "chunk")


SUPPORTED_EXTENSIONS = [".pdf", ".docx", ".doc", ".txt", ".md", ".html", ".htm"]


def route_files(listing: DataFrame, path_col: str = "path") -> DataFrame:
    """File-type router (loaders/__init__.py:52-143): adds `kind` in
    {url, pdf, docx, doc_legacy, text, html, unsupported}.  Legacy `.doc`
    (OLE2) keeps its own kind: it rides a DIFFERENT decode path (the
    sources/ole2.py CFB + piece-table extractor since r14; markitdown
    when importable) and downstream may want to track the legacy format
    separately."""
    p = F.lower(F.col(path_col))
    kind = (
        F.when(p.startswith("http://") | p.startswith("https://"), "url")
        .when(p.endswith(".pdf"), "pdf")
        .when(p.endswith(".docx"), "docx")
        .when(p.endswith(".doc"), "doc_legacy")
        .when(p.endswith(".txt") | p.endswith(".md"), "text")
        .when(p.endswith(".html") | p.endswith(".htm"), "html")
        .otherwise("unsupported")
    )
    return listing.withColumn("kind", kind)


# --- stdlib document extractors (r13) ----------------------------------------
#
# "Requires markitdown" overstated the converter gap: DOCX is a zip of XML
# (zipfile + xml.etree), HTML strips to text with html.parser, and simple
# PDFs (standard fonts, Flate or plain content streams — exactly what
# office exports and our fixture writer produce) parse with zlib + the
# Tj/TJ text-showing operators.  markitdown still takes PRIORITY when
# importable (it handles the long tail: CID fonts, tables, images); these
# run as the in-container fallback so .docx/.pdf/.html decode is REAL here,
# not a NotImplementedError.  Legacy .doc decodes too since r14
# (sources/ole2.py: CFB reader + MS-DOC piece table).


def extract_docx_text(content: bytes) -> str:
    """DOCX → text via the stdlib: unzip word/document.xml, walk paragraph
    nodes, join runs' <w:t> text (tabs/breaks → whitespace), paragraphs →
    newlines.  No external library."""
    import io
    import xml.etree.ElementTree as ET
    import zipfile

    ns = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
    with zipfile.ZipFile(io.BytesIO(content)) as z:
        root = ET.fromstring(z.read("word/document.xml"))
    paras = []
    for p in root.iter(f"{ns}p"):
        parts = []
        for node in p.iter():
            if node.tag == f"{ns}t" and node.text:
                parts.append(node.text)
            elif node.tag in (f"{ns}tab", f"{ns}br"):
                parts.append("\t" if node.tag == f"{ns}tab" else "\n")
        paras.append("".join(parts))
    return "\n".join(paras)


def extract_html_text(content: bytes) -> str:
    """HTML → visible text via html.parser: tag strip, script/style
    dropped, block-level tags become newlines."""
    from html.parser import HTMLParser

    class _Text(HTMLParser):
        _SKIP = {"script", "style"}
        _BLOCK = {"p", "div", "br", "li", "tr", "h1", "h2", "h3", "h4", "h5", "h6"}

        def __init__(self):
            super().__init__(convert_charrefs=True)
            self.out: list[str] = []
            self._skip_depth = 0

        def handle_starttag(self, tag, attrs):
            if tag in self._SKIP:
                self._skip_depth += 1
            elif tag in self._BLOCK:
                self.out.append("\n")

        def handle_endtag(self, tag):
            if tag in self._SKIP and self._skip_depth:
                self._skip_depth -= 1
            elif tag in self._BLOCK:
                self.out.append("\n")

        def handle_data(self, data):
            if not self._skip_depth:
                self.out.append(data)

    p = _Text()
    p.feed(content.decode("utf-8", errors="replace"))
    p.close()
    lines = [ln.strip() for ln in "".join(p.out).split("\n")]
    return "\n".join(ln for ln in lines if ln)


_BOILER_RE = None  # compiled lazily


def extract_main_html_text(content: bytes) -> str:
    """Main-content HTML extraction (readability-lite, stdlib-only) — the
    quality gap between tag-stripping and trafilatura for URL ingestion:

    1. structural boilerplate containers are dropped wholesale (nav,
       header, footer, aside, form + elements whose class/id/role matches
       the classic boilerplate vocabulary: menu, sidebar, comment, ad,
       banner, breadcrumb, …);
    2. the remaining text is segmented into blocks at block-level tags,
       each scored by length and LINK DENSITY (chars inside <a> / chars);
       content blocks (≥25 chars, link density ≤ 1/3) and low-link
       headings are kept, link-farm blocks dropped.

    Safety valve: if the kept text is implausibly small relative to the
    full tag-strip (<20% and <200 chars), fall back to
    :func:`extract_html_text` — a page that is all boilerplate by these
    heuristics is better over-extracted than emptied."""
    import re
    from html.parser import HTMLParser

    global _BOILER_RE
    if _BOILER_RE is None:
        _BOILER_RE = re.compile(
            r"(?:^|[-_ ])(?:nav|menu|sidebar|side-bar|footer|header|comment|"
            r"banner|ad|ads|advert\w*|breadcrumb|social|share|related|promo|"
            r"cookie|popup|modal)(?:$|[-_ ])",
            re.IGNORECASE,
        )

    DROP = {"script", "style", "nav", "header", "footer", "aside", "form",
            "noscript", "svg", "button", "select", "iframe"}
    BLOCK = {"p", "li", "h1", "h2", "h3", "h4", "h5", "h6", "pre",
             "blockquote", "td", "dd", "dt", "figcaption", "div", "section",
             "article", "main", "tr", "br", "ul", "ol", "table"}
    VOID = {"br", "img", "hr", "input", "meta", "link"}
    HEADING = {"h1", "h2", "h3", "h4", "h5", "h6"}

    class _Blocks(HTMLParser):
        def __init__(self):
            super().__init__(convert_charrefs=True)
            self.stack: list[tuple[str, bool]] = []  # (tag, dropped)
            self.drop_depth = 0
            self.link_depth = 0
            self.blocks: list[tuple[str, int, bool]] = []  # text, link_chars, heading
            self._buf: list[str] = []
            self._link_chars = 0
            self._heading = False

        def _flush(self):
            text = "".join(self._buf).strip()
            if text:
                self.blocks.append((text, self._link_chars, self._heading))
            self._buf = []
            self._link_chars = 0
            self._heading = False

        def handle_starttag(self, tag, attrs):
            if tag in VOID:
                if tag == "br":
                    self._flush()
                return
            attrd = dict(attrs)
            blob = " ".join(
                str(attrd.get(k) or "") for k in ("class", "id", "role")
            )
            dropped = tag in DROP or bool(_BOILER_RE.search(blob)) or (
                attrd.get("role") in ("navigation", "banner", "contentinfo")
            )
            if tag in BLOCK:
                self._flush()
                if tag in HEADING and not dropped:
                    self._heading = True
            if tag == "a":
                self.link_depth += 1
            self.stack.append((tag, dropped))
            if dropped:
                self.drop_depth += 1

        def handle_endtag(self, tag):
            if tag in VOID:
                return
            if tag == "a" and self.link_depth:
                self.link_depth -= 1
            if tag in BLOCK:
                self._flush()
            # lenient pop: unwind to the matching open tag if present
            for i in range(len(self.stack) - 1, -1, -1):
                if self.stack[i][0] == tag:
                    for t, d in self.stack[i:]:
                        if d:
                            self.drop_depth -= 1
                    del self.stack[i:]
                    break

        def handle_data(self, data):
            if self.drop_depth:
                return
            self._buf.append(data)
            if self.link_depth:
                self._link_chars += len(data)

    p = _Blocks()
    p.feed(content.decode("utf-8", errors="replace"))
    p._flush()
    p.close()
    kept: list[str] = []
    for text, link_chars, heading in p.blocks:
        ld = link_chars / max(len(text), 1)
        if heading and ld <= 0.5:
            kept.append(text)
        elif len(text) >= 25 and ld <= 1 / 3:
            kept.append(text)
        elif ld == 0.0 and len(text) >= 8:
            kept.append(text)
    main = "\n".join(kept)
    full = extract_html_text(content)
    if len(main) < 200 and len(main) < 0.2 * len(full):
        return full  # safety valve: implausibly empty extraction
    return main


def _pdf_unescape(s: bytes) -> str:
    """PDF literal-string unescape: \\n \\r \\t \\b \\f \\( \\) \\\\,
    \\ddd octal codes, and backslash-EOL line continuation — the whole
    sequence, including a CRLF pair, is dropped (PDF 32000-1 §7.3.4.2)."""
    out = bytearray()
    i = 0
    while i < len(s):
        c = s[i]
        if c == 0x5C and i + 1 < len(s):  # backslash
            n = s[i + 1]
            simple = {0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12,
                      0x28: 40, 0x29: 41, 0x5C: 92}
            if n in simple:
                out.append(simple[n])
                i += 2
                continue
            if 0x30 <= n <= 0x37:  # octal \ddd (1-3 digits)
                j = i + 1
                oct_digits = []
                while j < len(s) and len(oct_digits) < 3 and 0x30 <= s[j] <= 0x37:
                    oct_digits.append(s[j] - 0x30)
                    j += 1
                val = 0
                for d in oct_digits:
                    val = val * 8 + d
                out.append(val & 0xFF)
                i = j
                continue
            if n in (0x0D, 0x0A):  # backslash-EOL: line continuation
                i += 2
                if n == 0x0D and i < len(s) and s[i] == 0x0A:
                    i += 1  # CRLF counts as one EOL
                continue
            i += 1  # backslash before any other char: drop the backslash
            continue
        out.append(c)
        i += 1
    return out.decode("latin-1")


_PDF_WS = b"\x00\t\n\x0c\r "
_PDF_DELIM = b"()<>[]{}/%"


def _pdf_scan_literal(data: bytes, pos: int) -> tuple[bytes, int]:
    """Scan a literal string starting at the '(' at `pos`; returns the raw
    inner bytes (escapes intact, for _pdf_unescape) and the position after
    the closing ')'.  Balanced UNESCAPED parens nest per PDF 32000-1
    §7.3.4.2 — tracked with a depth counter, not a regex."""
    depth = 1
    i = pos + 1
    start = i
    while i < len(data):
        c = data[i]
        if c == 0x5C:  # backslash: the next byte is never a delimiter
            i += 2
            continue
        if c == 0x28:  # (
            depth += 1
        elif c == 0x29:  # )
            depth -= 1
            if depth == 0:
                return data[start:i], i + 1
        i += 1
    return data[start:i], i  # unterminated: take what's there


def _pdf_skip_dict(data: bytes, pos: int) -> int:
    """Skip a balanced ``<< … >>`` dictionary body starting at the ``<<``
    at `pos`; returns the position after the closing ``>>``.  Literal
    strings, hex strings, and comments inside the dict are skipped as
    units so their bytes can't open/close nesting — and, the point of
    skipping wholesale (r14 advisor item), string-valued dict entries
    (e.g. ``/ActualText (foo)`` in a BDC property list) never become
    pending text-show operands."""
    depth = 1
    i = pos + 2
    n = len(data)
    while i < n and depth:
        c = data[i]
        if c == 0x28:  # ( literal string: skip as a unit
            _, i = _pdf_scan_literal(data, i)
        elif c == 0x3C:  # << nested dict or < hex string
            if i + 1 < n and data[i + 1] == 0x3C:
                depth += 1
                i += 2
            else:
                end = data.find(b">", i + 1)
                i = end + 1 if end != -1 else n
        elif c == 0x3E:  # >> closes a level (a bare > can't appear outside strings)
            if i + 1 < n and data[i + 1] == 0x3E:
                depth -= 1
                i += 2
            else:
                i += 1
        elif c == 0x25:  # % comment: to EOL
            nl = min(
                x for x in (data.find(b"\r", i), data.find(b"\n", i), n) if x != -1
            )
            i = nl
        else:
            i += 1
    return i


def _parse_tounicode_cmap(
    data: bytes,
) -> tuple[dict[int, str], list[tuple[int, int, int]]]:
    """Parse a ToUnicode CMap stream (PDF 32000-1 §9.10.3) → (code→text,
    codespace ranges as (width, lo, hi) sorted by width).  Handles
    begincodespacerange (PER-RANGE widths — mixed 1/2-byte CMaps keep
    both, r15 ADVICE), beginbfchar (pairs), and beginbfrange (both the
    <lo> <hi> <dstStart> increment form and the <lo> <hi> [<d1> <d2> …]
    array form).  Destination hex is UTF-16BE per the spec."""
    import re

    hex_tok = re.compile(rb"<([0-9A-Fa-f]+)>")
    cmap: dict[int, str] = {}
    ranges: list[tuple[int, int, int]] = []
    width = 0  # max observed src width: the no-codespacerange fallback

    def _dst(h: bytes) -> str:
        if len(h) % 2:
            h += b"0"
        return bytes.fromhex(h.decode("ascii")).decode("utf-16-be", "replace")

    for m in re.finditer(
        rb"begincodespacerange(.*?)endcodespacerange", data, re.DOTALL
    ):
        toks = hex_tok.findall(m.group(1))
        for lo_t, hi_t in zip(toks[0::2], toks[1::2]):
            w = (len(lo_t) + 1) // 2
            ranges.append((w, int(lo_t, 16), int(hi_t, 16)))
            width = max(width, w)
    for m in re.finditer(rb"beginbfchar(.*?)endbfchar", data, re.DOTALL):
        toks = hex_tok.findall(m.group(1))
        for src, dst in zip(toks[0::2], toks[1::2]):
            cmap[int(src, 16)] = _dst(dst)
            width = max(width, (len(src) + 1) // 2)
    for m in re.finditer(rb"beginbfrange(.*?)endbfrange", data, re.DOTALL):
        body = m.group(1)
        # tokenize: hex strings and [ ... ] arrays, in order
        i = 0
        toks: list[object] = []
        while i < len(body):
            c = body[i : i + 1]
            if c == b"<":
                mm = hex_tok.match(body, i)
                if not mm:
                    i += 1
                    continue
                toks.append(mm.group(1))
                i = mm.end()
            elif c == b"[":
                end = body.find(b"]", i)
                end = end if end != -1 else len(body)
                toks.append([h for h in hex_tok.findall(body[i:end])])
                i = end + 1
            else:
                i += 1
        j = 0
        while j + 2 < len(toks):
            lo_t, hi_t, dst_t = toks[j], toks[j + 1], toks[j + 2]
            j += 3
            if not isinstance(lo_t, bytes) or not isinstance(hi_t, bytes):
                continue
            lo, hi = int(lo_t, 16), int(hi_t, 16)
            width = max(width, (len(lo_t) + 1) // 2)
            if isinstance(dst_t, list):  # array form: one dst per code
                for k, h in enumerate(dst_t):
                    if lo + k <= hi:
                        cmap[lo + k] = _dst(h)
            else:  # increment form: dst string's LAST code unit increments
                base = _dst(dst_t)
                for code in range(lo, min(hi, lo + 65535) + 1):
                    if base:
                        nxt = ord(base[-1]) + (code - lo)
                        if nxt > 0x10FFFF:  # malformed range: stop, keep the rest
                            break
                        cmap[code] = base[:-1] + chr(nxt)
    if not ranges:  # no codespacerange: single range at the observed width
        w = width or 2
        ranges = [(w, 0, (1 << (8 * w)) - 1)]
    ranges.sort(key=lambda r: r[0])  # shortest-prefix-first consumption
    return cmap, ranges


def _truetype_gid_to_unicode(font: bytes) -> dict[int, str]:
    """Reverse the embedded TrueType's 'cmap' table (OpenType spec, public)
    to glyph-id → Unicode char.  Supports the two encodings real PDFs
    embed: format 4 (segment mapping, Windows BMP) and format 12
    (segmented coverage, full Unicode).  First (lowest-codepoint) wins on
    glyphs reachable from several codepoints.  Returns {} for anything
    unparseable — callers treat that as "no fallback available"."""
    import struct as _st

    try:
        num_tables = _st.unpack_from(">H", font, 4)[0]
        cmap_off = None
        for i in range(num_tables):
            tag, _chk, off, _ln = _st.unpack_from(">4sIII", font, 12 + 16 * i)
            if tag == b"cmap":
                cmap_off = off
                break
        if cmap_off is None:
            return {}
        n_enc = _st.unpack_from(">H", font, cmap_off + 2)[0]
        subtables = []
        for i in range(n_enc):
            pid, eid, off = _st.unpack_from(">HHI", font, cmap_off + 4 + 8 * i)
            subtables.append((pid, eid, cmap_off + off))
        # preference: (3,10)/(0,4+) format 12 > (3,1)/(0,3) format 4
        def pref(t):
            pid, eid, _ = t
            return {(3, 10): 0, (0, 4): 1, (0, 6): 1, (3, 1): 2, (0, 3): 3}.get(
                (pid, eid), 9
            )

        # Global work budget: a hostile font can declare thousands of
        # overlapping 0..0xFFFF segments; without a bound that is billions
        # of Python iterations (r16 ADVICE CPU-exhaustion vector).  A
        # legitimate BMP cmap maps ≤0x10000 codepoints, so cap both the
        # map size and the total codepoints visited.
        budget = 1 << 18
        uni_to_gid: dict[int, int] = {}
        for pid, eid, off in sorted(subtables, key=pref):
            fmt = _st.unpack_from(">H", font, off)[0]
            if fmt == 12:
                n_groups = _st.unpack_from(">I", font, off + 12)[0]
                for g in range(n_groups):
                    start, end, sgid = _st.unpack_from(
                        ">III", font, off + 16 + 12 * g
                    )
                    for u in range(start, min(end, start + 0xFFFF) + 1):
                        uni_to_gid.setdefault(u, sgid + (u - start))
                    budget -= min(end, start + 0xFFFF) + 1 - start
                    if budget <= 0 or len(uni_to_gid) >= 0x10000:
                        break
                break
            if fmt == 4:
                seg_x2 = _st.unpack_from(">H", font, off + 6)[0]
                segs = seg_x2 // 2
                ends = _st.unpack_from(f">{segs}H", font, off + 14)
                starts = _st.unpack_from(f">{segs}H", font, off + 16 + seg_x2)
                deltas = _st.unpack_from(f">{segs}h", font, off + 16 + 2 * seg_x2)
                ro_base = off + 16 + 3 * seg_x2
                ros = _st.unpack_from(f">{segs}H", font, ro_base)
                for i in range(segs):
                    if starts[i] == 0xFFFF:
                        continue
                    for u in range(starts[i], ends[i] + 1):
                        if ros[i] == 0:
                            gid = (u + deltas[i]) & 0xFFFF
                        else:
                            addr = ro_base + 2 * i + ros[i] + 2 * (u - starts[i])
                            if addr + 2 > len(font):
                                continue
                            gid = _st.unpack_from(">H", font, addr)[0]
                            if gid:
                                gid = (gid + deltas[i]) & 0xFFFF
                        if gid:
                            uni_to_gid.setdefault(u, gid)
                    budget -= ends[i] + 1 - starts[i]
                    if budget <= 0 or len(uni_to_gid) >= 0x10000:
                        break
                break
        gid_to_uni: dict[int, str] = {}
        for u in sorted(uni_to_gid):
            gid_to_uni.setdefault(uni_to_gid[u], chr(u))
        return gid_to_uni
    except (_st.error, IndexError, ValueError):
        return {}


def _pdf_font_cmaps(
    content: bytes,
) -> dict[bytes, tuple[dict[int, str], list[tuple[int, int, int]]]]:
    """Resource font name (e.g. b"F1") → parsed ToUnicode CMap.

    Walks the object graph: ``/Font << /Fx N 0 R … >>`` resource
    fragments name the font objects; each font object may carry
    ``/ToUnicode M 0 R``; object M's stream is the CMap.  Objects packed
    in object streams (``/Type /ObjStm``, PDF 32000-1 §7.5.7 — the 1.5+
    compressed layout) are expanded first: the stream's header is N
    (objnum, offset) integer pairs, bodies start at /First.  Names are
    collected globally (per-page resource resolution is out of scope for
    the fallback extractor — a name reused across pages for DIFFERENT
    fonts keeps the first binding)."""
    import re
    import zlib

    objs: dict[int, bytes] = {}
    for m in re.finditer(rb"(\d+)\s+\d+\s+obj\b(.*?)endobj", content, re.DOTALL):
        objs.setdefault(int(m.group(1)), m.group(2))

    def _stream_of(body: bytes) -> bytes | None:
        sm = re.search(rb"stream\r?\n(.*?)\r?\nendstream", body, re.DOTALL)
        if not sm:
            return None
        data = sm.group(1)
        try:
            return zlib.decompress(data)
        except zlib.error:
            return data

    # Expand /ObjStm containers: their member objects join the graph
    # (first binding wins, so a plain `N 0 obj` of the same number takes
    # priority — incremental-update PDFs put the NEWER object outside).
    # Member bodies are ALSO collected for the /Font resource scan below:
    # page/resource dicts live inside object streams in the common PDF
    # 1.5+ layout, so scanning only the raw bytes would never bind those
    # fonts to their CMaps (r15 ADVICE).
    expanded: list[bytes] = []
    for body in list(objs.values()):
        if re.search(rb"/Type\s*/ObjStm\b", body) is None:
            continue
        nm = re.search(rb"/N\s+(\d+)", body)
        fm = re.search(rb"/First\s+(\d+)", body)
        data = _stream_of(body)
        if not (nm and fm and data):
            continue
        n, first = int(nm.group(1)), int(fm.group(1))
        header = data[:first].split()
        if len(header) < 2 * n:
            continue
        try:  # a corrupt container degrades to "not expanded", never a crash
            pairs = [
                (int(header[2 * i]), int(header[2 * i + 1])) for i in range(n)
            ]
        except ValueError:
            continue
        for i, (objnum, off) in enumerate(pairs):
            end = pairs[i + 1][1] if i + 1 < n else len(data) - first
            member = data[first + off : first + end]
            objs.setdefault(objnum, member)
            expanded.append(member)

    CMapT = tuple[dict[int, str], list[tuple[int, int, int]]]
    cmaps: dict[bytes, CMapT] = {}
    cmap_cache: dict[int, CMapT | None] = {}
    # Raw bytes first (first binding wins — the incremental-update rule
    # above), then ObjStm member bodies, where PDF 1.5+ writers pack the
    # page dicts whose /Resources name the fonts.
    for source in (content, *expanded):
        for rm in re.finditer(rb"/Font\s*<<(.*?)>>", source, re.DOTALL):
            for fm in re.finditer(
                rb"/([^\s/<>\[\]()]+)\s+(\d+)\s+\d+\s+R", rm.group(1)
            ):
                name, objnum = fm.group(1), int(fm.group(2))
                if name in cmaps:
                    continue  # first binding wins
                body = objs.get(objnum)
                if body is None:
                    continue
                tm = re.search(rb"/ToUnicode\s+(\d+)\s+\d+\s+R", body)
                if not tm:
                    # No-ToUnicode CID fallback (r16): reverse the embedded
                    # TrueType's own cmap table — unicode→GID inverted to
                    # GID→unicode, composed with CIDToGIDMap (Identity or
                    # the 2-byte-per-CID stream).  This is what pdfminer/
                    # PyMuPDF do for the same files; it recovers text from
                    # the common "subsetted font, no ToUnicode" exports.
                    parsed = _cid_font_fallback_cmap(body, objs, _stream_of)
                    if parsed and parsed[0]:
                        cmaps[name] = parsed
                    continue
                tnum = int(tm.group(1))
                if tnum not in cmap_cache:
                    tbody = objs.get(tnum)
                    tdata = _stream_of(tbody) if tbody is not None else None
                    cmap_cache[tnum] = (
                        _parse_tounicode_cmap(tdata)
                        if tdata is not None
                        else None
                    )
                parsed = cmap_cache[tnum]
                if parsed and parsed[0]:
                    cmaps[name] = parsed
    return cmaps


def _cid_font_fallback_cmap(font_body, objs, stream_of):
    """Type0 font WITHOUT /ToUnicode → (code→text, ranges) via the
    embedded font program: /DescendantFonts → /FontDescriptor →
    /FontFile2 (TrueType), whose 'cmap' table inverts to GID→Unicode;
    CIDs map to GIDs through /CIDToGIDMap (the /Identity default, or the
    big-endian 2-byte-per-CID stream form).  Returns None when any link
    is missing — the raw-path behavior is then unchanged."""
    import re

    dm = re.search(rb"/DescendantFonts\s*\[\s*(\d+)\s+\d+\s+R", font_body)
    desc = objs.get(int(dm.group(1))) if dm else None
    if desc is None:
        # Inline descendant dict (rare writers inline the CIDFont): ONLY a
        # body that itself declares a CID-font subtype qualifies.  A simple
        # (non-Type0) TrueType font also carries /FontDescriptor but its
        # show-strings use 1-byte codes — consuming them pairwise as CIDs
        # destroys the text (r16 ADVICE: "Hello World" → "d").  Those fonts
        # must stay on the raw latin-1 path.
        if re.search(rb"/Subtype\s*/CIDFontType[02]\b", font_body):
            desc = font_body
    if desc is None:
        return None
    fd = re.search(rb"/FontDescriptor\s+(\d+)\s+\d+\s+R", desc)
    fdesc = objs.get(int(fd.group(1))) if fd else None
    if fdesc is None:
        return None
    ff = re.search(rb"/FontFile2\s+(\d+)\s+\d+\s+R", fdesc)
    fbody = objs.get(int(ff.group(1))) if ff else None
    fdata = stream_of(fbody) if fbody is not None else None
    if not fdata:
        return None
    gid_to_uni = _truetype_gid_to_unicode(fdata)
    if not gid_to_uni:
        return None
    # CIDToGIDMap: /Identity (default) or a stream of 2-byte GIDs per CID
    cid2gid = None
    cg = re.search(rb"/CIDToGIDMap\s+(\d+)\s+\d+\s+R", desc)
    if cg:
        cbody = objs.get(int(cg.group(1)))
        cdata = stream_of(cbody) if cbody is not None else None
        if cdata:
            cid2gid = {
                cid: (cdata[2 * cid] << 8) | cdata[2 * cid + 1]
                for cid in range(len(cdata) // 2)
            }
    if cid2gid is None:
        cmap = {gid: uni for gid, uni in gid_to_uni.items()}  # CID == GID
    else:
        cmap = {
            cid: gid_to_uni[gid]
            for cid, gid in cid2gid.items()
            if gid in gid_to_uni
        }
    return cmap, [(2, 0x0000, 0xFFFF)]


def _apply_cmap(
    s: str, cmap: dict[int, str], ranges: list[tuple[int, int, int]]
) -> str:
    """Map a raw (latin-1-decoded) show-string through a ToUnicode CMap.
    Bytes are consumed at the width of the first codespace range (sorted
    shortest-first) containing them — mixed 1/2-byte CMaps consume each
    code at its own width, the spec's prefix-matching consumption.  Codes
    absent from the CMap fall back to their raw latin-1 character when
    the code is ONE byte wide (a 1-byte code in a simple font IS that
    character — a partial CMap degrades to the readable raw path, r15
    ADVICE); unmapped MULTI-byte CIDs stay dropped (a CID has no latin-1
    identity — emitting its bytes would be garbage).  Bytes outside
    every codespace range pass through raw one at a time.  An EXPLICIT
    empty destination (<>) still maps to nothing — that is a real
    mapping, not an absence."""
    bs = s.encode("latin-1", "replace")
    n = len(bs)
    out: list[str] = []
    i = 0
    while i < n:
        w_used = 0
        for w, lo, hi in ranges:
            if i + w <= n and lo <= int.from_bytes(bs[i : i + w], "big") <= hi:
                w_used = w
                break
        if w_used == 0:  # outside every codespace range: raw byte
            out.append(chr(bs[i]))
            i += 1
            continue
        mapped = cmap.get(int.from_bytes(bs[i : i + w_used], "big"))
        if mapped is not None:
            out.append(mapped)
        elif w_used == 1:
            out.append(chr(bs[i]))
        i += w_used
    return "".join(out)


def extract_pdf_text(content: bytes) -> str:
    """Simple-PDF text extraction via the stdlib: walk `stream…endstream`
    objects, FlateDecode via zlib where needed, and collect the text
    arguments of Tj / TJ / ' / " operators in content-stream order via a
    small postfix token scanner — literal (…) strings with paren-depth
    tracking (balanced unescaped parens nest, §7.3.4.2), escape/octal/
    line-continuation handling, hex <…> strings with the odd-digit rule,
    and balanced ``<< … >>`` dict bodies skipped wholesale (their string
    values are not show operands).  CID/Type0 fonts that carry a
    /ToUnicode CMap decode through it (bfchar + bfrange, both forms),
    keyed by the /Fx … Tf font selection; objects packed in object
    streams (/Type /ObjStm, PDF 1.5+ compressed xref layout) are expanded
    into the object graph first.  CID fonts WITHOUT a ToUnicode CMap
    recover through the embedded TrueType's own cmap table (r16 —
    GID→Unicode inversion composed with CIDToGIDMap).  Known limit of
    the fallback (markitdown takes priority when present): CID text with
    neither a ToUnicode CMap nor an embedded TrueType cmap — a
    subsetted CFF-only font, essentially — comes out garbled."""
    import re
    import zlib

    texts: list[str] = []

    def _hex_decode(h: bytes) -> str:
        # keep hex digits ONLY (r16 fuzz: corrupt bytes inside <…> strings
        # previously escaped as a raw fromhex ValueError; the spec's
        # whitespace-skip generalizes to dropping any non-hex garbage)
        h = bytes(c for c in h if chr(c) in "0123456789abcdefABCDEF")
        if len(h) % 2:  # odd digit count: implicit trailing 0 (§7.3.4.3)
            h += b"0"
        return bytes.fromhex(h.decode("ascii")).decode("latin-1")

    _num_re = re.compile(rb"^[+-]?(\d+\.?\d*|\.\d+)$")

    # CID/Type0 support: only pay the object-graph walk when the file
    # declares a ToUnicode CMap or a Type0 font (whose embedded TrueType
    # is the no-ToUnicode fallback, r16) — or carries object streams,
    # whose compressed members may hide either reference.
    font_cmaps = (
        _pdf_font_cmaps(content)
        if (
            b"/ToUnicode" in content
            or b"/DescendantFonts" in content
            or b"/ObjStm" in content
        )
        else {}
    )

    for m in re.finditer(rb"stream\r?\n(.*?)\r?\nendstream", content, re.DOTALL):
        data = m.group(1)
        try:
            data = zlib.decompress(data)
        except zlib.error:
            pass  # uncompressed content stream
        # Postfix scan: strings/arrays are operands; when a Tj / ' / " / TJ
        # operator token arrives, the pending operand is the text to show.
        # Any OTHER operator consumes its operands, so pending state clears.
        pending_str: str | None = None
        pending_arr: list[str] | None = None
        in_array: list[str] | None = None
        last_name: bytes | None = None
        cur_cmap: tuple[dict[int, str], int] | None = None
        i = 0
        n = len(data)
        while i < n:
            c = data[i]
            if c in _PDF_WS:
                i += 1
            elif c == 0x28:  # ( literal string
                raw, i = _pdf_scan_literal(data, i)
                s = _pdf_unescape(raw)
                if in_array is not None:
                    in_array.append(s)
                else:
                    pending_str = s
            elif c == 0x3C:  # < hex string or << dict
                if i + 1 < n and data[i + 1] == 0x3C:
                    # dict operand (e.g. a BDC property list): skip the
                    # balanced body wholesale — its string values are NOT
                    # show operands (r14 advisor item).
                    i = _pdf_skip_dict(data, i)
                    pending_str = pending_arr = None
                else:
                    end = data.find(b">", i + 1)
                    end = end if end != -1 else n
                    s = _hex_decode(data[i + 1 : end])
                    if in_array is not None:
                        in_array.append(s)
                    else:
                        pending_str = s
                    i = end + 1
            elif c == 0x5B:  # [
                in_array = []
                i += 1
            elif c == 0x5D:  # ]
                pending_arr, in_array = in_array, None
                i += 1
            elif c == 0x25:  # % comment: to EOL
                nl = min(
                    x
                    for x in (data.find(b"\r", i), data.find(b"\n", i), n)
                    if x != -1
                )
                i = nl
            elif c == 0x2F:  # /name operand (remembered for Tf font selection)
                i += 1
                start = i
                while i < n and data[i] not in _PDF_WS and data[i] not in _PDF_DELIM:
                    i += 1
                last_name = data[start:i]
            elif c in (0x29, 0x3E, 0x7B, 0x7D):  # stray ) > } { — skip
                i += 1
            else:  # regular token: number operand or operator
                j = i
                while j < n and data[j] not in _PDF_WS and data[j] not in _PDF_DELIM:
                    j += 1
                tok = data[i:j]
                i = j
                if _num_re.match(tok):
                    continue  # numeric operand (kerning, positions)
                if tok in (b"Tj", b"'", b'"'):
                    if pending_str is not None:
                        texts.append(
                            _apply_cmap(pending_str, *cur_cmap)
                            if cur_cmap
                            else pending_str
                        )
                elif tok == b"TJ":
                    if pending_arr:
                        texts.extend(
                            _apply_cmap(s, *cur_cmap) if cur_cmap else s
                            for s in pending_arr
                        )
                elif tok == b"Tf" and font_cmaps:
                    cur_cmap = font_cmaps.get(last_name)
                pending_str = pending_arr = None
        if texts and not texts[-1].endswith("\n"):
            texts.append("\n")
    return "".join(texts).strip("\n")


def convert_binary_documents(binary_df: DataFrame) -> DataFrame:
    """binaryFile-source rows (path, content) → (path, text, n_bytes).

    Real Spark plumbing (mapInPandas, Arrow batches).  Decode priority per
    row: plain text/markdown as UTF-8; `markitdown` when importable (the
    reference's converter, converter.py:45-90 — one MarkItDown instance
    per Arrow batch iterator, decoding from in-memory bytes, never a
    driver-side file loop); otherwise the stdlib extractors above for
    .docx/.pdf/.html/.doc.  Only extensions NO extractor handles raise
    NotImplementedError — that is a CAPABILITY gate and still fails the
    action.  A decode error on a supported format (corrupt .docx zip,
    malformed bytes, an ENCRYPTED .doc — a property of the file data, not
    of this container; r14 advisor item) is a DATA problem and must not
    fail the batch: it comes back as a per-row null text + `error`
    column, mirroring fetch_url_documents (reference converter.py
    ConversionResult.errors per-file surface; r13 advisor item).
    """

    def _convert(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            from markitdown import MarkItDown

            converter = MarkItDown(enable_plugins=False)
        except ImportError:
            converter = None

        def _decode_one(low: str, raw: bytes, path) -> str:
            if low.endswith((".txt", ".md")):
                return raw.decode("utf-8", errors="replace")
            if converter is not None:
                import io
                import os

                ext = os.path.splitext(low)[1]
                result = converter.convert_stream(
                    io.BytesIO(raw), file_extension=ext
                )
                return result.text_content
            if low.endswith(".docx"):
                return extract_docx_text(raw)
            if low.endswith(".pdf"):
                return extract_pdf_text(raw)
            if low.endswith((".html", ".htm")):
                return extract_html_text(raw)
            if low.endswith(".doc"):
                from vector_graph_rag_spark.sources.ole2 import extract_doc_text

                return extract_doc_text(raw)
            raise NotImplementedError(
                f"binary conversion for {path} requires markitdown "
                "(not in this container)"
            )

        for pdf in batches:
            texts: list[str | None] = []
            errors: list[str | None] = []
            for path, content in zip(pdf["path"], pdf["content"]):
                low = str(path).lower()
                raw = bytes(content)
                try:
                    texts.append(_decode_one(low, raw, path))
                    errors.append(None)
                except NotImplementedError:
                    raise  # capability gate, not a data error
                except Exception as exc:  # corrupt/malformed file bytes
                    texts.append(None)
                    errors.append(f"{type(exc).__name__}: {exc}")
            yield pd.DataFrame(
                {
                    "path": pdf["path"],
                    "text": texts,
                    "n_bytes": [len(c) for c in pdf["content"]],
                    "error": errors,
                }
            )

    return binary_df.select("path", "content").mapInPandas(
        _convert, "path string, text string, n_bytes long, error string"
    )


def fetch_url_documents(urls_df: DataFrame, url_col: str = "url") -> DataFrame:
    """urls → (url, text, error) via partition-parallel fetch+extract.

    Reference url_fetcher.py:91-155: GET the page, extract main content as
    markdown with trafilatura.  The two halves gate independently (r13):
    the FETCH needs `requests` (present in this container — network
    failures are captured per-row like the reference's
    ConversionResult.errors, never failing the job); the EXTRACT uses
    trafilatura when importable and falls back to the stdlib
    `extract_main_html_text` (readability-lite boilerplate removal)
    otherwise.  Only a missing `requests` raises
    NotImplementedError.
    """

    def _fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            import requests
        except ImportError:
            requests = None
        try:
            import trafilatura
        except ImportError:
            trafilatura = None
        for pdf in batches:
            texts, errors = [], []
            for url in pdf[url_col]:
                if requests is None:
                    raise NotImplementedError(
                        "URL fetch requires requests (not in this container)"
                    )
                try:
                    resp = requests.get(str(url), timeout=30, allow_redirects=True)
                    resp.raise_for_status()
                    if trafilatura is not None:
                        content = trafilatura.extract(resp.text, output_format="markdown")
                    else:
                        content = extract_main_html_text(resp.content) or None
                    if content:
                        texts.append(content)
                        errors.append(None)
                    else:
                        texts.append(None)
                        errors.append(f"No content extracted from: {url}")
                except Exception as e:  # per-row capture (url_fetcher.py:146-149)
                    texts.append(None)
                    errors.append(f"Failed to fetch {url}: {e}")
            yield pd.DataFrame({"url": pdf[url_col], "text": texts, "error": errors})

    return urls_df.select(F.col(url_col)).mapInPandas(
        _fetch, "url string, text string, error string"
    )
