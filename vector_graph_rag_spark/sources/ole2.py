"""Legacy Word `.doc` text extraction — OLE2/CFB + MS-DOC, stdlib only.

Closes the last converter format gap (reference loaders/converter.py:45-90
routes .doc through markitdown): a Compound File Binary reader
(MS-CFB: header, DIFAT→FAT, directory tree, mini FAT / mini stream) and a
Word 97-2003 text extractor (MS-DOC: FIB, CLX piece table in the
0Table/1Table stream, per-piece 8-bit CP1252 vs UTF-16LE encoding flags,
ccpText truncation to the main document range).

Scope (documented honestly): text extraction only — no formatting,
tables-as-text (cell marks become newlines), no OLE-embedded objects.
Encrypted (fEncrypted) documents raise ValueError — a data property, not
a capability gate, so the converter records it per-row (r14 advisor
item).  markitdown still takes priority in the converter when importable.

The fixture writer :func:`make_doc` builds a structurally valid CFB
(regular + mini-stream sectors, so BOTH reader paths are exercised) with
a real FIB + piece table — tests round-trip text through the actual
binary format, not a mirrored in-memory path.
"""

from __future__ import annotations

import struct

_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_ENDOFCHAIN = 0xFFFFFFFE
_FREESECT = 0xFFFFFFFF
_NOSTREAM = 0xFFFFFFFF


# --- CFB reader ----------------------------------------------------------------


def parse_cfb(content: bytes) -> dict[str, bytes]:
    """MS-CFB compound file → {stream name: bytes}.  Handles 512/4096-byte
    sectors, DIFAT chaining, and small streams in the mini stream."""
    if content[:8] != _MAGIC:
        raise ValueError("not an OLE2 compound file")
    sector_shift, mini_shift = struct.unpack_from("<HH", content, 30)
    ssz, msz = 1 << sector_shift, 1 << mini_shift
    n_fat = struct.unpack_from("<I", content, 44)[0]
    first_dir = struct.unpack_from("<I", content, 48)[0]
    mini_cutoff = struct.unpack_from("<I", content, 56)[0]
    first_minifat, n_minifat = struct.unpack_from("<II", content, 60)
    first_difat, n_difat = struct.unpack_from("<II", content, 68)

    def sector(n: int) -> bytes:
        # MS-CFB §2.1: sector n begins at (n+1)*size — the header occupies
        # the whole of "sector -1", so for major-version-4 files (4096-byte
        # sectors) sector 0 starts at 4096, not 512.
        off = (n + 1) * ssz
        return content[off : off + ssz]

    # DIFAT: 109 header entries + chained DIFAT sectors
    difat = list(struct.unpack_from("<109I", content, 76))
    nxt = first_difat
    for _ in range(n_difat):
        if nxt in (_ENDOFCHAIN, _FREESECT):
            break
        raw = sector(nxt)
        vals = struct.unpack(f"<{ssz // 4}I", raw)
        difat += vals[:-1]
        nxt = vals[-1]
    fat: list[int] = []
    for fs in difat[:n_fat] if n_fat <= len(difat) else difat:
        if fs in (_ENDOFCHAIN, _FREESECT):
            continue
        fat += struct.unpack(f"<{ssz // 4}I", sector(fs))

    def chain(start: int, limit: int = 1 << 22) -> bytes:
        out = bytearray()
        cur = start
        seen = 0
        while cur != _ENDOFCHAIN and cur != _FREESECT:
            if cur >= len(fat) or seen > limit:
                raise ValueError("broken CFB FAT chain")
            out += sector(cur)
            cur = fat[cur]
            seen += 1
        return bytes(out)

    # directory entries (128 bytes each) across the directory chain
    dirdata = chain(first_dir)
    entries = []
    for off in range(0, len(dirdata) - 127, 128):
        name_len = struct.unpack_from("<H", dirdata, off + 64)[0]
        etype = dirdata[off + 66]
        if etype == 0 or name_len < 2:
            continue
        name = dirdata[off : off + name_len - 2].decode("utf-16-le", "replace")
        start = struct.unpack_from("<I", dirdata, off + 116)[0]
        size = struct.unpack_from("<Q", dirdata, off + 120)[0]
        entries.append((name, etype, start, size))

    root = next((e for e in entries if e[1] == 5), None)
    mini_container = chain(root[2])[: root[3]] if root and root[3] else b""
    minifat: list[int] = []
    nxt = first_minifat
    for _ in range(n_minifat):
        if nxt in (_ENDOFCHAIN, _FREESECT):
            break
        minifat += struct.unpack(f"<{ssz // 4}I", sector(nxt))
        nxt = fat[nxt] if nxt < len(fat) else _ENDOFCHAIN

    def mini_chain(start: int) -> bytes:
        out = bytearray()
        cur = start
        while cur != _ENDOFCHAIN and cur != _FREESECT:
            if cur >= len(minifat):
                raise ValueError("broken CFB miniFAT chain")
            out += mini_container[cur * msz : (cur + 1) * msz]
            cur = minifat[cur]
        return bytes(out)

    streams: dict[str, bytes] = {}
    for name, etype, start, size in entries:
        if etype != 2:  # stream objects only
            continue
        data = mini_chain(start) if size < mini_cutoff else chain(start)
        streams[name] = data[:size]
    return streams


# --- MS-DOC text extraction -----------------------------------------------------


def _clean_doc_text(s: str) -> str:
    """Word control characters → plain text: CR and cell/row marks become
    newlines, VT (soft break) too; field/object marks and other control
    bytes are dropped."""
    out = []
    for ch in s:
        if ch in "\r\x07\x0b":
            out.append("\n")
        elif ch == "\t" or ord(ch) >= 0x20:
            if ch not in "\x13\x14\x15\x01\x02\x05\x08":
                out.append(ch)
    text = "".join(out)
    lines = [ln.rstrip() for ln in text.split("\n")]
    return "\n".join(ln for ln in lines if ln)


def extract_doc_text(content: bytes) -> str:
    """Word 97-2003 binary `.doc` → text: FIB header, CLX piece table from
    the 0Table/1Table stream, per-piece CP1252/UTF-16LE decode, truncated
    to the main-document character count (ccpText)."""
    streams = parse_cfb(content)
    wd = streams.get("WordDocument")
    if wd is None or len(wd) < 34 or struct.unpack_from("<H", wd, 0)[0] != 0xA5EC:
        raise ValueError(".doc missing a valid WordDocument stream")
    flags = struct.unpack_from("<H", wd, 0x0A)[0]
    if flags & 0x0100:  # fEncrypted — a property of the file DATA, not of
        # this container's capabilities: raise ValueError so the converter
        # captures it per-row (decode_error) instead of failing the batch.
        raise ValueError("encrypted .doc (fEncrypted) needs a password/msoffcrypto")
    table_name = "1Table" if flags & 0x0200 else "0Table"
    table = streams.get(table_name)

    # FIB variable part: base(32) + csw + fibRgW + cslw + fibRgLw + cbRgFcLcb + blob
    pos = 32
    csw = struct.unpack_from("<H", wd, pos)[0]
    pos += 2 + csw * 2
    cslw = struct.unpack_from("<H", wd, pos)[0]
    fibRgLw = pos + 2
    ccp_text = struct.unpack_from("<i", wd, fibRgLw + 12)[0]  # FibRgLw97.ccpText
    pos = fibRgLw + cslw * 4
    cb_rgfclcb = struct.unpack_from("<H", wd, pos)[0]
    blob = pos + 2
    pieces: list[str] = []
    if table is not None and cb_rgfclcb > 33:
        fc_clx, lcb_clx = struct.unpack_from("<II", wd, blob + 33 * 8)
        if lcb_clx:
            clx = table[fc_clx : fc_clx + lcb_clx]
            cpos = 0
            while cpos < len(clx):
                tag = clx[cpos]
                if tag == 1:  # Prc: skip property modifiers
                    cb = struct.unpack_from("<h", clx, cpos + 1)[0]
                    cpos += 3 + cb
                elif tag == 2:  # Pcdt: the piece table
                    lcb = struct.unpack_from("<I", clx, cpos + 1)[0]
                    plc = clx[cpos + 5 : cpos + 5 + lcb]
                    n = (lcb - 4) // 12
                    cps = struct.unpack_from(f"<{n + 1}I", plc, 0)
                    for i in range(n):
                        pcd_off = (n + 1) * 4 + i * 8
                        fc = struct.unpack_from("<I", plc, pcd_off + 2)[0]
                        n_chars = cps[i + 1] - cps[i]
                        if fc & 0x40000000:  # compressed: 8-bit CP1252
                            off = (fc & 0x3FFFFFFF) // 2
                            raw = wd[off : off + n_chars]
                            pieces.append(raw.decode("cp1252", "replace"))
                        else:
                            off = fc & 0x3FFFFFFF
                            raw = wd[off : off + 2 * n_chars]
                            pieces.append(raw.decode("utf-16-le", "replace"))
                    break
                else:
                    raise ValueError(f"unknown CLX tag {tag}")
    if not pieces:
        # non-complex fallback: contiguous text at fcMin..fcMac
        fc_min, fc_mac = struct.unpack_from("<II", wd, 24)
        raw = wd[fc_min:fc_mac]
        enc = "utf-16-le" if flags & 0x0001 else "cp1252"
        try:
            pieces = [raw.decode(enc, "replace")]
        except Exception:
            pieces = [raw.decode("cp1252", "replace")]
    text = "".join(pieces)
    if ccp_text > 0:
        text = text[:ccp_text]  # drop footnote/header/annotation ranges
    return _clean_doc_text(text)


# --- CFB + .doc fixture writer ---------------------------------------------------


def _make_cfb(streams: dict[str, bytes], sector_size: int = 512) -> bytes:
    """Minimal structurally valid CFB writer: 512-byte (major version 3) or
    4096-byte (major version 4) sectors, header-only DIFAT, small streams
    in the mini stream (so the reader's miniFAT path is exercised), flat
    directory (sibling tree set to NOSTREAM — our reader indexes by name).
    For v4 the 512-byte header block is zero-padded to a full sector, so
    sector 0 begins at byte 4096 (MS-CFB §2.1 — the r14 advisor's offset
    fix is pinned by the v4 round-trip test)."""
    if sector_size not in (512, 4096):
        raise ValueError("CFB sector size must be 512 or 4096")
    SSZ, MSZ, CUTOFF = sector_size, 64, 4096

    minis = {n: d for n, d in streams.items() if len(d) < CUTOFF}
    bigs = {n: d for n, d in streams.items() if len(d) >= CUTOFF}

    # mini stream container + miniFAT
    mini_data = bytearray()
    minifat: list[int] = []
    mini_start: dict[str, int] = {}
    for name, data in minis.items():
        nsec = max(1, -(-len(data) // MSZ))
        mini_start[name] = len(minifat)
        for i in range(nsec):
            minifat.append(len(minifat) + 1 if i < nsec - 1 else _ENDOFCHAIN)
        mini_data += data + b"\x00" * (nsec * MSZ - len(data))

    # regular sectors: [dir][minifat][mini container][big streams]; FAT last
    sectors: list[bytes] = []
    fat: list[int] = []

    def add_chain(data: bytes) -> int:
        nsec = max(1, -(-len(data) // SSZ))
        start = len(sectors)
        for i in range(nsec):
            sectors.append(data[i * SSZ : (i + 1) * SSZ].ljust(SSZ, b"\x00"))
            fat.append(start + i + 1 if i < nsec - 1 else _ENDOFCHAIN)
        return start

    # directory: root + one entry per stream (2 entries per 128B → 4/sector)
    def dirent(name: str, etype: int, start: int, size: int, child=_NOSTREAM) -> bytes:
        nm = name.encode("utf-16-le")
        e = bytearray(128)
        e[: len(nm)] = nm
        struct.pack_into("<H", e, 64, len(nm) + 2)
        e[66] = etype
        e[67] = 1  # black
        struct.pack_into("<III", e, 68, _NOSTREAM, _NOSTREAM, child)
        struct.pack_into("<I", e, 116, start)
        struct.pack_into("<Q", e, 120, size)
        return bytes(e)

    names = list(streams)
    # lay out mini container + big streams first so starts are known;
    # directory sector indices depend on total dir size — compute after.
    # We fill the dir chain FIRST (fixed size), then the others.
    n_dirent = 1 + len(names)
    dir_nsec = -(-n_dirent * 128 // SSZ)
    dir_start = 0
    for i in range(dir_nsec):
        sectors.append(b"")  # placeholder
        fat.append(dir_start + i + 1 if i < dir_nsec - 1 else _ENDOFCHAIN)

    minifat_bytes = b"".join(struct.pack("<I", v) for v in minifat)
    minifat_start = add_chain(minifat_bytes) if minifat else _ENDOFCHAIN
    mini_cont_start = add_chain(bytes(mini_data)) if mini_data else _ENDOFCHAIN
    big_start = {n: add_chain(d) for n, d in bigs.items()}

    ents = [dirent("Root Entry", 5, mini_cont_start, len(mini_data),
                   child=1 if names else _NOSTREAM)]
    for name in names:
        if name in minis:
            ents.append(dirent(name, 2, mini_start[name], len(minis[name])))
        else:
            ents.append(dirent(name, 2, big_start[name], len(bigs[name])))
    dirdata = b"".join(ents)
    for i in range(dir_nsec):
        sectors[dir_start + i] = dirdata[i * SSZ : (i + 1) * SSZ].ljust(SSZ, b"\x00")

    # FAT sectors at the end
    n_data = len(sectors)
    n_fat_sec = 1
    while (n_data + n_fat_sec) > n_fat_sec * (SSZ // 4):
        n_fat_sec += 1
    fat_start = n_data
    full_fat = fat + [0xFFFFFFFD] * n_fat_sec  # FATSECT marker for FAT sectors
    full_fat += [_FREESECT] * (n_fat_sec * (SSZ // 4) - len(full_fat))
    fat_bytes = b"".join(struct.pack("<I", v) for v in full_fat)
    for i in range(n_fat_sec):
        sectors.append(fat_bytes[i * SSZ : (i + 1) * SSZ])

    header = bytearray(512)
    header[:8] = _MAGIC
    major = 3 if SSZ == 512 else 4
    shift = 9 if SSZ == 512 else 12
    struct.pack_into("<HH", header, 24, 0x003E, major)  # minor, major
    struct.pack_into("<H", header, 28, 0xFFFE)  # little-endian
    struct.pack_into("<HH", header, 30, shift, 6)  # sector, 64B mini
    struct.pack_into("<I", header, 44, n_fat_sec)
    struct.pack_into("<I", header, 48, dir_start)
    struct.pack_into("<I", header, 56, CUTOFF)
    struct.pack_into("<II", header, 60,
                     minifat_start if minifat else _ENDOFCHAIN,
                     1 if minifat else 0)
    struct.pack_into("<II", header, 68, _ENDOFCHAIN, 0)  # no DIFAT sectors
    difat = [fat_start + i for i in range(n_fat_sec)]
    difat += [_FREESECT] * (109 - len(difat))
    struct.pack_into("<109I", header, 76, *difat)
    # v4: the header block is padded to a full 4096-byte sector.
    return bytes(header).ljust(SSZ, b"\x00") + b"".join(sectors)


def make_doc(
    text: str, compressed: bool = True, pieces: int = 1, sector_size: int = 512
) -> bytes:
    """Build a minimal valid Word 97 `.doc`: FIB + CLX piece table split
    into `pieces` runs, text stored CP1252 (`compressed=True`) or
    UTF-16LE.  Paragraph breaks: '\\n' in `text` becomes CR (0x0D).
    `sector_size=4096` wraps it in a major-version-4 CFB container."""
    body = text.replace("\n", "\r")
    if compressed and any(ord(c) > 0xFF for c in body):
        raise ValueError("compressed .doc text must be latin-1/cp1252 range")

    text_off = 1024  # text area starts after the FIB region
    if compressed:
        payload = body.encode("cp1252")
        step = 1
    else:
        payload = body.encode("utf-16-le")
        step = 2

    # split into `pieces` character runs
    n = len(body)
    cuts = [round(i * n / pieces) for i in range(pieces + 1)]
    cps = [c for c in cuts]
    pcds = []
    for i in range(pieces):
        char_off = cuts[i]
        byte_off = text_off + char_off * step
        fc = (byte_off * 2) | 0x40000000 if compressed else byte_off
        pcds.append(struct.pack("<HIH", 0, fc, 0))
    plc = b"".join(struct.pack("<I", c) for c in cps) + b"".join(pcds)
    clx = b"\x02" + struct.pack("<I", len(plc)) + plc

    # 0Table stream: CLX at offset 0
    table = clx

    # WordDocument stream: FIB base + var part + text
    csw, cslw, cb_pairs = 14, 22, 93
    fib = bytearray(32)
    struct.pack_into("<H", fib, 0, 0xA5EC)
    struct.pack_into("<H", fib, 2, 0x00C1)  # nFib: Word 97
    struct.pack_into("<H", fib, 0x0A, 0)  # flags: 0Table, not encrypted
    var = bytearray()
    var += struct.pack("<H", csw) + b"\x00" * (csw * 2)
    rglw = bytearray(cslw * 4)
    struct.pack_into("<i", rglw, 12, n)  # ccpText
    var += struct.pack("<H", cslw) + rglw
    blob = bytearray(cb_pairs * 8)
    struct.pack_into("<II", blob, 33 * 8, 0, len(clx))  # fcClx, lcbClx
    var += struct.pack("<H", cb_pairs) + blob
    wd = bytes(fib) + bytes(var)
    wd += b"\x00" * (text_off - len(wd)) + payload
    return _make_cfb({"WordDocument": wd, "0Table": table}, sector_size=sector_size)
