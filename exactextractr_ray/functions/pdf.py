"""PDF container codec + text extraction — pure stdlib (zlib).

Web crawls carry PDFs (~3% of Common Crawl responses), so a corpus
pipeline needs a text-extraction path for them. The format is public
ISO 32000; like the MP4 codec, capabilities tier honestly:

1. **structure** (any PDF): indirect objects are recovered by a linear
   scan for ``N G obj`` markers — the standard "reconstruction" strategy
   (ISO 32000 Annex C) — so BOTH classic xref-table files and modern
   (PDF 1.5+) cross-reference-stream files parse without implementing
   either xref flavor; objects inside compressed **object streams**
   (``/Type /ObjStm``) are expanded, ``FlateDecode`` (with PNG
   predictors) is the supported stream filter.
2. **page tree + content**: catalog -> /Pages kids walk (inheritable
   /Contents as ref or array), per-page content streams concatenated.
3. **text extraction**: content-stream tokenizer tracking ``Tj``,
   ``'``, ``"`` and ``TJ`` show operators inside BT/ET blocks; literal
   strings decode the §7.3.4.2 escapes (octal, \\n \\t .., line
   continuations) and hex strings pairs; newline on Td/TD/T*/ET.
   Byte-to-text mapping is Latin-1 (exact for the writer below and for
   ASCII/WinAnsi simple fonts); CID/Type0 fonts with ToUnicode CMaps are
   NOT remapped — glyph-indexed text extracts as raw code bytes, the
   honest limit without font tables.

``encode_simple_pdf`` writes a minimal spec-conformant file (classic
xref table, FlateDecode content, Helvetica) whose extraction inverts
byte-exactly — the oracle anchor; real-world files (pdfTeX/xelatex PDFs
on this host) exercise the ObjStm/xref-stream path in tests.
"""

from __future__ import annotations

import re
import zlib

import numpy as np

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class _Lexer:
    """Minimal PDF object lexer over a bytes buffer."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def _skip_ws(self):
        d, n = self.data, len(self.data)
        while self.pos < n:
            c = self.data[self.pos]
            if c in _WS:
                self.pos += 1
            elif c == 0x25:  # % comment
                e = d.find(b"\n", self.pos)
                self.pos = n if e < 0 else e + 1
            else:
                return

    def parse(self):
        """One object at the cursor: dict/array/name/number/string/ref/
        bool/null. Indirect refs come back as ("ref", num, gen)."""
        self._skip_ws()
        d = self.data
        c = d[self.pos : self.pos + 1]
        if c == b"<":
            if d[self.pos : self.pos + 2] == b"<<":
                return self._dict()
            return self._hex_string()
        if c == b"(":
            return self._lit_string()
        if c == b"[":
            return self._array()
        if c == b"/":
            return self._name()
        if c in b"tf":
            if d[self.pos : self.pos + 4] == b"true":
                self.pos += 4
                return True
            if d[self.pos : self.pos + 5] == b"false":
                self.pos += 5
                return False
        if c == b"n" and d[self.pos : self.pos + 4] == b"null":
            self.pos += 4
            return None
        return self._number_or_ref()

    def _name(self):
        self.pos += 1
        m = re.match(rb"[^\x00\t\n\x0c\r ()<>\[\]{}/%]*", self.data[self.pos:])
        raw = m.group(0)
        self.pos += len(raw)
        # #xx hex escapes in names
        raw = re.sub(rb"#([0-9A-Fa-f]{2})",
                     lambda g: bytes([int(g.group(1), 16)]), raw)
        return "/" + raw.decode("latin-1")

    def _number_or_ref(self):
        m = re.match(rb"[+-]?\d*\.?\d+", self.data[self.pos:])
        if not m:
            raise ValueError(f"pdf: bad token at {self.pos}")
        tok = m.group(0)
        self.pos += len(tok)
        if b"." in tok:
            return float(tok)
        val = int(tok)
        # lookahead for "gen R" => indirect reference
        save = self.pos
        self._skip_ws()
        m2 = re.match(rb"(\d+)\s+R(?![\w])", self.data[self.pos:])
        if val >= 0 and m2:
            self.pos += m2.end()
            return ("ref", val, int(m2.group(1)))
        self.pos = save
        return val

    def _array(self):
        self.pos += 1
        out = []
        while True:
            self._skip_ws()
            if self.data[self.pos : self.pos + 1] == b"]":
                self.pos += 1
                return out
            out.append(self.parse())

    def _dict(self):
        self.pos += 2
        out = {}
        while True:
            self._skip_ws()
            if self.data[self.pos : self.pos + 2] == b">>":
                self.pos += 2
                return out
            key = self._name()
            out[key] = self.parse()

    def _hex_string(self):
        e = self.data.find(b">", self.pos)
        hx = re.sub(rb"\s", b"", self.data[self.pos + 1 : e])
        if len(hx) % 2:
            hx += b"0"
        self.pos = e + 1
        return bytes.fromhex(hx.decode("ascii"))

    def _lit_string(self):
        d = self.data
        i = self.pos + 1
        depth = 1
        out = bytearray()
        esc = {0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12,
               0x28: 40, 0x29: 41, 0x5C: 92}
        while depth:
            c = d[i]
            if c == 0x5C:  # backslash
                n = d[i + 1]
                if 0x30 <= n <= 0x37:  # octal, 1-3 digits
                    j = i + 1
                    o = 0
                    while j < i + 4 and 0x30 <= d[j] <= 0x37:
                        o = o * 8 + (d[j] - 0x30)
                        j += 1
                    out.append(o & 0xFF)
                    i = j
                elif n in esc:
                    out.append(esc[n])
                    i += 2
                elif n == 0x0A:  # line continuation
                    i += 2
                elif n == 0x0D:
                    i += 3 if d[i + 2 : i + 3] == b"\n" else 2
                else:
                    out.append(n)
                    i += 2
            elif c == 0x28:
                depth += 1
                out.append(c)
                i += 1
            elif c == 0x29:
                depth -= 1
                if depth:
                    out.append(c)
                i += 1
            else:
                out.append(c)
                i += 1
        self.pos = i
        return bytes(out)


def _png_unpredict(raw: bytes, columns: int, colors: int = 1,
                   bpc: int = 8) -> bytes:
    """Undo PNG row predictors (/Predictor >= 10) on a decoded stream —
    each row is (filter_byte + columns*colors*bpc/8 bytes), same filter
    semantics as PNG (ISO 32000 §7.4.4.4)."""
    stride = (columns * colors * bpc + 7) // 8
    bpp = max(1, colors * bpc // 8)
    rows = np.frombuffer(raw, np.uint8)
    nrows = len(rows) // (stride + 1)
    rows = rows[: nrows * (stride + 1)].reshape(nrows, stride + 1)
    out = np.zeros((nrows, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    for r in range(nrows):
        f = rows[r, 0]
        cur = rows[r, 1:].copy()
        if f == 0:
            pass
        elif f == 1:  # Sub
            for i in range(bpp, stride):
                cur[i] = (cur[i] + cur[i - bpp]) & 0xFF
        elif f == 2:  # Up
            cur = (cur.astype(np.int64) + prev).astype(np.uint8)
        elif f == 3:  # Average
            for i in range(stride):
                left = int(cur[i - bpp]) if i >= bpp else 0
                cur[i] = (int(rows[r, 1 + i]) + (left + int(prev[i])) // 2) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = int(cur[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                cc = int(prev[i - bpp]) if i >= bpp else 0
                p = a + b - cc
                pr = min((abs(p - a), a), (abs(p - b), b), (abs(p - cc), cc))[1]
                cur[i] = (int(rows[r, 1 + i]) + pr) & 0xFF
        else:
            raise NotImplementedError(f"pdf: PNG predictor filter {f}")
        out[r] = cur
        prev = cur
    return out.tobytes()


def _rle_decode(data: bytes) -> bytes:
    """RunLengthDecode (ISO 32000 §7.4.5): n<128 copy n+1, n>128 repeat
    next byte 257-n times, 128 = end of data."""
    out = bytearray()
    i = 0
    while i < len(data):
        n = data[i]
        i += 1
        if n == 128:
            break
        if n < 128:
            out.extend(data[i : i + n + 1])
            i += n + 1
        else:
            out.extend(data[i : i + 1] * (257 - n))
            i += 1
    return bytes(out)


def _decode_stream(sdict: dict, raw: bytes, resolve) -> bytes:
    """Apply the stream's filter PIPELINE in order (ISO 32000 §7.4):
    Flate / LZW (TIFF-variant codes, reused from the GeoTIFF codec) /
    ASCIIHex / ASCII85 / RunLength, each with optional PNG predictors."""
    filt = resolve(sdict.get("/Filter"))
    parms = resolve(sdict.get("/DecodeParms"))
    filters = filt if isinstance(filt, list) else ([] if filt is None else [filt])
    parms_list = parms if isinstance(parms, list) else [parms] * len(filters)
    data = raw
    for f, pm in zip(filters, parms_list):
        f = resolve(f)
        pm = resolve(pm) or {}
        if f == "/FlateDecode" or f == "/Fl":
            data = zlib.decompress(data)
        elif f == "/LZWDecode" or f == "/LZW":
            if int(resolve(pm.get("/EarlyChange", 1)) or 1) != 1:
                raise NotImplementedError("pdf: LZW EarlyChange=0")
            from ..sources.geotiff import _decode_lzw

            data = _decode_lzw(data)
        elif f == "/ASCIIHexDecode" or f == "/AHx":
            hx = re.sub(rb"\s", b"", data.split(b">", 1)[0])
            if len(hx) % 2:
                hx += b"0"
            data = bytes.fromhex(hx.decode("ascii"))
        elif f == "/ASCII85Decode" or f == "/A85":
            import base64

            body = re.sub(rb"\s", b"", data)
            if body.startswith(b"<~"):
                body = body[2:]
            if body.endswith(b"~>"):
                body = body[:-2]
            data = base64.a85decode(body)
        elif f == "/RunLengthDecode" or f == "/RL":
            data = _rle_decode(data)
        elif f == "/Crypt":
            raise NotImplementedError("pdf: encrypted stream (/Crypt)")
        else:
            raise NotImplementedError(
                f"pdf: stream filter {f} unsupported (DCT/JBIG2/JPX are "
                "image codecs; CCITTFax is fax raster data)"
            )
        pred = int(resolve(pm.get("/Predictor", 1)) or 1)
        if pred >= 10:
            data = _png_unpredict(
                data,
                int(resolve(pm.get("/Columns", 1))),
                int(resolve(pm.get("/Colors", 1))),
                int(resolve(pm.get("/BitsPerComponent", 8))),
            )
        elif pred != 1:
            raise NotImplementedError(f"pdf: TIFF predictor {pred}")
    return data


_OBJ_RE = re.compile(rb"(?<![\d.])(\d+)\s+(\d+)\s+obj\b")


class PdfFile:
    """Parsed PDF: object map (reconstruction scan + ObjStm expansion),
    catalog/page-tree walk, per-page text extraction."""

    def __init__(self, data: bytes):
        if not data.startswith(b"%PDF-"):
            raise ValueError("not a PDF: missing %PDF- header")
        self.data = data
        self.objects: dict[int, object] = {}
        self._streams: dict[int, tuple[dict, bytes]] = {}
        self._scan_objects()
        for obj in self.objects.values():
            if isinstance(obj, dict) and "/O" in obj and "/U" in obj:
                raise NotImplementedError(
                    "encrypted PDF (standard security handler): string/"
                    "stream decryption is out of scope"
                )
        self._expand_object_streams()

    # -- object loading ----------------------------------------------
    def _scan_objects(self):
        d = self.data
        for m in _OBJ_RE.finditer(d):
            num = int(m.group(1))
            lex = _Lexer(d, m.end())
            try:
                obj = lex.parse()
            except Exception:
                continue
            lex._skip_ws()
            if d[lex.pos : lex.pos + 6] == b"stream":
                p = lex.pos + 6
                if d[p : p + 2] == b"\r\n":
                    p += 2
                elif d[p : p + 1] in (b"\n", b"\r"):
                    p += 1
                ln = obj.get("/Length") if isinstance(obj, dict) else None
                if isinstance(ln, int):
                    body = d[p : p + ln]
                else:  # indirect /Length: fall back to endstream search
                    e = d.find(b"endstream", p)
                    body = d[p:e].rstrip(b"\r\n")
                self._streams[num] = (obj, body)
            # later definitions (incremental updates) win: keep scanning
            self.objects[num] = obj

    def resolve(self, obj, depth: int = 0):
        while isinstance(obj, tuple) and obj and obj[0] == "ref":
            if depth > 32:
                raise ValueError("pdf: reference cycle")
            obj = self.objects.get(obj[1])
            depth += 1
        return obj

    def stream_bytes(self, num: int) -> bytes:
        sdict, raw = self._streams[num]
        ln = self.resolve(sdict.get("/Length"))
        if isinstance(ln, int) and ln <= len(self.data):
            raw2 = raw if len(raw) == ln else raw[:ln]
        else:
            raw2 = raw
        return _decode_stream(sdict, raw2, self.resolve)

    def _expand_object_streams(self):
        for num, (sdict, _raw) in list(self._streams.items()):
            if self.resolve(sdict.get("/Type")) != "/ObjStm":
                continue
            body = self.stream_bytes(num)
            n = int(self.resolve(sdict["/N"]))
            first = int(self.resolve(sdict["/First"]))
            head = _Lexer(body)
            pairs = []
            for _ in range(n):
                onum = head.parse()
                off = head.parse()
                pairs.append((int(onum), int(off)))
            for onum, off in pairs:
                if onum in self._streams:
                    continue  # a full revision elsewhere wins
                lex = _Lexer(body, first + off)
                try:
                    self.objects.setdefault(onum, lex.parse())
                except Exception:
                    continue

    # -- page tree ----------------------------------------------------
    def catalog(self) -> dict:
        for obj in self.objects.values():
            o = obj
            if isinstance(o, dict) and o.get("/Type") == "/Catalog":
                return o
        raise ValueError("pdf: no document catalog found")

    def pages(self) -> list[dict]:
        root = self.resolve(self.catalog().get("/Pages"))
        out: list[dict] = []

        def walk(node, inherited_res, depth=0):
            if depth > 64 or not isinstance(node, dict):
                return
            res = node.get("/Resources", inherited_res)
            t = self.resolve(node.get("/Type"))
            if t == "/Page":
                node["__resources__"] = res  # inheritable attr (§7.7.3.4)
                out.append(node)
                return
            for kid in self.resolve(node.get("/Kids")) or []:
                walk(self.resolve(kid), res, depth + 1)

        walk(root, None)
        return out

    def page_content(self, page: dict) -> bytes:
        c = self.resolve(page.get("/Contents"))
        refs = c if isinstance(c, list) else [page.get("/Contents")]
        chunks = []
        for r in refs:
            r = r if isinstance(r, tuple) else ("ref", -1, 0)
            if r[1] in self._streams:
                chunks.append(self.stream_bytes(r[1]))
        return b"\n".join(chunks)

    # -- text extraction ----------------------------------------------
    def _xobj_fetch(self, resources, depth: int = 0):
        """Resolver for the ``Do`` operator: XObject name -> (content
        bytes, nested resolver) for /Form XObjects (text inside forms —
        letterheads, stamps — extracts too); images return None."""
        res = self.resolve(resources) or {}
        xo = self.resolve(res.get("/XObject")) or {}

        def fetch(name):
            ref = xo.get(name)
            if not (isinstance(ref, tuple) and ref[0] == "ref") or depth > 8:
                return None
            num = ref[1]
            if num not in self._streams:
                return None
            sdict = self._streams[num][0]
            if self.resolve(sdict.get("/Subtype")) != "/Form":
                return None
            sub_res = sdict.get("/Resources", res)
            return (
                self.stream_bytes(num),
                self._xobj_fetch(sub_res, depth + 1),
                self._font_decoders(sub_res),
            )

        return fetch

    def _font_decoders(self, resources) -> dict:
        """Resources /Font dict -> {name: bytes->str decoder}. Fonts with
        a /ToUnicode CMap decode through it (bfchar/bfrange, 1- or 2-byte
        codes — the CID/Type0 case); others stay Latin-1."""
        res = self.resolve(resources) or {}
        fonts = self.resolve(res.get("/Font")) or {}
        out = {}
        for name, ref in fonts.items():
            fd = self.resolve(ref)
            if not isinstance(fd, dict):
                continue
            tu = fd.get("/ToUnicode")
            if isinstance(tu, tuple) and tu[0] == "ref" and tu[1] in self._streams:
                try:
                    out[name] = _cmap_decoder(self.stream_bytes(tu[1]))
                except Exception:
                    continue
        return out

    def page_text(self, page: dict) -> str:
        res = page.get("__resources__")
        return extract_content_text(
            self.page_content(page),
            xobj_fetch=self._xobj_fetch(res),
            fonts=self._font_decoders(res),
        )

    def text(self) -> str:
        return "\f".join(self.page_text(p) for p in self.pages())


_HEX_PAIR = re.compile(rb"<([0-9A-Fa-f\s]+)>")


def _cmap_decoder(cmap: bytes):
    """ToUnicode CMap stream -> decoder(bytes) -> str (ISO 32000 §9.10.3).

    Handles begincodespacerange (code width), beginbfchar pairs and
    beginbfrange (dst-start increment AND [array] forms); destination hex
    is UTF-16BE. Unmapped 1-byte codes fall back to Latin-1, unmapped
    wider codes to U+FFFD — deterministic either way."""
    def hexes(seg: bytes) -> list[bytes]:
        return [
            bytes.fromhex(re.sub(rb"\s", b"", h).decode("ascii"))
            for h in _HEX_PAIR.findall(seg)
        ]

    width = 1
    m = re.search(
        rb"begincodespacerange(.*?)endcodespacerange", cmap, re.S
    )
    table: dict[int, str] = {}
    if m:
        cs = hexes(m.group(1))
        if cs:
            width = len(cs[0])
    for m in re.finditer(rb"beginbfchar(.*?)endbfchar", cmap, re.S):
        hs = hexes(m.group(1))
        for i in range(0, len(hs) - 1, 2):
            width = max(width, len(hs[i]))
            table[int.from_bytes(hs[i], "big")] = hs[i + 1].decode(
                "utf-16-be", "replace"
            )
    for m in re.finditer(rb"beginbfrange(.*?)endbfrange", cmap, re.S):
        seg = m.group(1)
        # split entries: lo hi (dst | [dst dst ...])
        for em in re.finditer(
            rb"<([0-9A-Fa-f\s]+)>\s*<([0-9A-Fa-f\s]+)>\s*"
            rb"(\[(?:\s*<[0-9A-Fa-f\s]+>)+\s*\]|<[0-9A-Fa-f\s]+>)",
            seg,
        ):
            lo = bytes.fromhex(em.group(1).decode("ascii"))
            hi = bytes.fromhex(em.group(2).decode("ascii"))
            width = max(width, len(lo))
            lo_i, hi_i = int.from_bytes(lo, "big"), int.from_bytes(hi, "big")
            dst = em.group(3)
            if dst.startswith(b"["):
                dsts = hexes(dst)
                for k, d in enumerate(dsts):
                    table[lo_i + k] = d.decode("utf-16-be", "replace")
            else:
                base = bytes.fromhex(
                    re.sub(rb"\s", b"", dst[1:-1]).decode("ascii")
                )
                # increment the LAST UTF-16 code unit (spec rule)
                bi = int.from_bytes(base, "big")
                for k in range(hi_i - lo_i + 1):
                    table[lo_i + k] = (bi + k).to_bytes(
                        len(base), "big"
                    ).decode("utf-16-be", "replace")

    def decode(s: bytes) -> str:
        out = []
        for i in range(0, len(s) - width + 1, width):
            code = int.from_bytes(s[i : i + width], "big")
            got = table.get(code)
            if got is not None:
                out.append(got)
            elif width == 1:
                out.append(chr(code))
            else:
                out.append("�")
        return "".join(out)

    return decode


_STR_OPS = {b"Tj", b"'", b'"'}
_NL_OPS = {b"Td", b"TD", b"T*", b"ET"}
_OP_RE = re.compile(rb"[A-Za-z'\"*]{1,3}")


def extract_content_text(
    content: bytes,
    kern_space: float = 150.0,
    xobj_fetch=None,
    fonts: dict | None = None,
    _depth: int = 0,
) -> str:
    """Content-stream text: Tj/'/\"/TJ shown strings in stream order,
    newline on Td/TD/T*/ET (collapsed); byte->text mapping is Latin-1
    unless the CURRENT font (tracked via ``Tf``) carries a ToUnicode
    CMap decoder in ``fonts`` (the CID/Type0 case). TJ kerns more
    negative than ``-kern_space`` (thousandths of text space) read as
    word gaps. ``xobj_fetch(name)`` resolves ``Do``-invoked Form
    XObjects to (content, nested_fetch, nested_fonts) for recursion."""
    lex = _Lexer(content)
    n = len(content)
    parts: list[str] = []
    stack: list = []
    cur_decoder = [None]  # current font's ToUnicode decoder, if any

    def shown(s):
        if isinstance(s, bytes):
            dec = cur_decoder[0]
            parts.append(dec(s) if dec else s.decode("latin-1"))

    while True:
        lex._skip_ws()
        if lex.pos >= n:
            break
        c = content[lex.pos : lex.pos + 1]
        if c in b"(<[/+-.0123456789":
            try:
                stack.append(lex.parse())
            except Exception:
                lex.pos += 1
            continue
        m = _OP_RE.match(content, lex.pos)
        if not m:
            lex.pos += 1
            continue
        op = m.group(0)
        lex.pos = m.end()
        if op in _STR_OPS:
            if op in (b"'", b'"') and parts and not parts[-1].endswith("\n"):
                parts.append("\n")  # ' and " are next-line-then-show
            if stack:
                shown(stack[-1])
        elif op == b"TJ":
            if stack and isinstance(stack[-1], list):
                for el in stack[-1]:
                    if isinstance(el, (int, float)) and el <= -kern_space:
                        # large negative kern = inter-word gap (the
                        # pdftotext heuristic; TeX emits ~-250..-600)
                        if parts and not parts[-1].endswith((" ", "\n")):
                            parts.append(" ")
                    shown(el)
        elif op in _NL_OPS:
            if parts and not parts[-1].endswith("\n"):
                parts.append("\n")
        elif op == b"Tf":
            if len(stack) >= 2 and isinstance(stack[-2], str):
                cur_decoder[0] = (fonts or {}).get(stack[-2])
        elif op == b"Do" and xobj_fetch and _depth < 8:
            if stack and isinstance(stack[-1], str):
                got = xobj_fetch(stack[-1])
                if got is not None:
                    sub = extract_content_text(
                        got[0], kern_space, got[1], got[2], _depth + 1
                    )
                    if sub:
                        if parts and not parts[-1].endswith("\n"):
                            parts.append("\n")
                        parts.append(sub)
        elif op == b"BI":  # inline image: skip to EI
            e = content.find(b"EI", lex.pos)
            lex.pos = n if e < 0 else e + 2
        stack.clear()  # operands consumed by every operator
    return "".join(parts).strip("\n")


def parse_pdf(data: bytes) -> dict:
    """PDF bytes -> {"n_pages", "version", "text", "page_texts"}."""
    pdf = PdfFile(data)
    pages = pdf.pages()
    texts = [pdf.page_text(p) for p in pages]
    return {
        "version": data[5:8].decode("ascii", "replace"),
        "n_pages": len(pages),
        "page_texts": texts,
        "text": "\f".join(texts),
    }


def _esc_lit(s: str) -> bytes:
    b = s.encode("latin-1")
    return b.replace(b"\\", rb"\\").replace(b"(", rb"\(").replace(b")", rb"\)")


def encode_simple_pdf(pages: list[str], compress: bool = True) -> bytes:
    """Page texts -> minimal PDF 1.4 (classic xref table, one Helvetica
    font, one FlateDecode content stream per page, one ``Tj`` per line).
    ``parse_pdf(encode_simple_pdf(pages))["page_texts"]`` round-trips the
    input exactly (modulo the documented newline normalization)."""
    objs: list[bytes] = []  # 1-indexed object bodies

    npages = len(pages)
    kids = " ".join(f"{4 + 2 * i} 0 R" for i in range(npages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")  # 1
    objs.append(
        f"<< /Type /Pages /Count {npages} /Kids [ {kids} ] >>".encode()
    )  # 2
    objs.append(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )  # 3
    for i, text in enumerate(pages):
        page_num = 4 + 2 * i
        objs.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Resources << /Font << /F1 3 0 R >> >> "
                f"/Contents {page_num + 1} 0 R >>"
            ).encode()
        )
        lines = text.split("\n")
        body = bytearray(b"BT /F1 12 Tf 72 720 Td 14 TL\n")
        for j, ln in enumerate(lines):
            if j:
                body += b"T*\n"
            body += b"(" + _esc_lit(ln) + b") Tj\n"
        body += b"ET"
        stream = zlib.compress(bytes(body)) if compress else bytes(body)
        filt = b"/Filter /FlateDecode " if compress else b""
        objs.append(
            b"<< " + filt + f"/Length {len(stream)} >>".encode()
            + b"\nstream\n" + stream + b"\nendstream"
        )

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for i, body in enumerate(objs, 1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)
