"""Markdown / PDF -> text extraction: the reference maps ``.md`` and
``.pdf`` to the TEXT modality (`smse_backend/utils/file_extensions.py:
13-29`), so a corpus ingest must be able to turn both into indexable
text. Pure stdlib, deterministic:

* :func:`markdown_to_text` — strip Markdown syntax to plain text
  (headings, emphasis, inline/fenced code markers, links/images, list
  bullets, blockquotes, rules, simple HTML tags). The CONTENT survives;
  only markup characters are removed.
* :func:`pdf_extract_text` — text from PDF content streams: object
  scan, stream extraction (uncompressed or FlateDecode via zlib — any
  other /Filter rejects LOUDLY), then the text-showing operators
  (Tj / TJ / ' / ") with PDF literal-string unescaping. BT..ET blocks
  join with newlines — the layout-free reading-order subset.
* :func:`encode_pdf_text` — minimal single-page PDF writer (optionally
  FlateDecode-compressed) so fixtures and round-trip tests can build
  real PDFs in-container.
* :func:`ingest_text_documents` — binaryFile dir scan -> mapInPandas
  extraction -> (path, fmt, content, content_sha256) rows; the sha256
  invariant column is computed IN the Python kernel while
  `corpus.verify_sha256_invariant` recomputes it JVM-side — two
  independent hash paths over the same bytes.

Scale shape: one binaryFile scan, one map-only Arrow kernel per file —
no shuffle, no driver involvement; identical to the PNG/JPEG media
plumbing.
"""

from __future__ import annotations

import re
import zlib
from collections.abc import Iterator

_MD_RULES: list[tuple[re.Pattern, str]] = [
    (re.compile(r"```[^\n]*\n"), ""),            # fence open (keep body)
    (re.compile(r"```"), ""),                    # fence close
    (re.compile(r"!\[([^\]]*)\]\([^)]*\)"), r"\1"),   # image -> alt
    (re.compile(r"\[([^\]]+)\]\([^)]*\)"), r"\1"),    # link -> text
    (re.compile(r"^#{1,6}[ \t]+", re.M), ""),    # headings
    (re.compile(r"^[ \t]*>[ \t]?", re.M), ""),   # blockquote
    (re.compile(r"^[ \t]*[-*+][ \t]+", re.M), ""),    # bullet list
    (re.compile(r"^[ \t]*\d+\.[ \t]+", re.M), ""),    # ordered list
    (re.compile(r"^[ \t]*([-*_][ \t]*){3,}$", re.M), ""),  # rule
    (re.compile(r"\*\*([^*]+)\*\*"), r"\1"),     # bold
    (re.compile(r"\*([^*]+)\*"), r"\1"),         # italic
    (re.compile(r"__([^_]+)__"), r"\1"),
    (re.compile(r"_([^_]+)_"), r"\1"),
    (re.compile(r"`([^`]*)`"), r"\1"),           # inline code
    (re.compile(r"<[A-Za-z/][^>]*>"), ""),       # simple HTML tags
]


def markdown_to_text(src: str) -> str:
    """Markdown -> plain text; rule order matters (fences before inline
    code, images before links). Collapses the blank-line runs the
    stripped markup leaves behind."""
    out = src
    for pat, repl in _MD_RULES:
        out = pat.sub(repl, out)
    out = re.sub(r"\n{3,}", "\n\n", out)
    return out.strip()


# --- PDF --------------------------------------------------------------------

_STREAM_RE = re.compile(
    rb"<<(?P<dict>.*?)>>\s*stream\r?\n(?P<body>.*?)\r?\nendstream",
    re.S,
)
_TJ_RE = re.compile(r"\((?:[^()\\]|\\.)*\)\s*Tj|\[(?:[^\]\\]|\\.)*\]\s*TJ")
_STR_RE = re.compile(r"\((?:[^()\\]|\\.)*\)")
_ESCAPES = {"n": "\n", "r": "\r", "t": "\t", "b": "\b", "f": "\f",
            "(": "(", ")": ")", "\\": "\\"}


def _unescape_pdf_string(s: str) -> str:
    out = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            nxt = s[i + 1]
            if nxt in _ESCAPES:
                out.append(_ESCAPES[nxt])
                i += 2
                continue
            if nxt.isdigit():          # octal, up to 3 digits
                j = i + 1
                while j < min(i + 4, len(s)) and s[j].isdigit():
                    j += 1
                out.append(chr(int(s[i + 1:j], 8)))
                i = j
                continue
            i += 1                     # line continuation / unknown
            continue
        out.append(c)
        i += 1
    return "".join(out)


def pdf_extract_text(buf: bytes) -> str:
    """PDF bytes -> text from every content stream's show-text operators.

    Streams with no /Filter are read verbatim; /FlateDecode inflates via
    zlib; any OTHER filter (DCTDecode, LZWDecode, ...) raises
    ``ValueError`` loudly — never silently-empty text. BT..ET text
    blocks join with newlines."""
    if buf[:5] != b"%PDF-":
        raise ValueError("not a PDF header")
    texts: list[str] = []
    for m in _STREAM_RE.finditer(buf):
        d = m.group("dict")
        body = m.group("body")
        fm = re.search(rb"/Filter\s*/?(\w+)?", d)
        if fm:
            filt = (fm.group(1) or b"").decode("latin-1")
            if filt == "FlateDecode":
                body = zlib.decompress(body)
            else:
                raise ValueError(
                    f"unsupported PDF stream filter /{filt or '?'} "
                    "(uncompressed or FlateDecode only)"
                )
        content = body.decode("latin-1")
        if "BT" not in content:
            continue
        block_parts: list[str] = []
        for tm in _TJ_RE.finditer(content):
            frag = tm.group(0)
            parts = [
                _unescape_pdf_string(sm.group(0)[1:-1])
                for sm in _STR_RE.finditer(frag)
            ]
            block_parts.append("".join(parts))
        if block_parts:
            texts.append("\n".join(block_parts))
    return "\n".join(texts)


def encode_pdf_text(text: str, compress: bool = False) -> bytes:
    """Plain text -> a minimal one-page PDF whose content stream shows
    each line with ``Tj`` (optionally FlateDecode-compressed) — the
    fixture writer for round-trip tests; :func:`pdf_extract_text`
    recovers ``text`` exactly."""
    def esc(s: str) -> str:
        return (s.replace("\\", r"\\").replace("(", r"\(")
                .replace(")", r"\)"))

    lines = text.split("\n")
    ops = ["BT", "/F1 11 Tf", "1 0 0 1 50 780 Tm", "13 TL"]
    for k, line in enumerate(lines):
        if k:
            ops.append("T*")
        ops.append(f"({esc(line)}) Tj")
    ops.append("ET")
    stream = "\n".join(ops).encode("latin-1", errors="replace")
    filt = b""
    if compress:
        stream = zlib.compress(stream, 9)
        filt = b" /Filter /FlateDecode"
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length " + str(len(stream)).encode() + filt
        + b" >>\nstream\n" + stream + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 " + str(len(objs) + 1).encode() + b"\n"
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (b"trailer\n<< /Size " + str(len(objs) + 1).encode()
            + b" /Root 1 0 R >>\nstartxref\n" + str(xref_at).encode()
            + b"\n%%EOF\n")
    return bytes(out)


# --- Spark ingestion --------------------------------------------------------

TEXT_DOC_SCHEMA = (
    "path string, fmt string, content string, content_sha256 string"
)


def extract_text(name: str, buf: bytes) -> tuple[str, str]:
    """(fmt, text) for a document file by extension — the
    EXTENSION_TO_MODALITY text mapping made real."""
    low = name.lower()
    if low.endswith(".pdf"):
        return "pdf", pdf_extract_text(buf)
    if low.endswith(".md"):
        return "md", markdown_to_text(buf.decode("utf-8", errors="replace"))
    if low.endswith(".txt"):
        return "txt", buf.decode("utf-8", errors="replace")
    raise ValueError(f"not a text-modality extension: {name!r}")


def ingest_text_documents(spark, path: str):
    """binaryFile scan over a mixed .txt/.md/.pdf dir -> extracted text
    rows with the per-row content sha256 (computed in the Python kernel;
    `corpus.verify_sha256_invariant` recomputes it JVM-side — two
    independent hash paths must agree)."""
    import hashlib

    import pandas as pd
    from pyspark.sql import functions as F

    from smse_backend_spark.session import ensure_pyfiles

    ensure_pyfiles(spark)

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for p, b in zip(pdf["path"], pdf["content"]):
                name = p.rsplit("/", 1)[-1]
                low = name.lower()
                if not low.endswith((".txt", ".md", ".pdf")):
                    continue           # quarantine: not a text modality
                fmt, text = extract_text(name, bytes(b))
                rows.append(
                    (p, fmt, text,
                     hashlib.sha256(text.encode("utf-8")).hexdigest())
                )
            yield pd.DataFrame(
                rows, columns=["path", "fmt", "content", "content_sha256"]
            )

    raw = spark.read.format("binaryFile").load(path)
    return raw.select("path", "content").mapInPandas(
        _kernel, TEXT_DOC_SCHEMA
    )
