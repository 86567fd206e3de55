"""PDF text extraction — the highest-value non-HTML document format in
a pretraining corpus (papers, reports, books arrive as PDF).

Scope (honest): CLASSIC-layout PDFs — objects in the file body, content
streams raw or FlateDecode (stdlib zlib), text shown via Tj / TJ / ' / "
operators with literal or hex strings (UTF-16BE with BOM, else
Latin-1/WinAnsi approximated as latin-1). That covers the
builder-certified closed form and the broad class of simple generated
PDFs. NOT handled (documented seam, quarantine or partial output, never
a dead task): encrypted files, cross-reference/object streams (ObjStm —
PDF 1.5 compressed layout), CID/Type0 composite fonts with custom CMaps
(their bytes are font-indexed, not character codes — extracting them
without the CMap would produce mojibake, so text in such fonts is
OMITTED rather than garbled), and JBIG2/image-only scans (no OCR).

The 100 TB shape: one mapInPandas pass, linear in PDF bytes,
embarrassingly parallel per document; structural corruption routes to a
``parse_error`` row (the same walker-quarantine contract as
operators/warc.py / demux.py).

Reference parity note: the reference pipeline has no document-ingestion
path (SURVEY.md §2.1); this module is part of the training-data
extension surface (SURVEY.md §2.5).
"""

from __future__ import annotations

import re
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_ESCAPES = {
    ord("n"): "\n",
    ord("r"): "\r",
    ord("t"): "\t",
    ord("b"): "\b",
    ord("f"): "\f",
    ord("("): "(",
    ord(")"): ")",
    ord("\\"): "\\",
}


def _pdf_literal_string(data: bytes, pos: int) -> tuple[str, int]:
    """Decode a ``(...)`` literal starting AT the opening paren:
    balanced parens, backslash escapes incl. octal and line
    continuations (PDF 32000-1 §7.3.4.2). Returns (text, pos past)."""
    assert data[pos : pos + 1] == b"("
    pos += 1
    depth = 1
    out: list[str] = []
    n = len(data)
    while pos < n:
        b = data[pos]
        if b == 0x5C:  # backslash
            pos += 1
            if pos >= n:
                break
            e = data[pos]
            if e in _ESCAPES:
                out.append(_ESCAPES[e])
                pos += 1
            elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                oct_digits = ""
                while (
                    pos < n and 0x30 <= data[pos] <= 0x37 and len(oct_digits) < 3
                ):
                    oct_digits += chr(data[pos])
                    pos += 1
                out.append(chr(int(oct_digits, 8) & 0xFF))
            elif e in (0x0A, 0x0D):  # line continuation: swallow EOL
                pos += 1
                if e == 0x0D and pos < n and data[pos] == 0x0A:
                    pos += 1
            else:  # unknown escape: the char stands for itself
                out.append(chr(e))
                pos += 1
            continue
        if b == 0x28:
            depth += 1
        elif b == 0x29:
            depth -= 1
            if depth == 0:
                return "".join(out), pos + 1
        out.append(chr(b))
        pos += 1
    raise ValueError("unterminated PDF literal string")


def _pdf_hex_string(data: bytes, pos: int) -> tuple[str, int]:
    """Decode a ``<...>`` hex string at the opening angle; UTF-16BE
    with BOM decodes as such, anything else as latin-1 (WinAnsi
    approximation)."""
    end = data.find(b">", pos)
    if end < 0:
        raise ValueError("unterminated PDF hex string")
    hx = re.sub(rb"\s", b"", data[pos + 1 : end])
    if len(hx) % 2:
        hx += b"0"  # spec: odd final digit implies trailing 0
    try:
        raw = bytes.fromhex(hx.decode("ascii"))
    except ValueError:
        raise ValueError("bad PDF hex string") from None
    if raw[:2] == b"\xfe\xff":
        return raw[2:].decode("utf-16-be", "replace"), end + 1
    return raw.decode("latin-1"), end + 1


def pdf_content_text(data: bytes) -> str:
    """Visible text of one decoded content stream: string objects are
    collected and flushed at each text-showing operator (Tj, ', ", TJ —
    the TJ array's kerning numbers are skipped by construction since
    only strings are collected). Text outside BT/ET is ignored."""
    out: list[str] = []
    pending: list[str] = []
    pos = 0
    n = len(data)
    in_text = False
    while pos < n:
        b = data[pos]
        if b == 0x28:  # (
            s, pos = _pdf_literal_string(data, pos)
            if in_text:
                pending.append(s)
            continue
        if b == 0x3C:  # < — hex string (<< dict start is handled below)
            if data[pos : pos + 2] == b"<<":
                pos += 2
                continue
            s, pos = _pdf_hex_string(data, pos)
            if in_text:
                pending.append(s)
            continue
        if data[pos : pos + 2] == b"BT" and (
            pos + 2 == n or not data[pos + 2 : pos + 3].isalpha()
        ):
            in_text = True
            pos += 2
            continue
        if data[pos : pos + 2] == b"ET" and (
            pos + 2 == n or not data[pos + 2 : pos + 3].isalpha()
        ):
            in_text = False
            pending.clear()
            pos += 2
            continue
        if in_text and (
            (
                data[pos : pos + 2] == b"Tj"
                and not data[pos + 2 : pos + 3].isalpha()
            )
            or b in (0x27, 0x22)  # ' and " show-with-positioning ops
            or (
                data[pos : pos + 2] == b"TJ"
                and not data[pos + 2 : pos + 3].isalpha()
            )
        ):
            out.extend(pending)
            pending.clear()
            pos += 2 if b not in (0x27, 0x22) else 1
            continue
        pos += 1
    return "".join(out)


def pdf_text_extract(payload: bytes) -> dict:
    """Extract visible text from a classic-layout PDF: every stream
    object is located by framing (``<<dict>> stream ... endstream``),
    FlateDecode'd when filtered (corrupt deflate raises ValueError for
    the quarantine path), and content streams (those containing a BT
    text block) contribute one page entry each. Returns n_pages and the
    page texts joined with single spaces. Encrypted files raise
    ValueError (their strings are ciphertext — extracting would emit
    garbage silently)."""
    if not payload.startswith(b"%PDF-"):
        raise ValueError("not a PDF (missing %PDF- header)")
    if b"/Encrypt" in payload[-2048:]:
        raise ValueError("encrypted PDF (no text without the key)")
    pages: list[str] = []
    for m in re.finditer(rb"<<(.*?)>>\s*stream(?:\r\n|\n|\r)", payload, re.S):
        d = m.group(1)
        start = m.end()
        # prefer the dict's direct /Length (binary streams may end in
        # bytes that LOOK like EOLs — blind rstrip truncates deflate
        # data); fall back to the endstream scan minus one EOL
        lm = re.search(rb"/Length\s+(\d+)(?!\s+0\s+R)", d)
        if lm:
            end = start + int(lm.group(1))
            if payload[end : end + 11].lstrip(b"\r\n")[:9] != b"endstream":
                raise ValueError("PDF /Length does not reach endstream")
            data = payload[start:end]
        else:
            end = payload.find(b"endstream", start)
            if end < 0:
                raise ValueError("unterminated PDF stream object")
            data = payload[start:end]
            if data.endswith(b"\r\n"):
                data = data[:-2]
            elif data.endswith((b"\n", b"\r")):
                data = data[:-1]
        if b"/FlateDecode" in d:
            try:
                data = zlib.decompress(data)
            except zlib.error as e:
                raise ValueError(f"corrupt FlateDecode stream: {e}") from e
        if b"BT" in data:
            pages.append(pdf_content_text(data))
    if not pages:
        raise ValueError("no text content streams in PDF")
    return {"n_pages": len(pages), "text": " ".join(pages)}


PDF_TEXT_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_pages", IntegerType(), True),
        StructField("text", StringType(), True),
        StructField("parse_error", StringType(), True),
    ]
)


def pdf_text(media: DataFrame) -> DataFrame:
    """(media_id, payload binary) -> one row per document with page
    count and extracted text; corruption quarantines as a parse_error
    row, never a dead task."""

    def _walk(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for batch in batches:
            rows = []
            for media_id, payload in zip(batch["media_id"], batch["payload"]):
                try:
                    d = pdf_text_extract(bytes(payload))
                    rows.append(
                        (int(media_id), d["n_pages"], d["text"], None)
                    )
                except ValueError as e:
                    rows.append((int(media_id), None, None, str(e)))
            yield pd.DataFrame(
                rows, columns=[f.name for f in PDF_TEXT_SCHEMA.fields]
            )

    return media.select("media_id", "payload").mapInPandas(
        _walk, PDF_TEXT_SCHEMA
    )


def _pdf_escape(text: str) -> bytes:
    """Literal-string form of ASCII-safe text."""
    return (
        text.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
    ).encode("latin-1")


def synth_pdf_bytes(doc_id: int, text: str) -> bytes:
    """Deterministic two-page classic-layout PDF: page 1 shows
    ``doc <doc_id>`` as a literal string, page 2 shows the document
    text as a BOM'd UTF-16BE hex string (any unicode survives). Even
    doc_ids FlateDecode-compress their content streams, odd leave them
    raw. Closed form (oracle-mirrored):
      n_pages = 2,   extracted = 'doc <doc_id> ' || text
    Proper xref + trailer so real viewers open the fixtures too."""
    c1 = b"BT /F1 12 Tf 72 720 Td (" + _pdf_escape(f"doc {doc_id}") + b") Tj ET"
    hx = b"\xfe\xff" + text.encode("utf-16-be")
    c2 = b"BT /F1 12 Tf 72 720 Td <" + hx.hex().encode() + b"> Tj ET"

    def content_obj(num: int, data: bytes) -> bytes:
        filt = b""
        if doc_id % 2 == 0:
            data = zlib.compress(data, 9)
            filt = b" /Filter /FlateDecode"
        return (
            b"%d 0 obj\n<< /Length %d%s >>\nstream\n" % (num, len(data), filt)
            + data
            + b"\nendstream\nendobj\n"
        )

    objs = [
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n",
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R 4 0 R] /Count 2 >>\nendobj\n",
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 5 0 R /Resources << /Font << /F1 7 0 R >> >> >>\nendobj\n",
        b"4 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 6 0 R /Resources << /Font << /F1 7 0 R >> >> >>\nendobj\n",
        content_obj(5, c1),
        content_obj(6, c2),
        b"7 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\n"
        b"endobj\n",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for o in objs:
        offsets.append(len(out))
        out += o
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_at)
    )
    return bytes(out)


def synth_pdf_media(documents: DataFrame) -> DataFrame:
    """(media_id, payload) of deterministic PDFs, executor-side."""
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    def _build_fn(doc_id, text):
        import pandas as pd

        return pd.Series(
            [
                synth_pdf_bytes(int(d), str(t))
                for d, t in zip(doc_id, text)
            ]
        )

    _build = pandas_udf(_build_fn, BinaryType(), PandasUDFType.SCALAR)
    return documents.select(
        F.col("doc_id").alias("media_id"),
        _build("doc_id", "text").alias("payload"),
    )
