"""PDF text extraction (operators/pdf): hand fixtures independent of the
builder, builder roundtrip closed form, operator quarantine."""

from __future__ import annotations

import zlib

import pytest

from user_behavior_spark_pipeline_spark.operators.pdf import (
    pdf_content_text,
    pdf_text,
    pdf_text_extract,
    synth_pdf_bytes,
    synth_pdf_media,
)


def test_pdf_literal_string_escapes_and_nesting():
    c = rb"BT (a\(b\)c) Tj (nest (ed) parens) Tj (oct\101al) Tj ET"
    assert pdf_content_text(c) == "a(b)cnest (ed) parensoctAal"
    # line continuation and escaped EOLs
    c = b"BT (split\\\nline) Tj (tab\\there) Tj ET"
    assert pdf_content_text(c) == "splitlinetab\there"


def test_pdf_hex_strings_and_tj_array():
    c = b"BT [<48656c6c6f> -120 <2c20776f726c64>] TJ ET"
    assert pdf_content_text(c) == "Hello, world"
    # UTF-16BE with BOM; odd final digit implies trailing zero
    hx = (b"\xfe\xff" + "héllo".encode("utf-16-be")).hex().encode()
    assert pdf_content_text(b"BT <" + hx + b"> Tj ET") == "héllo"
    # strings outside BT/ET (e.g. in annotations) are NOT page text
    assert pdf_content_text(b"(hidden) Tj BT (shown) Tj ET") == "shown"


def test_pdf_roundtrip_closed_form():
    for d, t in ((0, "plain"), (1, "par(en)s \\ slash"), (3, "日本語"), (2, "")):
        out = pdf_text_extract(synth_pdf_bytes(d, t))
        assert out["n_pages"] == 2
        assert out["text"] == f"doc {d} {t}"


def test_pdf_rejects_corrupt_and_encrypted():
    good = synth_pdf_bytes(2, "text here")  # even: FlateDecode
    # bit-flip inside the compressed stream -> ValueError, not zlib.error
    i = good.index(b"stream\n") + 10
    bad = good[:i] + bytes([good[i] ^ 0xFF]) + good[i + 1 :]
    with pytest.raises(ValueError, match="FlateDecode|/Length"):
        pdf_text_extract(bad)
    with pytest.raises(ValueError, match="not a PDF"):
        pdf_text_extract(b"%!PS adobe postscript")
    enc = good + b"trailer\n<< /Encrypt 9 0 R /Root 1 0 R >>\n%%EOF\n"
    with pytest.raises(ValueError, match="encrypted"):
        pdf_text_extract(enc)
    with pytest.raises(ValueError, match="no text"):
        pdf_text_extract(b"%PDF-1.4\nnothing here\n%%EOF")


def test_pdf_text_operator_quarantines(spark):
    docs = spark.createDataFrame(
        [(i, f"body {i}") for i in range(4)], "doc_id long, text string"
    )
    media = synth_pdf_media(docs)
    rows = {r.media_id: r for r in pdf_text(media).collect()}
    for i in range(4):
        assert rows[i].n_pages == 2 and rows[i].text == f"doc {i} body {i}"
    broken = spark.createDataFrame(
        [(9, b"%PDF-1.4\ngarbage")], "media_id long, payload binary"
    )
    (r,) = pdf_text(broken).collect()
    assert r.parse_error is not None and r.text is None
