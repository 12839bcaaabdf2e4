"""Markdown / PDF -> text ingestion (the reference's .md/.pdf -> text
modality mapping, utils/file_extensions.py:13-29)."""

from __future__ import annotations

import hashlib

import pytest

from smse_backend_spark.sources.textdoc import (
    encode_pdf_text,
    extract_text,
    ingest_text_documents,
    markdown_to_text,
    pdf_extract_text,
)


def test_pdf_roundtrip_uncompressed_and_flate():
    text = ("Line one with (parens) and \\ backslash.\n"
            "Second line.\nThird: latin-1 chars like é survive.")
    for compress in (False, True):
        assert pdf_extract_text(encode_pdf_text(text, compress)) == text


def test_pdf_rejects_other_filters_loudly():
    buf = encode_pdf_text("x").replace(
        b"<< /Length", b"<< /Filter /LZWDecode /Length"
    )
    with pytest.raises(ValueError, match="LZWDecode"):
        pdf_extract_text(buf)
    with pytest.raises(ValueError, match="not a PDF"):
        pdf_extract_text(b"plain bytes")


def test_pdf_string_escapes():
    # octal, newline escape, nested-free parens
    buf = encode_pdf_text("a(b)c\\d\ne")
    assert pdf_extract_text(buf) == "a(b)c\\d\ne"


def test_markdown_strip_recovers_content():
    md = ("# Head\n\npara with **bold**, *it*, `code`, "
          "[text](http://u) and ![alt](i.png).\n\n- a\n- b\n\n> q\n\n"
          "```py\nx = 1\n```\n")
    out = markdown_to_text(md)
    assert out == ("Head\n\npara with bold, it, code, text and alt."
                   "\n\na\nb\n\nq\n\nx = 1")
    # plain text is a fixed point
    assert markdown_to_text("just words\nand lines") == \
        "just words\nand lines"


def test_extract_text_dispatch():
    assert extract_text("a.TXT", b"hi")[0] == "txt"
    assert extract_text("a.md", b"# hi")[1] == "hi"
    assert extract_text("a.pdf", encode_pdf_text("p"))[1] == "p"
    with pytest.raises(ValueError, match="text-modality"):
        extract_text("a.jpg", b"")


def test_mixed_dir_ingest_sha_invariant(spark, tmp_path):
    """One dir of .txt + .md + .pdf: every row's extracted text carries a
    kernel-computed sha256 that the JVM recomputation confirms (the F14
    invariant over a mixed-format ingest); non-text files quarantine."""
    from pyspark.sql import functions as F

    texts = {
        f"doc{i}": f"Document {i}.\nSecond line {i * 7}.\nEnd."
        for i in range(3)
    }
    for name, text in texts.items():
        (tmp_path / f"{name}.txt").write_text(text)
        (tmp_path / f"{name}.md").write_text(
            f"# {name}\n\n{text}\n"
        )
        (tmp_path / f"{name}.pdf").write_bytes(
            encode_pdf_text(text, compress=True)
        )
    (tmp_path / "skip.bin").write_bytes(b"\x00\x01")
    rows = ingest_text_documents(spark, str(tmp_path))
    collected = rows.collect()
    assert len(collected) == 9  # 3 formats x 3 docs, .bin quarantined
    # JVM sha2 must agree with the kernel's hashlib on every row
    bad = rows.filter(
        F.sha2(F.encode("content", "UTF-8"), 256) != F.col("content_sha256")
    ).count()
    assert bad == 0
    byname = {r["path"].rsplit("/", 1)[-1]: r for r in collected}
    for name, text in texts.items():
        assert byname[f"{name}.txt"]["content"] == text
        assert byname[f"{name}.pdf"]["content"] == text
        assert byname[f"{name}.md"]["content"] == f"{name}\n\n{text}"
        assert byname[f"{name}.pdf"]["content_sha256"] == hashlib.sha256(
            text.encode()
        ).hexdigest()
