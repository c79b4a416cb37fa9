"""Charset sniffing/decoding (core/charset.py): WHATWG precedence
(BOM > header > meta prescan > windows-1252), the latin1==cp1252 web
rule, real multi-byte codecs, bounded prescan, dirty-byte safety, and
the Spark binary->text bridge."""

import pytest

from article_extractor_spark.core.charset import (
    PRESCAN_BYTES, decode_html, normalize_label, sniff_charset)


def test_bom_beats_everything():
    assert sniff_charset(b"\xef\xbb\xbfhello",
                         "text/html; charset=shift_jis") == "utf-8"
    assert sniff_charset(b"\xff\xfeh\x00") == "utf-16-le"
    assert sniff_charset(b"\xfe\xffh\x00") == "utf-16-be"
    text, enc = decode_html("﻿hé".encode("utf-8"))
    assert (text, enc) == ("hé", "utf-8")  # BOM stripped
    text, enc = decode_html("hé".encode("utf-16-le"),)
    # no BOM, no header, no meta: 1252 fallback mangles — by design
    assert enc == "windows-1252"


def test_header_beats_meta():
    data = b'<meta charset="utf-8"><p>\x82\xa0</p>'
    assert sniff_charset(data, "text/html; charset=Shift_JIS") \
        == "shift_jis"
    text, enc = decode_html(data, "text/html; charset=shift_jis")
    assert "あ" in text  # hiragana A from 0x82A0


def test_meta_variants():
    assert sniff_charset(b'<META CHARSET=UTF-8>') == "utf-8"
    assert sniff_charset(
        b"<meta charset='windows-1251'>") == "cp1251"
    assert sniff_charset(
        b'<meta http-equiv="Content-Type" '
        b'content="text/html; charset=iso-8859-1">') == "windows-1252"
    # meta utf-16 is a lie: the prescan read it as ASCII
    assert sniff_charset(b'<meta charset="utf-16le">') == "utf-8"


def test_prescan_is_bounded():
    filler = b"<!-- " + b"x" * PRESCAN_BYTES + b" -->"
    late = filler + b'<meta charset="koi8-r">'
    assert sniff_charset(late) == "windows-1252"
    early = b'<meta charset="koi8-r">' + filler
    assert sniff_charset(early) == "koi8-r"


def test_whatwg_latin1_is_cp1252():
    for label in ("latin1", "ISO-8859-1", "ascii", "US-ASCII", "l1"):
        assert normalize_label(label) == "windows-1252"
    # the practical consequence: 0x93/0x94 smart quotes decode
    text, enc = decode_html(
        b'<meta charset="iso-8859-1">he said \x93hi\x94')
    assert enc == "windows-1252" and "“hi”" in text


def test_label_table_and_unknowns():
    assert normalize_label("GB2312") == "gbk"
    assert normalize_label("Shift-JIS") == "shift_jis"
    assert normalize_label("totally-made-up") is None
    assert normalize_label("rot13") is None  # transform codecs banned
    assert normalize_label(None) is None
    # unknown label in meta -> fallback, never a crash
    assert sniff_charset(b'<meta charset="qqq-999">') == "windows-1252"


def test_multibyte_decodes():
    jp = "こんにちは"
    text, enc = decode_html(
        b'<meta charset="euc-jp">' + jp.encode("euc_jp"))
    assert enc == "euc_jp" and jp in text
    zh = "中文网页"
    text, enc = decode_html(
        b'<meta charset="gb2312">' + zh.encode("gbk"))
    assert enc == "gbk" and zh in text
    ru = "привет"
    text, enc = decode_html(
        None or b'<meta charset="koi8-r">' + ru.encode("koi8_r"))
    assert enc == "koi8-r" and ru in text


def test_dirty_bytes_never_raise():
    text, enc = decode_html(
        b'<meta charset="utf-8">ok \xff\xfe\xf0 broken')
    assert enc == "utf-8" and "ok " in text and "�" in text
    assert decode_html(b"")[1] == "windows-1252"


def test_spark_bridge(request):
    from pyspark.sql import SparkSession

    from article_extractor_spark.core.charset import decode_html_bytes

    spark = (SparkSession.builder.master("local[2]")
             .appName("aes-charset-tests")
             .config("spark.sql.shuffle.partitions", "2")
             .config("spark.ui.enabled", "false").getOrCreate())
    rows = [
        ("u1", b'<meta charset="utf-8">caf\xc3\xa9', None),
        ("u2", b"he said \x93hi\x94", "text/html; charset=latin1"),
        ("u3", "﻿BOM wins".encode("utf-8"),
         "text/html; charset=shift_jis"),
        ("u4", None, None),
    ]
    df = spark.createDataFrame(
        rows, "url string, body binary, content_type string")
    got = {r["url"]: (r["html"], r["encoding"]) for r in
           decode_html_bytes(df, content_type_col="content_type")
           .collect()}
    assert got["u1"] == ("<meta charset=\"utf-8\">café", "utf-8")
    assert got["u2"] == ("he said “hi”", "windows-1252")
    assert got["u3"] == ("BOM wins", "utf-8")
    assert got["u4"] == ("", "windows-1252")
