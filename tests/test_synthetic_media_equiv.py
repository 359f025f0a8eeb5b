"""Byte-exact equivalence of the r14-optimized Python synthesis
(`synthetic_media`, mapInPandas byte math) against the retained
Catalyst-expression twin (`_synthetic_media_expr`): same media_id set,
same media_type, same n_bytes, same md5 per payload — on the real
sf0.001 fixture AND a crafted edge battery covering every container
branch and the byte-level corners (multi-block zlib, JPEG category
0/7/8 diffs, GIF pixel padding + multi-sub-block streams, BMP stride
padding, both WAV channel parities x all four rates)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def _fingerprints(df):
    rows = (
        df.select(
            "media_id",
            "media_type",
            "n_bytes",
            F.md5(F.col("payload")).alias("digest"),
        )
        .orderBy("media_id")
        .collect()
    )
    return [
        (r["media_id"], r["media_type"], r["n_bytes"], r["digest"])
        for r in rows
    ]


def _assert_equivalent(spark, sf_dir):
    from trade_data_collection_service_spark.ext.multimodal import (
        _synthetic_media_expr,
        synthetic_media,
    )

    new = _fingerprints(synthetic_media(spark, sf_dir))
    old = _fingerprints(_synthetic_media_expr(spark, sf_dir))
    assert len(new) == len(old) and len(new) > 0
    for a, b in zip(new, old):
        assert a == b, f"payload diverged: new={a} expr={b}"


def test_synthesis_equivalent_on_fixture(spark, sf_dir):
    _assert_equivalent(spark, sf_dir)


# Edge battery: ids picked so every container branch and sub-branch
# fires.  Texts sized to hit the construction corners.
_EDGE_DOCS = [
    # PNG: grayscale (doc_id//4 even) and RGB (odd), text shorter than
    # one scanline, exactly one scanline, and multi-row
    (0, "a"),  # gray, width 16, 1-byte text
    (4, "b" * 16),  # RGB? (4//4=1 odd -> RGB), exactly min scanline
    (8, "c" * 100),  # gray multi-row
    (316 * 4, "d" * 40),  # wide grayscale PNG (width 329)
    # PNG multi-block zlib: filtered stream > 65535 bytes
    (16, "e" * 70000),
    # JPEG: category 0 (byte 128), category 8 (byte 0 -> dc -128),
    # category 7 (byte 255 -> dc 127), mixed + padding tiles
    (2, "\x80"),
    (6, "\x00\xff\x80A"),
    (10, "z" * 130),  # many tiles, padding tiles at the tail
    # GIF: padding path (npix >> text), multi-sub-block stream
    (1, "short"),
    (17, "y" * 500),
    (33, "x"),
    # BMP: stride-padding corners (bw*3 % 4 in each residue)
    (3, "p" * 11),
    (19, "q" * 200),
    (35, "r"),
    # WAV: both channel parities x all four rates, odd/even text len
    (5, "s" * 7),
    (7, "t" * 8),
    (9, "u" * 9),
    (11, "v" * 10),
    (13, "w" * 11),
    (15, "pad"),
    (21, "mono"),
    (23, "stereo!"),
    # non-ASCII text: both engines operate on the UTF-8 bytes
    (12, "héllo wörld ✓"),
    (25, "héllo ✓"),
]


def test_synthesis_equivalent_on_edge_battery(spark, tmp_path):
    docs = spark.createDataFrame(
        [(int(i), t) for i, t in _EDGE_DOCS], "doc_id long, text string"
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    _assert_equivalent(spark, str(tmp_path))


def test_types_prefilter_matches_post_filter(spark, sf_dir):
    """synthetic_media(types=...) returns exactly the rows the
    unfiltered table holds for those media_types (the predicate is
    doc_id arithmetic below the Python stage; results must be the
    same set)."""
    from trade_data_collection_service_spark.ext.multimodal import (
        synthetic_media,
    )

    for types in (
        ("image/png",),
        ("image/gif",),
        ("audio/wav", "image/bmp"),
    ):
        pre = _fingerprints(synthetic_media(spark, sf_dir, types=types))
        post = _fingerprints(
            synthetic_media(spark, sf_dir).filter(
                F.col("media_type").isin(*types)
            )
        )
        assert pre == post and len(pre) > 0
