"""Property-based tests for the r13 operators: the JPEG marker walk
recovers the SOF frame header through arbitrary interleaved segments
and never raises on marker-prefixed garbage (VERDICT r12 #5)."""

import struct

from hypothesis import given, settings
from hypothesis import strategies as st

from trade_data_collection_service_spark.ext.multimodal import (
    _parse_header,
)


def _segment(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


@settings(max_examples=300, deadline=None)
@given(
    w=st.integers(min_value=0, max_value=0xFFFF),
    h=st.integers(min_value=0, max_value=0xFFFF),
    precision=st.sampled_from([8, 12, 16]),
    ncomp=st.integers(min_value=1, max_value=4),
    sof_marker=st.sampled_from([0xC0, 0xC1, 0xC2, 0xC3]),
    pre=st.lists(st.binary(max_size=12), max_size=3),
    trailer=st.binary(max_size=64),
)
def test_jpeg_sof_roundtrip_through_arbitrary_segments(
    w, h, precision, ncomp, sof_marker, pre, trailer
):
    """SOI, then arbitrary APPn/COM segments (unknown content, any
    size), then a SOF0-3 frame header: the walk must skip every
    preceding segment by its declared length and read back exactly
    the embedded precision/height/width/components; trailing bytes
    after EOI are ignored."""
    payload = b"\xff\xd8"
    for i, body in enumerate(pre):
        payload += _segment(0xE0 + (i % 16), body)  # APPn
    sof_body = (
        bytes([precision])
        + struct.pack(">HH", h, w)
        + bytes([ncomp])
        + bytes([1, 0x11, 0]) * ncomp
    )
    payload += _segment(sof_marker, sof_body)
    payload += b"\xff\xd9" + trailer
    assert _parse_header(payload) == (
        "jpeg",
        w,
        h,
        ncomp,
        precision,
        None,
        None,
    )


@settings(max_examples=300, deadline=None)
@given(
    segments=st.lists(
        st.tuples(
            st.integers(min_value=0x01, max_value=0xFE),
            st.binary(max_size=16),
        ),
        max_size=4,
    ),
    tail=st.binary(max_size=40),
)
def test_jpeg_walk_never_raises_on_arbitrary_marker_soup(segments, tail):
    """Arbitrary marker ids (standalone, reserved, SOS, EOI, fill
    bytes) with arbitrary bodies, then raw garbage: the walk must
    terminate and return a valid kind — never raise, never loop."""
    payload = b"\xff\xd8"
    for marker, body in segments:
        payload += _segment(marker, body)
    payload += tail
    out = _parse_header(payload)
    assert out[0] in ("jpeg", "unknown")
    if out[0] == "jpeg":
        # a jpeg verdict always carries the frame fields
        assert out[1] is not None and out[2] is not None


@settings(max_examples=200, deadline=None)
@given(blob=st.binary(max_size=60))
def test_jpeg_declared_length_lies_degrade_cleanly(blob):
    """Segments whose declared length exceeds the payload (or is < 2)
    must degrade to 'unknown', not read out of bounds."""
    for size in (0, 1, 2, 200, 0xFFFF):
        payload = (
            b"\xff\xd8\xff\xe0" + struct.pack(">H", size) + blob
        )
        assert _parse_header(payload)[0] in ("jpeg", "unknown")


# --- sparse NB scoring (VERDICT r12 #7): the sparse identity is a
# decimal-exact regrouping of the dense sum — same scores, same
# argmax, on any corpus shape ---


def _nb_rows(df):
    return [
        (r["doc_id"], r["actual_source"], r["pred_source"], r["score"],
         r["correct"])
        for r in df.collect()
    ]


def test_sparse_nb_equals_dense_on_fixture(spark, sf_dir):
    from trade_data_collection_service_spark.ext.text import source_nb

    dense = _nb_rows(source_nb(spark, sf_dir, sparse=False))
    sparse = _nb_rows(source_nb(spark, sf_dir, sparse=True))
    assert sparse == dense  # bit-equal doubles, identical argmax


def test_sparse_nb_equals_dense_on_disjoint_vocabularies(spark):
    """The regime the sparse path exists for: every source has its
    own vocabulary, so the inner term join emits ~1 source per term
    instead of n_sources."""
    from pyspark.sql import functions as F

    from trade_data_collection_service_spark.ext.text import (
        _nb_model,
        _nb_score,
        _nb_stats,
    )

    docs = spark.createDataFrame(
        [
            (i, f"s{i % 5}", " ".join(f"s{i % 5}w{(i * j) % 13}"
                                      for j in range(20)))
            for i in range(120)
        ],
        "doc_id long, source string, text string",
    )
    census, partials = _nb_model(docs)
    census = census.localCheckpoint(eager=False)
    stats, vocab = _nb_stats(census, partials)
    dense = _nb_rows(_nb_score(docs, census, stats, vocab, sparse=False))
    sparse = _nb_rows(_nb_score(docs, census, stats, vocab, sparse=True))
    assert sparse == dense
    # disjoint vocabularies classify perfectly in both paths
    assert all(r[4] for r in dense)
    # and the sparse present-term join genuinely prunes: the census
    # carries each term under exactly one source
    one_source = (
        census.groupBy("term")
        .agg(F.countDistinct("source").alias("n"))
        .agg(F.max("n"))
        .first()[0]
    )
    assert one_source == 1


def test_sparse_nb_indexed_serve_matches_dense(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    from trade_data_collection_service_spark.ext.text import (
        nb_score_indexed,
        write_nb_index,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    path = f"{tmp_path}/nbidx"
    write_nb_index(docs, path)
    batch = docs.filter(F.col("doc_id") % 7 == 0)
    dense = _nb_rows(nb_score_indexed(spark, path, batch, sparse=False))
    sparse = _nb_rows(nb_score_indexed(spark, path, batch, sparse=True))
    assert sparse == dense


@settings(max_examples=300, deadline=None)
@given(
    w=st.integers(min_value=0, max_value=0xFFFF),
    h=st.integers(min_value=0, max_value=0xFFFF),
    colres=st.integers(min_value=1, max_value=8),
    flags=st.integers(min_value=0, max_value=1),
    gct=st.integers(min_value=0, max_value=7),
    sig=st.sampled_from([b"GIF87a", b"GIF89a"]),
    trailer=st.binary(max_size=64),
)
def test_gif_lsd_roundtrip(w, h, colres, flags, gct, sig, trailer):
    """The Logical Screen Descriptor parse recovers width/height and
    the colour-resolution bits regardless of the other packed-byte
    fields (GCT flag/size, sort bit) and any trailing data."""
    packed = (flags << 7) | ((colres - 1) << 4) | gct
    payload = (
        sig
        + struct.pack("<HH", w, h)
        + bytes([packed, 0, 0])
        + trailer
    )
    assert _parse_header(payload) == (
        "gif", w, h, 1, colres, None, None,
    )
