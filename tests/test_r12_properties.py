"""Property-based tests for the r12 operators: the PNG/WAV header
parser recovers EVERY field the writer embeds (arbitrary dimensions,
rates, channel counts, extra/odd-sized chunks) and never raises on
arbitrary bytes; the NB ledger partials are additive under ANY
disjoint partition of a corpus (append order and split shape cannot
change a score).

The parser properties are pure Python (struct in, _parse_header out)
and run many examples; the NB additivity property runs Spark jobs per
example, so its example count is small.
"""

import struct

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from trade_data_collection_service_spark.ext.multimodal import (
    _parse_header,
)

_PNG_SIG = bytes.fromhex("89504e470d0a1a0a")


@settings(max_examples=300, deadline=None)
@given(
    w=st.integers(min_value=0, max_value=2**31 - 1),
    h=st.integers(min_value=0, max_value=2**31 - 1),
    bit_depth=st.sampled_from([1, 2, 4, 8, 16]),
    color_type=st.sampled_from([0, 2, 3, 4, 6]),
    trailer=st.binary(max_size=64),
)
def test_png_header_roundtrip(w, h, bit_depth, color_type, trailer):
    payload = (
        _PNG_SIG
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">II", w, h)
        + bytes([bit_depth, color_type, 0, 0, 0])
        + b"\x00" * 4
        + trailer
    )
    expect_ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    assert _parse_header(payload) == (
        "png",
        w,
        h,
        expect_ch,
        bit_depth,
        None,
        None,
    )


def _chunk(cid: bytes, body: bytes) -> bytes:
    return (
        cid
        + struct.pack("<I", len(body))
        + body
        + (b"\x00" if len(body) % 2 else b"")
    )


@settings(max_examples=300, deadline=None)
@given(
    ch=st.integers(min_value=1, max_value=8),
    rate=st.integers(min_value=1, max_value=384_000),
    bits=st.sampled_from([8, 16, 24, 32]),
    n_frames=st.integers(min_value=0, max_value=50),
    pre=st.lists(st.binary(max_size=9), max_size=3),
    mid=st.lists(st.binary(max_size=9), max_size=3),
)
def test_wav_header_roundtrip_with_extra_chunks(
    ch, rate, bits, n_frames, pre, mid
):
    """fmt/data located by chunk id through arbitrary unknown chunks
    (odd sizes exercise the RIFF pad byte), n_samples = data bytes
    over the embedded block_align."""
    block = ch * (bits // 8)
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * block, block, bits)
    data = bytes(n_frames * block)
    body = b"WAVE"
    for i, extra in enumerate(pre):
        body += _chunk(b"LST%d" % i, extra)
    body += _chunk(b"fmt ", fmt)
    for i, extra in enumerate(mid):
        body += _chunk(b"jk%02d" % i, extra)
    body += _chunk(b"data", data)
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    assert _parse_header(payload) == (
        "wav",
        None,
        None,
        ch,
        bits,
        rate,
        n_frames,
    )


@settings(max_examples=500, deadline=None)
@given(blob=st.binary(max_size=200))
def test_parser_never_raises_on_arbitrary_bytes(blob):
    kind = _parse_header(blob)[0]
    assert kind in ("png", "jpeg", "gif", "wav", "unknown")


@settings(max_examples=500, deadline=None)
@given(blob=st.binary(max_size=80))
def test_parser_never_raises_on_magic_prefixed_garbage(blob):
    # adversarial: valid magics, garbage after — the truncated-slice
    # struct.unpack paths must degrade, not raise
    for prefix in (
        _PNG_SIG,
        b"RIFF",
        b"RIFF\x10\x00\x00\x00WAVE",
        b"\xff\xd8",
        b"\xff\xd8\xff\xe0",
        b"GIF87a",
        b"GIF89a",
    ):
        kind = _parse_header(prefix + blob)[0]
        assert kind in ("png", "jpeg", "gif", "wav", "unknown")


_SLOW = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@_SLOW
@given(
    assign=st.lists(
        st.integers(min_value=0, max_value=2), min_size=30, max_size=30
    ),
    order=st.permutations([0, 1, 2]),
)
def test_nb_ledger_additive_under_any_split(spark, tmp_path_factory, assign, order):
    """Partition 30 fixture docs into base + two appended batches by
    an ARBITRARY assignment, append in an arbitrary order: the served
    scores must equal a fresh single build over the same docs (the
    additivity contract the ledger's partials rest on).  Empty
    batches are skipped (append of zero docs is a no-op by contract);
    an empty base falls back to putting everything in base."""
    from pyspark.sql import functions as F

    from trade_data_collection_service_spark.ext.text import (
        append_to_nb_index,
        nb_score_indexed,
        write_nb_index,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .orderBy("doc_id")
        .limit(30)
        .localCheckpoint(eager=True)
    )
    ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    groups = {g: [i for i, a in zip(ids, assign) if a == g] for g in (0, 1, 2)}
    if not groups[0]:
        groups[0] = ids
        groups[1] = groups[2] = []
    base = str(tmp_path_factory.mktemp("nbprop")) + "/index"
    write_nb_index(docs.filter(F.col("doc_id").isin(groups[0])), base)
    for g in order:
        if g == 0 or not groups[g]:
            continue
        append_to_nb_index(
            docs.filter(F.col("doc_id").isin(groups[g])),
            base,
            batch_id=f"b{g}",
        )
    ref = str(tmp_path_factory.mktemp("nbprop")) + "/index"
    write_nb_index(docs, ref)
    got = sorted(
        tuple(r) for r in nb_score_indexed(spark, base, docs).collect()
    )
    want = sorted(
        tuple(r) for r in nb_score_indexed(spark, ref, docs).collect()
    )
    assert got == want
