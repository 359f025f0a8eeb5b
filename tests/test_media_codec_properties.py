"""Property-based round-trips for the r14 compressed-payload
decoders: the PNG path (chunk walk → zlib inflate → five-filter
unfiltering) against a test-side reference ENCODER that uses real
zlib compression (dynamic-Huffman streams, not just the generator's
stored blocks), every PNG filter type and multi-IDAT splits; and the
GIF path against a real growing-dictionary LZW encoder (variable
code widths, width bumps, the 4096 cap, forced CLEARs, KwKwK).

The JVM-side synthetic generator only ever emits Sub/Up filters in
stored-mode zlib and literal-only LZW at code size 7 — these tests
are what prove the decoders are GENERAL, not co-designed to that
corpus.  Encoders here are written forward from the specs (PNG §9
filter definitions, GIF89a appendix LZW), independent of the decoder
code under test."""

from __future__ import annotations

import struct
import zlib

from hypothesis import given, settings
from hypothesis import strategies as st

from trade_data_collection_service_spark.ext.multimodal import (
    _decode_samples,
    _gif_decode_pixels,
    _lzw_decode,
    _png_inflate_pixels,
)

# ---------------------------------------------------------------
# reference PNG encoder (spec-forward, independent of the decoder)
# ---------------------------------------------------------------

_PNG_SIG = bytes.fromhex("89504e470d0a1a0a")
_CH = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _png_filter_rows(pix, w, ch, filters):
    """Apply the FORWARD filter transform per row (spec §9): the
    encoder subtracts the predictor the decoder must add back."""
    rb = w * ch
    raw = bytearray()
    prev = [0] * rb
    for r, ftype in enumerate(filters):
        row = pix[r * rb : (r + 1) * rb]
        raw.append(ftype)
        for x in range(rb):
            left = row[x - ch] if x >= ch else 0
            up = prev[x]
            upleft = prev[x - ch] if x >= ch else 0
            if ftype == 0:
                v = row[x]
            elif ftype == 1:
                v = row[x] - left
            elif ftype == 2:
                v = row[x] - up
            elif ftype == 3:
                v = row[x] - (left + up) // 2
            else:
                v = row[x] - _paeth(left, up, upleft)
            raw.append(v % 256)
        prev = row
    return bytes(raw)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return struct.pack(">I", len(data)) + ctype + data + b"\x00" * 4


def _build_png(w, h, color_type, pix, filters, level, idat_splits):
    ch = _CH[color_type]
    raw = _png_filter_rows(pix, w, ch, filters)
    z = zlib.compress(raw, level)  # REAL compression, checksum real
    ihdr = struct.pack(">II", w, h) + bytes([8, color_type, 0, 0, 0])
    out = _PNG_SIG + _chunk(b"IHDR", ihdr)
    # split the zlib stream across several IDAT chunks
    cuts = sorted(s % (len(z) + 1) for s in idat_splits)
    prev_cut = 0
    for cut in cuts + [len(z)]:
        out += _chunk(b"IDAT", z[prev_cut:cut])
        prev_cut = cut
    return out + _chunk(b"IEND", b"")


@settings(max_examples=150, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=11),
    h=st.integers(min_value=1, max_value=9),
    color_type=st.sampled_from([0, 2, 3, 4, 6]),
    level=st.integers(min_value=0, max_value=9),
    data=st.data(),
)
def test_png_roundtrip_all_filters_real_compression(
    w, h, color_type, level, data
):
    """Random pixels, a random filter type PER ROW (all five types),
    real zlib compression at every level, and multi-IDAT splits: the
    decoder must recover the exact pixel statistics.  This is the
    general-decoder proof the synthetic corpus (Sub/Up only, stored
    blocks) does not give."""
    ch = _CH[color_type]
    n = w * h * ch
    pix = bytes(
        data.draw(
            st.lists(
                st.integers(0, 255), min_size=n, max_size=n
            )
        )
    )
    filters = data.draw(
        st.lists(st.integers(0, 4), min_size=h, max_size=h)
    )
    splits = data.draw(st.lists(st.integers(0, 10_000), max_size=3))
    payload = _build_png(w, h, color_type, pix, filters, level, splits)
    dec = _decode_samples(payload)
    assert dec == (
        "png",
        n,
        sum(pix),
        sum(b * b for b in pix),
        max(pix),
    )


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=6),
    h=st.integers(min_value=1, max_value=6),
    data=st.data(),
)
def test_png_refusals_degrade_to_none(w, h, data):
    """Out-of-scope or corrupted PNGs return None, never raise:
    interlaced, 16-bit, bad filter tags, truncated IDAT, and a
    flipped byte inside the zlib stream (the Adler-32 check must
    catch it or the length check must)."""
    n = w * h
    pix = bytes(data.draw(st.lists(st.integers(0, 255), min_size=n, max_size=n)))
    good = _build_png(w, h, 0, pix, [0] * h, 6, [])
    assert _decode_samples(good) is not None
    # interlaced: IHDR interlace byte = 1 (sig 8 + len/type 8 +
    # w/h/depth/color/comp/filt 12 → data offset 12 of the IHDR)
    bad = bytearray(good)
    bad[8 + 8 + 12] = 1
    assert _decode_samples(bytes(bad)) is None
    # 16-bit depth
    bad = bytearray(good)
    bad[8 + 8 + 8] = 16
    assert _decode_samples(bytes(bad)) is None
    # corrupt one byte of the zlib stream (after IHDR chunk): either
    # inflate fails, the checksum fails, or the filter tag goes
    # out-of-range — all must degrade to None or still decode to a
    # VALID result if the flip hit a redundant byte; never raise
    idx = data.draw(st.integers(8 + 25 + 8, len(good) - 13))
    bad = bytearray(good)
    bad[idx] ^= 0xFF
    _decode_samples(bytes(bad))  # must not raise
    # truncated payload
    cut = data.draw(st.integers(0, len(good) - 1))
    _decode_samples(good[:cut])  # must not raise


# ---------------------------------------------------------------
# reference LZW encoder (GIF89a appendix, growing dictionary)
# ---------------------------------------------------------------


def _lzw_encode(pixels: bytes, mcs: int, clear_every: int = 0) -> bytes:
    """Real GIF LZW encoder: growing dictionary, variable code
    width (bump when the next free slot passes 2^width — the
    encoder runs one table entry AHEAD of the decoder, so its bump
    fires at (1<<width)+1 where the decoder's fires at 1<<width),
    4096 cap, optional forced CLEARs.  LSB-first bit packing."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    codes = []  # (code, width at emission)
    width = mcs + 1
    table = {bytes([i]): i for i in range(clear)}
    nxt = eoi + 1
    codes.append((clear, width))
    cur = b""
    emitted = 0

    def _bump():
        nonlocal nxt, width
        if nxt < 4096:
            nxt += 1
            if nxt == (1 << width) + 1 and width < 12:
                width += 1

    def _reset():
        nonlocal table, width, nxt, cur
        table = {bytes([i]): i for i in range(clear)}
        width = mcs + 1
        nxt = eoi + 1
        cur = b""

    for px in pixels:
        cand = cur + bytes([px])
        if cand in table:
            cur = cand
            continue
        codes.append((table[cur], width))
        emitted += 1
        if nxt < 4096:
            table[cand] = nxt
        _bump()
        cur = bytes([px])
        if clear_every and emitted % clear_every == 0:
            # flush pending char, then hard reset mid-stream
            codes.append((table[cur], width))
            _bump()
            codes.append((clear, width))
            _reset()
    if cur:
        codes.append((table[cur], width))
        _bump()  # the decoder adds an entry for this code too
    codes.append((eoi, width))
    acc = bits = 0
    out = bytearray()
    for code, w in codes:
        acc |= code << bits
        bits += w
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8
    if bits:
        out.append(acc & 0xFF)
    return bytes(out)


@settings(max_examples=200, deadline=None)
@given(
    mcs=st.integers(min_value=2, max_value=8),
    data=st.data(),
)
def test_lzw_roundtrip_growing_dictionary(mcs, data):
    """Random index streams over small alphabets force dictionary
    growth, width bumps and the KwKwK case (runs like 'aaaa' make
    the decoder resolve a code equal to its next free slot); the
    decoder must reproduce the stream byte-exactly."""
    alphabet = min(1 << mcs, data.draw(st.integers(1, 8)))
    n = data.draw(st.integers(0, 400))
    pixels = bytes(
        data.draw(
            st.lists(
                st.integers(0, alphabet - 1), min_size=n, max_size=n
            )
        )
    )
    clear_every = data.draw(st.sampled_from([0, 0, 7, 31]))
    enc = _lzw_encode(pixels, mcs, clear_every)
    assert _lzw_decode(enc, mcs) == pixels


def test_lzw_table_cap_and_long_stream():
    """A long low-entropy stream at minimum code size 2 drives the
    dictionary to the 4096-entry cap (width 3→12, then frozen):
    decoder and encoder must stay in sync across every bump and
    after the cap."""
    x = 1
    pixels = bytearray()
    for _ in range(40_000):
        x = (x * 1103515245 + 12345) & 0x7FFFFFFF
        pixels.append((x >> 16) % 4)
    pixels = bytes(pixels)
    # the deterministic LCG stream genuinely fills the dictionary:
    # replicating the phrase logic counts 4096 entries (verified at
    # authoring time); the round-trip therefore crosses every width
    # bump 3→12 and the frozen-table region
    enc = _lzw_encode(pixels, 2)
    assert _lzw_decode(enc, 2) == pixels


def test_lzw_malformed_streams_return_none():
    # first code after CLEAR may not reference the dictionary
    clear_code = bytes([0x80, 0x85])  # mcs 7: CLEAR then code 0x85 ≥ clear
    assert _lzw_decode(clear_code, 7) is None
    # a code beyond the next free slot is invalid: mcs 2 → width 3,
    # LSB-packed [literal 1, code 7] = 0b00111001; after one literal
    # the next free slot is 6, so 7 must be rejected
    assert _lzw_decode(bytes([0x39]), 2) is None
    # bad minimum code size
    assert _lzw_decode(b"\x00", 1) is None
    assert _lzw_decode(b"\x00", 12) is None


def _build_gif(iw, ih, mcs, pixels, gct_bits, exts, splits):
    """A complete GIF89a container: optional global colour table,
    arbitrary extension blocks before the image, random sub-block
    splits of the LZW stream."""
    packed = (0x80 | (gct_bits - 1)) if gct_bits else 0x22
    out = b"GIF89a" + struct.pack("<HH", iw, ih) + bytes([packed, 0, 0])
    if gct_bits:
        out += bytes(3 * (1 << gct_bits))  # zero table, size 2^bits
    for label, body in exts:
        out += bytes([0x21, label])
        for i in range(0, len(body), 255):
            blk = body[i : i + 255]
            out += bytes([len(blk)]) + blk
        out += b"\x00"
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, iw, ih) + b"\x00"
    out += bytes([mcs])
    data = _lzw_encode(pixels, mcs)
    pos = 0
    cuts = sorted({s % (len(data) + 1) for s in splits})
    for cut in cuts + [len(data)]:
        blk = data[pos:cut]
        while len(blk) > 255:
            out += bytes([255]) + blk[:255]
            blk = blk[255:]
        if blk:
            out += bytes([len(blk)]) + blk
        pos = cut
    return out + b"\x00\x3b"


@settings(max_examples=150, deadline=None)
@given(
    iw=st.integers(min_value=1, max_value=24),
    ih=st.integers(min_value=1, max_value=24),
    mcs=st.integers(min_value=2, max_value=8),
    gct_bits=st.sampled_from([0, 1, 3, 7, 8]),
    data=st.data(),
)
def test_gif_container_roundtrip(iw, ih, mcs, gct_bits, data):
    """Full-container GIF decode: global colour tables of every
    size, graphic-control/comment extensions interleaved before the
    image, arbitrary sub-block splits — the decoder walks all of it
    and recovers exact pixel-index statistics."""
    n = iw * ih
    alphabet = 1 << mcs
    pixels = bytes(
        data.draw(
            st.lists(
                st.integers(0, alphabet - 1), min_size=n, max_size=n
            )
        )
    )
    exts = data.draw(
        st.lists(
            st.tuples(
                st.integers(0x01, 0xFE), st.binary(max_size=600)
            ),
            max_size=2,
        )
    )
    splits = data.draw(st.lists(st.integers(0, 100_000), max_size=3))
    payload = _build_gif(iw, ih, mcs, pixels, gct_bits, exts, splits)
    dec = _decode_samples(payload)
    assert dec == (
        "gif",
        n,
        sum(pixels),
        sum(v * v for v in pixels),
        max(pixels),
    )


def test_gif_wrong_pixel_count_returns_none():
    """An LZW stream that decodes to the wrong number of pixels
    (truncated image data) must not produce statistics."""
    pixels = bytes(range(16))
    good = _build_gif(4, 4, 4, pixels, 3, [], [])
    assert _decode_samples(good) is not None
    short = _build_gif(4, 4, 4, pixels[:-2], 3, [], [])
    # container claims 4x4 but the stream carries 14 pixels
    assert _decode_samples(short) is None
    assert _gif_decode_pixels(short) is None
    assert _png_inflate_pixels(b"\x00") is None
