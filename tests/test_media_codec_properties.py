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


# ---------------------------------------------------------------
# reference JPEG encoder (spec-forward: canonical Huffman per C.2,
# bit packing per F.1.2, byte stuffing, restart markers)
# ---------------------------------------------------------------


def _canon(counts, syms):
    """Canonical code assignment, written fresh from spec C.2:
    returns {symbol: (code, length)}."""
    out = {}
    code = 0
    it = iter(syms)
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[next(it)] = (code, length)
            code += 1
        code <<= 1
    return out


def test_jpeg_huff_canonical_matches_published_table():
    """Pin the canonical assignment against the PUBLISHED Annex K.3
    typical luminance DC table: counts [0,1,5,1,1,1,1,1,1,0,...],
    symbols 0..11 — the spec lists the resulting codes explicitly
    (00, 010..110, 1110, 11110, ...).  This keeps the encoder's and
    decoder's identical-looking canonical builders honest against an
    external constant rather than each other."""
    from trade_data_collection_service_spark.ext.multimodal import (
        _jpeg_huff_table,
    )

    counts = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
    syms = list(range(12))
    expect = {
        0: (0b00, 2),
        1: (0b010, 3),
        2: (0b011, 3),
        3: (0b100, 3),
        4: (0b101, 3),
        5: (0b110, 3),
        6: (0b1110, 4),
        7: (0b11110, 5),
        8: (0b111110, 6),
        9: (0b1111110, 7),
        10: (0b11111110, 8),
        11: (0b111111110, 9),
    }
    assert _canon(counts, syms) == expect
    dec_table = _jpeg_huff_table(counts, syms)
    assert dec_table == {
        (ln, code): s for s, (code, ln) in expect.items()
    }


class _JpegBitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, val, nbits):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((val >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                if self.acc == 0xFF:
                    self.buf.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def align(self):
        while self.n:
            self.put(1, 1)  # pad with 1-bits per the spec


def _mag_bits(v):
    s = abs(v).bit_length()
    return s, (v if v > 0 else v + (1 << s) - 1)


def _jpeg_encode_scan(blocks, dccodes, accodes, restart):
    """Entropy-code zigzag-quantized blocks: DC prediction with
    restart resets, run/size AC coding with ZRL and EOB."""
    out = bytearray()
    w = _JpegBitWriter()
    pred = 0
    for i, bz in enumerate(blocks):
        if restart and i and i % restart == 0:
            w.align()
            out += w.buf
            out += bytes([0xFF, 0xD0 + ((i // restart - 1) % 8)])
            w = _JpegBitWriter()
            pred = 0
        c, bits = _mag_bits(bz[0] - pred)
        pred = bz[0]
        code, ln = dccodes[c]
        w.put(code, ln)
        w.put(bits, c)
        k = 1
        while k < 64:
            run = 0
            while k < 64 and bz[k] == 0:
                k += 1
                run += 1
            if k == 64:
                code, ln = accodes[0x00]
                w.put(code, ln)  # EOB
                break
            while run > 15:
                code, ln = accodes[0xF0]
                w.put(code, ln)  # ZRL
                run -= 16
            s, bits = _mag_bits(bz[k])
            code, ln = accodes[(run << 4) | s]
            w.put(code, ln)
            w.put(bits, s)
            k += 1
    w.align()
    out += w.buf
    return bytes(out)


def _table_spec(symbols, order):
    """A complete canonical table over ``symbols``: unary-skewed
    lengths (1,2,...,n-1,n-1) when they fit, else uniform — both
    satisfy Kraft with equality.  ``order`` shuffles which symbol
    gets the short codes."""
    syms = sorted(symbols)
    syms = [syms[(i + order) % len(syms)] for i in range(len(syms))]
    n = len(syms)
    counts = [0] * 16
    if n == 1:
        counts[0] = 1
    elif n <= 12:
        for length in range(1, n - 1):
            counts[length - 1] = 1
        counts[n - 2] += 2
    else:
        length = max(1, (n - 1).bit_length())
        counts[length - 1] = n
    return counts, syms


def _seg(marker, body):
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _build_jpeg(w, h, quant_z, blocks, dc_spec, ac_spec, restart):
    out = b"\xff\xd8"
    out += _seg(0xDB, bytes([0x00]) + bytes(quant_z))
    out += _seg(
        0xC0,
        bytes([8]) + struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0]),
    )
    for tcth, (counts, syms) in ((0x00, dc_spec), (0x10, ac_spec)):
        out += _seg(0xC4, bytes([tcth]) + bytes(counts) + bytes(syms))
    if restart:
        out += _seg(0xDD, struct.pack(">H", restart))
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += _jpeg_encode_scan(
        blocks, _canon(*dc_spec), _canon(*ac_spec), restart
    )
    return out + b"\xff\xd9"


@settings(max_examples=120, deadline=None)
@given(
    mx=st.integers(min_value=1, max_value=4),
    my=st.integers(min_value=1, max_value=4),
    cropx=st.integers(min_value=0, max_value=7),
    cropy=st.integers(min_value=0, max_value=7),
    restart=st.sampled_from([0, 1, 2, 5]),
    dc_order=st.integers(min_value=0, max_value=11),
    ac_order=st.integers(min_value=0, max_value=11),
    data=st.data(),
)
def test_jpeg_coefficient_roundtrip_exact(
    mx, my, cropx, cropy, restart, dc_order, ac_order, data
):
    """Random quant tables, random sparse AC content, restart
    intervals, image crops and SHUFFLED multi-length canonical
    Huffman tables: the decoder must recover every dequantized
    coefficient integer-exactly (this isolates Huffman / bit order /
    unstuffing / prediction / zigzag / dequant from IDCT floats)."""
    import numpy as np

    from trade_data_collection_service_spark.ext.multimodal import (
        _JPEG_ZIGZAG,
        _jpeg_decode_blocks,
    )

    w, h = 8 * mx - cropx, 8 * my - cropy
    if w < 1 or h < 1:
        w, h = 8 * mx, 8 * my
    quant_z = data.draw(
        st.lists(
            st.integers(1, 255), min_size=64, max_size=64
        )
    )
    nblocks = mx * my
    blocks = []
    for _ in range(nblocks):
        bz = [0] * 64
        bz[0] = data.draw(st.integers(-500, 500))
        for _ in range(data.draw(st.integers(0, 6))):
            k = data.draw(st.integers(1, 63))
            v = data.draw(st.integers(-255, 255))
            bz[k] = v
        blocks.append(bz)
    dc_syms = {_mag_bits(b[0] - p)[0] for b, p in zip(
        blocks, [0] + [b[0] for b in blocks[:-1]]
    )} | {_mag_bits(b[0])[0] for b in blocks} | {0}
    ac_syms = {0x00, 0xF0}
    for bz in blocks:
        k = 1
        while k < 64:
            run = 0
            while k < 64 and bz[k] == 0:
                k += 1
                run += 1
            if k == 64:
                break
            run %= 16
            ac_syms.add((run << 4) | _mag_bits(bz[k])[0])
            k += 1
    payload = _build_jpeg(
        w, h, quant_z, blocks,
        _table_spec(dc_syms, dc_order), _table_spec(ac_syms, ac_order),
        restart,
    )
    dec = _jpeg_decode_blocks(payload)
    assert dec is not None
    dw, dh, dblocks = dec
    assert (dw, dh) == (w, h) and len(dblocks) == nblocks
    for bz, nat in zip(blocks, dblocks):
        expect = np.zeros((8, 8), dtype=np.int64)
        for z in range(64):
            expect[divmod(_JPEG_ZIGZAG[z], 8)] = bz[z] * quant_z[z]
        assert (nat == expect).all()


@settings(max_examples=60, deadline=None)
@given(
    mx=st.integers(min_value=1, max_value=3),
    my=st.integers(min_value=1, max_value=3),
    data=st.data(),
)
def test_jpeg_pixel_decode_matches_reference_idct(mx, my, data):
    """Full pixel path vs an independent direct-sum IDCT (spec
    A.3.3 formula, not the decoder's matrix product): decoded ints
    must sit within half a grey level of the float reference (the
    two float evaluation orders agree to ~1e-12, so this proves the
    IDCT and level shift without rounding flakiness)."""
    import numpy as np

    from trade_data_collection_service_spark.ext.multimodal import (
        _JPEG_ZIGZAG,
        _jpeg_decode_pixels,
    )

    w, h = 8 * mx, 8 * my
    quant_z = data.draw(st.lists(st.integers(1, 32), min_size=64, max_size=64))
    blocks = []
    for _ in range(mx * my):
        bz = [0] * 64
        bz[0] = data.draw(st.integers(-80, 80))
        for _ in range(data.draw(st.integers(0, 4))):
            bz[data.draw(st.integers(1, 63))] = data.draw(
                st.integers(-40, 40)
            )
        blocks.append(bz)
    dc_syms = set(range(12))
    ac_syms = {0x00, 0xF0} | {
        (r << 4) | s for r in range(16) for s in range(1, 11)
    }
    payload = _build_jpeg(
        w, h, quant_z, blocks, _table_spec(dc_syms, 0),
        _table_spec(ac_syms, 0), 2,
    )
    pix = _jpeg_decode_pixels(payload)
    assert pix is not None and pix.shape == (h, w)
    x = np.arange(8)
    cu = np.where(x == 0, 1 / np.sqrt(2.0), 1.0)
    for i, bz in enumerate(blocks):
        nat = np.zeros((8, 8))
        for z in range(64):
            nat[divmod(_JPEG_ZIGZAG[z], 8)] = bz[z] * quant_z[z]
        ref = np.zeros((8, 8))
        for px in range(8):
            for py in range(8):
                ref[px, py] = 0.25 * np.sum(
                    cu[:, None] * cu[None, :] * nat
                    * np.cos((2 * px + 1) * x[:, None] * np.pi / 16)
                    * np.cos((2 * py + 1) * x[None, :] * np.pi / 16)
                )
        ref = np.clip(ref + 128, 0, 255)
        r, c = divmod(i, mx)
        got = pix[r * 8 : r * 8 + 8, c * 8 : c * 8 + 8]
        assert np.abs(got - ref).max() <= 0.5 + 1e-6


def test_jpeg_byte_stuffing_forced():
    """A Huffman layout that emits the all-ones 8-bit code as the
    first (byte-aligned) symbol forces a 0xFF byte into the scan —
    the encoder must stuff it and the decoder must unstuff it."""
    from trade_data_collection_service_spark.ext.multimodal import (
        _jpeg_decode_blocks,
    )

    # DC table: lengths 1..7 then two 8-bit codes; put category 5
    # on the all-ones code (0xFF) by symbol order
    counts = [1, 1, 1, 1, 1, 1, 1, 2] + [0] * 8
    dc_syms = [0, 1, 2, 3, 4, 6, 7, 8, 5]  # category 5 → code 0xFF
    ac_spec = _table_spec({0x00}, 0)
    quant_z = [1] * 64
    bz = [0] * 64
    bz[0] = 31  # category 5 diff → symbol 5 first in the stream
    payload = _build_jpeg(8, 8, quant_z, [bz], (counts, dc_syms), ac_spec, 0)
    # the stuffed 0x00 must be present right after the 0xFF code
    # byte (SOS segment = marker 2 + length 2 + body 6 = 10 bytes)
    scan = payload[payload.index(b"\xff\xda") + 10 : -2]
    assert scan[:2] == b"\xff\x00"
    dec = _jpeg_decode_blocks(payload)
    assert dec is not None and dec[2][0][0, 0] == 31


def test_jpeg_refusals_degrade_to_none():
    from trade_data_collection_service_spark.ext.multimodal import (
        _jpeg_decode_blocks,
        _jpeg_decode_pixels,
    )

    quant_z = [1] * 64
    bz = [0] * 64
    bz[0] = 10
    dc_spec = _table_spec(set(range(12)), 0)
    ac_spec = _table_spec({0x00}, 0)
    good = _build_jpeg(8, 8, quant_z, [bz], dc_spec, ac_spec, 0)
    assert _jpeg_decode_blocks(good) is not None
    # progressive (SOF2)
    assert _jpeg_decode_blocks(good.replace(b"\xff\xc0", b"\xff\xc2")) is None
    # three components in SOF
    bad = bytearray(good)
    i = bad.index(b"\xff\xc0") + 9
    bad[i] = 3
    assert _jpeg_decode_blocks(bytes(bad)) is None
    # 16-bit quant table (Pq=1)
    bad = bytearray(good)
    bad[bad.index(b"\xff\xdb") + 4] = 0x10
    assert _jpeg_decode_blocks(bytes(bad)) is None
    # truncated scan
    assert _jpeg_decode_pixels(good[:-4]) is None
    # arbitrary corruption must never raise
    for cut in (10, 30, len(good) - 8):
        _jpeg_decode_pixels(good[:cut])
