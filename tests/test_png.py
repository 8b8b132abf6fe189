"""PNG codec tests: round-trips through the repo's own encoder, every
filter type against hand-filtered streams, unsupported-variant and
corruption hardening, and the multimodal integration (fallback flag
stays 0 for PNG rows)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from biglake_iceberg_pipeline_spark.operators.png import (
    SIGNATURE,
    PngFormatError,
    decode_png,
    encode_png,
)


def _rng(seed=7):
    return np.random.default_rng(seed)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _build(w, h, color, raw, depth=8, interlace=0, plte=None) -> bytes:
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace)
    out = SIGNATURE + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", plte)
    return out + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")


def _filter_rows(img: np.ndarray, ftype: int) -> bytes:
    """Apply ONE spec filter to every row (the encoder only emits
    filter 0, so this exercises the decoder's other four paths
    against an independent forward implementation)."""
    h, w, ch = img.shape
    flat = img.reshape(h, w * ch).astype(np.int16)
    out = bytearray()
    prev = np.zeros(w * ch, dtype=np.int16)
    for y in range(h):
        cur = flat[y]
        left = np.concatenate([np.zeros(ch, np.int16), cur[:-ch]])
        upleft = np.concatenate([np.zeros(ch, np.int16), prev[:-ch]])
        if ftype == 0:
            enc = cur
        elif ftype == 1:
            enc = cur - left
        elif ftype == 2:
            enc = cur - prev
        elif ftype == 3:
            enc = cur - ((left + prev) >> 1)
        elif ftype == 4:
            p = left + prev - upleft
            pa = np.abs(p - left)
            pb = np.abs(p - prev)
            pc = np.abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc),
                left,
                np.where(pb <= pc, prev, upleft),
            )
            enc = cur - pred
        out.append(ftype)
        out.extend((enc & 0xFF).astype(np.uint8).tobytes())
        prev = cur
    return bytes(out)


def test_rgb_roundtrip():
    img = _rng().integers(0, 256, (23, 17, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(img)), img)


def test_rgba_roundtrip_drops_alpha():
    img = _rng(1).integers(0, 256, (9, 31, 4), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(img)), img[:, :, :3])


def test_gray_roundtrip_replicates_channels():
    img = _rng(2).integers(0, 256, (12, 8), dtype=np.uint8)
    got = decode_png(encode_png(img))
    assert got.shape == (12, 8, 3)
    for c in range(3):
        assert np.array_equal(got[:, :, c], img)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("ch,color", [(1, 0), (2, 4), (3, 2), (4, 6)])
def test_every_filter_type_decodes_exactly(ftype, ch, color):
    img = _rng(ftype * 10 + ch).integers(
        0, 256, (11, 13, ch), dtype=np.uint8
    )
    raw = _filter_rows(img, ftype)
    got = decode_png(_build(13, 11, color, raw))
    if ch in (1, 2):  # gray / gray+alpha replicate the gray plane
        want = np.repeat(img[:, :, :1], 3, axis=2)
    elif ch == 3:
        want = img
    else:  # RGBA drops alpha
        want = img[:, :, :3]
    assert np.array_equal(got, want)


def test_mixed_filters_per_row():
    img = _rng(42).integers(0, 256, (10, 6, 3), dtype=np.uint8)
    flat = img.reshape(10, 18)
    # row filters cycle 0..4: stitch per-row encodings together
    out = bytearray()
    for y in range(10):
        one = _filter_rows(img[: y + 1], (y % 5))
        # take only the LAST row's bytes from a stream filtered with
        # this type (its prev row is the true predecessor)
        row = one[-(1 + 18):]
        out.extend(row)
    got = decode_png(_build(6, 10, 2, bytes(out)))
    assert np.array_equal(got, img)


def test_palette_decode():
    table = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]], np.uint8
    )
    idx = _rng(3).integers(0, 4, (7, 5), dtype=np.uint8)
    raw = b"".join(
        b"\x00" + idx[y].tobytes() for y in range(7)
    )
    got = decode_png(_build(5, 7, 3, raw, plte=table.tobytes()))
    assert np.array_equal(got, table[idx])


def test_palette_index_out_of_range_rejected():
    raw = b"\x00\x09"  # index 9, palette of 1 entry
    with pytest.raises(PngFormatError, match="palette index"):
        decode_png(_build(1, 1, 3, raw, plte=b"\x01\x02\x03"))


def test_unsupported_variants_raise():
    img = _rng(4).integers(0, 256, (4, 4, 3), dtype=np.uint8)
    raw = _filter_rows(img, 0)
    with pytest.raises(PngFormatError, match="bit depth"):
        decode_png(_build(4, 4, 2, raw, depth=4))
    with pytest.raises(PngFormatError, match="interlace"):
        decode_png(_build(4, 4, 2, raw, interlace=7))
    with pytest.raises(PngFormatError, match="palette"):
        decode_png(_build(4, 4, 3, raw, depth=16, plte=b"\x00" * 768))
    with pytest.raises(PngFormatError, match="implausible"):
        decode_png(_build(1 << 16, 1 << 16, 2, raw))
    # a sequential-sized stream DECLARED interlaced has the wrong
    # per-pass byte layout: rejected, never misdecoded
    with pytest.raises(PngFormatError):
        decode_png(_build(4, 4, 2, raw, interlace=1))


def test_corruption_rejected_not_crashed():
    img = _rng(5).integers(0, 256, (6, 6, 3), dtype=np.uint8)
    good = encode_png(img)
    # signature
    with pytest.raises(PngFormatError):
        decode_png(b"\x89PNX" + good[4:])
    # flip a byte inside IDAT: CRC mismatch
    bad = bytearray(good)
    bad[len(good) // 2] ^= 0xFF
    with pytest.raises(PngFormatError):
        decode_png(bytes(bad))
    # truncation at every eighth byte: typed error, never IndexError
    for cut in range(8, len(good), 8):
        with pytest.raises(PngFormatError):
            decode_png(good[:cut])
    # inflate-size mismatch (one scanline short)
    raw = _filter_rows(img, 0)
    with pytest.raises(PngFormatError, match="inflated size"):
        decode_png(_build(6, 6, 2, raw[: -(1 + 18)]))
    # unknown filter type
    with pytest.raises(PngFormatError, match="filter type"):
        decode_png(_build(6, 6, 2, b"\x07" + raw[1:]))


def test_multimodal_png_is_real_decode_not_fallback():
    from biglake_iceberg_pipeline_spark.operators.multimodal import (
        decode_image,
    )

    img = _rng(6).integers(0, 256, (16, 24, 3), dtype=np.uint8)
    feats = decode_image(encode_png(img))
    assert feats[-1] == 1.0  # real decode, not byte-stats
    assert feats[0] == 24.0 and feats[1] == 16.0
    # interlaced PNG still degrades to the FLAGGED fallback
    raw = _filter_rows(img, 0)
    feats2 = decode_image(_build(24, 16, 2, raw, interlace=1))
    assert feats2[-1] == 0.0


def test_extract_features_png_rows_flagged_real(spark):
    """Spark-side plumbing: PNG payloads through the Arrow-batched
    mapInPandas extractor carry the real-decode flag; a corrupt row
    degrades to the flagged fallback WITHOUT failing the task."""
    from biglake_iceberg_pipeline_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_features,
    )

    img = _rng(8).integers(0, 256, (8, 8, 3), dtype=np.uint8)
    good = encode_png(img)
    corrupt = good[:-10]
    rows = [
        (1, bytearray(good), "image/png", 8, 8),
        (2, bytearray(corrupt), "image/png", 8, 8),
    ]
    out = {
        r["media_id"]: r["features"]
        for r in extract_features(
            spark.createDataFrame(rows, MEDIA_SCHEMA)
        ).collect()
    }
    assert out[1][-1] == 1.0
    assert out[2][-1] == 0.0


def test_zlib_bomb_rejected_before_allocation():
    """A 1x1 IHDR whose IDAT inflates to ~64 MB must be rejected by
    the bounded inflate (typed error), never materialized
    (/code-review r10: an unbounded zlib.decompress would OOM the
    executor before the size check ran)."""
    bomb = zlib.compress(b"\x00" * (64 << 20), 9)  # ~64 KB compressed
    payload = _build(1, 1, 0, bomb)
    with pytest.raises(PngFormatError, match="inflates past"):
        decode_png(payload)


def test_trailing_idat_garbage_rejected():
    img = _rng(9).integers(0, 256, (3, 3, 3), dtype=np.uint8)
    raw = _filter_rows(img, 0)
    with pytest.raises(PngFormatError):
        decode_png(_build(3, 3, 2, raw + b"\x00" * 8))


def test_truncated_idat_stream_rejected_even_when_bytes_complete():
    """Regression (/code-review r10 second pass): a deflate stream cut
    AFTER all expected output bytes were produced (adler32 trailer
    missing, d.eof False) must still raise — the bounded inflate would
    otherwise silently decode a corrupt payload the unbounded
    zlib.decompress used to reject."""
    img = _rng(11).integers(0, 256, (1, 1), dtype=np.uint8)
    raw = b"\x00" + img.tobytes()
    full = zlib.compress(raw)
    for cut in range(4, len(full)):
        d = zlib.decompressobj()
        out = d.decompress(full[:cut], len(raw) + 1)
        if len(out) == len(raw) and not d.eof:
            payload = (
                SIGNATURE
                + _chunk(
                    b"IHDR",
                    struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0),
                )
                + _chunk(b"IDAT", full[:cut])
                + _chunk(b"IEND", b"")
            )
            with pytest.raises(PngFormatError, match="truncated IDAT"):
                decode_png(payload)
            break
    else:
        pytest.skip("no cut point yields complete bytes w/o eof")


# ---------------------------------------------------------------------
# Adam7 + 16-bit (VERDICT r10 item 7) — pinned against an INDEPENDENT
# forward implementation: the test builds interlaced / 16-bit payloads
# by its own pass-extraction + filtering, never via the module encoder.
# ---------------------------------------------------------------------

_ADAM7_REF = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _interlace_rows(img: np.ndarray, ftype: int) -> bytes:
    """Forward Adam7: extract each pass sub-image and filter it
    independently (prev row = previous row of the PASS)."""
    out = bytearray()
    for x0, y0, dx, dy in _ADAM7_REF:
        sub = img[y0::dy, x0::dx]
        if sub.shape[0] and sub.shape[1]:
            out.extend(_filter_rows(sub, ftype))
    return bytes(out)


def _filter_rows16(img16: np.ndarray, ftype: int) -> bytes:
    """Forward filter for 16-bit samples: the spec filters BYTES, so
    expand to the big-endian byte stream and filter with bpp =
    channels*2 — expressed here by viewing each byte as a lane."""
    h, w, ch = img16.shape
    be = img16.astype(">u2").view(np.uint8).reshape(h, w, ch * 2)
    return _filter_rows(be, ftype)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_adam7_rgb_roundtrip_every_filter(ftype):
    img = _rng(70 + ftype).integers(0, 256, (13, 11, 3), dtype=np.uint8)
    raw = _interlace_rows(img, ftype)
    got = decode_png(_build(11, 13, 2, raw, interlace=1))
    assert np.array_equal(got, img)


@pytest.mark.parametrize("ch,color", [(1, 0), (2, 4), (3, 2), (4, 6)])
def test_adam7_all_color_types(ch, color):
    img = _rng(80 + ch).integers(0, 256, (16, 16, ch), dtype=np.uint8)
    raw = _interlace_rows(img, 4)  # Paeth everywhere
    got = decode_png(_build(16, 16, color, raw, interlace=1))
    if ch in (1, 2):
        want = np.repeat(img[:, :, :1], 3, axis=2)
    elif ch == 3:
        want = img
    else:
        want = img[:, :, :3]
    assert np.array_equal(got, want)


def test_adam7_small_images_skip_empty_passes():
    # 1x1..7x3: several passes are EMPTY; decode must consume exactly
    # the non-empty passes' bytes
    for w, h in [(1, 1), (2, 2), (3, 1), (1, 5), (7, 3), (5, 5)]:
        img = _rng(w * 10 + h).integers(0, 256, (h, w, 3), dtype=np.uint8)
        raw = _interlace_rows(img, 1)
        got = decode_png(_build(w, h, 2, raw, interlace=1))
        assert np.array_equal(got, img), (w, h)


def test_adam7_palette():
    img_idx = _rng(91).integers(0, 5, (10, 9, 1), dtype=np.uint8)
    plte = bytes(range(15))  # 5 RGB entries
    raw = _interlace_rows(img_idx, 2)
    got = decode_png(_build(9, 10, 3, raw, interlace=1, plte=plte))
    table = np.frombuffer(plte, np.uint8).reshape(5, 3)
    assert np.array_equal(got, table[img_idx[:, :, 0]])


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_16bit_rgb_high_byte_every_filter(ftype):
    img16 = _rng(60 + ftype).integers(
        0, 65536, (9, 7, 3), dtype=np.uint16
    )
    raw = _filter_rows16(img16, ftype)
    got = decode_png(_build(7, 9, 2, raw, depth=16))
    assert np.array_equal(got, (img16 >> 8).astype(np.uint8))


def test_16bit_gray_and_rgba():
    g16 = _rng(66).integers(0, 65536, (8, 6, 1), dtype=np.uint16)
    raw = _filter_rows16(g16, 3)
    got = decode_png(_build(6, 8, 0, raw, depth=16))
    assert np.array_equal(
        got, np.repeat((g16 >> 8).astype(np.uint8), 3, axis=2)
    )
    a16 = _rng(67).integers(0, 65536, (5, 5, 4), dtype=np.uint16)
    raw = _filter_rows16(a16, 4)
    got = decode_png(_build(5, 5, 6, raw, depth=16))
    assert np.array_equal(got, (a16[:, :, :3] >> 8).astype(np.uint8))


def test_16bit_adam7_combined():
    img16 = _rng(68).integers(0, 65536, (12, 10, 3), dtype=np.uint16)
    be = img16.astype(">u2").view(np.uint8).reshape(12, 10, 6)
    raw = bytearray()
    for x0, y0, dx, dy in _ADAM7_REF:
        sub = be[y0::dy, x0::dx]
        if sub.shape[0] and sub.shape[1]:
            raw.extend(_filter_rows(sub, (x0 + y0) % 5))
    got = decode_png(_build(10, 12, 2, bytes(raw), depth=16, interlace=1))
    assert np.array_equal(got, (img16 >> 8).astype(np.uint8))


def test_adam7_truncated_pass_rejected():
    img = _rng(93).integers(0, 256, (9, 9, 3), dtype=np.uint8)
    raw = _interlace_rows(img, 0)
    with pytest.raises(PngFormatError):
        decode_png(_build(9, 9, 2, raw[:-10], interlace=1))
