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
    with pytest.raises(PngFormatError, match="interlace"):
        decode_png(_build(4, 4, 2, raw, interlace=1))
    with pytest.raises(PngFormatError, match="bit depth"):
        decode_png(_build(4, 4, 2, raw, depth=16))
    with pytest.raises(PngFormatError, match="implausible"):
        decode_png(_build(1 << 16, 1 << 16, 2, raw))


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
