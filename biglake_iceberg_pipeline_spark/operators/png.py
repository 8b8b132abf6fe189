"""Pure-Python baseline PNG codec (stdlib zlib + numpy).

The container ships no image codecs; this module implements the
8- and 16-bit, sequential AND Adam7-interlaced subset of the public
PNG specification (RFC 2083 / ISO 15948) so the multimodal feature
extractor (operators/multimodal.py) really decodes PNG payloads
instead of downgrading them to byte statistics: signature + chunk
framing with CRC validation, IHDR parsing, IDAT concatenation + zlib
inflate, all FIVE scanline filter types (None / Sub / Up / Average /
Paeth), grayscale, gray+alpha, RGB, RGBA and palette color types,
Adam7's seven independently-filtered passes scattered back to the
full grid, and 16-bit samples folded to 8 via their high byte
(v >> 8). Bit-packed depths (1/2/4) raise ``PngFormatError`` —
callers keep their clearly-flagged fallback for those (same contract
as the JPEG codec's progressive-frame refusal).

Unfiltering is numpy-vectorized where the filter's data dependence
allows: None and Up are whole-row ops, Sub is a modular prefix sum
per channel lane (``np.add.accumulate`` on uint8 wraps exactly like
the spec's mod-256 arithmetic), and only Average/Paeth — whose
recurrence mixes the left AND upper neighbors — walk pixels
sequentially. On the cluster this runs inside Arrow-batched
mapInPandas, so throughput scales with executors; swap in a native
codec via multimodal._FORMAT_DECODERS for production throughput.

Reference parity: the reference pipeline delegates image handling to
external services; this is the self-contained counterpart the
multimodal plumbing needs (SURVEY.md §2 G12).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

#: Decode-side allocation guard: images claiming more pixels than
#: this are rejected before any buffer is sized from the untrusted
#: header (same bound as the JPEG codec).
MAX_PIXELS = 1 << 25  # ~33.5 MP ≈ 100 MB decoded RGB

SIGNATURE = b"\x89PNG\r\n\x1a\n"

#: color type -> samples per pixel (bytes per pixel is samples x
#: bytes-per-sample; the scanline filters operate on BYTES)
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

#: Adam7 pass grid: (x_start, y_start, x_step, y_step), spec order.
#: Each pass is an independently-filtered sub-image; empty passes
#: (a dimension too small to reach the start offset) emit no bytes.
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


class PngFormatError(ValueError):
    """Payload is not a PNG this codec can decode — either not PNG at
    all, a corrupt stream (bad CRC, truncated IDAT, wrong inflate
    size), or a valid-but-unsupported variant (bit-packed depth
    1/2/4). Callers catch THIS to take their flagged fallback."""


def _chunks(payload: bytes):
    """Yield (type, data) for each chunk, validating framing + CRC."""
    if payload[:8] != SIGNATURE:
        raise PngFormatError("missing PNG signature")
    pos = 8
    n = len(payload)
    while pos < n:
        if pos + 8 > n:
            raise PngFormatError("truncated chunk header")
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        end = pos + 8 + length
        if length > n or end + 4 > n:
            raise PngFormatError(f"truncated {ctype!r} chunk")
        data = payload[pos + 8 : end]
        (crc,) = struct.unpack_from(">I", payload, end)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise PngFormatError(f"CRC mismatch in {ctype!r} chunk")
        yield ctype, data
        pos = end + 4
        if ctype == b"IEND":
            return
    raise PngFormatError("missing IEND chunk")


def _paeth_row(cur: np.ndarray, prev: np.ndarray, bpp: int) -> None:
    """Unfilter one Paeth row IN PLACE: cur holds the filtered bytes;
    prev is the reconstructed predecessor row. Sequential in x (the
    left neighbor is an output), vectorized across the bpp channel
    lanes of each pixel."""
    w = cur.shape[0] // bpp
    c16 = cur.astype(np.int16).reshape(w, bpp)
    p16 = prev.astype(np.int16).reshape(w, bpp)
    out = np.zeros_like(c16)
    left = np.zeros(bpp, dtype=np.int16)
    upleft = np.zeros(bpp, dtype=np.int16)
    for x in range(w):
        up = p16[x]
        p = left + up - upleft
        pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - upleft)
        pred = np.where(
            (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, upleft)
        )
        out[x] = (c16[x] + pred) & 0xFF
        left = out[x]
        upleft = up
    cur[:] = out.reshape(-1).astype(np.uint8)


def _average_row(cur: np.ndarray, prev: np.ndarray, bpp: int) -> None:
    """Unfilter one Average row IN PLACE (floor((left+up)/2) — the
    mean is computed WITHOUT mod-256 per the spec)."""
    w = cur.shape[0] // bpp
    c16 = cur.astype(np.int16).reshape(w, bpp)
    p16 = prev.astype(np.int16).reshape(w, bpp)
    out = np.zeros_like(c16)
    left = np.zeros(bpp, dtype=np.int16)
    for x in range(w):
        out[x] = (c16[x] + ((left + p16[x]) >> 1)) & 0xFF
        left = out[x]
    cur[:] = out.reshape(-1).astype(np.uint8)


def _unfilter(raw: bytes, h: int, w: int, bpp: int) -> np.ndarray:
    """Reverse the per-scanline filters -> (h, w*bpp) uint8."""
    stride = w * bpp
    expect = h * (1 + stride)
    if len(raw) != expect:
        raise PngFormatError(
            f"inflated size {len(raw)} != expected {expect}"
        )
    data = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + stride)
    ftypes = data[:, 0]
    rows = data[:, 1:].copy()
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ft = int(ftypes[y])
        cur = rows[y]
        if ft == 0:
            pass
        elif ft == 1:  # Sub: modular prefix sum per channel lane
            for c in range(bpp):
                np.add.accumulate(cur[c::bpp], out=cur[c::bpp])
        elif ft == 2:  # Up
            cur += prev
        elif ft == 3:
            _average_row(cur, prev, bpp)
        elif ft == 4:
            _paeth_row(cur, prev, bpp)
        else:
            raise PngFormatError(f"unknown filter type {ft} at row {y}")
        prev = cur
    return rows


def decode_png(payload: bytes) -> np.ndarray:
    """Decode a PNG (8- or 16-bit, sequential or Adam7-interlaced)
    to an (H, W, 3) uint8 RGB array (alpha dropped, grayscale
    replicated, palette resolved, 16-bit folded via the high byte) —
    the shape contract shared with ``decode_jpeg`` / ``decode_bmp``
    so multimodal featurization is codec-agnostic."""
    ihdr = None
    idat: list[bytes] = []
    plte: bytes | None = None
    for ctype, data in _chunks(payload):
        if ctype == b"IHDR":
            if ihdr is not None:
                raise PngFormatError("duplicate IHDR")
            ihdr = data
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IDAT":
            idat.append(data)
        # ancillary chunks (tEXt, gAMA, tRNS...) skip: CRC was checked
    if ihdr is None or len(ihdr) != 13:
        raise PngFormatError("missing or malformed IHDR")
    w, h, depth, color, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if w <= 0 or h <= 0 or w * h > MAX_PIXELS:
        raise PngFormatError(f"implausible dimensions {w}x{h}")
    # byte-scaled bound: 16-bit RGBA costs 8x a gray plane per pixel,
    # and Adam7 holds raw + canvas concurrently — cap the DECODE
    # allocation, not just the pixel count (/code-review r11)
    ch_guess = _CHANNELS.get(color, 4)
    if w * h * ch_guess * (2 if depth == 16 else 1) > 3 * MAX_PIXELS:
        raise PngFormatError(
            f"decoded allocation too large for {w}x{h} "
            f"color={color} depth={depth}"
        )
    if comp != 0 or filt != 0:
        raise PngFormatError("nonstandard compression/filter method")
    if interlace not in (0, 1):
        raise PngFormatError(f"unknown interlace method {interlace}")
    if depth not in (8, 16):
        raise PngFormatError(f"bit depth {depth} not supported")
    if color not in _CHANNELS:
        raise PngFormatError(f"unknown color type {color}")
    if color == 3 and depth == 16:
        raise PngFormatError("16-bit palette images are not valid PNG")
    if not idat:
        raise PngFormatError("no IDAT data")
    channels = _CHANNELS[color]
    bpp = channels * (depth // 8)
    if interlace == 0:
        passes = [(0, 0, 1, 1, w, h)]
    else:
        passes = []
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw > 0 and ph > 0:
                passes.append((x0, y0, dx, dy, pw, ph))
    expect = sum(ph * (1 + pw * bpp) for *_g, pw, ph in passes)
    try:
        # bounded inflate: the expected size is known BEFORE
        # decompressing, so a zlib-bomb payload (tiny IHDR that
        # passes MAX_PIXELS, IDAT inflating to GBs) can never
        # allocate past expect+1 — an unbounded zlib.decompress
        # would OOM the executor before the size check ran
        # (/code-review r10)
        d = zlib.decompressobj()
        raw = d.decompress(b"".join(idat), expect + 1)
        if len(raw) > expect or d.unconsumed_tail:
            raise PngFormatError(
                f"IDAT inflates past expected {expect} bytes"
            )
        if not d.eof:
            # the deflate stream never terminated: a truncated IDAT
            # could still have produced every expected byte, and the
            # bounded inflate (unlike zlib.decompress) would not
            # notice — without this check a corrupt payload silently
            # decodes instead of taking the flagged fallback
            # (/code-review r10 second pass, reproduced)
            raise PngFormatError("truncated IDAT stream")
    except zlib.error as exc:
        raise PngFormatError(f"IDAT inflate failed: {exc}") from exc
    if interlace == 0:
        rows = _unfilter(raw, h, w, bpp)
    else:
        # each Adam7 pass unfilters as its own sub-image (prev row =
        # previous row OF THE PASS), then scatters onto the full grid
        canvas = np.zeros((h, w, bpp), dtype=np.uint8)
        pos = 0
        for x0, y0, dx, dy, pw, ph in passes:
            sz = ph * (1 + pw * bpp)
            sub = _unfilter(raw[pos : pos + sz], ph, pw, bpp)
            pos += sz
            canvas[y0::dy, x0::dx] = sub.reshape(ph, pw, bpp)
        rows = canvas.reshape(h, w * bpp)
    px = rows.reshape(h, w, channels, depth // 8)[..., 0]
    if color == 2:  # RGB
        return px
    if color == 6:  # RGBA -> drop alpha
        return px[:, :, :3]
    if color == 0:  # gray
        return np.repeat(px, 3, axis=2)
    if color == 4:  # gray+alpha
        return np.repeat(px[:, :, :1], 3, axis=2)
    # palette
    if plte is None or len(plte) % 3 != 0 or len(plte) == 0:
        raise PngFormatError("palette image without valid PLTE")
    table = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
    idx = px[:, :, 0]
    if int(idx.max(initial=0)) >= table.shape[0]:
        raise PngFormatError("palette index out of range")
    return table[idx]


def encode_png(img: np.ndarray) -> bytes:
    """Minimal encoder for tests and sinks: 8-bit, filter type 0 on
    every row. Accepts (H, W) gray, (H, W, 3) RGB, (H, W, 4) RGBA."""
    arr = np.asarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color = {1: 0, 3: 2, 4: 6}.get(ch)
    if color is None:
        raise ValueError(f"unsupported channel count {ch}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    stride = w * ch
    body = bytearray()
    flat = arr.reshape(h, stride)
    for y in range(h):
        body.append(0)
        body.extend(flat[y].tobytes())
    idat = zlib.compress(bytes(body), 6)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    return (
        SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )
