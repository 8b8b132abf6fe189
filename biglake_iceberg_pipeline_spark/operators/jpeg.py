"""Pure-Python baseline JPEG codec (no external libs).

The container ships no image codecs, and the multimodal feature
extractor (operators/multimodal.py) previously downgraded JPEG
payloads to byte statistics. This module implements the baseline
sequential DCT process from the public JPEG specification (ITU-T T.81
/ ISO 10918-1): marker parsing, the Annex-K quantization and Huffman
tables, canonical Huffman coding, 8×8 DCT/IDCT as orthonormal basis
matmuls, chroma subsampling, restart intervals, and BT.601 YCbCr ⇄ RGB
— enough to DECODE any baseline SOF0 JPEG (grayscale or 3-component,
any sampling factors, with or without restart markers) and to ENCODE
4:4:4 baseline JPEGs for tests and sinks.

Decode is numpy-vectorized where the format allows: entropy decoding
is inherently sequential, but every coefficient block is collected
first and the IDCT runs as ONE batched einsum over all blocks. On the
cluster this runs inside Arrow-batched mapInPandas (multimodal.py), so
throughput scales with executors, not the driver.

Performance is what pure Python can do — the point is correctness of
the full decode path (entropy → dequant → IDCT → upsample → color),
proving the Spark-side plumbing end-to-end; swap in a native codec via
multimodal._FORMAT_DECODERS for production throughput.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------- constants

#: Decode-side allocation guard: frames claiming more pixels than this
#: are rejected before any buffer is sized from the untrusted header.
MAX_PIXELS = 1 << 25  # ~33.5 MP ≈ 100 MB decoded RGB

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
])

# Annex K.1 base quantization tables
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)

QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# Annex K.3 typical Huffman tables: (bits[1..16], values)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))

AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _dct_basis() -> np.ndarray:
    """Orthonormal 8×8 DCT-II basis C: forward = C @ X @ C.T,
    inverse = C.T @ Y @ C."""
    k = np.arange(8).reshape(-1, 1)
    n = np.arange(8).reshape(1, -1)
    c = np.cos((2 * n + 1) * k * np.pi / 16)
    c *= np.sqrt(2.0 / 8.0)
    c[0] /= np.sqrt(2.0)
    return c


_C = _dct_basis()


def _scale_qt(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-style quality scaling of a base table."""
    quality = max(1, min(100, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * s + 50) // 100, 1, 255).astype(np.int32)


# ------------------------------------------------------------- Huffman

def _canonical_codes(bits: list[int], vals: list[int]):
    """(symbol → (code, length)) per the canonical algorithm (T.81
    C.2): codes assigned in value order, incrementing within a length,
    doubling at each length step."""
    out = {}
    code = 0
    idx = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[idx]] = (code, length)
            code += 1
            idx += 1
        code <<= 1
    return out


class _HuffDecoder:
    """length → {code: symbol} lookup for sequential decode."""

    def __init__(self, bits: list[int], vals: list[int]):
        self.by_len: list[dict[int, int]] = [{} for _ in range(17)]
        for sym, (code, length) in _canonical_codes(bits, vals).items():
            self.by_len[length][code] = sym


class _BitReader:
    """MSB-first reader over entropy-coded data; un-stuffs 0xFF00 and
    stops at (but records) RST/other markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise EOFError("truncated entropy stream")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 2
            else:
                # a real marker: entropy data for this interval is done
                self.marker = nxt
                b = 0  # pad (decoders may read a few pad bits past end)
                self.pos += 0
        else:
            self.pos += 1
        self.bitbuf = (self.bitbuf << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: _HuffDecoder) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.by_len[length].get(code)
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")

    def restart(self) -> None:
        """Consume an RSTn marker and realign to a byte boundary."""
        self.bitbuf = 0
        self.nbits = 0
        d = self.data
        # skip to the marker we already saw, or find it
        while self.pos < len(d) and d[self.pos] != 0xFF:
            self.pos += 1
        if self.pos + 1 < len(d) and 0xD0 <= d[self.pos + 1] <= 0xD7:
            self.pos += 2
        self.marker = None


def _extend(v: int, size: int) -> int:
    """Magnitude-category decode (T.81 F.2.2.1)."""
    if size == 0:
        return 0
    if v < (1 << (size - 1)):
        return v - (1 << size) + 1
    return v


# --------------------------------------------------------------- decode

class JpegFormatError(ValueError):
    pass


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline-JPEG decode → (H, W, 3) uint8 RGB (grayscale replicated
    to 3 channels). Raises JpegFormatError on non-baseline frames
    (progressive SOF2 etc.) so callers can fall back explicitly."""
    if payload[:2] != b"\xFF\xD8":
        raise JpegFormatError("missing SOI")
    qts: dict[int, np.ndarray] = {}
    dc_tables: dict[int, _HuffDecoder] = {}
    ac_tables: dict[int, _HuffDecoder] = {}
    restart_interval = 0
    frame = None
    pos = 2
    data = payload
    while pos < len(data):
        if data[pos] != 0xFF:
            raise JpegFormatError(f"expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        seglen = struct.unpack_from(">H", data, pos)[0]
        # The length field counts itself; < 2 means `pos += seglen`
        # cannot advance — a crafted 0x0000 length would loop forever
        # re-parsing the same marker instead of hitting the fallback.
        if seglen < 2:
            raise JpegFormatError(f"bad segment length {seglen}")
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq == 0:
                    tbl = np.frombuffer(
                        seg[p : p + 64], dtype=np.uint8
                    ).astype(np.int32)
                    p += 64
                else:
                    tbl = np.frombuffer(
                        seg[p : p + 128], dtype=">u2"
                    ).astype(np.int32)
                    p += 128
                dq = np.zeros(64, dtype=np.int32)
                dq[ZIGZAG] = tbl
                qts[tq] = dq.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                dec = _HuffDecoder(bits, vals)
                (dc_tables if tc == 0 else ac_tables)[th] = dec
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, ncomp = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise JpegFormatError(f"unsupported precision {prec}")
            # Dimensions come from untrusted bytes and size every
            # allocation below — a crafted 30-byte payload claiming
            # 65535×65535 would otherwise demand >100 GB before a
            # single entropy bit is validated.
            if h == 0 or w == 0 or h * w > MAX_PIXELS:
                raise JpegFormatError(
                    f"implausible frame dimensions {w}x{h}"
                )
            # Only grayscale and YCbCr frames can be produced anyway
            # (len(scan) is 1 or 3 downstream); the header byte allows
            # up to 255 components, each allocating a full coefficient
            # plane — reject before sizing anything on it.
            if ncomp not in (1, 3):
                raise JpegFormatError(f"unsupported component count {ncomp}")
            comps = []
            for ci in range(ncomp):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * ci)
                ch, cv = hv >> 4, hv & 0xF
                # T.81 bounds sampling factors to 1..4; 0 would divide
                # by zero in the MCU grid and >4 inflates allocations.
                if not (1 <= ch <= 4 and 1 <= cv <= 4):
                    raise JpegFormatError(
                        f"bad sampling factors {ch}x{cv}"
                    )
                comps.append(
                    {"id": cid, "h": ch, "v": cv, "tq": tq}
                )
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegFormatError(
                f"non-baseline frame marker 0xFF{marker:02X}"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise JpegFormatError("SOS before SOF0")
            ns = seg[0]
            if ns != len(frame["comps"]):
                # Non-interleaved baseline (one scan per component) is
                # legal T.81 but rare; decoding only the first scan
                # would silently return a grayscale of Y — refuse so
                # callers take the flagged fallback instead.
                raise JpegFormatError(
                    f"non-interleaved scan ({ns} of "
                    f"{len(frame['comps'])} components)"
                )
            scan = []
            for si in range(ns):
                cs, tt = seg[1 + 2 * si], seg[2 + 2 * si]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append((comp, tt >> 4, tt & 0xF))
            return _decode_scan(
                data, pos + seglen, frame, scan, qts, dc_tables,
                ac_tables, restart_interval,
            )
        pos += seglen
    raise JpegFormatError("no scan data")


def _decode_scan(data, pos, frame, scan, qts, dc_tables, ac_tables,
                 restart_interval):
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    # per-component coefficient planes (in blocks)
    planes = []
    for comp, _dc_id, _ac_id in scan:
        bw, bh = mcus_x * comp["h"], mcus_y * comp["v"]
        planes.append(np.zeros((bh, bw, 64), dtype=np.int32))
    reader = _BitReader(data, pos)
    pred = [0] * len(scan)
    mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu and mcu % restart_interval == 0:
                reader.restart()
                pred = [0] * len(scan)
            for si, (comp, dc_id, ac_id) in enumerate(scan):
                dct, act = dc_tables[dc_id], ac_tables[ac_id]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        blk = planes[si][
                            my * comp["v"] + by, mx * comp["h"] + bx
                        ]
                        s = reader.decode_symbol(dct)
                        pred[si] += _extend(reader.receive(s), s)
                        blk[0] = pred[si]
                        k = 1
                        while k < 64:
                            rs = reader.decode_symbol(act)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise JpegFormatError("AC index overflow")
                            blk[k] = _extend(reader.receive(s), s)
                            k += 1
            mcu += 1
    # batched dequant + IDCT per component, then upsample + stitch
    out = np.zeros((h, w, len(scan)), dtype=np.float64)
    for si, (comp, _dc, _ac) in enumerate(scan):
        bh, bw, _ = planes[si].shape
        zz = np.zeros((bh * bw, 64), dtype=np.float64)
        zz[:, ZIGZAG] = planes[si].reshape(-1, 64)
        coef = zz.reshape(-1, 8, 8) * qts[comp["tq"]][None, :, :]
        pix = np.einsum("ij,njk,kl->nil", _C.T, coef, _C) + 128.0
        plane = (
            pix.reshape(bh, bw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw * 8)
        )
        # upsample to full MCU-grid resolution, then crop
        ry, rx = vmax // comp["v"], hmax // comp["h"]
        if ry > 1 or rx > 1:
            plane = plane.repeat(ry, axis=0).repeat(rx, axis=1)
        out[:, :, si] = plane[:h, :w]
    if len(scan) == 1:
        g = np.clip(out[:, :, 0], 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=2)
    return _ycbcr_to_rgb(out)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[:, :, 0], ycc[:, :, 1] - 128.0, ycc[:, :, 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=2), 0, 255).astype(np.uint8)


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    r = img[:, :, 0].astype(np.float64)
    g = img[:, :, 1].astype(np.float64)
    b = img[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=2)


# --------------------------------------------------------------- encode

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-pad per spec


def _magnitude(v: int) -> tuple[int, int]:
    """value → (size category, appended bits)."""
    size = 0
    a = abs(v)
    while a:
        size += 1
        a >>= 1
    bits = v if v >= 0 else v + (1 << size) - 1
    return size, bits


def _encode_block(writer, block, qt, dct, act, pred: int) -> int:
    """FDCT + quantize + entropy-code one 8×8 block; returns the new
    DC prediction."""
    coef = _C @ (block - 128.0) @ _C.T
    q = np.round(coef / qt).astype(np.int64)
    zz = q.reshape(-1)[ZIGZAG]
    diff = int(zz[0]) - pred
    size, bits = _magnitude(diff)
    code, length = dct[size]
    writer.write(code, length)
    if size:
        writer.write(bits, size)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last_nz = int(nz[-1]) + 1 if len(nz) else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = act[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        size, bits = _magnitude(v)
        code, length = act[(run << 4) | size]
        writer.write(code, length)
        writer.write(bits, size)
        run = 0
    if last_nz < 63:
        code, length = act[0x00]  # EOB
        writer.write(code, length)
    return int(zz[0])


def encode_jpeg(
    img: np.ndarray,
    quality: int = 85,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as a baseline JPEG with the
    Annex-K tables (quality-scaled). ``subsampling``: '444' (one 8×8
    block of each component per MCU) or '420' (2×2 luma blocks + one
    box-downsampled block each of Cb/Cr per 16×16 MCU).
    ``restart_interval`` > 0 emits DRI + RSTn markers every N MCUs.
    Round-trips through decode_jpeg within quantization error — the
    test oracle for the decoder, and a real writer for multimodal
    sinks."""
    if subsampling not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    qt_l = _scale_qt(QT_LUMA, quality).reshape(8, 8)
    qt_c = _scale_qt(QT_CHROMA, quality).reshape(8, 8)
    ycc = _rgb_to_ycbcr(img)
    sub = subsampling == "420"
    mcu_px = 16 if sub else 8
    ph, pw = -(-h // mcu_px) * mcu_px, -(-w // mcu_px) * mcu_px
    padded = np.pad(ycc, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")
    if sub:
        # box-filter 2×2 chroma downsample
        chroma = padded[:, :, 1:]
        chroma = chroma.reshape(ph // 2, 2, pw // 2, 2, 2).mean(axis=(1, 3))
    dc_l = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    dc_c = _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_l = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    ac_c = _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)
    writer = _BitWriter()
    pred = [0, 0, 0]
    mcu = 0
    rst = 0
    for my in range(ph // mcu_px):
        for mx in range(pw // mcu_px):
            if restart_interval and mcu and mcu % restart_interval == 0:
                writer.flush()
                writer.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                pred = [0, 0, 0]
            y0, x0 = my * mcu_px, mx * mcu_px
            if sub:
                for by in range(2):
                    for bx in range(2):
                        blk = padded[
                            y0 + by * 8 : y0 + by * 8 + 8,
                            x0 + bx * 8 : x0 + bx * 8 + 8,
                            0,
                        ]
                        pred[0] = _encode_block(
                            writer, blk, qt_l, dc_l, ac_l, pred[0]
                        )
                cy, cx = y0 // 2, x0 // 2
                for ci in (0, 1):
                    blk = chroma[cy : cy + 8, cx : cx + 8, ci]
                    pred[ci + 1] = _encode_block(
                        writer, blk, qt_c, dc_c, ac_c, pred[ci + 1]
                    )
            else:
                for ci, (qt, dct, act) in enumerate(
                    [(qt_l, dc_l, ac_l), (qt_c, dc_c, ac_c),
                     (qt_c, dc_c, ac_c)]
                ):
                    blk = padded[y0 : y0 + 8, x0 : x0 + 8, ci]
                    pred[ci] = _encode_block(
                        writer, blk, qt, dct, act, pred[ci]
                    )
            mcu += 1
    writer.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    def dqt(tq: int, tbl: np.ndarray) -> bytes:
        return seg(
            0xDB,
            bytes([tq]) + bytes(tbl.reshape(-1)[ZIGZAG].astype(np.uint8)),
        )

    def dht(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
        return seg(
            0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
        )

    y_hv = 0x22 if sub else 0x11
    sof = seg(
        0xC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, y_hv, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    dri = (
        seg(0xDD, struct.pack(">H", restart_interval))
        if restart_interval
        else b""
    )
    sos = seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    return (
        b"\xFF\xD8"
        + dqt(0, qt_l)
        + dqt(1, qt_c)
        + sof
        + dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
        + dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
        + dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        + dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
        + dri
        + sos
        + bytes(writer.out)
        + b"\xFF\xD9"
    )
