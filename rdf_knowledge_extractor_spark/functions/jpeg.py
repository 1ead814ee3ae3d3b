"""Minimal pure-stdlib baseline JPEG codec (struct + numpy — no PIL).

Closes the last real-mode media gap in the multimodal pipeline
(functions/multimodal.py): PNG, GIF and WAV already decode natively;
this adds ITU T.81 baseline sequential DCT JPEG, the dominant web
image format.  Same spirit and contract as functions/png.py /
functions/gif.py (reference parity target:
/root/reference/src/handlers/mod.rs routes media bytes opaquely; the
decode tier is this engine's training-data extension).

Supported (decode): baseline sequential (SOF0), 8-bit precision,
Huffman entropy coding, 1 or 3 components, arbitrary sampling factors
(4:4:4 / 4:2:2 / 4:2:0 / ...), interleaved single scan, restart
markers (DRI/RSTn), 8- and 16-bit DQT precision, stuffed-byte ECS.
Raises JpegError on progressive (SOF2), arithmetic coding, hierarchical,
12-bit, or truncated input — callers fall back to the deterministic
fake exactly as for exotic PNGs.

Encoder (fixture generator AND a valid baseline encoder): forward DCT,
IJG-style quality-scaled Annex K quantization tables (or explicit
override tables), standard short DC Huffman tables, and a uniform
8-bit-code AC Huffman table (any canonical prefix table is legal —
the DHT segment carries it, so decode interop does not depend on
matching libjpeg's code assignment).

Exactness contract used by the multimodal_jpeg oracle: an image made
of flat 8x8 blocks whose values are multiples of 4, encoded with an
all-16 quantization table, decodes BIT-EXACTLY (DC = (v-128)/2 is an
integer, all AC quantize to 0, IDCT of a DC-only block is constant),
so decoded per-channel means are closed-form integers in DuckDB.

Everything per-bit runs inside Arrow-batched mapInPandas workers on
small blobs; the 8x8 transforms are numpy matrix products.
"""

from __future__ import annotations

import struct

import numpy as np

SOI = b"\xff\xd8"


class JpegError(ValueError):
    pass


def is_jpeg(data: bytes) -> bool:
    return bool(data) and data[:2] == SOI and len(data) > 3 and data[2] == 0xFF


# zigzag index -> natural (row*8+col) index, ITU T.81 figure 5
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K quantization tables (natural order)
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# standard DC Huffman tables (T.81 Annex K.3.1): bits[1..16], symbols
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_SYMBOLS = list(range(12))

# uniform AC table: all 162 run/size symbols as 8-bit canonical codes
# (valid: Kraft sum 162/256 < 1 and the all-ones code stays unused)
AC_BITS = [0, 0, 0, 0, 0, 0, 0, 162, 0, 0, 0, 0, 0, 0, 0, 0]
AC_SYMBOLS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]

# orthonormal 8-point DCT-II matrix: spatial = M.T @ coeff @ M
_M = np.zeros((8, 8))
for _u in range(8):
    _c = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _M[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _canonical_codes(bits: list[int], symbols: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) via T.81 Annex C canonical assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], symbols: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol for the bit-serial decoder."""
    return {
        (length, code): sym
        for sym, (code, length) in _canonical_codes(bits, symbols).items()
    }


class _BitReader:
    """MSB-first reader over one entropy-coded segment (already
    de-stuffed)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise JpegError("truncated entropy-coded segment")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise JpegError("invalid Huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 EXTEND: map t magnitude bits to a signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _split_segments(data: bytes, pos: int) -> list[bytes]:
    """Entropy-coded data from `pos` split at RSTn markers, stuffed
    0xFF00 bytes unstuffed; stops at EOI or any other marker."""
    segs: list[bytes] = []
    cur = bytearray()
    n = len(data)
    while pos < n:
        b = data[pos]
        if b != 0xFF:
            cur.append(b)
            pos += 1
            continue
        if pos + 1 >= n:
            break
        m = data[pos + 1]
        if m == 0x00:
            cur.append(0xFF)
            pos += 2
        elif 0xD0 <= m <= 0xD7:  # RSTn
            segs.append(bytes(cur))
            cur = bytearray()
            pos += 2
        else:  # EOI or next marker
            break
    segs.append(bytes(cur))
    return segs


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> HxWxC uint8 (C=1 gray, C=3 RGB)."""
    if not is_jpeg(data):
        raise JpegError("not a JPEG (bad signature)")
    quant: dict[int, np.ndarray] = {}  # id -> 64 values in ZIGZAG order
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None  # (h, w, [(comp_id, hi, vi, tq)])
    scan = None  # ([(comp_idx, td, ta)], ecs_segments)
    restart_interval = 0
    pos = 2
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise JpegError(f"expected marker at {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + seglen]
        if len(body) != seglen - 2:
            raise JpegError("truncated segment")
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                i += 1
                if pq == 0:
                    quant[tq] = np.frombuffer(
                        body[i : i + 64], dtype=np.uint8
                    ).astype(np.int64)
                    i += 64
                else:
                    quant[tq] = np.frombuffer(
                        body[i : i + 128], dtype=">u2"
                    ).astype(np.int64)
                    i += 128
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                cnt = sum(bits)
                symbols = list(body[i + 17 : i + 17 + cnt])
                table = _decode_table(bits, symbols)
                (huff_dc if tc == 0 else huff_ac)[th] = table
                i += 17 + cnt
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/SOF1 (baseline/ext seq)
            prec, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise JpegError(f"unsupported precision {prec}")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegError(
                "only baseline sequential supported (progressive/arithmetic/"
                f"hierarchical SOF marker 0xFF{marker:02X})"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise JpegError("SOS before SOF")
            ns = body[0]
            sel = []
            for c in range(ns):
                cs, tda = body[1 + 2 * c : 3 + 2 * c]
                idx = next(
                    i for i, comp in enumerate(frame[2]) if comp[0] == cs
                )
                sel.append((idx, tda >> 4, tda & 0x0F))
            scan = (sel, _split_segments(data, pos + 2 + seglen))
            break
        pos += 2 + seglen
    if frame is None or scan is None:
        raise JpegError("missing SOF or SOS")

    h, w, comps = frame
    sel, segments = scan
    if len(sel) != len(comps):
        raise JpegError("non-interleaved multi-scan not supported")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if len(comps) == 1:
        # single-component scan: MCU is one data unit, sampling factors
        # do not shape the MCU (T.81 A.2.2)
        comps = [(comps[0][0], 1, 1, comps[0][3])]
        hmax = vmax = 1
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    planes = [
        np.zeros((mcuy * vi * 8, mcux * hi * 8), dtype=np.float64)
        for (_cid, hi, vi, _tq) in comps
    ]
    pred = [0] * len(comps)
    seg_idx = 0
    reader = _BitReader(segments[0])
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                seg_idx += 1
                if seg_idx >= len(segments):
                    raise JpegError("missing restart segment")
                reader = _BitReader(segments[seg_idx])
                pred = [0] * len(comps)
            for ci, (comp_idx, td, ta) in enumerate(sel):
                _cid, hi, vi, tq = comps[comp_idx]
                qt = quant.get(tq)
                if qt is None:
                    raise JpegError(f"missing quant table {tq}")
                dc_t, ac_t = huff_dc.get(td), huff_ac.get(ta)
                if dc_t is None or ac_t is None:
                    raise JpegError("missing Huffman table")
                for by in range(vi):
                    for bx in range(hi):
                        zz = np.zeros(64, dtype=np.int64)
                        t = reader.read_symbol(dc_t)
                        diff = _extend(reader.read_bits(t), t)
                        pred[comp_idx] += diff
                        zz[0] = pred[comp_idx]
                        k = 1
                        while k < 64:
                            rs = reader.read_symbol(ac_t)
                            run, size = rs >> 4, rs & 0x0F
                            if size == 0:
                                if run == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += run
                            if k > 63:
                                raise JpegError("AC run past block end")
                            zz[k] = _extend(reader.read_bits(size), size)
                            k += 1
                        coeff = np.zeros(64, dtype=np.float64)
                        coeff[ZIGZAG] = (zz * qt).astype(np.float64)
                        block = _M.T @ coeff.reshape(8, 8) @ _M
                        y0 = (my * vi + by) * 8
                        x0 = (mx * hi + bx) * 8
                        planes[comp_idx][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu_count += 1

    out = []
    for (comp_idx, (_cid, hi, vi, _tq)) in enumerate(comps):
        p = planes[comp_idx]
        if hi != hmax or vi != vmax:
            if hmax % hi or vmax % vi:
                raise JpegError(
                    f"non-integral sampling ratio {hi}x{vi} vs {hmax}x{vmax}"
                )
            p = np.repeat(np.repeat(p, vmax // vi, axis=0), hmax // hi, axis=1)
        out.append(p[:h, :w])
    if len(out) == 1:
        img = np.clip(np.round(out[0]) + 128.0, 0, 255).astype(np.uint8)
        return img[:, :, None]
    y, cb, cr = out[0] + 128.0, out[1] + 128.0, out[2] + 128.0
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(
        np.round(np.stack([r, g, b], axis=2)), 0, 255
    ).astype(np.uint8)


def jpeg_stats(data: bytes) -> tuple[int, int, int, list[float]]:
    """(width, height, channels, per-channel mean/255) — the feature
    contract consumed by extract_media_features."""
    img = decode_jpeg(data)
    h, w, c = img.shape
    means = (img.reshape(-1, c).mean(axis=0) / 255.0).tolist()
    return w, h, c, [float(m) for m in means]


# -- encoder -------------------------------------------------------------


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 1..100 -> scaled Annex K table."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits
        return bytes(self.out)


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _encode_block(
    wtr: _BitWriter,
    block: np.ndarray,
    qt_zz: np.ndarray,
    pred: int,
    dc_codes: dict,
    ac_codes: dict,
) -> int:
    coeff = _M @ (block.astype(np.float64) - 128.0) @ _M.T
    zz = np.array(
        [int(np.round(coeff.flat[ZIGZAG[k]] / qt_zz[k])) for k in range(64)],
        dtype=np.int64,
    )
    diff = int(zz[0]) - pred
    t = _category(diff)
    code, length = dc_codes[t]
    wtr.write(code, length)
    if t:
        wtr.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]
            wtr.write(c, ln)
            run -= 16
        size = _category(v)
        c, ln = ac_codes[(run << 4) | size]
        wtr.write(c, ln)
        wtr.write(v if v >= 0 else v + (1 << size) - 1, size)
        run = 0
    if run:
        c, ln = ac_codes[0x00]
        wtr.write(c, ln)
    return int(zz[0])


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body


def _dqt_body(tid: int, table_nat: np.ndarray) -> bytes:
    zz = bytes(int(table_nat[ZIGZAG[k]]) for k in range(64))
    return bytes([tid]) + zz


def _dht_body(tc: int, th: int, bits: list[int], symbols: list[int]) -> bytes:
    return bytes([(tc << 4) | th]) + bytes(bits) + bytes(symbols)


def encode_jpeg(
    img: np.ndarray,
    quality: int = 85,
    subsampling: str = "444",
    quant_override: np.ndarray | None = None,
    restart_interval: int = 0,
) -> bytes:
    """HxW / HxWx1 (gray) or HxWx3 (RGB) uint8 -> baseline JPEG bytes.

    `quant_override` (natural-order 64-vector) replaces BOTH scaled
    Annex K tables — the multimodal_jpeg oracle passes all-16s for the
    bit-exact flat-block contract documented in the module docstring.
    """
    arr = np.asarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.ndim != 3 or arr.shape[2] not in (1, 3):
        raise JpegError("expected HxW, HxWx1 or HxWx3 uint8 image")
    h, w, nc = arr.shape
    if h == 0 or w == 0:
        raise JpegError("empty image")
    if quant_override is not None:
        qluma = qchroma = np.asarray(quant_override, dtype=np.int64)
    else:
        qluma = _scaled_quant(QUANT_LUMA, quality)
        qchroma = _scaled_quant(QUANT_CHROMA, quality)
    qluma_zz = np.array([qluma[ZIGZAG[k]] for k in range(64)], dtype=np.int64)
    qchroma_zz = np.array([qchroma[ZIGZAG[k]] for k in range(64)], dtype=np.int64)

    if nc == 3:
        rgb = arr.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
        if subsampling == "444":
            samp = [(1, 1), (1, 1), (1, 1)]
        elif subsampling == "420":
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            raise JpegError(f"unsupported subsampling {subsampling!r}")
    else:
        planes = [arr[:, :, 0].astype(np.float64)]
        samp = [(1, 1)]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # per-component plane, box-downsampled then edge-padded to MCU grid
    comp_planes = []
    for p, (hi, vi) in zip(planes, samp):
        if hi != hmax or vi != vmax:
            fy, fx = vmax // vi, hmax // hi
            py = -(-p.shape[0] // fy) * fy
            px = -(-p.shape[1] // fx) * fx
            padded = np.pad(
                p, ((0, py - p.shape[0]), (0, px - p.shape[1])), mode="edge"
            )
            p = padded.reshape(py // fy, fy, px // fx, fx).mean(axis=(1, 3))
        th_, tw_ = mcuy * vi * 8, mcux * hi * 8
        p = np.pad(
            p, ((0, th_ - p.shape[0]), (0, tw_ - p.shape[1])), mode="edge"
        )
        comp_planes.append(np.clip(np.round(p), 0, 255))

    dc_luma_codes = _canonical_codes(DC_LUMA_BITS, DC_SYMBOLS)
    dc_chroma_codes = _canonical_codes(DC_CHROMA_BITS, DC_SYMBOLS)
    ac_codes = _canonical_codes(AC_BITS, AC_SYMBOLS)

    out = bytearray(SOI)
    out += _seg(
        0xE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HHBB", 1, 1, 0, 0)
    )
    out += _seg(0xDB, _dqt_body(0, qluma))
    if nc == 3:
        out += _seg(0xDB, _dqt_body(1, qchroma))
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        hi, vi = samp[ci]
        sof += bytes([ci + 1, (hi << 4) | vi, 0 if ci == 0 else 1])
    out += _seg(0xC0, sof)
    out += _seg(0xC4, _dht_body(0, 0, DC_LUMA_BITS, DC_SYMBOLS))
    out += _seg(0xC4, _dht_body(1, 0, AC_BITS, AC_SYMBOLS))
    if nc == 3:
        out += _seg(0xC4, _dht_body(0, 1, DC_CHROMA_BITS, DC_SYMBOLS))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([nc])
    for ci in range(nc):
        td = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (td << 4) | 0])  # Ta=0: AC table shared
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    pred = [0] * nc
    wtr = _BitWriter()
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if (
                restart_interval
                and mcu_count
                and mcu_count % restart_interval == 0
            ):
                out += wtr.flush()
                out += bytes([0xFF, 0xD0 + ((mcu_count // restart_interval - 1) % 8)])
                wtr = _BitWriter()
                pred = [0] * nc
            for ci in range(nc):
                hi, vi = samp[ci]
                qt_zz = qluma_zz if ci == 0 else qchroma_zz
                dc_codes = dc_luma_codes if ci == 0 else dc_chroma_codes
                for by in range(vi):
                    for bx in range(hi):
                        y0 = (my * vi + by) * 8
                        x0 = (mx * hi + bx) * 8
                        block = comp_planes[ci][y0 : y0 + 8, x0 : x0 + 8]
                        pred[ci] = _encode_block(
                            wtr, block, qt_zz, pred[ci], dc_codes, ac_codes
                        )
            mcu_count += 1
    out += wtr.flush()
    out += bytes([0xFF, 0xD9])
    return bytes(out)
