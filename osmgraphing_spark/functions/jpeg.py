"""Baseline JPEG codec — pure Python + numpy, no libjpeg.

Closes the last stubbed image format from the round-2 verdict: the
multimodal pipeline (functions/multimodal.py) previously faked JPEG
decode behind a strict-mode NotImplementedError. This module implements
baseline sequential DCT JPEG (ITU-T T.81): marker parse (DQT/SOF0/DHT/
SOS/DRI + restart markers), canonical Huffman decode with byte-stuffing
removal, dequantize + de-zigzag, a matrix-form IDCT (one 8×8 GEMM pair
per block, numpy), YCbCr→RGB, and 4:4:4 / 4:2:0 chroma layouts. The
encoder (4:4:4, Annex-K standard Huffman tables, caller-chosen
quantization) exists for deterministic roundtrips — with flat quant
tables the decode error is bounded by DCT rounding alone, which the
tests pin to ±2 per sample.

Progressive scans, arithmetic coding, 12-bit precision and exotic
samplings raise ValueError — same exclusion policy as the PNG/GIF
decoders (a production deploy swaps in PIL; the Spark plumbing is
unchanged).
"""

from __future__ import annotations

import struct

import numpy as np

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

# Annex K.3 standard Huffman specs: (bits[1..16], values)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)

# 8-point DCT-II basis matrix: C[u, x] = a(u) cos((2x+1)uπ/16)
_C = np.array([
    [
        (np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8))
        * np.cos((2 * x + 1) * u * np.pi / 16)
        for x in range(8)
    ]
    for u in range(8)
])


def _dct2(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


def _idct2(coef: np.ndarray) -> np.ndarray:
    return _C.T @ coef @ _C


def _build_huffman(bits: list[int], values: list[int]) -> dict:
    """Canonical code table → {(length, code): symbol}."""
    out = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[(ln, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _build_encode_table(bits: list[int], values: list[int]) -> dict:
    return {sym: (ln, code) for (ln, code), sym in _build_huffman(bits, values).items()}


class _BitReader:
    """MSB-first entropy-stream reader with 0xFF00 de-stuffing; stops at
    markers (restart markers are consumed by the caller)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bit = 0

    def _byte(self) -> int:
        return self.data[self.pos]

    def read_bit(self) -> int:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt != 0x00:
                raise _MarkerHit(0xFF00 | nxt)
        v = (b >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
            if b == 0xFF:  # skip the stuffed zero
                self.pos += 1
        return v

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_marker(self) -> int:
        """Skip to the next marker byte pair (for restart intervals)."""
        if self.bit:
            self.bit = 0
            self.pos += 1 + (1 if self.data[self.pos] == 0xFF else 0)
        while self.data[self.pos] != 0xFF or self.data[self.pos + 1] == 0x00:
            self.pos += 1
        m = 0xFF00 | self.data[self.pos + 1]
        self.pos += 2
        return m


class _MarkerHit(Exception):
    def __init__(self, marker: int):
        self.marker = marker


def _decode_huff(r: _BitReader, table: dict) -> int:
    code, ln = 0, 0
    for _ in range(16):
        code = (code << 1) | r.read_bit()
        ln += 1
        if (ln, code) in table:
            return table[(ln, code)]
    raise ValueError("invalid Huffman code in entropy stream")


def _extend(v: int, t: int) -> int:
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG bytes → (h, w, 3) RGB uint8 (grayscale broadcasts)."""
    if not data.startswith(b"\xff\xd8"):
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    restart = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", data[pos:pos + 2])
        body = data[pos + 2: pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 15
                p += 1
                if pq:
                    raise ValueError("16-bit quant tables unsupported")
                qt[tq] = np.frombuffer(body[p:p + 64], np.uint8).astype(np.int32)
                p += 64
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = body[0], *struct.unpack(">HH", body[1:5]), body[5]
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for i in range(nc):
                cid, samp, tq = body[6 + 3 * i: 9 + 3 * i]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 15, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"non-baseline SOF 0x{marker:02x} unsupported")
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 15
                bits = list(body[p + 1: p + 17])
                n = sum(bits)
                vals = list(body[p + 17: p + 17 + n])
                huff[(tc, th)] = _build_huffman(bits, vals)
                p += 17 + n
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF0")
            ns = body[0]
            scan = []
            for i in range(ns):
                cs, tt = body[1 + 2 * i: 3 + 2 * i]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append({**comp, "dc": tt >> 4, "ac": tt & 15})
            pos += seglen
            return _decode_scan(data, pos, frame, scan, qt, huff, restart)
        pos += seglen
    raise ValueError("JPEG contains no scan")


def _decode_scan(data, pos, frame, scan, qt, huff, restart):
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = {
        c["id"]: np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), np.float64)
        for c in scan
    }
    pred = {c["id"]: 0 for c in scan}
    r = _BitReader(data, pos)
    n_mcu = mcux * mcuy
    for m in range(n_mcu):
        if restart and m and m % restart == 0:
            marker = r.align_to_marker()
            if not (0xFFD0 <= marker <= 0xFFD7):
                raise ValueError(f"expected RST marker, got 0x{marker:04x}")
            pred = {c["id"]: 0 for c in scan}
        my, mx = divmod(m, mcux)
        for c in scan:
            dct = huff[(0, c["dc"])]
            act = huff[(1, c["ac"])]
            q = qt[c["tq"]]
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    zz = np.zeros(64, np.int32)
                    t = _decode_huff(r, dct)
                    diff = _extend(r.read_bits(t), t)
                    pred[c["id"]] += diff
                    zz[0] = pred[c["id"]]
                    k = 1
                    while k < 64:
                        rs = _decode_huff(r, act)
                        rr, ss = rs >> 4, rs & 15
                        if ss == 0:
                            if rr == 15:
                                k += 16
                                continue
                            break  # EOB
                        k += rr
                        if k > 63:
                            raise ValueError("AC index out of range")
                        zz[k] = _extend(r.read_bits(ss), ss)
                        k += 1
                    coef = np.zeros(64, np.float64)
                    coef[ZIGZAG] = zz * q
                    block = _idct2(coef.reshape(8, 8)) + 128.0
                    y0 = (my * c["v"] + by) * 8
                    x0 = (mx * c["h"] + bx) * 8
                    planes[c["id"]][y0:y0 + 8, x0:x0 + 8] = block
    # assemble: upsample each plane to full MCU-aligned size, crop, color
    full = []
    for c in scan:
        p = planes[c["id"]]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    # round-to-nearest per the JPEG sample reconstruction spec — a bare
    # astype would TRUNCATE, turning an IDCT result of 29.9999 into 29
    # (measured: off-by-one on exact DC-only blocks)
    if len(full) == 1:
        y = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.dstack([y, y, y])
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r_ = y + 1.402 * cr
    g_ = y - 0.344136 * cb - 0.714136 * cr
    b_ = y + 1.772 * cb
    return np.clip(np.round(np.dstack([r_, g_, b_])), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder (baseline, 4:4:4, Annex-K Huffman, caller quantization)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self):
        while self.n:
            self.write(1, 1)  # pad with 1s per spec


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _enc_value(v: int) -> tuple[int, int]:
    t = _category(v)
    if v < 0:
        v = v + (1 << t) - 1
    return t, v


def encode_jpeg(
    img: np.ndarray, quant: int = 1, subsample: bool = False
) -> bytes:
    """(h, w, 3) RGB or (h, w) gray uint8 → baseline JPEG (standard
    Huffman tables, flat quantization = ``quant`` for every coefficient —
    quant=1 makes the roundtrip exact up to DCT rounding, which the tests
    bound at ±2). ``subsample=True`` emits 4:2:0 (Y 2×2, chroma averaged
    over 2×2 tiles — the dominant web layout, exercising the decoder's
    upsampling path)."""
    gray = img.ndim == 2
    if gray:
        img = img[:, :, None]
    h, w, nc = img.shape
    if nc not in (1, 3):
        raise ValueError("encode_jpeg wants gray or RGB")
    x = img.astype(np.float64)
    if nc == 3:
        r_, g_, b_ = x[:, :, 0], x[:, :, 1], x[:, :, 2]
        y = 0.299 * r_ + 0.587 * g_ + 0.114 * b_
        cb = -0.168736 * r_ - 0.331264 * g_ + 0.5 * b_ + 128.0
        cr = 0.5 * r_ - 0.418688 * g_ - 0.081312 * b_ + 128.0
        if subsample:
            he, we = -(-h // 2) * 2, -(-w // 2) * 2
            def down(p):
                p = np.pad(p, ((0, he - h), (0, we - w)), mode="edge")
                return p.reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
            comps = [(y, 2, 2, 0), (down(cb), 1, 1, 1), (down(cr), 1, 1, 1)]
        else:
            comps = [(y, 1, 1, 0), (cb, 1, 1, 1), (cr, 1, 1, 1)]
    else:
        comps = [(x[:, :, 0], 1, 1, 0)]
    qtab = np.full(64, quant, np.int32)

    out = bytearray(b"\xff\xd8")

    def seg(marker: int, body: bytes):
        out.extend(bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body)

    seg(0xDB, bytes([0]) + bytes(qtab.tolist()))
    ncomp = len(comps)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for i, (_p, ch, cv, _tid) in enumerate(comps):
        sof += bytes([i + 1, ch << 4 | cv, 0])
    seg(0xC0, sof)
    specs = [(0, 0, *_DC_LUMA), (1, 0, *_AC_LUMA)]
    if ncomp == 3:
        specs += [(0, 1, *_DC_CHROMA), (1, 1, *_AC_CHROMA)]
    enc_tables = {}
    for tc, th, bits, vals in specs:
        seg(0xC4, bytes([tc << 4 | th]) + bytes(bits) + bytes(vals))
        enc_tables[(tc, th)] = _build_encode_table(bits, vals)
    sos = bytes([ncomp])
    for i, (_p, _ch, _cv, tid) in enumerate(comps):
        sos += bytes([i + 1, tid << 4 | tid])
    sos += bytes([0, 63, 0])
    seg(0xDA, sos)

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    pads = []
    for p, ch, cv, tid in comps:
        ph, pw = mcuy * cv * 8, mcux * ch * 8
        pads.append((
            np.pad(
                p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge"
            ),
            ch, cv, tid,
        ))

    bw = _BitWriter()
    pred = [0] * ncomp

    def emit_block(block, tid, ci):
        dct_t = enc_tables[(0, tid)]
        act_t = enc_tables[(1, tid)]
        coef = _dct2(block - 128.0)
        zz = np.round(coef.flatten()[ZIGZAG] / qtab).astype(np.int64)
        diff = int(zz[0]) - pred[ci]
        pred[ci] = int(zz[0])
        t, v = _enc_value(diff)
        ln, code = dct_t[t]
        bw.write(code, ln)
        if t:
            bw.write(v, t)
        run = 0
        last_nz = max([k for k in range(1, 64) if zz[k]], default=0)
        for k in range(1, last_nz + 1):
            if zz[k] == 0:
                run += 1
                continue
            while run > 15:
                ln, code = act_t[0xF0]
                bw.write(code, ln)
                run -= 16
            t, v = _enc_value(int(zz[k]))
            ln, code = act_t[run << 4 | t]
            bw.write(code, ln)
            bw.write(v, t)
            run = 0
        if last_nz < 63:
            ln, code = act_t[0x00]
            bw.write(code, ln)

    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (p, ch, cv, tid) in enumerate(pads):
                for by in range(cv):
                    for bx in range(ch):
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        emit_block(p[y0:y0 + 8, x0:x0 + 8], tid, ci)
    bw.flush()
    out.extend(bw.out)
    out.extend(b"\xff\xd9")
    return bytes(out)
