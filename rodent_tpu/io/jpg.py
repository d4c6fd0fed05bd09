"""Minimal dependency-free baseline JPEG (JFIF) decoder.

Plays the role of the reference's libjpeg wrapper
(src/driver/image.cpp:131-195, rodent_load_jpg) for `map_*` material
textures. Clean-room implementation of ITU-T T.81 baseline sequential
DCT: SOF0/SOF1, 8-bit samples, Huffman entropy coding, restart
intervals, 4:4:4 / 4:2:2 / 4:2:0 chroma subsampling. Progressive and
arithmetic-coded JPEGs are rejected with a clear error.

Entropy decoding is serial Python (texture loads are host-side, offline);
dequantization, IDCT (separable DCT-III matrix form) and color conversion
are vectorized numpy over all blocks.
"""
from __future__ import annotations

import struct

import numpy as np

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    np.int32)

# IDCT basis: A[u, x] = c(u)/2 * cos((2x+1) u pi / 16); block = A.T S A
_A = np.array([[(np.sqrt(0.5) if u == 0 else 1.0) * 0.5
                * np.cos((2 * x + 1) * u * np.pi / 16.0)
                for x in range(8)] for u in range(8)], np.float64)


class _Huff:
    """Canonical Huffman table: (length, code) -> symbol."""

    def __init__(self, counts, symbols):
        self.lut = {}
        code = 0
        k = 0
        for ln in range(1, 17):
            for _ in range(counts[ln - 1]):
                self.lut[(ln, code)] = symbols[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over byte-unstuffed entropy data."""

    def __init__(self, data):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def bit(self):
        if self.nbits == 0:
            if self.pos >= len(self.data):
                return 0  # pad past the end (T.81 F.2.2.5 fill bits)
            self.acc = self.data[self.pos]
            self.pos += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n):
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def decode(self, table):
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.bit()
            sym = table.lut.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG: bad Huffman code")


def _extend(v, s):
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def _split_entropy(data):
    """Byte-unstuffs one entropy-coded segment; returns (bytes, rest)."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        b = data[i]
        if b == 0xFF:
            nxt = data[i + 1] if i + 1 < n else 0xD9
            if nxt == 0x00:
                out.append(0xFF)
                i += 2
                continue
            return bytes(out), data[i:]
        out.append(b)
        i += 1
    return bytes(out), b""


def read_jpg(path):
    """Decodes a baseline JPEG into a (H, W, 3) uint8 RGB array
    (grayscale broadcast to RGB, matching texture.image_from_u8's
    contract)."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt = {}
    huff_dc, huff_ac = {}, {}
    frame = None
    restart_interval = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", data[pos:pos + 2])
        seg = data[pos + 2:pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                i += 1
                if pq:
                    vals = np.frombuffer(seg[i:i + 128], ">u2").astype(
                        np.int32)
                    i += 128
                else:
                    vals = np.frombuffer(seg[i:i + 64], np.uint8).astype(
                        np.int32)
                    i += 64
                qt[tq] = vals
        elif marker in (0xC0, 0xC1):  # SOF0/1 baseline
            _prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15,
                              "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline JPEG is supported "
                             f"(SOF marker 0x{marker:02x})")
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                counts = list(seg[i + 1:i + 17])
                nsym = sum(counts)
                syms = list(seg[i + 17:i + 17 + nsym])
                (huff_ac if tc else huff_dc)[th] = _Huff(counts, syms)
                i += 17 + nsym
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            nc = seg[0]
            scan = []
            for c in range(nc):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                scan.append({"cs": cs, "td": tt >> 4, "ta": tt & 15})
            return _decode_scan(data[pos:], frame, scan, qt, huff_dc,
                                huff_ac, restart_interval)
    raise ValueError("invalid JPEG: no scan found")


def _decode_scan(data, frame, scan, qt, huff_dc, huff_ac, dri):
    if frame is None:
        raise ValueError("invalid JPEG: SOS before SOF")
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-frame["w"] // (8 * hmax))
    mcuy = -(-frame["h"] // (8 * vmax))
    for c in comps:
        c["bw"] = mcux * c["h"]   # blocks per row
        c["bh"] = mcuy * c["v"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 64), np.int32)
    sc_by_id = {s["cs"]: s for s in scan}

    entropy, rest = _split_entropy(data)
    rd = _BitReader(entropy)
    pred = {c["id"]: 0 for c in comps}
    nmcu = mcux * mcuy
    for m in range(nmcu):
        if dri and m and m % dri == 0:
            # skip to the next restart marker, reset predictors
            while rest[:1] == b"\xff" and 0xD0 <= rest[1] <= 0xD7:
                entropy, rest = _split_entropy(rest[2:])
                rd = _BitReader(entropy)
                break
            pred = {c["id"]: 0 for c in comps}
        my, mx = divmod(m, mcux)
        for c in comps:
            s = sc_by_id[c["id"]]
            dc_t, ac_t = huff_dc[s["td"]], huff_ac[s["ta"]]
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    blk = np.zeros(64, np.int32)
                    t = rd.decode(dc_t)
                    diff = _extend(rd.bits(t), t) if t else 0
                    pred[c["id"]] += diff
                    blk[0] = pred[c["id"]]
                    k = 1
                    while k < 64:
                        rs = rd.decode(ac_t)
                        r, size = rs >> 4, rs & 15
                        if size == 0:
                            if r == 15:
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("invalid JPEG: AC overflow")
                        blk[k] = _extend(rd.bits(size), size)
                        k += 1
                    row = my * c["v"] + by
                    col = mx * c["h"] + bx
                    c["coef"][row * c["bw"] + col] = blk

    # dequantize + dezigzag + IDCT, vectorized over all blocks
    planes = []
    for c in comps:
        deq = c["coef"] * qt[c["tq"]][None, :]
        blocks = np.zeros((len(deq), 64), np.float64)
        blocks[:, _ZIGZAG] = deq
        blocks = blocks.reshape(-1, 8, 8)
        pix = np.einsum("ux,nuv,vy->nxy", _A, blocks, _A) + 128.0
        plane = pix.reshape(c["bh"], c["bw"], 8, 8).transpose(
            0, 2, 1, 3).reshape(c["bh"] * 8, c["bw"] * 8)
        # upsample to full resolution
        plane = np.repeat(np.repeat(plane, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        planes.append(plane[:frame["h"], :frame["w"]])

    if len(planes) == 1:
        y = np.clip(planes[0], 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=-1)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0,
                   255).astype(np.uint8)
