#!/usr/bin/env python3
"""Independent verification leg for q_jpeg_decode_features (VERDICT r9
#3, the check_numeric discipline applied to a codec): a from-scratch
pure-python+numpy BASELINE JPEG decoder (marker parse, Huffman, DC
prediction, dequant, zigzag, float IDCT) re-decodes the committed
fixture bytes in tools/fixtures/jpeg/ — encoded by the JDK's ImageIO,
decoded in the engine by the JDK's ImageIO — and grades the engine's
golden grid sums against a decode that shares NO code with the JVM.

Two engines' IDCTs legitimately differ by ±1 gray level per pixel
(the JPEG spec bounds decoder disagreement, it does not fix it), so
the gate is tolerance-based, exactly like check_numeric's float legs:

  - per-cell mean |python - JDK| <= 1.0 gray level
  - per-cell mean |python - lossless source| <= 1.5 gray levels
  - dhash(python cells) within hamming 2 of the golden dhash

Grayscale single-component baseline JPEGs only — which is what the
fixture set is, by design (no chroma upsampling to hide bugs in).

Usage: check_jpeg.py [fixture_dir]   (default tools/fixtures/jpeg)
"""
import json
import os
import struct
import sys

import numpy as np

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63])

# 8x8 IDCT basis: P[x,u] = c(u)/2 * cos((2x+1) u pi / 16)
_P = np.zeros((8, 8))
for x in range(8):
    for u in range(8):
        cu = (1 / np.sqrt(2)) if u == 0 else 1.0
        _P[x, u] = cu / 2 * np.cos((2 * x + 1) * u * np.pi / 16)


def idct2(block):
    return _P @ block @ _P.T


class Huff:
    """Canonical JPEG Huffman table -> (code, length) lookup dict."""

    def __init__(self, counts, symbols):
        self.lut = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.lut[(length, code)] = symbols[k]
                code += 1
                k += 1
            code <<= 1


class BitReader:
    """Entropy-coded segment reader with 0xFF00 unstuffing; RSTn
    markers terminate the current run (caller resets DC)."""

    def __init__(self, data, pos):
        self.d = data
        self.pos = pos
        self.bits = 0
        self.nbits = 0

    def read_bit(self):
        if self.nbits == 0:
            b = self.d[self.pos]
            if b == 0xFF:
                nxt = self.d[self.pos + 1]
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:  # RSTn
                    raise StopIteration("rst")
                else:
                    raise StopIteration("marker")
            else:
                self.pos += 1
            self.bits = b
            self.nbits = 8
        self.nbits -= 1
        return (self.bits >> self.nbits) & 1

    def read(self, n):
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def huff(self, table):
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.lut.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("bad huffman code")


def extend(v, t):
    """JPEG EXTEND: map t-bit magnitude v to signed coefficient."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_gray_baseline(data):
    """Decode a single-component baseline JPEG to a uint8 array."""
    assert data[0:2] == b"\xff\xd8", "not a JPEG"
    pos = 2
    qt = {}
    hts = {}
    w = h = None
    qsel = None
    dc_id = ac_id = None
    while True:
        assert data[pos] == 0xFF, f"lost marker sync at {pos}"
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        seglen = struct.unpack(">H", data[pos:pos + 2])[0]
        seg = data[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT
            o = 0
            while o < len(seg):
                pq, tq = seg[o] >> 4, seg[o] & 0xF
                assert pq == 0, "16-bit quant tables unsupported"
                qt[tq] = np.array(list(seg[o + 1:o + 65]), dtype=np.float64)
                o += 65
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, ncomp = seg[0], struct.unpack(">H", seg[1:3])[0], \
                struct.unpack(">H", seg[3:5])[0], seg[5]
            assert prec == 8 and ncomp == 1, "grayscale baseline only"
            sampling, qsel = seg[7], seg[8]
            assert sampling == 0x11, "subsampling unsupported (1 component)"
        elif marker in (0xC1, 0xC2, 0xC3):
            raise AssertionError("non-baseline SOF unsupported")
        elif marker == 0xC4:  # DHT
            o = 0
            while o < len(seg):
                tc, th = seg[o] >> 4, seg[o] & 0xF
                counts = list(seg[o + 1:o + 17])
                n = sum(counts)
                hts[(tc, th)] = Huff(counts, list(seg[o + 17:o + 17 + n]))
                o += 17 + n
        elif marker == 0xDA:  # SOS
            assert seg[0] == 1
            dc_id, ac_id = seg[2] >> 4, seg[2] & 0xF
            pos += seglen
            break
        pos += seglen

    bw, bh = (w + 7) // 8, (h + 7) // 8
    out = np.zeros((bh * 8, bw * 8), dtype=np.float64)
    rd = BitReader(data, pos)
    dc_pred = 0
    dct, act, q = hts[(0, dc_id)], hts[(1, ac_id)], qt[qsel]
    for by in range(bh):
        for bx in range(bw):
            coeffs = np.zeros(64)
            try:
                t = rd.huff(dct)
                dc_pred += extend(rd.read(t), t)
                coeffs[0] = dc_pred
                k = 1
                while k < 64:
                    rs = rd.huff(act)
                    r, s = rs >> 4, rs & 0xF
                    if rs == 0x00:  # EOB
                        break
                    if rs == 0xF0:  # ZRL
                        k += 16
                        continue
                    k += r
                    coeffs[k] = extend(rd.read(s), s)
                    k += 1
            except StopIteration as e:
                if str(e) == "rst":
                    # skip the marker, reset predictor, redo this block
                    rd.pos += 2
                    rd.nbits = 0
                    dc_pred = 0
                    continue
                raise
            block = np.zeros(64)
            block[ZIGZAG] = coeffs * q
            px = idct2(block.reshape(8, 8)) + 128
            out[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = px
    return np.clip(np.rint(out[:h, :w]), 0, 255).astype(np.uint8)


def grid_sums(img, gw, gh):
    h, w = img.shape
    cw, ch = w // gw, h // gh
    return (img.astype(np.int64).reshape(gh, ch, gw, cw).sum(axis=(1, 3)) * 1000)


def dhash(cells, cols, rows):
    lo = hi = 0
    g = cells.reshape(rows, cols)
    for cy in range(rows):
        for cx in range(cols - 1):
            if g[cy, cx] < g[cy, cx + 1]:
                i = cy * (cols - 1) + cx
                if i < 32:
                    lo |= 1 << i
                else:
                    hi |= 1 << (i - 32)
    return lo, hi


def main():
    fixdir = sys.argv[1] if len(sys.argv) > 1 else "tools/fixtures/jpeg"
    with open(os.path.join(fixdir, "golden.json")) as f:
        golden = json.load(f)
    gw, gh = 9, 8
    n_pass = 0
    for g in golden:
        with open(os.path.join(fixdir, f"img_{g['id']:02d}.jpg"), "rb") as f:
            data = f.read()
        img = decode_gray_baseline(data)
        cells = grid_sums(img, gw, gh).flatten()
        jdk = np.array(g["cells"], dtype=np.int64)
        truth = np.array(g["truth_cells"], dtype=np.int64)
        cell_px = (img.shape[1] // gw) * (img.shape[0] // gh)
        err_jdk = np.abs(cells - jdk).max() / (1000.0 * cell_px)
        err_src = np.abs(cells - truth).max() / (1000.0 * cell_px)
        lo, hi = dhash(cells, gw, gh)
        ham = bin((lo ^ g["dhash_lo"]) | ((hi ^ g["dhash_hi"]) << 32)).count("1")
        ok = err_jdk <= 1.0 and err_src <= 1.5 and ham <= 2
        status = "PASS" if ok else "FAIL"
        print(f"{status} img_{g['id']:02d}: |py-jdk|max={err_jdk:.3f} "
              f"|py-src|max={err_src:.3f} gray-levels, dhash hamming={ham}")
        n_pass += ok
    print(f"{n_pass}/{len(golden)} PASS")
    sys.exit(0 if n_pass == len(golden) else 1)


if __name__ == "__main__":
    main()
