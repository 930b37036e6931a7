"""Generate the committed JPEG fixtures with ANALYTIC goldens.

VERDICT r14 ask 8 wants ``pil_image_decoder`` pinned on
Pillow-equipped boxes without this container (no Pillow) being able
to run Pillow to produce the golden. The trick: a baseline JPEG whose
every 8x8 block is a CONSTANT value is DC-only, and a DC-only block's
IDCT is exactly ``round(dc/8) + 128`` in every conformant decoder
(libjpeg/-turbo short-circuit it; no AC terms, no approximation
spread) — with unit quantization tables and DC chosen as
``(v - 128) * 8``, the decoded pixels are exactly ``v``. So the
expected width/height/mean_luma (and, for the single-block image,
the degenerate all-ones aHash) are computable on paper, committed as
JSON, and any Pillow build must reproduce them bit-for-bit.

The encoder below is a minimal baseline-JFIF grayscale writer
(Annex K standard Huffman tables, unit DQT, one component, DC diff +
EOB per block) — test-fixture tooling, not a production codec (that
remains ``pil_image_decoder``; the stdlib production formats are PNG/
BMP in functions/imaging.py).

Usage: python scripts/gen_jpeg_fixture.py  (rewrites tests/fixtures/)
"""

from __future__ import annotations

import json
import os
import struct
import sys

import numpy as np

# Annex K Table K.3 — luminance DC: code lengths then symbols
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
# Annex K Table K.5 — luminance AC (only EOB = symbol 0x00 is emitted,
# but the full table must be declared)
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
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
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the JPEG canonical construction."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.buf.append(b)
            if b == 0xFF:  # byte stuffing
                self.buf.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # 1-pad per spec
        return bytes(self.buf)


def _dht(tc_th: int, bits: list[int], vals: list[int]) -> bytes:
    body = bytes([tc_th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def encode_flat_jpeg(blocks: np.ndarray) -> bytes:
    """Baseline grayscale JPEG from an (BH, BW) array of per-8x8-block
    constant values — decodes to exactly those values (see module
    docstring)."""
    bh, bw = blocks.shape
    h, w = bh * 8, bw * 8
    dc_codes = _canonical_codes(_DC_BITS, _DC_VALS)
    ac_codes = _canonical_codes(_AC_BITS, _AC_VALS)

    out = bytearray(b"\xff\xd8")  # SOI
    out += (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01"
            + b"\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00")  # APP0
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([1] * 64)
    out += (b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
            + struct.pack(">HH", h, w) + b"\x01" + b"\x01\x11\x00")  # SOF0
    out += _dht(0x00, _DC_BITS, _DC_VALS)
    out += _dht(0x10, _AC_BITS, _AC_VALS)
    out += (b"\xff\xda" + struct.pack(">H", 8) + b"\x01" + b"\x01\x00"
            + b"\x00\x3f\x00")  # SOS

    bw_ = _BitWriter()
    prev_dc = 0
    for by in range(bh):
        for bx in range(bw):
            dc = (int(blocks[by, bx]) - 128) * 8
            diff = dc - prev_dc
            prev_dc = dc
            mag = abs(diff)
            t = mag.bit_length()
            code, length = dc_codes[t]
            bw_.put(code, length)
            if t:
                v = diff if diff >= 0 else diff + (1 << t) - 1
                bw_.put(v, t)
            code, length = ac_codes[0x00]  # EOB: no AC coefficients
            bw_.put(code, length)
    out += bw_.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def main() -> None:
    fx = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "fixtures")
    os.makedirs(fx, exist_ok=True)

    flat8 = np.array([[100]])
    blocks16 = np.array([[64, 128], [192, 255]])
    golden = {
        # single 8x8 constant block: resize((8,8)) is the identity, so
        # the aHash degenerates to all ones -> signed -1
        "flat8": {
            "width": 8, "height": 8,
            "mean_luma": 100 / 255.0, "phash64": -1,
        },
        # 16x16 four-block: width/height/mean are exact; the aHash goes
        # through a 2x downsample whose filter choice is a Pillow
        # version detail -> deliberately not pinned
        "blocks16": {
            "width": 16, "height": 16,
            "mean_luma": (64 + 128 + 192 + 255) / 4 / 255.0,
        },
    }
    with open(os.path.join(fx, "flat8.jpg"), "wb") as f:
        f.write(encode_flat_jpeg(flat8))
    with open(os.path.join(fx, "blocks16.jpg"), "wb") as f:
        f.write(encode_flat_jpeg(blocks16))
    with open(os.path.join(fx, "jpeg_golden.json"), "w") as f:
        json.dump(golden, f, indent=1, sort_keys=True)

    # r15: a real-pixel RGB JPEG of the SAME pixels as the committed
    # gradient_rgb.png/bmp media fixtures, through the package's own
    # baseline encoder (4:2:0, q92 — exercises chroma subsampling).
    # Decode goldens for it are pinned in tests/test_jpeg.py from the
    # package decoder (deterministic float64 — not encoder-analytic
    # like the DC-only pair above, but bit-stable across platforms).
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from ncbi_analysis_spark.functions.jpeg import jpeg_encode

    y, x = np.mgrid[0:16, 0:24]
    r = (x * 10 + y * 3) % 256
    g = (x * 4 + y * 11 + 60 * np.exp(-((x - 7) ** 2 + (y - 5) ** 2) / 30)) % 256
    b = (x + y * 7 + 128) % 256
    arr = np.stack([r, g, b], axis=2).astype(np.uint8)
    with open(os.path.join(fx, "media", "gradient_rgb.jpg"), "wb") as f:
        f.write(jpeg_encode(arr, quality=92, subsample="420"))
    print("wrote flat8.jpg, blocks16.jpg, jpeg_golden.json, "
          "media/gradient_rgb.jpg")


if __name__ == "__main__":
    sys.exit(main())
