"""Pure stdlib+numpy imaging: PNG/BMP codecs and a real DCT pHash.

This container ships no image libraries (no Pillow), but the
multimodal operators' real-pixel path should not be stub-only there:
these codecs cover the UNCOMPRESSED interchange formats (8-bit
non-interlaced PNG via stdlib zlib, 24-bit uncompressed BMP) with
nothing beyond ``zlib``/``struct``/numpy, so the decode → grayscale →
DCT-low-band → median-threshold pHash recipe (the classic perceptual
hash) runs for real everywhere. Baseline JPEG joined in r15
(``functions/jpeg.py``); Pillow (``pil_image_decoder``) remains the
production drop-in for progressive JPEG & the long tail.

Everything here is deterministic: fixed float64 arithmetic, no RNG, no
platform-dependent libraries — the same image bytes hash identically
on any worker.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


# ---------------------------------------------------------------------------
# PNG (8-bit, non-interlaced; color types 0 gray / 2 RGB / 6 RGBA)
# ---------------------------------------------------------------------------

def png_encode(arr: np.ndarray) -> bytes:
    """Encode a uint8 array — (H, W) gray, (H, W, 3) RGB or (H, W, 4)
    RGBA — as a non-interlaced 8-bit PNG (filter 0 rows, one IDAT)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        color_type, channels = 0, 1
        a = a[:, :, None]
    elif a.ndim == 3 and a.shape[2] == 3:
        color_type, channels = 2, 3
    elif a.ndim == 3 and a.shape[2] == 4:
        color_type, channels = 6, 4
    else:
        raise ValueError(f"png_encode: unsupported shape {a.shape}")
    h, w = a.shape[:2]

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(
        b"\x00" + a[y].tobytes() for y in range(h)
    )
    return (_PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 9))
            + chunk(b"IEND", b""))


def _unfilter(raw: bytes, h: int, w: int, ch: int) -> np.ndarray:
    """Reverse the PNG scanline filters. Cost posture: None/Up/Sub are
    numpy-vectorized per row; Average and Paeth carry a true sequential
    left-dependency and run as per-pixel Python — fine for fixtures and
    screenshots, but for large photographic PNGs (whose encoders lean
    on Paeth) prefer ``pil_image_decoder`` where Pillow is installed."""
    stride = w * ch
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ftype = raw[pos]
        pos += 1
        line = np.frombuffer(raw, dtype=np.uint8, count=stride,
                             offset=pos).astype(np.int32)
        pos += stride
        if ftype == 0:
            cur = line
        elif ftype == 1:  # Sub — out[x] = line[x] + out[x-ch]: a
            # per-channel-lane prefix sum (mod-256 addition is
            # associative), vectorized as cumsum over the width axis
            cur = (line.reshape(w, ch).cumsum(axis=0) & 0xFF).reshape(
                stride)
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = line.copy()
            for x in range(stride):
                left = cur[x - ch] if x >= ch else 0
                cur[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line.copy()
            for x in range(stride):
                left = cur[x - ch] if x >= ch else 0
                up = prev[x]
                ul = prev[x - ch] if x >= ch else 0
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else (
                    up if pb <= pc else ul)
                cur[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"png_decode: unknown filter {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(h, w, ch)


def png_decode(data: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG (gray/RGB/RGBA) to a uint8
    array (H, W) or (H, W, C). Raises ValueError on anything else —
    compressed/exotic formats belong to the Pillow drop-in."""
    if data[:8] != _PNG_MAGIC:
        raise ValueError("png_decode: not a PNG")
    pos = 8
    w = h = None
    ch = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload)
            if depth != 8 or interlace != 0 or color not in (0, 2, 6):
                raise ValueError(
                    f"png_decode: unsupported PNG (depth={depth}, "
                    f"color={color}, interlace={interlace}); use the "
                    "Pillow decoder for this file")
            ch = {0: 1, 2: 3, 6: 4}[color]
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
    if w is None or ch is None:
        raise ValueError("png_decode: missing IHDR")
    arr = _unfilter(zlib.decompress(bytes(idat)), h, w, ch)
    return arr[:, :, 0] if ch == 1 else arr


# ---------------------------------------------------------------------------
# BMP (24-bit uncompressed BITMAPINFOHEADER)
# ---------------------------------------------------------------------------

def bmp_encode(arr: np.ndarray) -> bytes:
    """Encode a uint8 (H, W, 3) RGB array as a 24-bit uncompressed
    bottom-up BMP."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"bmp_encode: need (H, W, 3), got {a.shape}")
    h, w = a.shape[:2]
    pad = (-(w * 3)) % 4
    rows = b"".join(
        a[y, :, ::-1].tobytes() + b"\x00" * pad  # BGR, bottom-up
        for y in range(h - 1, -1, -1)
    )
    pixel_off = 14 + 40
    return (b"BM" + struct.pack("<IHHI", pixel_off + len(rows), 0, 0,
                                pixel_off)
            + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows),
                          2835, 2835, 0, 0)
            + rows)


def bmp_decode(data: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed BMP to uint8 (H, W, 3) RGB."""
    if data[:2] != b"BM":
        raise ValueError("bmp_decode: not a BMP")
    (pixel_off,) = struct.unpack_from("<I", data, 10)
    hdr_size, w, h = struct.unpack_from("<Iii", data, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", data, 26)
    if bpp != 24 or compression != 0:
        raise ValueError(
            f"bmp_decode: unsupported BMP (bpp={bpp}, "
            f"compression={compression})")
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    out = np.zeros((h, w, 3), dtype=np.uint8)
    for y in range(h):
        row = np.frombuffer(data, dtype=np.uint8, count=w * 3,
                            offset=pixel_off + y * stride)
        dst = h - 1 - y if bottom_up else y
        out[dst] = row.reshape(w, 3)[:, ::-1]  # BGR -> RGB
    return out


# ---------------------------------------------------------------------------
# Grayscale, DCT, pHash
# ---------------------------------------------------------------------------

def to_gray(arr: np.ndarray) -> np.ndarray:
    """ITU-R 601 luma in float64 (Pillow's convert('L') weights), from
    (H, W[, C]) uint8."""
    a = np.asarray(arr, dtype=np.float64)
    if a.ndim == 2:
        return a
    return (a[:, :, 0] * 299 + a[:, :, 1] * 587 + a[:, :, 2] * 114) / 1000.0


def _dct_matrix(n: int) -> np.ndarray:
    k = np.arange(n)[:, None].astype(np.float64)
    i = np.arange(n)[None, :].astype(np.float64)
    m = np.cos(np.pi * (2 * i + 1) * k / (2 * n))
    m[0] *= np.sqrt(1.0 / n)
    m[1:] *= np.sqrt(2.0 / n)
    return m


def dct2(a: np.ndarray) -> np.ndarray:
    """Orthonormal 2-D type-II DCT (explicit cosine matrices — no scipy
    in the container; N<=64 here, so the O(N^3) matmul is nothing)."""
    m_r = _dct_matrix(a.shape[0])
    m_c = _dct_matrix(a.shape[1])
    return m_r @ a @ m_c.T


def _resize_area(gray: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Box/area-average resample: each target pixel is the mean of its
    (fractionally weighted) source box — deterministic and alias-free
    on downscale, which is the only direction pHash needs."""
    h, w = gray.shape
    ys = np.linspace(0, h, out_h + 1)
    xs = np.linspace(0, w, out_w + 1)
    # integral image makes each box mean O(1)
    ii = np.zeros((h + 1, w + 1), dtype=np.float64)
    ii[1:, 1:] = np.cumsum(np.cumsum(gray, axis=0), axis=1)

    def box_sum(y0, y1, x0, x1):
        # fractional boxes via bilinear interpolation of the integral
        def at(y, x):
            yi, xi = int(y), int(x)
            fy, fx = y - yi, x - xi
            yi2, xi2 = min(yi + 1, h), min(xi + 1, w)
            return ((1 - fy) * (1 - fx) * ii[yi, xi]
                    + (1 - fy) * fx * ii[yi, xi2]
                    + fy * (1 - fx) * ii[yi2, xi]
                    + fy * fx * ii[yi2, xi2])
        return at(y1, x1) - at(y0, x1) - at(y1, x0) + at(y0, x0)

    out = np.zeros((out_h, out_w), dtype=np.float64)
    for r in range(out_h):
        for c in range(out_w):
            area = (ys[r + 1] - ys[r]) * (xs[c + 1] - xs[c])
            out[r, c] = box_sum(ys[r], ys[r + 1], xs[c], xs[c + 1]) / area
    return out


def phash64(arr: np.ndarray) -> int:
    """Classic 64-bit perceptual hash: grayscale → 32x32 area resample
    → 2-D DCT → the 8x8 low-frequency band (DC excluded from the
    threshold) → median threshold → bits row-major, returned as a
    SIGNED 64-bit int (the LongType slot convention used by
    ``image_phash_near_dup``)."""
    g = to_gray(arr)
    small = _resize_area(g, 32, 32)
    d = dct2(small)
    # quantize the band before thresholding: the matmul's ulp noise is
    # BLAS-kernel- (hence host-microarchitecture-) dependent, and on a
    # low-detail image many coefficients are analytically EQUAL to the
    # median — comparing raw floats makes those bits follow the noise.
    # 1e-6 is ~5 orders above worst-case dgemm error at this scale
    # (eps * 32 * 255*32 ≈ 4e-11) and ~5 below any real coefficient
    # separation, so only true ties are coalesced.
    band = np.round(d[:8, :8], 6)
    flat = band.flatten()
    med = float(np.median(flat[1:]))  # exclude DC from the threshold
    bits = flat > med
    bits[0] = flat[0] > med
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    if v >= 1 << 63:
        v -= 1 << 64
    return v


def decode_image(data: bytes) -> np.ndarray:
    """Decode PNG, BMP or baseline JPEG bytes by magic; ValueError for
    anything else (including progressive/CMYK JPEG — the r15 codec in
    ``functions/jpeg.py`` is baseline-sequential only)."""
    if data[:8] == _PNG_MAGIC:
        return png_decode(data)
    if data[:2] == b"BM":
        return bmp_decode(data)
    if data[:3] == b"\xff\xd8\xff":
        from .jpeg import jpeg_decode

        return jpeg_decode(data)
    raise ValueError("decode_image: not a PNG/BMP/JPEG payload")


def is_uncompressed_image(data: bytes) -> bool:
    """True when the payload is a format the stdlib codecs handle.

    The BMP sniff validates header fields beyond the 2-byte magic
    (header size, 24 bpp, no compression): ``auto_image_decoder``
    dispatches on this over arbitrary binary columns, where a random
    payload starts with ``BM`` once per ~65k rows — the extra fields
    push a false positive past 1 in 2^80."""
    if not isinstance(data, (bytes, bytearray, memoryview)):
        return False
    b = bytes(data[:34])
    if b[:8] == _PNG_MAGIC:
        # Sniff the IHDR fields the same way the BMP branch validates
        # bpp/compression (ADVICE r14): png_decode only handles 8-bit
        # non-interlaced gray/RGB/RGBA, so a 16-bit / palette /
        # interlaced PNG must route to the fallback decoder instead of
        # crashing the mapInPandas job. IHDR is required to be the
        # first chunk: payload at fixed offset 16, depth byte 24,
        # color type 25, interlace 28.
        if len(b) < 29 or b[12:16] != b"IHDR":
            return False
        depth, color, interlace = b[24], b[25], b[28]
        return depth == 8 and color in (0, 2, 6) and interlace == 0
    if b[:2] == b"BM" and len(b) >= 34:
        hdr_size = int.from_bytes(b[14:18], "little")
        bpp = int.from_bytes(b[28:30], "little")
        comp = int.from_bytes(b[30:34], "little")
        return hdr_size in (40, 56, 108, 124) and bpp == 24 and comp == 0
    return False


def is_decodable_image(data: bytes) -> bool:
    """True when ``decode_image`` handles the payload: the uncompressed
    stdlib formats (PNG/BMP, header-validated) plus baseline JFIF
    (marker-walk sniff rejecting progressive/CMYK/12-bit — r15,
    ``functions/jpeg.py``). This is the ``auto_image_decoder`` dispatch
    predicate; ``is_uncompressed_image`` keeps its narrower PNG/BMP
    meaning for callers that need a compression-free guarantee."""
    if is_uncompressed_image(data):
        return True
    if (isinstance(data, (bytes, bytearray, memoryview))
            and bytes(data[:3]) == b"\xff\xd8\xff"):
        from .jpeg import sniff_baseline_jpeg

        return sniff_baseline_jpeg(bytes(data))
    return False
