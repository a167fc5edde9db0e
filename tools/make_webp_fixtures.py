#!/usr/bin/env python3
"""Generate WebP-lossless ground-truth fixtures for WebpDecodeSpec.

Encodes known RGBA rasters with the SYSTEM libwebp (the reference
implementation of RFC 9649) via ctypes and writes
  src/test/resources/webp/<name>.webp   encoded bytes
  src/test/resources/webp/<name>.rgba   expected raw RGBA (w*h*4)
  src/test/resources/webp/manifest.txt  "<name> <w> <h>" per line
The content of each case is chosen to push the encoder into a
different part of the format: noise (dense prefix codes), gradients
(predictor transform), few-color rasters (color-indexing + pixel
bundling at every packing width), repeated tiles (LZ77 with the
120-entry short-distance codes), smooth photo-ish data (cross-color
transform), constants (single-symbol codes), and 1-pixel-wide/tall
edge shapes. Alpha never hits 0: the default encoder may rewrite RGB
under fully-transparent pixels (config.exact=0), which would make the
"decode returns the encoder input" oracle false.

Run from the repo root:  python3 tools/make_webp_fixtures.py
Deterministic (seeded) so the fixtures are reproducible.
"""
import ctypes
import os
import random

LIB = ctypes.CDLL('/usr/lib/x86_64-linux-gnu/libwebp.so.7')
LIB.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
LIB.WebPEncodeLosslessRGBA.argtypes = [
    ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte))]
LIB.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_ubyte)
LIB.WebPFree.argtypes = [ctypes.c_void_p]

OUT = os.path.join(os.path.dirname(__file__), '..',
                   'src', 'test', 'resources', 'webp')


def encode(rgba: bytes, w: int, h: int) -> bytes:
    out = ctypes.POINTER(ctypes.c_ubyte)()
    n = LIB.WebPEncodeLosslessRGBA(rgba, w, h, w * 4, ctypes.byref(out))
    assert n > 0, 'encode failed'
    enc = bytes(out[:n])
    LIB.WebPFree(out)
    # sanity: libwebp's own decoder must return the input exactly
    ww = ctypes.c_int()
    hh = ctypes.c_int()
    dec = LIB.WebPDecodeRGBA(enc, ctypes.c_size_t(n),
                             ctypes.byref(ww), ctypes.byref(hh))
    back = bytes(dec[:w * h * 4])
    LIB.WebPFree(dec)
    assert (ww.value, hh.value) == (w, h) and back == rgba, \
        'libwebp round-trip failed — fixture would be wrong'
    return enc


def px(r, g, b, a=255):
    return bytes((r & 0xff, g & 0xff, b & 0xff, max(1, a & 0xff)))


def cases():
    rnd = random.Random(20260816)

    def noise(w, h):
        return b''.join(px(rnd.randrange(256), rnd.randrange(256),
                           rnd.randrange(256), rnd.randrange(1, 256))
                        for _ in range(w * h))

    yield 'noise_small', 11, 7, noise(11, 7)
    yield 'noise_mid', 64, 37, noise(64, 37)

    w, h = 33, 9
    yield 'gradient_h', w, h, b''.join(
        px(x * 255 // (w - 1), 128, 255 - x * 255 // (w - 1))
        for y in range(h) for x in range(w))

    w, h = 16, 16
    yield 'gradient_va', w, h, b''.join(
        px(60, y * 16, x * 16, 16 + y * 14)
        for y in range(h) for x in range(w))

    w, h = 24, 24
    yield 'two_color', w, h, b''.join(
        px(255, 0, 0) if (x + y) % 2 == 0 else px(0, 0, 255)
        for y in range(h) for x in range(w))

    w, h = 19, 5
    pal4 = [px(10, 20, 30), px(200, 100, 50), px(0, 255, 0, 128),
            px(77, 77, 77)]
    yield 'four_color', w, h, b''.join(
        pal4[(x // 2 + y) % 4] for y in range(h) for x in range(w))

    w, h = 40, 11
    pal16 = [px(rnd.randrange(256), rnd.randrange(256), rnd.randrange(256),
                rnd.randrange(1, 256)) for _ in range(16)]
    yield 'sixteen_color', w, h, b''.join(
        pal16[rnd.randrange(16)] for _ in range(w * h))

    w, h = 30, 30
    pal200 = [px(rnd.randrange(256), rnd.randrange(256), rnd.randrange(256))
              for _ in range(200)]
    yield 'palette_200', w, h, b''.join(
        pal200[rnd.randrange(200)] for _ in range(w * h))

    # repeated tile: dense 2-D self similarity drives LZ77 backward
    # references through the short (plane-code) distance mapping
    w, h = 48, 20
    tile = [px(rnd.randrange(256), rnd.randrange(256), rnd.randrange(256))
            for _ in range(8 * 5)]
    yield 'tiles', w, h, b''.join(
        tile[(y % 5) * 8 + x % 8] for y in range(h) for x in range(w))

    w, h = 256, 1
    yield 'single_row', w, h, b''.join(px(x, 255 - x, x ^ 0x55)
                                       for x in range(w))
    w, h = 1, 77
    yield 'single_col', w, h, b''.join(px(3 * y, y, 255 - 2 * y)
                                       for y in range(h))
    yield 'one_px', 1, 1, px(1, 2, 3, 4)

    # smooth photo-ish content: gradients + correlated channels + a
    # little noise — the shape that makes the encoder reach for the
    # predictor and cross-color transforms together
    w, h = 80, 60
    out = []
    for y in range(h):
        for x in range(w):
            g = (x * 2 + y) % 256
            out.append(px(g // 2 + rnd.randrange(8), g,
                          (g * 3 // 4 + rnd.randrange(4)) % 256))
    yield 'photoish', w, h, b''.join(out)

    yield 'constant', 50, 50, px(12, 34, 56, 78) * 2500

    # text-like: long runs of two values with occasional flips
    w, h = 100, 30
    bits = []
    v = 0
    for _ in range(w * h):
        if rnd.random() < 0.07:
            v = 1 - v
        bits.append(px(0, 0, 0) if v else px(255, 255, 255))
    yield 'textlike', w, h, b''.join(bits)


def main():
    os.makedirs(OUT, exist_ok=True)
    lines = []
    for name, w, h, rgba in cases():
        assert len(rgba) == w * h * 4
        enc = encode(rgba, w, h)
        with open(os.path.join(OUT, name + '.webp'), 'wb') as f:
            f.write(enc)
        with open(os.path.join(OUT, name + '.rgba'), 'wb') as f:
            f.write(rgba)
        lines.append(f'{name} {w} {h}')
        print(f'{name}: {w}x{h} -> {len(enc)} bytes')
    with open(os.path.join(OUT, 'manifest.txt'), 'w') as f:
        f.write('\n'.join(lines) + '\n')


if __name__ == '__main__':
    main()
