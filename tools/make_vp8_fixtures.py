#!/usr/bin/env python3
"""VP8 (lossy WebP, RFC 6386) fixtures + constant-table provenance.

Everything comes from the SYSTEM libwebp via ctypes so the Scala
decoder is pinned against the reference implementation:

 - src/main/resources/graft/vp8_tables.bin: the RFC 6386 constant
   tables, located in libwebp's .rodata by content signature (the RFC
   publishes them in its reference decoder source; every conformant
   implementation embeds the same bytes). Layout, concatenated:
     coeff default probs   [4][8][3][11]  1056 bytes
     coeff update probs    [4][8][3][11]  1056 bytes
     kf b-mode probs       [10][10][9]     900 bytes
     dc dequant lookup     [128] u8        128 bytes
     ac dequant lookup     [128] u16le     256 bytes
 - src/test/resources/vp8/: rasters encoded by WebPEncodeRGB across
   quality settings, each with libwebp's own decoded Y/U/V planes
   (WebPDecodeYUV) as ground truth — the decoder's native output,
   bit-exact regardless of any RGB upsampling policy.

Run from the repo root: python3 tools/make_vp8_fixtures.py
"""
import ctypes
import os
import random
import struct

LIBPATH = "/lib/x86_64-linux-gnu/libwebp.so.7.1.5"
LIB = ctypes.CDLL(LIBPATH)

MAIN_RES = "src/main/resources/graft"
TEST_RES = "src/test/resources/vp8"
os.makedirs(MAIN_RES, exist_ok=True)
os.makedirs(TEST_RES, exist_ok=True)

# --- constant tables by content signature --------------------------------
data = open(LIBPATH, "rb").read()


def locate(pat, expect=2):
    hits = []
    i = data.find(pat)
    while i >= 0:
        hits.append(i)
        i = data.find(pat, i + 1)
    assert len(hits) == expect, (pat.hex(), hits)
    return hits[0]


# default coeff probs: anchored by the first NON-TRIVIAL row — the
# table's real start is 33 bytes earlier (type 0 band 0 is unused for
# with-Y2 luma, so the RFC fills its three context rows with 128s)
proba0_at = locate(bytes([253, 136, 254, 255, 228, 219, 128, 128, 128,
                          128, 128])) - 33
assert data[proba0_at:proba0_at + 11] == bytes([128] * 11)
# kf b-mode probs: the RFC's first row
bmodes_at = locate(bytes([231, 120, 48, 89, 115, 113, 120, 152, 112]))
# coeff update probs sit immediately before the b-mode table
update_at = bmodes_at - 1056
# dequant lookups: dc as u8 (4,5,6,7,8,9,10,10,11,...), ac as u16le
dc_at = locate(bytes([4, 5, 6, 7, 8, 9, 10, 10, 11, 12, 13, 14, 15, 16,
                      17, 17]))
ac_at = locate(struct.pack("<10H", 4, 5, 6, 7, 8, 9, 10, 11, 12, 13))

proba0 = data[proba0_at:proba0_at + 1056]
update = data[update_at:update_at + 1056]
bmodes_raw = data[bmodes_at:bmodes_at + 900]
# libwebp's internal b-mode enum permutes the RFC's order
# (B_RD/B_VR/B_LD sit at 4/5/6 instead of the RFC's LD/RD/VR);
# its kBModesProba is indexed by that enum, so reorder both axes
# back to RFC numbering (rows 0-3 and 7-9 are unchanged — which is
# why prefix matching alone could not catch this)
perm = [0, 1, 2, 3, 6, 4, 5, 7, 8, 9]  # rfc index -> libwebp index
bmodes = bytes(
    bmodes_raw[(perm[a] * 10 + perm[l]) * 9 + p]
    for a in range(10) for l in range(10) for p in range(9))
dc = data[dc_at:dc_at + 128]
ac = data[ac_at:ac_at + 256]
# sanity: update probs are all >= 176 (near-certain "no update");
# dequant tables are monotonic and end at the RFC's final values
assert min(update) >= 100 and update[0] == 255
assert dc[127] == 157
assert struct.unpack("<128H", ac)[127] == 284
with open(f"{MAIN_RES}/vp8_tables.bin", "wb") as f:
    f.write(proba0 + update + bmodes + dc + ac)
print("tables:", 1056 + 1056 + 900 + 128 + 256, "bytes")

# --- fixtures --------------------------------------------------------------
LIB.WebPEncodeRGB.restype = ctypes.c_size_t
LIB.WebPEncodeRGB.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
                              ctypes.c_int, ctypes.c_float,
                              ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte))]
LIB.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_ubyte)
LIB.WebPDecodeYUV.argtypes = [
    ctypes.c_char_p, ctypes.c_size_t,
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
    ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
LIB.WebPFree.argtypes = [ctypes.c_void_p]


def encode_rgb(rgb: bytes, w: int, h: int, q: float) -> bytes:
    out = ctypes.POINTER(ctypes.c_ubyte)()
    n = LIB.WebPEncodeRGB(rgb, w, h, w * 3, q, ctypes.byref(out))
    assert n > 0
    enc = bytes(out[:n])
    LIB.WebPFree(out)
    return enc


def decode_yuv(enc: bytes):
    w = ctypes.c_int(); h = ctypes.c_int()
    u = ctypes.POINTER(ctypes.c_ubyte)(); v = ctypes.POINTER(ctypes.c_ubyte)()
    stride = ctypes.c_int(); uv_stride = ctypes.c_int()
    y = LIB.WebPDecodeYUV(enc, len(enc), ctypes.byref(w), ctypes.byref(h),
                          ctypes.byref(u), ctypes.byref(v),
                          ctypes.byref(stride), ctypes.byref(uv_stride))
    assert y
    W, H, S, US = w.value, h.value, stride.value, uv_stride.value
    cw, ch = (W + 1) // 2, (H + 1) // 2
    yb = b"".join(bytes(y[r * S:r * S + W]) for r in range(H))
    ub = b"".join(bytes(u[r * US:r * US + cw]) for r in range(ch))
    vb = b"".join(bytes(v[r * US:r * US + cw]) for r in range(ch))
    LIB.WebPFree(y)
    return W, H, yb, ub, vb


def raster(kind, w, h):
    rnd = random.Random(hash((kind, w, h)) & 0xffffffff)
    out = bytearray()
    for yy in range(h):
        for xx in range(w):
            if kind == "gradient":
                out += bytes(((xx * 255 // max(1, w - 1)),
                              (yy * 255 // max(1, h - 1)),
                              ((xx + yy) * 127 // max(1, w + h - 2))))
            elif kind == "flat":
                out += bytes((90, 140, 200))
            elif kind == "blocks":
                c = 40 + 170 * (((xx // 8) + (yy // 8)) % 2)
                out += bytes((c, 255 - c, (c * 3) % 256))
            elif kind == "photo":
                import math
                out += bytes((
                    int(127 + 120 * math.sin(xx * 0.21) * math.cos(yy * 0.17)) & 0xff,
                    int(127 + 120 * math.sin((xx + yy) * 0.11)) & 0xff,
                    int(127 + 120 * math.cos(xx * 0.07 - yy * 0.23)) & 0xff))
            else:  # noise
                out += bytes((rnd.randrange(256), rnd.randrange(256),
                              rnd.randrange(256)))
    return bytes(out)


manifest = []
cases = [
    ("flat", 16, 16), ("gradient", 16, 16), ("gradient", 32, 32),
    ("blocks", 48, 32), ("photo", 64, 48), ("photo", 33, 17),
    ("noise", 20, 12), ("gradient", 129, 65), ("photo", 160, 120),
    ("blocks", 17, 31), ("noise", 64, 64), ("gradient", 8, 8),
]
for kind, w, h in cases:
    rgb = raster(kind, w, h)
    for q in (10, 50, 75, 95):
        enc = encode_rgb(rgb, w, h, q)
        W, H, yb, ub, vb = decode_yuv(enc)
        assert (W, H) == (w, h)
        name = f"{kind}_{w}x{h}_q{q}"
        with open(f"{TEST_RES}/{name}.webp", "wb") as f:
            f.write(enc)
        with open(f"{TEST_RES}/{name}.yuv", "wb") as f:
            f.write(yb + ub + vb)
        manifest.append(f"{name} {w} {h}")
with open(f"{TEST_RES}/manifest.txt", "w") as f:
    f.write("\n".join(manifest) + "\n")
print("fixtures:", len(manifest))

# --- RGB (no-fancy / point-sampling) ground truth ---------------------------
# The container decode path converts YUV to RGB with libwebp's
# point-sampling fixed-point formula (src/dsp/yuv.h: MultHiVal >>8,
# 19077/26149/6419/13320/33050 coefficients, >>6 with range-test
# clipping). Verified here byte-exact against WebPDecode(MODE_RGB,
# no_fancy_upsampling=1) over the FULL fixture matrix; a subset ships
# as .rgb files so Vp8DecodeSpec pins the Scala conversion against
# libwebp's own RGB bytes rather than against the same formula.


class _Feat(ctypes.Structure):
    _fields_ = [("width", ctypes.c_int), ("height", ctypes.c_int),
                ("has_alpha", ctypes.c_int), ("has_animation", ctypes.c_int),
                ("format", ctypes.c_int), ("pad", ctypes.c_uint32 * 5)]


class _Rgba(ctypes.Structure):
    _fields_ = [("rgba", ctypes.POINTER(ctypes.c_ubyte)),
                ("stride", ctypes.c_int), ("size", ctypes.c_size_t)]


class _Yuva(ctypes.Structure):
    _fields_ = [("y", ctypes.POINTER(ctypes.c_ubyte)),
                ("u", ctypes.POINTER(ctypes.c_ubyte)),
                ("v", ctypes.POINTER(ctypes.c_ubyte)),
                ("a", ctypes.POINTER(ctypes.c_ubyte)),
                ("y_stride", ctypes.c_int), ("u_stride", ctypes.c_int),
                ("v_stride", ctypes.c_int), ("a_stride", ctypes.c_int),
                ("y_size", ctypes.c_size_t), ("u_size", ctypes.c_size_t),
                ("v_size", ctypes.c_size_t), ("a_size", ctypes.c_size_t)]


class _BufU(ctypes.Union):
    _fields_ = [("RGBA", _Rgba), ("YUVA", _Yuva)]


class _DecBuf(ctypes.Structure):
    _fields_ = [("colorspace", ctypes.c_int), ("width", ctypes.c_int),
                ("height", ctypes.c_int), ("is_external_memory", ctypes.c_int),
                ("u", _BufU), ("pad", ctypes.c_uint32 * 4),
                ("private_memory", ctypes.c_void_p)]


class _DecOpts(ctypes.Structure):
    _fields_ = [("bypass_filtering", ctypes.c_int),
                ("no_fancy_upsampling", ctypes.c_int),
                ("use_cropping", ctypes.c_int),
                ("crop_left", ctypes.c_int), ("crop_top", ctypes.c_int),
                ("crop_width", ctypes.c_int), ("crop_height", ctypes.c_int),
                ("use_scaling", ctypes.c_int),
                ("scaled_width", ctypes.c_int), ("scaled_height", ctypes.c_int),
                ("use_threads", ctypes.c_int),
                ("dithering_strength", ctypes.c_int),
                ("flip", ctypes.c_int),
                ("alpha_dithering_strength", ctypes.c_int),
                ("pad", ctypes.c_uint32 * 5)]


class _DecCfg(ctypes.Structure):
    _fields_ = [("input", _Feat), ("output", _DecBuf), ("options", _DecOpts)]


LIB.WebPInitDecoderConfigInternal.restype = ctypes.c_int
LIB.WebPDecode.restype = ctypes.c_int
_ABI = next(v for v in range(0x200, 0x212)
            if LIB.WebPInitDecoderConfigInternal(
                ctypes.byref(_DecCfg()), v) == 1)


def decode_rgb_nofancy(enc: bytes):
    cfg = _DecCfg()
    assert LIB.WebPInitDecoderConfigInternal(ctypes.byref(cfg), _ABI) == 1
    cfg.options.no_fancy_upsampling = 1
    cfg.output.colorspace = 0  # MODE_RGB
    assert LIB.WebPDecode(enc, len(enc), ctypes.byref(cfg)) == 0
    w, h, st = cfg.output.width, cfg.output.height, cfg.output.u.RGBA.stride
    raw = bytes(cfg.output.u.RGBA.rgba[:st * h])
    LIB.WebPFreeDecBuffer(ctypes.byref(cfg.output))
    return w, h, b"".join(raw[r * st:r * st + 3 * w] for r in range(h))


def _clip8(v):
    return (v >> 6) if (v & ~((256 << 6) - 1)) == 0 else (0 if v < 0 else 255)


def _conv(y, u, v):
    t = (y * 19077) >> 8
    return (_clip8(t + ((v * 26149) >> 8) - 14234),
            _clip8(t - ((u * 6419) >> 8) - ((v * 13320) >> 8) + 8708),
            _clip8(t + ((u * 33050) >> 8) - 17685))


RGB_SHIP = {"photo_64x48_q75", "blocks_17x31_q50", "gradient_129x65_q95",
            "noise_20x12_q10", "flat_16x16_q95", "photo_33x17_q10"}
checked = 0
for line in open(f"{TEST_RES}/manifest.txt"):
    if not line.strip():
        continue
    name, w, h = line.split()[0], int(line.split()[1]), int(line.split()[2])
    enc = open(f"{TEST_RES}/{name}.webp", "rb").read()
    yuv = open(f"{TEST_RES}/{name}.yuv", "rb").read()
    W, H, rgb = decode_rgb_nofancy(enc)
    assert (W, H) == (w, h)
    cw = (w + 1) // 2
    Y, U = yuv[:w * h], yuv[w * h:w * h + cw * ((h + 1) // 2)]
    V = yuv[w * h + cw * ((h + 1) // 2):]
    for yy in range(h):
        for xx in range(w):
            want = _conv(Y[yy * w + xx], U[(yy // 2) * cw + xx // 2],
                         V[(yy // 2) * cw + xx // 2])
            got = tuple(rgb[3 * (yy * w + xx):3 * (yy * w + xx) + 3])
            assert got == want, (name, xx, yy, got, want)
    checked += 1
    if name in RGB_SHIP:
        with open(f"{TEST_RES}/{name}.rgb", "wb") as f:
            f.write(rgb)
print("rgb formula verified on", checked, "fixtures;",
      len(RGB_SHIP), "shipped")
