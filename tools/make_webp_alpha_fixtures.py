#!/usr/bin/env python3
"""Transparent lossy-WebP (ALPH chunk) fixtures from the SYSTEM libwebp.

Two fixture classes, both with libwebp's own no-fancy MODE_RGBA decode
as ground truth (.rgba files):

 - encoder-produced: WebPEncodeRGBA output — VP8X + ALPH with
   compression method 1 (a headerless VP8L stream carrying alpha in
   the green channel) + VP8, the shape real encoders emit.
 - hand-built raw-alpha: the same VP8 chunk re-wrapped with an ALPH of
   compression method 0 and each filter method 0-3, the residuals
   forward-filtered here so libwebp's own unfilter reconstructs the
   reference alpha plane — validating the filter semantics
   independently of the Scala decoder.

Run from the repo root: python3 tools/make_webp_alpha_fixtures.py
"""
import ctypes
import math
import os

LIBPATH = "/lib/x86_64-linux-gnu/libwebp.so.7.1.5"
LIB = ctypes.CDLL(LIBPATH)
OUT = "src/test/resources/webp_alpha"
os.makedirs(OUT, exist_ok=True)

LIB.WebPEncodeRGBA.restype = ctypes.c_size_t
LIB.WebPEncodeRGBA.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
                               ctypes.c_int, ctypes.c_float,
                               ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte))]


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


def enc_rgba(rgba: bytes, w: int, h: int, q: float) -> bytes:
    out = ctypes.POINTER(ctypes.c_ubyte)()
    n = LIB.WebPEncodeRGBA(rgba, w, h, w * 4, q, ctypes.byref(out))
    assert n > 0
    b = bytes(out[:n])
    LIB.WebPFree(out)
    return b


def dec_rgba_nofancy(enc: bytes):
    cfg = _DecCfg()
    assert LIB.WebPInitDecoderConfigInternal(ctypes.byref(cfg), _ABI) == 1
    cfg.options.no_fancy_upsampling = 1
    cfg.output.colorspace = 1  # MODE_RGBA
    assert LIB.WebPDecode(enc, len(enc), ctypes.byref(cfg)) == 0
    w, h, st = cfg.output.width, cfg.output.height, cfg.output.u.RGBA.stride
    raw = bytes(cfg.output.u.RGBA.rgba[:st * h])
    LIB.WebPFreeDecBuffer(ctypes.byref(cfg.output))
    return w, h, b"".join(raw[r * st:r * st + 4 * w] for r in range(h))


def raster_rgba(kind, w, h):
    out = bytearray()
    for y in range(h):
        for x in range(w):
            if kind == "alphagrad":
                out += bytes(((40 + x * 9) % 256, (200 - y * 5) % 256,
                              (x * y) % 256,
                              (x * 255 // max(1, w - 1))))
            elif kind == "alphanoise":
                s = (x * 2654435761 + y * 40503) & 0xffffffff
                out += bytes((s & 0xff, (s >> 8) & 0xff, (s >> 16) & 0xff,
                              (s >> 24) & 0xff))
            else:  # alphawave: smooth rgb, banded alpha incl. 0 and 255
                a = 0 if (x + y) % 7 == 0 else 255 if (x + y) % 7 < 4 \
                    else int(127 + 120 * math.sin(x * 0.4))
                out += bytes(((x * 5 + y * 3) % 256, (x + y * 6) % 256,
                              (255 - x * 4) % 256, a & 0xff))
    return bytes(out)


manifest = []
cases = [("alphagrad", 16, 16, 75), ("alphanoise", 20, 12, 50),
         ("alphawave", 33, 17, 95), ("alphagrad", 48, 32, 10)]
vp8_chunk = None
ref_alpha = None
ref_dims = None
for kind, w, h, q in cases:
    enc = enc_rgba(raster_rgba(kind, w, h), w, h, q)
    W, H, rgba = dec_rgba_nofancy(enc)
    assert (W, H) == (w, h)
    name = f"{kind}_{w}x{h}_q{q}"
    with open(f"{OUT}/{name}.webp", "wb") as f:
        f.write(enc)
    with open(f"{OUT}/{name}.rgba", "wb") as f:
        f.write(rgba)
    manifest.append(f"{name} {w} {h}")
    if name == "alphagrad_16x16_q75":
        i = 12
        while i + 8 <= len(enc):
            ln = int.from_bytes(enc[i + 4:i + 8], "little")
            if enc[i:i + 4] == b"VP8 ":
                vp8_chunk = enc[i + 8:i + 8 + ln]
            i += 8 + ln + (ln & 1)
        ref_alpha = bytes(rgba[4 * k + 3] for k in range(w * h))
        ref_dims = (w, h)

# --- hand-built raw-alpha (method 0) variants, filters 0-3 ------------------
assert vp8_chunk is not None
w, h = ref_dims


def grad(a, b, c):
    v = a + b - c
    return 0 if v < 0 else 255 if v > 255 else v


def forward_filter(A, w, h, f):
    out = bytearray(w * h)
    for y in range(h):
        for x in range(w):
            if f == 0:
                pred = 0
            elif f == 1:  # horizontal: above for col 0 of rows > 0
                pred = A[y * w + x - 1] if x > 0 else \
                    (A[(y - 1) * w] if y > 0 else 0)
            elif f == 2:  # vertical: first row falls back to horizontal
                pred = (A[x - 1] if x > 0 else 0) if y == 0 \
                    else A[(y - 1) * w + x]
            else:  # gradient: first row horizontal; col 0 -> clip(top)
                if y == 0:
                    pred = A[x - 1] if x > 0 else 0
                else:
                    left = A[y * w + x - 1] if x > 0 else 0
                    tl = A[(y - 1) * w + x - 1] if x > 0 else 0
                    pred = grad(left, A[(y - 1) * w + x], tl)
            out[y * w + x] = (A[y * w + x] - pred) & 0xff
    return bytes(out)


def chunk(tag, data):
    return tag.encode() + len(data).to_bytes(4, "little") + data + \
        (b"\x00" if len(data) & 1 else b"")


for f in range(4):
    raw = forward_filter(ref_alpha, w, h, f)
    vp8x = bytes([0x10, 0, 0, 0, (w - 1) & 0xff, (w - 1) >> 8, 0,
                  (h - 1) & 0xff, (h - 1) >> 8, 0])
    body = b"WEBP" + chunk("VP8X", vp8x) + \
        chunk("ALPH", bytes([f << 2]) + raw) + chunk("VP8 ", vp8_chunk)
    built = b"RIFF" + len(body).to_bytes(4, "little") + body
    W, H, rgba = dec_rgba_nofancy(built)  # libwebp must accept our mux
    assert (W, H) == (w, h)
    assert bytes(rgba[4 * k + 3] for k in range(w * h)) == ref_alpha, f
    name = f"rawalpha_f{f}_{w}x{h}"
    with open(f"{OUT}/{name}.webp", "wb") as fo:
        fo.write(built)
    with open(f"{OUT}/{name}.rgba", "wb") as fo:
        fo.write(rgba)
    manifest.append(f"{name} {w} {h}")

with open(f"{OUT}/manifest.txt", "w") as f:
    f.write("\n".join(manifest) + "\n")
print("alpha fixtures:", len(manifest))
