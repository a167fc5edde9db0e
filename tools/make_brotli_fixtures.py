#!/usr/bin/env python3
"""Brotli (RFC 7932) fixture + constant-table provenance.

Everything here comes from the SYSTEM brotli libraries (libbrotlicommon /
libbrotlienc / libbrotlidec via ctypes) so the Scala decoder is pinned
against an independent implementation:

 - src/main/resources/graft/brotli_dict.bin: the RFC 7932 Appendix A
   static dictionary (122,784 bytes). This is format-constant DATA the
   spec defines — the same bytes every conformant implementation embeds.
 - src/main/resources/graft/brotli_context.bin: the 2,048-byte context
   lookup table of RFC 7932 §7.1 (four modes x (lut0|lut1) x 256).
 - src/test/resources/brotli/: payloads compressed by libbrotlienc across
   quality/window settings, plus transform ground truth
   (transforms.txt: every transform id applied to probe words by
   BrotliTransformDictionaryWord).

Run from the repo root: python3 tools/make_brotli_fixtures.py
"""
import ctypes
import os

common = ctypes.CDLL("libbrotlicommon.so.1")
enc = ctypes.CDLL("libbrotlienc.so.1")
dec = ctypes.CDLL("libbrotlidec.so.1")


class BrotliDictionary(ctypes.Structure):
    _fields_ = [
        ("size_bits_by_length", ctypes.c_uint8 * 32),
        ("offsets_by_length", ctypes.c_uint32 * 32),
        ("data_size", ctypes.c_size_t),
        ("data", ctypes.POINTER(ctypes.c_uint8)),
    ]


class BrotliTransforms(ctypes.Structure):
    _fields_ = [
        ("prefix_suffix_size", ctypes.c_uint16),
        ("prefix_suffix", ctypes.POINTER(ctypes.c_uint8)),
        ("prefix_suffix_map", ctypes.POINTER(ctypes.c_uint16)),
        ("num_transforms", ctypes.c_uint32),
        ("transforms", ctypes.POINTER(ctypes.c_uint8)),
        ("params", ctypes.POINTER(ctypes.c_uint8)),
        ("cutOffTransforms", ctypes.c_int16 * 10),
    ]


common.BrotliGetDictionary.restype = ctypes.POINTER(BrotliDictionary)
common.BrotliGetTransforms.restype = ctypes.POINTER(BrotliTransforms)
common.BrotliTransformDictionaryWord.restype = ctypes.c_int
common.BrotliTransformDictionaryWord.argtypes = [
    ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
    ctypes.c_int, ctypes.POINTER(BrotliTransforms), ctypes.c_int]

MAIN_RES = "src/main/resources/graft"
TEST_RES = "src/test/resources/brotli"
os.makedirs(MAIN_RES, exist_ok=True)
os.makedirs(TEST_RES, exist_ok=True)

# --- static dictionary -------------------------------------------------
d = common.BrotliGetDictionary().contents
assert d.data_size == 122784, d.data_size  # RFC 7932 Appendix A size
dict_bytes = bytes(ctypes.cast(
    d.data, ctypes.POINTER(ctypes.c_uint8 * d.data_size)).contents)
with open(f"{MAIN_RES}/brotli_dict.bin", "wb") as f:
    f.write(dict_bytes)
print("dict: size", d.data_size)
print("size_bits_by_length:", list(d.size_bits_by_length))
print("offsets_by_length:", list(d.offsets_by_length))

# --- context lookup table (RFC 7932 7.1) --------------------------------
lut = (ctypes.c_uint8 * 2048).in_dll(common, "_kBrotliContextLookupTable")
with open(f"{MAIN_RES}/brotli_context.bin", "wb") as f:
    f.write(bytes(lut))
print("context lut: 2048 bytes")

# --- transforms (RFC 7932 Appendix B) -----------------------------------
t = common.BrotliGetTransforms().contents
assert t.num_transforms == 121, t.num_transforms
pool = bytes(ctypes.cast(
    t.prefix_suffix,
    ctypes.POINTER(ctypes.c_uint8 * t.prefix_suffix_size)).contents)
triples = bytes(ctypes.cast(
    t.transforms,
    ctypes.POINTER(ctypes.c_uint8 * (t.num_transforms * 3))).contents)


def pooled(idx):
    # prefix_suffix pool holds LENGTH-PREFIXED segments; the map gives
    # the offset of each segment's length byte
    off = t.prefix_suffix_map[idx]
    n = pool[off]
    return pool[off + 1:off + 1 + n]


OPS = {0: "ID"}
for i in range(1, 10):
    OPS[i] = f"OL{i}"  # omit last i
OPS[10] = "UF"  # uppercase first
OPS[11] = "UA"  # uppercase all
for i in range(12, 21):
    OPS[i] = f"OF{i - 11}"  # omit first 1..9

with open(f"{TEST_RES}/transforms.txt", "w") as f:
    for i in range(t.num_transforms):
        pid, op, sid = triples[3 * i], triples[3 * i + 1], triples[3 * i + 2]
        pre, suf = pooled(pid), pooled(sid)
        f.write(f"{i} {pre.hex()} {OPS[op]} {suf.hex()}\n")
print("transforms: wrote", t.num_transforms, "triples")

# ground truth: every transform applied to probe words via the system lib
probes = [b"abcdefgh", b"work", b"sensitive communication",
          b"\xc3\xa9t\xc3\xa9 time", b"\xe4\xb8\xad\xe6\x96\x87 page"]
with open(f"{TEST_RES}/transform_probes.txt", "w") as f:
    for w in probes:
        src = (ctypes.c_uint8 * len(w))(*w)
        for i in range(t.num_transforms):
            dst = (ctypes.c_uint8 * (len(w) + 64))()
            n = common.BrotliTransformDictionaryWord(
                dst, src, len(w), ctypes.byref(t), i)
            f.write(f"{w.hex()} {i} {bytes(dst[:n]).hex()}\n")
print("transform probes: wrote", len(probes) * t.num_transforms, "rows")

# --- encoded fixtures ----------------------------------------------------
enc.BrotliEncoderCompress.restype = ctypes.c_int
enc.BrotliEncoderCompress.argtypes = [
    ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_size_t,
    ctypes.c_char_p, ctypes.POINTER(ctypes.c_size_t), ctypes.c_char_p]


def compress(data: bytes, quality: int, lgwin: int, mode: int = 0) -> bytes:
    out_size = ctypes.c_size_t(len(data) + 1024)
    out = ctypes.create_string_buffer(out_size.value)
    ok = enc.BrotliEncoderCompress(
        quality, lgwin, mode, len(data), data, ctypes.byref(out_size), out)
    assert ok == 1
    return out.raw[:out_size.value]


english = (b"This is a test of the emergency broadcast system. "
           b"The quick brown fox jumps over the lazy dog. "
           b"Communication between the people of the world and the "
           b"information they need should be free and available. "
           b"Data processing at scale requires careful attention to "
           b"the distribution of work across the available machines. ")
payloads = {
    "empty": b"",
    "a": b"a",
    "english": english * 3,
    "dictheavy": (b"the of and that have with this from they which "
                  b"people about would there their what time when your "
                  b"said each because does through between communication "
                  b"information available attention distribution ") * 2,
    "binary": bytes(range(256)) * 40,
    "zeros": b"\x00" * 70000,  # spans multiple meta-blocks at low quality
    "utf8": ("héllo wörld 数据 データ 데이터 — mixed script text. " * 50
             ).encode("utf-8"),
    "rep": b"abcabcabcabd" * 600,
}
manifest = []
for name, data in payloads.items():
    with open(f"{TEST_RES}/{name}.raw", "wb") as f:
        f.write(data)
    for q in (0, 1, 2, 5, 9, 11):
        for lgwin in (10, 18, 22, 24):
            if lgwin != 22 and q not in (1, 11):
                continue  # keep the matrix small but cover window range
            b = compress(data, q, lgwin)
            fn = f"{name}.q{q}w{lgwin}.br"
            with open(f"{TEST_RES}/{fn}", "wb") as f:
                f.write(b)
            manifest.append((fn, f"{name}.raw"))
with open(f"{TEST_RES}/manifest.txt", "w") as f:
    for fn, raw in manifest:
        f.write(f"{fn} {raw}\n")
print("fixtures:", len(manifest))
