#!/usr/bin/env python3
"""Reference FLAC encoder (subset) for golden test fixtures.

Written independently of the Scala decoder, straight from RFC 9639:
emits STREAMINFO + frames with CONSTANT / VERBATIM / FIXED / LPC
subframes, rice/rice2 residuals with partitions and escapes, all four
channel assignments, wasted bits, and correct CRC-8/CRC-16. Prints
Scala test-fixture tuples (hex payload, expected interleaved samples).
"""
import sys

class BitW:
    def __init__(self):
        self.bits = []
    def w(self, v, n):
        assert 0 <= n <= 64
        if n:
            assert 0 <= v < (1 << n), (v, n)
        for k in range(n - 1, -1, -1):
            self.bits.append((v >> k) & 1)
    def ws(self, v, n):  # signed two's complement
        self.w(v & ((1 << n) - 1), n)
    def align(self):
        while len(self.bits) % 8:
            self.bits.append(0)
    def bytes(self):
        assert len(self.bits) % 8 == 0
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for k in range(8):
                b = (b << 1) | self.bits[i + k]
            out.append(b)
        return bytes(out)

def crc8(data):
    c = 0
    for by in data:
        c ^= by
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
    return c

def crc16(data):
    c = 0
    for by in data:
        c ^= by << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
    return c

FIXED = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}

def zigzag(e):
    return (e << 1) if e >= 0 else (-(e << 1) - 1)

def rice_write(w, residuals, param, method=0, part_order=0, escape_raw=None):
    w.w(method, 2)
    pbits = 4 if method == 0 else 5
    esc = (1 << pbits) - 1
    w.w(part_order, 4)
    parts = 1 << part_order
    total = len(residuals)
    # caller must arrange counts; here residuals are already just the coded ones
    per = (total  # computed by caller semantics; we re-derive below
           )
    # we need blockSize to derive partition sizes; caller passes via attribute
    bs, order = rice_write.block_size, rice_write.pred_order
    per = bs >> part_order
    idx = 0
    for p in range(parts):
        count = per - order if p == 0 else per
        if escape_raw is not None and p in escape_raw:
            raw = escape_raw[p]
            w.w(esc, pbits)
            w.w(raw, 5)
            for _ in range(count):
                e = residuals[idx]; idx += 1
                if raw:
                    w.ws(e, raw)
                else:
                    assert e == 0
        else:
            w.w(param, pbits)
            for _ in range(count):
                v = zigzag(residuals[idx]); idx += 1
                q, low = v >> param, v & ((1 << param) - 1)
                w.w(0, q); w.w(1, 1)
                if param:
                    w.w(low, param)
    assert idx == len(residuals)

def subframe(w, kind, samples, bps, wasted=0, order=None, param=6,
             method=0, part_order=0, escape_raw=None,
             lpc_coefs=None, lpc_shift=0, lpc_prec=12):
    w.w(0, 1)  # pad
    eff = bps - wasted
    vals = samples
    if wasted:
        assert all(v % (1 << wasted) == 0 for v in samples)
        vals = [v >> wasted for v in samples]
    if kind == "constant":
        w.w(0, 6)
        w.w(1 if wasted else 0, 1)
        if wasted:
            w.w(0, wasted - 1); w.w(1, 1)  # unary wasted count
        assert all(v == vals[0] for v in vals)
        w.ws(vals[0], eff)
        return
    if kind == "verbatim":
        w.w(1, 6)
        w.w(1 if wasted else 0, 1)
        if wasted:
            w.w(0, wasted - 1); w.w(1, 1)
        for v in vals:
            w.ws(v, eff)
        return
    if kind == "fixed":
        w.w(8 + order, 6)
        w.w(1 if wasted else 0, 1)
        if wasted:
            w.w(0, wasted - 1); w.w(1, 1)
        for v in vals[:order]:
            w.ws(v, eff)
        res = []
        for k in range(order, len(vals)):
            pred = sum(c * vals[k - 1 - j] for j, c in enumerate(FIXED[order]))
            res.append(vals[k] - pred)
        rice_write.block_size = len(vals); rice_write.pred_order = order
        rice_write(w, res, param, method, part_order, escape_raw)
        return
    if kind == "lpc":
        o = len(lpc_coefs)
        w.w(32 + o - 1, 6)
        w.w(1 if wasted else 0, 1)
        if wasted:
            w.w(0, wasted - 1); w.w(1, 1)
        for v in vals[:o]:
            w.ws(v, eff)
        w.w(lpc_prec - 1, 4)
        w.ws(lpc_shift, 5)
        for c in lpc_coefs:
            w.ws(c, lpc_prec)
        res = []
        for k in range(o, len(vals)):
            acc = sum(lpc_coefs[j] * vals[k - 1 - j] for j in range(o))
            res.append(vals[k] - (acc >> lpc_shift))
        rice_write.block_size = len(vals); rice_write.pred_order = o
        rice_write(w, res, param, method, part_order, escape_raw)
        return
    raise AssertionError(kind)

def utf8_num(w, n):
    assert n < 128
    w.w(n, 8)

def frame(frame_idx, chans, bps, ch_asgn, sub_specs):
    bs = len(chans[0])
    w = BitW()
    w.w(0x3FFE, 14); w.w(0, 1); w.w(0, 1)
    w.w(7, 4)            # 16-bit block size follows
    w.w(0, 4)            # rate from STREAMINFO
    w.w(ch_asgn, 4)
    w.w(0, 3)            # bits from STREAMINFO
    w.w(0, 1)
    utf8_num(w, frame_idx)
    w.w(bs - 1, 16)
    hdr = w.bytes()
    hdr += bytes([crc8(hdr)])
    w2 = BitW()
    for c, spec in enumerate(sub_specs):
        extra = 0
        if ch_asgn == 8 and c == 1: extra = 1
        if ch_asgn == 9 and c == 0: extra = 1
        if ch_asgn == 10 and c == 1: extra = 1
        subframe(w2, samples=chans[c], bps=bps + extra, **spec)
    w2.align()
    body = w2.bytes()
    whole = hdr + body
    whole += crc16(whole).to_bytes(2, "big")
    return whole

def streaminfo(rate, ch, bps, total):
    w = BitW()
    w.w(1, 1); w.w(0, 7)       # last block, STREAMINFO
    w.w(34, 24)
    w.w(16, 16); w.w(65535, 16)  # min/max block size
    w.w(0, 24); w.w(0, 24)       # frame sizes unknown
    w.w(rate, 20); w.w(ch - 1, 3); w.w(bps - 1, 5); w.w(total, 36)
    for _ in range(16): w.w(0, 8)  # md5 zero
    return w.bytes()

def emit(name, rate, bps, frames_spec):
    # frames_spec: list of (ch_asgn, stored_chans, expected_chans, specs)
    ch = len(frames_spec[0][2])
    total = sum(len(f[2][0]) for f in frames_spec)
    out = b"fLaC" + streaminfo(rate, ch, bps, total)
    expected = []
    for i, (asgn, stored, exp, specs) in enumerate(frames_spec):
        out += frame(i, stored, bps, asgn, specs)
        bs = len(exp[0])
        for k in range(bs):
            for c in range(ch):
                expected.append(exp[c][k])
    print(f'  // {name}')
    print(f'  ("{out.hex()}",')
    print(f'   Seq({", ".join(map(str, expected))}), {ch}, {rate}, {bps}),')

# 1. mono constant
emit("mono constant", 8000, 16,
     [(0, [[-5]*8], [[-5]*8], [dict(kind="constant")])])
# 2. mono verbatim
v = [0, 1, -1, 32767, -32768, 1234, -4321, 99]
emit("mono verbatim", 44100, 16, [(0, [v], [v], [dict(kind="verbatim")])])
# 3. mono fixed order 1/2 rice, two frames
s1 = [10, 11, 9, 12, 15, 14, 13, 20]
s2 = [20, 18, 17, 19, 25, 30, 28, 26]
emit("mono fixed multi-frame", 16000, 16,
     [(0, [s1], [s1], [dict(kind="fixed", order=1, param=2)]),
      (0, [s2], [s2], [dict(kind="fixed", order=2, param=3)])])
# 4. stereo independent + left/side + right/side + mid/side
L = [100, 102, 101, 99, 98, 103, 105, 104]
R = [50, 49, 51, 52, 48, 47, 53, 50]
side = [l - r for l, r in zip(L, R)]
mid = [(l + r) >> 1 for l, r in zip(L, R)]
emit("stereo independent", 8000, 16,
     [(1, [L, R], [L, R], [dict(kind="verbatim"), dict(kind="verbatim")])])
emit("stereo left/side", 8000, 16,
     [(8, [L, side], [L, R], [dict(kind="verbatim"), dict(kind="verbatim")])])
emit("stereo side/right", 8000, 16,
     [(9, [side, R], [L, R], [dict(kind="verbatim"), dict(kind="verbatim")])])
emit("stereo mid/side", 8000, 16,
     [(10, [mid, side], [L, R], [dict(kind="verbatim"), dict(kind="verbatim")])])
# 5. LPC order 2 with shift
s = [100, 110]
coefs = [3000, -1000]; shift = 11
for k in range(2, 16):
    acc = coefs[0]*s[k-1] + coefs[1]*s[k-2]
    s.append((acc >> shift) + (k % 5 - 2))
emit("mono lpc order2", 22050, 16,
     [(0, [s], [s], [dict(kind="lpc", lpc_coefs=coefs, lpc_shift=shift,
                          lpc_prec=13, param=3)])])
# 6. rice2 + partitions + escape partition
s3 = list(range(0, 32))
emit("rice2 partitions with escape", 8000, 16,
     [(0, [s3], [s3], [dict(kind="fixed", order=1, param=4, method=1,
                            part_order=2, escape_raw={2: 7})])])
# 7. wasted bits (all samples multiples of 4)
s4 = [v * 4 for v in [1, -2, 3, -4, 5, -6, 7, -8]]
emit("wasted bits", 8000, 16,
     [(0, [s4], [s4], [dict(kind="verbatim", wasted=2)])])
# 8. 8-bit and 24-bit depths
s5 = [0, 1, -1, 127, -128, 42, -42, 7]
emit("8-bit verbatim", 8000, 8, [(0, [s5], [s5], [dict(kind="verbatim")])])
s6 = [0, 8388607, -8388608, 123456, -654321, 42, -99999, 1]
emit("24-bit fixed0", 8000, 24,
     [(0, [s6], [s6], [dict(kind="fixed", order=0, param=0, escape_raw={0: 25})])])

# ---- q_audio_flac variants: 16 distinct mono fixed-order-1 streams,
# selected by doc_id % 16 in the query; expected samples printed as a
# DuckDB list-of-lists for the oracle.
if "--variants" in sys.argv:
    hexes, exp = [], []
    for v in range(16):
        s = [v * 37 - 200]
        for k in range(1, 8):
            s.append(s[-1] + ((v * 13 + k * 7) % 11) - 5)
        out_parts = []
        total = len(s)
        out = b"fLaC" + streaminfo(8000 + v * 250, 1, 16, total)
        out += frame(0, [s], 16, 0, [dict(kind="fixed", order=1, param=3)])
        hexes.append(out.hex())
        exp.append(s)
    print("SCALA_HEX = Seq(")
    for h in hexes:
        print(f'  "{h}",')
    print(")")
    print("DUCK_SAMPLES = [" + ", ".join(
        "[" + ",".join(map(str, e)) + "]" for e in exp) + "]")
    print("DUCK_RATES = [" + ",".join(str(8000 + v * 250) for v in range(16)) + "]")

# ---- header-path fixtures: natural blocksize codes, explicit rate and
# sample-size codes, multi-byte UTF-8 frame numbers.
if "--headers" in sys.argv:
    def utf8_wide(w, n):
        if n < 0x80:
            w.w(n, 8)
        elif n < 0x800:
            w.w(0xC0 | (n >> 6), 8); w.w(0x80 | (n & 0x3F), 8)
        else:
            w.w(0xE0 | (n >> 12), 8)
            w.w(0x80 | ((n >> 6) & 0x3F), 8)
            w.w(0x80 | (n & 0x3F), 8)

    def frame2(frame_idx, chans, bps, ch_asgn, sub_specs,
               bs_code, sr_code, ss_code, sr_follow=None):
        bs = len(chans[0])
        w = BitW()
        w.w(0x3FFE, 14); w.w(0, 1); w.w(0, 1)
        w.w(bs_code, 4)
        w.w(sr_code, 4)
        w.w(ch_asgn, 4)
        w.w(ss_code, 3)
        w.w(0, 1)
        utf8_wide(w, frame_idx)
        if bs_code == 6: w.w(bs - 1, 8)
        if bs_code == 7: w.w(bs - 1, 16)
        if sr_code == 12: w.w(sr_follow, 8)
        if sr_code in (13, 14): w.w(sr_follow, 16)
        hdr = w.bytes()
        hdr += bytes([crc8(hdr)])
        w2 = BitW()
        for c, spec in enumerate(sub_specs):
            subframe(w2, samples=chans[c], bps=bps, **spec)
        w2.align()
        whole = hdr + w2.bytes()
        whole += crc16(whole).to_bytes(2, "big")
        return whole

    def emit2(name, rate, bps, nframes, bsize, bs_code, sr_code, ss_code,
              sr_follow=None):
        out = b"fLaC" + streaminfo(rate, 1, bps, nframes * bsize)
        expected = []
        for i in range(nframes):
            s = [((i * 37 + k * 13) % 256) - 128 for k in range(bsize)]
            # force a multi-byte UTF-8 frame number on later frames
            idx = i if i == 0 else 200 + i
            out += frame2(idx, [s], bps, 0,
                          [dict(kind="fixed", order=1, param=5)],
                          bs_code, sr_code, ss_code, sr_follow)
            expected += s
        print(f'  // {name}')
        print(f'  ("{out.hex()}",')
        print(f'   Seq({", ".join(map(str, expected))}), 1, {rate}, {bps}),')

    emit2("bsCode 1 (192) x2 frames, utf8 frame number 201", 8000, 16,
          2, 192, 1, 0, 0)
    emit2("bsCode 2 (576), srCode 9 (44100) explicit, ssCode 4 (16)",
          44100, 16, 1, 576, 2, 9, 4)
    emit2("bsCode 8 (256), srCode 12 (8-bit kHz)", 8000, 16,
          1, 256, 8, 12, 0, sr_follow=8)
    emit2("bsCode 6 (8-bit size), srCode 13 (16-bit Hz)", 12345, 16,
          1, 100, 6, 13, 0, sr_follow=12345)
    emit2("srCode 14 (16-bit x10)", 44100, 16, 1, 192, 1, 14, 0,
          sr_follow=4410)

# ---- 32-bit stereo mid/side with extreme values (33-bit side channel):
# the case a 32-bit-int decode pipeline gets wrong.
if "--wide" in sys.argv:
    L = [2147483647, -2147483648, 2147483647, -2147483648,
         1000000000, -1000000000, 2000000000, -2000000000]
    R = [-2147483648, 2147483647, 2147483646, -2147483647,
         -1000000001, 1000000001, -5, 5]
    side = [l - r for l, r in zip(L, R)]
    mid = [(l + r) >> 1 for l, r in zip(L, R)]
    emit("32-bit mid/side extremes", 8000, 32,
         [(10, [mid, side], [L, R],
           [dict(kind="verbatim"), dict(kind="verbatim")])])
    emit("32-bit left/side extremes", 8000, 32,
         [(8, [L, side], [L, R],
           [dict(kind="verbatim"), dict(kind="verbatim")])])
