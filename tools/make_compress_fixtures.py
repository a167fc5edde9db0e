#!/usr/bin/env python3
"""Generate compressed-payload fixtures for DecompressSpec.

Each raw payload is compressed by SYSTEM implementations — python's
stdlib zlib/gzip/bz2/lzma (system codecs) and the distro libzstd /
liblz4 via ctypes — so graft's decompress expression (which rides the
Spark-shipped JVM codecs) is verified against INDEPENDENT
implementations of each format, the same cross-implementation
discipline the WebP/FLAC fixtures use.

Writes src/test/resources/compress/<name>.raw and <name>.<codec>
plus manifest.txt lines "<name> <codec...>".
"""
import ctypes
import gzip
import bz2
import lzma
import os
import random
import zlib

OUT = os.path.join(os.path.dirname(__file__), '..',
                   'src', 'test', 'resources', 'compress')

zstd = ctypes.CDLL('libzstd.so.1')
zstd.ZSTD_compressBound.restype = ctypes.c_size_t
zstd.ZSTD_compress.restype = ctypes.c_size_t
zstd.ZSTD_isError.restype = ctypes.c_uint

lz4 = ctypes.CDLL('liblz4.so.1')
lz4.LZ4F_compressFrameBound.restype = ctypes.c_size_t
lz4.LZ4F_compressFrame.restype = ctypes.c_size_t
lz4.LZ4F_isError.restype = ctypes.c_uint


def zstd_compress(data: bytes) -> bytes:
    bound = zstd.ZSTD_compressBound(ctypes.c_size_t(len(data)))
    buf = ctypes.create_string_buffer(bound)
    n = zstd.ZSTD_compress(buf, ctypes.c_size_t(bound), data,
                           ctypes.c_size_t(len(data)), ctypes.c_int(9))
    assert not zstd.ZSTD_isError(ctypes.c_size_t(n))
    return buf.raw[:n]


def lz4_compress(data: bytes) -> bytes:
    bound = lz4.LZ4F_compressFrameBound(ctypes.c_size_t(len(data)), None)
    buf = ctypes.create_string_buffer(bound)
    n = lz4.LZ4F_compressFrame(buf, ctypes.c_size_t(bound), data,
                               ctypes.c_size_t(len(data)), None)
    assert not lz4.LZ4F_isError(ctypes.c_size_t(n))
    return buf.raw[:n]


def payloads():
    rnd = random.Random(20260816)
    yield 'ascii', b'Common Crawl WET record body: the quick brown fox ' \
        b'jumps over the lazy dog. ' * 40
    yield 'utf8', ('über-token café 中文 '
                   'élève \U0001f600 ' * 200).encode('utf-8')
    yield 'repetitive', b'AAAA BBBB ' * 5000
    yield 'noise', bytes(rnd.randrange(256) for _ in range(30000))
    yield 'empty', b''
    yield 'one', b'x'


def main():
    os.makedirs(OUT, exist_ok=True)
    lines = []
    for name, raw in payloads():
        with open(os.path.join(OUT, name + '.raw'), 'wb') as f:
            f.write(raw)
        codecs = {
            'gzip': gzip.compress(raw, 6),
            'zlib': zlib.compress(raw, 6),
            'deflate': zlib.compress(raw, 6)[2:-4],  # raw deflate body
            'bzip2': bz2.compress(raw, 9),
            'xz': lzma.compress(raw),
            'zstd': zstd_compress(raw),
            'lz4': lz4_compress(raw),
        }
        # multi-member gzip (the concatenated-WARC shape)
        if name == 'ascii':
            half = len(raw) // 2
            codecs['gzip2'] = gzip.compress(raw[:half]) + \
                gzip.compress(raw[half:])
        for codec, enc in codecs.items():
            with open(os.path.join(OUT, f'{name}.{codec}'), 'wb') as f:
                f.write(enc)
        lines.append(f'{name} {" ".join(codecs.keys())}')
        print(name, {k: len(v) for k, v in codecs.items()})
    with open(os.path.join(OUT, 'manifest.txt'), 'w') as f:
        f.write('\n'.join(lines) + '\n')


if __name__ == '__main__':
    main()
