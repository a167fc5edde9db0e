#!/usr/bin/env python3
"""Tar fixtures for TarSubtitleSpec, written by python's INDEPENDENT
stdlib tarfile in three dialects: POSIX ustar, GNU (long names), and
pax (unicode path records). Run from the repo root."""
import io
import os
import tarfile

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources", "tar")
os.makedirs(OUT, exist_ok=True)


def member(name, data=None, ftype=tarfile.REGTYPE, link=None):
    ti = tarfile.TarInfo(name)
    ti.mtime = 1700000000
    if data is not None:
        ti.size = len(data)
    ti.type = ftype
    if link:
        ti.linkname = link
    return ti, io.BytesIO(data) if data is not None else None


def write(name, fmt, members):
    path = os.path.join(OUT, name)
    with tarfile.open(path, "w", format=fmt) as t:
        for ti, f in members:
            t.addfile(ti, f)
    print("%-14s %6d bytes" % (name, os.path.getsize(path)))


write("ustar.tar", tarfile.USTAR_FORMAT, [
    member("a.txt", b"hello tar"),
    member("dir/", ftype=tarfile.DIRTYPE),
    member("dir/b.bin", bytes(range(256)) * 4),
    member("link", ftype=tarfile.SYMTYPE, link="a.txt"),
])

LONG = "very/deep/directory/structure/with/an/extremely/long/path/name/" \
       "that/overflows/the/hundred/byte/ustar/field/payload-file.txt"
write("gnu_long.tar", tarfile.GNU_FORMAT, [
    member(LONG, b"long-name content"),
    member("short.txt", b"short"),
])

write("pax.tar", tarfile.PAX_FORMAT, [
    member("データ/ファイル.txt", "ユニコード内容".encode("utf-8")),
    member("plain.txt", b"plain pax"),
])

print("fixtures ->", os.path.abspath(OUT))
