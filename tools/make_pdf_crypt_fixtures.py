#!/usr/bin/env python3
"""Encrypted-PDF fixtures for PdfSpec (Standard security handler).

The encryptors here are INDEPENDENT of the Scala decryptor: RC4/AES
come from the python `cryptography` package and the key-derivation
algorithms (ISO 32000 §7.6 algorithms 2/3/4/5 and the §7.6.4.3.4
R6 hash) are implemented from the spec text, so a green PdfSpec pins
the Scala side against a second implementation.

All documents carry the empty USER password (the dominant
"owner-password-only" corpus case) except locked_r3, whose user
password is real — the decryptor must refuse it (NULL text), never
emit garbage.

  rc4_r2      V1 R2, 40-bit RC4
  rc4_r3      V2 R3, 128-bit RC4
  aesv2_r4    V4 R4, /CF StdCF AESV2 (AES-128-CBC, sAlT object keys)
  aes256_r6   V5 R6, AES-256 with the iterated hash + /UE key wrap
  locked_r3   V2 R3 with user password "secret" -> must stay NULL

Run from the repo root: python3 tools/make_pdf_crypt_fixtures.py
"""
import hashlib
import os
import struct

from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources", "pdf")
os.makedirs(OUT, exist_ok=True)

PAD = bytes.fromhex(
    "28BF4E5E4E758A4164004E56FFFA01082E2E00B6D0683E802F0CA9FE6453697A")


def rc4(key, data):
    c = Cipher(algorithms.ARC4(key), mode=None).encryptor()
    return c.update(data) + c.finalize()


def aes_cbc_enc(key, iv, data):
    c = Cipher(algorithms.AES(key), modes.CBC(iv)).encryptor()
    return c.update(data) + c.finalize()


def aes_ecb_enc(key, data):
    c = Cipher(algorithms.AES(key), modes.ECB()).encryptor()
    return c.update(data) + c.finalize()


def pad_pwd(pwd: bytes) -> bytes:
    return (pwd + PAD)[:32]


def alg2_key(user_pwd, o_entry, p, id0, r, n):
    h = hashlib.md5()
    h.update(pad_pwd(user_pwd))
    h.update(o_entry[:32])
    h.update(struct.pack("<i", p))
    h.update(id0)
    key = h.digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:n]).digest()
    return key[:n]


def alg3_o(owner_pwd, user_pwd, r, n):
    key = hashlib.md5(pad_pwd(owner_pwd)).digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key).digest()
    key = key[:n]
    o = rc4(key, pad_pwd(user_pwd))
    if r >= 3:
        for i in range(1, 20):
            o = rc4(bytes(b ^ i for b in key), o)
    return o


def alg45_u(key, id0, r):
    if r == 2:
        return rc4(key, PAD)
    x = hashlib.md5(PAD + id0).digest()
    x = rc4(key, x)
    for i in range(1, 20):
        x = rc4(bytes(b ^ i for b in key), x)
    return x + b"\x00" * 16


def obj_key(file_key, num, gen, aes):
    ext = bytes([num & 0xFF, (num >> 8) & 0xFF, (num >> 16) & 0xFF,
                 gen & 0xFF, (gen >> 8) & 0xFF])
    if aes:
        ext += b"sAlT"
    return hashlib.md5(file_key + ext).digest()[: min(len(file_key) + 5, 16)]


def aes_payload_enc(key, iv, data):
    padlen = 16 - len(data) % 16
    return iv + aes_cbc_enc(key, iv, data + bytes([padlen]) * padlen)


def hash2b(pwd, salt, udata):
    k = hashlib.sha256(pwd + salt + udata).digest()
    rnd = 0
    while True:
        k1 = (pwd + k + udata) * 64
        e = aes_cbc_enc(k[:16], k[16:32], k1)
        mod = sum(e[:16]) % 3
        k = [hashlib.sha256, hashlib.sha384, hashlib.sha512][mod](e).digest()
        rnd += 1
        if rnd >= 64 and e[-1] <= rnd - 32:
            break
    return k[:32]


TEXT = "Decrypted body text."
CONTENT = ("BT /F1 12 Tf 72 720 Td (%s) Tj ET" % TEXT).encode()
TITLE = b"Secret title"
ID0 = bytes(range(16))


def assemble(name, enc_dict, enc_stream, enc_title, expected):
    objs = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>"),
        (4, b"<< /Length " + str(len(enc_stream)).encode() +
            b" >>\nstream\n" + enc_stream + b"\nendstream"),
        (5, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"),
        (6, b"<< /Title <" + enc_title.hex().encode() + b"> >>"),
        (7, enc_dict),
    ]
    out = bytearray(b"%PDF-1.6\n%\xe2\xe3\xcf\xd3\n")
    offs = {}
    for num, body in objs:
        offs[num] = len(out)
        out += str(num).encode() + b" 0 obj\n" + body + b"\nendobj\n"
    x = len(out)
    out += b"xref\n0 8\n0000000000 65535 f \n"
    for num in range(1, 8):
        out += b"%010d 00000 n \n" % offs[num]
    out += (b"trailer\n<< /Size 8 /Root 1 0 R /Info 6 0 R /Encrypt 7 0 R "
            b"/ID [<" + ID0.hex().encode() + b"> <" + ID0.hex().encode() +
            b">] >>\nstartxref\n" + str(x).encode() + b"\n%%EOF\n")
    with open(os.path.join(OUT, name + ".pdf"), "wb") as f:
        f.write(bytes(out))
    with open(os.path.join(OUT, name + ".txt"), "w") as f:
        f.write(expected)
    print("%-12s %5d bytes" % (name, len(out)))


def make_rc4(name, r, nbits, user_pwd=b"", expected=TEXT):
    n = nbits // 8
    p = -44
    o = alg3_o(b"owner", user_pwd, r, n)
    key = alg2_key(user_pwd, o, p, ID0, r, n)
    u = alg45_u(key, ID0, r)
    v = 1 if r == 2 else 2
    enc = (b"<< /Filter /Standard /V " + str(v).encode() +
           b" /R " + str(r).encode() + b" /Length " + str(nbits).encode() +
           b" /O <" + o.hex().encode() + b"> /U <" + u.hex().encode() +
           b"> /P " + str(p).encode() + b" >>")
    stream = rc4(obj_key(key, 4, 0, False), CONTENT)
    title = rc4(obj_key(key, 6, 0, False), TITLE)
    assemble(name, enc, stream, title, expected)


def make_aesv2(name):
    r, n, p = 4, 16, -44
    o = alg3_o(b"owner", b"", r, n)
    key = alg2_key(b"", o, p, ID0, r, n)
    u = alg45_u(key, ID0, r)
    enc = (b"<< /Filter /Standard /V 4 /R 4 /Length 128 "
           b"/CF << /StdCF << /CFM /AESV2 /Length 16 >> >> "
           b"/StmF /StdCF /StrF /StdCF "
           b"/O <" + o.hex().encode() + b"> /U <" + u.hex().encode() +
           b"> /P " + str(p).encode() + b" >>")
    iv1 = bytes(range(0x10, 0x20))
    iv2 = bytes(range(0x30, 0x40))
    stream = aes_payload_enc(obj_key(key, 4, 0, True), iv1, CONTENT)
    title = aes_payload_enc(obj_key(key, 6, 0, True), iv2, TITLE)
    assemble(name, enc, stream, title, TEXT)


def make_aes256(name):
    p = -44
    file_key = hashlib.sha256(b"fixture file key seed").digest()
    vsalt, ksalt = b"VSALT##1", b"KSALT##2"
    u = hash2b(b"", vsalt, b"") + vsalt + ksalt
    ue = aes_cbc_enc(hash2b(b"", ksalt, b""), b"\x00" * 16, file_key)
    ovsalt, oksalt = b"OVSALT#1", b"OKSALT#2"
    o = hash2b(b"owner", ovsalt, u) + ovsalt + oksalt
    oe = aes_cbc_enc(hash2b(b"owner", oksalt, u), b"\x00" * 16, file_key)
    perms = aes_ecb_enc(file_key,
                        struct.pack("<i", p) + b"\xff\xff\xff\xff" +
                        b"Tadb" + b"\x00" * 4)
    enc = (b"<< /Filter /Standard /V 5 /R 6 /Length 256 "
           b"/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> "
           b"/StmF /StdCF /StrF /StdCF "
           b"/O <" + o.hex().encode() + b"> /U <" + u.hex().encode() +
           b"> /OE <" + oe.hex().encode() + b"> /UE <" + ue.hex().encode() +
           b"> /Perms <" + perms.hex().encode() +
           b"> /P " + str(p).encode() + b" >>")
    iv1 = bytes(range(0x50, 0x60))
    iv2 = bytes(range(0x70, 0x80))
    stream = aes_payload_enc(file_key, iv1, CONTENT)
    title = aes_payload_enc(file_key, iv2, TITLE)
    assemble(name, enc, stream, title, TEXT)


make_rc4("rc4_r2", 2, 40)
make_rc4("rc4_r3", 3, 128)
make_aesv2("aesv2_r4")
make_aes256("aes256_r6")
make_rc4("locked_r3", 3, 128, user_pwd=b"secret", expected="")

print("fixtures ->", os.path.abspath(OUT))
