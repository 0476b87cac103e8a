"""ECMA-376 "Standard Encryption" decrypt — pure stdlib (no msoffcrypto).

Public agencies publish workbooks saved with Excel's default password
'VelvetSweatshop' (they open transparently in Excel, so nobody notices
they're encrypted — reference excel.py:128-153 handles them via
msoffcrypto). The container format is public ([MS-OFFCRYPTO] §2.3.4):
a CFB file with two streams,

- ``EncryptionInfo``: version 2-4/2, flags, an EncryptionHeader
  (AlgID 0x660E/0x660F/0x6610 = AES-128/192/256, AlgIDHash 0x8004 =
  SHA-1) and an EncryptionVerifier (salt, AES-ECB-encrypted verifier +
  verifier hash);
- ``EncryptedPackage``: 8-byte original size, then the OOXML zip
  encrypted with AES-ECB under the password-derived key.

Key derivation ([MS-OFFCRYPTO] §2.3.4.7): 50 000 iterated SHA-1 rounds
over the salted UTF-16LE password, a block-0 finalization, then the
0x36/0x5C ipad/opad-style expansion truncated to the key size. SHA-1 is
``hashlib``; AES is the ~100-line FIPS-197 implementation below
(verified against the FIPS-197 appendix vector in tests — workbooks are
small, so pure-Python speed is irrelevant).

Agile encryption (version 4.4, XML descriptor, AES-CBC per segment) and
legacy .xls RC4 are NOT implemented — they raise with a clear message
(msoffcrypto still covers them when installed).
"""

from __future__ import annotations

import hashlib
import struct

from openpolicedata_spark.sources.cfb import CfbReader, is_cfb

# --------------------------------------------------------------------------
# AES (FIPS-197), ECB decrypt only — block-at-a-time, table-driven
# --------------------------------------------------------------------------

_SBOX = bytes.fromhex(
    "637c777bf26b6fc53001672bfed7ab76ca82c97dfa5947f0add4a2af9ca472c0"
    "b7fd9326363ff7cc34a5e5f171d8311504c723c31896059a071280e2eb27b275"
    "09832c1a1b6e5aa0523bd6b329e32f8453d100ed20fcb15b6acbbe394a4c58cf"
    "d0efaafb434d338545f9027f503c9fa851a3408f929d38f5bcb6da2110fff3d2"
    "cd0c13ec5f974417c4a77e3d645d197360814fdc222a908846eeb814de5e0bdb"
    "e0323a0a4906245cc2d3ac629195e479e7c8376d8dd54ea96c56f4ea657aae08"
    "ba78252e1ca6b4c6e8dd741f4bbd8b8a703eb5664803f60e613557b986c11d9e"
    "e1f8981169d98e949b1e87e9ce5528df8ca1890dbfe6426841992d0fb054bb16")
_INV_SBOX = bytearray(256)
for _i, _v in enumerate(_SBOX):
    _INV_SBOX[_v] = _i
_INV_SBOX = bytes(_INV_SBOX)

_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36,
         0x6C, 0xD8, 0xAB, 0x4D]


def _xtime(a: int) -> int:
    a <<= 1
    return (a ^ 0x1B) & 0xFF if a & 0x100 else a


def _mul(a: int, b: int) -> int:
    out = 0
    while b:
        if b & 1:
            out ^= a
        a = _xtime(a)
        b >>= 1
    return out


def _expand_key(key: bytes) -> list[bytes]:
    nk = len(key) // 4
    nr = nk + 6
    words = [key[4 * i:4 * i + 4] for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = words[i - 1]
        if i % nk == 0:
            t = bytes(_SBOX[b] for b in t[1:] + t[:1])
            t = bytes([t[0] ^ _RCON[i // nk - 1], t[1], t[2], t[3]])
        elif nk > 6 and i % nk == 4:
            t = bytes(_SBOX[b] for b in t)
        words.append(bytes(x ^ y for x, y in zip(words[i - nk], t)))
    return [b"".join(words[4 * r:4 * r + 4]) for r in range(nr + 1)]


def _add_round_key(state: bytearray, rk: bytes) -> None:
    for i in range(16):
        state[i] ^= rk[i]


def _inv_shift_rows(s: bytearray) -> None:
    # state is column-major: byte index = 4*col + row
    for r in range(1, 4):
        row = [s[4 * c + r] for c in range(4)]
        row = row[-r:] + row[:-r]
        for c in range(4):
            s[4 * c + r] = row[c]


def _shift_rows(s: bytearray) -> None:
    for r in range(1, 4):
        row = [s[4 * c + r] for c in range(4)]
        row = row[r:] + row[:r]
        for c in range(4):
            s[4 * c + r] = row[c]


def _inv_mix_columns(s: bytearray) -> None:
    for c in range(4):
        a = s[4 * c:4 * c + 4]
        s[4 * c + 0] = (_mul(a[0], 14) ^ _mul(a[1], 11)
                        ^ _mul(a[2], 13) ^ _mul(a[3], 9))
        s[4 * c + 1] = (_mul(a[0], 9) ^ _mul(a[1], 14)
                        ^ _mul(a[2], 11) ^ _mul(a[3], 13))
        s[4 * c + 2] = (_mul(a[0], 13) ^ _mul(a[1], 9)
                        ^ _mul(a[2], 14) ^ _mul(a[3], 11))
        s[4 * c + 3] = (_mul(a[0], 11) ^ _mul(a[1], 13)
                        ^ _mul(a[2], 9) ^ _mul(a[3], 14))


def _mix_columns(s: bytearray) -> None:
    for c in range(4):
        a = s[4 * c:4 * c + 4]
        s[4 * c + 0] = _mul(a[0], 2) ^ _mul(a[1], 3) ^ a[2] ^ a[3]
        s[4 * c + 1] = a[0] ^ _mul(a[1], 2) ^ _mul(a[2], 3) ^ a[3]
        s[4 * c + 2] = a[0] ^ a[1] ^ _mul(a[2], 2) ^ _mul(a[3], 3)
        s[4 * c + 3] = _mul(a[0], 3) ^ a[1] ^ a[2] ^ _mul(a[3], 2)


def _decrypt_block_rks(rks: list[bytes], block: bytes) -> bytes:
    s = bytearray(block)
    _add_round_key(s, rks[-1])
    for rk in reversed(rks[1:-1]):
        _inv_shift_rows(s)
        for i in range(16):
            s[i] = _INV_SBOX[s[i]]
        _add_round_key(s, rk)
        _inv_mix_columns(s)
    _inv_shift_rows(s)
    for i in range(16):
        s[i] = _INV_SBOX[s[i]]
    _add_round_key(s, rks[0])
    return bytes(s)


def aes_decrypt_block(key: bytes, block: bytes) -> bytes:
    return _decrypt_block_rks(_expand_key(key), block)


def _encrypt_block_rks(rks: list[bytes], block: bytes) -> bytes:
    s = bytearray(block)
    _add_round_key(s, rks[0])
    for rk in rks[1:-1]:
        for i in range(16):
            s[i] = _SBOX[s[i]]
        _shift_rows(s)
        _mix_columns(s)
        _add_round_key(s, rk)
    for i in range(16):
        s[i] = _SBOX[s[i]]
    _shift_rows(s)
    _add_round_key(s, rks[-1])
    return bytes(s)


def aes_encrypt_block(key: bytes, block: bytes) -> bytes:
    return _encrypt_block_rks(_expand_key(key), block)


def _ecb(key: bytes, data: bytes, fn) -> bytes:
    # expand the key schedule ONCE for the whole stream (real workbooks
    # run to megabytes = tens of thousands of blocks)
    rks = _expand_key(key)
    block_fn = (_decrypt_block_rks if fn is aes_decrypt_block
                else _encrypt_block_rks)
    out = bytearray()
    for off in range(0, len(data), 16):
        out += block_fn(rks, data[off:off + 16])
    return bytes(out)


# --------------------------------------------------------------------------
# [MS-OFFCRYPTO] §2.3.4.7 key derivation + §2.3.4.5 container layout
# --------------------------------------------------------------------------

_AES_KEYBITS = {0x660E: 128, 0x660F: 192, 0x6610: 256}
SPIN_COUNT = 50_000


def derive_standard_key(password: str, salt: bytes, key_bits: int) -> bytes:
    h = hashlib.sha1(salt + password.encode("utf-16-le")).digest()
    for i in range(SPIN_COUNT):
        h = hashlib.sha1(struct.pack("<I", i) + h).digest()
    h = hashlib.sha1(h + struct.pack("<I", 0)).digest()
    # ipad/opad-style expansion, truncate to the key size
    x1 = hashlib.sha1(bytes(0x36 ^ b for b in h.ljust(64, b"\x00"))).digest()
    x2 = hashlib.sha1(bytes(0x5C ^ b for b in h.ljust(64, b"\x00"))).digest()
    return (x1 + x2)[:key_bits // 8]


class EncryptionError(ValueError):
    pass


def parse_encryption_info(blob: bytes) -> dict:
    vmajor, vminor, flags = struct.unpack_from("<HHI", blob, 0)
    if vminor == 4:
        raise EncryptionError(
            "agile encryption (4.4) not supported by the stdlib decryptor; "
            "install msoffcrypto-tool")
    if vminor != 2 or vmajor not in (2, 3, 4):
        raise EncryptionError(f"unknown EncryptionInfo version "
                              f"{vmajor}.{vminor}")
    (header_size,) = struct.unpack_from("<I", blob, 8)
    header = blob[12:12 + header_size]
    alg_id, alg_hash, key_bits = struct.unpack_from("<III", header, 8)
    if alg_id not in _AES_KEYBITS:
        raise EncryptionError(f"unsupported AlgID 0x{alg_id:x} "
                              "(only AES standard encryption)")
    if alg_hash != 0x8004:
        raise EncryptionError(f"unsupported AlgIDHash 0x{alg_hash:x}")
    if key_bits != _AES_KEYBITS[alg_id]:
        raise EncryptionError("KeySize does not match AlgID")
    ver = blob[12 + header_size:]
    (salt_size,) = struct.unpack_from("<I", ver, 0)
    salt = ver[4:4 + salt_size]
    enc_verifier = ver[4 + salt_size:4 + salt_size + 16]
    (vh_size,) = struct.unpack_from("<I", ver, 4 + salt_size + 16)
    enc_verifier_hash = ver[4 + salt_size + 20:4 + salt_size + 20 + 32]
    return {"key_bits": key_bits, "salt": salt,
            "enc_verifier": enc_verifier, "vh_size": vh_size,
            "enc_verifier_hash": enc_verifier_hash}


def verify_standard_password(info: dict, key: bytes) -> bool:
    verifier = _ecb(key, info["enc_verifier"], aes_decrypt_block)
    vh = _ecb(key, info["enc_verifier_hash"], aes_decrypt_block)
    return hashlib.sha1(verifier).digest() == vh[:info["vh_size"]]


def decrypt_standard(data: bytes,
                     password: str = "VelvetSweatshop") -> bytes:
    """Decrypt an ECMA-376 standard-encrypted Office container to its
    OOXML zip bytes. Raises EncryptionError on wrong password or an
    unsupported scheme."""
    cfb = CfbReader(data)
    info = parse_encryption_info(cfb.read_stream("EncryptionInfo"))
    key = derive_standard_key(password, info["salt"], info["key_bits"])
    if not verify_standard_password(info, key):
        raise EncryptionError("password verification failed")
    pkg = cfb.read_stream("EncryptedPackage")
    (orig_size,) = struct.unpack_from("<Q", pkg, 0)
    body = pkg[8:]
    if len(body) % 16:
        body = body[:len(body) - len(body) % 16]
    return _ecb(key, body, aes_decrypt_block)[:orig_size]


def is_encrypted_office(data: bytes) -> bool:
    """CFB container with an EncryptionInfo stream (modern encrypted
    Office file). Plain .xlsx is a zip ('PK...'), never CFB."""
    if not is_cfb(data):
        return False
    try:
        return "EncryptionInfo" in CfbReader(data).list_streams()
    except Exception:
        return False
