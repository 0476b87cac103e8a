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

Agile encryption ([MS-OFFCRYPTO] §2.3.4.10, EncryptionInfo version 4.4:
XML descriptor, SHA-512 key spin, AES-CBC in 4096-byte segments) is
implemented below (`decrypt_agile`); `decrypt_office` dispatches on the
version word so both schemes open through one entry point. Legacy .xls
RC4 is NOT implemented — it raises with a clear message (msoffcrypto
still covers it when installed).
"""

from __future__ import annotations

import base64
import hashlib
import hmac as _hmac
import struct
import xml.etree.ElementTree as ET

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
            "agile encryption (4.4): use decrypt_agile/decrypt_office, "
            "not the standard-scheme parser")
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


# --------------------------------------------------------------------------
# [MS-OFFCRYPTO] §2.3.4.10-15 agile encryption (EncryptionInfo 4.4)
# --------------------------------------------------------------------------

_HASH_ALGS = {"SHA1": "sha1", "SHA256": "sha256", "SHA384": "sha384",
              "SHA512": "sha512", "MD5": "md5"}

# fixed block keys, §2.3.4.13-14 (hex from the spec)
BLOCK_VERIFIER_INPUT = bytes.fromhex("fea7d2763b4b9e79")
BLOCK_VERIFIER_VALUE = bytes.fromhex("d7aa0f6d3061344e")
BLOCK_KEY_VALUE = bytes.fromhex("146e0be7abacd0d6")
BLOCK_HMAC_KEY = bytes.fromhex("5fb2ad010cb9e1f6")
BLOCK_HMAC_VALUE = bytes.fromhex("a0677f02b22c8433")

AGILE_SEGMENT = 4096


def aes_cbc_decrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    rks = _expand_key(key)
    out = bytearray()
    prev = iv
    for off in range(0, len(data), 16):
        blk = data[off:off + 16]
        out += bytes(x ^ y for x, y in
                     zip(_decrypt_block_rks(rks, blk), prev))
        prev = blk
    return bytes(out)


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    rks = _expand_key(key)
    out = bytearray()
    prev = iv
    for off in range(0, len(data), 16):
        blk = bytes(x ^ y for x, y in zip(data[off:off + 16], prev))
        prev = _encrypt_block_rks(rks, blk)
        out += prev
    return bytes(out)


def _fit(b: bytes, size: int) -> bytes:
    """§2.3.4.11 sizing rule: truncate if longer, pad with 0x36 if shorter."""
    return b[:size] if len(b) >= size else b + b"\x36" * (size - len(b))


def _localname(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def parse_agile_info(blob: bytes) -> dict:
    """EncryptionInfo stream, version 4.4: 8-byte header then the XML
    EncryptionDescriptor. Namespace-agnostic parse (local names only) —
    producers disagree on prefixes. Returns keyData + the password
    keyEncryptor + optional dataIntegrity, attributes decoded."""
    vmajor, vminor, _flags = struct.unpack_from("<HHI", blob, 0)
    if (vmajor, vminor) != (4, 4):
        raise EncryptionError(
            f"not agile EncryptionInfo: version {vmajor}.{vminor}")
    root = ET.fromstring(blob[8:].decode("utf-8"))

    def grab(el) -> dict:
        out = {}
        for k, v in el.attrib.items():
            out[_localname(k)] = v
        return out

    _PW_URI = "http://schemas.microsoft.com/office/2006/keyEncryptor/password"
    key_data = password_key = integrity = None
    fallback_key = None
    for el in root.iter():
        name = _localname(el.tag)
        if name == "keyData":
            key_data = grab(el)
        elif name == "dataIntegrity":
            integrity = grab(el)
        elif name == "keyEncryptor" and el.get("uri") == _PW_URI:
            # a container may also carry a certificate keyEncryptor (key
            # escrow) whose child is ALSO named 'encryptedKey' — only the
            # password keyEncryptor's child is password-derivable
            for child in el.iter():
                if _localname(child.tag) == "encryptedKey":
                    password_key = grab(child)
                    break
        elif name == "encryptedKey" and "spinCount" in grab(el):
            # fallback: the password variant is the one with a spinCount
            # attribute (certificate encryptedKey has encryptedKeyValue +
            # certVerifier only, §2.3.4.10)
            if fallback_key is None:
                fallback_key = grab(el)
    if password_key is None:
        password_key = fallback_key
    if key_data is None or password_key is None:
        raise EncryptionError("agile descriptor missing keyData/encryptedKey")
    for d in (key_data, password_key):
        if d.get("cipherAlgorithm") != "AES":
            raise EncryptionError(
                f"unsupported cipherAlgorithm {d.get('cipherAlgorithm')!r}")
        if d.get("cipherChaining") != "ChainingModeCBC":
            raise EncryptionError(
                f"unsupported cipherChaining {d.get('cipherChaining')!r}")
        if d.get("hashAlgorithm") not in _HASH_ALGS:
            raise EncryptionError(
                f"unsupported hashAlgorithm {d.get('hashAlgorithm')!r}")
    return {"keyData": key_data, "passwordKey": password_key,
            "dataIntegrity": integrity}


def derive_agile_key(password: str, salt: bytes, spin_count: int,
                     hash_name: str, block_key: bytes,
                     key_bytes: int) -> bytes:
    """§2.3.4.11: iterated hash over the salted UTF-16LE password (counter
    PREPENDED, unlike standard encryption's layout), finalized with the
    purpose-specific block key, sized to the cipher key length."""
    H = lambda b: hashlib.new(hash_name, b).digest()  # noqa: E731
    h = H(salt + password.encode("utf-16-le"))
    for i in range(spin_count):
        h = H(struct.pack("<I", i) + h)
    return _fit(H(h + block_key), key_bytes)


def decrypt_agile(data: bytes, password: str = "VelvetSweatshop") -> bytes:
    """Decrypt an agile-encrypted (ECMA-376 v4.4) Office container to its
    OOXML zip bytes: verify the password against the verifier pair,
    unwrap the intermediate key, check the HMAC over EncryptedPackage
    when present, then AES-CBC-decrypt the 4096-byte segments with
    per-segment IVs H(keyData.salt || LE32(segment))."""
    cfb = CfbReader(data)
    info = parse_agile_info(cfb.read_stream("EncryptionInfo"))
    pk, kd = info["passwordKey"], info["keyData"]

    pk_hash = _HASH_ALGS[pk["hashAlgorithm"]]
    pk_salt = base64.b64decode(pk["saltValue"])
    pk_block = int(pk["blockSize"])
    pk_keybytes = int(pk["keyBits"]) // 8
    spin = int(pk["spinCount"])
    iv0 = _fit(pk_salt, pk_block)

    def pw_key(block_key: bytes) -> bytes:
        return derive_agile_key(password, pk_salt, spin, pk_hash,
                                block_key, pk_keybytes)

    ver_in = aes_cbc_decrypt(
        pw_key(BLOCK_VERIFIER_INPUT), iv0,
        base64.b64decode(pk["encryptedVerifierHashInput"]))[:len(pk_salt)]
    ver_val = aes_cbc_decrypt(
        pw_key(BLOCK_VERIFIER_VALUE), iv0,
        base64.b64decode(pk["encryptedVerifierHashValue"]))
    expect = hashlib.new(pk_hash, ver_in).digest()
    if ver_val[:len(expect)] != expect:
        raise EncryptionError("password verification failed")

    kd_hash = _HASH_ALGS[kd["hashAlgorithm"]]
    kd_salt = base64.b64decode(kd["saltValue"])
    kd_block = int(kd["blockSize"])
    kd_keybytes = int(kd["keyBits"]) // 8
    secret = aes_cbc_decrypt(
        pw_key(BLOCK_KEY_VALUE), iv0,
        base64.b64decode(pk["encryptedKeyValue"]))[:kd_keybytes]

    pkg = cfb.read_stream("EncryptedPackage")

    def seg_iv(block_key: bytes) -> bytes:
        return _fit(hashlib.new(kd_hash, kd_salt + block_key).digest(),
                    kd_block)

    di = info["dataIntegrity"]
    if di is not None:
        hmac_key = aes_cbc_decrypt(
            secret, seg_iv(BLOCK_HMAC_KEY),
            base64.b64decode(di["encryptedHmacKey"]))
        hmac_key = hmac_key[:hashlib.new(kd_hash).digest_size]
        hmac_val = aes_cbc_decrypt(
            secret, seg_iv(BLOCK_HMAC_VALUE),
            base64.b64decode(di["encryptedHmacValue"]))
        got = _hmac.new(hmac_key, pkg, kd_hash).digest()
        if hmac_val[:len(got)] != got:
            raise EncryptionError("EncryptedPackage HMAC mismatch "
                                  "(corrupt or tampered container)")

    (orig_size,) = struct.unpack_from("<Q", pkg, 0)
    body = pkg[8:]
    if len(body) % 16:
        body = body[:len(body) - len(body) % 16]
    out = bytearray()
    for seg in range(0, len(body), AGILE_SEGMENT):
        iv = _fit(hashlib.new(
            kd_hash, kd_salt + struct.pack("<I", seg // AGILE_SEGMENT)
        ).digest(), kd_block)
        out += aes_cbc_decrypt(secret, iv, body[seg:seg + AGILE_SEGMENT])
    return bytes(out[:orig_size])


def decrypt_office(data: bytes, password: str = "VelvetSweatshop") -> bytes:
    """One entry point for both ECMA-376 schemes: dispatch standard (x.2)
    vs agile (4.4) on the EncryptionInfo version word — the msoffcrypto
    behavior the reference relies on (reference excel.py:132-150)."""
    cfb = CfbReader(data)
    blob = cfb.read_stream("EncryptionInfo")
    vmajor, vminor = struct.unpack_from("<HH", blob, 0)
    if (vmajor, vminor) == (4, 4):
        return decrypt_agile(data, password)
    return decrypt_standard(data, password)


def is_encrypted_office(data: bytes) -> bool:
    """CFB container with an EncryptionInfo stream (modern encrypted
    Office file). Plain .xlsx is a zip ('PK...'), never CFB."""
    if not is_cfb(data):
        return False
    try:
        return "EncryptionInfo" in CfbReader(data).list_streams()
    except Exception:
        return False
