"""Legacy BIFF8 RC4 decryption (FILEPASS record) — stdlib-only.

Implements the two RC4 schemes of [MS-OFFCRYPTO]:

- §2.3.6 "Office Binary Document RC4 Encryption" (EncryptionVersionInfo
  1.1): MD5-based key derivation, 16-byte salt/verifier/verifier-hash.
- §2.3.5 "RC4 CryptoAPI Encryption" (version x.2, x in 2..4): SHA-1
  key derivation, EncryptionHeader (AlgID 0x6801 = RC4) + verifier with
  a 20-byte SHA-1 hash; 40-bit keys pad to 128 bits with zeros.

Stream model ([MS-XLS] 2.2.10): the whole Workbook stream is one cipher
byte-space, rekeyed every 1024 bytes (block = offset // 1024). Record
type/size headers are NEVER encrypted; neither are the bodies of BOF,
FILEPASS, UsrExcl, FileLock, InterfaceHdr, RRDInfo, RRDHead, nor the
4-byte lbPlyPos stream-offset field of each BoundSheet8 — but their
keystream bytes are still consumed, so exempt spans advance the cipher
without producing output.

XOR obfuscation (§2.3.7, wEncryptionType 0 / any BIFF5 FILEPASS) is
also implemented: CreatePasswordVerifier_Method1 /
CreateXorKey_Method1 / CreateXorArray_Method1 derive a 16-byte array
from the password (the 105-entry XorMatrix is generated from its 15
row heads — each row is a GF(2) left-shift chain mod the CCITT
polynomial 0x11021, a structure that also cross-checks the constants),
and each record body de-obfuscates independently with
``plain = rol(cipher ^ array[(offset + length) % 16], 5)`` per byte
([MS-XLS] 2.2.10's XOR data transformation, with the encode/decode
rotation orientation as implemented by the major public readers —
the spec's own prose famously swaps them).

Reference analog: openpolicedata excel.py:132-150 opens any
msoffcrypto-supported workbook with the magic password
'VelvetSweatshop' (Excel's invisible default); read_xls does the same
via this module.
"""

from __future__ import annotations

import hashlib
import struct

__all__ = ["decrypt_biff_workbook", "find_filepass", "BiffCryptoError",
           "xor_password_verifier", "xor_key", "xor_array"]


class BiffCryptoError(ValueError):
    """FILEPASS parsing / password verification failure."""


_FILEPASS = 0x002F
_BLOCK = 1024
# records whose BODY stays plaintext ([MS-XLS] 2.2.10)
_PLAIN_BODY = {0x0809, 0x002F, 0x0194, 0x0195, 0x00E1, 0x0196, 0x0138}
_BOUNDSHEET = 0x0085


class Rc4:
    """Plain RC4 (KSA + PRGA); stateful, so one instance spans the
    verifier fields or a 1024-byte stream block."""

    def __init__(self, key: bytes):
        S = list(range(256))
        j = 0
        for i in range(256):
            j = (j + S[i] + key[i % len(key)]) & 0xFF
            S[i], S[j] = S[j], S[i]
        self.S, self.i, self.j = S, 0, 0

    def crypt(self, data: bytes) -> bytes:
        S, i, j = self.S, self.i, self.j
        out = bytearray(len(data))
        for n, b in enumerate(data):
            i = (i + 1) & 0xFF
            j = (j + S[i]) & 0xFF
            S[i], S[j] = S[j], S[i]
            out[n] = b ^ S[(S[i] + S[j]) & 0xFF]
        self.i, self.j = i, j
        return bytes(out)


def _std_key_fn(password: str, salt: bytes):
    """§2.3.6.2: MD5 password → 5 bytes; MD5 of the 336-byte
    (trunc+salt)×16 buffer → 5 bytes; per-block key =
    MD5(material + LE32(block)), full 16 bytes."""
    h0 = hashlib.md5(password.encode("utf-16-le")).digest()[:5]
    material = hashlib.md5((h0 + salt) * 16).digest()[:5]

    def key(block: int) -> bytes:
        return hashlib.md5(material + struct.pack("<I", block)).digest()

    return key


def _capi_key_fn(password: str, salt: bytes, key_bits: int):
    """§2.3.5.2: H0 = SHA1(salt + password); per-block key =
    SHA1(H0 + LE32(block)) truncated to the key size; a 40-bit key is
    padded with 88 zero bits to 128."""
    h0 = hashlib.sha1(salt + password.encode("utf-16-le")).digest()

    def key(block: int) -> bytes:
        h = hashlib.sha1(h0 + struct.pack("<I", block)).digest()
        k = h[:key_bits // 8]
        if key_bits == 40:
            k += b"\x00" * 11
        return k

    return key


# ---- XOR obfuscation ([MS-OFFCRYPTO] §2.3.7, [MS-XLS] 2.2.10) -------------

_XOR_INITIAL_CODE = (
    0xE1F0, 0x1D0F, 0xCC9C, 0x84C0, 0x110C, 0x0E10, 0xF1CE, 0x313E,
    0x1872, 0xE139, 0xD40F, 0x84F9, 0x280C, 0xA96A, 0x4EC3)
# §2.3.7.2's XorMatrix is 15 rows × 7: within a row each entry is the
# previous one shifted left in GF(2) mod 0x11021 (CCITT), so only the
# row heads are data — the build below reproduces the spec's 105 words.
_XOR_ROW_HEADS = (
    0xAEFC, 0x7B61, 0x4563, 0x0375, 0xD849, 0x6F45, 0xEB23, 0x47D3,
    0xB861, 0x45A0, 0xAA51, 0x76B4, 0x3730, 0x3331, 0x1021)
_XOR_PAD = (0xBB, 0xFF, 0xFF, 0xBA, 0xFF, 0xFF, 0xB9, 0x80,
            0x00, 0xBE, 0x0F, 0x00, 0xBF, 0x0F, 0x00)


def _xor_matrix() -> tuple:
    out = []
    for head in _XOR_ROW_HEADS:
        v = head
        out.append(v)
        for _ in range(6):
            v <<= 1
            if v & 0x10000:
                v ^= 0x11021
            out.append(v)
    return tuple(out)


_XOR_MATRIX = _xor_matrix()


def _ansi_password(password: str) -> bytes:
    pw = password.encode("latin-1", "replace")[:15]
    if not pw:
        raise BiffCryptoError("empty password")
    return pw


def xor_password_verifier(password: str) -> int:
    """CreatePasswordVerifier_Method1 (§2.3.7.1): 15-bit rotate-left
    fold over the password bytes in reverse, then length ^ 0xCE4B."""
    pw = _ansi_password(password)
    v = 0
    for b in reversed(pw):
        v = (((v >> 14) & 1) | ((v << 1) & 0x7FFF)) ^ b
    v = ((v >> 14) & 1) | ((v << 1) & 0x7FFF)
    return v ^ len(pw) ^ 0xCE4B


def xor_key(password: str) -> int:
    """CreateXorKey_Method1 (§2.3.7.2)."""
    pw = _ansi_password(password)
    key = _XOR_INITIAL_CODE[len(pw) - 1]
    cur = 0x68
    for i in range(len(pw) - 1, -1, -1):
        ch = pw[i]
        for _ in range(7):
            if ch & 0x40:
                key ^= _XOR_MATRIX[cur]
            ch = (ch << 1) & 0xFF
            cur -= 1
    return key


def xor_array(password: str) -> bytes:
    """CreateXorArray_Method1 (§2.3.7.3): 16-byte obfuscation array
    from the password bytes + pad constants, each rotated right after
    XOR with the key's high/low byte."""
    pw = _ansi_password(password)
    key = xor_key(password)
    hi, lo = key >> 8, key & 0xFF

    def xor_ror(a: int, b: int) -> int:
        t = (a ^ b) & 0xFF
        return ((t >> 1) | (t << 7)) & 0xFF

    arr = bytearray(16)
    idx = len(pw)
    if idx & 1:
        arr[idx] = xor_ror(_XOR_PAD[0], hi)
        idx -= 1
        arr[idx] = xor_ror(pw[len(pw) - 1], lo)
    while idx > 0:
        idx -= 1
        arr[idx] = xor_ror(pw[idx], hi)
        idx -= 1
        arr[idx] = xor_ror(pw[idx], lo)
    idx, pad = 15, 15 - len(pw)
    while pad > 0:
        arr[idx] = xor_ror(_XOR_PAD[pad], hi)
        idx -= 1
        pad -= 1
        arr[idx] = xor_ror(_XOR_PAD[pad], lo)
        idx -= 1
        pad -= 1
    return bytes(arr)


def _xor_transform(body: bytes, data_offset: int, arr: bytes,
                   decrypt: bool, skip: int = 0) -> bytes:
    """[MS-XLS] 2.2.10 XOR data transformation over one record body at
    absolute stream offset `data_offset`: byte i uses
    arr[(data_offset + len(body) + i) % 16]; decode = XOR then
    rotate-left 5, encode = rotate-left 3 then XOR (self-inverse pair).
    `skip` leaves the first bytes untouched (BoundSheet8 lbPlyPos) —
    safe because the index depends only on position and length, not on
    any running cipher state."""
    base = data_offset + len(body)
    out = bytearray(body)
    for i in range(skip, len(out)):
        k = arr[(base + i) & 0x0F]
        if decrypt:
            t = out[i] ^ k
            out[i] = ((t << 5) | (t >> 3)) & 0xFF
        else:
            t = ((out[i] << 3) | (out[i] >> 5)) & 0xFF
            out[i] = t ^ k
    return bytes(out)


def _parse_filepass(body: bytes, biff_version: int = 8):
    """FILEPASS body → ("xor", key16, verifier16, None, 0) or
    (rc4 scheme, salt, enc_verifier, enc_verifier_hash, key_bits).
    BIFF5 FILEPASS has no wEncryptionType — it is always the 4-byte
    XOR form (key + verificationBytes)."""
    if biff_version < 8:
        if len(body) < 4:
            raise BiffCryptoError("truncated BIFF5 FILEPASS record")
        key16, ver16 = struct.unpack_from("<HH", body, 0)
        return ("xor", key16, ver16, None, 0)
    if len(body) < 2:
        raise BiffCryptoError("truncated FILEPASS record")
    (wtype,) = struct.unpack_from("<H", body, 0)
    if wtype == 0x0000:
        if len(body) < 6:
            raise BiffCryptoError("truncated XOR FILEPASS record")
        key16, ver16 = struct.unpack_from("<HH", body, 2)
        return ("xor", key16, ver16, None, 0)
    if wtype != 0x0001:
        raise BiffCryptoError(f"unknown wEncryptionType 0x{wtype:04x}")
    if len(body) < 6:
        raise BiffCryptoError("truncated FILEPASS version info")
    vmaj, vmin = struct.unpack_from("<HH", body, 2)
    if (vmaj, vmin) == (1, 1):  # Office Binary RC4
        if len(body) < 6 + 48:
            raise BiffCryptoError("truncated RC4 FILEPASS")
        return ("std", body[6:22], body[22:38], body[38:54], 128)
    if vmin == 2 and vmaj in (2, 3, 4):  # RC4 CryptoAPI
        if len(body) < 14:
            raise BiffCryptoError("truncated CryptoAPI FILEPASS")
        (_flags, hsize) = struct.unpack_from("<II", body, 6)
        hdr = body[14:14 + hsize]
        if len(hdr) < 24:
            raise BiffCryptoError("truncated CryptoAPI EncryptionHeader")
        alg_id, alg_hash, key_bits = struct.unpack_from("<III", hdr, 8)
        if alg_id != 0x00006801:
            raise BiffCryptoError(
                f"CryptoAPI AlgID 0x{alg_id:08x} is not RC4")
        if alg_hash not in (0x00008004, 0):
            raise BiffCryptoError(
                f"CryptoAPI AlgIDHash 0x{alg_hash:08x} is not SHA-1")
        key_bits = key_bits or 40  # 0 means default 40-bit (§2.3.5.1)
        voff = 14 + hsize
        if len(body) < voff + 40 + 20:
            raise BiffCryptoError("truncated CryptoAPI verifier")
        (salt_size,) = struct.unpack_from("<I", body, voff)
        if salt_size != 16:
            raise BiffCryptoError(f"unexpected SaltSize {salt_size}")
        salt = body[voff + 4:voff + 20]
        enc_ver = body[voff + 20:voff + 36]
        (vh_size,) = struct.unpack_from("<I", body, voff + 36)
        enc_vhash = body[voff + 40:voff + 40 + vh_size]
        if len(enc_vhash) < 20:
            raise BiffCryptoError("truncated CryptoAPI verifier hash")
        return ("capi", salt, enc_ver, enc_vhash, key_bits)
    raise BiffCryptoError(
        f"unsupported FILEPASS EncryptionVersionInfo {vmaj}.{vmin}")


def find_filepass(wb: bytes):
    """(body, end_offset) of the FILEPASS record, or None for a
    plaintext workbook. Walks record headers only (always plaintext)."""
    pos = 0
    n = len(wb)
    while pos + 4 <= n:
        opcode, length = struct.unpack_from("<HH", wb, pos)
        if opcode == _FILEPASS:
            return wb[pos + 4:pos + 4 + length], pos + 4 + length
        if opcode == 0x000A:  # globals EOF: FILEPASS can't follow
            return None
        pos += 4 + length
    return None


class _BlockStream:
    """Decrypting keystream over the workbook byte-space with the
    1024-byte rekey rule; exempt spans advance it without output."""

    def __init__(self, key_fn):
        self.key_fn = key_fn
        self.pos = 0
        self._rc4 = None

    def _step(self, data: bytes | None, n: int) -> bytes:
        out = bytearray()
        taken = 0
        while taken < n:
            if self._rc4 is None:
                self._rc4 = Rc4(self.key_fn(self.pos // _BLOCK))
            take = min(n - taken, _BLOCK - (self.pos % _BLOCK))
            if data is None:
                self._rc4.crypt(bytes(take))
            else:
                out += self._rc4.crypt(data[taken:taken + take])
            taken += take
            self.pos += take
            if self.pos % _BLOCK == 0:
                self._rc4 = None
        return bytes(out)

    def decrypt(self, data: bytes) -> bytes:
        return self._step(data, len(data))

    def skip(self, n: int) -> None:
        self._step(None, n)


def decrypt_biff_workbook(wb: bytes,
                          password: str = "VelvetSweatshop",
                          biff_version: int = 8) -> bytes:
    """Decrypt a FILEPASS-protected Workbook stream (RC4, RC4
    CryptoAPI, or XOR obfuscation) to plaintext BIFF bytes (the
    FILEPASS record is preserved in place so every BoundSheet8
    lbPlyPos stream offset stays valid). Raises BiffCryptoError on a
    wrong password or an unsupported scheme."""
    found = find_filepass(wb)
    if found is None:
        raise BiffCryptoError("workbook has no FILEPASS record")
    body, fp_end = found
    scheme, salt, enc_ver, enc_vhash, key_bits = _parse_filepass(
        body, biff_version)
    if scheme == "xor":
        if xor_password_verifier(password) != enc_ver:
            raise BiffCryptoError(
                f"password verification failed (not {password!r}; "
                "scheme=xor)")
        arr = xor_array(password)
        out = bytearray()
        pos = 0
        n = len(wb)
        while pos + 4 <= n:
            opcode, length = struct.unpack_from("<HH", wb, pos)
            out += wb[pos:pos + 4]
            cipher_body = wb[pos + 4:pos + 4 + length]
            if pos < fp_end or opcode in _PLAIN_BODY:
                out += cipher_body
            else:
                skip = 4 if opcode == _BOUNDSHEET and length >= 4 else 0
                out += _xor_transform(cipher_body, pos + 4, arr,
                                      decrypt=True, skip=skip)
            pos += 4 + length
        out += wb[pos:]
        return bytes(out)
    if scheme == "std":
        key_fn = _std_key_fn(password, salt)
        hash_fn = hashlib.md5
    else:
        key_fn = _capi_key_fn(password, salt, key_bits)
        hash_fn = hashlib.sha1
    rc = Rc4(key_fn(0))
    verifier = rc.crypt(enc_ver)
    vhash = rc.crypt(enc_vhash)
    digest = hash_fn(verifier).digest()
    if digest != vhash[:len(digest)]:
        raise BiffCryptoError(
            "password verification failed (not "
            f"{password!r}; scheme={scheme})")

    stream = _BlockStream(key_fn)
    out = bytearray()
    pos = 0
    n = len(wb)
    while pos + 4 <= n:
        opcode, length = struct.unpack_from("<HH", wb, pos)
        out += wb[pos:pos + 4]
        stream.skip(4)
        cipher_body = wb[pos + 4:pos + 4 + length]
        if pos < fp_end or opcode in _PLAIN_BODY:
            out += cipher_body
            stream.skip(len(cipher_body))
        elif opcode == _BOUNDSHEET and length >= 4:
            out += cipher_body[:4]  # lbPlyPos is plaintext
            stream.skip(4)
            out += stream.decrypt(cipher_body[4:])
        else:
            out += stream.decrypt(cipher_body)
        pos += 4 + length
    out += wb[pos:]  # trailing slack bytes pass through unchanged
    return bytes(out)
