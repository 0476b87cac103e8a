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

Reference analog: openpolicedata excel.py:132-150 opens any
msoffcrypto-supported workbook with the magic password
'VelvetSweatshop' (Excel's invisible default); read_xls does the same
via this module. XOR obfuscation (§2.3.7, wEncryptionType 0) is out of
scope and raises clearly.
"""

from __future__ import annotations

import hashlib
import struct

__all__ = ["decrypt_biff_workbook", "find_filepass", "BiffCryptoError"]


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


def _parse_filepass(body: bytes):
    """FILEPASS body → (scheme, salt, enc_verifier, enc_verifier_hash,
    key_bits)."""
    if len(body) < 2:
        raise BiffCryptoError("truncated FILEPASS record")
    (wtype,) = struct.unpack_from("<H", body, 0)
    if wtype == 0x0000:
        raise BiffCryptoError(
            "XOR obfuscation (wEncryptionType 0) not supported")
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
                          password: str = "VelvetSweatshop") -> bytes:
    """Decrypt an RC4-FILEPASS Workbook stream to plaintext BIFF bytes
    (the FILEPASS record is preserved in place so every BoundSheet8
    lbPlyPos stream offset stays valid). Raises BiffCryptoError on a
    wrong password or an unsupported scheme."""
    found = find_filepass(wb)
    if found is None:
        raise BiffCryptoError("workbook has no FILEPASS record")
    body, fp_end = found
    scheme, salt, enc_ver, enc_vhash, key_bits = _parse_filepass(body)
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
