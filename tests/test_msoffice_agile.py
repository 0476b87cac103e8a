"""Agile (ECMA-376 v4.4) decrypt on REAL container bytes — stdlib only.

The fixture builder writes a genuine agile container: CFB (the writer
from test_msoffice_crypto), version-4.4 EncryptionInfo with the XML
descriptor, per-purpose block-key derivation, AES-CBC verifier pair,
wrapped intermediate key, HMAC dataIntegrity, and 4096-byte package
segments with per-segment IVs — the forward direction of everything
`decrypt_agile` inverts (reference analog: excel.py:132-150 opens any
msoffcrypto-supported workbook)."""

from __future__ import annotations

import base64
import hashlib
import hmac
import struct

import pytest

from openpolicedata_spark.sources.msoffice_crypto import (
    AGILE_SEGMENT,
    BLOCK_HMAC_KEY,
    BLOCK_HMAC_VALUE,
    BLOCK_KEY_VALUE,
    BLOCK_VERIFIER_INPUT,
    BLOCK_VERIFIER_VALUE,
    EncryptionError,
    _fit,
    aes_cbc_decrypt,
    aes_cbc_encrypt,
    decrypt_agile,
    decrypt_office,
    derive_agile_key,
    is_encrypted_office,
)
from tests.test_msoffice_crypto import encrypt_standard, write_cfb

PK_SALT = bytes(range(1, 17))
KD_SALT = bytes(range(16, 0, -1))
SECRET_256 = bytes(range(32))
VERIFIER_IN = bytes(range(50, 66))
HMAC_KEY_RAW = bytes(range(100, 164))
SPIN = 2500  # low for test speed; the production default is 100 000

_ENC_NS = "http://schemas.microsoft.com/office/2006/encryption"
_PW_NS = "http://schemas.microsoft.com/office/2006/keyEncryptor/password"


def encrypt_agile(package: bytes, password: str = "VelvetSweatshop",
                  hash_alg: str = "SHA512", key_bits: int = 256) -> bytes:
    hname = hash_alg.lower()
    hsize = hashlib.new(hname).digest_size
    kbytes = key_bits // 8
    secret = SECRET_256[:kbytes]
    iv0 = _fit(PK_SALT, 16)

    def pw_key(block):
        return derive_agile_key(password, PK_SALT, SPIN, hname, block, kbytes)

    def seg_iv(block):
        return _fit(hashlib.new(hname, KD_SALT + block).digest(), 16)

    enc_vin = aes_cbc_encrypt(pw_key(BLOCK_VERIFIER_INPUT), iv0, VERIFIER_IN)
    vhash = hashlib.new(hname, VERIFIER_IN).digest()
    vhash += b"\x00" * (-len(vhash) % 16)
    enc_vval = aes_cbc_encrypt(pw_key(BLOCK_VERIFIER_VALUE), iv0, vhash)
    secret_pad = secret + b"\x00" * (-len(secret) % 16)
    enc_key = aes_cbc_encrypt(pw_key(BLOCK_KEY_VALUE), iv0, secret_pad)

    body = bytearray()
    for off in range(0, len(package), AGILE_SEGMENT):
        seg = package[off:off + AGILE_SEGMENT]
        seg += b"\x00" * (-len(seg) % 16)
        iv = _fit(hashlib.new(
            hname, KD_SALT + struct.pack("<I", off // AGILE_SEGMENT)
        ).digest(), 16)
        body += aes_cbc_encrypt(secret, iv, seg)
    pkg_stream = struct.pack("<Q", len(package)) + bytes(body)

    hkey = HMAC_KEY_RAW[:hsize]
    hkey_pad = hkey + b"\x00" * (-len(hkey) % 16)
    enc_hkey = aes_cbc_encrypt(secret, seg_iv(BLOCK_HMAC_KEY), hkey_pad)
    hval = hmac.new(hkey, pkg_stream, hname).digest()
    hval += b"\x00" * (-len(hval) % 16)
    enc_hval = aes_cbc_encrypt(secret, seg_iv(BLOCK_HMAC_VALUE), hval)

    b64 = lambda b: base64.b64encode(b).decode()  # noqa: E731
    common = (f'saltSize="16" blockSize="16" keyBits="{key_bits}" '
              f'hashSize="{hsize}" cipherAlgorithm="AES" '
              f'cipherChaining="ChainingModeCBC" hashAlgorithm="{hash_alg}"')
    xml = (
        f'<encryption xmlns="{_ENC_NS}" xmlns:p="{_PW_NS}">'
        f'<keyData {common} saltValue="{b64(KD_SALT)}"/>'
        f'<dataIntegrity encryptedHmacKey="{b64(enc_hkey)}" '
        f'encryptedHmacValue="{b64(enc_hval)}"/>'
        f'<keyEncryptors><keyEncryptor uri="{_PW_NS}">'
        f'<p:encryptedKey spinCount="{SPIN}" {common} '
        f'saltValue="{b64(PK_SALT)}" '
        f'encryptedVerifierHashInput="{b64(enc_vin)}" '
        f'encryptedVerifierHashValue="{b64(enc_vval)}" '
        f'encryptedKeyValue="{b64(enc_key)}"/>'
        f'</keyEncryptor></keyEncryptors></encryption>')
    info = struct.pack("<HHI", 4, 4, 0x40) + xml.encode("utf-8")
    return write_cfb({"EncryptionInfo": info, "EncryptedPackage": pkg_stream})


def test_cbc_roundtrip():
    key, iv = bytes(range(16)), bytes(range(16, 32))
    pt = bytes(range(48))
    assert aes_cbc_decrypt(key, iv, aes_cbc_encrypt(key, iv, pt)) == pt


def test_agile_roundtrip_multisegment():
    # > 2 segments, length not a multiple of 16 → exercises per-segment
    # IVs and the final-segment padding/truncation
    package = (b"PK\x03\x04 pretend zip " + bytes(range(256)) * 40)[:10007]
    blob = encrypt_agile(package)
    assert is_encrypted_office(blob)
    assert decrypt_agile(blob) == package


def test_agile_wrong_password():
    blob = encrypt_agile(b"PK\x03\x04 tiny")
    with pytest.raises(EncryptionError, match="password verification"):
        decrypt_agile(blob, password="wrong")


def test_agile_hmac_detects_tamper():
    package = b"PK\x03\x04" + bytes(range(256)) * 2
    blob = bytearray(encrypt_agile(package))
    # flip one byte inside the encrypted package ciphertext (find the
    # segment body: last occurrence of the 8-byte size header)
    idx = blob.rindex(struct.pack("<Q", len(package))) + 8 + 5
    blob[idx] ^= 0xFF
    with pytest.raises(EncryptionError, match="HMAC mismatch"):
        decrypt_agile(bytes(blob))


@pytest.mark.parametrize("hash_alg,key_bits", [("SHA256", 128),
                                               ("SHA1", 192),
                                               ("SHA512", 256)])
def test_agile_hash_and_keysize_variants(hash_alg, key_bits):
    package = b"PK\x03\x04 variant " + bytes(range(64))
    blob = encrypt_agile(package, hash_alg=hash_alg, key_bits=key_bits)
    assert decrypt_agile(blob) == package


def test_decrypt_office_dispatch():
    package = b"PK\x03\x04 dispatch me" + bytes(range(32))
    assert decrypt_office(encrypt_agile(package)) == package
    assert decrypt_office(encrypt_standard(package)) == package


def test_excel_loader_opens_agile_workbook_end_to_end(spark, tmp_path):
    """Full production path: agile-encrypted workbook (real CFB + XML +
    AES-CBC bytes) → stdlib decrypt → stdlib xlsx parse → Spark frame."""
    from tests.test_native_parsers import make_xlsx

    plain = make_xlsx({"Sheet1": [
        ["Case", "Gender"],
        ["A1", "MALE"],
        ["A2", "FEMALE"],
    ]})
    path = tmp_path / "agile.xlsx"
    path.write_bytes(encrypt_agile(plain))
    from openpolicedata_spark.sources.excel import ExcelLoader

    pdf = ExcelLoader(spark, str(path)).load().toPandas()
    assert sorted(pdf["Case"]) == ["A1", "A2"]


def test_agile_escrow_container_selects_password_encryptor():
    """ADVICE r4: a container carrying BOTH a password keyEncryptor and a
    certificate keyEncryptor (enterprise key-escrow) must decrypt via the
    password one even when the certificate encryptor — whose child is
    also named 'encryptedKey' — appears LAST in document order."""
    from openpolicedata_spark.sources.cfb import CfbReader

    package = b"PK\x03\x04 escrow " + bytes(range(128))
    blob = encrypt_agile(package)
    cfb = CfbReader(blob)
    info = cfb.read_stream("EncryptionInfo")
    pkg = cfb.read_stream("EncryptedPackage")
    cert_ns = "http://schemas.microsoft.com/office/2006/keyEncryptor/certificate"
    cert = (f'<keyEncryptor uri="{cert_ns}">'
            f'<c:encryptedKey xmlns:c="{cert_ns}" '
            'encryptedKeyValue="QUJD" X509Certificate="REVG" '
            'certVerifier="R0hJ"/></keyEncryptor>')
    xml = info[8:].decode("utf-8")
    assert "</keyEncryptors>" in xml
    patched = xml.replace("</keyEncryptors>", cert + "</keyEncryptors>")
    blob2 = write_cfb({"EncryptionInfo": info[:8] + patched.encode("utf-8"),
                       "EncryptedPackage": pkg})
    assert decrypt_agile(blob2) == package
    # and with the certificate encryptor FIRST (password one last)
    patched2 = xml.replace("<keyEncryptors>", "<keyEncryptors>" + cert)
    blob3 = write_cfb({"EncryptionInfo": info[:8] + patched2.encode("utf-8"),
                       "EncryptedPackage": pkg})
    assert decrypt_agile(blob3) == package
