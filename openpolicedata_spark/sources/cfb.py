"""Minimal Compound File Binary (CFB / OLE2) reader — stdlib only.

Encrypted Office files (the VelvetSweatshop workbooks public agencies
publish — reference excel.py:128-153 opens them via msoffcrypto) are CFB
containers holding an ``EncryptionInfo`` and an ``EncryptedPackage``
stream. This reader implements the subset needed to pull named streams
out of such a container ([MS-CFB] public spec):

- 512/4096-byte sectors, FAT chains (incl. DIFAT for large files)
- directory entries (UTF-16LE names, red-black tree flattened — we only
  need name → entry)
- mini-FAT for streams below the 4096-byte cutoff (EncryptionInfo
  usually is one)
"""

from __future__ import annotations

import struct

MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"

_ENDOFCHAIN = 0xFFFFFFFE
_FREESECT = 0xFFFFFFFF


class CfbError(ValueError):
    pass


def is_cfb(data: bytes) -> bool:
    return data[:8] == MAGIC


class CfbReader:
    def __init__(self, data: bytes):
        if not is_cfb(data):
            raise CfbError("not a CFB container")
        self.data = data
        (self.sector_shift,) = struct.unpack_from("<H", data, 30)
        (self.mini_shift,) = struct.unpack_from("<H", data, 32)
        self.sector_size = 1 << self.sector_shift
        self.mini_size = 1 << self.mini_shift
        (self.n_fat,) = struct.unpack_from("<I", data, 44)
        (self.dir_start,) = struct.unpack_from("<I", data, 48)
        (self.mini_cutoff,) = struct.unpack_from("<I", data, 56)
        (self.minifat_start,) = struct.unpack_from("<I", data, 60)
        (self.n_minifat,) = struct.unpack_from("<I", data, 64)
        (self.difat_start,) = struct.unpack_from("<I", data, 68)
        (self.n_difat,) = struct.unpack_from("<I", data, 72)
        self.fat = self._load_fat()
        self.dir_entries = self._load_directory()
        self.minifat = self._load_minifat()
        self._ministream = None

    # -- sector plumbing ---------------------------------------------------

    def _sector(self, n: int) -> bytes:
        # [MS-CFB] §2.1: sector n starts at (n+1) * sector_size — the
        # header occupies "sector -1" and is itself padded to the sector
        # size in version-4 (4096-byte-sector) files. For v3 (512) this
        # equals the familiar 512 + n*512.
        off = (n + 1) * self.sector_size
        return self.data[off:off + self.sector_size]

    def _load_fat(self) -> list[int]:
        # first 109 FAT-sector numbers live in the header DIFAT; the rest
        # chain through dedicated DIFAT sectors
        difat = list(struct.unpack_from("<109I", self.data, 76))
        nxt = self.difat_start
        for _ in range(self.n_difat):
            if nxt in (_ENDOFCHAIN, _FREESECT):
                break
            sec = self._sector(nxt)
            ints = struct.unpack(f"<{self.sector_size // 4}I", sec)
            difat.extend(ints[:-1])
            nxt = ints[-1]
        fat: list[int] = []
        per = self.sector_size // 4
        for s in difat:
            if s in (_ENDOFCHAIN, _FREESECT):
                continue
            fat.extend(struct.unpack(f"<{per}I", self._sector(s)))
        return fat

    def _chain(self, start: int) -> list[int]:
        out, cur, seen = [], start, set()
        while cur not in (_ENDOFCHAIN, _FREESECT):
            if cur in seen or cur >= len(self.fat):
                raise CfbError("corrupt FAT chain")
            seen.add(cur)
            out.append(cur)
            cur = self.fat[cur]
        return out

    def _read_chain(self, start: int) -> bytes:
        return b"".join(self._sector(s) for s in self._chain(start))

    # -- directory + mini stream ------------------------------------------

    def _load_directory(self) -> list[dict]:
        raw = self._read_chain(self.dir_start)
        entries = []
        for off in range(0, len(raw), 128):
            ent = raw[off:off + 128]
            if len(ent) < 128:
                break
            (name_len,) = struct.unpack_from("<H", ent, 64)
            if name_len < 2:
                continue
            name = ent[:name_len - 2].decode("utf-16-le")
            obj_type = ent[66]
            (start,) = struct.unpack_from("<I", ent, 116)
            (size,) = struct.unpack_from("<Q", ent, 120)
            entries.append({"name": name, "type": obj_type,
                            "start": start, "size": size})
        return entries

    def _load_minifat(self) -> list[int]:
        if self.n_minifat == 0 or self.minifat_start in (_ENDOFCHAIN,
                                                         _FREESECT):
            return []
        raw = self._read_chain(self.minifat_start)
        return list(struct.unpack(f"<{len(raw) // 4}I", raw))

    def _mini_stream(self) -> bytes:
        if self._ministream is None:
            root = next(e for e in self.dir_entries if e["type"] == 5)
            self._ministream = self._read_chain(root["start"])[:root["size"]]
        return self._ministream

    # -- public API --------------------------------------------------------

    def list_streams(self) -> list[str]:
        return [e["name"] for e in self.dir_entries if e["type"] == 2]

    def read_stream(self, name: str) -> bytes:
        ent = next((e for e in self.dir_entries
                    if e["type"] == 2 and e["name"] == name), None)
        if ent is None:
            raise KeyError(name)
        if ent["size"] < self.mini_cutoff:
            mini = self._mini_stream()
            out, cur, seen = [], ent["start"], set()
            while cur not in (_ENDOFCHAIN, _FREESECT):
                if cur in seen or cur >= len(self.minifat):
                    raise CfbError("corrupt mini-FAT chain")
                seen.add(cur)
                out.append(mini[cur * self.mini_size:
                                (cur + 1) * self.mini_size])
                cur = self.minifat[cur]
            return b"".join(out)[:ent["size"]]
        return self._read_chain(ent["start"])[:ent["size"]]
