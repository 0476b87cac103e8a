"""Seekable HTTP file over Range requests — stdlib re-expression of the
reference's ``httpio`` package (/root/reference/openpolicedata/httpio/
__init__.py, used by csv_class.py:64-87 ``read_zipped_csv``).

Why it matters: a zipped multi-member dataset can be hundreds of MB,
but a caller who wants ONE member only needs the zip central directory
(at the end of the archive) plus that member's compressed span.
``zipfile.ZipFile`` drives any seekable file object; backing one with
HTTP Range requests turns member extraction into a handful of small
GETs instead of a full-archive download.

Differences from the reference (deliberate):
- stdlib ``urllib`` instead of ``requests`` (nothing to install).
- the block cache is a bounded LRU (the reference caches every block
  it ever fetched — fine for a one-shot CLI, not for a long-lived
  driver process holding many archives open).
- length/range probing uses a ``Range: bytes=0-0`` GET rather than a
  HEAD: several municipal CDNs answer HEAD without Content-Length but
  implement ranges correctly; a 206 Content-Range carries the total
  size authoritatively.

Scale note: this is DRIVER-side plumbing for fetching remote source
bytes into the spool before the distributed scan — the 100 TB path
(parquet on shared storage) never touches it.
"""

from __future__ import annotations

import io
import re
import urllib.error
import urllib.request
from collections import OrderedDict

__all__ = ["HttpIOError", "HttpRangeFile", "fetch_zip_member",
           "list_zip_members"]

_UA = {"User-Agent": "Mozilla/5.0"}
_CONTENT_RANGE = re.compile(r"bytes\s+(\d+)-(\d+)/(\d+|\*)")


class HttpIOError(OSError):
    """Range-request failure: unsupported server, bad response, or I/O
    on a closed file."""


class HttpRangeFile(io.BufferedIOBase):
    """Read-only seekable file over HTTP Range requests with a bounded
    LRU block cache. ``bytes_fetched`` / ``requests_made`` expose wire
    cost for tests and logging."""

    def __init__(self, url: str, block_size: int = 1 << 20,
                 max_cached_blocks: int = 64, timeout: float = 60.0):
        if block_size <= 0:
            raise ValueError("block_size must be positive")
        self.url = url
        self.block_size = block_size
        self.max_cached_blocks = max(1, max_cached_blocks)
        self.timeout = timeout
        self.length: int | None = None
        self.bytes_fetched = 0
        self.requests_made = 0
        self._pos = 0
        self._cache: OrderedDict[int, bytes] = OrderedDict()
        self._open_probe()

    # ------------------------------------------------------------- wire

    def _request(self, start: int, end: int):
        req = urllib.request.Request(
            self.url, headers={**_UA, "Range": f"bytes={start}-{end}"})
        self.requests_made += 1
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as r:
                body = r.read()
                # r.headers is an email.message.Message — keep it so
                # .get() stays case-insensitive (some CDNs send
                # lowercase "content-range")
                return r.status, r.headers, body
        except urllib.error.HTTPError as e:
            if e.code == 416:  # Range Not Satisfiable
                raise HttpIOError(
                    f"range {start}-{end} not satisfiable for {self.url}")
            raise HttpIOError(f"HTTP {e.code} fetching {self.url}") from e
        except urllib.error.URLError as e:
            raise HttpIOError(f"cannot reach {self.url}: {e.reason}") from e

    def _open_probe(self) -> None:
        status, headers, body = self._request(0, 0)
        if status != 206:
            raise HttpIOError(
                f"server does not support Range requests for {self.url} "
                f"(got HTTP {status} for bytes=0-0)")
        m = _CONTENT_RANGE.match(headers.get("Content-Range", ""))
        if not m or m.group(3) == "*":
            raise HttpIOError(
                "206 response lacks a total length in Content-Range "
                f"({headers.get('Content-Range')!r})")
        self.length = int(m.group(3))
        self.bytes_fetched += len(body)

    def _block(self, i: int) -> bytes:
        cached = self._cache.get(i)
        if cached is not None:
            self._cache.move_to_end(i)
            return cached
        start = i * self.block_size
        end = min(start + self.block_size, self.length) - 1
        if start > end:
            return b""
        status, headers, body = self._request(start, end)
        if status != 206:
            raise HttpIOError(
                f"server stopped honoring Range mid-file (HTTP {status})")
        want = end - start + 1
        if len(body) != want:
            raise HttpIOError(
                f"short range read: wanted {want} bytes, got {len(body)}")
        self.bytes_fetched += len(body)
        self._cache[i] = body
        while len(self._cache) > self.max_cached_blocks:
            self._cache.popitem(last=False)
        return body

    # ------------------------------------------------------ io protocol

    def readable(self) -> bool:
        return True

    def seekable(self) -> bool:
        return True

    def seek(self, offset: int, whence: int = io.SEEK_SET) -> int:
        self._check_open()
        if whence == io.SEEK_SET:
            pos = offset
        elif whence == io.SEEK_CUR:
            pos = self._pos + offset
        elif whence == io.SEEK_END:
            pos = self.length + offset
        else:
            raise ValueError(f"bad whence {whence}")
        if pos < 0:
            raise ValueError("negative seek position")
        self._pos = pos
        return pos

    def tell(self) -> int:
        self._check_open()
        return self._pos

    def read(self, size: int | None = -1) -> bytes:
        self._check_open()
        if self._pos >= self.length:
            return b""
        if size is None or size < 0:
            size = self.length - self._pos
        size = min(size, self.length - self._pos)
        out = bytearray()
        while size > 0:
            i, off = divmod(self._pos, self.block_size)
            chunk = self._block(i)[off:off + size]
            if not chunk:
                break
            out += chunk
            self._pos += len(chunk)
            size -= len(chunk)
        return bytes(out)

    read1 = read

    def readinto(self, b) -> int:
        data = self.read(len(b))
        b[:len(data)] = data
        return len(data)

    def _check_open(self) -> None:
        if self.closed:
            raise HttpIOError("I/O on closed HttpRangeFile")

    def close(self) -> None:
        self._cache.clear()
        super().close()


# ---------------------------------------------------------------- helpers

def list_zip_members(url: str, block_size: int = 1 << 20) -> list[str]:
    """Member names of a remote zip, fetching only the central directory
    (a couple of range GETs at the archive tail)."""
    import zipfile

    with HttpRangeFile(url, block_size=block_size) as f:
        with zipfile.ZipFile(f) as z:
            return z.namelist()


def fetch_zip_member(url: str, member: str,
                     block_size: int = 1 << 20) -> bytes:
    """Extract one member of a remote zip over Range requests without
    downloading the archive (reference csv_class.py:64-70: httpio +
    ``z.read(data_set['file'])``). Matching is exact first, then
    case-insensitive basename (publishers move files into subfolders
    between releases). Raises ``KeyError`` when no member matches,
    ``HttpIOError`` when the server can't serve ranges — callers fall
    back to a full download."""
    import os
    import zipfile

    with HttpRangeFile(url, block_size=block_size) as f:
        with zipfile.ZipFile(f) as z:
            names = z.namelist()
            if member not in names:
                base = member.lower()
                hits = [n for n in names
                        if os.path.basename(n).lower() == base]
                if len(hits) != 1:
                    raise KeyError(
                        f"zip member {member!r} not found in {url} "
                        f"(members: {names[:20]})")
                member = hits[0]
            return z.read(member)
