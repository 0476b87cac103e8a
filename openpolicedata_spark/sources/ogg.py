"""Pure-stdlib Ogg container (RFC 3533) reader + writer, with a full
decode path for Ogg-FLAC.

The page layer is generic: capture-pattern sync, page-level CRC-32
(poly 0x04C11DB7, non-reflected, init 0, computed with the checksum
field zeroed), lacing-value packet reassembly including packets that
span pages (continuation flag) and 255-chains, and per-serial logical
stream demuxing.

Codec mapping: the first packet of a logical stream identifies it —
- ``0x7F 'FLAC'`` (Ogg-FLAC mapping): the packet carries the native
  ``fLaC`` magic + STREAMINFO; later packets are native FLAC frames,
  so the stream reconstructs into a native FLAC stream and decodes
  with sources/flac.py. REAL end-to-end.
- ``0x01 'vorbis'`` / ``'OpusHead'``: raise with the codec name — a
  Vorbis/Opus MDCT decoder is out of scope (the documented gate).

``encode_ogg_flac`` writes a conformant Ogg-FLAC file (BOS page with
the mapping header, one audio packet per FLAC frame, granule positions
in samples, EOS on the last page) for fixtures and tests.

Reference parity note: openpolicedata decodes no media; this exists
for the multimodal pipeline operators.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["OggError", "read_ogg_audio", "encode_ogg_flac",
           "looks_like_ogg"]

OGG_SIGNATURE = b"OggS"


class OggError(ValueError):
    """Malformed or unsupported Ogg payload."""


def looks_like_ogg(data: bytes) -> bool:
    return data[:4] == OGG_SIGNATURE


def _crc_table() -> list[int]:
    table = []
    for b in range(256):
        r = b << 24
        for _ in range(8):
            r = ((r << 1) ^ 0x04C11DB7) if r & 0x80000000 else (r << 1)
        table.append(r & 0xFFFFFFFF)
    return table


_CRC = _crc_table()


def _crc32(data: bytes) -> int:
    r = 0
    for b in data:
        r = ((r << 8) & 0xFFFFFFFF) ^ _CRC[((r >> 24) ^ b) & 0xFF]
    return r


def _pages(data: bytes):
    """Yield (header_type, serial, granule, [segments]) per page,
    verifying each page CRC."""
    pos = 0
    n = len(data)
    while pos < n:
        if data[pos:pos + 4] != OGG_SIGNATURE:
            raise OggError("lost page sync")
        if pos + 27 > n:
            raise OggError("truncated page header")
        (version, htype, granule, serial, _seq, crc, nsegs) = \
            struct.unpack_from("<BBqIIIB", data, pos + 4)
        if version != 0:
            raise OggError(f"unsupported Ogg version {version}")
        seg_table = data[pos + 27:pos + 27 + nsegs]
        if len(seg_table) < nsegs:
            raise OggError("truncated segment table")
        body_start = pos + 27 + nsegs
        body_len = sum(seg_table)
        if body_start + body_len > n:
            raise OggError("truncated page body")
        page = bytearray(data[pos:body_start + body_len])
        page[22:26] = b"\x00\x00\x00\x00"
        if _crc32(bytes(page)) != crc:
            raise OggError("page CRC mismatch")
        segs = []
        off = body_start
        for ln in seg_table:
            segs.append((data[off:off + ln], ln))
            off += ln
        yield htype, serial, granule, segs
        pos = body_start + body_len


def _packets(data: bytes):
    """Reassemble packets per logical stream →
    {serial: [packet bytes, ...]} in stream order."""
    streams: dict[int, list[bytes]] = {}
    partial: dict[int, bytearray] = {}
    for htype, serial, _granule, segs in _pages(data):
        buf = partial.setdefault(serial, bytearray())
        if not (htype & 0x01):
            if buf:
                # a packet was left open but this page doesn't continue
                raise OggError("dangling packet without continuation")
        out = streams.setdefault(serial, [])
        for seg, ln in segs:
            buf += seg
            if ln < 255:
                out.append(bytes(buf))
                buf.clear()
    for serial, buf in partial.items():
        if buf:
            raise OggError("stream ended mid-packet")
    return streams


def read_ogg_audio(data: bytes) -> tuple[int, int, "np.ndarray"]:
    """Decode an Ogg-FLAC stream → (rate, bits_per_sample, int32
    samples shaped (n, channels)) — the read_flac contract."""
    from openpolicedata_spark.sources.flac import read_flac

    if not looks_like_ogg(data):
        raise OggError("not Ogg: bad capture pattern")
    streams = _packets(data)
    gated = None
    for serial, pkts in streams.items():
        if not pkts:
            continue
        first = pkts[0]
        if first[:5] == b"\x7fFLAC":
            if len(first) < 13 or first[9:13] != b"fLaC":
                raise OggError("malformed Ogg-FLAC mapping header")
            (nheaders,) = struct.unpack_from(">H", first, 7)
            # native stream = fLaC magic + STREAMINFO (last-block bit
            # forced: the extra header packets are skippable metadata)
            info = bytearray(first[13:])
            if len(info) < 4:
                raise OggError("Ogg-FLAC first packet missing STREAMINFO")
            info[0] |= 0x80
            audio = pkts[1 + nheaders:] if nheaders else [
                p for p in pkts[1:] if p[:1] == b"\xff"]
            return read_flac(b"fLaC" + bytes(info) + b"".join(audio))
        if first[:7] == b"\x01vorbis":
            gated = gated or "vorbis"
        elif first[:8] == b"OpusHead":
            gated = gated or "opus"
    if gated:
        raise OggError(f"codec {gated!r} needs a real audio decoder "
                       "(ffmpeg); only Ogg-FLAC decodes in-repo")
    raise OggError("no recognized logical stream (FLAC/vorbis/opus)")


# --------------------------------------------------------------- writer

def _page(serial: int, seq: int, granule: int, packets: list[bytes],
          htype: int = 0) -> bytes:
    """One page holding whole packets (the writer never spans)."""
    seg_table = bytearray()
    body = bytearray()
    for p in packets:
        ln = len(p)
        while ln >= 255:
            seg_table.append(255)
            ln -= 255
        seg_table.append(ln)
        body += p
    if len(seg_table) > 255:
        raise OggError("too many segments for one page")
    hdr = (OGG_SIGNATURE
           + struct.pack("<BBqIIIB", 0, htype, granule, serial, seq,
                         0, len(seg_table))
           + bytes(seg_table))
    crc = _crc32(hdr + bytes(body))
    hdr = hdr[:22] + struct.pack("<I", crc) + hdr[26:]
    return hdr + bytes(body)


def encode_ogg_flac(samples: "np.ndarray", rate: int,
                    bps: int = 16, serial: int = 0x1337) -> bytes:
    """Mux FLAC into Ogg per the xiph Ogg-FLAC mapping: BOS page with
    the 0x7F'FLAC' mapping header wrapping fLaC+STREAMINFO, then one
    audio packet (= one native FLAC frame) per page with the granule
    position at the last sample of the page; EOS on the final page."""
    from openpolicedata_spark.sources.flac import encode_flac_parts

    a = np.asarray(samples)
    n = a.shape[0]
    info_block, frames = encode_flac_parts(samples, rate, bps)
    first = (b"\x7fFLAC\x01\x00" + struct.pack(">H", 0)
             + b"fLaC" + info_block)
    out = bytearray(_page(serial, 0, 0, [first], htype=0x02))
    block = 4096
    for i, frame in enumerate(frames):
        granule = min((i + 1) * block, n)
        last = i == len(frames) - 1
        out += _page(serial, i + 1, granule, [frame],
                     htype=0x04 if last else 0)
    return bytes(out)
