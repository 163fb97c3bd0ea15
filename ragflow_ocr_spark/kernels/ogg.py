"""Ogg container demux/mux (RFC 3533).

The multimodal audio route consumes WAV and MP3; real crawl audio's
second family is Ogg Vorbis. This module handles only the container:
page framing, lacing/packet reassembly (including packets continued
across pages), and the Ogg CRC. The codec layer is kernels/vorbis.py.

Same error contract as the other codecs: ValueError on malformed
input, never any other exception. Every structural violation —
capture pattern, version, CRC, lacing overrun, sequence gap — fails
loudly; a page that passes CRC but carries garbage is the codec
layer's problem.

Reference behavior: /root/reference/ocr/operators.py:41-46 accepts
any payload its binary decoders understand; this repo replaces those
binaries from scratch (SURVEY.md §2.3 S3).
"""

from __future__ import annotations

import functools
import struct

import numpy as np

OGG_MAGIC = b"OggS"

# untrusted-payload ceilings (mirrors the image codecs' bomb guards)
MAX_PAGES = 1 << 16
MAX_PACKET_BYTES = 1 << 24


def _crc_table() -> np.ndarray:
    # Ogg CRC32: poly 0x04c11db7, init 0, MSB-first, no reflection,
    # no final xor (RFC 3533 §6 / framing spec).
    tab = np.zeros(256, dtype=np.uint32)
    for i in range(256):
        r = i << 24
        for _ in range(8):
            r = ((r << 1) ^ 0x04C11DB7) if (r & 0x80000000) else (r << 1)
            r &= 0xFFFFFFFF
        tab[i] = r
    return tab


_CRC_TAB = _crc_table()


def ogg_crc(data: bytes) -> int:
    crc = 0
    tab = _CRC_TAB
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ int(tab[((crc >> 24) & 0xFF) ^ b])
    return crc


def _codec_errors(fn):
    @functools.wraps(fn)
    def inner(*a, **kw):
        try:
            return fn(*a, **kw)
        except (struct.error, IndexError, KeyError, OverflowError) as e:
            raise ValueError(f"malformed ogg: {e!r}") from e

    return inner


@_codec_errors
def parse_ogg_packets(data: bytes) -> list[bytes]:
    """Ogg bytes → logical-stream packets, in order.

    Single logical stream only (one serial number); grouped/chained
    multiplexing raises a named error rather than silently decoding
    one substream. CRC is verified on every page.
    """
    packets: list[bytes] = []
    partial = bytearray()
    open_packet = False
    pos = 0
    serial = None
    expected_seq = None
    n_pages = 0
    saw_eos = False
    while pos < len(data):
        if data[pos : pos + 4] != OGG_MAGIC:
            raise ValueError(f"ogg capture pattern missing at {pos}")
        if pos + 27 > len(data):
            raise ValueError("truncated ogg page header")
        (
            version,
            header_type,
            _granule,
            page_serial,
            page_seq,
            page_crc,
            n_segs,
        ) = struct.unpack_from("<BBqIIIB", data, pos + 4)
        if version != 0:
            raise ValueError(f"unsupported ogg version {version}")
        lacing = data[pos + 27 : pos + 27 + n_segs]
        if len(lacing) < n_segs:
            raise ValueError("truncated ogg lacing table")
        body_len = int(sum(lacing))
        page_end = pos + 27 + n_segs + body_len
        if page_end > len(data):
            raise ValueError("truncated ogg page body")
        # CRC over the whole page with the crc field zeroed
        page = bytearray(data[pos:page_end])
        page[22:26] = b"\x00\x00\x00\x00"
        if ogg_crc(bytes(page)) != page_crc:
            raise ValueError(f"ogg page crc mismatch at page {n_pages}")
        if serial is None:
            serial = page_serial
        elif page_serial != serial:
            raise ValueError("multiplexed/chained ogg streams unsupported")
        if expected_seq is not None and page_seq != expected_seq:
            raise ValueError(
                f"ogg page sequence gap: {expected_seq} -> {page_seq}"
            )
        expected_seq = page_seq + 1
        if saw_eos:
            raise ValueError("ogg page after EOS page")
        saw_eos = bool(header_type & 0x04)
        continued = bool(header_type & 0x01)
        if continued != open_packet:
            raise ValueError("ogg continuation flag inconsistent")
        body = data[pos + 27 + n_segs : page_end]
        off = 0
        for lace in lacing:
            partial += body[off : off + lace]
            off += lace
            if len(partial) > MAX_PACKET_BYTES:
                raise ValueError("ogg packet exceeds size ceiling")
            if lace < 255:
                packets.append(bytes(partial))
                partial.clear()
                open_packet = False
            else:
                open_packet = True
        pos = page_end
        n_pages += 1
        if n_pages > MAX_PAGES:
            raise ValueError("ogg page count exceeds ceiling")
    if open_packet:
        raise ValueError("ogg stream ends mid-packet")
    if n_pages == 0:
        raise ValueError("no ogg pages")
    if not saw_eos:
        # a CRC-clean prefix of a longer stream is still truncation
        raise ValueError("ogg stream missing EOS page")
    return packets


def last_granule(data: bytes) -> int:
    """Granule position of the final page (for end-of-stream trim).

    Assumes parse_ogg_packets already validated the framing."""
    pos = 0
    granule = -1
    while pos < len(data):
        (g,) = struct.unpack_from("<q", data, pos + 6)
        n_segs = data[pos + 26]
        lacing = data[pos + 27 : pos + 27 + n_segs]
        granule = g
        pos += 27 + n_segs + int(sum(lacing))
    return granule


def write_ogg_pages(
    packets: list[bytes],
    serial: int = 0x52464F53,  # arbitrary fixed stream id
    granules: list[int] | None = None,
) -> bytes:
    """Packets → single-logical-stream Ogg bytes (encoder side).

    One packet group per page except oversized packets, which span
    pages via 255-lacing continuation. `granules[i]` is the granule
    recorded on the page where packet i ends (last one wins per
    page); defaults to the packet index."""
    out = bytearray()
    seq = 0

    def emit(body_laces: list[int], body: bytes, htype: int, granule: int):
        nonlocal seq
        header = OGG_MAGIC + struct.pack(
            "<BBqIIIB",
            0,
            htype,
            granule,
            serial,
            seq,
            0,
            len(body_laces),
        ) + bytes(body_laces)
        page = bytearray(header + body)
        crc = ogg_crc(bytes(page))
        page[22:26] = struct.pack("<I", crc)
        out.extend(page)
        seq += 1

    for i, pkt in enumerate(packets):
        granule = granules[i] if granules is not None else i
        # lacing for this packet: 255s plus a (possibly 0) terminator
        laces = [255] * (len(pkt) // 255) + [len(pkt) % 255]
        htype = 0x02 if i == 0 else 0x00
        if i == len(packets) - 1:
            htype |= 0x04
        # split oversized lacing tables across pages (≤255 segments)
        off = 0
        continued = False
        while laces:
            chunk = laces[:255]
            laces = laces[255:]
            nbytes = sum(chunk)
            ht = htype | (0x01 if continued else 0x00)
            if continued:
                ht &= ~0x02  # BOS is only legal on the first page
            if laces:  # packet continues on the next page
                ht &= ~0x04
            emit(chunk, pkt[off : off + nbytes], ht, granule if not laces else -1)
            off += nbytes
            continued = True
    return bytes(out)
