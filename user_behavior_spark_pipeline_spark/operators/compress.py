"""Cap-guarded decompression shared by the byte-level walkers — one
place for the zip-bomb posture (decompress INCREMENTALLY so the cap
triggers before a hostile payload balloons in memory) and the
quarantine contract (every corruption surfaces as ValueError, never
zlib.error / OSError / a C++ abort).

Codecs: gzip / bz2 / xz from the stdlib; **zstd** and **snappy** via
pyarrow's first-party bindings (stdlib 3.11 has neither; pyarrow ships
as Spark's own Arrow dependency, so this adds no new install). zstd
decompresses through ``pa.CompressedInputStream`` in bounded chunks —
the streaming API is what makes the cap enforceable mid-frame. snappy
has no streaming decoder in pyarrow, but the raw snappy block format
leads with a varint of the UNCOMPRESSED length — parsed here first and
checked against the cap, so the one-shot decompress is already
bomb-bounded before it runs.

Reference parity note: no compression handling in the reference
(SURVEY.md §2.1); training-data extension surface (§2.5) — modern
corpora ship as ``.jsonl.zst`` / ``.tar.zst`` shards (zstd replaced
gzip as the de-facto corpus codec) and Avro containers use
snappy/zstandard codecs in the wild.
"""

from __future__ import annotations

import zlib

#: zstd frame magic (little-endian 0xFD2FB528) — RFC 8878 §3.1.1.
ZSTD_MAGIC = b"\x28\xb5\x2f\xfd"


def zstd_decompress(data: bytes, cap: int, what: str = "payload") -> bytes:
    """Decompress one zstd frame sequence, cap-guarded. Streaming reads
    in 1 MiB chunks so a hostile high-ratio frame trips the cap instead
    of materializing; corruption and truncation both surface as
    pyarrow IO errors and map to ValueError (the quarantine contract)."""
    import pyarrow as pa

    chunks: list[bytes] = []
    total = 0
    overflow = False
    try:
        st = pa.CompressedInputStream(pa.BufferReader(data), "zstd")
        while True:
            chunk = st.read(1 << 20)
            if not chunk:
                break
            total += len(chunk)
            if total > cap:
                overflow = True
                break
            chunks.append(chunk)
    except (OSError, ValueError) as e:
        # ArrowIOError (corrupt/truncated frame) is OSError; ArrowInvalid
        # is ValueError — both normalize with context
        raise ValueError(f"corrupt zstd {what}: {e}") from None
    if overflow:
        raise ValueError(f"{what} inflates past cap (zip-bomb defense)")
    return b"".join(chunks)


def _snappy_uncompressed_len(data: bytes, what: str) -> int:
    """The raw snappy block format's leading varint = uncompressed
    length (google/snappy format_description.txt) — the hook that makes
    one-shot snappy bomb-boundable."""
    shift = 0
    acc = 0
    for pos in range(min(len(data), 5)):
        b = data[pos]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return acc
        shift += 7
    raise ValueError(f"corrupt snappy {what}: bad length preamble")


def snappy_decompress(data: bytes, cap: int, what: str = "payload") -> bytes:
    """Decompress one raw snappy block, cap-guarded via the format's own
    length preamble BEFORE the one-shot decode runs."""
    import pyarrow as pa

    n = _snappy_uncompressed_len(data, what)
    if n > cap:
        raise ValueError(f"{what} inflates past cap (zip-bomb defense)")
    try:
        return pa.Codec("snappy").decompress(
            data, decompressed_size=n, asbytes=True
        )
    except (OSError, ValueError) as e:
        raise ValueError(f"corrupt snappy {what}: {e}") from None


#: snappy FRAMING format stream identifier (google/snappy
#: framing_format.txt §4.1): chunk type 0xff, 3-byte LE length 6,
#: payload "sNaPpY" — the magic hadoop/dataflow ``.sz`` files lead with.
SNAPPY_FRAME_MAGIC = b"\xff\x06\x00\x00sNaPpY"

_CRC32C_POLY = 0x82F63B78  # Castagnoli, reflected
_CRC32C_TABLE: list[int] = []


def _crc32c(data: bytes) -> int:
    """CRC-32C (Castagnoli) — the framing format's checksum; not in the
    stdlib (zlib.crc32 is CRC-32/ISO-HDLC), so table-driven here."""
    if not _CRC32C_TABLE:
        for i in range(256):
            c = i
            for _ in range(8):
                c = (c >> 1) ^ _CRC32C_POLY if c & 1 else c >> 1
            _CRC32C_TABLE.append(c)
    crc = 0xFFFFFFFF
    for b in data:
        crc = (crc >> 8) ^ _CRC32C_TABLE[(crc ^ b) & 0xFF]
    return crc ^ 0xFFFFFFFF


def _mask_crc32c(crc: int) -> int:
    """The format's CRC mask (§3): rotate right 15, add a constant —
    defends against CRCs of CRCs."""
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def snappy_framed_decompress(
    data: bytes, cap: int, what: str = "payload"
) -> bytes:
    """Decompress a snappy FRAMING-format stream (.sz —
    framing_format.txt): stream identifier, then compressed (0x00) /
    uncompressed (0x01) data chunks with masked CRC-32C of the
    uncompressed bytes, skippable chunks (0x80-0xfe) skipped, reserved
    unskippable chunks (0x02-0x7f) and CRC mismatches -> ValueError.
    Chunk-at-a-time, so the cap triggers between 64 KiB chunks, never
    after a hostile whole-stream materialization."""
    if not data.startswith(SNAPPY_FRAME_MAGIC):
        raise ValueError(f"corrupt snappy-framed {what}: bad stream id")
    out: list[bytes] = []
    total = 0
    pos = 0
    while pos < len(data):
        if pos + 4 > len(data):
            raise ValueError(
                f"truncated snappy-framed {what}: chunk header at {pos}"
            )
        ctype = data[pos]
        clen = int.from_bytes(data[pos + 1 : pos + 4], "little")
        body = data[pos + 4 : pos + 4 + clen]
        if len(body) != clen:
            raise ValueError(
                f"truncated snappy-framed {what}: chunk body at {pos}"
            )
        pos += 4 + clen
        if ctype == 0xFF:
            if body != b"sNaPpY":
                raise ValueError(
                    f"corrupt snappy-framed {what}: bad stream id body"
                )
            continue
        if 0x80 <= ctype <= 0xFE:
            continue  # skippable, by definition
        if ctype in (0x00, 0x01):
            if clen < 4:
                raise ValueError(
                    f"corrupt snappy-framed {what}: chunk shorter than CRC"
                )
            want_crc = int.from_bytes(body[:4], "little")
            payload = body[4:]
            if ctype == 0x00:
                chunk = snappy_decompress(
                    payload, min(cap + 1 - total, 1 << 17), what
                )
            else:
                chunk = payload
            if len(chunk) > 65536:
                raise ValueError(
                    f"corrupt snappy-framed {what}: chunk exceeds 64 KiB"
                )
            if _mask_crc32c(_crc32c(chunk)) != want_crc:
                raise ValueError(
                    f"corrupt snappy-framed {what}: CRC-32C mismatch"
                )
            total += len(chunk)
            if total > cap:
                raise ValueError(
                    f"{what} inflates past cap (zip-bomb defense)"
                )
            out.append(chunk)
            continue
        raise ValueError(
            f"corrupt snappy-framed {what}: reserved unskippable "
            f"chunk 0x{ctype:02x}"
        )
    return b"".join(out)


def snappy_framed_compress(data: bytes) -> bytes:
    """Emit a .sz stream (fixture builders): 64 KiB chunks, each as a
    COMPRESSED chunk unless snappy doesn't shrink it (then uncompressed
    — the spec's own recommendation), so both data chunk types occur
    naturally."""
    out = bytearray(SNAPPY_FRAME_MAGIC)
    for i in range(0, len(data), 65536):
        chunk = data[i : i + 65536]
        crc = _mask_crc32c(_crc32c(chunk)).to_bytes(4, "little")
        comp = snappy_compress(chunk)
        if len(comp) < len(chunk):
            body = crc + comp
            ctype = 0x00
        else:
            body = crc + chunk
            ctype = 0x01
        out += bytes((ctype,)) + len(body).to_bytes(3, "little") + body
    return bytes(out)


def zstd_compress(data: bytes) -> bytes:
    """One zstd frame (fixture builders; pyarrow's default level)."""
    import pyarrow as pa

    return pa.Codec("zstd").compress(data, asbytes=True)


def snappy_compress(data: bytes) -> bytes:
    """One raw snappy block (fixture builders)."""
    import pyarrow as pa

    return pa.Codec("snappy").compress(data, asbytes=True)


def _multi_member(payload: bytes, cap: int, what: str, codec: str,
                  magic: bytes, new_decomp, errors) -> bytes:
    """Decompress a CONCATENATION of members/streams (what pigz, bgzip,
    pbzip2 and multi-stream xz actually emit): each stdlib decompressor
    object stops at its member's end with the remainder in
    ``unused_data`` — the single-object form silently DROPPED every
    member after the first (caught r12: a two-member .gz inflated to
    only its first member's bytes — silent truncation, the exact
    failure mode the quarantine contract exists to prevent). The cap
    applies to the TOTAL across members."""
    out = []
    total = 0
    rest = payload
    while True:
        d = new_decomp()
        try:
            chunk = d.decompress(rest, cap + 1 - total)
        except errors as e:
            raise ValueError(f"corrupt {codec} {what}: {e}") from e
        total += len(chunk)
        if total > cap:
            raise ValueError(f"{what} inflates past cap (zip-bomb defense)")
        out.append(chunk)
        if not d.eof:
            raise ValueError(f"truncated {codec} {what}")
        rest = d.unused_data
        if not rest:
            return b"".join(out)
        if not rest.startswith(magic):
            raise ValueError(
                f"trailing garbage after {codec} {what} member"
            )


def decompress_transparent(
    payload: bytes, cap: int, what: str = "payload"
) -> bytes:
    """Magic-sniffed transparent decompression: gzip / bz2 / xz / zstd
    payloads inflate (incrementally, cap-guarded); anything else passes
    through untouched. Multi-member/multi-frame concatenations (pigz,
    bgzip, pbzip2, multi-stream xz, multi-frame zstd) inflate FULLY —
    never just the first member. ValueError on corruption, truncation,
    trailing garbage, or a payload inflating past ``cap`` — the shared
    front door for the tar shard walker and the ``.jsonl.{gz,zst}``
    corpus readers."""
    if payload[:2] == b"\x1f\x8b":
        payload = _multi_member(
            payload, cap, what, "gzip", b"\x1f\x8b",
            lambda: zlib.decompressobj(wbits=47), (zlib.error,),
        )
    elif payload[:3] == b"BZh":
        import bz2

        payload = _multi_member(
            payload, cap, what, "bz2", b"BZh",
            bz2.BZ2Decompressor, (OSError,),
        )
    elif payload[:6] == b"\xfd7zXZ\x00":
        import lzma

        payload = _multi_member(
            payload, cap, what, "xz", b"\xfd7zXZ\x00",
            lzma.LZMADecompressor, (lzma.LZMAError,),
        )
    elif payload[:4] == ZSTD_MAGIC:
        # pyarrow's streaming decoder reads concatenated frames natively
        payload = zstd_decompress(payload, cap, what)
    elif payload[: len(SNAPPY_FRAME_MAGIC)] == SNAPPY_FRAME_MAGIC:
        payload = snappy_framed_decompress(payload, cap, what)
    return payload
