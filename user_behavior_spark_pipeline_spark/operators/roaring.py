"""Roaring bitmaps + Z85 — the byte formats under Delta Lake deletion
vectors (both PUBLIC specs: the RoaringBitmap interoperable
serialization, github.com/RoaringBitmap/RoaringFormatSpec, and the
Delta protocol's deletion-vector chapter, delta.io PROTOCOL.md — no
Delta or roaring library involved, the container only has pyspark).

Delta serializes a deletion vector as a "RoaringBitmapArray" in its
"portable" format: a 4-byte little-endian magic (1681511377), an 8-byte
little-endian count of 32-bit roaring bitmaps, then per bitmap a 4-byte
little-endian key (the high 32 bits of the deleted row ordinal)
followed by ONE standard 32-bit roaring bitmap in the interoperable
format. The 32-bit format in turn is: cookie (12346 = no run
containers, 4-byte, followed by a 4-byte container count; 12347 = run
containers present, lower 16 bits, container count - 1 in the upper 16
bits, followed by a run-flag bitset), a descriptive header of (key16,
cardinality-1) pairs, an offset header (present when the cookie is
12346 or the container count is >= 4), and the containers themselves —
ARRAY (sorted 16-bit values, cardinality <= 4096), BITMAP (8 KiB
bitset, cardinality > 4096) or RUN (16-bit run count, then (start,
length-1) pairs).

Quarantine contract: every malformed shape raises ValueError (the
walkers' quarantine class) with a named reason; decoded sizes are
cap-guarded BEFORE materialization so a hostile header cannot allocate
its claimed size.
"""

from __future__ import annotations

import struct

ROARING_ARRAY_MAGIC = 1681511377
_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE_RUN = 12347
_NO_OFFSET_THRESHOLD = 4

#: ZeroMQ Z85 alphabet (spec 32/Z85 — public), the encoding Delta uses
#: for inline deletion vectors and DV-file UUIDs.
_Z85_CHARS = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_CHARS)}


def z85_encode(data: bytes) -> str:
    """Z85 with zero-padding to a 4-byte boundary (Delta inline DVs
    carry sizeInBytes separately, so the pad is trimmed on decode)."""
    pad = (-len(data)) % 4
    data = data + b"\x00" * pad
    out = []
    for i in range(0, len(data), 4):
        (v,) = struct.unpack(">I", data[i : i + 4])
        chunk = []
        for _ in range(5):
            chunk.append(_Z85_CHARS[v % 85])
            v //= 85
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str, size: int) -> bytes:
    """Decode, trimming to ``size`` bytes (the metadata's sizeInBytes).
    Malformed input raises ValueError."""
    if len(text) % 5:
        raise ValueError(f"z85 length {len(text)} not a multiple of 5")
    out = bytearray()
    for i in range(0, len(text), 5):
        v = 0
        for c in text[i : i + 5]:
            if c not in _Z85_INDEX:
                raise ValueError(f"z85 char {c!r} outside alphabet")
            v = v * 85 + _Z85_INDEX[c]
        if v > 0xFFFFFFFF:
            raise ValueError("z85 group overflows 32 bits")
        out += struct.pack(">I", v)
    if size > len(out):
        raise ValueError(
            f"z85 payload {len(out)}B shorter than declared size {size}"
        )
    return bytes(out[:size])


def _need(data: bytes, off: int, n: int, what: str) -> None:
    if off + n > len(data):
        raise ValueError(
            f"roaring {what} needs {n}B at {off}, only {len(data)} total"
        )


def _decode_rb32(data: bytes, off: int, cap: int) -> tuple[list[int], int]:
    """One 32-bit roaring bitmap at ``off`` -> (sorted values, new off).
    ``cap`` bounds the total decoded cardinality."""
    _need(data, off, 4, "cookie")
    (cookie_word,) = struct.unpack_from("<I", data, off)
    cookie = cookie_word & 0xFFFF
    if cookie == _SERIAL_COOKIE_RUN:
        n_cont = (cookie_word >> 16) + 1
        off += 4
        flag_bytes = (n_cont + 7) // 8
        _need(data, off, flag_bytes, "run flags")
        flags = data[off : off + flag_bytes]
        off += flag_bytes
        has_offsets = n_cont >= _NO_OFFSET_THRESHOLD
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        _need(data, off + 4, 4, "container count")
        (n_cont,) = struct.unpack_from("<I", data, off + 4)
        off += 8
        flags = b""
        has_offsets = True
    else:
        raise ValueError(f"roaring cookie {cookie} unknown")
    if n_cont == 0 or n_cont > 65536:
        raise ValueError(f"roaring container count {n_cont} out of range")
    _need(data, off, 4 * n_cont, "descriptive header")
    desc = [
        struct.unpack_from("<HH", data, off + 4 * i) for i in range(n_cont)
    ]
    off += 4 * n_cont
    total_card = sum(c + 1 for _, c in desc)
    if total_card > cap:
        raise ValueError(
            f"roaring cardinality {total_card} exceeds cap {cap}"
        )
    if has_offsets:
        _need(data, off, 4 * n_cont, "offset header")
        off += 4 * n_cont  # trust sequential layout; offsets redundant
    values: list[int] = []
    prev_key = -1
    for i, (key, card_m1) in enumerate(desc):
        if key <= prev_key:
            raise ValueError("roaring container keys not increasing")
        prev_key = key
        card = card_m1 + 1
        base = key << 16
        is_run = bool(flags and (flags[i // 8] >> (i % 8)) & 1)
        if is_run:
            _need(data, off, 2, "run count")
            (n_runs,) = struct.unpack_from("<H", data, off)
            off += 2
            _need(data, off, 4 * n_runs, "runs")
            got = 0
            for r in range(n_runs):
                start, len_m1 = struct.unpack_from("<HH", data, off + 4 * r)
                if start + len_m1 > 0xFFFF:
                    raise ValueError("roaring run exceeds 16-bit space")
                values.extend(base + v for v in range(start, start + len_m1 + 1))
                got += len_m1 + 1
            off += 4 * n_runs
            if got != card:
                raise ValueError(
                    f"roaring run container card {got} != header {card}"
                )
        elif card > 4096:
            _need(data, off, 8192, "bitmap container")
            chunk = data[off : off + 8192]
            off += 8192
            got = 0
            for w in range(1024):
                (word,) = struct.unpack_from("<Q", chunk, w * 8)
                while word:
                    b = word & -word
                    values.append(base + w * 64 + b.bit_length() - 1)
                    word ^= b
                    got += 1
            if got != card:
                raise ValueError(
                    f"roaring bitmap container card {got} != header {card}"
                )
        else:
            _need(data, off, 2 * card, "array container")
            arr = struct.unpack_from(f"<{card}H", data, off)
            off += 2 * card
            if any(b >= a for a, b in zip(arr[1:], arr)):
                raise ValueError("roaring array container not increasing")
            values.extend(base + v for v in arr)
    return values, off


def roaring_array_positions(data: bytes, cap: int = 1 << 22) -> list[int]:
    """Decode a Delta RoaringBitmapArray (portable) to the sorted list
    of 64-bit positions. ``cap`` bounds total decoded cardinality."""
    _need(data, 0, 12, "array header")
    magic, n_bitmaps = struct.unpack_from("<iQ", data, 0)
    if magic != ROARING_ARRAY_MAGIC:
        # name the one known-other shape before the generic reject: a
        # blob that OPENS with a 32-bit roaring cookie is the legacy
        # pre-portable serialization some older writers emitted — a
        # named quarantine tells the operator report what was hit
        # (decode deliberately NOT attempted: the public Delta spec
        # defines only the portable framing, and guessing at key
        # widths risks silently wrong delete sets)
        if (
            magic == _SERIAL_COOKIE_NO_RUN
            or (magic & 0xFFFF) == _SERIAL_COOKIE_RUN
        ):
            raise ValueError(
                "legacy-32bit-roaring serialization (bare 32-bit "
                f"cookie {magic}) is not the portable format"
            )
        raise ValueError(f"roaring array magic {magic} != expected")
    if n_bitmaps > 1 << 32:
        raise ValueError(f"roaring array bitmap count {n_bitmaps} hostile")
    off = 12
    out: list[int] = []
    prev_key = -1
    for _ in range(n_bitmaps):
        _need(data, off, 4, "bitmap key")
        (key,) = struct.unpack_from("<I", data, off)
        if key <= prev_key:
            raise ValueError("roaring array keys not increasing")
        prev_key = key
        off += 4
        vals, off = _decode_rb32(data, off, cap - len(out))
        out.extend((key << 32) | v for v in vals)
    if off != len(data):
        raise ValueError(
            f"roaring array trailing {len(data) - off}B after bitmaps"
        )
    return out


# ---------------------------------------------------------------------------
# Encoder (fixture side) — the real roaring space heuristic picks the
# container type, so designed position sets certify each decoder arm
# ---------------------------------------------------------------------------


def _encode_rb32(values: list[int]) -> bytes:
    """values: sorted, distinct, < 2^32."""
    blocks: dict[int, list[int]] = {}
    for v in values:
        blocks.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(blocks)
    plans = []  # (key, kind, payload bytes, cardinality)
    any_run = False
    for key in keys:
        vals = blocks[key]
        card = len(vals)
        runs = []
        start = prev = vals[0]
        for v in vals[1:]:
            if v == prev + 1:
                prev = v
                continue
            runs.append((start, prev - start))
            start = prev = v
        runs.append((start, prev - start))
        run_sz = 2 + 4 * len(runs)
        other_sz = 8192 if card > 4096 else 2 * card
        if run_sz < other_sz:
            any_run = True
            payload = struct.pack("<H", len(runs)) + b"".join(
                struct.pack("<HH", s, ln) for s, ln in runs
            )
            plans.append((key, "run", payload, card))
        elif card > 4096:
            bits = bytearray(8192)
            for v in vals:
                bits[v >> 3] |= 1 << (v & 7)
            plans.append((key, "bitmap", bytes(bits), card))
        else:
            plans.append(
                (key, "array", struct.pack(f"<{card}H", *vals), card)
            )
    n = len(plans)
    out = bytearray()
    if any_run:
        out += struct.pack("<I", _SERIAL_COOKIE_RUN | ((n - 1) << 16))
        flags = bytearray((n + 7) // 8)
        for i, (_, kind, _, _) in enumerate(plans):
            if kind == "run":
                flags[i // 8] |= 1 << (i % 8)
        out += flags
        has_offsets = n >= _NO_OFFSET_THRESHOLD
    else:
        out += struct.pack("<II", _SERIAL_COOKIE_NO_RUN, n)
        has_offsets = True
    for key, _, _, card in plans:
        out += struct.pack("<HH", key, card - 1)
    if has_offsets:
        pos = len(out) + 4 * n
        for _, _, payload, _ in plans:
            out += struct.pack("<I", pos)
            pos += len(payload)
    for _, _, payload, _ in plans:
        out += payload
    return bytes(out)


def build_roaring_array(positions: list[int]) -> bytes:
    """Serialize sorted distinct 64-bit positions as a Delta
    RoaringBitmapArray (portable)."""
    blocks: dict[int, list[int]] = {}
    for p in sorted(set(positions)):
        blocks.setdefault(p >> 32, []).append(p & 0xFFFFFFFF)
    out = bytearray(struct.pack("<iQ", ROARING_ARRAY_MAGIC, len(blocks)))
    for key in sorted(blocks):
        out += struct.pack("<I", key)
        out += _encode_rb32(blocks[key])
    return bytes(out)
