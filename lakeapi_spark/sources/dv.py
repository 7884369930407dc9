"""Delta deletion vectors: pure-Python roaring-bitmap codec + DV file IO.

A deletion vector (DV) marks rows of ONE parquet data file as deleted
by row index, so a DELETE touches kilobytes of bitmap instead of
rewriting gigabytes of data — delta's merge-on-read path and the core
of why deletes stay cheap at 100 TB. The reference engine REJECTS
DV tables outright (its README draws the line at column mapping);
this module goes past that boundary with a reader AND writer built
from the public specs alone:

- Delta protocol "Deletion Vectors" section: the
  ``deletionVector`` descriptor (storageType u/i/p, Z85 encoding,
  offset/sizeInBytes/cardinality) and the on-disk framing
  (1-byte version, then per DV: big-endian int32 size, payload,
  big-endian int32 CRC-32 of the payload);
- delta's RoaringBitmapArray "portable" format: little-endian int32
  magic 1681511377, int64 bitmap count, then one standard 32-bit
  roaring bitmap per consecutive high-32-bit key;
- the RoaringFormatSpec portable layout for each 32-bit bitmap
  (cookies 12346/12347, array/bitmap/run containers).

Everything here is driver/executor-side metadata work: DV payloads are
KB-scale by design (delta rewrites a file once its DV grows past a
threshold), so parsing them in Python is not a hot path. The expansion
of bitmaps into (file, position) rows for the anti-join IS distributed
— see ``deleted_positions_df``.
"""

from __future__ import annotations

import struct
import uuid as _uuid
import zlib

# --- Z85 (ZeroMQ base85) — the protocol's encoding for DV uuids and
# --- inline payloads. stdlib b85 uses the RFC-1924 alphabet, which is
# --- NOT what delta writes, so the 4->5 expansion is done by hand.
_Z85_ALPHABET = (
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
    ".-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_ALPHABET)}


def z85_encode(data: bytes) -> str:
    if len(data) % 4:
        raise ValueError(f"z85 input must be a multiple of 4 bytes, got {len(data)}")
    out = []
    for i in range(0, len(data), 4):
        n = int.from_bytes(data[i : i + 4], "big")
        chunk = []
        for _ in range(5):
            n, r = divmod(n, 85)
            chunk.append(_Z85_ALPHABET[r])
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise ValueError(f"z85 input must be a multiple of 5 chars, got {len(text)}")
    out = bytearray()
    for i in range(0, len(text), 5):
        n = 0
        for c in text[i : i + 5]:
            try:
                n = n * 85 + _Z85_INDEX[c]
            except KeyError:
                raise ValueError(f"invalid z85 character {c!r}") from None
        if n > 0xFFFFFFFF:
            raise ValueError("z85 group overflows 32 bits")
        out += n.to_bytes(4, "big")
    return bytes(out)


# --- 32-bit roaring bitmap, portable serialization (RoaringFormatSpec)

_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE = 12347
_NO_OFFSET_THRESHOLD = 4
_ARRAY_MAX = 4096


def _serialize_rb32(values: list[int]) -> bytes:
    """Serialize sorted distinct uint32 values. The writer only emits
    array and bitmap containers (always valid per spec — run containers
    are an optional compression the PARSER must accept, not one a
    writer must produce)."""
    containers: list[tuple[int, list[int]]] = []
    cur_key: int | None = None
    cur: list[int] = []
    for v in values:
        key, low = v >> 16, v & 0xFFFF
        if key != cur_key:
            if cur_key is not None:
                containers.append((cur_key, cur))
            cur_key, cur = key, []
        cur.append(low)
    if cur_key is not None:
        containers.append((cur_key, cur))

    n = len(containers)
    out = bytearray(struct.pack("<II", _SERIAL_COOKIE_NO_RUN, n))
    for key, lows in containers:
        out += struct.pack("<HH", key, len(lows) - 1)
    # offset header (always present with the no-run cookie)
    offset = 8 + 4 * n + 4 * n
    body = bytearray()
    for _key, lows in containers:
        out += struct.pack("<I", offset + len(body))
        if len(lows) <= _ARRAY_MAX:
            body += struct.pack(f"<{len(lows)}H", *lows)
        else:
            words = [0] * 1024
            for low in lows:
                words[low >> 6] |= 1 << (low & 63)
            body += struct.pack("<1024Q", *words)
    return bytes(out + body)


def _parse_rb32(buf: bytes, pos: int) -> tuple[list[int], int]:
    """Parse one portable 32-bit roaring bitmap at ``pos``; returns
    (sorted values, next position). Handles array, bitmap AND run
    containers (foreign writers emit runs)."""
    (cookie32,) = struct.unpack_from("<I", buf, pos)
    cookie = cookie32 & 0xFFFF
    if cookie == _SERIAL_COOKIE:
        n = (cookie32 >> 16) + 1
        pos += 4
        nbytes = (n + 7) // 8
        run_bits = buf[pos : pos + nbytes]
        pos += nbytes
        has_offsets = n >= _NO_OFFSET_THRESHOLD
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        (n,) = struct.unpack_from("<I", buf, pos + 4)
        pos += 8
        run_bits = b""
        has_offsets = True
    else:
        raise ValueError(f"not a roaring bitmap: cookie {cookie}")
    keys_cards = struct.unpack_from(f"<{2 * n}H", buf, pos)
    pos += 4 * n
    if has_offsets:
        pos += 4 * n  # containers are parsed sequentially; offsets unused
    values: list[int] = []
    for i in range(n):
        key, card = keys_cards[2 * i], keys_cards[2 * i + 1] + 1
        base = key << 16
        is_run = bool(run_bits and (run_bits[i // 8] >> (i % 8)) & 1)
        if is_run:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            for _ in range(n_runs):
                start, length = struct.unpack_from("<HH", buf, pos)
                pos += 4
                values.extend(range(base + start, base + start + length + 1))
        elif card <= _ARRAY_MAX:
            lows = struct.unpack_from(f"<{card}H", buf, pos)
            pos += 2 * card
            values.extend(base + low for low in lows)
        else:
            words = struct.unpack_from("<1024Q", buf, pos)
            pos += 8192
            for w_i, w in enumerate(words):
                while w:
                    b = w & -w
                    values.append(base + (w_i << 6) + b.bit_length() - 1)
                    w ^= b
    return values, pos


# --- delta's 64-bit RoaringBitmapArray, "portable" serialization

_RBA_MAGIC = 1681511377


def serialize_rba(positions: list[int]) -> bytes:
    """Serialize sorted distinct non-negative row indexes: magic +
    int64 bitmap count + one 32-bit bitmap per consecutive high-32-bit
    key (empty bitmaps included — the format indexes bitmaps by
    position)."""
    if positions and positions[0] < 0:
        raise ValueError("row indexes must be non-negative")
    n_keys = (positions[-1] >> 32) + 1 if positions else 0
    out = bytearray(struct.pack("<iq", _RBA_MAGIC, n_keys))
    by_key: dict[int, list[int]] = {}
    for p in positions:
        by_key.setdefault(p >> 32, []).append(p & 0xFFFFFFFF)
    for key in range(n_keys):
        out += _serialize_rb32(by_key.get(key, []))
    return bytes(out)


def parse_rba(data: bytes) -> list[int]:
    """Parse a portable RoaringBitmapArray into sorted row indexes."""
    magic, n_keys = struct.unpack_from("<iq", data, 0)
    if magic != _RBA_MAGIC:
        raise ValueError(f"bad RoaringBitmapArray magic {magic}")
    pos = 12
    values: list[int] = []
    for key in range(n_keys):
        vals32, pos = _parse_rb32(data, pos)
        values.extend((key << 32) | v for v in vals32)
    return values


# --- DV file framing + descriptor handling

def pack_dv_file(payloads: list[bytes]) -> tuple[bytes, list[int]]:
    """Frame serialized bitmaps into one DV file: 1-byte format version,
    then per DV a big-endian int32 size, the payload, and a big-endian
    CRC-32 of the payload. Returns (file bytes, per-payload offsets) —
    each offset points at the size field, which is what the descriptor's
    ``offset`` records."""
    out = bytearray(b"\x01")
    offsets = []
    for data in payloads:
        offsets.append(len(out))
        out += struct.pack(">i", len(data))
        out += data
        out += struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF)
    return bytes(out), offsets


def unpack_dv_at(blob: bytes, offset: int, size_in_bytes: int) -> bytes:
    """Extract and checksum-verify one DV payload from a DV file."""
    if not blob or blob[0] != 1:
        raise ValueError(f"unsupported DV file format version {blob[:1]!r}")
    (size,) = struct.unpack_from(">i", blob, offset)
    if size != size_in_bytes:
        raise ValueError(
            f"DV size mismatch at offset {offset}: file says {size}, "
            f"descriptor says {size_in_bytes}"
        )
    data = blob[offset + 4 : offset + 4 + size]
    (crc,) = struct.unpack_from(">I", blob, offset + 4 + size)
    if zlib.crc32(data) & 0xFFFFFFFF != crc:
        raise ValueError(f"DV checksum mismatch at offset {offset}")
    return data


def dv_relative_path(path_or_inline: str) -> str:
    """storageType 'u': ``<optional random prefix><20-char z85 uuid>``
    names ``[prefix/]deletion_vector_<uuid>.bin`` under the table
    root."""
    prefix, encoded = path_or_inline[:-20], path_or_inline[-20:]
    u = _uuid.UUID(bytes=z85_decode(encoded))
    name = f"deletion_vector_{u}.bin"
    return f"{prefix}/{name}" if prefix else name


def make_dv_descriptor_u(
    prefix: str, u: _uuid.UUID, offset: int, size_in_bytes: int, cardinality: int
) -> dict:
    return {
        "storageType": "u",
        "pathOrInlineDv": prefix + z85_encode(u.bytes),
        "offset": offset,
        "sizeInBytes": size_in_bytes,
        "cardinality": cardinality,
    }


def read_dv_payload(dv: dict, read_file: "callable") -> bytes:
    """Resolve a deletionVector descriptor to its serialized-bitmap
    BYTES. ``read_file(relative_or_absolute_path) -> bytes`` abstracts
    the filesystem (local or Hadoop FS) — 'u' paths are table-root
    relative, 'p' absolute, 'i' inline. The single home for the
    storageType dispatch and the z85-padding trim."""
    st = dv["storageType"]
    if st == "i":
        # z85 pads to 4-byte groups; sizeInBytes trims the padding
        return z85_decode(dv["pathOrInlineDv"])[: int(dv["sizeInBytes"])]
    if st in ("u", "p"):
        blob = read_file(
            dv_relative_path(dv["pathOrInlineDv"]) if st == "u" else dv["pathOrInlineDv"]
        )
        return unpack_dv_at(blob, int(dv.get("offset") or 0), int(dv["sizeInBytes"]))
    raise ValueError(f"unknown DV storageType {st!r}")


def read_dv_positions(dv: dict, read_file: "callable") -> list[int]:
    """Resolve a deletionVector descriptor to sorted row indexes (see
    :func:`read_dv_payload`), checking the descriptor cardinality."""
    positions = parse_rba(read_dv_payload(dv, read_file))
    card = int(dv.get("cardinality") or 0)
    if card and card != len(positions):
        raise ValueError(
            f"DV cardinality mismatch: descriptor says {card}, bitmap has "
            f"{len(positions)}"
        )
    return positions
