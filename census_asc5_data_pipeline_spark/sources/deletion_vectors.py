"""Delta Lake DELETION-VECTOR codec — the spec-level building block
for merge-on-read Delta reads (round-8 verdict item #2: "the gate
every modern delta-spark table hits first", since current delta-spark
enables DVs by default).

Everything here is implemented from PUBLIC format documents only:

- delta-io PROTOCOL.md §Deletion Vectors: the descriptor schema
  (``storageType`` / ``pathOrInlineDv`` / ``offset`` /
  ``sizeInBytes`` / ``cardinality``), the on-disk DV file layout
  (1-byte format version, then per DV: 4-byte big-endian length,
  the serialized bitmap, 4-byte big-endian CRC-32 of it), the
  relative-path derivation for ``storageType='u'`` (optional random
  prefix + Z85-encoded UUID → ``deletion_vector_<uuid>.bin``), and
  the ``RoaringBitmapArray`` "portable" serialization (4-byte LE
  magic ``1681511377``, 8-byte LE bitmap count, then per 32-bit
  bitmap: 4-byte LE key + the standard 32-bit roaring
  serialization; row index = key * 2^32 + low value).
- The RoaringFormatSpec (github.com/RoaringBitmap/RoaringFormatSpec)
  for the 32-bit container serialization: cookie 12346
  (no run containers, with offset header) / 12347 (+run bitset,
  offset header only at >= 4 containers), descriptive header of
  (key, cardinality-1) uint16 pairs, then array (sorted uint16s),
  bitmap (1024 x uint64), or run (count + (start, len-1) pairs)
  containers.
- ZeroMQ RFC 32 (Z85) for the UUID / inline-payload text encoding
  (stdlib base64 gained z85 only in 3.13; this container runs 3.11).

Scale notes: a DV is O(deleted rows in one file) — metadata-scale
relative to the data, but NOT O(1); the read path in ``delta_io``
decodes driver-side below a byte threshold and fans decode out to
executors above it, and only (basename, position) pairs ever reach a
shuffle. Encode is used by ``delete_delta_where(mode='dv')`` and by
tests; decode round-trips every container type the spec allows.
"""

from __future__ import annotations

import os
import struct
import uuid as _uuid
import zlib

__all__ = [
    "z85_encode",
    "z85_decode",
    "serialize_roaring64",
    "deserialize_roaring64",
    "dv_relative_path",
    "write_dv_file",
    "read_dv_positions",
    "dv_descriptor_inline",
]

_Z85_CHARS = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_CHARS)}

ROARING64_MAGIC = 1681511377  # PROTOCOL.md §Deletion Vector Format
_SERIAL_COOKIE_NO_RUN = 12346  # RoaringFormatSpec
_SERIAL_COOKIE = 12347
_NO_OFFSET_THRESHOLD = 4
DV_FORMAT_VERSION = 1


def z85_encode(data: bytes) -> str:
    """ZeroMQ RFC 32 Z85: 4 big-endian bytes -> 5 chars."""
    if len(data) % 4:
        raise ValueError("z85 input must be a multiple of 4 bytes")
    out = []
    for i in range(0, len(data), 4):
        v = int.from_bytes(data[i : i + 4], "big")
        chunk = []
        for _ in range(5):
            chunk.append(_Z85_CHARS[v % 85])
            v //= 85
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise ValueError("z85 input must be a multiple of 5 chars")
    out = bytearray()
    for i in range(0, len(text), 5):
        v = 0
        for c in text[i : i + 5]:
            try:
                v = v * 85 + _Z85_INDEX[c]
            except KeyError:
                raise ValueError(f"invalid z85 character {c!r}") from None
        if v > 0xFFFFFFFF:
            raise ValueError("z85 group overflows 32 bits")
        out += v.to_bytes(4, "big")
    return bytes(out)


# ------------------------------------------------ 32-bit roaring


def _serialize_roaring32(values: list[int]) -> bytes:
    """Standard 32-bit roaring portable serialization of SORTED,
    UNIQUE uint32 values. Emits cookie 12346 (no run containers) with
    array containers (cardinality <= 4096) or bitmap containers —
    the exact subset every spec reader must accept."""
    containers: list[tuple[int, list[int]]] = []
    for v in values:
        hi, lo = v >> 16, v & 0xFFFF
        if containers and containers[-1][0] == hi:
            containers[-1][1].append(lo)
        else:
            containers.append((hi, [lo]))
    n = len(containers)
    head = struct.pack("<ii", _SERIAL_COOKIE_NO_RUN, n)
    desc = b"".join(
        struct.pack("<HH", key, len(vals) - 1) for key, vals in containers
    )
    # container payloads first, to compute the offset header
    payloads = []
    for _key, vals in containers:
        if len(vals) <= 4096:
            payloads.append(struct.pack(f"<{len(vals)}H", *vals))
        else:
            words = [0] * 1024
            for lo in vals:
                words[lo >> 6] |= 1 << (lo & 63)
            payloads.append(struct.pack("<1024Q", *words))
    offset_base = len(head) + len(desc) + 4 * n
    offsets = []
    pos = offset_base
    for p in payloads:
        offsets.append(pos)
        pos += len(p)
    off = struct.pack(f"<{n}I", *offsets) if n else b""
    return head + desc + off + b"".join(payloads)


def _deserialize_roaring32(buf: bytes, base: int) -> tuple[list[int], int]:
    """Decode one 32-bit roaring bitmap starting at ``base``; returns
    (sorted values, bytes consumed). Handles both cookies and all
    three container types per the RoaringFormatSpec."""
    (cookie32,) = struct.unpack_from("<i", buf, base)
    cookie = cookie32 & 0xFFFF
    pos = base + 4
    run_flags = b""
    if cookie == _SERIAL_COOKIE:
        n = ((cookie32 >> 16) & 0xFFFF) + 1
        nbitset = (n + 7) // 8
        run_flags = buf[pos : pos + nbitset]
        pos += nbitset
        has_offsets = n >= _NO_OFFSET_THRESHOLD
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        (n,) = struct.unpack_from("<i", buf, pos)
        pos += 4
        has_offsets = True
    else:
        raise ValueError(f"bad roaring cookie {cookie}")
    keys_cards = []
    for i in range(n):
        key, cm1 = struct.unpack_from("<HH", buf, pos)
        pos += 4
        keys_cards.append((key, cm1 + 1))
    if has_offsets:
        pos += 4 * n  # offsets are redundant for a sequential reader
    out: list[int] = []
    for i, (key, card) in enumerate(keys_cards):
        is_run = bool(run_flags) and bool(run_flags[i // 8] & (1 << (i % 8)))
        hi = key << 16
        if is_run:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            for _ in range(n_runs):
                start, length_m1 = struct.unpack_from("<HH", buf, pos)
                pos += 4
                out.extend(hi | v for v in range(start, start + length_m1 + 1))
        elif card <= 4096:
            vals = struct.unpack_from(f"<{card}H", buf, pos)
            pos += 2 * card
            out.extend(hi | v for v in vals)
        else:
            words = struct.unpack_from("<1024Q", buf, pos)
            pos += 8192
            for wi, w in enumerate(words):
                while w:
                    b = w & -w
                    out.append(hi | (wi << 6) | b.bit_length() - 1)
                    w ^= b
    return out, pos - base


# --------------------------------------- 64-bit RoaringBitmapArray


def serialize_roaring64(positions: list[int]) -> bytes:
    """PROTOCOL.md's RoaringBitmapArray portable form: LE magic,
    LE int64 bitmap count, then per 32-bit bucket in ascending key
    order: LE int32 key + standard 32-bit serialization."""
    buckets: dict[int, list[int]] = {}
    for p in sorted(set(int(p) for p in positions)):
        if p < 0:
            raise ValueError("deletion vector positions must be >= 0")
        buckets.setdefault(p >> 32, []).append(p & 0xFFFFFFFF)
    out = [struct.pack("<iq", ROARING64_MAGIC, len(buckets))]
    for key in sorted(buckets):
        out.append(struct.pack("<i", key))
        out.append(_serialize_roaring32(buckets[key]))
    return b"".join(out)


def deserialize_roaring64(data: bytes) -> list[int]:
    magic, n = struct.unpack_from("<iq", data, 0)
    if magic != ROARING64_MAGIC:
        raise ValueError(
            f"bad RoaringBitmapArray magic {magic} (want {ROARING64_MAGIC})"
        )
    pos = 12
    out: list[int] = []
    for _ in range(n):
        (key,) = struct.unpack_from("<i", data, pos)
        pos += 4
        vals, used = _deserialize_roaring32(data, pos)
        pos += used
        out.extend((key << 32) | v for v in vals)
    return out


# ---------------------------------------------------- DV file I/O


def dv_relative_path(path_or_inline: str) -> str:
    """storageType='u': the LAST 20 chars are the Z85 UUID, anything
    before is the writer's random prefix directory; the file is
    ``[<prefix>/]deletion_vector_<uuid>.bin`` under the table root."""
    if len(path_or_inline) < 20:
        raise ValueError(
            f"pathOrInlineDv {path_or_inline!r} too short for a z85 uuid"
        )
    prefix, enc = path_or_inline[:-20], path_or_inline[-20:]
    u = _uuid.UUID(bytes=z85_decode(enc))
    name = f"deletion_vector_{u}.bin"
    return os.path.join(prefix, name) if prefix else name


def write_dv_file(
    table_path: str, positions_by_key: dict[str, list[int]]
) -> dict[str, dict]:
    """Write ONE deletion-vector sidecar holding a DV per key (the
    spec allows many DVs per file at distinct offsets) and return
    {key: descriptor} with ``storageType='u'`` descriptors ready to
    embed in add actions. Layout per PROTOCOL.md: format-version
    byte, then per DV [4-byte BE size][data][4-byte BE CRC32]."""
    u = _uuid.uuid4()
    rel = f"deletion_vector_{u}.bin"
    blob = bytearray([DV_FORMAT_VERSION])
    descs: dict[str, dict] = {}
    for key in sorted(positions_by_key):
        pos_list = positions_by_key[key]
        data = serialize_roaring64(pos_list)
        offset = len(blob)
        blob += struct.pack(">i", len(data))
        blob += data
        blob += struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF)
        descs[key] = {
            "storageType": "u",
            "pathOrInlineDv": z85_encode(u.bytes),
            "offset": offset,
            "sizeInBytes": len(data),
            "cardinality": len(set(int(p) for p in pos_list)),
        }
    tmp = os.path.join(table_path, f".tmp-dv-{_uuid.uuid4().hex}")
    with open(tmp, "wb") as fh:
        fh.write(bytes(blob))
    os.replace(tmp, os.path.join(table_path, rel))
    return descs


def dv_descriptor_inline(positions: list[int]) -> dict:
    """storageType='i' descriptor: the serialized bitmap itself rides
    in the log, Z85-encoded (pad to a 4-byte multiple with zero bytes
    — trailing pad decodes into bytes past sizeInBytes and is
    ignored, mirroring how the spec's base85 codec aligns). Per
    PROTOCOL.md the ``offset`` field must be ABSENT for inline DVs
    (not null — a null value trips strict foreign JSON parsers)."""
    data = serialize_roaring64(positions)
    padded = data + b"\0" * (-len(data) % 4)
    return {
        "storageType": "i",
        "pathOrInlineDv": z85_encode(padded),
        "sizeInBytes": len(data),
        "cardinality": len(set(int(p) for p in positions)),
    }


def read_dv_positions(table_path: str, desc: dict) -> list[int]:
    """Decode a deletion-vector descriptor (any storageType) into its
    sorted row-index list, verifying the stored CRC for on-disk
    forms."""
    st = desc.get("storageType")
    size = int(desc["sizeInBytes"])
    if st == "i":
        data = z85_decode(desc["pathOrInlineDv"])[:size]
        return deserialize_roaring64(data)
    if st == "u":
        full = os.path.join(
            table_path, dv_relative_path(desc["pathOrInlineDv"])
        )
    elif st == "p":
        full = desc["pathOrInlineDv"]
        if full.startswith("file://"):
            import urllib.parse

            full = urllib.parse.urlparse(full).path
    else:
        raise NotImplementedError(f"DV storageType {st!r}")
    with open(full, "rb") as fh:
        raw = fh.read()
    if not raw or raw[0] != DV_FORMAT_VERSION:
        raise ValueError(
            f"DV file {full!r} has format version "
            f"{raw[0] if raw else 'EMPTY'} (want {DV_FORMAT_VERSION})"
        )
    offset = desc.get("offset")
    if offset is None:
        offset = 1
    (stored_size,) = struct.unpack_from(">i", raw, offset)
    if stored_size != size:
        raise ValueError(
            f"DV at offset {offset} in {full!r}: stored size "
            f"{stored_size} != descriptor sizeInBytes {size}"
        )
    data = raw[offset + 4 : offset + 4 + size]
    (crc,) = struct.unpack_from(">I", raw, offset + 4 + size)
    if crc != (zlib.crc32(data) & 0xFFFFFFFF):
        raise ValueError(f"DV checksum mismatch in {full!r}")
    return deserialize_roaring64(data)


def read_iceberg_dv(
    path: str, content_offset: int, content_size: int
) -> list[int]:
    """Iceberg v3 deletion-vector blob (table spec §Deletion vectors;
    Puffin blob type ``deletion-vector-v1``): the blob at
    ``content_offset`` is

        [4-byte BE length of (magic + vector)]
        [magic 0xD1 0x33 0x39 0x64 — the SAME little-endian
         1681511377 as Delta's RoaringBitmapArray]
        [the vector: the portable 64-bit roaring bitmap]
        [4-byte BE CRC-32 of (magic + vector)]

    so (magic + vector) is byte-identical to Delta's
    :func:`serialize_roaring64` output and decodes through the same
    codec. ``content_size`` is the manifest entry's
    ``content-size-in-bytes`` (the full framed blob); both it and the
    CRC are verified before any position is trusted. Returns the
    sorted deleted row indexes of the referenced data file."""
    with open(path, "rb") as fh:
        fh.seek(int(content_offset))
        raw = fh.read(int(content_size))
    if len(raw) < 12:
        raise ValueError(
            f"iceberg DV blob at {path}:{content_offset} truncated "
            f"({len(raw)} bytes)"
        )
    (ln,) = struct.unpack_from(">i", raw, 0)
    if ln <= 0 or 4 + ln + 4 > len(raw):
        raise ValueError(
            f"iceberg DV blob length {ln} inconsistent with "
            f"content-size {content_size}"
        )
    data = raw[4 : 4 + ln]
    (crc,) = struct.unpack_from(">I", raw, 4 + ln)
    if crc != (zlib.crc32(data) & 0xFFFFFFFF):
        raise ValueError(
            f"iceberg DV checksum mismatch at {path}:{content_offset}"
        )
    return deserialize_roaring64(data)


def write_iceberg_dv_blob(positions: list[int]) -> bytes:
    """The framed ``deletion-vector-v1`` blob payload for
    ``positions`` — the exact bytes a v3 writer puts in a Puffin file
    (and the round-trip fixture builder for :func:`read_iceberg_dv`
    tests)."""
    data = serialize_roaring64(positions)
    return (
        struct.pack(">i", len(data))
        + data
        + struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF)
    )
