"""Puffin statistics-file codec (r15 verdict #3) — spec-level, pure
python, the same discipline as the avro container codec: no
datasketches/iceberg jar required.

Puffin is Iceberg's statistics sidecar format (the spec lives in the
Iceberg docs, "Puffin file format"): a magic-framed blob container
whose FOOTER carries a JSON payload describing each blob —

    Magic Blob1 ... BlobN Footer
    Footer = Magic | payload(JSON) | payload_size(int32 LE)
             | flags(4 bytes) | Magic

Each blob-metadata entry records ``type``, ``fields`` (source field
ids), ``snapshot-id``, ``sequence-number``, ``offset``, ``length``
and free-form ``properties``. For the one standardized statistic —
``apache-datasketches-theta-v1`` distinct-count sketches — the spec
REQUIRES the blob's ``properties`` to carry ``ndv`` ("estimate of
number of distinct values, derived from the sketch"), so consuming
ndv needs only the footer JSON: the sketch bytes themselves exist
for cross-file merging, which a reader feeding a CBO never does.
:func:`puffin_ndv` therefore reads ONE footer — O(statistics), zero
data-file or sketch decoding.

The writer exists for round-tripping and for hand-building test
fixtures the way a foreign engine (spark-iceberg's ANALYZE /
ComputeTableStats action) would; blob payload bytes are opaque here.
"""
from __future__ import annotations

import json
import os
import struct

MAGIC = b"PFA1"
#: footer flags: 4 bytes, little-endian; bit 0 of byte 0 = footer
#: payload is lz4-compressed (unsupported here — refuse loudly)
_FLAG_FOOTER_COMPRESSED = 0x01


def write_puffin(
    path: str,
    blobs: list[tuple[bytes, dict]],
    properties: dict | None = None,
) -> list[dict]:
    """Write a Puffin file of ``(payload_bytes, blob_meta)`` pairs.

    ``blob_meta`` supplies the spec's descriptive keys (``type``,
    ``fields``, ``snapshot-id``, ``sequence-number``,
    ``properties``); ``offset``/``length`` are computed here. Returns
    the completed blob-metadata list — exactly what the table
    metadata's ``statistics[].blob-metadata`` field embeds."""
    out_meta: list[dict] = []
    with open(path, "wb") as fh:
        fh.write(MAGIC)
        for payload, meta in blobs:
            off = fh.tell()
            fh.write(payload)
            m = dict(meta)
            m["offset"] = off
            m["length"] = len(payload)
            m.setdefault("compression-codec", None)
            out_meta.append(m)
        footer = {
            "blobs": out_meta,
            **({"properties": properties} if properties else {}),
        }
        payload = json.dumps(footer).encode("utf-8")
        fh.write(MAGIC)
        fh.write(payload)
        fh.write(struct.pack("<i", len(payload)))
        fh.write(struct.pack("<I", 0))  # flags: uncompressed
        fh.write(MAGIC)
    return out_meta


def read_puffin_footer(path: str) -> dict:
    """Parse a Puffin file's footer JSON ({"blobs": [...],
    "properties": {...}}). Validates both magics and refuses
    lz4-compressed footers (out of scope, loud)."""
    size = os.path.getsize(path)
    if size < 4 + 4 + 4 + 4 + 4:
        raise ValueError(f"{path}: too small to be a Puffin file")
    with open(path, "rb") as fh:
        if fh.read(4) != MAGIC:
            raise ValueError(f"{path}: bad Puffin head magic")
        fh.seek(size - 12)
        payload_size = struct.unpack("<i", fh.read(4))[0]
        flags = struct.unpack("<I", fh.read(4))[0]
        if fh.read(4) != MAGIC:
            raise ValueError(f"{path}: bad Puffin tail magic")
        if flags & _FLAG_FOOTER_COMPRESSED:
            raise NotImplementedError(
                f"{path}: lz4-compressed Puffin footer is out of scope"
            )
        # the file is at minimum head-magic(4) + footer-magic(4) +
        # payload + 12-byte tail struct: a payload_size of size-16
        # would put the "footer magic" read at offset 0, where the
        # HEAD magic sits, accepting a malformed file only for
        # json.loads to fail with a confusing error — so require the
        # full 20 framing bytes, not 16 (r15 ADVICE)
        if payload_size < 0 or payload_size + 20 > size:
            raise ValueError(
                f"{path}: footer payload size {payload_size} is "
                "inconsistent with the file size"
            )
        fh.seek(size - 12 - payload_size)
        payload = fh.read(payload_size)
        # the footer opens with its own magic, right before the payload
        fh.seek(size - 12 - payload_size - 4)
        if fh.read(4) != MAGIC:
            raise ValueError(f"{path}: bad Puffin footer magic")
    return json.loads(payload.decode("utf-8"))


def puffin_footer_size(path: str) -> int:
    """Byte length of the file's Footer struct (footer magic +
    payload + payload_size + flags + tail magic = payload + 16) —
    what the Iceberg table-metadata statistics entry's required
    ``footer-size-in-bytes`` field records, letting a reader fetch
    the whole footer in one ranged read. Validates the framing the
    same way :func:`read_puffin_footer` does."""
    size = os.path.getsize(path)
    read_puffin_footer(path)  # full magic/bounds validation
    with open(path, "rb") as fh:
        fh.seek(size - 12)
        payload_size = struct.unpack("<i", fh.read(4))[0]
    return payload_size + 16


def read_puffin_blob(path: str, blob_meta: dict) -> bytes:
    """The raw payload bytes of one blob (offset/length from its
    metadata entry) — sketch merging, not needed for ndv."""
    with open(path, "rb") as fh:
        fh.seek(int(blob_meta["offset"]))
        return fh.read(int(blob_meta["length"]))


#: blob types whose ``ndv`` property this engine consumes: the spec's
#: standardized theta sketches, plus the engine's own ANALYZE output
#: (an honest custom type — writing fake bytes under the theta type
#: would corrupt a foreign engine's sketch merges; Puffin explicitly
#: allows engine-specific blob types, which unknown readers skip)
NDV_BLOB_TYPES = ("apache-datasketches-theta-v1", "census-asc5-ndv-v1")


#: java Long.MAX_VALUE — theta sketches express theta as a fraction
#: of it (theta_long / LONG_MAX = the sampling probability)
_THETA_LONG_MAX = (1 << 63) - 1
_THETA_FLAG_EMPTY = 0x04


def theta_ndv(blob: bytes) -> int:
    """Distinct-count estimate from a serialized COMPACT theta sketch
    (r16, r15 verdict #6 — the Apache DataSketches
    ``apache-datasketches-theta-v1`` wire format, serial version 3,
    public spec): ``estimate = retained_entries / theta``. Enough of
    the preamble is parsed to cover every compact layout a foreign
    ANALYZE writes —

    - 8-byte EMPTY preamble (1 preamble long, empty flag) → 0;
    - 16-byte SINGLE-ITEM form (1 preamble long + one hash) → 1;
    - exact-mode compact (2 preamble longs: entry count + p; theta
      implicitly 1.0) → the entry count;
    - estimation-mode compact (3 preamble longs: + theta as a
      fraction of Long.MAX) → count / theta, rounded.

    The hash values themselves never need decoding for an estimate —
    they exist for cross-sketch set operations. Raises ValueError on
    non-theta / non-v3 / big-endian payloads (never guesses)."""
    if len(blob) < 8:
        raise ValueError(f"theta sketch too short ({len(blob)} bytes)")
    pre_longs = blob[0] & 0x3F
    ser_ver = blob[1]
    family = blob[2]
    flags = blob[5]
    if ser_ver != 3:
        raise ValueError(f"theta sketch serial version {ser_ver} != 3")
    if family != 3:
        raise ValueError(
            f"sketch family {family} is not COMPACT theta (3)"
        )
    if flags & 0x01:
        raise ValueError("big-endian theta sketch is out of scope")
    if flags & _THETA_FLAG_EMPTY:
        return 0
    if pre_longs == 1:
        # single-item form: preamble long + exactly one hash value
        if len(blob) >= 16:
            return 1
        raise ValueError("non-empty 1-preamble sketch without an item")
    if pre_longs not in (2, 3):
        raise ValueError(f"theta preamble longs {pre_longs} not in 1-3")
    cur_count = struct.unpack_from("<i", blob, 8)[0]
    if pre_longs == 2:
        return int(cur_count)  # exact mode: theta == 1.0
    theta_long = struct.unpack_from("<q", blob, 16)[0]
    if theta_long <= 0:
        raise ValueError(f"non-positive theta {theta_long}")
    return int(round(cur_count * _THETA_LONG_MAX / theta_long))


def puffin_ndv(path: str) -> dict[int, int]:
    """field-id → ndv from a Puffin file's distinct-count blobs
    (:data:`NDV_BLOB_TYPES`): the spec-required ``ndv`` property when
    present, else (r16) the REAL theta-sketch decode of the blob
    payload — foreign writers that skip the property still feed the
    CBO. Multi-field sketches (distinct over a tuple) are skipped — a
    tuple ndv is not a per-column ndv; undecodable payloads are
    skipped too (an absent estimate beats a fabricated one)."""
    out: dict[int, int] = {}
    for blob in read_puffin_footer(path).get("blobs", []):
        if blob.get("type") not in NDV_BLOB_TYPES:
            continue
        fields = blob.get("fields") or []
        if len(fields) != 1:
            continue
        ndv = (blob.get("properties") or {}).get("ndv")
        if ndv is not None:
            out[int(fields[0])] = int(ndv)
        elif blob.get("type") == "apache-datasketches-theta-v1":
            try:
                out[int(fields[0])] = theta_ndv(
                    read_puffin_blob(path, blob)
                )
            except (ValueError, KeyError, struct.error):
                continue
    return out
