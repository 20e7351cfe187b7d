"""Synthetic .osm.pbf writer (pure python, public OSM PBF wire format).

Purpose: scale evidence for the blob-parallel pbf reader. The reference
benches its parser on Baden-Württemberg (~18 M edges < ~30 s) and
Germany (~106 M edges < 4 min on 8 cores), but the sandbox ships only
the 2.4 MB isle_of_man fixture, whose wall clock is Spark fixed cost,
not decode throughput. This module writes arbitrarily large grid road
networks in the REAL wire format — 4-byte big-endian BlobHeader framing,
zlib-compressed PrimitiveBlocks, delta-encoded DenseNodes, stringtable
Ways — one self-contained blob per grid tile, so `sources.pbf` reader
throughput can be measured at any size (the writer is also the encode
half of the decoder's unit pins).

Format per the public OSM PBF spec (wiki.openstreetmap.org/wiki/PBF_Format);
field numbers mirror sources/pbf.py's decoder:
  BlobHeader: 1=type 3=datasize          Blob: 2=raw_size 3=zlib_data
  PrimitiveBlock: 1=stringtable 2=primitivegroup (granularity 100 default)
  PrimitiveGroup: 2=dense 3=way
  DenseNodes: 1=id(packed sint64 Δ) 8=lat(Δ) 9=lon(Δ)
  Way: 1=id 2=keys(packed) 3=vals(packed) 8=refs(packed sint64 Δ)
"""

from __future__ import annotations

import struct
import zlib


def _varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zz(v: int) -> int:
    """64-bit zigzag; the mask keeps python's arbitrary-precision negative
    shift results inside unsigned range (else the varint loop never ends)."""
    return ((v << 1) ^ (v >> 63)) & (2**64 - 1)


def _field_len(field: int, payload: bytes) -> bytes:
    return _varint(field << 3 | 2) + _varint(len(payload)) + payload


def _field_int(field: int, v: int) -> bytes:
    return _varint(field << 3 | 0) + _varint(v)


def _packed_deltas(field: int, values) -> bytes:
    out = bytearray()
    prev = 0
    for v in values:
        out += _varint(_zz(int(v) - prev))
        prev = int(v)
    return _field_len(field, bytes(out))


def _packed_uints(field: int, values) -> bytes:
    out = bytearray()
    for v in values:
        out += _varint(int(v))
    return _field_len(field, bytes(out))


def _dense_nodes_msg(ids, lats_nano, lons_nano) -> bytes:
    """lat/lon in units of granularity (100 nano-degrees): the decoder
    computes 1e-9 * gran * value."""
    return (
        _packed_deltas(1, ids)
        + _packed_deltas(8, lats_nano)
        + _packed_deltas(9, lons_nano)
    )


def _way_msg(wid: int, key_ids, val_ids, refs) -> bytes:
    return (
        _field_int(1, wid)
        + _packed_uints(2, key_ids)
        + _packed_uints(3, val_ids)
        + _packed_deltas(8, refs)
    )


def _primitive_block(strings: list[bytes], groups: list[bytes]) -> bytes:
    st = b"".join(_field_len(1, s) for s in strings)
    return _field_len(1, st) + b"".join(_field_len(2, g) for g in groups)


def _frame(btype: str, payload: bytes, compress: bool = True) -> bytes:
    if compress:
        blob = _field_int(2, len(payload)) + _field_len(3, zlib.compress(payload, 6))
    else:
        blob = _field_len(1, payload)
    header = _field_len(1, btype.encode()) + _field_int(3, len(blob))
    return struct.pack(">i", len(header)) + header + blob


#: stringtable layout shared by every synthetic block (index 0 MUST be
#: the empty string per the spec)
_STRINGS = [b"", b"highway", b"residential", b"secondary", b"oneway", b"yes"]
_K_HIGHWAY, _V_RESIDENTIAL, _V_SECONDARY, _K_ONEWAY, _V_YES = 1, 2, 3, 4, 5


def write_grid_pbf(
    path: str,
    nx: int,
    ny: int,
    tile: int = 256,
    origin: tuple[float, float] = (47.0, 8.0),
    spacing_deg: float = 0.001,
) -> dict:
    """Write a nx×ny grid road network → {"nodes": n, "ways": n,
    "directed_edges": n (post direction-explosion, pre-dedup)}.

    Grid point (x, y) has node id ``y*nx + x + 1``. Every horizontal and
    vertical row is cut into ways of ≤ 16 refs; every 7th way is
    ``highway=secondary`` (different default speed) and every 11th is
    ``oneway=yes`` — enough tag variety to exercise the classifier and
    direction explosion. One blob per ``tile``×``tile`` node tile, with
    that tile's nodes and the ways whose FIRST ref falls inside it
    (refs may cross tile borders; the reader joins refs to nodes
    globally, so blobs stay self-contained for DECODE, which is the
    parallel step)."""
    gran_units = int(spacing_deg * 1e9) // 100  # granularity-100 units
    lat0 = int(origin[0] * 1e9) // 100
    lon0 = int(origin[1] * 1e9) // 100

    def node_id(x: int, y: int) -> int:
        return y * nx + x + 1

    n_ways = 0
    n_dir_edges = 0
    way_counter = 0
    with open(path, "wb") as f:
        f.write(_frame("OSMHeader", b"", compress=False))
        for ty in range(0, ny, tile):
            for tx in range(0, nx, tile):
                xe, ye = min(tx + tile, nx), min(ty + tile, ny)
                ids, lats, lons = [], [], []
                for y in range(ty, ye):
                    for x in range(tx, xe):
                        ids.append(node_id(x, y))
                        # deterministic coordinate jitter: a perfectly
                        # regular grid delta-compresses to ~nothing, which
                        # would make decode throughput look free per byte;
                        # real OSM deltas are irregular
                        h = (x * 2654435761 ^ y * 40503) & 0xFFFF
                        lats.append(lat0 + y * gran_units + (h % 181) - 90)
                        lons.append(lon0 + x * gran_units + (h // 181) % 181 - 90)
                groups = [_field_len(2, _dense_nodes_msg(ids, lats, lons))]
                ways = bytearray()

                def emit_way(refs):
                    nonlocal way_counter, n_ways, n_dir_edges, ways
                    way_counter += 1
                    kv = [(
                        _K_HIGHWAY,
                        _V_SECONDARY if way_counter % 7 == 0 else _V_RESIDENTIAL,
                    )]
                    if way_counter % 11 == 0:
                        kv.append((_K_ONEWAY, _V_YES))
                    ways += _field_len(
                        3,
                        _way_msg(
                            way_counter,
                            [k for k, _ in kv],
                            [v for _, v in kv],
                            refs,
                        ),
                    )
                    n_ways += 1
                    segs = len(refs) - 1
                    n_dir_edges += segs if way_counter % 11 == 0 else 2 * segs

                # horizontal ways: this tile's row span, extended one
                # column past the tile edge (when a next tile exists) so
                # consecutive tiles stitch through the shared segment
                for y in range(ty, ye):
                    last = xe - 1 if xe == nx else xe
                    x = tx
                    while x < last:
                        stop = min(x + 15, last)
                        emit_way([node_id(i, y) for i in range(x, stop + 1)])
                        x = stop
                # vertical ways: same, one row past the tile edge
                for x in range(tx, xe):
                    last = ye - 1 if ye == ny else ye
                    y = ty
                    while y < last:
                        stop = min(y + 15, last)
                        emit_way([node_id(x, j) for j in range(y, stop + 1)])
                        y = stop
                if ways:
                    # a PrimitiveGroup whose content is the repeated
                    # field-3 Way messages (field 2 would be DenseNodes)
                    groups.append(bytes(ways))
                f.write(_frame("OSMData", _primitive_block(_STRINGS, groups)))
    return {
        "nodes": nx * ny,
        "ways": n_ways,
        "directed_edges": n_dir_edges,
    }
