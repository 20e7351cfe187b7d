"""Synthetic pbf writer (sources/pbf_synth) round-trips through the real
decoder (sources/pbf): wire framing, DenseNodes deltas, stringtable ways,
tag variety, and the self-contained-blob tiling the reader parallelizes
over."""

from __future__ import annotations

from osmgraphing_spark.sources import pbf, pbf_synth


def test_grid_pbf_roundtrip_through_decoder(tmp_path):
    path = str(tmp_path / "grid.osm.pbf")
    meta = pbf_synth.write_grid_pbf(path, 40, 30, tile=16)
    idx = pbf.blob_index(path)
    assert idx[0][2] == "OSMHeader"
    assert all(t == "OSMData" for _, _, t in idx[1:])
    assert len(idx) > 4  # really tiled into multiple blobs

    nodes = {}
    n_ways = n_edges = 0
    ref_ids = set()
    tag_kinds = set()
    for off, size, t in idx:
        if t != "OSMData":
            continue
        data = pbf._read_blob(path, off, size)
        strings, groups, gran, lato, lono = pbf._decode_block(data)
        for g in groups:
            for ids, lat, lon in pbf._dense_nodes(g, gran, lato, lono):
                for i, la, lo in zip(ids, lat, lon):
                    nodes[int(i)] = (round(float(la), 7), round(float(lo), 7))
            for _wid, tags, refs in pbf._ways(g, strings):
                n_ways += 1
                tag_kinds.add((tags["highway"], tags.get("oneway")))
                ref_ids.update(int(r) for r in refs)
                n_edges += len(list(pbf.way_to_edges(tags, refs, "car", True)))
    assert len(nodes) == meta["nodes"]
    assert n_ways == meta["ways"]
    assert n_edges == meta["directed_edges"]
    assert ref_ids <= set(nodes)  # no dangling refs
    assert len(ref_ids) == meta["nodes"]  # grid fully connected
    # tag variety: both categories and the oneway explosion exercised
    assert ("residential", None) in tag_kinds
    assert any(h == "secondary" for h, _ in tag_kinds)
    assert any(ow == "yes" for _, ow in tag_kinds)
    # origin pinning (± the deterministic anti-compressibility jitter,
    # which is bounded by 90 granularity units = 9e-6 deg)
    for nid, (la, lo) in ((1, (47.0, 8.0)), (2, (47.0, 8.001)), (41, (47.001, 8.0))):
        assert abs(nodes[nid][0] - la) < 1e-5
        assert abs(nodes[nid][1] - lo) < 1e-5
    # jitter is real: not every delta is the grid constant
    assert len({round(nodes[i + 1][1] - nodes[i][1], 9) for i in range(2, 30)}) > 1
