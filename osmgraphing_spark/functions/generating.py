"""Config-declared derived-metric pipeline — the reference's ``generating:``
config section re-expressed over the metric vector.

The reference dispatches a YAML-declared vocabulary of derived columns at
graph finalize (/root/reference/src/network/graph/building.rs:890-1395;
vocabulary in resources/blueprint.yaml:64-117: meters-from-coords, copy,
convert, calc, custom constants). Here each spec is a JSON dict compiled to
pure column arithmetic appended to the ``metrics array<double>`` column —
JVM whole-stage codegen, zero shuffle (withColumn is narrow; the edge
table's resting hash(src) layout survives untouched).

Spec vocabulary::

    {"op": "copy",     "name": "b",      "from": "a"}
    {"op": "constant", "name": "x",      "value": 2.5}
    {"op": "convert",  "name": "len_km", "from": "len_m",
     "from_unit": "meters", "to_unit": "kilometers"}
    {"op": "calc",     "name": "dur_h",  "a": "len_km", "b": "speed",
     "kind": "quotient" | "product"}                 # raw arithmetic
    {"op": "calc",     "name": "dur_s",  "a": "len_m", "b": "speed",
     "a_unit": "meters", "b_unit": "kilometers_per_hour",
     "out_unit": "seconds"}                          # unit-aware (units.derive)

Later specs can reference earlier specs' names (the reference resolves its
generating list in order the same way).
"""

from __future__ import annotations

from dataclasses import replace

from pyspark.sql import functions as F

from ..operators.build import Graph
from . import units


def _mcol(names: list[str], name: str):
    if name not in names:
        raise ValueError(f"unknown metric {name!r} (have {names})")
    return F.element_at(F.col("metrics"), names.index(name) + 1)


def compile_spec(names: list[str], spec: dict):
    """One generating spec → a Column over the current metric vector."""
    op = spec["op"]
    if op == "copy":
        return _mcol(names, spec["from"])
    if op == "constant":
        return F.lit(float(spec["value"]))
    if op == "convert":
        return units.convert(
            _mcol(names, spec["from"]), spec["from_unit"], spec["to_unit"]
        )
    if op == "calc":
        a = _mcol(names, spec["a"])
        b = _mcol(names, spec["b"])
        if "out_unit" in spec:
            return units.derive(a, spec["a_unit"], b, spec["b_unit"], spec["out_unit"])
        if spec.get("kind", "quotient") == "product":
            return a * b
        return a / b
    raise ValueError(f"unknown generating op {op!r}")


def apply_generating(graph: Graph, specs: list[dict]) -> Graph:
    """→ new Graph whose metric vector carries the derived columns appended
    in spec order (metric_names extended to match)."""
    if not graph.metric_names:
        raise ValueError("generating requires a multi-metric graph (metric_names set)")
    names = list(graph.metric_names)
    edges = graph.edges
    for spec in specs:
        name = spec["name"]
        if name in names:
            raise ValueError(f"duplicate metric name {name!r}")
        col = compile_spec(names, spec)
        edges = edges.withColumn(
            "metrics", F.concat(F.col("metrics"), F.array(col.cast("double")))
        )
        names.append(name)
    return replace(graph, edges=edges, metric_names=names)
