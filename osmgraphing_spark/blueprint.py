"""Lower a reference-shaped YAML config (blueprint.yaml dialect) to this
engine's ``JobConfig`` fields.

The reference's front-end is a three-stage Raw → Proto → Config lowering of
a YAML job file (/root/reference/src/configs/parsing/mod.rs:86-142, schema
documented in resources/blueprint.yaml). This module is the migration path
for a reference user: feed the SAME file shape —

    parsing:
      map-file: '...'
      edges:
        will_normalize_metrics_by_mean: false
        data:
        - metric: { unit: 'Meters', id: 'meters' }
      generating:
        edges:
        - convert: { from: {unit: 'Meters', id: 'meters'},
                     to:   {unit: 'Kilometers', id: 'kilometers'} }
        - calc: { result: {unit: 'Hours', id: 'hours'},
                  a: {unit: 'Kilometers', id: 'kilometers'},
                  b: {unit: 'KilometersPerHour', id: 'kmph'} }
        - custom: { unit: 'F64', id: 'x', default: 2.0 }

— and get back ``JobConfig`` kwargs plus explicit warnings for everything
that does not transfer 1:1. Semantic deltas (all surfaced as warnings, never
silent):

- ``map-file`` must point at a parquet corpus table (repo, path, commit,
  lang, content) — this engine's input — not an .fmi/.pbf graph file.
- ``parsing.edges.data`` metric declarations: the corpus extractor parses
  exactly ONE metric (the annotated edge weight), so the FIRST declared
  metric id names ``metrics[0]``; further declared metrics must be produced
  by ``generating`` specs instead (warned).
- reference ``convert`` replaces the source metric in place; this engine
  APPENDS the converted metric (the source column stays — warned). ``copy``
  (out-of-place convert) is exact.
- ``haversine`` needs node coordinates, which a source-code link graph does
  not have → hard error.
- ``merge`` (CSV metric overwrite) is the balancer's I/O step
  (``operators/balance.merge_metric_csv``), not a derived-column expression
  → hard error pointing there.
- ``meta`` entries and ``'ignored'`` are schema registrations, not computed
  metrics → skipped.
- ``vehicles`` / ``writing`` / ``balancing`` / ``routing`` sections have no
  batch-CLI equivalent here → warned and ignored.
"""

from __future__ import annotations

import re

_CAMEL_RE = re.compile(r"(?<!^)(?=[A-Z])")


def _unit(name: str) -> str:
    """'KilometersPerHour' → 'kilometers_per_hour' (the functions/units
    vocabulary); already-lowered names pass through."""
    if name.lower() == "lanecount":
        return "lanecount"
    return _CAMEL_RE.sub("_", name).lower()


def _lower_generating(
    entries: list, warnings: list[str], allow_haversine: bool = False
) -> list[dict]:
    specs: list[dict] = []
    for e in entries or []:
        if e == "ignored" or e is None:
            continue
        if not isinstance(e, dict) or len(e) != 1:
            raise ValueError(f"malformed generating entry: {e!r}")
        (kind, body), = e.items()
        if kind == "meta":
            continue  # id registration only — nothing to compute
        if kind == "haversine":
            if allow_haversine:
                # graph-file inputs (pbf) carry node coordinates; the CLI
                # materializes this via sources.pbf.pbf_graph(with_haversine)
                specs.append({"op": "haversine", "name": body["id"]})
                continue
            raise ValueError(
                "generating: haversine requires node lat/lon attributes; a "
                "source-code link graph has none (declare the metric via "
                "'custom' or derive it with 'calc' instead)"
            )
        if kind == "merge":
            raise ValueError(
                "generating: merge is the balancer's CSV metric-overwrite "
                "I/O step — use osmgraphing_spark.operators.balance."
                "merge_metric_csv, not a generating spec"
            )
        if kind == "custom":
            specs.append(
                {
                    "op": "constant",
                    "name": body["id"],
                    "value": float(body.get("default", 0.0)),
                }
            )
        elif kind in ("copy", "convert"):
            frm, to = body["from"], body["to"]
            if to["id"] == frm["id"]:
                raise ValueError(
                    f"generating: {kind} to the same id {to['id']!r} — this "
                    "engine appends metrics (no in-place replace); give the "
                    "result a fresh id"
                )
            if kind == "convert":
                warnings.append(
                    f"generating: convert {frm['id']!r}->{to['id']!r} keeps "
                    "the source metric (reference replaces it in place)"
                )
            specs.append(
                {
                    "op": "convert",
                    "name": to["id"],
                    "from": frm["id"],
                    "from_unit": _unit(frm["unit"]),
                    "to_unit": _unit(to["unit"]),
                }
            )
        elif kind == "calc":
            res, a, b = body["result"], body["a"], body["b"]
            specs.append(
                {
                    "op": "calc",
                    "name": res["id"],
                    "a": a["id"],
                    "b": b["id"],
                    "a_unit": _unit(a["unit"]),
                    "b_unit": _unit(b["unit"]),
                    "out_unit": _unit(res["unit"]),
                }
            )
        else:
            raise ValueError(f"unknown generating kind {kind!r}")
    return specs


def lower_blueprint(raw: dict) -> tuple[dict, list[str]]:
    """Reference-shaped config dict → (JobConfig kwargs, warnings)."""
    if "parsing" not in raw:
        raise ValueError("blueprint config must have a 'parsing:' section")
    warnings: list[str] = []
    parsing = raw["parsing"] or {}
    kwargs: dict = {}

    if "map-file" not in parsing:
        raise ValueError("parsing.map-file is required")
    mf = str(parsing["map-file"])
    fmt = (
        "pbf" if mf.endswith(".pbf")
        else "fmi" if mf.endswith(".fmi")
        else "parquet"
    )
    kwargs["corpus"] = mf
    if fmt != "parquet":
        # a reference user's own .fmi/.pbf map-file now ingests directly
        # (sources/fmi.py, sources/pbf.py) instead of erroring
        kwargs["map_format"] = fmt

    veh = parsing.get("vehicles") or {}
    if fmt == "pbf":
        kwargs["vehicle"] = str(veh.get("category", "Car")).lower()
        kwargs["picky"] = bool(veh.get("are_drivers_picky", True))
    elif veh:
        warnings.append(
            "parsing.vehicles only affects pbf street filtering — ignored"
        )
    if fmt == "fmi":
        from .sources.fmi import schemas_from_blueprint

        ns, es = schemas_from_blueprint(raw)
        kwargs["fmi_node_schema"] = [list(t) for t in ns]
        kwargs["fmi_edge_schema"] = [list(t) for t in es]
    elif "nodes" in parsing and fmt == "parquet":
        warnings.append(
            "parsing.nodes declarations are ignored — vertex ids come from "
            "the corpus (repo, path)"
        )
    if "writing" in raw:
        warnings.append("top-level writing: section ignored by the batch CLI")
    bal = raw.get("balancing")
    routing = raw.get("routing") or {}
    if bal:
        # the flagship balancing binary's config → balance_loop kwargs
        # (operators/balance.balance_loop; contraction is in-engine, so the
        # multi-ch-constructor subsection is obsolete here)
        method = (bal.get("optimizing_with") or {}).get("method", "averaging")
        if isinstance(method, dict) and "explicit_euler" in method:
            rule = "explicit_euler"
            correction = float(
                (method["explicit_euler"] or {}).get("correction", 0.1)
            )
        else:
            rule = "averaging"
            correction = 0.1
        bcfg = {
            "rule": rule,
            "correction": correction,
            "num_iter": int(bal.get("number_of_metric-updates", 2)),
            "min_metric": float(bal.get("min_new_metric", 1e-6)),
        }
        if routing.get("route-pairs-file"):
            bcfg["route_pairs"] = routing["route-pairs-file"]
        kwargs["balancing"] = bcfg
        for k in ("multi-ch-constructor", "iter-0-cfg", "iter-i-cfg"):
            if k in bal:
                warnings.append(
                    f"balancing.{k} is obsolete here (contraction runs "
                    "in-engine; iterations share one config)"
                )
    elif routing:
        warnings.append("top-level routing: section ignored by the batch CLI")

    edges = parsing.get("edges") or {}
    if edges.get("will_normalize_metrics_by_mean"):
        kwargs["normalize_metrics"] = True
    declared = [
        d["metric"]["id"]
        for d in (edges.get("data") or [])
        if isinstance(d, dict) and "metric" in d
    ]
    if fmt == "parquet" and declared:
        kwargs["metric_names"] = declared[:1]
        if len(declared) > 1:
            warnings.append(
                f"parsing.edges.data declares {len(declared)} metrics "
                f"{declared}; the corpus extractor parses one (named "
                f"{declared[0]!r} = the annotated edge weight) — produce the "
                "rest via generating: specs"
            )
    elif fmt == "pbf":
        # the reference's pbf preprocess admits only KilometersPerHour /
        # LaneCount as provided metrics (pbf.rs:26-67); everything else
        # must be generated
        bad = [d for d in declared if d not in ("kmph", "lanecount")]
        if bad:
            warnings.append(
                f"pbf provides metrics kmph/lanecount only; declared ids "
                f"{bad} are ignored (generate them instead)"
            )

    gen = parsing.get("generating") or {}
    if gen.get("nodes"):
        warnings.append("parsing.generating.nodes ignored (no node metrics here)")
    specs = _lower_generating(
        gen.get("edges") or [], warnings, allow_haversine=(fmt == "pbf")
    )
    hav = [sp for sp in specs if sp["op"] == "haversine"]
    if hav:
        specs = [sp for sp in specs if sp["op"] != "haversine"]
        kwargs["pbf_haversine"] = True
        if any(sp["name"] != "kilometers" for sp in hav):
            warnings.append(
                "pbf haversine metric is always materialized under the id "
                "'kilometers'"
            )
    if specs:
        kwargs["generating"] = specs
    return kwargs, warnings
