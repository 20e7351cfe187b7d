"""Unit system: logical units on metric columns + total conversion matrix.

Re-expression of the reference's ``UnitInfo`` enum and ``try_convert``
(/root/reference/src/configs/parsing/edges/metrics.rs:51-175): units are
*logical types* carried in the schema metadata, conversion is pure column
arithmetic (a multiply — JVM-side, codegen'd), and impossible conversions
fail at plan time, not at run time.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# canonical base per dimension: meters, seconds, kmph→(km/h base), count, f64
_BASE_FACTOR: dict[str, tuple[str, float]] = {
    "meters": ("length", 1.0),
    "kilometers": ("length", 1000.0),
    "seconds": ("duration", 1.0),
    "minutes": ("duration", 60.0),
    "hours": ("duration", 3600.0),
    "kilometers_per_hour": ("speed", 1.0),
    "lane_count": ("count", 1.0),
    "f64": ("raw", 1.0),
}


class UnitConversionError(ValueError):
    pass


def conversion_factor(src: str, dst: str) -> float:
    """Multiplicative factor src → dst; raises on cross-dimension requests
    (the reference errors the same way, metrics.rs:93-175). Any unit
    converts to 'f64' (drop the unit, keep the number)."""
    if src not in _BASE_FACTOR or dst not in _BASE_FACTOR:
        raise UnitConversionError(f"unknown unit: {src!r} or {dst!r}")
    if src == dst or dst == "f64":  # f64 = drop the unit, keep the number
        return 1.0
    sdim, sfac = _BASE_FACTOR[src]
    ddim, dfac = _BASE_FACTOR[dst]
    if sdim != ddim:
        raise UnitConversionError(f"cannot convert {src} → {dst}")
    return sfac / dfac


def convert(col: Column, src: str, dst: str) -> Column:
    f = conversion_factor(src, dst)
    return col if f == 1.0 else col * F.lit(f)


def derive(numerator: Column, num_unit: str, denominator: Column, den_unit: str, out_unit: str) -> Column:
    """The reference's ``Calc`` generator (building.rs:1283-1318): e.g.
    hours = kilometers / kilometers_per_hour. Supported shapes:
    length/speed→duration, length/duration→speed."""
    ndim = _BASE_FACTOR[num_unit][0]
    ddim = _BASE_FACTOR[den_unit][0]
    odim = _BASE_FACTOR[out_unit][0]
    if (ndim, ddim, odim) == ("length", "speed", "duration"):
        km = convert(numerator, num_unit, "kilometers")
        kmph = denominator  # speed base is km/h
        return convert(km / kmph, "hours", out_unit)
    if (ndim, ddim, odim) == ("length", "duration", "speed"):
        km = convert(numerator, num_unit, "kilometers")
        h = convert(denominator, den_unit, "hours")
        return km / h
    raise UnitConversionError(
        f"unsupported derivation {num_unit}/{den_unit} → {out_unit}"
    )
