"""Geo functions (reference src/common/function/src/scalars/geo/).

- geohash encode/decode: pure bit interleaving — column arithmetic, no UDF.
- st_distance (measure.rs): haversine great-circle distance in meters.
- geo_path aggregate (aggrs/geo/geo_path.rs): per-entity ordered trajectory.
- H3 / S2 cell functions need their C libraries (not in this container) —
  exposed as stubs that raise with installation guidance, matching the
  brief's gate-behind-import policy.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def geohash(lat, lng, precision: int = 9) -> Column:
    """Geohash of (lat, lng) at the given precision (geo/geohash.rs).

    Bit-interleaving via fixed-point integer arithmetic: k-th longitude bit =
    floor((lng+180)/360 * 2^k) & 1 — closed form, so the whole hash is one
    column expression (no iterative state, no UDF)."""
    lat_c, lng_c = _c(lat).cast("double"), _c(lng).cast("double")
    nbits = precision * 5
    n_lng = (nbits + 1) // 2
    n_lat = nbits // 2
    # fixed-point fractions in [0, 2^32)
    fx = ((lng_c + 180.0) / 360.0 * F.lit(float(2 ** 32))).cast("long")
    fy = ((lat_c + 90.0) / 180.0 * F.lit(float(2 ** 32))).cast("long")

    def bit(frac: Column, k: int) -> Column:
        # k-th subdivision bit (k starts at 1): bit (32-k) of the fraction
        return F.shiftright(frac, 32 - k).bitwiseAND(F.lit(1))

    chars = []
    lng_i = lat_i = 0
    bits: list[Column] = []
    for i in range(nbits):
        if i % 2 == 0:
            lng_i += 1
            bits.append(bit(fx, lng_i))
        else:
            lat_i += 1
            bits.append(bit(fy, lat_i))
    for c in range(precision):
        v = F.lit(0)
        for j in range(5):
            v = v * 2 + bits[c * 5 + j]
        chars.append(F.element_at(F.lit(list(_BASE32)), (v + 1).cast("int")))
    return F.concat(*chars)


def st_distance(lat1, lng1, lat2, lng2) -> Column:
    """Haversine great-circle distance in meters (geo/measure.rs st_distance)."""
    rlat1, rlng1 = F.radians(_c(lat1)), F.radians(_c(lng1))
    rlat2, rlng2 = F.radians(_c(lat2)), F.radians(_c(lng2))
    dlat = rlat2 - rlat1
    dlng = rlng2 - rlng1
    a = F.sin(dlat / 2) ** 2 + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlng / 2) ** 2
    return 6371008.8 * 2 * F.asin(F.sqrt(a))


def geo_path(lat, lng, ts) -> Column:
    """Aggregate: time-ordered trajectory as array<struct<ts,lat,lng>>
    (aggrs/geo/geo_path.rs:31). Use inside groupBy().agg()."""
    return F.sort_array(F.collect_list(F.struct(_c(ts).alias("ts"),
                                                _c(lat).alias("lat"),
                                                _c(lng).alias("lng"))))


def json_encode_path(lat, lng, ts) -> Column:
    """Trajectory as a JSON [[lng,lat],...] string (encoding.rs:31 —
    note the reference emits lng-first GeoJSON-style pairs)."""
    return F.to_json(
        F.transform(
            geo_path(lat, lng, ts),
            lambda s: F.array(s["lng"], s["lat"]),
        )
    )


_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _geohash_py(lat: float, lon: float, precision: int) -> str:
    """Standard geohash base32 encoding (public algorithm; reference
    geo/geohash.rs delegates to the geohash crate)."""
    if precision < 1 or precision > 12:
        raise ValueError(f"geohash precision {precision} out of range [1,12]")
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    bits = []
    even = True
    while len(bits) < precision * 5:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                bits.append(1)
                lon_lo = mid
            else:
                bits.append(0)
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                bits.append(1)
                lat_lo = mid
            else:
                bits.append(0)
                lat_hi = mid
        even = not even
    out = []
    for i in range(precision):
        v = 0
        for b in bits[i * 5:i * 5 + 5]:
            v = v * 2 + b
        out.append(_B32[v])
    return "".join(out)


def register(spark) -> None:
    import pandas as pd
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    @pandas_udf("string", PandasUDFType.SCALAR)
    def _geohash(lat, lon, prec):
        out = []
        for la, lo, p in zip(lat, lon, prec):
            if None in (la, lo, p):
                out.append(None)
            else:
                out.append(_geohash_py(float(la), float(lo), int(p)))
        return pd.Series(out, dtype=object)

    spark.udf.register("geohash", _geohash)


def _h3_stub(*_args, **_kwargs):
    raise NotImplementedError(
        "H3 cell functions need the 'h3' package (not in this container); "
        "pip install h3 and wrap h3.latlng_to_cell in a pandas UDF"
    )


h3_latlng_to_cell = _h3_stub
h3_cell_to_parent = _h3_stub
s2_latlng_to_cell = _h3_stub
