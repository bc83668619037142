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
    """Haversine great-circle distance in meters over lat/lng columns — the
    DataFrame-API analog of geo/measure.rs st_distance_sphere_m (the SQL
    st_distance over WKT strings is euclidean degrees; see _st_distance)."""
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


def _geohash_decode_cell(h: str) -> tuple[float, float, float, float]:
    """Center lat/lng and cell height/width of a geohash cell."""
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    even = True
    for ch in h:
        v = _B32.index(ch)
        for bit in (16, 8, 4, 2, 1):
            b = v & bit
            if even:
                mid = (lon_lo + lon_hi) / 2
                if b:
                    lon_lo = mid
                else:
                    lon_hi = mid
            else:
                mid = (lat_lo + lat_hi) / 2
                if b:
                    lat_lo = mid
                else:
                    lat_hi = mid
            even = not even
    return ((lat_lo + lat_hi) / 2, (lon_lo + lon_hi) / 2,
            lat_hi - lat_lo, lon_hi - lon_lo)


def _geohash_neighbours(lat: float, lon: float, precision: int) -> list[str]:
    """The 8 neighbours of the cell containing (lat, lon), ordered
    n, nw, w, sw, s, se, e, ne (geohash.rs:230-239)."""
    center = _geohash_py(lat, lon, precision)
    clat, clon, dlat, dlon = _geohash_decode_cell(center)

    def enc(dy: int, dx: int) -> str:
        nlat = clat + dy * dlat
        nlon = clon + dx * dlon
        if nlon > 180.0:
            nlon -= 360.0
        elif nlon < -180.0:
            nlon += 360.0
        return _geohash_py(nlat, nlon, precision)

    return [enc(1, 0), enc(1, -1), enc(0, -1), enc(-1, -1),
            enc(-1, 0), enc(-1, 1), enc(0, 1), enc(1, 1)]


# -- S2 cell ids (public S2 geometry algorithm: face + quadratic ST
#    projection + Hilbert curve position; reference geo/s2.rs via the s2
#    crate). The Hilbert lookup tables are generated from the 4-entry
#    first-order axioms, so no external data is needed. --------------------

_S2_MAX_LEVEL = 30
_S2_LOOKUP_BITS = 4
_S2_SWAP = 1
_S2_INVERT = 2
_S2_POS_TO_IJ = [[0, 1, 3, 2], [0, 2, 3, 1], [3, 2, 0, 1], [3, 1, 0, 2]]
_S2_POS_TO_ORIENT = [_S2_SWAP, 0, 0, _S2_INVERT | _S2_SWAP]
_S2_LOOKUP_POS = [0] * (1 << (2 * _S2_LOOKUP_BITS + 2))


def _s2_init_lookup(level, i, j, orig_orient, pos, orient):
    if level == _S2_LOOKUP_BITS:
        ij = (i << _S2_LOOKUP_BITS) + j
        _S2_LOOKUP_POS[(ij << 2) + orig_orient] = (pos << 2) + orient
        return
    level += 1
    i <<= 1
    j <<= 1
    pos <<= 2
    r = _S2_POS_TO_IJ[orient]
    for idx in range(4):
        ij = r[idx]
        _s2_init_lookup(level, i + (ij >> 1), j + (ij & 1), orig_orient,
                        pos + idx, orient ^ _S2_POS_TO_ORIENT[idx])


for _o in range(4):
    _s2_init_lookup(0, 0, 0, _o, 0, _o)


def _s2_latlng_to_cell(lat_deg: float, lng_deg: float) -> int:
    import math

    phi, theta = math.radians(lat_deg), math.radians(lng_deg)
    p = (math.cos(phi) * math.cos(theta),
         math.cos(phi) * math.sin(theta),
         math.sin(phi))
    face = max(range(3), key=lambda a: abs(p[a]))
    if p[face] < 0:
        face += 3
    # face → (u, v) gnomonic coordinates (s2sphere valid_face_xyz_to_uv)
    x, y, z = p
    u, v = {
        0: (y / x, z / x),
        1: (-x / y, z / y),
        2: (-x / z, -y / z),
        3: (z / x, y / x),
        4: (z / y, -x / y),
        5: (-y / z, -x / z),
    }[face]

    def st(w: float) -> float:
        # quadratic projection (s2 C++ S2::UVtoST)
        return (0.5 * math.sqrt(1 + 3 * w) if w >= 0
                else 1 - 0.5 * math.sqrt(1 - 3 * w))

    limit = 1 << _S2_MAX_LEVEL
    i = min(limit - 1, max(0, int(math.floor(st(u) * limit))))
    j = min(limit - 1, max(0, int(math.floor(st(v) * limit))))

    n = face << (2 * _S2_MAX_LEVEL + 1 - 1)  # 61-bit position space
    bits = face & _S2_SWAP
    mask = (1 << _S2_LOOKUP_BITS) - 1
    for k in range(7, -1, -1):
        bits += ((i >> (k * _S2_LOOKUP_BITS)) & mask) << (_S2_LOOKUP_BITS + 2)
        bits += ((j >> (k * _S2_LOOKUP_BITS)) & mask) << 2
        bits = _S2_LOOKUP_POS[bits]
        n |= (bits >> 2) << (k * 2 * _S2_LOOKUP_BITS)
        bits &= _S2_SWAP | _S2_INVERT
    return (n * 2 + 1) & 0xFFFFFFFFFFFFFFFF


def _s2_from_any(v) -> int:
    if isinstance(v, str):
        return int(v.strip(), 16)
    return int(v) & 0xFFFFFFFFFFFFFFFF


def _s2_level(cell: int) -> int:
    if cell == 0:
        raise ValueError("invalid s2 cell")
    lsb = cell & (-cell & 0xFFFFFFFFFFFFFFFF)
    return _S2_MAX_LEVEL - (lsb.bit_length() - 1) // 2


def _s2_parent(cell: int, level: int) -> int:
    if not 0 <= level <= _s2_level(cell):
        raise ValueError("s2 parent level out of range")
    new_lsb = 1 << (2 * (_S2_MAX_LEVEL - level))
    return ((cell & (-new_lsb & 0xFFFFFFFFFFFFFFFF)) | new_lsb) & 0xFFFFFFFFFFFFFFFF


def _s2_token(cell: int) -> str:
    return format(cell, "016x").rstrip("0") or "X"


# -- WKT geometry (reference geo/measure.rs + relation.rs via the geo crate;
#    st_distance is EUCLIDEAN DEGREES over WKT geometries, the great-circle
#    variant is st_distance_sphere_m) ----------------------------------------

import math as _math
import re as _re


def _wkt_parse(s: str):
    s = s.strip()
    m = _re.match(r"(?is)^POINT\s*\(\s*([-\d.eE+]+)\s+([-\d.eE+]+)\s*\)$", s)
    if m:
        return ("point", (float(m.group(1)), float(m.group(2))))
    m = _re.match(r"(?is)^POLYGON\s*\((.*)\)$", s)
    if m:
        rings = []
        for rm in _re.finditer(r"\(([^()]*)\)", m.group(1)):
            ring = []
            for pt in rm.group(1).split(","):
                x, y = pt.split()
                ring.append((float(x), float(y)))
            rings.append(ring)
        return ("polygon", rings)
    m = _re.match(r"(?is)^LINESTRING\s*\(([^()]*)\)$", s)
    if m:
        pts = [tuple(map(float, p.split())) for p in m.group(1).split(",")]
        return ("linestring", pts)
    raise ValueError(f"unsupported WKT: {s[:40]}")


def _seg_dist(p, a, b) -> float:
    ax, ay = a
    bx, by = b
    px, py = p
    dx, dy = bx - ax, by - ay
    if dx == 0.0 and dy == 0.0:
        return _math.hypot(px - ax, py - ay)
    t = max(0.0, min(1.0, ((px - ax) * dx + (py - ay) * dy) / (dx * dx + dy * dy)))
    return _math.hypot(px - (ax + t * dx), py - (ay + t * dy))


def _ring_segments(ring):
    return list(zip(ring, ring[1:]))


def _point_in_ring(p, ring) -> bool:
    # even-odd ray cast
    x, y = p
    inside = False
    for (x1, y1), (x2, y2) in _ring_segments(ring):
        if (y1 > y) != (y2 > y):
            xin = x1 + (y - y1) * (x2 - x1) / (y2 - y1)
            if x < xin:
                inside = not inside
    return inside


def _point_in_polygon(p, rings) -> bool:
    if not rings or not _point_in_ring(p, rings[0]):
        return False
    return not any(_point_in_ring(p, hole) for hole in rings[1:])


def _segs_intersect(a, b, c, d) -> bool:
    def orient(p, q, r):
        v = (q[0] - p[0]) * (r[1] - p[1]) - (q[1] - p[1]) * (r[0] - p[0])
        return 0 if v == 0 else (1 if v > 0 else -1)

    o1, o2 = orient(a, b, c), orient(a, b, d)
    o3, o4 = orient(c, d, a), orient(c, d, b)
    if o1 != o2 and o3 != o4:
        return True

    def on_seg(p, q, r):
        return (min(p[0], q[0]) <= r[0] <= max(p[0], q[0])
                and min(p[1], q[1]) <= r[1] <= max(p[1], q[1]))

    return ((o1 == 0 and on_seg(a, b, c)) or (o2 == 0 and on_seg(a, b, d))
            or (o3 == 0 and on_seg(c, d, a)) or (o4 == 0 and on_seg(c, d, b)))


def _geom_segments(g):
    kind, data = g
    if kind == "polygon":
        return [s for ring in data for s in _ring_segments(ring)]
    if kind == "linestring":
        return _ring_segments(data)
    return []


def _st_distance(w1: str, w2: str) -> float:
    """Euclidean distance in degrees (measure.rs:33-84, geo crate
    Euclidean::distance)."""
    g1, g2 = _wkt_parse(w1), _wkt_parse(w2)
    if g1[0] != "point" and g2[0] == "point":
        g1, g2 = g2, g1
    if g1[0] == "point" and g2[0] == "point":
        return _math.hypot(g2[1][0] - g1[1][0], g2[1][1] - g1[1][1])
    if g1[0] == "point":
        if g2[0] == "polygon" and _point_in_polygon(g1[1], g2[1]):
            return 0.0
        return min(_seg_dist(g1[1], a, b) for a, b in _geom_segments(g2))
    if _st_intersects(w1, w2):
        return 0.0
    return min(_seg_dist(p, a, b)
               for g, h in ((g1, g2), (g2, g1))
               for seg in _geom_segments(g) for p in seg
               for a, b in _geom_segments(h))


def _st_distance_sphere_m(w1: str, w2: str) -> float:
    """Haversine great-circle meters between two WKT points
    (measure.rs:96-153; geo crate computes deltas in degree space)."""
    g1, g2 = _wkt_parse(w1), _wkt_parse(w2)
    if g1[0] != "point" or g2[0] != "point":
        raise ValueError("Great circle distance between non-point objects "
                         "are not supported for now.")
    (x1, y1), (x2, y2) = g1[1], g2[1]
    t1, t2 = _math.radians(y1), _math.radians(y2)
    dt, dl = _math.radians(y2 - y1), _math.radians(x2 - x1)
    a = (_math.sin(dt / 2) ** 2
         + _math.cos(t1) * _math.cos(t2) * _math.sin(dl / 2) ** 2)
    return 6371008.8 * 2 * _math.asin(_math.sqrt(a))


def _ring_area2(ring) -> float:
    # translated shoelace (geo crate's precision-preserving signed area)
    if len(ring) < 3:
        return 0.0
    x0, y0 = ring[0]
    s = 0.0
    for (x1, y1), (x2, y2) in _ring_segments(ring):
        s += (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)
    return s


def _st_area(w: str) -> float:
    kind, data = _wkt_parse(w)
    if kind != "polygon":
        return 0.0
    outer = abs(_ring_area2(data[0])) / 2
    holes = sum(abs(_ring_area2(r)) / 2 for r in data[1:])
    return outer - holes


def _st_contains(w1: str, w2: str) -> bool:
    """relation.rs st_contains (geo crate Contains)."""
    g1, g2 = _wkt_parse(w1), _wkt_parse(w2)
    if g1[0] == "polygon" and g2[0] == "point":
        return _point_in_polygon(g2[1], g1[1])
    if g1[0] == "point" and g2[0] == "point":
        return g1[1] == g2[1]
    if g1[0] == "polygon" and g2[0] in ("polygon", "linestring"):
        pts = (g2[1][0] if g2[0] == "polygon" else g2[1])
        if not all(_point_in_polygon(p, g1[1]) for p in pts):
            return False
        outer = _ring_segments(g1[1][0])
        return not any(_segs_intersect(a, b, c, d)
                       for a, b in _geom_segments(g2) for c, d in outer)
    return False


def _st_within(w1: str, w2: str) -> bool:
    return _st_contains(w2, w1)


def _st_intersects(w1: str, w2: str) -> bool:
    g1, g2 = _wkt_parse(w1), _wkt_parse(w2)
    if g1[0] == "point" and g2[0] == "point":
        return g1[1] == g2[1]
    if g1[0] == "point" or g2[0] == "point":
        p, g = (g1, g2) if g1[0] == "point" else (g2, g1)
        if g[0] == "polygon" and _point_in_polygon(p[1], g[1]):
            return True
        return any(_seg_dist(p[1], a, b) == 0.0 for a, b in _geom_segments(g))
    if any(_segs_intersect(a, b, c, d)
           for a, b in _geom_segments(g1) for c, d in _geom_segments(g2)):
        return True
    # containment without edge crossing
    for g, h in ((g1, g2), (g2, g1)):
        if g[0] == "polygon":
            pts = h[1][0] if h[0] == "polygon" else h[1]
            if pts and _point_in_polygon(pts[0], g[1]):
                return True
    return False


def _fmt_f64(v: float) -> str:
    """Rust f64 Display: positional notation, trailing zeros trimmed."""
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    s = repr(float(v))
    if "e" in s or "E" in s:
        from decimal import Decimal
        s = format(Decimal(s), "f")
    return s


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

    # H3 index-math family (hierarchy arithmetic on the cell index — see the
    # layout comment below; reference geo/h3.rs). Conformance-surface pandas
    # UDFs; the gate queries use the JVM-side column API.
    def _null(v):
        # scalar-safe: `None in vals` breaks on numpy-array cells
        if v is None:
            return True
        return isinstance(v, float) and v != v

    def _rows(fn, cols, dtype):
        def inner(*series):
            out = []
            for vals in zip(*series):
                try:
                    out.append(None if any(_null(v) for v in vals)
                               else fn(*vals))
                except (ValueError, TypeError, OverflowError):
                    out.append(None)
            return pd.Series(out, dtype=dtype)
        return inner

    from pyspark.sql.types import (ArrayType, BooleanType, DoubleType,
                                   IntegerType, LongType, StringType)

    reg = [
        ("h3_cell_to_string", lambda h: format(_h3_from_any(h), "x"),
         StringType(), "object"),
        ("h3_string_to_cell", lambda s: _h3_from_any(s), LongType(), "object"),
        ("h3_cell_resolution", lambda h: _h3_res(_h3_from_any(h)),
         IntegerType(), "object"),
        ("h3_cell_base", lambda h: _h3_base(_h3_from_any(h)),
         IntegerType(), "object"),
        ("h3_cell_is_pentagon", lambda h: _h3_is_pentagon(_h3_from_any(h)),
         BooleanType(), "object"),
        ("h3_cell_parent", lambda h, r: _h3_parent(_h3_from_any(h), int(r)),
         LongType(), "object"),
        ("h3_cell_center_child",
         lambda h, r: _h3_center_child(_h3_from_any(h), int(r)),
         LongType(), "object"),
        ("h3_cell_to_children",
         lambda h, r: _h3_children(_h3_from_any(h), int(r)),
         ArrayType(LongType()), "object"),
        ("h3_cell_to_children_size",
         lambda h, r: _h3_children_size(
             _h3_is_pentagon(_h3_from_any(h)),
             _h3_check_res(int(r)) - _h3_res(_h3_from_any(h))),
         LongType(), "object"),
        ("h3_cell_to_child_pos",
         lambda h, r: _h3_child_pos(_h3_from_any(h), int(r)),
         LongType(), "object"),
        ("h3_child_pos_to_cell",
         lambda p, h, r: _h3_child_pos_to_cell(int(p), _h3_from_any(h), int(r)),
         LongType(), "object"),
        ("h3_cells_contains", _h3_cells_contains, BooleanType(), "object"),
    ]
    # S2 cell ids exceed i64 (u64 with the high bit set for faces >= 4):
    # DECIMAL(20,0) keeps the unsigned value intact end-to-end
    from decimal import Decimal

    from pyspark.sql.types import DecimalType

    reg += [
        ("s2_latlng_to_cell",
         lambda la, lo: Decimal(_s2_latlng_to_cell(float(la), float(lo))),
         DecimalType(20, 0), "object"),
        ("s2_cell_to_token", lambda c: _s2_token(_s2_from_any(c)),
         StringType(), "object"),
        ("s2_cell_level", lambda c: _s2_level(_s2_from_any(c)),
         LongType(), "object"),
        ("s2_cell_parent",
         lambda c, l: Decimal(_s2_parent(_s2_from_any(c), int(l))),
         DecimalType(20, 0), "object"),
        ("geohash_neighbours",
         lambda la, lo, p: _geohash_neighbours(float(la), float(lo), int(p)),
         ArrayType(StringType()), "object"),
        ("wkt_point_from_latlng",
         lambda la, lo: f"POINT({_fmt_f64(float(lo))} {_fmt_f64(float(la))})",
         StringType(), "object"),
        ("st_distance", _st_distance, DoubleType(), "float64"),
        ("st_distance_sphere_m", _st_distance_sphere_m, DoubleType(), "float64"),
        ("st_area", _st_area, DoubleType(), "float64"),
        ("st_contains", _st_contains, BooleanType(), "object"),
        ("st_within", _st_within, BooleanType(), "object"),
        ("st_intersects", _st_intersects, BooleanType(), "object"),
    ]
    for name, fn, rtype, dtype in reg:
        spark.udf.register(
            name, pandas_udf(_rows(fn, None, dtype), rtype, PandasUDFType.SCALAR))


# -- H3 index math (pure bit algebra on the public H3 cell-index layout) ------
#
# The H3 cell index (h3geo.org spec, reference geo/h3.rs via the h3o crate):
#   bit 63 reserved, bits 59-62 mode (1 = cell), bits 56-58 reserved,
#   bits 52-55 resolution, bits 45-51 base cell, bits 0-44 fifteen 3-bit
#   per-resolution digits (unused digits = 7).
# The hierarchy family (parent/children/child-pos/contains) is exact integer
# arithmetic on this layout. The geometry family (latlng_to_cell, grid_disk,
# cell_center) additionally needs the 122-entry base-cell geometry tables and
# the 20x3x3x3 inverse face-IJK lookup of the H3 C library — those constants
# are not reconstructible from the spec alone and the C library is not in
# this container, so the geometry functions stay stubbed.

_H3_MAX_RES = 15
# the 12 res-0 pentagons (H3 spec, table of base cells 4..117)
_H3_PENTAGONS = frozenset({4, 14, 24, 38, 49, 58, 63, 72, 83, 97, 107, 117})


def _h3_res(h: int) -> int:
    return (h >> 52) & 0xF


def _h3_base(h: int) -> int:
    return (h >> 45) & 0x7F


def _h3_digit(h: int, r: int) -> int:
    return (h >> (3 * (_H3_MAX_RES - r))) & 7


def _h3_set_digit(h: int, r: int, d: int) -> int:
    shift = 3 * (_H3_MAX_RES - r)
    return (h & ~(7 << shift)) | (d << shift)


def _h3_set_res(h: int, res: int) -> int:
    return (h & ~(0xF << 52)) | (res << 52)


def _h3_is_pentagon(h: int) -> bool:
    return _h3_base(h) in _H3_PENTAGONS and all(
        _h3_digit(h, r) == 0 for r in range(1, _h3_res(h) + 1))


def _h3_check_res(res: int) -> int:
    if not 0 <= res <= _H3_MAX_RES:
        raise ValueError(f"H3 resolution {res} out of range [0, 15]")
    return res


def _h3_parent(h: int, pres: int) -> int:
    if _h3_check_res(pres) > _h3_res(h):
        raise ValueError("parent resolution above cell resolution")
    out = _h3_set_res(h, pres)
    for r in range(pres + 1, _H3_MAX_RES + 1):
        out = _h3_set_digit(out, r, 7)
    return out


def _h3_center_child(h: int, cres: int) -> int:
    if _h3_check_res(cres) < _h3_res(h):
        raise ValueError("child resolution below cell resolution")
    out = _h3_set_res(h, cres)
    for r in range(_h3_res(h) + 1, cres + 1):
        out = _h3_set_digit(out, r, 0)
    return out


def _h3_children_size(is_pent: bool, n: int) -> int:
    # pentagon subtree: K-axis (digit 1) subtrees are deleted at every level
    return 1 + 5 * (7 ** n - 1) // 6 if is_pent else 7 ** n


def _h3_child_pos(h: int, pres: int) -> int:
    res = _h3_res(h)
    if _h3_check_res(pres) > res:
        raise ValueError("parent resolution above cell resolution")
    pent = _h3_base(h) in _H3_PENTAGONS and all(
        _h3_digit(h, r) == 0 for r in range(1, pres + 1))
    pos = 0
    for r in range(pres + 1, res + 1):
        d = _h3_digit(h, r)
        rem = res - r
        if pent:
            if d != 0:
                pos += _h3_children_size(True, rem)       # the digit-0 subtree
                pos += (d - 2) * 7 ** rem                 # hex subtrees 2..d-1
            pent = d == 0
        else:
            pos += d * 7 ** rem
    return pos


def _h3_child_pos_to_cell(pos: int, h: int, cres: int) -> int:
    res = _h3_res(h)
    if _h3_check_res(cres) < res:
        raise ValueError("child resolution below cell resolution")
    out = _h3_set_res(h, cres)
    pent = _h3_is_pentagon(h)
    p = pos
    for r in range(res + 1, cres + 1):
        rem = cres - r
        if pent:
            psz = _h3_children_size(True, rem)
            if p < psz:
                d = 0
            else:
                p -= psz
                d = 2 + p // 7 ** rem
                p %= 7 ** rem
        else:
            d = p // 7 ** rem
            p %= 7 ** rem
        if d > 6:
            raise ValueError("child position out of range")
        out = _h3_set_digit(out, r, d)
        pent = pent and d == 0
    return out


def _h3_children(h: int, cres: int) -> list[int]:
    size = _h3_children_size(_h3_is_pentagon(h), _h3_check_res(cres) - _h3_res(h))
    return [_h3_child_pos_to_cell(i, h, cres) for i in range(size)]


def _h3_from_any(v) -> int:
    """Accept a cell as u64 int or 15-hex-char string."""
    if v is None:
        raise ValueError("null cell")
    if isinstance(v, str):
        return int(v.strip(), 16)
    return int(v)


def _h3_cells_contains(cells, cell) -> bool:
    """True when any member of `cells` is the cell itself or an ancestor
    (reference h3.rs h3_cells_contains). `cells`: csv string, array of
    strings, or array of ints."""
    target = _h3_from_any(cell)
    tres = _h3_res(target)
    if isinstance(cells, str):
        items = [s for s in cells.split(",") if s.strip()]
    else:
        items = list(cells)
    for c in items:
        ci = _h3_from_any(c)
        cres = _h3_res(ci)
        if cres <= tres and _h3_parent(target, cres) == ci:
            return True
    return False


def _h3_stub(*_args, **_kwargs):
    raise NotImplementedError(
        "H3 geometry functions (latlng_to_cell, grid_disk, cell_center_latlng"
        ", grid_distance/path) need the H3 library's published data tables — "
        "the 122-entry base-cell table (home face + ijk + pentagon flags), "
        "the 20-face center/azimuth doubles, and the 20x3x3x3 face-ijk→base "
        "lookup. Those are data, not algorithm: they cannot be re-derived "
        "from the spec text, this container has no network and no vendored "
        "H3 source to copy them from, and approximating them would silently "
        "emit wrong cell ids. On a machine with the h3 package: pip install "
        "h3 and wrap the calls in a pandas UDF (the SQL registration points "
        "here already). The index-math family (parent/children/child-pos/"
        "contains/string/resolution/base/pentagon) and the full S2 family "
        "are implemented above without tables."
    )


h3_latlng_to_cell = _h3_stub
s2_latlng_to_cell = _s2_latlng_to_cell
h3_cell_to_parent = _h3_parent  # index-math path needs no geometry tables
