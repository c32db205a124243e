"""CRS reprojection as pure column math (no GDAL/pyproj).

The reference reprojects the query geometry and tile index to a
caller-chosen CRS (`/root/reference/flytemosaic/mosaics.py:73`,
``gdf = gdf.to_crs(crs)``) and the main workflow takes a target ``crs``
parameter (`/root/reference/flyte/build.py:183`). The engine closes
that parity gap for the two CRSs that cover the reference's real use
(geographic WGS84 and the web tiling grid): EPSG:4326 ↔ EPSG:3857
(spherical Web Mercator) is a closed-form per-axis monotonic map, so

- it is exact column math (JVM-side, codegen-friendly — no UDF),
- axis-aligned bboxes stay axis-aligned: corner transform IS the bbox
  transform, and
- the sargable bbox prune in :func:`operators.catalog.tiles_for_bbox`
  keeps its parquet min/max row-group skipping in either CRS.

Spherical formulas (EPSG:3857 is defined on the sphere R = 6378137):

    x = R · lon·π/180
    y = R · ln(tan(π/4 + lat·π/360))
    lon = x/R · 180/π
    lat = (2·atan(exp(y/R)) − π/2) · 180/π

Python twins mirror the Column versions for plan-time parameters (the
query bbox is a driver-side tuple, the query geometry a WKB blob).
"""

from __future__ import annotations

import math
import struct

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EPSG_4326 = "EPSG:4326"
EPSG_3857 = "EPSG:3857"

R = 6378137.0  # WGS84 semi-major axis; EPSG:3857 is spherical
# Web-Mercator latitude of validity: y(±MAX_LAT) = ±π·R (the square grid)
MAX_LAT = math.degrees(2 * math.atan(math.exp(math.pi)) - math.pi / 2)


# -- Column-side (JVM math, whole-stage codegen) ---------------------------


def lon_to_merc_x(lon: Column) -> Column:
    return lon * F.lit(R * math.pi / 180.0)


def lat_to_merc_y(lat: Column) -> Column:
    return F.lit(R) * F.log(F.tan(F.lit(math.pi / 4.0) + lat * F.lit(math.pi / 360.0)))


def merc_x_to_lon(x: Column) -> Column:
    return x * F.lit(180.0 / (R * math.pi))


def merc_y_to_lat(y: Column) -> Column:
    return (F.atan(F.exp(y / F.lit(R))) * F.lit(2.0) - F.lit(math.pi / 2.0)) * F.lit(
        180.0 / math.pi
    )


_AXIS_FNS = {
    (EPSG_4326, EPSG_3857): (lon_to_merc_x, lat_to_merc_y),
    (EPSG_3857, EPSG_4326): (merc_x_to_lon, merc_y_to_lat),
}


def reproject_bbox_cols(
    df: DataFrame,
    src_crs: str,
    dst_crs: str,
    cols: tuple[str, str, str, str] = ("minx", "miny", "maxx", "maxy"),
) -> DataFrame:
    """Reproject a bbox-column quartet in place. The lon/lat <->
    Web-Mercator maps are strictly monotonic per axis, so min/max
    corners transform to min/max corners. UTM targets/sources are NOT
    axis-separable (easting depends on latitude too): those transform
    all four corners and take the envelope — a conservative superset,
    which is exactly what the sargable bbox PREFILTER needs (the exact
    refine downstream keeps the final answer tight)."""
    if src_crs == dst_crs:
        return df
    minx, miny, maxx, maxy = cols
    pp = _proj_pair(src_crs, dst_crs)
    if pp is not None:
        x0, y0, x1, y1 = (F.col(c) for c in cols)
        env = _envelope_exprs(pp, x0, y0, x1, y1)
        return df.withColumns(dict(zip(cols, env)))
    fx, fy = _axis_fns(src_crs, dst_crs)
    return df.withColumns(
        {
            minx: fx(F.col(minx)),
            miny: fy(F.col(miny)),
            maxx: fx(F.col(maxx)),
            maxy: fy(F.col(maxy)),
        }
    )


def _envelope_candidates(x0, y0, x1, y1, clamp_x, clamp_y):
    """Points whose transforms bound an axis-aligned box under a
    non-separable point projection (TM or conic). Corners alone are
    NOT enough: at fixed latitude the TM northing is minimized AT the
    central meridian (the parallel bows away from it) and conic y has
    the same lon0 extremum; TM easting offset peaks at the latitude
    nearest the equator — so boxes straddling either line have
    extremes on edge interiors. Candidates: 4 corners + the
    clamp_x-clamped points on both horizontal edges + (when clamp_y
    is not None) the clamp_y-clamped points on both vertical edges.
    Either clamp may be a single value, a list of values (polar
    stereographic needs lon0 + lon0±90 + lon0±180: along a fixed-ρ
    parallel x peaks at θ=±90 and y at θ∈{0,180}), or None.
    Works on Columns and plain floats."""
    is_col = isinstance(x0, Column)

    def clamp(v, lo, hi):
        if is_col:
            return F.greatest(lo, F.least(F.lit(v), hi))
        return max(lo, min(v, hi))

    def aslist(c):
        if c is None:
            return []
        return list(c) if isinstance(c, (list, tuple)) else [c]

    pts = [(x0, y0), (x0, y1), (x1, y0), (x1, y1)]
    for v in aslist(clamp_x):
        cx = clamp(v, x0, x1)
        pts += [(cx, y0), (cx, y1)]
    for v in aslist(clamp_y):
        cy = clamp(v, y0, y1)
        pts += [(x0, cy), (x1, cy)]
    return pts


def _envelope_exprs(pp: dict, x0, y0, x1, y1) -> tuple:
    """(minx, miny, maxx, maxy) Columns of the projected envelope."""
    pts = _envelope_candidates(x0, y0, x1, y1, pp["clamp_x"], pp["clamp_y"])
    proj = [pp["col"](px, py) for px, py in pts]
    env = (
        F.least(*[p[0] for p in proj]),
        F.least(*[p[1] for p in proj]),
        F.greatest(*[p[0] for p in proj]),
        F.greatest(*[p[1] for p in proj]),
    )
    post = pp.get("post")
    return post(env, x0, y0, x1, y1) if post else env


def _proj_pair(src_crs: str, dst_crs: str):
    """Descriptor for a NON-axis-separable point projection paired
    with EPSG:4326 (UTM zones and the conic presets): ``col``/``py``
    point transforms, plus the envelope clamp values (``clamp_x`` =
    central meridian forward / false easting inverse; ``clamp_y`` =
    the equator, TM-forward only). None when both sides are
    axis-separable; raises when a projected CRS is paired with
    anything other than EPSG:4326."""
    for crs, other, fwd in (
        (dst_crs, src_crs, True), (src_crs, dst_crs, False),
    ):
        is_utm, is_conic = False, crs in CONIC_PRESETS
        if not is_conic:
            try:
                zone, south = parse_utm_epsg(crs)
                is_utm = True
            except ValueError:
                continue
        if other != EPSG_4326:
            raise ValueError(
                f"projected-CRS reprojection only from/to {EPSG_4326}, "
                f"got {other}"
            )
        if is_utm:
            if fwd:
                return dict(
                    col=lambda x, y, z=zone, s=south: lonlat_to_utm_cols(
                        x, y, z, s
                    ),
                    py=lambda x, y, z=zone, s=south: lonlat_to_utm(
                        x, y, z, s
                    ),
                    clamp_x=utm_zone_lon0(zone),
                    clamp_y=0.0,
                )
            return dict(
                col=lambda x, y, z=zone, s=south: utm_to_lonlat_cols(
                    x, y, z, s
                ),
                py=lambda x, y, z=zone, s=south: utm_to_lonlat(x, y, z, s),
                clamp_x=_UTM_E0,
                clamp_y=None,
            )
        kind, params = CONIC_PRESETS[crs]
        datum = params.get("datum")
        # datum-shifted presets: the plan-time (float) path composes
        # Helmert + projection; the Column path must go through the
        # staged datum_project_df (a composed column tree would
        # substitute the Bowring chain into every projection reference)
        col_fwd = (
            _datum_col_unsupported if datum
            else (lambda x, y, c=crs: conic_forward_cols(x, y, c))
        )
        col_inv = (
            _datum_col_unsupported if datum
            else (lambda x, y, c=crs: conic_inverse_cols(x, y, c))
        )
        if fwd:
            # envelope extremes on edge interiors, by family: all have
            # the lon0 meridian; polar stereographic additionally peaks
            # x at theta=±90 and y at theta=180 along a parallel;
            # sinusoidal |x| and TM easting peak at the latitude
            # nearest the equator
            if kind == "stere":
                cx = [params["lon0"] + d
                      for d in (-180.0, -90.0, 0.0, 90.0, 180.0)]
                cy = None
            elif kind in ("sinu", "tmerc"):
                cx, cy = params["lon0"], 0.0
            else:
                cx, cy = params["lon0"], None
            return dict(
                col=col_fwd,
                py=lambda x, y, c=crs, dn=datum: conic_forward(
                    *(datum_shift(x, y, dn) if dn else (x, y)), c
                ),
                clamp_x=cx,
                clamp_y=cy,
                # the ~100 m-scale datum shift moves envelope extremes
                # off the sampled candidates; pad keeps the PREFILTER a
                # superset (1 km in projected metres)
                post=_pad_post(1000.0) if datum else None,
            )
        # inverse: the false-easting meridian; polar/sinusoidal also
        # the false-northing line (angle/latitude extremes there)
        def py_inv(x, y, c=crs, dn=datum):
            lo, la = conic_inverse(x, y, c)
            return datum_shift(lo, la, dn, inverse=True) if dn else (lo, la)

        return dict(
            col=col_inv,
            py=py_inv,
            clamp_x=params["fe"],
            clamp_y=params["fn"] if kind in ("stere", "sinu") else None,
            post=_stere_inv_post(params) if kind == "stere" else (
                _pad_post(0.02) if datum else None  # ~2 km in degrees
            ),
        )
    return None


def _datum_col_unsupported(*_a, **_k):
    raise NotImplementedError(
        "datum-shifted preset CRSs project Columns through the staged "
        "datum_project_df (composing the Helmert chain into one column "
        "expression would multiply the Bowring tree into every "
        "projection reference)"
    )


def _pad_post(pad: float):
    """Envelope widener for datum-shifted presets — the prefilter must
    stay a superset under the meters-scale Helmert displacement."""

    def post(env, x0, y0, x1, y1):
        minx, miny, maxx, maxy = env
        if isinstance(minx, Column):
            p = F.lit(pad)
            return (minx - p, miny - p, maxx + p, maxy + p)
        return (minx - pad, miny - pad, maxx + pad, maxy + pad)

    return post


def _stere_inv_post(params: dict):
    """Candidate points cannot express two polar-inverse cases: a
    projected box CONTAINING the pole covers every longitude (and
    reaches lat ±90), and one crossing the antimeridian image (the
    x=fe ray on the far side of the pole) wraps the lon interval.
    Both must WIDEN the envelope — it is a prefilter and has to stay
    a superset. Works on Columns and plain floats."""
    a, fe, fn = params["asp"], params["fe"], params["fn"]

    def post(env, x0, y0, x1, y1):
        minlon, minlat, maxlon, maxlat = env
        if isinstance(x0, Column):
            inx = (x0 <= F.lit(fe)) & (F.lit(fe) <= x1)
            cross = inx & (
                (y0 < F.lit(fn)) if a < 0 else (y1 > F.lit(fn))
            )
            pole = inx & (y0 <= F.lit(fn)) & (F.lit(fn) <= y1)
            minlon = F.when(cross, F.lit(-180.0)).otherwise(minlon)
            maxlon = F.when(cross, F.lit(180.0)).otherwise(maxlon)
            # branch fold: the inverse lon lives on lon0±180; shift a
            # fully-out interval by 360, full-widen a straddling one
            shift_up = maxlon < F.lit(-180.0)
            shift_dn = minlon > F.lit(180.0)
            straddle = (minlon < F.lit(-180.0)) | (maxlon > F.lit(180.0))
            new_min = (
                F.when(shift_up, minlon + F.lit(360.0))
                .when(shift_dn, minlon - F.lit(360.0))
                .when(straddle, F.lit(-180.0))
                .otherwise(minlon)
            )
            new_max = (
                F.when(shift_up, maxlon + F.lit(360.0))
                .when(shift_dn, maxlon - F.lit(360.0))
                .when(straddle, F.lit(180.0))
                .otherwise(maxlon)
            )
            minlon, maxlon = new_min, new_max
            if a < 0:
                minlat = F.when(pole, F.lit(-90.0)).otherwise(minlat)
            else:
                maxlat = F.when(pole, F.lit(90.0)).otherwise(maxlat)
            return (minlon, minlat, maxlon, maxlat)
        inx = x0 <= fe <= x1
        cross = inx and ((y0 < fn) if a < 0 else (y1 > fn))
        pole = inx and y0 <= fn <= y1
        if cross:
            minlon, maxlon = -180.0, 180.0
        if maxlon < -180.0:
            minlon, maxlon = minlon + 360.0, maxlon + 360.0
        elif minlon > 180.0:
            minlon, maxlon = minlon - 360.0, maxlon - 360.0
        elif minlon < -180.0 or maxlon > 180.0:
            minlon, maxlon = -180.0, 180.0
        if pole:
            if a < 0:
                minlat = -90.0
            else:
                maxlat = 90.0
        return (minlon, minlat, maxlon, maxlat)

    return post


def reproject_manifest(manifest: DataFrame, dst_crs: str) -> DataFrame:
    """The reference's ``gdf.to_crs(crs)`` over the mosaic manifest
    (mosaics.py:73): transform the tile bounds columns and restamp the
    ``srs`` metadata column. Rows already in ``dst_crs`` pass through;
    rows in a supported source CRS transform (per-axis for the
    separable Mercator pair, projected-envelope for UTM/conic
    targets); any other srs raises at execution (mirroring pyproj's
    unknown-CRS failure)."""
    pp = None
    if dst_crs != EPSG_4326:
        try:
            pp = _proj_pair(EPSG_4326, dst_crs)
        except ValueError:
            pp = None
    if pp is not None:
        env = _envelope_exprs(
            pp, F.col("minx"), F.col("miny"), F.col("maxx"), F.col("maxy")
        )
        bad = F.raise_error(
            F.concat(F.lit("unsupported srs: "), F.col("srs"))
        )

        def _pick(c: str, e: Column) -> Column:
            return (
                F.when(F.col("srs") == dst_crs, F.col(c))
                .when(F.col("srs") == EPSG_4326, e)
                .otherwise(bad)
            )

        return manifest.withColumns(
            {
                "minx": _pick("minx", env[0]),
                "miny": _pick("miny", env[1]),
                "maxx": _pick("maxx", env[2]),
                "maxy": _pick("maxy", env[3]),
                "srs": F.lit(dst_crs),
            }
        )
    fwd = {}
    for (s, d), (fx, fy) in _AXIS_FNS.items():
        if d == dst_crs:
            fwd[s] = (fx, fy)
    if not fwd and dst_crs not in (EPSG_4326, EPSG_3857):
        raise ValueError(f"unsupported target CRS {dst_crs}")

    def _axis(c: str, which: int) -> Column:
        expr = F.col(c)
        w = F.when(F.col("srs") == dst_crs, expr)
        for s, fns in fwd.items():
            w = w.when(F.col("srs") == s, fns[which](expr))
        return w.otherwise(
            F.raise_error(F.concat(F.lit("unsupported srs: "), F.col("srs")))
        )

    return manifest.withColumns(
        {
            "minx": _axis("minx", 0),
            "miny": _axis("miny", 1),
            "maxx": _axis("maxx", 0),
            "maxy": _axis("maxy", 1),
            "srs": F.lit(dst_crs),
        }
    )


def _axis_fns(src_crs: str, dst_crs: str):
    try:
        return _AXIS_FNS[(src_crs, dst_crs)]
    except KeyError:
        raise ValueError(
            f"unsupported CRS pair {src_crs} -> {dst_crs}; "
            f"supported: EPSG:4326 <-> EPSG:3857"
        ) from None


# -- UTM / transverse Mercator (ellipsoidal, Krüger series) ----------------
#
# The reference honors ANY caller-chosen CRS (build.py:183,
# mosaics.py:73); GLAD-style work runs in UTM zones (EPSG:326xx north /
# 327xx south). The 6th-order Krüger series (Karney 2011, "Transverse
# Mercator with an accuracy of a few nanometers" — public) gives
# sub-mm accuracy inside a zone ±10°, expressed as unrolled column
# math: trig/hyperbolic built-ins only, with asinh/atanh spelled as
# logs so a DuckDB oracle replays the identical expression tree.

_WGS84_F = 1.0 / 298.257223563  # WGS84 flattening
_UTM_K0 = 0.9996
_UTM_E0 = 500000.0
_UTM_N0_SOUTH = 10000000.0


def _kruger_consts(f: float = _WGS84_F, a: float = R) -> dict:
    """n (third flattening), rectifying radius A, forward (alpha) and
    inverse (beta) series, eccentricity, and the conformal-to-geodetic
    latitude series (chi) — all plain floats, embedded as literals in
    both the Column expressions and the oracle SQL. ``a``/``f`` default
    to WGS84; datum presets pass their own ellipsoid (Airy 1830 for
    OSGB, Clarke 1880 IGN for NTF)."""
    n = f / (2.0 - f)
    n2, n3, n4, n5, n6 = n * n, n**3, n**4, n**5, n**6
    big_a = a / (1 + n) * (1 + n2 / 4 + n4 / 64 + n6 / 256)
    alpha = [
        n / 2 - 2 * n2 / 3 + 5 * n3 / 16 + 41 * n4 / 180
        - 127 * n5 / 288 + 7891 * n6 / 37800,
        13 * n2 / 48 - 3 * n3 / 5 + 557 * n4 / 1440 + 281 * n5 / 630
        - 1983433 * n6 / 1935360,
        61 * n3 / 240 - 103 * n4 / 140 + 15061 * n5 / 26880
        + 167603 * n6 / 181440,
        49561 * n4 / 161280 - 179 * n5 / 168 + 6601661 * n6 / 7257600,
        34729 * n5 / 80640 - 3418889 * n6 / 1995840,
        212378941 * n6 / 319334400,
    ]
    beta = [
        n / 2 - 2 * n2 / 3 + 37 * n3 / 96 - n4 / 360 - 81 * n5 / 512
        + 96199 * n6 / 604800,
        n2 / 48 + n3 / 15 - 437 * n4 / 1440 + 46 * n5 / 105
        - 1118711 * n6 / 3870720,
        17 * n3 / 480 - 37 * n4 / 840 - 209 * n5 / 4480
        + 5569 * n6 / 90720,
        4397 * n4 / 161280 - 11 * n5 / 504 - 830251 * n6 / 7257600,
        4583 * n5 / 161280 - 108847 * n6 / 3991680,
        20648693 * n6 / 638668800,
    ]
    e2 = f * (2.0 - f)
    e4, e6, e8 = e2 * e2, e2**3, e2**4
    # conformal -> geodetic latitude series (classic chi expansion)
    chi = [
        e2 / 2 + 5 * e4 / 24 + e6 / 12 + 13 * e8 / 360,
        7 * e4 / 48 + 29 * e6 / 240 + 811 * e8 / 11520,
        7 * e6 / 120 + 81 * e8 / 1120,
        4279 * e8 / 161280,
    ]
    return {
        "A": big_a, "alpha": alpha, "beta": beta,
        "e": math.sqrt(e2), "chi": chi,
    }


_KRUGER = _kruger_consts()


def utm_zone_lon0(zone: int) -> float:
    """Central meridian of a UTM zone (degrees)."""
    if not 1 <= zone <= 60:
        raise ValueError(f"UTM zone {zone} out of range 1..60")
    return zone * 6.0 - 183.0


def parse_utm_epsg(crs: str) -> tuple[int, bool]:
    """EPSG:326xx / EPSG:327xx -> (zone, south). Raises on non-UTM."""
    if crs.startswith("EPSG:326") and len(crs) == 10:
        zone = int(crs[8:])
        if 1 <= zone <= 60:
            return zone, False
    if crs.startswith("EPSG:327") and len(crs) == 10:
        zone = int(crs[8:])
        if 1 <= zone <= 60:
            return zone, True
    raise ValueError(f"not a UTM EPSG code: {crs}")


# The Krüger expression is authored ONCE over an abstract op set and
# rendered to BOTH Spark Columns and SQL text — the two engines then
# evaluate structurally identical IEEE trees, which is what makes the
# probe's value-hash compare EXACT at the mm grain (hyperbolics are
# spelled via exp because DuckDB has no sinh/cosh; asinh/atanh via ln
# for the same reason).


class _ColOps:
    lit = staticmethod(lambda v: F.lit(float(v)))
    sin = staticmethod(F.sin)
    cos = staticmethod(F.cos)
    asin = staticmethod(F.asin)
    atan2 = staticmethod(F.atan2)
    log = staticmethod(F.log)
    exp = staticmethod(F.exp)
    sqrt = staticmethod(F.sqrt)


class _SqlVal:
    """A SQL scalar expression; every operator parenthesizes, so the
    rendered text preserves the construction order exactly."""

    __slots__ = ("s",)

    def __init__(self, s: str):
        self.s = s

    def _b(self, op, o, rev=False):
        a, b = (o.s, self.s) if rev else (self.s, o.s)
        return _SqlVal(f"({a} {op} {b})")

    def __add__(self, o):
        return self._b("+", o)

    def __sub__(self, o):
        return self._b("-", o)

    def __mul__(self, o):
        return self._b("*", o)

    def __truediv__(self, o):
        return self._b("/", o)

    def __neg__(self):
        return _SqlVal(f"(- {self.s})")


class _SqlOps:
    lit = staticmethod(lambda v: _SqlVal(repr(float(v))))
    sin = staticmethod(lambda x: _SqlVal(f"sin({x.s})"))
    cos = staticmethod(lambda x: _SqlVal(f"cos({x.s})"))
    asin = staticmethod(lambda x: _SqlVal(f"asin({x.s})"))
    atan2 = staticmethod(lambda y, x: _SqlVal(f"atan2({y.s}, {x.s})"))
    log = staticmethod(lambda x: _SqlVal(f"ln({x.s})"))
    exp = staticmethod(lambda x: _SqlVal(f"exp({x.s})"))
    sqrt = staticmethod(lambda x: _SqlVal(f"sqrt({x.s})"))


def _sinh(ops, x):
    return (ops.exp(x) - ops.exp(-x)) / ops.lit(2.0)


def _cosh(ops, x):
    return (ops.exp(x) + ops.exp(-x)) / ops.lit(2.0)


def _utm_tm(zone: int, south: bool) -> dict:
    """The UTM zone as a generic transverse-Mercator parameter set —
    the SAME core serves any TM CRS (the UTM literals land in the same
    tree positions as before, so the f24/f25 oracle contracts are
    unchanged)."""
    return dict(
        kr=_KRUGER,
        lon0=utm_zone_lon0(zone),
        k0=_UTM_K0,
        fe=_UTM_E0,
        fn_eff=_UTM_N0_SOUTH if south else 0.0,
    )


def _kruger_forward(ops, lon, lat, tm: dict):
    k, L = tm["kr"], ops.lit
    lam = (lon - L(tm["lon0"])) * L(math.pi / 180.0)
    phi = lat * L(math.pi / 180.0)
    s, e = ops.sin(phi), L(k["e"])
    # atanh spelled as a log so the oracle replays it verbatim
    atanh_s = L(0.5) * ops.log((L(1.0) + s) / (L(1.0) - s))
    atanh_es = L(0.5) * ops.log((L(1.0) + e * s) / (L(1.0) - e * s))
    t = _sinh(ops, atanh_s - e * atanh_es)
    xi_p = ops.atan2(t, ops.cos(lam))
    q = ops.sin(lam) / ops.sqrt(t * t + ops.cos(lam) * ops.cos(lam))
    eta_p = ops.log(q + ops.sqrt(q * q + L(1.0)))  # asinh
    xi, eta = xi_p, eta_p
    for j, aj in enumerate(k["alpha"], start=1):
        xi = xi + L(aj) * ops.sin(L(2.0 * j) * xi_p) * _cosh(
            ops, L(2.0 * j) * eta_p
        )
        eta = eta + L(aj) * ops.cos(L(2.0 * j) * xi_p) * _sinh(
            ops, L(2.0 * j) * eta_p
        )
    scale = L(tm["k0"] * k["A"])
    easting = L(tm["fe"]) + scale * eta
    northing = L(tm["fn_eff"]) + scale * xi
    return easting, northing


def _kruger_inverse(ops, easting, northing, tm: dict):
    k, L = tm["kr"], ops.lit
    scale = L(tm["k0"] * k["A"])
    xi = (northing - L(tm["fn_eff"])) / scale
    eta = (easting - L(tm["fe"])) / scale
    xi_p, eta_p = xi, eta
    for j, bj in enumerate(k["beta"], start=1):
        xi_p = xi_p - L(bj) * ops.sin(L(2.0 * j) * xi) * _cosh(
            ops, L(2.0 * j) * eta
        )
        eta_p = eta_p - L(bj) * ops.cos(L(2.0 * j) * xi) * _sinh(
            ops, L(2.0 * j) * eta
        )
    lam = ops.atan2(_sinh(ops, eta_p), ops.cos(xi_p))
    chi = ops.asin(ops.sin(xi_p) / _cosh(ops, eta_p))  # conformal lat
    phi = chi
    for j, cj in enumerate(k["chi"], start=1):
        phi = phi + L(cj) * ops.sin(L(2.0 * j) * chi)
    lon = lam * L(180.0 / math.pi) + L(tm["lon0"])
    lat = phi * L(180.0 / math.pi)
    return lon, lat


def lonlat_to_utm_cols(
    lon: Column, lat: Column, zone: int, south: bool = False
) -> tuple[Column, Column]:
    """(easting, northing) Columns for WGS84 lon/lat in degrees —
    unrolled Krüger forward series, JVM-side codegen only."""
    return _kruger_forward(_ColOps, lon, lat, _utm_tm(zone, south))


def utm_to_lonlat_cols(
    easting: Column, northing: Column, zone: int, south: bool = False
) -> tuple[Column, Column]:
    """Inverse Krüger series: (lon, lat) Columns in degrees."""
    return _kruger_inverse(_ColOps, easting, northing, _utm_tm(zone, south))


def utm_forward_sql(
    lon_sql: str, lat_sql: str, zone: int, south: bool = False
) -> tuple[str, str]:
    """The forward transform as SQL text — structurally identical to
    :func:`lonlat_to_utm_cols`, for DuckDB oracle queries."""
    e, n = _kruger_forward(
        _SqlOps, _SqlVal(f"({lon_sql})"), _SqlVal(f"({lat_sql})"),
        _utm_tm(zone, south),
    )
    return e.s, n.s


def utm_inverse_sql(
    easting_sql: str, northing_sql: str, zone: int, south: bool = False
) -> tuple[str, str]:
    """The inverse transform as SQL text (see
    :func:`utm_forward_sql`)."""
    lo, la = _kruger_inverse(
        _SqlOps, _SqlVal(f"({easting_sql})"), _SqlVal(f"({northing_sql})"),
        _utm_tm(zone, south),
    )
    return lo.s, la.s


def lonlat_to_utm(
    lon: float, lat: float, zone: int, south: bool = False
) -> tuple[float, float]:
    """Python twin of :func:`lonlat_to_utm_cols` (plan-time bboxes and
    WKB query geometries) — identical arithmetic, libm instead of JVM
    (differences are last-ulp, far below the mm grain)."""
    k = _KRUGER
    lam = math.radians(lon - utm_zone_lon0(zone))
    phi = math.radians(lat)
    s, e = math.sin(phi), k["e"]
    t = math.sinh(math.atanh(s) - e * math.atanh(e * s))
    xi_p = math.atan2(t, math.cos(lam))
    eta_p = math.asinh(
        math.sin(lam) / math.sqrt(t * t + math.cos(lam) ** 2)
    )
    xi, eta = xi_p, eta_p
    for j, aj in enumerate(k["alpha"], start=1):
        xi += aj * math.sin(2 * j * xi_p) * math.cosh(2 * j * eta_p)
        eta += aj * math.cos(2 * j * xi_p) * math.sinh(2 * j * eta_p)
    scale = _UTM_K0 * k["A"]
    return (
        _UTM_E0 + scale * eta,
        (_UTM_N0_SOUTH if south else 0.0) + scale * xi,
    )


def utm_to_lonlat(
    easting: float, northing: float, zone: int, south: bool = False
) -> tuple[float, float]:
    """Python twin of :func:`utm_to_lonlat_cols`."""
    k = _KRUGER
    scale = _UTM_K0 * k["A"]
    xi = (northing - (_UTM_N0_SOUTH if south else 0.0)) / scale
    eta = (easting - _UTM_E0) / scale
    xi_p, eta_p = xi, eta
    for j, bj in enumerate(k["beta"], start=1):
        xi_p -= bj * math.sin(2 * j * xi) * math.cosh(2 * j * eta)
        eta_p -= bj * math.cos(2 * j * xi) * math.sinh(2 * j * eta)
    lam = math.atan2(math.sinh(eta_p), math.cos(xi_p))
    chi = math.asin(math.sin(xi_p) / math.cosh(eta_p))
    phi = chi
    for j, cj in enumerate(k["chi"], start=1):
        phi += cj * math.sin(2 * j * chi)
    return math.degrees(lam) + utm_zone_lon0(zone), math.degrees(phi)


# -- Conic projections: Albers equal-area + Lambert conformal conic --------
#
# The reference honors any caller CRS; after UTM the two conic
# families cover most continental-scale rasters (Albers: NLCD/CONUS
# EPSG:5070; LCC: Lambert-93 EPSG:2154, many national grids). Both are
# implemented from the public closed forms (Snyder, "Map Projections —
# A Working Manual", USGS PP 1395, pp. 98-110) over the same abstract
# op set as UTM, so the DuckDB oracle replays identical IEEE trees.
# Inverse latitude recovery uses the CLOSED SERIES (authalic->geodetic
# for Albers, Snyder 3-18; conformal->geodetic for LCC, the same chi
# expansion the Krüger inverse uses) rather than Snyder's fixed-point
# iteration: an unrolled iteration references the previous phi ~8
# times per round, so the rendered expression tree grows 8^iters
# (the Albers inverse measured 65 MB of SQL at 5 rounds); the series
# is linear-size and equally sub-mm.

# public EPSG parameter sets (EPSG registry); GRS80 flattening
_GRS80_F = 1.0 / 298.257222101
CONIC_PRESETS: dict[str, tuple[str, dict]] = {
    # NAD83 / Conus Albers (NLCD, MRLC)
    "EPSG:5070": (
        "albers",
        dict(lat1=29.5, lat2=45.5, lat0=23.0, lon0=-96.0,
             fe=0.0, fn=0.0, f=_GRS80_F),
    ),
    # RGF93 / Lambert-93 (France national grid)
    "EPSG:2154": (
        "lcc",
        dict(lat1=44.0, lat2=49.0, lat0=46.5, lon0=3.0,
             fe=700000.0, fn=6600000.0, f=_GRS80_F),
    ),
    # The registry also carries the azimuthal + pseudocylindrical
    # presets (same machinery; "conic" in the API names is historical):
    # WGS84 / Antarctic Polar Stereographic (EPSG 9829 variant B)
    "EPSG:3031": (
        "stere",
        dict(lat_ts=-71.0, lon0=0.0, fe=0.0, fn=0.0, asp=-1.0,
             f=1.0 / 298.257223563),
    ),
    # WGS84 / NSIDC Sea Ice Polar Stereographic North
    "EPSG:3413": (
        "stere",
        dict(lat_ts=70.0, lon0=-45.0, fe=0.0, fn=0.0, asp=1.0,
             f=1.0 / 298.257223563),
    ),
    # MODIS sinusoidal grid (GCTP sphere R=6371007.181; the id is the
    # widely used spatialreference.org code — MODIS has no EPSG code)
    "SR-ORG:6974": (
        "sinu",
        dict(lon0=0.0, fe=0.0, fn=0.0, radius=6371007.181),
    ),
    # r7: DATUM-SHIFTED national grids, added with ZERO new projection
    # math — "tmerc" reuses the Krüger core that serves UTM, "lcc1" is
    # the one-standard-parallel parameterization of the existing LCC
    # form. The ``datum`` key names a DATUM_PRESETS entry; the
    # projection input is geographic coordinates ON THAT DATUM (the
    # proj pipeline convention — +towgs84 is a separate stage), and the
    # WGS84 <-> local step runs through the staged Helmert API below
    # (datum_project_df / datum_shift).
    # OSGB36 / British National Grid (EPSG registry; Airy 1830)
    "EPSG:27700": (
        "tmerc",
        dict(lat0=49.0, lon0=-2.0, k0=0.9996012717,
             fe=400000.0, fn=-100000.0,
             a=6377563.396, f=1.0 / 299.3249646, datum="OSGB36"),
    ),
    # NTF (Paris) / Lambert zone II (EPSG registry; Clarke 1880 IGN;
    # lon0 = 2°20'14.025" E of Greenwich — the Paris meridian)
    "EPSG:27572": (
        "lcc1",
        dict(lat0=46.8, lon0=2.0 + 20.0 / 60.0 + 14.025 / 3600.0,
             k0=0.99987742, fe=600000.0, fn=2200000.0,
             a=6378249.2, f=(6378249.2 - 6356515.0) / 6378249.2,
             datum="NTF"),
    ),
    # NAD27 / UTM zone 14N (EPSG registry; Clarke 1866) — the third
    # datum preset, added as PURE DATA: tmerc + the UTM constants on
    # the NAD27 ellipsoid with the classic 3-parameter CONUS shift
    "EPSG:26714": (
        "tmerc",
        dict(lat0=0.0, lon0=-99.0, k0=0.9996,
             fe=500000.0, fn=0.0,
             a=6378206.4, f=(6378206.4 - 6356583.8) / 6378206.4,
             datum="NAD27"),
    ),
}

# WGS84 -> local-datum Helmert parameter sets (position-vector
# convention, EPSG method 9606: translations in metres, rotations in
# arc-seconds, scale in ppm). The inverse direction negates the
# parameters — the standard small-angle reversibility of 9606.
DATUM_PRESETS: dict[str, dict] = {
    # ETRS89/WGS84 -> OSGB36 (OS "A guide to coordinate systems in
    # Great Britain", Annex — the national ~3.5 m Helmert; Airy 1830)
    "OSGB36": dict(
        a=6377563.396, f=1.0 / 299.3249646,
        dx=-446.448, dy=125.157, dz=-542.060,
        rx=-0.1502, ry=-0.2470, rz=-0.8421, ds=20.4894,
    ),
    # WGS84 -> NTF (the classic 3-parameter shift, IGN; Clarke 1880)
    "NTF": dict(
        a=6378249.2, f=(6378249.2 - 6356515.0) / 6378249.2,
        dx=168.0, dy=60.0, dz=-320.0,
        rx=0.0, ry=0.0, rz=0.0, ds=0.0,
    ),
    # WGS84 -> NAD27 CONUS (the classic 3-parameter shift; Clarke
    # 1866) — NAD27->WGS84 is towgs84 = (-8, 160, 176), negated here
    # for the WGS84->local direction this registry stores
    "NAD27": dict(
        a=6378206.4, f=(6378206.4 - 6356583.8) / 6378206.4,
        dx=8.0, dy=-160.0, dz=-176.0,
        rx=0.0, ry=0.0, rz=0.0, ds=0.0,
    ),
}


def _conic_e(f: float) -> float:
    return math.sqrt(f * (2.0 - f))


def _py_m(phi: float, e: float) -> float:
    return math.cos(phi) / math.sqrt(1 - (e * math.sin(phi)) ** 2)


def _py_q(phi: float, e: float) -> float:
    s = math.sin(phi)
    return (1 - e * e) * (
        s / (1 - (e * s) ** 2)
        - (1 / (2 * e)) * math.log((1 - e * s) / (1 + e * s))
    )


def _py_t(phi: float, e: float) -> float:
    s = math.sin(phi)
    return math.tan(math.pi / 4 - phi / 2) / (
        (1 - e * s) / (1 + e * s)
    ) ** (e / 2)


def _chi_series(e2: float) -> list[float]:
    """Conformal -> geodetic latitude series coefficients (the same
    expansion the Krüger inverse uses)."""
    e4, e6, e8 = e2 * e2, e2**3, e2**4
    return [
        e2 / 2 + 5 * e4 / 24 + e6 / 12 + 13 * e8 / 360,
        7 * e4 / 48 + 29 * e6 / 240 + 811 * e8 / 11520,
        7 * e6 / 120 + 81 * e8 / 1120,
        4279 * e8 / 161280,
    ]


def _authalic_series(e2: float) -> list[float]:
    """Authalic -> geodetic latitude series (Snyder eq. 3-18)."""
    e4, e6 = e2 * e2, e2**3
    return [
        e2 / 3 + 31 * e4 / 180 + 517 * e6 / 5040,
        23 * e4 / 360 + 251 * e6 / 3780,
        761 * e6 / 45360,
    ]


def _albers_consts(p: dict) -> dict:
    e = _conic_e(p["f"])
    a = p.get("a", R)
    p1, p2, p0 = (math.radians(p[k]) for k in ("lat1", "lat2", "lat0"))
    m1, m2 = _py_m(p1, e), _py_m(p2, e)
    q1, q2, q0 = _py_q(p1, e), _py_q(p2, e), _py_q(p0, e)
    n = (m1 * m1 - m2 * m2) / (q2 - q1)
    c = m1 * m1 + n * q1
    rho0 = a * math.sqrt(c - n * q0) / n
    return dict(e=e, a=a, n=n, c=c, rho0=rho0, lon0=p["lon0"],
                fe=p["fe"], fn=p["fn"],
                qp=_py_q(math.pi / 2.0, e),
                auth=_authalic_series(e * e))


def _lcc_consts(p: dict) -> dict:
    e = _conic_e(p["f"])
    p1, p2, p0 = (math.radians(p[k]) for k in ("lat1", "lat2", "lat0"))
    m1, m2 = _py_m(p1, e), _py_m(p2, e)
    t1, t2, t0 = _py_t(p1, e), _py_t(p2, e), _py_t(p0, e)
    n = (math.log(m1) - math.log(m2)) / (math.log(t1) - math.log(t2))
    big_f = m1 / (n * t1**n)
    a = p.get("a", R)
    rho0 = a * big_f * t0**n
    return dict(e=e, a=a, n=n, f_=big_f, rho0=rho0, lon0=p["lon0"],
                fe=p["fe"], fn=p["fn"], chi=_chi_series(e * e))


def _ops_q(ops, phi, e: float):
    """Snyder's q (authalic) over the op set."""
    L, s = ops.lit, ops.sin(phi)
    es = L(e) * s
    return L(1.0 - e * e) * (
        s / (L(1.0) - es * es)
        - L(1.0 / (2.0 * e)) * ops.log((L(1.0) - es) / (L(1.0) + es))
    )


def _ops_t(ops, phi, e: float):
    """Snyder's t (conformal) over the op set: tan(pi/4 - phi/2) /
    ((1-e sin)/(1+e sin))^(e/2) — the power spelled exp(k*ln(x))."""
    L, s = ops.lit, ops.sin(phi)
    es = L(e) * s
    num = ops.sin(L(math.pi / 4.0) - phi / L(2.0)) / ops.cos(
        L(math.pi / 4.0) - phi / L(2.0)
    )
    return num / ops.exp(
        L(e / 2.0) * ops.log((L(1.0) - es) / (L(1.0) + es))
    )


def _albers_forward(ops, lon, lat, k: dict):
    L = ops.lit
    phi = lat * L(math.pi / 180.0)
    theta = L(k["n"]) * ((lon - L(k["lon0"])) * L(math.pi / 180.0))
    q = _ops_q(ops, phi, k["e"])
    rho = L(k["a"]) * ops.sqrt(L(k["c"]) - L(k["n"]) * q) / L(k["n"])
    x = L(k["fe"]) + rho * ops.sin(theta)
    y = L(k["fn"]) + L(k["rho0"]) - rho * ops.cos(theta)
    return x, y


def _albers_inverse(ops, x, y, k: dict):
    L = ops.lit
    xp = x - L(k["fe"])
    yp = L(k["rho0"]) - (y - L(k["fn"]))
    rho = ops.sqrt(xp * xp + yp * yp)
    # theta = atan2(x', rho0 - y') with the n<0 sign fold: for n<0,
    # rho and both atan2 args flip sign together
    sgn = 1.0 if k["n"] >= 0 else -1.0
    theta = ops.atan2(L(sgn) * xp, L(sgn) * yp)
    lon = (theta / L(k["n"])) * L(180.0 / math.pi) + L(k["lon0"])
    q = (L(k["c"]) - (rho * L(k["n"] / k["a"])) * (rho * L(k["n"] / k["a"]))) / L(
        k["n"]
    )
    # authalic latitude, then the closed geodetic series (Snyder 3-18),
    # then ONE Snyder 3-16 fixed-point refinement: the e^6-truncated
    # series alone leaves ~1.5 mm; one step from a mm-close start is
    # sub-nm, and a single unrolled step keeps the tree linear-size
    beta = ops.asin(q / L(k["qp"]))
    phi = beta
    for j, bj in enumerate(k["auth"], start=1):
        phi = phi + L(bj) * ops.sin(L(2.0 * j) * beta)
    e = k["e"]
    s = ops.sin(phi)
    es = L(e) * s
    one_m = L(1.0) - es * es
    phi = phi + (one_m * one_m) / (L(2.0) * ops.cos(phi)) * (
        q / L(1.0 - e * e)
        - s / one_m
        + L(1.0 / (2.0 * e)) * ops.log((L(1.0) - es) / (L(1.0) + es))
    )
    return lon, phi * L(180.0 / math.pi)


def _lcc_forward(ops, lon, lat, k: dict):
    L = ops.lit
    phi = lat * L(math.pi / 180.0)
    t = _ops_t(ops, phi, k["e"])
    rho = L(k["a"] * k["f_"]) * ops.exp(L(k["n"]) * ops.log(t))
    theta = L(k["n"]) * ((lon - L(k["lon0"])) * L(math.pi / 180.0))
    x = L(k["fe"]) + rho * ops.sin(theta)
    y = L(k["fn"]) + L(k["rho0"]) - rho * ops.cos(theta)
    return x, y


def _lcc_inverse(ops, x, y, k: dict):
    L = ops.lit
    xp = x - L(k["fe"])
    yp = L(k["rho0"]) - (y - L(k["fn"]))
    sgn = 1.0 if k["n"] >= 0 else -1.0
    rho = L(sgn) * ops.sqrt(xp * xp + yp * yp)
    theta = ops.atan2(L(sgn) * xp, L(sgn) * yp)
    lon = (theta / L(k["n"])) * L(180.0 / math.pi) + L(k["lon0"])
    t = ops.exp(L(1.0 / k["n"]) * ops.log(rho / L(k["a"] * k["f_"])))
    # conformal latitude, then the closed geodetic (chi) series — the
    # same expansion the Krüger inverse uses
    chi = L(math.pi / 2.0) - L(2.0) * ops.atan2(t, L(1.0))
    phi = chi
    for j, cj in enumerate(k["chi"], start=1):
        phi = phi + L(cj) * ops.sin(L(2.0 * j) * chi)
    return lon, phi * L(180.0 / math.pi)


# -- Polar stereographic (EPSG method 9829, variant B) ---------------------
#
# The polar twin of the conic pair: Antarctic (EPSG:3031) and Arctic
# (EPSG:3413) mosaics are the standard grids for ice-sheet rasters.
# Snyder pp. 160-163 / EPSG guidance note 7-2; both aspects share one
# formula via the north-frame fold phi_n = asp * phi (asp = +1 north,
# -1 south), and the inverse recovers geodetic latitude through the
# SAME closed chi series as LCC/Krüger — no iteration, linear-size
# expression trees on both engines.


def _stere_consts(p: dict) -> dict:
    e = _conic_e(p["f"])
    phi_n = math.radians(p["asp"] * p["lat_ts"])
    k0 = p.get("a", R) * _py_m(phi_n, e) / _py_t(phi_n, e)
    return dict(e=e, asp=p["asp"], k0=k0, lon0=p["lon0"],
                fe=p["fe"], fn=p["fn"], chi=_chi_series(e * e))


def _stere_forward(ops, lon, lat, k: dict):
    L, a = ops.lit, k["asp"]
    phi_n = lat * L(a * math.pi / 180.0)
    t = _ops_t(ops, phi_n, k["e"])
    rho = L(k["k0"]) * t
    theta = (lon - L(k["lon0"])) * L(math.pi / 180.0)
    x = L(k["fe"]) + rho * ops.sin(theta)
    y = L(k["fn"]) - L(a) * (rho * ops.cos(theta))
    return x, y


def _stere_inverse(ops, x, y, k: dict):
    L, a = ops.lit, k["asp"]
    xp = x - L(k["fe"])
    yp = y - L(k["fn"])
    rho = ops.sqrt(xp * xp + yp * yp)
    tp = rho / L(k["k0"])
    chi = L(math.pi / 2.0) - L(2.0) * ops.atan2(tp, L(1.0))
    phi = chi
    for j, cj in enumerate(k["chi"], start=1):
        phi = phi + L(cj) * ops.sin(L(2.0 * j) * chi)
    lon = ops.atan2(xp, yp * L(-a)) * L(180.0 / math.pi) + L(k["lon0"])
    return lon, phi * L(a * 180.0 / math.pi)


# -- Sinusoidal (MODIS grid: GCTP sphere) -----------------------------------
#
# THE remote-sensing tiling grid (all MODIS land products). Spherical
# closed form — equal-area, trivial both directions; undefined only AT
# the poles (cos(phi)=0 in the inverse longitude).


def _sinu_consts(p: dict) -> dict:
    return dict(radius=p["radius"], lon0=p["lon0"],
                fe=p["fe"], fn=p["fn"])


def _sinu_forward(ops, lon, lat, k: dict):
    L = ops.lit
    phi = lat * L(math.pi / 180.0)
    x = L(k["fe"]) + L(k["radius"]) * (
        (lon - L(k["lon0"])) * L(math.pi / 180.0)
    ) * ops.cos(phi)
    y = L(k["fn"]) + lat * L(k["radius"] * math.pi / 180.0)
    return x, y


def _sinu_inverse(ops, x, y, k: dict):
    L = ops.lit
    phi = (y - L(k["fn"])) / L(k["radius"])
    lon = L(k["lon0"]) + ((x - L(k["fe"])) / (L(k["radius"]) * ops.cos(phi))
                          ) * L(180.0 / math.pi)
    return lon, phi * L(180.0 / math.pi)


# -- Generic transverse Mercator + one-parallel LCC (datum presets) --------
#
# Both are parameterizations of math that already exists: "tmerc" is
# the Krüger core that serves UTM with (lat0, lon0, k0, fe, fn, a, f)
# free — the lat0 origin folds into a precomputed false-northing
# offset (fn_eff = fn − k0·A·ξ0, ξ0 the rectifying latitude of lat0),
# so the rendered expression tree is IDENTICAL in shape to the UTM
# one; "lcc1" computes the 1SP constants n = sin(lat0),
# F = k0·m0/(n·t0^n) and reuses the 2SP forward/inverse bodies.


def _tmerc_consts(p: dict) -> dict:
    kr = _kruger_consts(p["f"], p.get("a", R))
    phi0 = math.radians(p["lat0"])
    s, e = math.sin(phi0), kr["e"]
    t0 = math.sinh(math.atanh(s) - e * math.atanh(e * s))
    xi_p0 = math.atan2(t0, 1.0)
    xi0 = xi_p0 + sum(
        aj * math.sin(2.0 * j * xi_p0)
        for j, aj in enumerate(kr["alpha"], start=1)
    )
    return dict(
        kr=kr,
        lon0=p["lon0"],
        k0=p["k0"],
        fe=p["fe"],
        fn_eff=p["fn"] - p["k0"] * kr["A"] * xi0,
    )


def _lcc1_consts(p: dict) -> dict:
    e = _conic_e(p["f"])
    a = p.get("a", R)
    phi0 = math.radians(p["lat0"])
    n = math.sin(phi0)
    m0, t0 = _py_m(phi0, e), _py_t(phi0, e)
    big_f = p["k0"] * m0 / (n * t0**n)
    rho0 = a * big_f * t0**n
    return dict(e=e, a=a, n=n, f_=big_f, rho0=rho0, lon0=p["lon0"],
                fe=p["fe"], fn=p["fn"], chi=_chi_series(e * e))


_CONIC_FNS = {
    "albers": (_albers_consts, _albers_forward, _albers_inverse),
    "lcc": (_lcc_consts, _lcc_forward, _lcc_inverse),
    "lcc1": (_lcc1_consts, _lcc_forward, _lcc_inverse),
    "stere": (_stere_consts, _stere_forward, _stere_inverse),
    "sinu": (_sinu_consts, _sinu_forward, _sinu_inverse),
    "tmerc": (_tmerc_consts, _kruger_forward, _kruger_inverse),
}


def _conic_of(crs: str) -> tuple:
    kind, params = CONIC_PRESETS[crs]
    consts_fn, fwd, inv = _CONIC_FNS[kind]
    return consts_fn(params), fwd, inv


def conic_forward_cols(
    lon: Column, lat: Column, crs: str
) -> tuple[Column, Column]:
    """(x, y) Columns for WGS84/GRS80 lon/lat under a preset conic
    CRS (``CONIC_PRESETS``: Albers EPSG:5070, LCC EPSG:2154)."""
    k, fwd, _ = _conic_of(crs)
    return fwd(_ColOps, lon, lat, k)


def conic_inverse_cols(
    x: Column, y: Column, crs: str
) -> tuple[Column, Column]:
    k, _, inv = _conic_of(crs)
    return inv(_ColOps, x, y, k)


def conic_forward_sql(
    lon_sql: str, lat_sql: str, crs: str
) -> tuple[str, str]:
    k, fwd, _ = _conic_of(crs)
    x, y = fwd(_SqlOps, _SqlVal(f"({lon_sql})"), _SqlVal(f"({lat_sql})"), k)
    return x.s, y.s


def conic_inverse_sql(x_sql: str, y_sql: str, crs: str) -> tuple[str, str]:
    k, _, inv = _conic_of(crs)
    lo, la = inv(_SqlOps, _SqlVal(f"({x_sql})"), _SqlVal(f"({y_sql})"), k)
    return lo.s, la.s


class _PyOps:
    """The op set over plain floats — the plan-time twin shares the
    exact formula code with the Column and SQL renderings."""

    lit = staticmethod(float)
    sin = staticmethod(math.sin)
    cos = staticmethod(math.cos)
    asin = staticmethod(math.asin)
    atan2 = staticmethod(math.atan2)
    log = staticmethod(math.log)
    exp = staticmethod(math.exp)
    sqrt = staticmethod(math.sqrt)


def conic_forward(lon: float, lat: float, crs: str) -> tuple[float, float]:
    k, fwd, _ = _conic_of(crs)
    return fwd(_PyOps, lon, lat, k)


def conic_inverse(x: float, y: float, crs: str) -> tuple[float, float]:
    k, _, inv = _conic_of(crs)
    return inv(_PyOps, x, y, k)


# -- Helmert datum shift (EPSG method 9606, position vector) ---------------
#
# WGS84 <-> local-datum geographic as three closed-form stages:
# geodetic -> geocentric XYZ (source ellipsoid), 7-parameter Helmert,
# geocentric -> geodetic (target ellipsoid, Bowring's one-step — no
# iteration, sub-µm for near-surface points). Each stage is rendered
# over the SAME abstract op set as the projections, and the stages are
# exposed INDIVIDUALLY: composing the whole chain into one column
# expression would multiply the Bowring tree into every reference the
# projection makes to lon/lat (the CollapseProject blowup documented
# in CLAUDE.md) — so the DataFrame path (:func:`datum_project_df`)
# materializes a select between stages, and oracle SQL uses CTEs.

WGS84_A, WGS84_F = R, _WGS84_F
_ARCSEC = math.pi / (180.0 * 3600.0)


def _ops_geocentric(ops, lon, lat, a: float, f: float):
    e2 = f * (2.0 - f)
    L = ops.lit
    lam = lon * L(math.pi / 180.0)
    phi = lat * L(math.pi / 180.0)
    s, c = ops.sin(phi), ops.cos(phi)
    nu = L(a) / ops.sqrt(L(1.0) - L(e2) * s * s)
    return (
        nu * c * ops.cos(lam),
        nu * c * ops.sin(lam),
        nu * L(1.0 - e2) * s,
    )


def _ops_helmert(ops, x, y, z, d: dict, inverse: bool):
    # position-vector convention; the inverse negates the parameters
    # (the standard small-angle reversibility of EPSG 9606)
    sgn = -1.0 if inverse else 1.0
    rx, ry, rz = (sgn * d[k] * _ARCSEC for k in ("rx", "ry", "rz"))
    m = 1.0 + sgn * d["ds"] * 1e-6
    L = ops.lit
    return (
        L(sgn * d["dx"]) + L(m) * (x - L(rz) * y + L(ry) * z),
        L(sgn * d["dy"]) + L(m) * (L(rz) * x + y - L(rx) * z),
        L(sgn * d["dz"]) + L(m) * (L(-ry) * x + L(rx) * y + z),
    )


def _ops_geodetic(ops, x, y, z, a: float, f: float):
    b = a * (1.0 - f)
    e2 = f * (2.0 - f)
    ep2 = e2 / (1.0 - e2)
    L = ops.lit
    p = ops.sqrt(x * x + y * y)
    th = ops.atan2(z * L(a), p * L(b))
    sth, cth = ops.sin(th), ops.cos(th)
    lat = ops.atan2(
        z + L(ep2 * b) * (sth * sth * sth),
        p - L(e2 * a) * (cth * cth * cth),
    )
    lon = ops.atan2(y, x)
    return lon * L(180.0 / math.pi), lat * L(180.0 / math.pi)


def geodetic_to_geocentric_cols(lon, lat, a: float, f: float):
    """(X, Y, Z) Columns on the (a, f) ellipsoid (height 0)."""
    return _ops_geocentric(_ColOps, lon, lat, a, f)


def helmert_cols(x, y, z, datum: str, inverse: bool = False):
    """Apply the named WGS84->datum Helmert to geocentric Columns;
    ``inverse=True`` runs datum->WGS84."""
    return _ops_helmert(_ColOps, x, y, z, DATUM_PRESETS[datum], inverse)


def geocentric_to_geodetic_cols(x, y, z, a: float, f: float):
    """(lon, lat) degree Columns from geocentric XYZ (Bowring)."""
    return _ops_geodetic(_ColOps, x, y, z, a, f)


def geodetic_to_geocentric_sql(lon_sql: str, lat_sql: str, a: float,
                               f: float) -> tuple[str, str, str]:
    r = _ops_geocentric(
        _SqlOps, _SqlVal(f"({lon_sql})"), _SqlVal(f"({lat_sql})"), a, f
    )
    return tuple(v.s for v in r)


def helmert_sql(x_sql: str, y_sql: str, z_sql: str, datum: str,
                inverse: bool = False) -> tuple[str, str, str]:
    r = _ops_helmert(
        _SqlOps, _SqlVal(f"({x_sql})"), _SqlVal(f"({y_sql})"),
        _SqlVal(f"({z_sql})"), DATUM_PRESETS[datum], inverse,
    )
    return tuple(v.s for v in r)


def geocentric_to_geodetic_sql(x_sql: str, y_sql: str, z_sql: str,
                               a: float, f: float) -> tuple[str, str]:
    r = _ops_geodetic(
        _SqlOps, _SqlVal(f"({x_sql})"), _SqlVal(f"({y_sql})"),
        _SqlVal(f"({z_sql})"), a, f,
    )
    return tuple(v.s for v in r)


def datum_shift(lon: float, lat: float, datum: str,
                inverse: bool = False) -> tuple[float, float]:
    """Plan-time WGS84 -> local-datum geographic shift (or back):
    the three stages composed over floats."""
    d = DATUM_PRESETS[datum]
    src = (d["a"], d["f"]) if inverse else (WGS84_A, WGS84_F)
    dst = (WGS84_A, WGS84_F) if inverse else (d["a"], d["f"])
    x, y, z = _ops_geocentric(_PyOps, lon, lat, *src)
    x, y, z = _ops_helmert(_PyOps, x, y, z, d, inverse)
    return _ops_geodetic(_PyOps, x, y, z, *dst)


def datum_project_df(
    df: DataFrame,
    lon_col: str,
    lat_col: str,
    crs: str,
    out_cols: tuple[str, str] = ("x", "y"),
) -> DataFrame:
    """WGS84 lon/lat columns -> projected coordinates of a
    datum-shifted preset CRS (e.g. EPSG:27700, EPSG:27572), as FOUR
    materializing select stages: geocentric -> Helmert -> local
    geographic -> projection. Each stage is a narrow projection, so
    Catalyst never substitutes the Bowring tree into the projection's
    many lon/lat references. Presets without a ``datum`` key project
    directly (one stage)."""
    kind, params = CONIC_PRESETS[crs]
    datum = params.get("datum")
    keep = [F.col(c) for c in df.columns]
    if datum is None:
        ex, ey = conic_forward_cols(F.col(lon_col), F.col(lat_col), crs)
        return df.select(*keep, ex.alias(out_cols[0]),
                         ey.alias(out_cols[1]))
    d = DATUM_PRESETS[datum]
    gx, gy, gz = geodetic_to_geocentric_cols(
        F.col(lon_col), F.col(lat_col), WGS84_A, WGS84_F
    )
    s1 = df.select(*keep, gx.alias("_gx"), gy.alias("_gy"),
                   gz.alias("_gz"))
    hx, hy, hz = helmert_cols(
        F.col("_gx"), F.col("_gy"), F.col("_gz"), datum
    )
    s2 = s1.select(*keep, hx.alias("_hx"), hy.alias("_hy"),
                   hz.alias("_hz"))
    llon, llat = geocentric_to_geodetic_cols(
        F.col("_hx"), F.col("_hy"), F.col("_hz"), d["a"], d["f"]
    )
    s3 = s2.select(*keep, llon.alias("_llon"), llat.alias("_llat"))
    ex, ey = conic_forward_cols(F.col("_llon"), F.col("_llat"), crs)
    return s3.select(*keep, ex.alias(out_cols[0]), ey.alias(out_cols[1]))


def datum_unproject_df(
    df: DataFrame,
    x_col: str,
    y_col: str,
    crs: str,
    out_cols: tuple[str, str] = ("lon", "lat"),
) -> DataFrame:
    """Projected coordinates of a datum-shifted preset CRS -> WGS84
    lon/lat columns — the staged inverse of :func:`datum_project_df`:
    unproject -> local geocentric -> inverse Helmert -> WGS84
    geodetic, one materializing select per stage."""
    kind, params = CONIC_PRESETS[crs]
    datum = params.get("datum")
    keep = [F.col(c) for c in df.columns]
    lo, la = conic_inverse_cols(F.col(x_col), F.col(y_col), crs)
    if datum is None:
        return df.select(*keep, lo.alias(out_cols[0]),
                         la.alias(out_cols[1]))
    d = DATUM_PRESETS[datum]
    s1 = df.select(*keep, lo.alias("_llon"), la.alias("_llat"))
    gx, gy, gz = geodetic_to_geocentric_cols(
        F.col("_llon"), F.col("_llat"), d["a"], d["f"]
    )
    s2 = s1.select(*keep, gx.alias("_gx"), gy.alias("_gy"),
                   gz.alias("_gz"))
    hx, hy, hz = helmert_cols(
        F.col("_gx"), F.col("_gy"), F.col("_gz"), datum, inverse=True
    )
    s3 = s2.select(*keep, hx.alias("_hx"), hy.alias("_hy"),
                   hz.alias("_hz"))
    wlon, wlat = geocentric_to_geodetic_cols(
        F.col("_hx"), F.col("_hy"), F.col("_hz"), WGS84_A, WGS84_F
    )
    return s3.select(*keep, wlon.alias(out_cols[0]),
                     wlat.alias(out_cols[1]))


def lonlat_to_xyz(lon: Column, lat: Column, zoom: int) -> tuple[Column, Column]:
    """Slippy-map (XYZ / Web-Mercator tiling grid) tile indices at a
    zoom level — the standard OSM/XYZ scheme every web tile sink
    addresses by: x = ⌊(lon+180)/360·2^z⌋,
    y = ⌊(1 − asinh(tan(lat·π/180))/π)/2·2^z⌋. Pure column math;
    the x axis is exact IEEE (one add, one divide, one scale), the y
    axis goes through tan/ln/sqrt — asinh is spelled out as
    ln(t + √(t²+1)) so engines without an asinh builtin (DuckDB)
    replay the identical expression. Valid for |lat| ≤ MAX_LAT."""
    n = float(1 << zoom)
    top = int(n) - 1
    # clamp to the grid: the domain edges (lon = 180, lat = -MAX_LAT)
    # land exactly on n and would otherwise address a nonexistent tile
    # row — standard slippy-map behavior puts them in tile n-1
    xt = F.least(
        F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(n)).cast("bigint"),
        F.lit(top).cast("bigint"),
    )
    t = F.tan(lat * F.lit(math.pi / 180.0))
    asinh_t = F.log(t + F.sqrt(t * t + F.lit(1.0)))
    yt = F.least(
        F.floor(
            (F.lit(1.0) - asinh_t / F.lit(math.pi)) / F.lit(2.0) * F.lit(n)
        ).cast("bigint"),
        F.lit(top).cast("bigint"),
    )
    return xt, yt


# -- Python twins (plan-time parameters: bbox tuples, WKB blobs) -----------


def lonlat_to_mercator(lon: float, lat: float) -> tuple[float, float]:
    return (
        lon * (R * math.pi / 180.0),
        R * math.log(math.tan(math.pi / 4.0 + lat * (math.pi / 360.0))),
    )


def mercator_to_lonlat(x: float, y: float) -> tuple[float, float]:
    return (
        x * (180.0 / (R * math.pi)),
        (2.0 * math.atan(math.exp(y / R)) - math.pi / 2.0) * (180.0 / math.pi),
    )


_PY_AXIS_FNS = {
    (EPSG_4326, EPSG_3857): lonlat_to_mercator,
    (EPSG_3857, EPSG_4326): mercator_to_lonlat,
}


def reproject_bbox(
    bbox: tuple[float, float, float, float], src_crs: str, dst_crs: str
) -> tuple[float, float, float, float]:
    """Plan-time twin of :func:`reproject_bbox_cols` for the query
    bbox parameter (UTM pairs: 4-corner envelope, same as the
    Column version)."""
    if src_crs == dst_crs:
        return bbox
    fn = _py_fn(src_crs, dst_crs)
    pp = _proj_pair(src_crs, dst_crs)
    if pp is not None:
        cands = _envelope_candidates(
            bbox[0], bbox[1], bbox[2], bbox[3],
            pp["clamp_x"], pp["clamp_y"],
        )
        pts = [fn(px, py) for px, py in cands]
        env = (
            min(p[0] for p in pts), min(p[1] for p in pts),
            max(p[0] for p in pts), max(p[1] for p in pts),
        )
        post = pp.get("post")
        return post(env, *bbox) if post else env
    x0, y0 = fn(bbox[0], bbox[1])
    x1, y1 = fn(bbox[2], bbox[3])
    return (x0, y0, x1, y1)


def _py_fn(src_crs: str, dst_crs: str):
    pp = _proj_pair(src_crs, dst_crs)
    if pp is not None:
        return pp["py"]
    try:
        return _PY_AXIS_FNS[(src_crs, dst_crs)]
    except KeyError:
        raise ValueError(
            f"unsupported CRS pair {src_crs} -> {dst_crs}; "
            f"supported: EPSG:4326 <-> EPSG:3857, "
            f"EPSG:4326 <-> EPSG:326xx/327xx (UTM), "
            f"EPSG:4326 <-> {sorted(CONIC_PRESETS)} (conic presets)"
        ) from None


def reproject_wkb(wkb: bytes, src_crs: str, dst_crs: str) -> bytes:
    """Reproject every coordinate in a WKB Polygon / MultiPolygon
    (both endiannesses), preserving ring structure and byte order —
    the query-geometry half of the reference's ``to_crs`` call, so the
    exact-intersects refine can run in the tile index's CRS."""
    if src_crs == dst_crs:
        return wkb
    fn = _py_fn(src_crs, dst_crs)
    out = bytearray(wkb)

    def xform_polygon(off: int) -> int:
        little = out[off]
        pre = "<" if little else ">"
        (gtype,) = struct.unpack_from(pre + "I", out, off + 1)
        if gtype != 3:
            raise ValueError(f"expected WKB Polygon, got type {gtype}")
        (n_rings,) = struct.unpack_from(pre + "I", out, off + 5)
        p = off + 9
        for _ in range(n_rings):
            (n_pts,) = struct.unpack_from(pre + "I", out, p)
            p += 4
            for _ in range(n_pts):
                x, y = struct.unpack_from(pre + "dd", out, p)
                struct.pack_into(pre + "dd", out, p, *fn(x, y))
                p += 16
        return p

    little = out[0]
    pre = "<" if little else ">"
    (gtype,) = struct.unpack_from(pre + "I", out, 1)
    if gtype == 3:
        xform_polygon(0)
    elif gtype == 6:
        (n_polys,) = struct.unpack_from(pre + "I", out, 5)
        p = 9
        for _ in range(n_polys):
            p = xform_polygon(p)
    else:
        raise ValueError(f"unsupported WKB geometry type {gtype}")
    return bytes(out)


# -- NTv2 grid-shift datum stage (EPSG method 9615) -------------------------
#
# The Helmert presets above are the ~1 m national method; survey-grade
# datum transforms (NAD27->NAD83, AGD->GDA, OSTN-class) distribute a
# GRID of per-node latitude/longitude shifts and bilinearly
# interpolate inside each cell. Two layers here:
#
# 1. the NTv2 binary container (.gsb): 16-byte named records, one
#    overview + one sub-grid header, float32 shift rows in seconds of
#    arc with LONGITUDE POSITIVE WEST, rows south->north and
#    east->west within a row (the Canadian NTv2 spec layout PROJ
#    reads). ``parse_ntv2_gsb``/``write_ntv2_gsb`` round-trip it.
# 2. the Spark stage: the grid is model-scale (national files are
#    single-digit MB at any data scale), so ``ntv2_cells`` folds the
#    node table into a per-cell corner table once and
#    ``ntv2_shift_df`` BROADCAST-joins it — index+fraction stage,
#    join, bilinear stage, each a materializing select (the same
#    CollapseProject discipline as datum_project_df). Points outside
#    the grid pass through unshifted with in_grid = 0 (the
#    no-coverage convention).

_GSB_INT_RECS = {"NUM_OREC", "NUM_SREC", "NUM_FILE", "GS_COUNT"}


def _gsb_rec_str(name: str, val: str) -> bytes:
    return name.ljust(8)[:8].encode() + val.ljust(8)[:8].encode()


def _gsb_rec_int(name: str, val: int) -> bytes:
    return name.ljust(8)[:8].encode() + struct.pack("<i4x", val)


def _gsb_rec_dbl(name: str, val: float) -> bytes:
    return name.ljust(8)[:8].encode() + struct.pack("<d", val)


def write_ntv2_gsb(meta: dict, lat_shift, lon_shift) -> bytes:
    """Single-sub-grid NTv2 .gsb bytes (little-endian).

    ``meta``: s_lat/n_lat/e_long/w_long/lat_inc/long_inc in SECONDS
    of arc, longitudes positive west. ``lat_shift``/``lon_shift``:
    row-major [nlat][nlon] float arrays in seconds, rows south->north,
    columns east->west (lon shift positive west, as the format
    stores it).
    """
    import numpy as np

    la = np.asarray(lat_shift, dtype="<f4")
    lo = np.asarray(lon_shift, dtype="<f4")
    if la.shape != lo.shape or la.ndim != 2:
        raise ValueError("shift arrays must share a 2-D shape")
    nlat, nlon = la.shape
    count = nlat * nlon
    out = [
        _gsb_rec_int("NUM_OREC", 11),
        _gsb_rec_int("NUM_SREC", 11),
        _gsb_rec_int("NUM_FILE", 1),
        _gsb_rec_str("GS_TYPE", "SECONDS"),
        _gsb_rec_str("VERSION", "NTv2.0"),
        _gsb_rec_str("SYSTEM_F", meta.get("system_f", "SRC")),
        _gsb_rec_str("SYSTEM_T", meta.get("system_t", "DST")),
        _gsb_rec_dbl("MAJOR_F", meta.get("major_f", 6378206.4)),
        _gsb_rec_dbl("MINOR_F", meta.get("minor_f", 6356583.8)),
        _gsb_rec_dbl("MAJOR_T", meta.get("major_t", WGS84_A)),
        _gsb_rec_dbl("MINOR_T", meta.get("minor_t",
                                         WGS84_A * (1.0 - _WGS84_F))),
        _gsb_rec_str("SUB_NAME", meta.get("sub_name", "GRID0")),
        _gsb_rec_str("PARENT", "NONE"),
        _gsb_rec_str("CREATED", "20240101"),
        _gsb_rec_str("UPDATED", "20240101"),
        _gsb_rec_dbl("S_LAT", meta["s_lat"]),
        _gsb_rec_dbl("N_LAT", meta["n_lat"]),
        _gsb_rec_dbl("E_LONG", meta["e_long"]),
        _gsb_rec_dbl("W_LONG", meta["w_long"]),
        _gsb_rec_dbl("LAT_INC", meta["lat_inc"]),
        _gsb_rec_dbl("LONG_INC", meta["long_inc"]),
        _gsb_rec_int("GS_COUNT", count),
    ]
    acc = np.zeros((nlat, nlon), dtype="<f4")
    rows = np.stack([la, lo, acc, acc], axis=-1)  # [nlat][nlon][4]
    out.append(rows.tobytes())
    out.append(_gsb_rec_str("END", ""))
    return b"".join(out)


def parse_ntv2_gsb(data: bytes) -> tuple[dict, "object", "object"]:
    """Parse a single-sub-grid NTv2 .gsb -> (meta, lat_shift,
    lon_shift) with the arrays in the format's own convention
    (seconds, lon positive west, rows south->north / east->west).
    Endianness is detected from NUM_OREC."""
    import numpy as np

    if data[:8].rstrip() != b"NUM_OREC":
        raise ValueError("not an NTv2 .gsb stream (missing NUM_OREC)")
    little = struct.unpack_from("<i", data, 8)[0] == 11
    pre = "<" if little else ">"
    if struct.unpack_from(pre + "i", data, 8)[0] != 11:
        raise ValueError("unsupported NUM_OREC")

    def read_records(off: int, n: int) -> tuple[dict, int]:
        rec = {}
        for _ in range(n):
            name = data[off : off + 8].decode("latin-1").strip()
            if name in _GSB_INT_RECS:
                rec[name] = struct.unpack_from(pre + "i", data, off + 8)[0]
            else:
                try:
                    rec[name] = struct.unpack_from(pre + "d", data,
                                                   off + 8)[0]
                except struct.error:
                    rec[name] = None
                # string records keep their text form too
                rec.setdefault("_raw", {})[name] = (
                    data[off + 8 : off + 16].decode("latin-1").strip()
                )
            off += 16
        return rec, off

    over, off = read_records(0, 11)
    if over.get("NUM_FILE", 1) != 1:
        raise NotImplementedError("multi-sub-grid NTv2 files")
    sub, off = read_records(off, 11)
    count = sub["GS_COUNT"]
    arr = np.frombuffer(data, dtype=pre + "f4", count=count * 4,
                        offset=off).reshape(count, 4)
    lat_inc, lon_inc = sub["LAT_INC"], sub["LONG_INC"]
    nlat = int(round((sub["N_LAT"] - sub["S_LAT"]) / lat_inc)) + 1
    nlon = int(round((sub["W_LONG"] - sub["E_LONG"]) / lon_inc)) + 1
    if nlat * nlon != count:
        raise ValueError("GS_COUNT disagrees with the grid extents")
    meta = {
        "s_lat": sub["S_LAT"], "n_lat": sub["N_LAT"],
        "e_long": sub["E_LONG"], "w_long": sub["W_LONG"],
        "lat_inc": lat_inc, "long_inc": lon_inc,
        "nlat": nlat, "nlon": nlon,
    }
    la = arr[:, 0].reshape(nlat, nlon)
    lo = arr[:, 1].reshape(nlat, nlon)
    return meta, la, lo


def gsb_to_grid(meta: dict, lat_shift, lon_shift) -> tuple[dict, list]:
    """Format convention -> engine convention: degrees, longitude
    positive EAST, node rows as (i, j, s_lat_sec, s_lon_sec_east)
    where i indexes latitude south->north and j longitude WEST->EAST.
    Returns (grid_meta, node_rows) ready for a Spark createDataFrame.
    """
    nlat, nlon = meta["nlat"], meta["nlon"]
    gm = {
        "lat0": meta["s_lat"] / 3600.0,
        "lon0": -meta["w_long"] / 3600.0,  # west-most in east-degrees
        "dlat": meta["lat_inc"] / 3600.0,
        "dlon": meta["long_inc"] / 3600.0,
        "nlat": nlat,
        "nlon": nlon,
    }
    rows = []
    for i in range(nlat):
        for j in range(nlon):
            # format column j' counts east->west; east-positive column
            # j counts west->east: j = nlon - 1 - j'
            jp = nlon - 1 - j
            rows.append(
                (i, j, float(lat_shift[i][jp]), -float(lon_shift[i][jp]))
            )
    return gm, rows


def ntv2_cells(nodes: DataFrame) -> DataFrame:
    """Node table (i, j, s_lat_sec, s_lon_sec) -> per-cell corner
    table (i, j, four corners x two components) via three model-scale
    self-joins — ONE broadcast join then serves any number of points.
    """
    n00 = nodes.select(
        "i", "j",
        F.col("s_lat_sec").alias("la00"), F.col("s_lon_sec").alias("lo00"),
    )
    n10 = nodes.select(
        (F.col("i") - 1).alias("i"), F.col("j").alias("j"),
        F.col("s_lat_sec").alias("la10"), F.col("s_lon_sec").alias("lo10"),
    )
    n01 = nodes.select(
        F.col("i").alias("i"), (F.col("j") - 1).alias("j"),
        F.col("s_lat_sec").alias("la01"), F.col("s_lon_sec").alias("lo01"),
    )
    n11 = nodes.select(
        (F.col("i") - 1).alias("i"), (F.col("j") - 1).alias("j"),
        F.col("s_lat_sec").alias("la11"), F.col("s_lon_sec").alias("lo11"),
    )
    return (
        n00.join(n10, ["i", "j"]).join(n01, ["i", "j"]).join(n11, ["i", "j"])
    )


def ntv2_shift_df(
    df: DataFrame,
    lon_col: str,
    lat_col: str,
    cells: DataFrame,
    grid_meta: dict,
    out_cols: tuple[str, str] = ("lon_out", "lat_out"),
) -> DataFrame:
    """Apply an NTv2 grid shift to lon/lat degree columns (engine
    convention: degrees, east-positive, ``gsb_to_grid`` output).

    Three stages, each a materializing select: (1) cell index +
    in-cell fractions, (2) broadcast join against the per-cell corner
    table, (3) bilinear interpolation in seconds and application at
    /3600. Out-of-grid points keep their coordinates (in_grid = 0).
    Emits ``s_lat_sec``/``s_lon_sec``/``in_grid`` beside the shifted
    coordinates.
    """
    lat0, lon0 = grid_meta["lat0"], grid_meta["lon0"]
    dlat, dlon = grid_meta["dlat"], grid_meta["dlon"]
    ni, nj = grid_meta["nlat"] - 1, grid_meta["nlon"] - 1  # cells
    keep = [F.col(c) for c in df.columns]
    gi = F.floor((F.col(lat_col) - F.lit(lat0)) / F.lit(dlat))
    gj = F.floor((F.col(lon_col) - F.lit(lon0)) / F.lit(dlon))
    s1 = df.select(
        *keep,
        F.when((gi >= 0) & (gi < ni) & (gj >= 0) & (gj < nj), 1)
        .otherwise(0)
        .alias("in_grid"),
        F.greatest(F.lit(0), F.least(F.lit(ni - 1), gi)).alias("i"),
        F.greatest(F.lit(0), F.least(F.lit(nj - 1), gj)).alias("j"),
    )
    s1 = s1.withColumn(
        "fy", (F.col(lat_col) - F.lit(lat0)) / F.lit(dlat) - F.col("i")
    ).withColumn(
        "fx", (F.col(lon_col) - F.lit(lon0)) / F.lit(dlon) - F.col("j")
    )
    joined = s1.join(F.broadcast(cells), ["i", "j"], "left")
    fx, fy = F.col("fx"), F.col("fy")
    w00 = (F.lit(1.0) - fx) * (F.lit(1.0) - fy)
    w10 = (F.lit(1.0) - fx) * fy
    w01 = fx * (F.lit(1.0) - fy)
    w11 = fx * fy
    s_lat = (
        w00 * F.col("la00") + w10 * F.col("la10")
        + w01 * F.col("la01") + w11 * F.col("la11")
    )
    s_lon = (
        w00 * F.col("lo00") + w10 * F.col("lo10")
        + w01 * F.col("lo01") + w11 * F.col("lo11")
    )
    ing = F.col("in_grid") == 1
    s2 = joined.select(
        *keep,
        "in_grid",
        F.when(ing, s_lat).otherwise(F.lit(0.0)).alias("s_lat_sec"),
        F.when(ing, s_lon).otherwise(F.lit(0.0)).alias("s_lon_sec"),
    )
    return s2.select(
        *[F.col(c) for c in df.columns],
        "in_grid",
        "s_lat_sec",
        "s_lon_sec",
        (F.col(lon_col) + F.col("s_lon_sec") / F.lit(3600.0)).alias(
            out_cols[0]
        ),
        (F.col(lat_col) + F.col("s_lat_sec") / F.lit(3600.0)).alias(
            out_cols[1]
        ),
    )


def ntv2_shift_py(
    lon: float, lat: float, grid_meta: dict, nodes: dict
) -> tuple[float, float]:
    """Float twin of :func:`ntv2_shift_df` (same formula shape).
    ``nodes`` maps (i, j) -> (s_lat_sec, s_lon_sec)."""
    lat0, lon0 = grid_meta["lat0"], grid_meta["lon0"]
    dlat, dlon = grid_meta["dlat"], grid_meta["dlon"]
    ni, nj = grid_meta["nlat"] - 1, grid_meta["nlon"] - 1
    gi = math.floor((lat - lat0) / dlat)
    gj = math.floor((lon - lon0) / dlon)
    if not (0 <= gi < ni and 0 <= gj < nj):
        return lon, lat
    fy = (lat - lat0) / dlat - gi
    fx = (lon - lon0) / dlon - gj
    la00, lo00 = nodes[(gi, gj)]
    la10, lo10 = nodes[(gi + 1, gj)]
    la01, lo01 = nodes[(gi, gj + 1)]
    la11, lo11 = nodes[(gi + 1, gj + 1)]
    w00 = (1.0 - fx) * (1.0 - fy)
    w10 = (1.0 - fx) * fy
    w01 = fx * (1.0 - fy)
    w11 = fx * fy
    s_lat = w00 * la00 + w10 * la10 + w01 * la01 + w11 * la11
    s_lon = w00 * lo00 + w10 * lo10 + w01 * lo01 + w11 * lo11
    return lon + s_lon / 3600.0, lat + s_lat / 3600.0
