"""OGC WKT1 CRS parser, from scratch.

Maps GDAL-style ``PROJCS`` / ``GEOGCS`` well-known text onto the engine's
parametric projection families (tmerc / lcc / pstereo / albers / merc) and
datum registry (moaray/geodesy.py), closing the reference's
``--outprojwktfile`` path for real: moamosaic feeds the file's WKT into
``osr.SpatialReference`` (ref mosaic.py:60-66, reproj.py:40-64); moaray now
parses the same text itself.

Scope (WKT1, the dialect GDAL emits by default):
- ``GEOGCS`` with ``DATUM[SPHEROID[a, 1/f], TOWGS84[...]]`` — arbitrary
  ellipsoid, optional 3- or 7-parameter Helmert shift (position-vector).
- ``PROJCS`` over such a GEOGCS with PROJECTION one of Transverse_Mercator,
  Lambert_Conformal_Conic_2SP/_1SP, Polar_Stereographic,
  Albers_Conic_Equal_Area, Mercator_1SP/_2SP, Sinusoidal.
- Linear UNIT must be metre; angular UNIT degree (what GDAL writes).
"""

from __future__ import annotations

from . import geodesy


class WktError(ValueError):
    pass


# ---------------------------------------------------------------------------
# tokenizer / recursive parser: NAME[arg, arg, ...] -> (name, [args])
# ---------------------------------------------------------------------------

class Node:
    __slots__ = ("name", "args")

    def __init__(self, name: str, args: list):
        self.name = name
        self.args = args

    def find(self, name: str) -> "Node | None":
        low = name.upper()
        for a in self.args:
            if isinstance(a, Node) and a.name.upper() == low:
                return a
        return None

    def find_all(self, name: str) -> list:
        low = name.upper()
        return [a for a in self.args
                if isinstance(a, Node) and a.name.upper() == low]


def _tokenize(text: str):
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c.isspace() or c == ",":
            i += 1
            continue
        if c in "[]()":
            yield ("[" if c in "[(" else "]"), None
            i += 1
            continue
        if c == '"':
            j = text.index('"', i + 1)
            yield "str", text[i + 1:j]
            i = j + 1
            continue
        j = i
        while j < n and text[j] not in '[](),"' and not text[j].isspace():
            j += 1
        word = text[i:j]
        try:
            yield "num", float(word)
        except ValueError:
            yield "word", word
        i = j


def parse_wkt_tree(text: str) -> Node:
    toks = list(_tokenize(text))
    pos = 0

    def parse_value():
        nonlocal pos
        kind, val = toks[pos]
        if kind in ("str", "num"):
            pos += 1
            return val
        if kind == "word":
            name = val
            pos += 1
            if pos < len(toks) and toks[pos][0] == "[":
                pos += 1  # consume [
                args = []
                while toks[pos][0] != "]":
                    args.append(parse_value())
                pos += 1  # consume ]
                return Node(name, args)
            return val
        raise WktError(f"unexpected token {kind} at {pos}")

    node = parse_value()
    if not isinstance(node, Node):
        raise WktError("WKT does not start with a keyword node")
    return node


# ---------------------------------------------------------------------------
# semantic mapping
# ---------------------------------------------------------------------------

# DATUM names GDAL emits -> the engine's canonical datum (which carries the
# published Helmert even when the WKT has no TOWGS84 node)
_DATUM_NAMES = {
    "WGS_1984": geodesy.WGS84_DATUM,
    "OSGB_1936": geodesy.OSGB36_DATUM,
    "OSGB36": geodesy.OSGB36_DATUM,
    "ORDNANCE_SURVEY_OF_GREAT_BRITAIN_1936": geodesy.OSGB36_DATUM,
    "NORTH_AMERICAN_DATUM_1927": geodesy.NAD27_DATUM,
    "NORTH_AMERICAN_DATUM_1983": geodesy.NAD83_DATUM,
    "EUROPEAN_TERRESTRIAL_REFERENCE_SYSTEM_1989": geodesy.ETRS89_DATUM,
    "EUROPEAN_DATUM_1950": geodesy.ED50_DATUM,
    "GEOCENTRIC_DATUM_OF_AUSTRALIA_1994": geodesy.GDA94_DATUM,
}


def _match_ellipsoid(a: float, inv_f: float) -> geodesy.Ellipsoid:
    f = 0.0 if inv_f == 0.0 else 1.0 / inv_f
    for ell in geodesy.ELLIPSOIDS.values():
        if abs(ell.a - a) < 1e-3 and abs(ell.f - f) < 1e-11:
            return ell
    return geodesy.Ellipsoid(f"WKT_{a:.3f}_{inv_f:.9f}", a, f)


def parse_geogcs(node: Node) -> geodesy.Datum:
    datum_node = node.find("DATUM")
    if datum_node is None:
        raise WktError("GEOGCS without DATUM")
    dname = str(datum_node.args[0]).strip().upper().replace(" ", "_")
    sph = datum_node.find("SPHEROID") or datum_node.find("ELLIPSOID")
    if sph is None:
        raise WktError("DATUM without SPHEROID")
    ell = _match_ellipsoid(float(sph.args[1]), float(sph.args[2]))
    towgs = datum_node.find("TOWGS84")
    if towgs is not None:
        vals = [float(v) for v in towgs.args[:7]]
        vals += [0.0] * (7 - len(vals))
        if any(vals):
            helm = geodesy.Helmert(vals[0], vals[1], vals[2],
                                   vals[3], vals[4], vals[5], vals[6])
        else:
            helm = None
        return geodesy.Datum(dname, ell, helm)
    known = _DATUM_NAMES.get(dname)
    if known is not None and known.ellipsoid == ell:
        return known
    # unknown datum without TOWGS84: null shift on its ellipsoid (GDAL's
    # stance when no transformation is supplied)
    return geodesy.Datum(dname, ell)


def _params(node: Node) -> dict:
    out = {}
    for p in node.find_all("PARAMETER"):
        out[str(p.args[0]).strip().lower()] = float(p.args[1])
    return out


def _check_metre(node: Node):
    unit = node.find("UNIT")
    if unit is not None and abs(float(unit.args[1]) - 1.0) > 1e-9:
        raise WktError(
            f"unsupported linear unit {unit.args[0]!r} "
            f"(factor {unit.args[1]}); only metre grids are supported"
        )


def parse_wkt_system(text: str):
    """(to_geo, from_geo, datum) triple for a WKT1 CRS — the same contract
    as tmerc._geodetic_system — or a ('geo', 'geo', datum) triple for a
    bare GEOGCS. Raises WktError for unsupported projections/units."""
    root = parse_wkt_tree(text)
    kind = root.name.upper()
    if kind in ("GEOGCS", "GEOGCRS"):
        return ("geo", "geo", parse_geogcs(root))
    if kind != "PROJCS":
        raise WktError(f"unsupported WKT root {root.name!r}")
    geog = root.find("GEOGCS")
    if geog is None:
        raise WktError("PROJCS without GEOGCS")
    datum = parse_geogcs(geog)
    proj_node = root.find("PROJECTION")
    if proj_node is None:
        raise WktError("PROJCS without PROJECTION")
    proj = str(proj_node.args[0]).strip().lower()
    pp = _params(root)
    _check_metre(root)
    fe = pp.get("false_easting", 0.0)
    fn = pp.get("false_northing", 0.0)
    lat0 = pp.get("latitude_of_origin", pp.get("latitude_of_center", 0.0))
    lon0 = pp.get("central_meridian", pp.get("longitude_of_center", 0.0))

    if proj == "transverse_mercator":
        from .tmerc import tm_forward, tm_inverse

        k0 = pp.get("scale_factor", 1.0)
        ell = datum.ellipsoid
        return (
            lambda xs, ys: tm_inverse(xs, ys, lon0, k0, fe, fn, ell, lat0),
            lambda lat, lon: tm_forward(lat, lon, lon0, k0, fe, fn,
                                        ell, lat0),
            datum,
        )
    if proj in ("lambert_conformal_conic_2sp", "lambert_conformal_conic",
                "lambert_conformal_conic_1sp"):
        from .lcc import LccParams, lcc_forward, lcc_inverse

        lat1 = pp.get("standard_parallel_1", lat0)
        lat2 = pp.get("standard_parallel_2", lat1)
        if proj == "lambert_conformal_conic_1sp":
            lat1 = lat2 = lat0
            if abs(pp.get("scale_factor", 1.0) - 1.0) > 1e-12:
                raise WktError(
                    "Lambert_Conformal_Conic_1SP with scale_factor != 1 "
                    "is not supported (recast as 2SP)"
                )
        p = LccParams(lat1, lat2, lat0, lon0, fe, fn, datum)
        return (
            lambda xs, ys: lcc_inverse(xs, ys, p),
            lambda lat, lon: lcc_forward(lat, lon, p),
            datum,
        )
    if proj == "polar_stereographic":
        from .pstereo import PolarParams, ps_forward, ps_inverse

        # GDAL encodes Variant B with latitude_of_origin = standard
        # parallel; Variant A with latitude_of_origin = +-90 + scale_factor
        if abs(lat0) == 90.0:
            p = PolarParams(lat0, lat0, lon0, fe, fn,
                            k0=pp.get("scale_factor", 1.0), datum=datum)
        else:
            pole = 90.0 if lat0 > 0 else -90.0
            p = PolarParams(pole, lat0, lon0, fe, fn, datum=datum)
        return (
            lambda xs, ys: ps_inverse(xs, ys, p),
            lambda lat, lon: ps_forward(lat, lon, p),
            datum,
        )
    if proj == "albers_conic_equal_area":
        from .albers import AlbersParams, albers_forward, albers_inverse

        p = AlbersParams(pp.get("standard_parallel_1", lat0),
                         pp.get("standard_parallel_2", lat0),
                         lat0, lon0, fe, fn, datum)
        return (
            lambda xs, ys: albers_inverse(xs, ys, p),
            lambda lat, lon: albers_forward(lat, lon, p),
            datum,
        )
    if proj == "sinusoidal":
        from .merc import merc_system

        if datum.ellipsoid.f != 0.0:
            raise WktError(
                "only spherical Sinusoidal (SPHEROID inv_f=0, the MODIS "
                "grid) is supported"
            )
        m = merc_system(f"SINU:{lon0},{datum.ellipsoid.a}")
        return (m[0], m[1], datum)
    if proj in ("mercator_1sp", "mercator_2sp", "mercator_auxiliary_sphere"):
        from .merc import merc_system

        auth = root.find("AUTHORITY")
        code = (str(auth.args[1]) if auth is not None and
                len(auth.args) > 1 else "")
        if code in ("3857", "900913") or proj == "mercator_auxiliary_sphere":
            m = merc_system("EPSG:3857")  # spherical web-mercator formulas
            return (m[0], m[1], datum)
        if abs(datum.ellipsoid.e - geodesy.WGS84.e) > 1e-9:
            raise WktError(
                "ellipsoidal Mercator is implemented on the WGS84 "
                "ellipsoid only"
            )
        if proj == "mercator_2sp":
            lat_ts = pp.get("standard_parallel_1", 0.0)
        else:
            if abs(pp.get("scale_factor", 1.0) - 1.0) > 1e-12:
                raise WktError(
                    "Mercator_1SP with scale_factor != 1 is not supported "
                    "(recast as 2SP with the equivalent standard parallel)"
                )
            lat_ts = 0.0
        m = merc_system(f"MERC:{lat_ts},{lon0},{fe},{fn}")
        return (m[0], m[1], datum)
    raise WktError(f"unsupported PROJECTION {proj_node.args[0]!r}")


def is_wkt(crs: str) -> bool:
    head = crs.lstrip()[:12].upper()
    return head.startswith(("PROJCS", "GEOGCS", "GEOGCRS", "PROJCRS"))
