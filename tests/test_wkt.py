"""WKT1 CRS parsing (moaray/wkt.py): GDAL-style PROJCS/GEOGCS text routes
through the same parametric projection families as the EPSG registry —
the reference's --outprojwktfile path (ref mosaic.py:60-66) done for real."""

import numpy as np
import pytest

from moaray import geodesy
from moaray.crs import point_transformer
from moaray.wkt import WktError, is_wkt, parse_wkt_system, parse_wkt_tree

OSGB_WKT = """PROJCS["OSGB 1936 / British National Grid",
    GEOGCS["OSGB 1936",
        DATUM["OSGB_1936",
            SPHEROID["Airy 1830",6377563.396,299.3249646],
            TOWGS84[446.448,-125.157,542.06,0.15,0.247,0.842,-20.489]],
        PRIMEM["Greenwich",0],
        UNIT["degree",0.0174532925199433]],
    PROJECTION["Transverse_Mercator"],
    PARAMETER["latitude_of_origin",49],
    PARAMETER["central_meridian",-2],
    PARAMETER["scale_factor",0.9996012717],
    PARAMETER["false_easting",400000],
    PARAMETER["false_northing",-100000],
    UNIT["metre",1],
    AUTHORITY["EPSG","27700"]]"""

LAMBERT93_WKT = """PROJCS["RGF93 / Lambert-93",
    GEOGCS["RGF93",
        DATUM["Reseau_Geodesique_Francais_1993",
            SPHEROID["GRS 1980",6378137,298.257222101],
            TOWGS84[0,0,0,0,0,0,0]],
        PRIMEM["Greenwich",0],
        UNIT["degree",0.0174532925199433]],
    PROJECTION["Lambert_Conformal_Conic_2SP"],
    PARAMETER["standard_parallel_1",49],
    PARAMETER["standard_parallel_2",44],
    PARAMETER["latitude_of_origin",46.5],
    PARAMETER["central_meridian",3],
    PARAMETER["false_easting",700000],
    PARAMETER["false_northing",6600000],
    UNIT["metre",1]]"""

NSIDC_WKT = """PROJCS["NSIDC Sea Ice Polar Stereographic North",
    GEOGCS["WGS 84",
        DATUM["WGS_1984",
            SPHEROID["WGS 84",6378137,298.257223563]],
        PRIMEM["Greenwich",0],
        UNIT["degree",0.0174532925199433]],
    PROJECTION["Polar_Stereographic"],
    PARAMETER["latitude_of_origin",70],
    PARAMETER["central_meridian",-45],
    PARAMETER["false_easting",0],
    PARAMETER["false_northing",0],
    UNIT["metre",1]]"""

CONUS_ALBERS_WKT = """PROJCS["NAD83 / Conus Albers",
    GEOGCS["NAD83",
        DATUM["North_American_Datum_1983",
            SPHEROID["GRS 1980",6378137,298.257222101]],
        PRIMEM["Greenwich",0],
        UNIT["degree",0.0174532925199433]],
    PROJECTION["Albers_Conic_Equal_Area"],
    PARAMETER["latitude_of_center",23],
    PARAMETER["longitude_of_center",-96],
    PARAMETER["standard_parallel_1",29.5],
    PARAMETER["standard_parallel_2",45.5],
    PARAMETER["false_easting",0],
    PARAMETER["false_northing",0],
    UNIT["metre",1]]"""

WGS84_GEOGCS = """GEOGCS["WGS 84",
    DATUM["WGS_1984",SPHEROID["WGS 84",6378137,298.257223563]],
    PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]]"""


def test_tree_parser():
    root = parse_wkt_tree(OSGB_WKT)
    assert root.name == "PROJCS"
    assert root.args[0] == "OSGB 1936 / British National Grid"
    g = root.find("GEOGCS")
    sph = g.find("DATUM").find("SPHEROID")
    assert sph.args[1] == 6377563.396
    assert len(root.find_all("PARAMETER")) == 5
    assert is_wkt(OSGB_WKT) and is_wkt(WGS84_GEOGCS)
    assert not is_wkt("EPSG:27700")


def test_osgb_wkt_matches_epsg_27700():
    """The WKT route and the EPSG registry route must agree to the
    rounding of the TOWGS84 node GDAL writes (cm-level)."""
    e = np.array([651409.903, 400000.0])
    n = np.array([313177.270, -100000.0])
    via_wkt = point_transformer(OSGB_WKT, "EPSG:4326")
    via_epsg = point_transformer("EPSG:27700", "EPSG:4326")
    xw, yw = via_wkt(e, n)
    xe, ye = via_epsg(e, n)
    assert np.abs(xw - xe).max() < 1e-6  # deg (~ 5 cm)
    assert np.abs(yw - ye).max() < 1e-6
    # and the projection core is EXACT (same Airy TM constants): WKT CRS
    # <-> EPSG:27700 round-trips the grid numbers through the pivot
    tr = point_transformer(OSGB_WKT, "EPSG:27700")
    e2, n2 = tr(e, n)
    assert np.abs(e2 - e).max() < 0.05  # TOWGS84 rounding only
    assert np.abs(n2 - n).max() < 0.05


def test_lambert93_wkt_matches_epsg_2154():
    tr = point_transformer(LAMBERT93_WKT, "EPSG:2154")
    x, y = tr(np.array([700000.0, 652469.0]),
              np.array([6600000.0, 6862035.0]))
    assert abs(x[0] - 700000.0) < 1e-3 and abs(y[0] - 6600000.0) < 1e-3
    assert abs(x[1] - 652469.0) < 1e-3 and abs(y[1] - 6862035.0) < 1e-3


def test_nsidc_wkt_matches_epsg_3413():
    tr = point_transformer(NSIDC_WKT, "EPSG:3413")
    x, y = tr(np.array([300000.0, -1200000.0]),
              np.array([-1500000.0, 2000000.0]))
    assert abs(x[0] - 300000.0) < 1e-6 and abs(y[0] + 1500000.0) < 1e-6
    assert abs(x[1] + 1200000.0) < 1e-6 and abs(y[1] - 2000000.0) < 1e-6


def test_conus_albers_wkt_matches_epsg_5070():
    tr = point_transformer(CONUS_ALBERS_WKT, "EPSG:5070")
    x, y = tr(np.array([-500000.0]), np.array([1500000.0]))
    assert abs(x[0] + 500000.0) < 1e-6 and abs(y[0] - 1500000.0) < 1e-6


def test_bare_geogcs_is_wgs84_geographic():
    tr = point_transformer(WGS84_GEOGCS, "EPSG:32617")
    ref = point_transformer("EPSG:4326", "EPSG:32617")
    x, y = tr(np.array([-80.0]), np.array([40.0]))
    xr, yr = ref(np.array([-80.0]), np.array([40.0]))
    assert abs(x[0] - xr[0]) < 1e-9 and abs(y[0] - yr[0]) < 1e-9
    from moaray.tmerc import is_geographic
    assert is_geographic(WGS84_GEOGCS)


def test_unsupported_units_and_projections_raise():
    feet = OSGB_WKT.replace('UNIT["metre",1]',
                            'UNIT["US survey foot",0.3048006096012192]')
    with pytest.raises(WktError, match="unit"):
        parse_wkt_system(feet)
    bad = OSGB_WKT.replace("Transverse_Mercator", "Krovak")
    with pytest.raises(WktError, match="unsupported PROJECTION"):
        parse_wkt_system(bad)


def test_towgs84_three_param_and_absent():
    wkt3 = """GEOGCS["NAD27",DATUM["North_American_Datum_1927",
        SPHEROID["Clarke 1866",6378206.4,294.978698213898],
        TOWGS84[-8,160,176]],PRIMEM["Greenwich",0],
        UNIT["degree",0.0174532925199433]]"""
    _, _, d = parse_wkt_system(wkt3)
    assert d.to_wgs84_params.ty == 160.0 and d.to_wgs84_params.rz == 0.0
    # no TOWGS84 but a known DATUM name: canonical datum (with Helmert)
    osgb_nohelm = OSGB_WKT.replace(
        ",\n            TOWGS84[446.448,-125.157,542.06,0.15,0.247,"
        "0.842,-20.489]", "")
    assert "TOWGS84" not in osgb_nohelm
    _, _, d2 = parse_wkt_system(osgb_nohelm)
    assert d2 is geodesy.OSGB36_DATUM
    # unknown datum, no TOWGS84: null shift on the parsed ellipsoid
    anon = osgb_nohelm.replace("OSGB_1936", "Mystery_Datum_9")
    _, _, d3 = parse_wkt_system(anon)
    assert d3.to_wgs84_params is None
    assert abs(d3.ellipsoid.a - 6377563.396) < 1e-6


def test_mosaic_via_wkt_out_crs(ray_session, tmp_path):
    """End-to-end: MosaicConfig(out_crs=<WKT text>) produces the identical
    grid + pixels as out_crs='EPSG:27700' (the --outprojwktfile workflow,
    ref mosaic.py:60-66)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from moaray import MosaicConfig, codecs, do_mosaic
    from moaray.pipelines.mosaic import mosaic_array

    size = 48
    ramp = np.tile(np.arange(size, dtype=np.uint16), (size, 1))
    ramp[:, 0] = 0
    gt = (-2.04, 0.0014, 0.0, 52.52, 0.0, -0.0009)
    tbl = pa.table({
        "image_id": pa.array(["uk0"], pa.string()),
        "bytes": pa.array([codecs.encode(ramp, "z16")], pa.binary()),
        "w": pa.array([size], pa.int32()),
        "h": pa.array([size], pa.int32()),
        "fmt": pa.array(["z16"], pa.string()),
        "gt": pa.array([list(gt)], pa.list_(pa.float64(), 6)),
        "crs": pa.array(["EPSG:4326"], pa.string()),
        "nullval": pa.array([0.0], pa.float64()),
        "seq": pa.array([0], pa.int64()),
    })
    path = str(tmp_path / "uk")
    os.makedirs(path)
    pq.write_table(tbl, os.path.join(path, "p.parquet"))

    # exact-equality comparison needs identical Helmert params on both
    # routes: write the registry's (unrounded) values into the WKT
    wkt_exact = OSGB_WKT.replace(
        "TOWGS84[446.448,-125.157,542.06,0.15,0.247,0.842,-20.489]",
        "TOWGS84[446.448,-125.157,542.060,0.1502,0.2470,0.8421,-20.4894]",
    )

    def run(crs):
        cfg = MosaicConfig(blocksize=32, out_crs=crs, out_xres=100.0,
                           out_yres=100.0, resample="near",
                           do_pyramids=False, do_stats=False)
        res = do_mosaic(path, cfg)
        return res.grid, mosaic_array(res.tiles_ds, res.grid)

    g_wkt, a_wkt = run(wkt_exact)
    g_epsg, a_epsg = run("EPSG:27700")
    assert g_wkt.transform == g_epsg.transform
    assert (g_wkt.nrows, g_wkt.ncols) == (g_epsg.nrows, g_epsg.ncols)
    assert np.array_equal(a_wkt, a_epsg)
    assert (a_wkt != 0).sum() > 500
