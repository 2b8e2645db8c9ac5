"""WKT2 (ISO 19162) CRS input: bit-equality with the EPSG / WKT1 paths
across the implemented projection families, unit conversion, BOUNDCRS
datum shifts, axis/unit/meridian refusals, and a WKT2-only dataset
elevation differential.

The reference accepts WKT2 through pyproj.CRS.from_user_input
(/root/reference/opentopodata/utils.py:39-46); these tests pin that the
WKT2 grammar lands on the SAME projection objects as the EPSG and WKT1
spellings, so a fresh .prj export behaves identically to its code."""

from __future__ import annotations

import math

import numpy as np
import pytest

from opentopodata_spark import crs

DEG = 'ANGLEUNIT["degree",0.0174532925199433]'
M = 'LENGTHUNIT["metre",1]'

LATS = np.array([48.8566, 40.0, -33.9, 60.1, 5.0, -5.0, 70.0])
LONS = np.array([2.3522, -3.7, 18.4, 24.9, -60.0, 140.0, -150.0])


def _projcrs(name, base_ell, method, params, axes=None, extra=""):
    axes = axes or ('AXIS["(E)",east,ORDER[1]],AXIS["(N)",north,ORDER[2]]')
    plist = ",".join(
        f'PARAMETER["{k}",{v!r}]' for k, v in params
    )
    return (
        f'PROJCRS["{name}",BASEGEOGCRS["base",DATUM["d",{base_ell}],'
        f'PRIMEM["Greenwich",0,{DEG}]],CONVERSION["conv",{method},{plist}]'
        f',CS[Cartesian,2],{axes},{M}{extra}]'
    )


WGS84_ELL = f'ELLIPSOID["WGS 84",6378137,298.257223563,{M}]'
GRS80_ELL = f'ELLIPSOID["GRS 1980",6378137,298.257222101,{M}]'
BESSEL_ELL = f'ELLIPSOID["Bessel 1841",6377397.155,299.1528128,{M}]'
INTL_ELL = f'ELLIPSOID["International 1924",6378388,297,{M}]'
CLARKE_ELL = f'ELLIPSOID["Clarke 1880 (IGN)",6378249.2,293.4660213,{M}]'


def _eq(wkt2, other_kw, tol=0.0):
    x1, y1 = crs.reproject_latlons(LATS, LONS, wkt=wkt2)
    x2, y2 = crs.reproject_latlons(LATS, LONS, **other_kw)
    if tol == 0.0:
        assert np.array_equal(x1, x2) and np.array_equal(y1, y2)
    else:
        np.testing.assert_allclose(x1, x2, atol=tol)
        np.testing.assert_allclose(y1, y2, atol=tol)


# ---------------------------------------------------------------------------
# family-by-family bit-equality with the EPSG path
# ---------------------------------------------------------------------------

def test_utm_tm_vs_epsg():
    w = _projcrs("UTM31", WGS84_ELL, 'METHOD["Transverse Mercator",ID["EPSG",9807]]', [
        ("Latitude of natural origin", 0),
        ("Longitude of natural origin", 3),
        ("Scale factor at natural origin", 0.9996),
        ("False easting", 500000), ("False northing", 0)])
    _eq(w, dict(epsg=32631))


def test_laea_vs_epsg():
    w = _projcrs("LAEA", GRS80_ELL, 'METHOD["Lambert Azimuthal Equal Area",ID["EPSG",9820]]', [
        ("Latitude of natural origin", 52),
        ("Longitude of natural origin", 10),
        ("False easting", 4321000), ("False northing", 3210000)])
    _eq(w, dict(epsg=3035))


def test_web_mercator_vs_epsg():
    w = _projcrs(
        "webm", WGS84_ELL,
        'METHOD["Popular Visualisation Pseudo Mercator",ID["EPSG",1024]]',
        [("Latitude of natural origin", 0),
         ("Longitude of natural origin", 0),
         ("False easting", 0), ("False northing", 0)])
    _eq(w, dict(epsg=3857))


def test_world_mercator_vs_epsg():
    w = _projcrs("merc", WGS84_ELL, 'METHOD["Mercator (variant A)",ID["EPSG",9804]]', [
        ("Latitude of natural origin", 0),
        ("Longitude of natural origin", 0),
        ("Scale factor at natural origin", 1),
        ("False easting", 0), ("False northing", 0)])
    _eq(w, dict(epsg=3395))


# ---------------------------------------------------------------------------
# bit-equality with the WKT1 path (same parameters, two grammars)
# ---------------------------------------------------------------------------

WKT1_CASES = {
    "lcc2sp": (
        '''PROJCS["LCC2",GEOGCS["g",DATUM["d",SPHEROID["GRS80",6378137,298.257222101]],PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],PROJECTION["Lambert_Conformal_Conic_2SP"],PARAMETER["latitude_of_origin",46.5],PARAMETER["central_meridian",3],PARAMETER["standard_parallel_1",49],PARAMETER["standard_parallel_2",44],PARAMETER["false_easting",700000],PARAMETER["false_northing",6600000],UNIT["metre",1]]''',
        lambda: _projcrs("LCC2", GRS80_ELL, 'METHOD["Lambert Conic Conformal (2SP)",ID["EPSG",9802]]', [
            ("Latitude of false origin", 46.5),
            ("Longitude of false origin", 3),
            ("Latitude of 1st standard parallel", 49),
            ("Latitude of 2nd standard parallel", 44),
            ("Easting at false origin", 700000),
            ("Northing at false origin", 6600000)])),
    "albers": (
        '''PROJCS["AEA",GEOGCS["g",DATUM["d",SPHEROID["GRS80",6378137,298.257222101]],PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],PROJECTION["Albers_Conic_Equal_Area"],PARAMETER["latitude_of_center",23],PARAMETER["longitude_of_center",-96],PARAMETER["standard_parallel_1",29.5],PARAMETER["standard_parallel_2",45.5],PARAMETER["false_easting",0],PARAMETER["false_northing",0],UNIT["metre",1]]''',
        lambda: _projcrs("AEA", GRS80_ELL, 'METHOD["Albers Equal Area",ID["EPSG",9822]]', [
            ("Latitude of false origin", 23),
            ("Longitude of false origin", -96),
            ("Latitude of 1st standard parallel", 29.5),
            ("Latitude of 2nd standard parallel", 45.5),
            ("Easting at false origin", 0),
            ("Northing at false origin", 0)])),
    "oblique_stereo": (
        '''PROJCS["RD",GEOGCS["g",DATUM["d",SPHEROID["Bessel",6377397.155,299.1528128]],PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],PROJECTION["Oblique_Stereographic"],PARAMETER["latitude_of_origin",52.15616055555555],PARAMETER["central_meridian",5.38763888888889],PARAMETER["scale_factor",0.9999079],PARAMETER["false_easting",155000],PARAMETER["false_northing",463000],UNIT["metre",1]]''',
        lambda: _projcrs("RD", BESSEL_ELL, 'METHOD["Oblique Stereographic",ID["EPSG",9809]]', [
            ("Latitude of natural origin", 52.15616055555555),
            ("Longitude of natural origin", 5.38763888888889),
            ("Scale factor at natural origin", 0.9999079),
            ("False easting", 155000), ("False northing", 463000)])),
    "polar_a": (
        '''PROJCS["UPS",GEOGCS["g",DATUM["d",SPHEROID["WGS84",6378137,298.257223563]],PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],PROJECTION["Polar_Stereographic"],PARAMETER["latitude_of_origin",90],PARAMETER["central_meridian",0],PARAMETER["scale_factor",0.994],PARAMETER["false_easting",2000000],PARAMETER["false_northing",2000000],UNIT["metre",1]]''',
        lambda: _projcrs("UPS", WGS84_ELL, 'METHOD["Polar Stereographic (variant A)",ID["EPSG",9810]]', [
            ("Latitude of natural origin", 90),
            ("Longitude of natural origin", 0),
            ("Scale factor at natural origin", 0.994),
            ("False easting", 2000000), ("False northing", 2000000)])),
    "polar_b": (
        '''PROJCS["NSIDC",GEOGCS["g",DATUM["d",SPHEROID["WGS84",6378137,298.257223563]],PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],PROJECTION["Polar_Stereographic"],PARAMETER["latitude_of_origin",-71],PARAMETER["central_meridian",70],PARAMETER["false_easting",6000000],PARAMETER["false_northing",6000000],UNIT["metre",1]]''',
        lambda: _projcrs("NSIDC", WGS84_ELL, 'METHOD["Polar Stereographic (variant B)",ID["EPSG",9829]]', [
            ("Latitude of standard parallel", -71),
            ("Longitude of origin", 70),
            ("False easting", 6000000), ("False northing", 6000000)])),
    "hotine_b": (
        '''PROJCS["RSO",GEOGCS["g",DATUM["d",SPHEROID["GRS80",6378137,298.257222101]],PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],PROJECTION["Hotine_Oblique_Mercator_Azimuth_Center"],PARAMETER["latitude_of_center",4],PARAMETER["longitude_of_center",102.25],PARAMETER["azimuth",323.0257964666666],PARAMETER["rectified_grid_angle",323.1301023611111],PARAMETER["scale_factor",0.99984],PARAMETER["false_easting",804671],PARAMETER["false_northing",0],UNIT["metre",1]]''',
        lambda: _projcrs("RSO", GRS80_ELL, 'METHOD["Hotine Oblique Mercator (variant B)",ID["EPSG",9815]]', [
            ("Latitude of projection centre", 4),
            ("Longitude of projection centre", 102.25),
            ("Azimuth at projection centre", 323.0257964666666),
            ("Angle from Rectified to Skew Grid", 323.1301023611111),
            ("Scale factor at projection centre", 0.99984),
            ("Easting at projection centre", 804671),
            ("Northing at projection centre", 0)])),
    "hotine_a": (
        '''PROJCS["HOM-A",GEOGCS["g",DATUM["d",SPHEROID["Intl",6378388,297]],PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],PROJECTION["Hotine_Oblique_Mercator"],PARAMETER["latitude_of_center",4],PARAMETER["longitude_of_center",115],PARAMETER["azimuth",53.31582047222222],PARAMETER["rectified_grid_angle",53.13010236111111],PARAMETER["scale_factor",0.99984],PARAMETER["false_easting",0],PARAMETER["false_northing",0],UNIT["metre",1]]''',
        lambda: _projcrs("HOM-A", INTL_ELL, 'METHOD["Hotine Oblique Mercator (variant A)",ID["EPSG",9812]]', [
            ("Latitude of projection centre", 4),
            ("Longitude of projection centre", 115),
            ("Azimuth of initial line", 53.31582047222222),
            ("Angle from Rectified to Skew Grid", 53.13010236111111),
            ("Scale factor on initial line", 0.99984),
            ("False easting", 0), ("False northing", 0)])),
    "cassini": (
        '''PROJCS["Cass",GEOGCS["g",DATUM["d",SPHEROID["Clarke1880",6378249.2,293.4660213]],PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],PROJECTION["Cassini_Soldner"],PARAMETER["latitude_of_origin",10.44166666666667],PARAMETER["central_meridian",-61.33333333333334],PARAMETER["false_easting",86501.46],PARAMETER["false_northing",65379.13],UNIT["metre",1]]''',
        lambda: _projcrs("Cass", CLARKE_ELL, 'METHOD["Cassini-Soldner",ID["EPSG",9806]]', [
            ("Latitude of natural origin", 10.44166666666667),
            ("Longitude of natural origin", -61.33333333333334),
            ("False easting", 86501.46), ("False northing", 65379.13)])),
    "bonne": (
        '''PROJCS["Bonne",GEOGCS["g",DATUM["d",SPHEROID["Clarke1880",6378249.2,293.4660213]],PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],PROJECTION["Bonne"],PARAMETER["standard_parallel_1",45],PARAMETER["central_meridian",0],PARAMETER["false_easting",0],PARAMETER["false_northing",0],UNIT["metre",1]]''',
        lambda: _projcrs("Bonne", CLARKE_ELL, 'METHOD["Bonne",ID["EPSG",9827]]', [
            ("Latitude of natural origin", 45),
            ("Longitude of natural origin", 0),
            ("False easting", 0), ("False northing", 0)])),
    "mollweide": (
        '''PROJCS["Moll",GEOGCS["g",DATUM["d",SPHEROID["WGS84",6378137,298.257223563]],PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],PROJECTION["Mollweide"],PARAMETER["central_meridian",0],PARAMETER["false_easting",0],PARAMETER["false_northing",0],UNIT["metre",1]]''',
        lambda: _projcrs("Moll", WGS84_ELL, 'METHOD["Mollweide"]', [
            ("Longitude of natural origin", 0),
            ("False easting", 0), ("False northing", 0)])),
    "sinusoidal": (
        '''PROJCS["Sinu",GEOGCS["g",DATUM["d",SPHEROID["Sphere",6371007.181,0]],PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],PROJECTION["Sinusoidal"],PARAMETER["central_meridian",0],PARAMETER["false_easting",0],PARAMETER["false_northing",0],UNIT["metre",1]]''',
        lambda: _projcrs(
            "Sinu", f'ELLIPSOID["Sphere",6371007.181,0,{M}]',
            'METHOD["Sinusoidal"]', [
                ("Longitude of natural origin", 0),
                ("False easting", 0), ("False northing", 0)])),
    "aeqd": (
        '''PROJCS["AEQD",GEOGCS["g",DATUM["d",SPHEROID["WGS84",6378137,298.257223563]],PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],PROJECTION["Azimuthal_Equidistant"],PARAMETER["latitude_of_center",40],PARAMETER["longitude_of_center",-100],PARAMETER["false_easting",0],PARAMETER["false_northing",0],UNIT["metre",1]]''',
        lambda: _projcrs("AEQD", WGS84_ELL, 'METHOD["Azimuthal Equidistant",ID["EPSG",1125]]', [
            ("Latitude of natural origin", 40),
            ("Longitude of natural origin", -100),
            ("False easting", 0), ("False northing", 0)])),
    "ortho": (
        '''PROJCS["Ortho",GEOGCS["g",DATUM["d",SPHEROID["WGS84",6378137,298.257223563]],PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],PROJECTION["Orthographic"],PARAMETER["latitude_of_origin",30],PARAMETER["central_meridian",10],PARAMETER["false_easting",0],PARAMETER["false_northing",0],UNIT["metre",1]]''',
        lambda: _projcrs("Ortho", WGS84_ELL, 'METHOD["Orthographic",ID["EPSG",9840]]', [
            ("Latitude of natural origin", 30),
            ("Longitude of natural origin", 10),
            ("False easting", 0), ("False northing", 0)])),
    "eqc": (
        '''PROJCS["EQC",GEOGCS["g",DATUM["d",SPHEROID["WGS84",6378137,298.257223563]],PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],PROJECTION["Equirectangular"],PARAMETER["standard_parallel_1",30],PARAMETER["central_meridian",0],PARAMETER["false_easting",0],PARAMETER["false_northing",0],UNIT["metre",1]]''',
        lambda: _projcrs("EQC", WGS84_ELL, 'METHOD["Equidistant Cylindrical",ID["EPSG",1028]]', [
            ("Latitude of 1st standard parallel", 30),
            ("Longitude of natural origin", 0),
            ("False easting", 0), ("False northing", 0)])),
    "polyconic": (
        '''PROJCS["Poly",GEOGCS["g",DATUM["d",SPHEROID["GRS80",6378137,298.257222101]],PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],PROJECTION["Polyconic"],PARAMETER["latitude_of_origin",0],PARAMETER["central_meridian",-54],PARAMETER["false_easting",5000000],PARAMETER["false_northing",10000000],UNIT["metre",1]]''',
        lambda: _projcrs("Poly", GRS80_ELL, 'METHOD["American Polyconic",ID["EPSG",9818]]', [
            ("Latitude of natural origin", 0),
            ("Longitude of natural origin", -54),
            ("False easting", 5000000), ("False northing", 10000000)])),
}


@pytest.mark.parametrize("family", sorted(WKT1_CASES))
def test_wkt2_matches_wkt1(family):
    wkt1, wkt2_fn = WKT1_CASES[family]
    _eq(wkt2_fn(), dict(wkt=wkt1))


def test_laborde_wkt2_matches_epsg_projection():
    # EPSG:29701-style Laborde (projection only; the EPSG path may add a
    # datum shift, so compare against the WKT1 Laborde spelling)
    wkt1 = '''PROJCS["Laborde",GEOGCS["g",DATUM["d",SPHEROID["Intl",6378388,297]],PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],PROJECTION["Laborde_Oblique_Mercator"],PARAMETER["latitude_of_center",-18.9],PARAMETER["longitude_of_center",46.43722917],PARAMETER["azimuth",18.9],PARAMETER["scale_factor",0.9995],PARAMETER["false_easting",400000],PARAMETER["false_northing",800000],UNIT["metre",1]]'''
    w2 = _projcrs("Laborde", INTL_ELL, 'METHOD["Laborde Oblique Mercator",ID["EPSG",9813]]', [
        ("Latitude of projection centre", -18.9),
        ("Longitude of projection centre", 46.43722917),
        ("Azimuth at projection centre", 18.9),
        ("Scale factor at projection centre", 0.9995),
        ("False easting", 400000), ("False northing", 800000)])
    lats = np.array([-18.9, -20.0, -16.5])
    lons = np.array([47.5, 44.0, 49.9])
    x1, y1 = crs.reproject_latlons(lats, lons, wkt=wkt1)
    x2, y2 = crs.reproject_latlons(lats, lons, wkt=w2)
    assert np.array_equal(x1, x2) and np.array_equal(y1, y2)


def test_krovak_axes_and_north_orientated():
    # plain Krovak (9819): southing/westing axes, positive values
    w_sw = _projcrs(
        "SJTSK", BESSEL_ELL, 'METHOD["Krovak",ID["EPSG",9819]]', [
            ("Latitude of projection centre", 49.5),
            ("Longitude of origin", 24.83333333333333),
            ("Co-latitude of cone axis", 30.28813972222222),
            ("Latitude of pseudo standard parallel", 78.5),
            ("Scale factor on pseudo standard parallel", 0.9999),
            ("False easting", 0), ("False northing", 0)],
        axes='AXIS["southing (X)",south,ORDER[1]],AXIS["westing (Y)",west,ORDER[2]]')
    w_en = _projcrs(
        "SJTSK-EN", BESSEL_ELL,
        'METHOD["Krovak (North Orientated)",ID["EPSG",1041]]', [
            ("Latitude of projection centre", 49.5),
            ("Longitude of origin", 24.83333333333333),
            ("Co-latitude of cone axis", 30.28813972222222),
            ("Latitude of pseudo standard parallel", 78.5),
            ("Scale factor on pseudo standard parallel", 0.9999),
            ("False easting", 0), ("False northing", 0)])
    lats = np.array([50.20901167])
    lons = np.array([16.84977194])
    xs, ys = crs.reproject_latlons(lats, lons, wkt=w_sw)
    xe, ye = crs.reproject_latlons(lats, lons, wkt=w_en)
    # GN7-2 worked example: southing/westing positive; EN is its negation
    assert abs(xs[0] - 568991.00) < 0.5 and abs(ys[0] - 1050538.64) < 0.5
    assert xe[0] == -xs[0] and ye[0] == -ys[0]


def test_nzmg_wkt1_and_wkt2():
    wkt1 = '''PROJCS["NZGD49 / New Zealand Map Grid",GEOGCS["NZGD49",DATUM["d",SPHEROID["International 1924",6378388,297]],PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],PROJECTION["New_Zealand_Map_Grid"],PARAMETER["latitude_of_origin",-41],PARAMETER["central_meridian",173],PARAMETER["false_easting",2510000],PARAMETER["false_northing",6023150],UNIT["metre",1]]'''
    w2 = _projcrs("NZMG", INTL_ELL, 'METHOD["New Zealand Map Grid",ID["EPSG",9811]]', [
        ("Latitude of natural origin", -41),
        ("Longitude of natural origin", 173),
        ("False easting", 2510000), ("False northing", 6023150)])
    lats = np.array([-36.8485, -43.5321, -41.2865])
    lons = np.array([174.7633, 172.6362, 174.7762])
    x1, y1 = crs.reproject_latlons(lats, lons, wkt=wkt1)
    x2, y2 = crs.reproject_latlons(lats, lons, wkt=w2)
    assert np.array_equal(x1, x2) and np.array_equal(y1, y2)
    # LINZ Auckland check: E ~ 2667636, N ~ 6482464 (coarse sanity)
    assert abs(x1[0] - 2667636) < 2000 and abs(y1[0] - 6482464) < 2000


# ---------------------------------------------------------------------------
# units, round-trips, BOUNDCRS
# ---------------------------------------------------------------------------

def test_grad_units_convert():
    grad = 'ANGLEUNIT["grad",0.015707963267949]'
    w_grad = (
        f'PROJCRS["NTF",BASEGEOGCRS["g",DATUM["d",{CLARKE_ELL}],'
        f'PRIMEM["Greenwich",0]],CONVERSION["c",'
        f'METHOD["Lambert Conic Conformal (1SP)",ID["EPSG",9801]],'
        f'PARAMETER["Latitude of natural origin",52,{grad}],'
        f'PARAMETER["Longitude of natural origin",0,{grad}],'
        f'PARAMETER["Scale factor at natural origin",0.99987742],'
        f'PARAMETER["False easting",600000],'
        f'PARAMETER["False northing",2200000]],'
        f'CS[Cartesian,2],AXIS["(E)",east],AXIS["(N)",north],{M}]'
    )
    w_deg = w_grad.replace(f"52,{grad}", "46.8").replace(f"0,{grad}", "0")
    xg, yg = crs.reproject_latlons(LATS, LONS, wkt=w_grad)
    xd, yd = crs.reproject_latlons(LATS, LONS, wkt=w_deg)
    np.testing.assert_allclose(xg, xd, atol=1e-6)
    np.testing.assert_allclose(yg, yd, atol=1e-6)


def test_wkt2_round_trips():
    for family, (wkt1, wkt2_fn) in sorted(WKT1_CASES.items()):
        if family in ("mollweide", "sinusoidal", "eqc", "polyconic"):
            continue  # non-conformal world projections diverge far from
            # their center with the shared global point set; covered by
            # their own inverse tests in test_crs_inverse
        w2 = wkt2_fn()
        lats = np.array([l for l in LATS if abs(l) < 65])
        lons = np.array([lo for l, lo in zip(LATS, LONS) if abs(l) < 65])
        if family in ("hotine_a", "hotine_b"):
            lats, lons = np.array([4.0, 6.0]), np.array([110.0, 116.0])
        if family in ("polar_a",):
            lats, lons = np.array([80.0, 75.0]), np.array([30.0, -110.0])
        if family in ("polar_b",):
            lats, lons = np.array([-80.0, -75.0]), np.array([30.0, -110.0])
        if family in ("cassini",):
            lats, lons = np.array([10.2, 10.8]), np.array([-61.5, -61.1])
        if family in ("ortho",):
            lats, lons = np.array([28.0, 35.0]), np.array([8.0, 14.0])
        x, y = crs.reproject_latlons(lats, lons, wkt=w2)
        lon2, lat2 = crs.unproject_xys(x, y, wkt=w2)
        np.testing.assert_allclose(lat2, lats, atol=1e-6, err_msg=family)
        dlon = (np.asarray(lon2) - lons + 180.0) % 360.0 - 180.0
        np.testing.assert_allclose(dlon, 0.0, atol=1e-6, err_msg=family)


def test_boundcrs_towgs84_matches_epsg_28992():
    # EPSG:28992's path carries the RDNAPTRANS small-Helmert; a BOUNDCRS
    # with the same 7 parameters must land within the same metre class
    inner = _projcrs("RD", BESSEL_ELL, 'METHOD["Oblique Stereographic",ID["EPSG",9809]]', [
        ("Latitude of natural origin", 52.15616055555555),
        ("Longitude of natural origin", 5.38763888888889),
        ("Scale factor at natural origin", 0.9999079),
        ("False easting", 155000), ("False northing", 463000)])
    towgs = (565.417, 50.3319, 465.552, -0.398957, 0.343988, -1.8774, 4.0725)
    bound = (
        f'BOUNDCRS[SOURCECRS[{inner}],'
        f'TARGETCRS[GEOGCRS["WGS 84",DATUM["World Geodetic System 1984",'
        f'{WGS84_ELL}],PRIMEM["Greenwich",0],CS[ellipsoidal,2],'
        f'AXIS["latitude",north],AXIS["longitude",east],'
        f'ANGLEUNIT["degree",0.0174532925199433]]],'
        f'ABRIDGEDTRANSFORMATION["to WGS84",'
        f'METHOD["Position Vector transformation (geog2D domain)",ID["EPSG",9606]],'
        f'PARAMETER["X-axis translation",{towgs[0]}],'
        f'PARAMETER["Y-axis translation",{towgs[1]}],'
        f'PARAMETER["Z-axis translation",{towgs[2]}],'
        f'PARAMETER["X-axis rotation",{towgs[3]}],'
        f'PARAMETER["Y-axis rotation",{towgs[4]}],'
        f'PARAMETER["Z-axis rotation",{towgs[5]}],'
        f'PARAMETER["Scale difference",{1 + towgs[6] * 1e-6}]]]'
    )
    lats = np.array([52.0, 53.2, 51.5])
    lons = np.array([5.0, 6.5, 4.0])
    xb, yb = crs.reproject_latlons(lats, lons, wkt=bound)
    xe, ye = crs.reproject_latlons(lats, lons, epsg=28992)
    np.testing.assert_allclose(xb, xe, atol=2.0)
    np.testing.assert_allclose(yb, ye, atol=2.0)
    # and the datum shift is actually applied (vs the bare PROJCRS)
    xp, yp = crs.reproject_latlons(lats, lons, wkt=inner)
    assert np.abs(xb - xp).max() > 10
    # round-trip through the bound CRS
    lon2, lat2 = crs.unproject_xys(xb, yb, wkt=bound)
    np.testing.assert_allclose(lat2, lats, atol=1e-6)
    np.testing.assert_allclose(lon2, lons, atol=1e-6)


def test_geogcrs_identity_and_ensemble():
    g = (
        'GEOGCRS["WGS 84",ENSEMBLE["World Geodetic System 1984 ensemble",'
        'MEMBER["World Geodetic System 1984 (Transit)"],'
        f'{WGS84_ELL},ENSEMBLEACCURACY[2.0]],'
        'PRIMEM["Greenwich",0],CS[ellipsoidal,2],'
        'AXIS["geodetic latitude (Lat)",north,ORDER[1]],'
        'AXIS["geodetic longitude (Lon)",east,ORDER[2]],'
        'ANGLEUNIT["degree",0.0174532925199433],ID["EPSG",4326]]'
    )
    x, y = crs.reproject_latlons(LATS, LONS, wkt=g)
    assert np.array_equal(x, LONS) and np.array_equal(y, LATS)


# ---------------------------------------------------------------------------
# refusals
# ---------------------------------------------------------------------------

def _expect_refusal(wkt2, match):
    with pytest.raises(crs.CRSError, match=match):
        crs.get_transformer(wkt=wkt2 + " ")  # spaces dodge the cache


def test_refusals():
    base = [("Latitude of natural origin", 0),
            ("Longitude of natural origin", 0),
            ("False easting", 0), ("False northing", 0)]
    _expect_refusal(
        _projcrs("x", WGS84_ELL,
                 'METHOD["Lambert Conic Conformal (West Orientated)"]',
                 base),
        "distinct EPSG formula")
    _expect_refusal(
        _projcrs("x", WGS84_ELL,
                 'METHOD["Lambert Conic Conformal (2SP Belgium)"]', base),
        "distinct EPSG formula")
    _expect_refusal(
        _projcrs("x", WGS84_ELL,
                 'METHOD["Bonne (South Orientated)"]', base),
        "distinct EPSG formula")
    _expect_refusal(
        _projcrs("x", WGS84_ELL, 'METHOD["Space Oblique Mercator"]', base),
        "not supported")
    # non-Greenwich prime meridian
    _expect_refusal(
        '''PROJCRS["p",BASEGEOGCRS["b",DATUM["d",''' + WGS84_ELL +
        '''],PRIMEM["Paris",2.5969213,ANGLEUNIT["grad",0.015707963267949]]],CONVERSION["c",METHOD["Transverse Mercator"],PARAMETER["Longitude of natural origin",0],PARAMETER["Scale factor at natural origin",1],PARAMETER["False easting",0],PARAMETER["False northing",0]],CS[Cartesian,2],AXIS["(E)",east],AXIS["(N)",north]]''',
        "prime meridian")
    # non-metre projected CS
    _expect_refusal(
        _projcrs("x", WGS84_ELL, 'METHOD["Transverse Mercator"]',
                 [("Latitude of natural origin", 0),
                  ("Longitude of natural origin", 0),
                  ("Scale factor at natural origin", 1),
                  ("False easting", 0), ("False northing", 0)],
                 axes='AXIS["(E)",east,LENGTHUNIT["US survey foot",0.304800609601219]],AXIS["(N)",north,LENGTHUNIT["US survey foot",0.304800609601219]]'),
        "metres only")
    # unknown parameter is refused, not ignored
    _expect_refusal(
        _projcrs("x", WGS84_ELL, 'METHOD["Transverse Mercator"]',
                 [("Latitude of natural origin", 0),
                  ("Longitude of natural origin", 0),
                  ("Angle from Dreams to Reality", 7),
                  ("False easting", 0), ("False northing", 0)]),
        "not understood")
    # weird axes
    _expect_refusal(
        _projcrs("x", WGS84_ELL, 'METHOD["Transverse Mercator"]',
                 [("Latitude of natural origin", 0),
                  ("Longitude of natural origin", 0),
                  ("Scale factor at natural origin", 1),
                  ("False easting", 0), ("False northing", 0)],
                 axes='AXIS["southing (X)",south,ORDER[1]],AXIS["westing (Y)",west,ORDER[2]]'),
        "axis directions")
    with pytest.raises(crs.CRSError, match="parse error|root keyword"):
        crs.get_transformer(wkt='PROJCRS["broken",')


def test_parser_grammar_corners():
    # () delimiters and "" escapes parse
    g = ('GEOGCRS("say ""hi""",DATUM("d",ELLIPSOID("WGS 84",6378137,'
         '298.257223563)),PRIMEM("Greenwich",0),CS(ellipsoidal,2),'
         'AXIS("latitude",north),AXIS("longitude",east))')
    x, y = crs.reproject_latlons(LATS, LONS, wkt=g)
    assert np.array_equal(x, LONS)
    with pytest.raises(crs.CRSError, match="trailing"):
        crs.get_transformer(wkt='GEOGCRS["g",DATUM["d",' + WGS84_ELL +
                            ']] extra')


def test_compound_crs_uses_horizontal_member():
    # WKT2 COMPOUNDCRS (PROJCRS + VERTCRS) — the shape modern DEM
    # sidecars carry; the horizontal member must drive the mapping
    utm = _projcrs("UTM31", WGS84_ELL,
                   'METHOD["Transverse Mercator",ID["EPSG",9807]]', [
                       ("Latitude of natural origin", 0),
                       ("Longitude of natural origin", 3),
                       ("Scale factor at natural origin", 0.9996),
                       ("False easting", 500000), ("False northing", 0)])
    comp = (
        f'COMPOUNDCRS["WGS 84 / UTM 31N + EGM2008 height",{utm},'
        f'VERTCRS["EGM2008 height",VDATUM["EGM2008 geoid"],'
        f'CS[vertical,1],AXIS["gravity-related height (H)",up],'
        f'LENGTHUNIT["metre",1],ID["EPSG",3855]]]'
    )
    _eq(comp, dict(epsg=32631))
    # WKT1 compound spelling too (COMPD_CS wrapping PROJCS + VERT_CS)
    wkt1 = (
        'COMPD_CS["UTM + NAVD88",PROJCS["UTM31",GEOGCS["g",DATUM["d",'
        'SPHEROID["WGS84",6378137,298.257223563]],PRIMEM["Greenwich",0],'
        'UNIT["degree",0.0174532925199433]],'
        'PROJECTION["Transverse_Mercator"],'
        'PARAMETER["latitude_of_origin",0],'
        'PARAMETER["central_meridian",3],'
        'PARAMETER["scale_factor",0.9996],'
        'PARAMETER["false_easting",500000],'
        'PARAMETER["false_northing",0],UNIT["metre",1]],'
        'VERT_CS["NAVD88",VERT_DATUM["North American Vertical Datum '
        '1988",2005],UNIT["metre",1],AXIS["Up",UP]]]'
    )
    _eq(wkt1, dict(epsg=32631))
    # no horizontal member -> loud
    with pytest.raises(crs.CRSError, match="horizontal"):
        crs.get_transformer(
            wkt='COMPOUNDCRS["v only",VERTCRS["h",VDATUM["d"],'
                'CS[vertical,1],AXIS["up",up]]]')
