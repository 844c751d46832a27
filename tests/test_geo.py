"""Geo conversions — mirrors reference opensfm/test/test_geo.py coverage."""

import numpy as np

from opensfm_tpu import geo


def test_ecef_lla_roundtrip():
    lat, lon, alt = 46.5274109, 6.5722075, 402.16
    x, y, z = geo.ecef_from_lla(lat, lon, alt)
    lat2, lon2, alt2 = geo.lla_from_ecef(x, y, z)
    assert np.allclose([lat2, lon2, alt2], [lat, lon, alt], atol=1e-7)


def test_ecef_from_lla_known_point():
    # Equator / prime meridian at altitude 0 lies on the semi-major axis.
    x, y, z = geo.ecef_from_lla(0.0, 0.0, 0.0)
    assert np.allclose([x, y, z], [geo.WGS84_A, 0.0, 0.0])
    # North pole at altitude 0 lies on the semi-minor axis.
    x, y, z = geo.ecef_from_lla(90.0, 0.0, 0.0)
    assert np.allclose([x, y, z], [0.0, 0.0, geo.WGS84_B], atol=1e-6)


def test_topocentric_roundtrip():
    reflat, reflon, refalt = 46.5, 6.5, 400.0
    lat, lon, alt = 46.5274109, 6.5722075, 402.16
    x, y, z = geo.topocentric_from_lla(lat, lon, alt, reflat, reflon, refalt)
    lat2, lon2, alt2 = geo.lla_from_topocentric(x, y, z, reflat, reflon, refalt)
    assert np.allclose([lat2, lon2, alt2], [lat, lon, alt], atol=1e-7)


def test_topocentric_origin_is_zero():
    x, y, z = geo.topocentric_from_lla(46.5, 6.5, 400.0, 46.5, 6.5, 400.0)
    assert np.allclose([x, y, z], [0.0, 0.0, 0.0], atol=1e-9)


def test_topocentric_axes():
    # A point slightly north of the origin should have +y, ~0 x.
    x, y, z = geo.topocentric_from_lla(46.501, 6.5, 400.0, 46.5, 6.5, 400.0)
    assert abs(x) < 1e-6
    assert y > 100.0  # ~111m per 0.001 deg lat
    # A point slightly east should have +x.
    x, y, z = geo.topocentric_from_lla(46.5, 6.501, 400.0, 46.5, 6.5, 400.0)
    assert x > 50.0
    assert abs(y) < 1.0


def test_gps_distance():
    d = geo.gps_distance([46.5, 6.5], [46.5, 6.5])
    assert abs(d) < 1e-9
    d = geo.gps_distance([0.0, 0.0], [0.0, 1.0])
    assert 110000 < d < 112000  # ~111 km per degree at the equator


def test_topocentric_converter():
    conv = geo.TopocentricConverter(46.5, 6.5, 400.0)
    x, y, z = conv.to_topocentric(46.5274109, 6.5722075, 402.16)
    lla = conv.to_lla(x, y, z)
    assert np.allclose(lla, (46.5274109, 6.5722075, 402.16), atol=1e-7)
    assert conv == geo.TopocentricConverter(46.5, 6.5, 400.0)


def test_gps_distance_vectorized():
    a = np.array([[46.5, 6.5], [0.0, 0.0]])
    b = np.array([[46.5, 6.6], [0.0, 1.0]])
    d = geo.gps_distance(a, b)
    assert d.shape == (2,)
    assert d[1] > d[0]
