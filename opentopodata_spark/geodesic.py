"""WGS84 geodesics: inverse (distance), direct (position along line), and
equally-spaced path sampling.

geographiclib is unavailable in this environment, so this module implements
the published algorithms from C. F. F. Karney, "Algorithms for geodesics"
(J. Geodesy 87, 43-55, 2013): series expansions of the geodesic integrals to
order 6 in the third flattening, the canonical arrangement of the inverse
problem, and root-finding on the departure azimuth. Accuracy is more than
sufficient for elevation path sampling (sub-millimeter on segment lengths,
vs the reference's geographiclib at /root/reference/opentopodata/utils.py:
102-168).

``sample_points_on_path`` mirrors the reference's semantics exactly:
n=2 returns the endpoints; interior samples are placed by linear distance
along the cumulative geodesic segment lengths; endpoints are returned
exactly (no round-trip through the direct problem).
"""

from __future__ import annotations

import math

import numpy as np

_A = 6378137.0
_F = 1 / 298.257223563
_B = _A * (1 - _F)
_E2 = _F * (2 - _F)
_EP2 = _E2 / (1 - _E2)
_N = _F / (2 - _F)


def _a1(eps):
    return (1 + eps**2 / 4 + eps**4 / 64 + eps**6 / 256) / (1 - eps)


def _c1(eps):
    e = eps
    return (
        -e / 2 + 3 * e**3 / 16 - e**5 / 32,
        -(e**2) / 16 + e**4 / 32 - 9 * e**6 / 2048,
        -(e**3) / 48 + 3 * e**5 / 256,
        -5 * e**4 / 512 + 3 * e**6 / 512,
        -7 * e**5 / 1280,
        -7 * e**6 / 2048,
    )


def _c1p(eps):
    e = eps
    return (
        e / 2 - 9 * e**3 / 32 + 205 * e**5 / 1536,
        5 * e**2 / 16 - 37 * e**4 / 96 + 1335 * e**6 / 4096,
        29 * e**3 / 96 - 75 * e**5 / 128,
        539 * e**4 / 1536 - 2391 * e**6 / 2560,
        3467 * e**5 / 7680,
        38081 * e**6 / 61440,
    )


def _a3(eps, n=_N):
    return (
        1
        - eps * (1 / 2 - n / 2)
        - eps**2 * (1 / 4 + n / 8 - 3 * n**2 / 8)
        - eps**3 * (1 / 16 + 3 * n / 16 + n**2 / 16)
        - eps**4 * (3 / 64 + n / 32)
        - eps**5 * (3 / 128)
    )


def _c3(eps, n=_N):
    e = eps
    return (
        e * (1 / 4 - n / 4)
        + e**2 * (1 / 8 - n**2 / 8)
        + e**3 * (3 / 64 + 3 * n / 64 - n**2 / 64)
        + e**4 * (5 / 128 + n / 64)
        + e**5 * 3 / 128,
        e**2 * (1 / 16 - 3 * n / 32 + n**2 / 32)
        + e**3 * (3 / 64 - n / 32 - 3 * n**2 / 64)
        + e**4 * (3 / 128 + n / 128)
        + e**5 * 5 / 256,
        e**3 * (5 / 192 - 3 * n / 64 + 5 * n**2 / 192)
        + e**4 * (3 / 128 - 5 * n / 192)
        + e**5 * 7 / 512,
        e**4 * (7 / 512 - 7 * n / 256) + e**5 * 7 / 512,
        e**5 * 21 / 2560,
        0.0,
    )


def _sin_series(sigma, coeffs):
    return sum(c * math.sin(2 * (j + 1) * sigma) for j, c in enumerate(coeffs))


def _eps_from_alp0(cos_alp0_sq):
    k2 = _EP2 * cos_alp0_sq
    t = math.sqrt(1 + k2)
    return (t - 1) / (t + 1)


def _beta(lat_deg):
    """Reduced latitude (radians) from geodetic latitude (degrees)."""
    phi = math.radians(lat_deg)
    return math.atan2((1 - _F) * math.sin(phi), math.cos(phi))


def _lam12_s12(beta1, beta2, alp1):
    """Given canonical (beta1 <= 0, |beta1| >= |beta2|) and departure
    azimuth alp1, return (lam12, s12, alp2)."""
    sb1, cb1 = math.sin(beta1), math.cos(beta1)
    sb2, cb2 = math.sin(beta2), math.cos(beta2)
    sa1, ca1 = math.sin(alp1), math.cos(alp1)

    salp0 = sa1 * cb1
    calp0_sq = 1 - salp0**2

    sig1 = math.atan2(sb1, ca1 * cb1)
    omg1 = math.atan2(salp0 * math.sin(sig1), math.cos(sig1))

    # azimuth at point 2 (positive cos root in canonical arrangement)
    ca2_sq = (ca1 * cb1) ** 2 + (cb2**2 - cb1**2)
    ca2 = math.sqrt(max(ca2_sq, 0.0)) / cb2
    sig2 = math.atan2(sb2, ca2 * cb2)
    omg2 = math.atan2(salp0 * math.sin(sig2), math.cos(sig2))

    eps = _eps_from_alp0(calp0_sq)
    c3 = _c3(eps)
    a3 = _a3(eps)
    lam12 = (omg2 - omg1) - _F * salp0 * a3 * (
        (sig2 - sig1) + (_sin_series(sig2, c3) - _sin_series(sig1, c3))
    )
    c1 = _c1(eps)
    s12 = _B * _a1(eps) * (
        (sig2 - sig1) + (_sin_series(sig2, c1) - _sin_series(sig1, c1))
    )
    alp2 = math.atan2(salp0 / cb2, ca2)
    return lam12, s12, alp2


def inverse(lat1, lon1, lat2, lon2) -> dict:
    """Solve the inverse geodesic problem.

    Returns dict with s12 (meters), azi1, azi2 (degrees) — the subset of
    geographiclib's Inverse() output the reference uses.
    """
    lam12 = math.radians(lon2 - lon1)
    # wrap to [-pi, pi]
    lam12 = (lam12 + math.pi) % (2 * math.pi) - math.pi

    # canonical arrangement bookkeeping
    lonsign = 1 if lam12 >= 0 else -1
    lam12 *= lonsign
    b1, b2 = _beta(lat1), _beta(lat2)
    swapp = 1 if abs(b1) >= abs(b2) else -1
    if swapp < 0:
        lonsign *= -1
        b1, b2 = b2, b1
    latsign = 1 if b1 < 0 else -1
    b1 *= latsign
    b2 *= latsign
    # now b1 <= 0, |b1| >= |b2|

    if b1 == 0 and b2 == 0 and lam12 <= (1 - _F) * math.pi:
        # equatorial geodesic
        s12 = _A * lam12
        salp1 = salp2 = 1.0
        calp1 = calp2 = 0.0
    elif lam12 == 0.0:
        # meridional, no pole crossing
        alp1 = 0.0
        _, s12, alp2 = _lam12_s12(b1, b2, alp1)
        salp1, calp1 = math.sin(alp1), math.cos(alp1)
        salp2, calp2 = math.sin(alp2), math.cos(alp2)
    else:
        # Root-find on alp1 in (0, pi): lam12 is monotone increasing.
        target = lam12
        lo, hi = 1e-15, math.pi - 1e-15
        flo = _lam12_s12(b1, b2, lo)[0] - target
        fhi = _lam12_s12(b1, b2, hi)[0] - target
        if flo >= 0:
            alp1 = lo
        elif fhi <= 0:
            alp1 = hi
        else:
            for _ in range(200):
                mid = 0.5 * (lo + hi)
                fm = _lam12_s12(b1, b2, mid)[0] - target
                if fm < 0:
                    lo = mid
                else:
                    hi = mid
                if hi - lo < 1e-15:
                    break
            alp1 = 0.5 * (lo + hi)
        _, s12, alp2 = _lam12_s12(b1, b2, alp1)
        salp1, calp1 = math.sin(alp1), math.cos(alp1)
        salp2, calp2 = math.sin(alp2), math.cos(alp2)

    # undo canonical transforms (Karney 2013 §4 bookkeeping)
    if swapp < 0:
        salp1, salp2 = salp2, salp1
        calp1, calp2 = calp2, calp1
    salp1 *= swapp * lonsign
    calp1 *= swapp * latsign
    salp2 *= swapp * lonsign
    calp2 *= swapp * latsign

    return {
        "s12": s12,
        "azi1": math.degrees(math.atan2(salp1, calp1)),
        "azi2": math.degrees(math.atan2(salp2, calp2)),
        "lat1": lat1,
        "lon1": lon1,
        "lat2": lat2,
        "lon2": lon2,
    }


def direct_distances(lat1, lon1, azi1, s12):
    """Vectorized direct problem: one geodesic line, MANY distances.

    All the line setup (departure azimuth trig, series coefficients,
    sigma_1/omega_1) depends only on (lat1, lon1, azi1) and is computed
    once with scalar math; only the distance-dependent tail runs in
    numpy over the ``s12`` array. This is the hot path for radial
    sampling (viewshed rays: n_samples points per azimuth in ONE call
    instead of n_samples scalar Karney solves).

    Returns (lat2, lon2, azi2) float64 arrays; longitudes LONG_UNROLL
    like :func:`direct` (the scalar form delegates here, so the two can
    never drift).
    """
    s12 = np.asarray(s12, dtype=np.float64)
    alp1 = math.radians(azi1)
    b1 = _beta(lat1)
    sb1, cb1 = math.sin(b1), math.cos(b1)
    sa1, ca1 = math.sin(alp1), math.cos(alp1)

    salp0 = sa1 * cb1
    calp0_sq = 1 - salp0**2
    sig1 = math.atan2(sb1, ca1 * cb1)
    omg1 = math.atan2(salp0 * math.sin(sig1), math.cos(sig1))

    eps = _eps_from_alp0(calp0_sq)
    a1 = _a1(eps)
    c1 = _c1(eps)
    c1p = _c1p(eps)

    s1 = _B * a1 * (sig1 + _sin_series(sig1, c1))
    s2 = s1 + s12
    tau2 = s2 / (_B * a1)
    sig2 = tau2 + _sin_series_np(tau2, c1p)

    calp0 = math.sqrt(max(calp0_sq, 0.0))
    ssig2, csig2 = np.sin(sig2), np.cos(sig2)
    sb2 = calp0 * ssig2
    cb2 = np.hypot(salp0, calp0 * csig2)
    lat2 = np.degrees(np.arctan2(sb2, (1 - _F) * cb2))
    omg2 = np.arctan2(salp0 * ssig2, csig2)

    c3 = _c3(eps)
    a3 = _a3(eps)
    # unroll omega difference to follow sigma continuously
    domg = omg2 - omg1
    dsig = sig2 - sig1
    domg = domg + 2 * math.pi * np.round((dsig - domg) / (2 * math.pi))
    lam12 = domg - _F * salp0 * a3 * (
        dsig + (_sin_series_np(sig2, c3) - _sin_series(sig1, c3))
    )
    lon2 = lon1 + np.degrees(lam12)
    azi2 = np.degrees(np.arctan2(salp0, calp0 * csig2))
    return lat2, lon2, azi2


def _sin_series_np(sigma, coeffs):
    out = np.zeros_like(sigma)
    for j, c in enumerate(coeffs):
        out += c * np.sin(2 * (j + 1) * sigma)
    return out


def direct(lat1, lon1, azi1, s12) -> dict:
    """Solve the direct geodesic problem (LONG_UNROLL longitudes)."""
    lat2, lon2, azi2 = direct_distances(
        lat1, lon1, azi1, np.array([float(s12)])
    )
    return {"lat2": float(lat2[0]), "lon2": float(lon2[0]),
            "azi2": float(azi2[0]), "s12": s12}


class InverseLine:
    """Geodesic line between two points, supporting Position(distance)."""

    def __init__(self, lat1, lon1, lat2, lon2):
        g = inverse(lat1, lon1, lat2, lon2)
        self.lat1, self.lon1 = lat1, lon1
        self.azi1 = g["azi1"]
        self.s13 = g["s12"]

    def position(self, s12) -> dict:
        return direct(self.lat1, self.lon1, self.azi1, s12)


def sample_points_on_path(path_lats, path_lons, n_samples):
    """n equally-spaced points along a piecewise geodesic path.

    Semantics parity with /root/reference/opentopodata/utils.py:102-168:
    n=2 returns the endpoints exactly; sample distances are a linspace over
    the cumulative segment lengths; samples coincident with a vertex return
    the vertex exactly.
    """
    if n_samples == 2:
        return (
            [path_lats[0], path_lats[-1]],
            [path_lons[0], path_lons[-1]],
        )
    lats, lons, _ = sample_points_with_distance(path_lats, path_lons, n_samples)
    return lats, lons


def sample_points_with_distance(path_lats, path_lons, n_samples):
    """``sample_points_on_path`` plus each sample's along-path distance
    in metres from the first waypoint (the linspace values themselves —
    exact by construction, not re-measured between samples). Elevation
    profiles need the x-axis; the reference's path sampler computes the
    same cumulative-distance linspace internally and discards it.

    n=2 keeps the endpoint-exactness shortcut of the base sampler but
    still measures the single segment for its distance axis.
    """
    if n_samples == 2:
        total = inverse(
            float(path_lats[0]), float(path_lons[0]),
            float(path_lats[-1]), float(path_lons[-1]),
        )["s12"]
        return (
            [path_lats[0], path_lats[-1]],
            [path_lons[0], path_lons[-1]],
            [0.0, float(total)],
        )

    path = list(zip(path_lats, path_lons))
    path_distances = [0.0]
    for (slat, slon), (elat, elon) in zip(path[:-1], path[1:]):
        path_distances.append(inverse(slat, slon, elat, elon)["s12"])
    cum = np.cumsum(path_distances)
    point_distances = np.linspace(0, cum[-1], n_samples)

    points = []
    lines: dict[int, InverseLine] = {}
    for pd in point_distances:
        i_start = int(np.argwhere(pd >= cum)[:, 0][-1])
        if np.isclose(pd, cum[i_start]):
            points.append(path[i_start])
            continue
        if i_start == len(path) - 1 or np.isclose(pd, cum[-1]):
            points.append(path[-1])
            continue
        if i_start not in lines:
            slat, slon = path[i_start]
            elat, elon = path[i_start + 1]
            lines[i_start] = InverseLine(slat, slon, elat, elon)
        g = lines[i_start].position(pd - cum[i_start])
        points.append((g["lat2"], g["lon2"]))

    assert len(points) == n_samples
    return (
        [p[0] for p in points],
        [p[1] for p in points],
        [float(d) for d in point_distances],
    )
