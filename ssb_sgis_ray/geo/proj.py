"""Reprojection: geographic (ETRS89/WGS84) <-> UTM zone 33N (EPSG:25833).

The reference reprojects with pyproj (``get_utm33`` / ``get_lonlat`` —
/root/reference/src/sgis/geopandas_tools/conversion.py:59-72). pyproj is
not installed here, so the transverse Mercator projection is implemented
from the public Karney/Krüger series (6th order in the third flattening
n — the same formulation PROJ's ``tmerc`` uses; accurate to well under a
millimeter within a UTM zone).

Constants: GRS80 ellipsoid (a=6378137, f=1/298.257222101), k0=0.9996,
lon0=15°E, false easting 500000 (UTM 33N).
"""

from __future__ import annotations

import numpy as np

A_ELL = 6378137.0
F_ELL = 1.0 / 298.257222101
K0 = 0.9996
LON0_DEG = 15.0
FALSE_E = 500000.0

_n = F_ELL / (2.0 - F_ELL)
# rectifying radius
_A1 = A_ELL / (1 + _n) * (1 + _n**2 / 4 + _n**4 / 64 + _n**6 / 256)
# forward series alpha_j (Karney 2011, eq. 35), 6th order
_ALPHA = np.array([
    _n / 2 - 2 * _n**2 / 3 + 5 * _n**3 / 16 + 41 * _n**4 / 180
    - 127 * _n**5 / 288 + 7891 * _n**6 / 37800,
    13 * _n**2 / 48 - 3 * _n**3 / 5 + 557 * _n**4 / 1440 + 281 * _n**5 / 630
    - 1983433 * _n**6 / 1935360,
    61 * _n**3 / 240 - 103 * _n**4 / 140 + 15061 * _n**5 / 26880
    + 167603 * _n**6 / 181440,
    49561 * _n**4 / 161280 - 179 * _n**5 / 168 + 6601661 * _n**6 / 7257600,
    34729 * _n**5 / 80640 - 3418889 * _n**6 / 1995840,
    212378941 * _n**6 / 319334400,
])
# inverse series beta_j (Karney 2011, eq. 36)
_BETA = np.array([
    _n / 2 - 2 * _n**2 / 3 + 37 * _n**3 / 96 - _n**4 / 360
    - 81 * _n**5 / 512 + 96199 * _n**6 / 604800,
    _n**2 / 48 + _n**3 / 15 - 437 * _n**4 / 1440 + 46 * _n**5 / 105
    - 1118711 * _n**6 / 3870720,
    17 * _n**3 / 480 - 37 * _n**4 / 840 - 209 * _n**5 / 4480
    + 5569 * _n**6 / 90720,
    4397 * _n**4 / 161280 - 11 * _n**5 / 504 - 830251 * _n**6 / 7257600,
    4583 * _n**5 / 161280 - 108847 * _n**6 / 3991680,
    20648693 * _n**6 / 638668800,
])
_E2 = F_ELL * (2 - F_ELL)
_E = np.sqrt(_E2)


def lonlat_to_utm33(lon_deg, lat_deg):
    """(lon, lat) degrees -> (easting, northing) EPSG:25833. Vectorized."""
    lon = np.radians(np.asarray(lon_deg, np.float64) - LON0_DEG)
    phi = np.radians(np.asarray(lat_deg, np.float64))
    # conformal latitude
    t = np.sinh(
        np.arctanh(np.sin(phi)) - _E * np.arctanh(_E * np.sin(phi))
    )
    xi_p = np.arctan2(t, np.cos(lon))
    eta_p = np.arcsinh(np.sin(lon) / np.hypot(t, np.cos(lon)))
    j = np.arange(1, 7)
    xi = xi_p + np.sum(
        _ALPHA[None, :] * np.sin(2 * j[None, :] * xi_p[..., None])
        * np.cosh(2 * j[None, :] * eta_p[..., None]),
        axis=-1,
    )
    eta = eta_p + np.sum(
        _ALPHA[None, :] * np.cos(2 * j[None, :] * xi_p[..., None])
        * np.sinh(2 * j[None, :] * eta_p[..., None]),
        axis=-1,
    )
    return FALSE_E + K0 * _A1 * eta, K0 * _A1 * xi


def utm33_to_lonlat(easting, northing):
    """(easting, northing) EPSG:25833 -> (lon, lat) degrees. Vectorized."""
    xi = np.asarray(northing, np.float64) / (K0 * _A1)
    eta = (np.asarray(easting, np.float64) - FALSE_E) / (K0 * _A1)
    j = np.arange(1, 7)
    xi_p = xi - np.sum(
        _BETA[None, :] * np.sin(2 * j[None, :] * xi[..., None])
        * np.cosh(2 * j[None, :] * eta[..., None]),
        axis=-1,
    )
    eta_p = eta - np.sum(
        _BETA[None, :] * np.cos(2 * j[None, :] * xi[..., None])
        * np.sinh(2 * j[None, :] * eta[..., None]),
        axis=-1,
    )
    # tan of the conformal latitude
    taup = np.sin(xi_p) / np.hypot(np.sinh(eta_p), np.cos(xi_p))
    # Newton iteration (GeographicLib Math::tauf): solve tau'(tau) = taup
    # with tau' = tau·√(1+σ²) − σ·√(1+τ²), σ = sinh(e·atanh(e·τ/√(1+τ²)))
    e2m = 1.0 - _E2
    tau = taup / e2m  # first guess overshoots toward geodetic
    for _ in range(6):
        sigma = np.sinh(_E * np.arctanh(_E * tau / np.hypot(1.0, tau)))
        taupa = tau * np.hypot(1.0, sigma) - sigma * np.hypot(1.0, tau)
        dtau = (
            (taup - taupa)
            * (1.0 + e2m * tau**2)
            / (e2m * np.hypot(1.0, tau) * np.hypot(1.0, taupa))
        )
        tau = tau + dtau
        if np.all(np.abs(dtau) < 1e-15 * np.maximum(1.0, np.abs(tau))):
            break
    phi = np.arctan(tau)
    lon = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    return np.degrees(lon) + LON0_DEG, np.degrees(phi)
