"""Interferometer geometry: antenna patterns + geocentric time delays.

Replaces the bilby/LAL detector layer used by the reference GW likelihood.
Geometry is encoded as (latitude, longitude, x-arm azimuth, y-arm azimuth)
per site — the same parametrisation as the LAL detector tables — and the
response tensor d = (x (x) x - y (y) y)/2 is precomputed host-side; the
per-sample antenna pattern is then a pure 3x3 contraction.

Azimuths are measured counter-clockwise from East (geodetic convention
used below); values for the LIGO/Virgo/KAGRA/ET sites follow the public
LAL detector constants.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

EARTH_RADIUS = 6378137.0   # WGS-84 equatorial [m]
C_SI = 299792458.0


def _site_vectors(lat_deg, lon_deg, x_az_deg, y_az_deg):
    lat, lon = np.radians(lat_deg), np.radians(lon_deg)
    # local unit vectors in Earth-fixed frame
    e_east = np.array([-np.sin(lon), np.cos(lon), 0.0])
    e_north = np.array([-np.sin(lat) * np.cos(lon),
                        -np.sin(lat) * np.sin(lon), np.cos(lat)])
    e_up = np.array([np.cos(lat) * np.cos(lon),
                     np.cos(lat) * np.sin(lon), np.sin(lat)])

    def arm(az_deg):
        az = np.radians(az_deg)
        return np.cos(az) * e_east + np.sin(az) * e_north

    vertex = EARTH_RADIUS * e_up
    return vertex, arm(x_az_deg), arm(y_az_deg)


@dataclass(frozen=True)
class Detector:
    name: str
    vertex: np.ndarray        # Earth-fixed [m]
    response: np.ndarray      # 3x3 detector tensor

    def antenna_pattern(self, ra, dec, psi, gmst):
        """(F_plus, F_cross) for a source direction and polarisation."""
        gha = gmst - ra      # Greenwich hour angle
        # wave-frame basis vectors (Earth-fixed)
        u = jnp.stack([
            -jnp.cos(psi) * jnp.sin(gha) - jnp.sin(psi) * jnp.cos(gha)
            * jnp.sin(dec),
            -jnp.cos(psi) * jnp.cos(gha) + jnp.sin(psi) * jnp.sin(gha)
            * jnp.sin(dec),
            jnp.sin(psi) * jnp.cos(dec),
        ])
        v = jnp.stack([
            jnp.sin(psi) * jnp.sin(gha) - jnp.cos(psi) * jnp.cos(gha)
            * jnp.sin(dec),
            jnp.sin(psi) * jnp.cos(gha) + jnp.cos(psi) * jnp.sin(gha)
            * jnp.sin(dec),
            jnp.cos(psi) * jnp.cos(dec),
        ])
        d = jnp.asarray(self.response)
        f_plus = u @ d @ u - v @ d @ v
        f_cross = u @ d @ v + v @ d @ u
        return f_plus, f_cross

    def time_delay_from_geocenter(self, ra, dec, gmst):
        """Arrival-time delay detector - geocentre [s]."""
        gha = gmst - ra
        n = jnp.stack([
            jnp.cos(dec) * jnp.cos(gha),
            -jnp.cos(dec) * jnp.sin(gha),
            jnp.sin(dec),
        ])
        # propagation direction is -n; delay = -(vertex . n)/c
        return -(jnp.asarray(self.vertex) @ n) / C_SI


def _make(name, lat, lon, x_az, y_az):
    vertex, xarm, yarm = _site_vectors(lat, lon, x_az, y_az)
    response = 0.5 * (np.outer(xarm, xarm) - np.outer(yarm, yarm))
    return Detector(name=name, vertex=vertex, response=response)


# site parameters (lat, lon, x/y-arm azimuth CCW from East) following the
# public LAL detector tables
_DETECTORS = {
    "H1": _make("H1", 46.4551, -119.4077, 324.0006 - 270.0, 324.0006),
    "L1": _make("L1", 30.5629, -90.7742, 252.2835 - 270.0 + 360.0 - 360.0,
                252.2835),
    "V1": _make("V1", 43.6314, 10.5045, 19.4326, 19.4326 + 90.0),
    "K1": _make("K1", 36.4113, 137.3061, 29.60, 119.60),
    # Einstein Telescope (triangular; ET1 arm pair) at the Virgo site
    "ET1": _make("ET1", 43.6314, 10.5045, 19.4326, 19.4326 + 60.0),
    "ET2": _make("ET2", 43.6314, 10.5045, 19.4326 + 120.0, 19.4326 + 180.0),
    "ET3": _make("ET3", 43.6314, 10.5045, 19.4326 + 240.0, 19.4326 + 300.0),
    # Cosmic Explorer (placed at the Hanford site)
    "CE": _make("CE", 46.4551, -119.4077, 324.0006 - 270.0, 324.0006),
}


def get_detector(name: str) -> Detector:
    if name not in _DETECTORS:
        raise KeyError(f"Unknown detector {name!r}; known: "
                       f"{sorted(_DETECTORS)}")
    return _DETECTORS[name]


def gmst_from_gps(gps_time):
    """Greenwich mean sidereal time [rad] from GPS seconds (approximate).

    Linear sidereal rate anchored at the J2000 epoch; adequate for antenna
    patterns (sub-arcsecond error growth per decade is irrelevant at the
    likelihood level).
    """
    # GPS epoch 1980-01-06; J2000 epoch = GPS 630763213
    days_since_j2000 = (jnp.asarray(gps_time) - 630763213.0) / 86400.0
    gmst_hours = 18.697374558 + 24.06570982441908 * days_since_j2000
    return (gmst_hours % 24.0) * jnp.pi / 12.0
