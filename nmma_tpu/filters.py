"""Filter metadata: effective wavelengths, name mapping, composite averages.

TPU-native counterpart of ``nmma/em/utils.py:680-592`` (``get_default_filts_lambdas``,
``get_filter_name_mapping``, ``average_mags``). The reference resolves
effective wavelengths at runtime through sncosmo's bandpass registry; here
the table is frozen to plain floats (sncosmo ``wave_eff`` values) so filter
resolution is a host-side dictionary lookup and the device only ever sees a
static ``nu_0`` vector.

Wavelengths in metres; ``nu = c / lambda`` in Hz.
"""

from __future__ import annotations

import re

import numpy as np

from .constants import c_SI, eV_per_h_SI

# ---------------------------------------------------------------------------
# Core generic filters (values copied from the reference's frozen arrays,
# nmma/em/utils.py:714-719 — these are data tables, not code)
# ---------------------------------------------------------------------------
_ANGSTROM = 1e-10

_GENERIC_LAMBDAS_AA = {
    "u": 3561.8, "g": 4866.46, "r": 6214.6, "i": 7687.0, "z": 7127.0,
    "y": 7544.6, "J": 8679.5, "H": 9633.3, "K": 12350.0,
    # Bessell UBVRI
    "U": 3605.07, "B": 4413.08, "V": 5512.12, "R": 6585.91, "I": 8059.88,
}

# sncosmo bandpass effective wavelengths (Angstrom), frozen from the public
# sncosmo bandpass registry (transmission-curve means); used for survey-named
# filters appearing in nmma example data files.
_SNCOSMO_LAMBDAS_AA = {
    # SDSS (primed, airmass 1.3)
    "sdssu": 3561.8, "sdssg": 4718.9, "sdssr": 6185.2, "sdssi": 7499.7,
    "sdssz": 8961.5,
    # PanSTARRS-1
    "ps1::g": 4866.46, "ps1::r": 6214.62, "ps1::i": 7544.57, "ps1::z": 8679.47,
    "ps1::y": 9633.26, "ps1::w": 6389.74, "ps1::open": 6439.35,
    # 2MASS
    "2massj": 12350.0, "2massh": 16620.0, "2massks": 21590.0,
    # ZTF
    "ztfg": 4746.48, "ztfr": 6366.38, "ztfi": 7829.03,
    # ATLAS
    "atlasc": 5408.66, "atlaso": 6866.26,
    # Bessell (sncosmo names)
    "bessellux": 3605.07, "bessellb": 4413.08, "bessellv": 5512.12,
    "bessellr": 6585.91, "besselli": 8059.88,
    # Swift/UVOT
    "uvot::b": 4349.56, "uvot::u": 3467.05, "uvot::uvm2": 2245.78,
    "uvot::uvw1": 2580.75, "uvot::uvw2": 2057.01, "uvot::v": 5425.27,
    "uvot::white": 3491.69,
    # Rubin/LSST
    "lsstu": 3671.0, "lsstg": 4827.0, "lsstr": 6223.0, "lssti": 7546.0,
    "lsstz": 8691.0, "lssty": 9712.0,
    # GALEX
    "galex::fuv": 1528.1, "galex::nuv": 2271.1,
    # UVEX (m4opt)
    "FUV": 1550.0, "NUV": 2300.0,
    # Swope (natural system)
    "swope2::y": 10350.0, "swope2::j": 12660.0, "swope2::h": 16240.0,
    "swope2::J": 12660.0, "swope2::H": 16240.0,
    # DECam
    "desg": 4843.0, "desr": 6435.0, "desi": 7828.0, "desz": 9181.0,
    "desy": 9877.0,
    # CSP
    "cspjs": 12390.0, "csphs": 16300.0, "cspk": 21500.0,
    # HST common
    "f435w": 4329.2, "f475w": 4773.6, "f555w": 5308.4, "f606w": 5887.5,
    "f625w": 6295.5, "f775w": 7665.8, "f814w": 8059.8, "f850lp": 9036.9,
    "f105w": 10551.0, "f110w": 11534.0, "f125w": 12486.0, "f140w": 13923.0,
    "f160w": 15369.0,
    # Keplercam / misc survey aliases that show up in kilonova compilations
    "uks": 3561.8,
}

_RADIO_XRAY_DEFAULTS = {
    "radio-1.25GHz": 1.25e9, "radio-3GHz": 3e9,
    "radio-5.5GHz": 5.5e9, "radio-6GHz": 6e9,
    "X-ray-1keV": 1e3 * eV_per_h_SI, "X-ray-5keV": 5e3 * eV_per_h_SI,
}

_UNIT_SCALES = {"GHz": 1e9, "MHz": 1e6, "kHz": 1e3, "THz": 1e12, "keV": 1e3,
                "MeV": 1e6, "GeV": 1e9}


def _parse_band_frequency(name: str):
    """Frequency [Hz] for 'radio-<val><unit>' / 'X-ray-<val><unit>' names.

    Mirrors ``extract_unit`` (nmma/em/utils.py:784-792).
    """
    for prefix in ("radio-", "X-ray-"):
        if name.startswith(prefix):
            rest = name[len(prefix):]
            match = re.fullmatch(r"([0-9.]+)([A-Za-z]+)", rest)
            if not match:
                return None
            val, unit = float(match.group(1)), match.group(2)
            if unit == "Hz":
                return val
            if unit == "eV":
                return val * eV_per_h_SI
            scale = _UNIT_SCALES.get(unit)
            if scale is None:
                return None
            # eV-family units convert via photon energy; Hz-family directly
            return val * scale * (eV_per_h_SI if unit.endswith("eV") else 1.0)
    return None


def effective_wavelength(name: str) -> float:
    """Effective wavelength [m] for a filter name. Raises KeyError if unknown."""
    lname = name
    if lname in _GENERIC_LAMBDAS_AA:
        return _GENERIC_LAMBDAS_AA[lname] * _ANGSTROM
    if lname in _SNCOSMO_LAMBDAS_AA:
        return _SNCOSMO_LAMBDAS_AA[lname] * _ANGSTROM
    low = lname.lower()
    if low in _SNCOSMO_LAMBDAS_AA:
        return _SNCOSMO_LAMBDAS_AA[low] * _ANGSTROM
    if lname in _RADIO_XRAY_DEFAULTS:
        return c_SI / _RADIO_XRAY_DEFAULTS[lname]
    freq = _parse_band_frequency(lname)
    if freq is not None:
        return c_SI / freq
    raise KeyError(f"Unknown filter {name!r}; extend nmma_tpu.filters tables.")


def filters_to_frequencies(filters) -> np.ndarray:
    """nu_0 [Hz] per filter, observer frame (= model.nu_0s in the reference)."""
    return np.asarray([c_SI / effective_wavelength(f) for f in filters])


# ---------------------------------------------------------------------------
# Filter name mapping (observed name -> model filter) and composite averages
# (nmma/em/utils.py:478-592)
# ---------------------------------------------------------------------------
_SYNONYMS = {
    "B": "g", "R": "z", "F160W": "H", "U": "u",
    "UVW2": "u", "UVW1": "u", "UVM2": "u",
}

# composite observed filters evaluated as a mean of modelled magnitudes
# (geometric mean of flux; nmma/em/utils.py:549-585)
COMPOSITE_FILTERS = {
    "w": ("g", "r", "i"),
    "o": ("r", "i"),
    "c": ("g", "r"),
    "V": ("g", "r"),
    "F606W": ("g", "r"),
    "I": ("z", "y"),
    "F814W": ("z", "y"),
}

_GENERIC_MODEL_FILTERS = set(_GENERIC_LAMBDAS_AA) | set(_SNCOSMO_LAMBDAS_AA) | \
    set(_RADIO_XRAY_DEFAULTS)


def resolve_filter(observed: str):
    """Map an observed filter name to (kind, payload).

    kind == 'direct': payload is the model filter name.
    kind == 'average': payload is the tuple of model filters to average.
    """
    if observed in _GENERIC_MODEL_FILTERS:
        return "direct", observed
    if observed in _SYNONYMS:
        return "direct", _SYNONYMS[observed]
    if observed.startswith("radio") or observed.startswith("X-ray"):
        return "direct", observed
    if observed in COMPOSITE_FILTERS:
        return "average", COMPOSITE_FILTERS[observed]
    if observed.lower() in _GENERIC_MODEL_FILTERS:
        return "direct", observed.lower()
    raise KeyError(f"Unknown filter {observed!r}; cannot be processed.")
