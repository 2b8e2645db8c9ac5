"""Scalar numeric helpers with reference-parity semantics.

Mirrors /root/reference/opentopodata/utils.py:55-99 (base_floor,
decimal_base_floor, safe_is_nan, fill_na). The Decimal flooring is the
load-bearing piece: tile corners must be floored exactly (toward -inf, in
the same float arithmetic the reference uses) or points on tile edges get
assigned to the wrong raster.
"""

from __future__ import annotations

import math
from decimal import Decimal

import numpy as np


def base_floor(x, base=1):
    """Round number down to nearest multiple of base (float math)."""
    return base * np.floor(np.asarray(x, dtype=np.float64) / base)


def decimal_base_floor(x, base=1) -> Decimal:
    """Round down to nearest multiple of base, returning an exact Decimal.

    Parity contract (/root/reference/opentopodata/utils.py:60-65): the
    quotient is computed in FLOAT (x / float(base)) and floored toward -inf,
    then scaled back up in exact Decimal. Negative inputs floor away from
    zero: decimal_base_floor(-5.1, 5) == -10.
    """
    if not isinstance(base, (Decimal, int)):
        raise ValueError("Base must be an integer or decimal.")
    integer = math.floor(x / float(base))
    return base * Decimal(integer)


def tile_index_floor(x, base: float) -> np.ndarray:
    """Vectorized integer tile index: floor(x / base) in float64.

    Same float-division-then-floor arithmetic as decimal_base_floor, but
    returning the integer quotient directly — the engine joins points to
    tiles on this exact long, avoiding Decimal objects per row.
    """
    return np.floor(np.asarray(x, dtype=np.float64) / base).astype(np.int64)


def safe_is_nan(x) -> bool:
    """True for NaN floats; False for None and non-numerics (never raises)."""
    try:
        return math.isnan(x)
    except TypeError:
        return False


def fill_na(a, value):
    """Replace NaN values (NOT None) with ``value``.

    This is the semantic hinge separating "NODATA inside the raster"
    (NaN -> replaced) from "outside coverage" (None -> stays None);
    /root/reference/opentopodata/utils.py:89-99, applied per dataset at
    backend.py:211.
    """
    return [value if safe_is_nan(x) else x for x in a]
