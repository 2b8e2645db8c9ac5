"""Client-argument validation (driver-side, SURVEY.md P5-P8).

Re-expresses the reference's request-arg parsing semantics
(/root/reference/opentopodata/api.py:153-269) for the batch-job CLI:
errors here are *client* errors (bad arguments), raised before any Spark
work starts, with the same message wording the reference's HTTP 400s use
so an operator migrating from the reference sees familiar diagnostics.
"""

from __future__ import annotations

from .interpolate import INTERPOLATION_METHODS

DEFAULT_INTERPOLATION = "bilinear"
DEFAULT_FORMAT = "json"
DEFAULT_NODATA = "null"


class ClientError(ValueError):
    """Bad user-supplied argument (the reference's HTTP-400 class)."""


def parse_format(format: str | None) -> str:
    """P8: output format whitelist (api.py:153-160)."""
    if not format:
        format = DEFAULT_FORMAT
    if format not in {"json", "geojson", "parquet"}:
        # reference wording (api.py:153-160) + the engine's parquet extension
        raise ClientError("Format must be 'json' or 'geojson' (or 'parquet').")
    return format


def parse_interpolation(method: str | None) -> str:
    """P5: interpolation whitelist with the reference's message shape
    (api.py:163-185)."""
    if not method:
        method = DEFAULT_INTERPOLATION
    if method not in INTERPOLATION_METHODS:
        msg = f"Invalid interpolation method '{method}'."
        msg += " The valid interpolation methods are: "
        msg += ", ".join(INTERPOLATION_METHODS) + "."
        raise ClientError(msg)
    return method


def parse_n_samples(samples_str, max_n_locations: int | None = None):
    """P7: path-sample count — int, >= 2, <= max (api.py:188-225).
    None/empty means "no resampling requested"."""
    if not samples_str:
        return None
    try:
        n_samples = int(samples_str)
    except Exception:
        msg = f"Invalid value for samples argument '{samples_str}'."
        msg += " Samples should be an integer."
        raise ClientError(msg)
    if n_samples < 2:
        msg = "Must provide at least 2 samples."
        msg += " The ends of the path are included as samples."
        raise ClientError(msg)
    if max_n_locations is not None and n_samples > max_n_locations:
        raise ClientError(
            f"Too many samples requested ({n_samples}), the limit is {max_n_locations}."
        )
    return n_samples


def parse_nodata_value(nodata_value):
    """P6: 'null' -> None, 'nan' -> NaN, integer string -> int; floats
    rejected (api.py:228-269 — float parsing edge cases are why)."""
    if nodata_value is None:
        nodata_value = DEFAULT_NODATA
    if nodata_value == "null":
        return None
    if isinstance(nodata_value, str) and nodata_value.lower() == "nan":
        return float("nan")
    try:
        return int(nodata_value)
    except (ValueError, TypeError):
        pass
    msg = f"Invalid nodata value '{nodata_value}'."
    msg += " Valid nodata values are 'null', 'nan', or an integer."
    raise ClientError(msg)
