"""DTED terrain-elevation reader + writer (``.dt0``/``.dt1``/``.dt2``).

DTED (Digital Terrain Elevation Data, MIL-PRF-89020B) is the NGA/NATO
raster DEM exchange format — SRTM itself was originally published as
DTED cells, and GDAL reads it natively (the reference engine therefore
accepts it through ``rasterio.open``,
/root/reference/opentopodata/backend.py:89). This sandbox has no GDAL,
so the engine ships a pure-numpy implementation of the public spec:

Wire layout (all ASCII headers, big-endian binary data)::

    UHL   80 bytes   "UHL1", origin lon/lat (DDDMMSSH), lon/lat data
                     intervals (tenths of arc seconds), n_lon lines,
                     n_lat points per line
    DSI  648 bytes   "DSI" + dataset identification
    ACC 2700 bytes   "ACC" + accuracy description
    data             n_lon records, one per longitude COLUMN, west to
                     east; each record:
                       0xAA sentinel | 24-bit block count | 16-bit
                       longitude count | 16-bit latitude count |
                       n_lat big-endian SIGNED-MAGNITUDE int16
                       elevations ordered SOUTH to NORTH | 32-bit
                       checksum = unsigned byte sum of the record

Signed magnitude (not two's complement!): bit 15 is the sign, low 15
bits the magnitude; the DTED null elevation is -32767. The lattice is
point-registered on the cell graticule exactly like SRTM ``.hgt``
(values AT integer-degree-aligned points, 1-point overlap between
neighboring cells), so the affine exposed here uses the same
half-sample outset the ``.hgt`` path uses — GDAL's pixel-is-point
handling produces the identical geotransform.

Scale shape: a DTED cell is at most ~25 MB (level 2, 3601x3601), the
whole file parses once at open with three vectorized numpy passes
(checksum verify, sign-magnitude decode, transpose to north-up), and
the decoded array is shared through the process-wide block cache the
other in-memory formats use. Remote ``.dt*`` objects are a single
full-object GET — the column-major record layout has no useful
row-range access pattern.
"""

from __future__ import annotations

import os

import numpy as np

from .geotiff import CRSInfo, Raster, RasterOpenError

__all__ = ["open_dted", "open_dted_bytes", "write_dted"]

_UHL_LEN = 80
_DSI_LEN = 648
_ACC_LEN = 2700
_DATA_START = _UHL_LEN + _DSI_LEN + _ACC_LEN
_SENTINEL = 0xAA
NODATA = -32767.0


def _parse_angle(field: bytes, path: str, what: str) -> float:
    """DDDMMSSH -> signed decimal degrees (H in NSEW, 7 zero-padded
    digits)."""
    s = field.decode("ascii", "replace").strip()
    if len(s) != 8 or s[7].upper() not in "NSEW" or not s[:7].isdigit():
        raise RasterOpenError(f"'{path}': bad DTED {what} field {s!r}")
    deg = int(s[0:3]) + int(s[3:5]) / 60.0 + int(s[5:7]) / 3600.0
    return -deg if s[7].upper() in "SW" else deg


def _fmt_angle(value: float, is_lat: bool) -> bytes:
    hemi = ("N" if value >= 0 else "S") if is_lat else (
        "E" if value >= 0 else "W")
    total = int(round(abs(value) * 3600.0))
    deg, rem = divmod(total, 3600)
    mm, ss = divmod(rem, 60)
    return f"{deg:03d}{mm:02d}{ss:02d}{hemi}".encode("ascii")


def _parse_int(field: bytes, path: str, what: str) -> int:
    s = field.decode("ascii", "replace").strip()
    if not s.isdigit():
        raise RasterOpenError(f"'{path}': bad DTED {what} field {s!r}")
    return int(s)


def open_dted(path: str) -> Raster:
    with open(path, "rb") as f:
        return open_dted_bytes(path, f.read())


def open_dted_bytes(path: str, buf: bytes) -> Raster:
    """Parse one DTED cell from bytes (local files and remote
    full-object fetches share this)."""
    if len(buf) < _DATA_START or buf[:4] != b"UHL1":
        raise RasterOpenError(f"'{path}' is not a DTED file (no UHL1)")
    if buf[_UHL_LEN:_UHL_LEN + 3] != b"DSI":
        raise RasterOpenError(f"'{path}': DTED DSI record missing")
    if buf[_UHL_LEN + _DSI_LEN:_UHL_LEN + _DSI_LEN + 3] != b"ACC":
        raise RasterOpenError(f"'{path}': DTED ACC record missing")
    lon0 = _parse_angle(buf[4:12], path, "origin longitude")
    lat0 = _parse_angle(buf[12:20], path, "origin latitude")
    # data intervals in tenths of arc seconds
    dlon = _parse_int(buf[20:24], path, "longitude interval") / 36000.0
    dlat = _parse_int(buf[24:28], path, "latitude interval") / 36000.0
    n_lon = _parse_int(buf[47:51], path, "longitude line count")
    n_lat = _parse_int(buf[51:55], path, "latitude point count")
    if n_lon < 2 or n_lat < 2 or dlon <= 0 or dlat <= 0:
        raise RasterOpenError(f"'{path}': degenerate DTED grid "
                              f"({n_lon}x{n_lat} @ {dlon}x{dlat})")
    stride = 12 + 2 * n_lat
    need = _DATA_START + n_lon * stride
    if len(buf) < need:
        raise RasterOpenError(
            f"'{path}': truncated DTED data ({len(buf)} < {need} bytes)")
    rec = np.frombuffer(
        buf, np.uint8, count=n_lon * stride, offset=_DATA_START,
    ).reshape(n_lon, stride)
    if not (rec[:, 0] == _SENTINEL).all():
        bad = int(np.argmin(rec[:, 0] == _SENTINEL))
        raise RasterOpenError(
            f"'{path}': DTED record {bad} missing 0xAA sentinel")
    sums = rec[:, :-4].astype(np.uint32).sum(axis=1, dtype=np.uint64)
    stored = np.ascontiguousarray(rec[:, -4:]).view(">u4").ravel()
    if not (sums == stored).all():
        bad = int(np.argmin(sums == stored))
        raise RasterOpenError(
            f"'{path}': DTED record {bad} checksum mismatch")
    raw = np.ascontiguousarray(rec[:, 8:-4]).view(">u2").astype(np.uint16)
    mag = (raw & 0x7FFF).astype(np.int16)
    np.negative(mag, out=mag, where=(raw & 0x8000).astype(bool))
    # records are west->east columns, each south->north: transpose to
    # rows and flip so row 0 is the northernmost lattice line
    data = np.ascontiguousarray(mag.reshape(n_lon, n_lat).T[::-1, :])
    return Raster(
        path=path, width=n_lon, height=n_lat, dtype=np.dtype(">i2"),
        nodata=NODATA, crs=CRSInfo(epsg=4326),
        # point registration: same half-sample outset as .hgt (S7)
        x0=lon0 - dlon / 2.0,
        y0=lat0 + (n_lat - 1) * dlat + dlat / 2.0,
        sx=dlon, sy=dlat, _data=data,
    )


def write_dted(path: str, data, lat0: float, lon0: float) -> None:
    """Write one 1-degree DTED cell.

    ``data`` is the north-up lattice (n_lat rows x n_lon cols,
    integers in [-32767, 32767], -32767 = null) with the SW lattice
    point at (lat0, lon0); both spans must divide 1 degree into an
    integer number of tenths of arc seconds (n=121/1201/3601 are the
    DTED level 0/1/2 standards). Used by fixtures and the transcode
    sink; round-trips bit-exactly through :func:`open_dted`.
    """
    arr = np.asarray(data)
    if arr.ndim != 2 or arr.shape[0] < 2 or arr.shape[1] < 2:
        raise ValueError(f"DTED grid must be 2-D, got {arr.shape}")
    if not np.issubdtype(arr.dtype, np.integer):
        raise ValueError(f"DTED stores integer metres, got {arr.dtype}")
    arr = arr.astype(np.int64)
    if arr.min() < -32767 or arr.max() > 32767:
        raise ValueError("DTED elevations must be in [-32767, 32767]"
                         " (signed magnitude has no -32768)")
    n_lat, n_lon = arr.shape
    tenths = []
    for n, what in ((n_lon, "longitude"), (n_lat, "latitude")):
        t, r = divmod(36000, n - 1)
        if r:
            raise ValueError(
                f"{what} span: {n} points do not divide 1 degree into an"
                " integer number of tenths of arc seconds")
        tenths.append(t)
    dlon_t, dlat_t = tenths

    uhl = b"".join([
        b"UHL1",
        _fmt_angle(lon0, is_lat=False), _fmt_angle(lat0, is_lat=True),
        b"%04d" % dlon_t, b"%04d" % dlat_t,
        b"NA  ",            # absolute vertical accuracy
        b"U  ",             # security code: unclassified
        b" " * 12,          # unique reference
        b"%04d" % n_lon, b"%04d" % n_lat,
        b"0",               # multiple accuracy flag
        b" " * 24,
    ])
    assert len(uhl) == _UHL_LEN
    dsi = bytearray(b" " * _DSI_LEN)
    dsi[0:3] = b"DSI"
    dsi[3:4] = b"U"                      # security classification
    dsi[59:64] = b"DTED "                # product designator
    acc = bytearray(b" " * _ACC_LEN)
    acc[0:3] = b"ACC"

    stride = 12 + 2 * n_lat
    rec = np.zeros((n_lon, stride), dtype=np.uint8)
    rec[:, 0] = _SENTINEL
    block = np.arange(n_lon, dtype=np.uint32)
    rec[:, 1] = (block >> 16).astype(np.uint8)
    rec[:, 2] = (block >> 8).astype(np.uint8)
    rec[:, 3] = block.astype(np.uint8)
    rec[:, 4] = (block >> 8).astype(np.uint8)   # longitude count
    rec[:, 5] = block.astype(np.uint8)
    # latitude count (bytes 6-7) = 0
    cols = arr[::-1, :].T                        # south->north per column
    sm = np.ascontiguousarray(
        np.where(cols < 0, 0x8000 | (-cols), cols).astype(">u2"))
    rec[:, 8:-4] = sm.view(np.uint8).reshape(n_lon, 2 * n_lat)
    sums = rec[:, :-4].astype(np.uint32).sum(axis=1, dtype=np.uint64)
    rec[:, -4:] = sums.astype(">u4")[:, None].view(np.uint8)

    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(uhl)
        f.write(bytes(dsi))
        f.write(bytes(acc))
        f.write(rec.tobytes())
    os.replace(tmp, path)
