"""NTv2 datum-shift grids (.gsb): reader, writer, and interpolation.

The reference delegates datum-grid transformations (NAD27->NAD83,
OSTN-class national corrections) to PROJ's grid machinery
(/root/reference/opentopodata/utils.py:17-52 accepts any PROJ CRS). This
engine's Helmert-only shifts are metre-class approximations; NTv2 is the
public, GDAL/PROJ-standard binary format those corrections ship in, and
this module implements it from the published spec:

- 11 overview records (8-byte keyword + 8-byte value), N subgrid
  headers, float32 nodes of (lat shift, lon shift, accuracies) in
  ARC-SECONDS with NTv2's positive-WEST longitude convention, rows
  south->north and columns east->west,
- bilinear interpolation inside the densest subgrid covering a point
  (parent/child nesting resolved by smallest cell area),
- forward (source datum -> target datum) applies the interpolated
  shift; inverse iterates fixed-point (4 rounds, the PROJ approach)
  because shifts are defined at source coordinates,
- points outside every subgrid pass through UNSHIFTED (PROJ's grid
  fallback behavior with +nadgrids=@file,null semantics documented).

`crs.register_ntv2(epsg, path, direction)` attaches a grid to an EPSG
so the projection dispatch wraps it instead of (or on top of) the
Helmert approximation.
"""

from __future__ import annotations

import os
import struct
from dataclasses import dataclass

import numpy as np


class NTv2Error(ValueError):
    pass


@dataclass
class _SubGrid:
    name: str
    parent: str
    s_lat: float  # arc-seconds
    n_lat: float
    e_lon: float  # positive-west arc-seconds
    w_lon: float
    lat_inc: float
    lon_inc: float
    lat_shift: np.ndarray  # (nrows, ncols) arc-seconds
    lon_shift: np.ndarray  # positive west

    @property
    def cell_area(self) -> float:
        return self.lat_inc * self.lon_inc

    def covers(self, lat_sec: np.ndarray, lonw_sec: np.ndarray) -> np.ndarray:
        return (
            (lat_sec >= self.s_lat) & (lat_sec <= self.n_lat)
            & (lonw_sec >= self.e_lon) & (lonw_sec <= self.w_lon)
        )

    def interpolate(self, lat_sec, lonw_sec):
        """Bilinear (lat shift sec, lon shift sec-west) at the points."""
        fr = (lat_sec - self.s_lat) / self.lat_inc
        fc = (lonw_sec - self.e_lon) / self.lon_inc
        nrows, ncols = self.lat_shift.shape
        r0 = np.clip(np.floor(fr).astype(np.int64), 0, nrows - 2)
        c0 = np.clip(np.floor(fc).astype(np.int64), 0, ncols - 2)
        dr = np.clip(fr - r0, 0.0, 1.0)
        dc = np.clip(fc - c0, 0.0, 1.0)

        def bil(g):
            return (
                g[r0, c0] * (1 - dr) * (1 - dc)
                + g[r0 + 1, c0] * dr * (1 - dc)
                + g[r0, c0 + 1] * (1 - dr) * dc
                + g[r0 + 1, c0 + 1] * dr * dc
            )

        return bil(self.lat_shift), bil(self.lon_shift)


def _records(buf: bytes, at: int, n: int) -> dict[str, bytes]:
    out = {}
    for i in range(n):
        off = at + 16 * i
        key = buf[off : off + 8].decode("latin-1").strip()
        out[key] = buf[off + 8 : off + 16]
    return out


def _f8(v: bytes) -> float:
    return struct.unpack("<d", v)[0]


def _i4(v: bytes) -> int:
    return struct.unpack("<i", v[:4])[0]


class NTv2Grid:
    """A loaded .gsb file: one or more (possibly nested) subgrids."""

    def __init__(self, subgrids: list[_SubGrid], path: str = "<memory>"):
        if not subgrids:
            raise NTv2Error(f"'{path}': NTv2 file has no subgrids")
        self.subgrids = subgrids
        self.path = path

    @classmethod
    def load(cls, path: str) -> "NTv2Grid":
        with open(path, "rb") as f:
            buf = f.read()
        return cls.parse(buf, path)

    @classmethod
    def parse(cls, buf: bytes, path: str = "<memory>") -> "NTv2Grid":
        if len(buf) < 11 * 16 or buf[:8].decode("latin-1").strip() != "NUM_OREC":
            raise NTv2Error(f"'{path}': not an NTv2 .gsb file")
        over = _records(buf, 0, 11)
        n_orec = _i4(over["NUM_OREC"])
        if n_orec != 11:
            raise NTv2Error(f"'{path}': NUM_OREC={n_orec} unsupported")
        n_srec = _i4(over["NUM_SREC"])
        n_files = _i4(over["NUM_FILE"])
        gs_type = over.get("GS_TYPE", b"SECONDS ").decode("latin-1").strip()
        if gs_type != "SECONDS":
            raise NTv2Error(f"'{path}': GS_TYPE {gs_type} unsupported")
        at = 11 * 16
        subs: list[_SubGrid] = []
        for _ in range(n_files):
            hdr = _records(buf, at, n_srec)
            at += n_srec * 16
            s_lat, n_lat = _f8(hdr["S_LAT"]), _f8(hdr["N_LAT"])
            e_lon, w_lon = _f8(hdr["E_LONG"]), _f8(hdr["W_LONG"])
            lat_inc, lon_inc = _f8(hdr["LAT_INC"]), _f8(hdr["LONG_INC"])
            count = _i4(hdr["GS_COUNT"])
            nrows = int(round((n_lat - s_lat) / lat_inc)) + 1
            ncols = int(round((w_lon - e_lon) / lon_inc)) + 1
            if nrows * ncols != count:
                raise NTv2Error(
                    f"'{path}': GS_COUNT {count} != {nrows}x{ncols}"
                )
            nodes = np.frombuffer(
                buf, dtype="<f4", count=count * 4, offset=at
            ).reshape(count, 4)
            at += count * 16
            subs.append(_SubGrid(
                name=hdr["SUB_NAME"].decode("latin-1").strip(),
                parent=hdr["PARENT"].decode("latin-1").strip(),
                s_lat=s_lat, n_lat=n_lat, e_lon=e_lon, w_lon=w_lon,
                lat_inc=lat_inc, lon_inc=lon_inc,
                lat_shift=nodes[:, 0].astype(np.float64).reshape(
                    nrows, ncols),
                lon_shift=nodes[:, 1].astype(np.float64).reshape(
                    nrows, ncols),
            ))
        return cls(subs, path)

    def shift(self, lats, lons):
        """(dlat_deg, dlon_deg) at WGS-style lat/lon degrees; zero where
        no subgrid covers a point. The densest covering subgrid wins
        (NTv2 child grids refine their parents)."""
        lats = np.asarray(lats, dtype=np.float64)
        lons = np.asarray(lons, dtype=np.float64)
        lat_sec = lats * 3600.0
        lonw_sec = -lons * 3600.0  # NTv2 positive west
        dlat = np.zeros_like(lat_sec)
        dlonw = np.zeros_like(lonw_sec)
        covered = np.zeros(lat_sec.shape, dtype=bool)
        for sg in sorted(self.subgrids, key=lambda s: s.cell_area):
            m = sg.covers(lat_sec, lonw_sec) & ~covered
            if not np.any(m):
                continue
            a, b = sg.interpolate(lat_sec[m], lonw_sec[m])
            dlat[m] = a
            dlonw[m] = b
            covered[m] = True
        return dlat / 3600.0, -dlonw / 3600.0  # east-positive degrees

    def forward(self, lats, lons):
        """Source datum -> target datum (the grid's published direction,
        e.g. NAD27 -> NAD83)."""
        dlat, dlon = self.shift(lats, lons)
        return lats + dlat, lons + dlon

    def inverse(self, lats, lons, iterations: int = 4):
        """Target datum -> source datum: fixed-point iteration, since
        shifts are defined at SOURCE coordinates (PROJ does the same)."""
        lats = np.asarray(lats, dtype=np.float64)
        lons = np.asarray(lons, dtype=np.float64)
        src_lat, src_lon = lats.copy(), lons.copy()
        for _ in range(iterations):
            dlat, dlon = self.shift(src_lat, src_lon)
            src_lat = lats - dlat
            src_lon = lons - dlon
        return src_lat, src_lon


class GridShiftedDatum:
    """Datum adapter for crs.DatumShifted built on an NTv2 grid.

    ``direction='to_wgs84'`` (the common case): the grid transforms the
    LOCAL datum to the WGS84-coincident one (NAD27->NAD83,
    local->ETRS89), so from_wgs84 runs the grid inverse.
    ``direction='from_wgs84'``: the grid is published the other way.
    """

    def __init__(self, grid: NTv2Grid, direction: str = "to_wgs84"):
        if direction not in ("to_wgs84", "from_wgs84"):
            raise NTv2Error(f"bad grid direction '{direction}'")
        self.grid = grid
        self.direction = direction

    def from_wgs84(self, lons, lats):
        if self.direction == "to_wgs84":
            la, lo = self.grid.inverse(lats, lons)
        else:
            la, lo = self.grid.forward(lats, lons)
        return lo, la

    def to_wgs84(self, lons, lats):
        if self.direction == "to_wgs84":
            la, lo = self.grid.forward(lats, lons)
        else:
            la, lo = self.grid.inverse(lats, lons)
        return lo, la


def write_gsb(
    path: str,
    *,
    s_lat_deg: float,
    n_lat_deg: float,
    w_lon_deg: float,
    e_lon_deg: float,
    lat_inc_deg: float,
    lon_inc_deg: float,
    lat_shift_sec: np.ndarray,
    lon_shift_sec_west: np.ndarray,
    name: str = "SYNTH",
) -> None:
    """Write a single-subgrid NTv2 .gsb (fixture generator + a real sink
    for publishing correction grids). Shift arrays are (nrows, ncols)
    row 0 = S_LAT, col 0 = E_LONG (NTv2 node order), arc-seconds,
    longitude positive WEST."""
    lat_shift_sec = np.asarray(lat_shift_sec, dtype="<f4")
    lon_shift_sec_west = np.asarray(lon_shift_sec_west, dtype="<f4")
    nrows, ncols = lat_shift_sec.shape
    s_lat, n_lat = s_lat_deg * 3600.0, n_lat_deg * 3600.0
    e_lon, w_lon = -e_lon_deg * 3600.0, -w_lon_deg * 3600.0
    lat_inc, lon_inc = lat_inc_deg * 3600.0, lon_inc_deg * 3600.0

    def rec(key: str, val: bytes) -> bytes:
        return key.encode("latin-1").ljust(8) + val

    def frec(key: str, v: float) -> bytes:
        return rec(key, struct.pack("<d", v))

    def irec(key: str, v: int) -> bytes:
        return rec(key, struct.pack("<i", v) + b"\x00" * 4)

    def srec(key: str, v: str) -> bytes:
        return rec(key, v.encode("latin-1").ljust(8)[:8])

    out = bytearray()
    out += irec("NUM_OREC", 11)
    out += irec("NUM_SREC", 11)
    out += irec("NUM_FILE", 1)
    out += srec("GS_TYPE", "SECONDS")
    out += srec("VERSION", "NTv2.0")
    out += srec("SYSTEM_F", "LOCAL")
    out += srec("SYSTEM_T", "WGS84")
    out += frec("MAJOR_F", 6378137.0)
    out += frec("MINOR_F", 6356752.314)
    out += frec("MAJOR_T", 6378137.0)
    out += frec("MINOR_T", 6356752.314)
    out += srec("SUB_NAME", name)
    out += srec("PARENT", "NONE")
    out += srec("CREATED", "20260101")
    out += srec("UPDATED", "20260101")
    out += frec("S_LAT", s_lat)
    out += frec("N_LAT", n_lat)
    out += frec("E_LONG", e_lon)
    out += frec("W_LONG", w_lon)
    out += frec("LAT_INC", lat_inc)
    out += frec("LONG_INC", lon_inc)
    out += irec("GS_COUNT", nrows * ncols)
    nodes = np.zeros((nrows * ncols, 4), dtype="<f4")
    nodes[:, 0] = lat_shift_sec.reshape(-1)
    nodes[:, 1] = lon_shift_sec_west.reshape(-1)
    out += nodes.tobytes()
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(bytes(out))
    os.replace(tmp, path)
