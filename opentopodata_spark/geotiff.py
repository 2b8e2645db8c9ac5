"""Pure-numpy GeoTIFF writer + memory-mapped windowed reader.

rasterio/GDAL is unavailable in this environment, so the engine ships its own
minimal GeoTIFF implementation sufficient for elevation rasters:

* single-band, uncompressed, single contiguous strip
* dtypes: float32/float64/int16/int32/uint16
* georeferencing via ModelPixelScale + ModelTiepoint (north-up affine only)
* CRS via GeoKeyDirectory (EPSG geographic/projected) or a WKT-only citation
  (mirrors the reference's WKT-only EU-DEM fixture,
  /root/reference/opentopodata/backend.py:97-100)
* NODATA via the GDAL_NODATA ascii tag (42113)

The reader memory-maps the pixel data, so 4x4 interpolation windows touch
only the OS pages they need — the moral equivalent of GDAL's block cache for
the uncompressed case. This is the property that matters at 100 TB: executor
tasks sample tiles without materializing whole rasters.

Also reads SRTM ``.hgt`` files (raw big-endian int16, bounds inferred from
the N00E010-style filename), matching the reference's SRTM support
(/root/reference/opentopodata/config.py:326-335).
"""

from __future__ import annotations

import math
import os
import re
import struct
from dataclasses import dataclass, field

import numpy as np

# TIFF tag codes
_T_WIDTH = 256
_T_HEIGHT = 257
_T_BITS = 258
_T_COMPRESSION = 259
_T_PHOTOMETRIC = 262
_T_STRIP_OFFSETS = 273
_T_SAMPLES_PER_PIXEL = 277
_T_ROWS_PER_STRIP = 278
_T_STRIP_BYTE_COUNTS = 279
_T_PLANAR_CONFIG = 284
_T_SAMPLE_FORMAT = 339
_T_MODEL_PIXEL_SCALE = 33550
_T_MODEL_TIEPOINT = 33922
_T_GEO_KEY_DIRECTORY = 34735
_T_GEO_ASCII_PARAMS = 34737
_T_GDAL_NODATA = 42113

# TIFF field types
_FT_SHORT = 3
_FT_LONG = 4
_FT_ASCII = 2
_FT_DOUBLE = 12

_FT_SIZE = {_FT_SHORT: 2, _FT_LONG: 4, _FT_ASCII: 1, _FT_DOUBLE: 8}

# GeoTIFF keys
_GK_MODEL_TYPE = 1024  # 1=projected 2=geographic
_GK_RASTER_TYPE = 1025  # 1=PixelIsArea
_GK_CITATION = 1026
_GK_GEOGRAPHIC_TYPE = 2048
_GK_PROJECTED_TYPE = 3072

_SAMPLE_FORMAT_FOR_KIND = {"u": 1, "i": 2, "f": 3}
_KIND_FOR_SAMPLE_FORMAT = {1: "u", 2: "i", 3: "f"}


@dataclass(frozen=True)
class CRSInfo:
    """CRS carried by a raster: EPSG code, or WKT-only (epsg is None)."""

    epsg: int | None = None
    wkt: str | None = None

    @property
    def is_epsg_code(self) -> bool:
        return self.epsg is not None


@dataclass(frozen=True)
class BoundingBox:
    left: float
    bottom: float
    right: float
    top: float


@dataclass
class Raster:
    """An open raster: memory-mapped band + georeferencing metadata.

    Mirrors the slice of the rasterio dataset API the reference engine uses
    (/root/reference/opentopodata/backend.py:89-151): crs, bounds, res,
    width/height, nodata, fractional index(), windowed reads.
    """

    path: str
    width: int
    height: int
    dtype: np.dtype
    nodata: float | None
    crs: CRSInfo
    # north-up affine: x = x0 + col*sx ; y = y0 - row*sy
    x0: float
    y0: float
    sx: float
    sy: float
    _data: np.ndarray = field(repr=False, default=None)

    @property
    def bounds(self) -> BoundingBox:
        return BoundingBox(
            left=self.x0,
            bottom=self.y0 - self.height * self.sy,
            right=self.x0 + self.width * self.sx,
            top=self.y0,
        )

    @property
    def res(self) -> tuple[float, float]:
        return (self.sx, self.sy)

    def index(self, xs, ys):
        """Fractional (row, col) of coordinates, like rasterio's
        ``f.index(xs, ys, op=noop)`` (reference backend.py:110)."""
        xs = np.asarray(xs, dtype=np.float64)
        ys = np.asarray(ys, dtype=np.float64)
        rows = (self.y0 - ys) / self.sy
        cols = (xs - self.x0) / self.sx
        return rows, cols

    def read_block(self, row0: int, row1: int, col0: int, col1: int) -> np.ndarray:
        """Read a [row0:row1, col0:col1] block (clipped) as float64 with
        NaN where NODATA. Out-of-array area is NOT included — callers pad."""
        r0 = max(row0, 0)
        r1 = min(row1, self.height)
        c0 = max(col0, 0)
        c1 = min(col1, self.width)
        block = np.asarray(self._data[r0:r1, c0:c1], dtype=np.float64)
        if self.nodata is not None:
            block = np.where(block == float(self.nodata), np.nan, block)
        return block

    @property
    def band(self) -> np.ndarray:
        """Whole band as stored dtype (memory-mapped; slicing is lazy)."""
        return self._data


def write_geotiff(
    path: str,
    array: np.ndarray,
    *,
    x0: float,
    y0: float,
    sx: float,
    sy: float,
    epsg: int | None = 4326,
    wkt: str | None = None,
    nodata: float | None = None,
) -> None:
    """Write a single-band north-up uncompressed GeoTIFF.

    (x0, y0) is the OUTER upper-left edge (GDAL convention); pixel centers
    are offset by half a pixel, exactly the convention the reference's
    bounds-validation relies on (backend.py:46-60).
    """
    array = np.ascontiguousarray(array)
    if array.ndim != 2:
        raise ValueError("array must be 2-D (single band)")
    h, w = array.shape
    kind = array.dtype.kind
    if kind not in _SAMPLE_FORMAT_FOR_KIND:
        raise ValueError(f"unsupported dtype {array.dtype}")
    bits = array.dtype.itemsize * 8

    # little-endian on disk
    data = array.astype(array.dtype.newbyteorder("<"), copy=False).tobytes()

    entries: list[tuple[int, int, int, bytes]] = []  # (tag, type, count, packed value bytes)

    def short(tag, v):
        entries.append((tag, _FT_SHORT, 1, struct.pack("<H", v)))

    def long_(tag, v):
        entries.append((tag, _FT_LONG, 1, struct.pack("<I", v)))

    short(_T_BITS, bits)
    long_(_T_WIDTH, w)
    long_(_T_HEIGHT, h)
    short(_T_COMPRESSION, 1)
    short(_T_PHOTOMETRIC, 1)
    short(_T_SAMPLES_PER_PIXEL, 1)
    long_(_T_ROWS_PER_STRIP, h)
    long_(_T_STRIP_BYTE_COUNTS, len(data))
    short(_T_PLANAR_CONFIG, 1)
    short(_T_SAMPLE_FORMAT, _SAMPLE_FORMAT_FOR_KIND[kind])

    # geo tags (values > 4 bytes go out-of-line)
    pixel_scale = struct.pack("<3d", sx, sy, 0.0)
    tiepoint = struct.pack("<6d", 0.0, 0.0, 0.0, x0, y0, 0.0)

    geo_keys: list[tuple[int, int, int, int]] = [(_GK_RASTER_TYPE, 0, 1, 1)]
    ascii_params = b""
    if wkt is not None:
        # WKT-only CRS: user-defined projected CS + citation carrying the WKT.
        geo_keys.append((_GK_MODEL_TYPE, 0, 1, 1))
        citation = wkt.encode() + b"|"
        geo_keys.append((_GK_CITATION, _T_GEO_ASCII_PARAMS, len(citation), 0))
        geo_keys.append((_GK_PROJECTED_TYPE, 0, 1, 32767))
        ascii_params = citation + b"\x00"
    elif epsg == 4326:
        geo_keys.append((_GK_MODEL_TYPE, 0, 1, 2))
        geo_keys.append((_GK_GEOGRAPHIC_TYPE, 0, 1, 4326))
    elif epsg is not None:
        geo_keys.append((_GK_MODEL_TYPE, 0, 1, 1))
        geo_keys.append((_GK_PROJECTED_TYPE, 0, 1, epsg))
    geo_keys.sort()
    gk = struct.pack("<4H", 1, 1, 0, len(geo_keys))
    for key in geo_keys:
        gk += struct.pack("<4H", *key)

    out_of_line: list[tuple[int, int, int, bytes]] = [
        (_T_MODEL_PIXEL_SCALE, _FT_DOUBLE, 3, pixel_scale),
        (_T_MODEL_TIEPOINT, _FT_DOUBLE, 6, tiepoint),
        (_T_GEO_KEY_DIRECTORY, _FT_SHORT, len(gk) // 2, gk),
    ]
    if ascii_params:
        out_of_line.append((_T_GEO_ASCII_PARAMS, _FT_ASCII, len(ascii_params), ascii_params))
    if nodata is not None:
        nd = (
            repr(int(nodata)) if float(nodata).is_integer() and abs(nodata) < 2**53
            else repr(float(nodata))
        )
        ndb = nd.encode() + b"\x00"
        out_of_line.append((_T_GDAL_NODATA, _FT_ASCII, len(ndb), ndb))

    # Layout: header(8) | pixel data | out-of-line values | IFD
    data_offset = 8
    ool_offset = data_offset + len(data)
    ool_bytes = b""
    for tag, ftype, count, payload in out_of_line:
        off = ool_offset + len(ool_bytes)
        entries.append((tag, ftype, count, struct.pack("<I", off)))
        ool_bytes += payload
        if len(payload) % 2:
            ool_bytes += b"\x00"
    long_(_T_STRIP_OFFSETS, data_offset)
    ifd_offset = ool_offset + len(ool_bytes)

    entries.sort(key=lambda e: e[0])
    ifd = struct.pack("<H", len(entries))
    for tag, ftype, count, value in entries:
        ifd += struct.pack("<HHI", tag, ftype, count) + value.ljust(4, b"\x00")
    ifd += struct.pack("<I", 0)

    header = struct.pack("<2sHI", b"II", 42, ifd_offset)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(header)
        f.write(data)
        f.write(ool_bytes)
        f.write(ifd)
    os.replace(tmp, path)


class RasterOpenError(ValueError):
    """File is not a readable raster."""


_HGT_RE = re.compile(r"([NSns])(\d+)([EWew])(\d+)")


def open_raster(path: str) -> Raster:
    """Open a GeoTIFF or SRTM .hgt raster, memory-mapping pixel data."""
    if path.lower().endswith(".hgt"):
        return _open_hgt(path)
    return _open_tiff(path)


def _open_hgt(path: str) -> Raster:
    size = os.path.getsize(path)
    side = int(round(math.sqrt(size / 2)))
    if side * side * 2 != size:
        raise RasterOpenError(f"'{path}' is not a square .hgt file")
    m = _HGT_RE.search(os.path.basename(path))
    if not m:
        raise RasterOpenError(f"cannot infer bounds from .hgt filename '{path}'")
    lat = int(m.group(2)) * (1 if m.group(1).lower() == "n" else -1)
    lon = int(m.group(4)) * (1 if m.group(3).lower() == "e" else -1)
    # SRTM: outer pixel centers on integer degree lines; 1-px overlap.
    res = 1.0 / (side - 1)
    data = np.memmap(path, dtype=">i2", mode="r", shape=(side, side))
    return Raster(
        path=path, width=side, height=side, dtype=np.dtype(">i2"),
        nodata=-32768.0, crs=CRSInfo(epsg=4326),
        x0=lon - res / 2, y0=lat + 1 + res / 2, sx=res, sy=res, _data=data,
    )


def _open_tiff(path: str) -> Raster:
    with open(path, "rb") as f:
        head = f.read(8)
        if len(head) < 8 or head[:2] not in (b"II", b"MM"):
            raise RasterOpenError(f"'{path}' not recognised as a geo raster")
        bo = "<" if head[:2] == b"II" else ">"
        magic, ifd_offset = struct.unpack(bo + "HI", head[2:8])
        if magic != 42:
            raise RasterOpenError(f"'{path}' not a TIFF (magic={magic})")
        f.seek(ifd_offset)
        (n_entries,) = struct.unpack(bo + "H", f.read(2))
        raw_entries = f.read(n_entries * 12)
        tags: dict[int, tuple[int, int, bytes]] = {}
        for i in range(n_entries):
            tag, ftype, count = struct.unpack_from(bo + "HHI", raw_entries, i * 12)
            tags[tag] = (ftype, count, raw_entries[i * 12 + 8 : i * 12 + 12])

        def value(tag, default=None):
            if tag not in tags:
                return default
            ftype, count, raw = tags[tag]
            sz = _FT_SIZE[ftype] * count
            if sz <= 4:
                buf = raw[:sz]
            else:
                (off,) = struct.unpack(bo + "I", raw)
                f.seek(off)
                buf = f.read(sz)
            if ftype == _FT_ASCII:
                return buf.rstrip(b"\x00").decode("latin-1")
            fmt = {_FT_SHORT: "H", _FT_LONG: "I", _FT_DOUBLE: "d"}[ftype]
            vals = struct.unpack(bo + str(count) + fmt, buf)
            return list(vals)

        width = int(value(_T_WIDTH)[0])
        height = int(value(_T_HEIGHT)[0])
        bits = int(value(_T_BITS, [8])[0])
        comp = int(value(_T_COMPRESSION, [1])[0])
        if comp != 1:
            raise RasterOpenError(f"'{path}': compressed TIFF not supported")
        sfmt = int(value(_T_SAMPLE_FORMAT, [1])[0])
        kind = _KIND_FOR_SAMPLE_FORMAT.get(sfmt)
        if kind is None:
            raise RasterOpenError(f"'{path}': unsupported sample format {sfmt}")
        dtype = np.dtype(f"{bo}{kind}{bits // 8}")

        strip_offsets = value(_T_STRIP_OFFSETS)
        strip_counts = value(_T_STRIP_BYTE_COUNTS)
        scale = value(_T_MODEL_PIXEL_SCALE)
        tiepoint = value(_T_MODEL_TIEPOINT)
        if scale is None or tiepoint is None:
            raise RasterOpenError(f"'{path}' has no georeferencing")
        sx, sy = float(scale[0]), float(scale[1])
        # tiepoint: raster (i,j,k) -> model (X,Y,Z); assume (0,0) anchor
        x0 = float(tiepoint[3]) - float(tiepoint[0]) * sx
        y0 = float(tiepoint[4]) + float(tiepoint[1]) * sy

        nodata_s = value(_T_GDAL_NODATA)
        nodata = float(nodata_s) if nodata_s not in (None, "") else None

        epsg: int | None = None
        wkt: str | None = None
        gk = value(_T_GEO_KEY_DIRECTORY)
        ascii_params = value(_T_GEO_ASCII_PARAMS, "")
        if gk:
            n_keys = int(gk[3])
            for i in range(n_keys):
                key, loc, cnt, val = gk[4 + 4 * i : 8 + 4 * i]
                if key == _GK_GEOGRAPHIC_TYPE and loc == 0:
                    epsg = int(val)
                elif key == _GK_PROJECTED_TYPE and loc == 0 and val != 32767:
                    epsg = int(val)
                elif key == _GK_CITATION and loc == _T_GEO_ASCII_PARAMS:
                    wkt = ascii_params[val : val + cnt].rstrip("|")
        if epsg is None and wkt is None:
            raise RasterOpenError(f"'{path}' has no coordinate reference system")

    # contiguity check lets us use one memmap even with many strips
    if len(strip_offsets) == 1:
        data = np.memmap(
            path, dtype=dtype, mode="r", offset=int(strip_offsets[0]),
            shape=(height, width),
        )
    else:
        expected = [strip_offsets[0]]
        for c in strip_counts[:-1]:
            expected.append(expected[-1] + c)
        if list(map(int, strip_offsets)) == list(map(int, expected)):
            data = np.memmap(
                path, dtype=dtype, mode="r", offset=int(strip_offsets[0]),
                shape=(height, width),
            )
        else:
            # rare: materialize (small files only in practice)
            parts = []
            with open(path, "rb") as g:
                for off, cnt in zip(strip_offsets, strip_counts):
                    g.seek(int(off))
                    parts.append(g.read(int(cnt)))
            data = np.frombuffer(b"".join(parts), dtype=dtype).reshape(height, width)

    return Raster(
        path=path, width=width, height=height, dtype=dtype, nodata=nodata,
        crs=CRSInfo(epsg=epsg, wkt=wkt), x0=x0, y0=y0, sx=sx, sy=sy, _data=data,
    )
