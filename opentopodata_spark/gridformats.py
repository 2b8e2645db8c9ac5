"""Esri ASCII grid, gridded XYZ, Esri BIL/EHdr, and netCDF3-classic
raster readers.

The reference opens these through rasterio/GDAL (AAIGrid, EHdr and
netCDF drivers — /root/reference/opentopodata/backend.py:89 just calls
``rasterio.open``); this sandbox has no GDAL, so the engine ships
minimal pure-numpy readers implementing the public format specs:

* **Esri ASCII grid** (``.asc``/``.agr``, GDAL AAIGrid): text header
  (ncols/nrows, xllcorner|xllcenter, cellsize or dx/dy, NODATA_value)
  followed by whitespace-separated samples, row 0 = north. CRS comes
  from a ``.prj`` WKT sidecar when present, else defaults to EPSG:4326
  (elevation .asc tiles are overwhelmingly geographic; the sidecar
  overrides).
* **Esri BIL / EHdr** (``.bil`` + ``.hdr`` sidecar, GDAL EHdr): flat
  binary with a key/value text header. ULXMAP/ULYMAP are the CENTER of
  the upper-left pixel (GDAL frmts/raw/ehdrdataset.cpp semantics), so
  the affine origin is offset by half a cell.
* **netCDF3 classic / 64-bit-offset** (``.nc`` magics ``CDF\\x01`` /
  ``CDF\\x02``): the self-describing binary format per the public
  NetCDF classic-format spec. The reader picks the 2-D data variable,
  georeferences from its 1-D coordinate variables (cell-center
  convention, uniform spacing enforced), honors ``_FillValue`` /
  ``missing_value`` as nodata, and applies ``scale_factor``/
  ``add_offset`` when present. ETOPO1-style global DEMs ship in exactly
  this layout.

All three return the same :class:`opentopodata_spark.geotiff.Raster`
the GeoTIFF/HGT paths produce, so every downstream operator (windowed
interpolation, bounds predicates, terrain stencils, overview builds) is
format-agnostic.

Scale shape: BIL and netCDF are fixed-stride binary, so reads
memory-map — a 4x4 interpolation window touches only the OS pages it
needs, the same property the uncompressed-GeoTIFF path has, and decoded
data is never duplicated per task. South-up netCDF grids (ascending
latitude coordinate) are exposed through a flipped *view* of the memmap
(still lazy). ASCII grid is text with no fixed row stride, so it parses
once at open into an in-memory array: .asc tiles are small in practice
(the format predates tiling) and the parse is one vectorized
``np.fromstring``; anything 100 TB-scale should be (and in the wild is)
GeoTIFF.
"""

from __future__ import annotations

import gzip
import os
import re
import struct

import numpy as np

from .geotiff import CRSInfo, Raster, RasterOpenError

__all__ = [
    "open_ascii_grid",
    "open_bil",
    "open_netcdf",
    "open_xyz",
    "write_ascii_grid",
    "write_bil",
    "write_netcdf",
    "write_xyz",
]


# ---------------------------------------------------------------------------
# shared: .prj sidecar -> CRSInfo
# ---------------------------------------------------------------------------

_WKT_EPSG_RE = re.compile(r'AUTHORITY\s*\[\s*"EPSG"\s*,\s*"?(\d+)"?', re.I)


def _crs_from_prj(path: str, default_epsg: int = 4326) -> CRSInfo:
    """CRS from the raster's ``.prj`` WKT sidecar. The top-level
    AUTHORITY node is the LAST one in a WKT string (inner nodes tag the
    datum/spheroid), so the last EPSG match wins. Without a sidecar the
    grid defaults to EPSG:4326 — documented divergence from GDAL (which
    leaves the CRS unset and lets the caller fail later)."""
    prj = os.path.splitext(path)[0] + ".prj"
    if not os.path.exists(prj):
        return CRSInfo(epsg=default_epsg)
    with open(prj, "r", encoding="utf-8", errors="replace") as f:
        wkt = f.read().strip()
    codes = _WKT_EPSG_RE.findall(wkt)
    return CRSInfo(epsg=int(codes[-1]) if codes else None, wkt=wkt or None)


def _read_maybe_gz(path: str) -> bytes:
    if path.lower().endswith(".gz"):
        with gzip.open(path, "rb") as f:
            return f.read()
    with open(path, "rb") as f:
        return f.read()


# ---------------------------------------------------------------------------
# Esri ASCII grid (GDAL AAIGrid)
# ---------------------------------------------------------------------------

_ASC_HEADER_KEYS = {
    "ncols", "nrows", "xllcorner", "yllcorner", "xllcenter", "yllcenter",
    "cellsize", "dx", "dy", "nodata_value",
}


def open_ascii_grid(path: str) -> Raster:
    """Parse an Esri ASCII grid (optionally ``.asc.gz``) into a Raster.

    GDAL's AAIGrid type rule is mirrored: integer-looking data (no '.',
    'e' or nan token in the body) loads as int32, anything else as
    float32 (frmts/aaigrid driver docs)."""
    text = _read_maybe_gz(path).decode("ascii", errors="replace")
    pos = 0
    header: dict[str, float] = {}
    # header: up to ~6 "key value" lines; stop at the first line whose
    # first token is not a known key (the data body)
    for m in re.finditer(r"[^\n]*\n|[^\n]+$", text):
        line = m.group(0)
        parts = line.split()
        if parts and parts[0].lower() in _ASC_HEADER_KEYS and len(parts) >= 2:
            header[parts[0].lower()] = float(parts[1])
            pos = m.end()
            continue
        break
    for req in ("ncols", "nrows"):
        if req not in header:
            raise RasterOpenError(f"'{path}': ASCII grid missing {req}")
    ncols, nrows = int(header["ncols"]), int(header["nrows"])
    if ncols <= 0 or nrows <= 0:
        raise RasterOpenError(f"'{path}': bad ASCII grid dimensions")
    if "dx" in header or "dy" in header:
        sx = float(header.get("dx", header.get("cellsize", 0)))
        sy = float(header.get("dy", header.get("cellsize", 0)))
    else:
        if "cellsize" not in header:
            raise RasterOpenError(f"'{path}': ASCII grid missing cellsize")
        sx = sy = float(header["cellsize"])
    if sx <= 0 or sy <= 0:
        raise RasterOpenError(f"'{path}': bad ASCII grid cell size")
    if "xllcorner" in header:
        x0 = header["xllcorner"]
    elif "xllcenter" in header:
        x0 = header["xllcenter"] - sx / 2.0
    else:
        raise RasterOpenError(f"'{path}': ASCII grid missing xllcorner")
    if "yllcorner" in header:
        yll = header["yllcorner"]
    elif "yllcenter" in header:
        yll = header["yllcenter"] - sy / 2.0
    else:
        raise RasterOpenError(f"'{path}': ASCII grid missing yllcorner")
    y0 = yll + nrows * sy  # top edge

    body = text[pos:]
    is_float = bool(re.search(r"[.eE]|nan|inf", body))
    try:
        data = np.array(body.split(), dtype=np.float64)
    except ValueError:
        raise RasterOpenError(f"'{path}': non-numeric ASCII grid body")
    if data.size != nrows * ncols:
        raise RasterOpenError(
            f"'{path}': ASCII grid body has {data.size} samples, "
            f"expected {nrows * ncols}"
        )
    dtype = np.dtype(np.float32) if is_float else np.dtype(np.int32)
    arr = data.reshape(nrows, ncols).astype(dtype)
    nodata = header.get("nodata_value")
    src = path[:-3] if path.lower().endswith(".gz") else path
    return Raster(
        path=path, width=ncols, height=nrows, dtype=dtype, nodata=nodata,
        crs=_crs_from_prj(src), x0=x0, y0=y0, sx=sx, sy=sy, _data=arr,
    )


def write_ascii_grid(
    path: str,
    array: np.ndarray,
    *,
    x0: float,
    y0: float,
    sx: float,
    sy: float | None = None,
    nodata: float | None = None,
    wkt: str | None = None,
) -> None:
    """Write an Esri ASCII grid (row 0 = north, (x0, y0) = top-left
    EDGE like the engine's GeoTIFF writer; the header stores the
    format's native lower-left corner). sy defaults to sx (the classic
    single-cellsize header; pass sy to emit dx/dy)."""
    a = np.asarray(array)
    if a.ndim != 2:
        raise ValueError("ASCII grid array must be 2-D")
    nrows, ncols = a.shape
    syv = sx if sy is None else sy
    lines = [f"ncols {ncols}", f"nrows {nrows}",
             f"xllcorner {x0!r}", f"yllcorner {y0 - nrows * syv!r}"]
    if sy is None:
        lines.append(f"cellsize {sx!r}")
    else:
        lines += [f"dx {sx!r}", f"dy {syv!r}"]
    if nodata is not None:
        nd = int(nodata) if float(nodata).is_integer() else nodata
        lines.append(f"NODATA_value {nd}")
    body = "\n".join(
        " ".join(repr(v) if a.dtype.kind == "f" else str(int(v)) for v in row)
        for row in a
    )
    with open(path, "w", encoding="ascii") as f:
        f.write("\n".join(lines) + "\n" + body + "\n")
    if wkt is not None:
        with open(os.path.splitext(path)[0] + ".prj", "w") as f:
            f.write(wkt)


# ---------------------------------------------------------------------------
# gridded XYZ (GDAL XYZ driver)
# ---------------------------------------------------------------------------

_XYZ_X_NAMES = ("x", "lon", "long", "longitude", "east", "easting")
_XYZ_Y_NAMES = ("y", "lat", "latitude", "north", "northing")
_XYZ_Z_NAMES = ("z", "alt", "altitude", "height", "elev", "elevation", "value")


def _xyz_pick(names: list[str], candidates: tuple[str, ...], default: int) -> int:
    for i, nm in enumerate(names):
        if nm in candidates:
            return i
    return default


def open_xyz(path: str) -> Raster:
    """Parse a gridded-XYZ DEM (optionally ``.xyz.gz``) into a Raster —
    GDAL's XYZ driver semantics: one ``x y z`` triple per line (space,
    comma, semicolon or tab separated), points on a REGULAR grid with
    coordinates at cell CENTERS, an optional header line naming the
    columns (picked by name, else positional 0/1/2). Both north-first
    and south-first scan orders load; missing cells become NaN (the
    engine's native nodata), forcing a float grid like GDAL's sparse-
    grid handling. Non-grid point clouds are rejected loudly.

    Like .asc this is a text format with no fixed row stride, so it
    parses once at open (one vectorized split); wild XYZ DEM tiles
    (e.g. the Swiss/German state open-data drops) are small per tile.
    """
    text = _read_maybe_gz(path).decode("ascii", errors="replace")
    for sep in (",", ";", "\t"):
        text = text.replace(sep, " ")
    tokens_per_line = None
    ix, iy, iz = 0, 1, 2
    body_start = 0
    for m in re.finditer(r"[^\n]*\n|[^\n]+$", text):
        parts = m.group(0).split()
        if not parts:
            body_start = m.end()
            continue
        try:
            float(parts[0])
        except ValueError:
            names = [p.lower() for p in parts]
            ix = _xyz_pick(names, _XYZ_X_NAMES, 0)
            iy = _xyz_pick(names, _XYZ_Y_NAMES, 1)
            iz = _xyz_pick(names, _XYZ_Z_NAMES, 2)
            tokens_per_line = len(parts)
            body_start = m.end()
            break
        tokens_per_line = len(parts)
        break
    body = text[body_start:]
    try:
        flat = np.array(body.split(), dtype=np.float64)
    except ValueError:
        raise RasterOpenError(f"'{path}': non-numeric XYZ body")
    ncolumns = tokens_per_line or 3
    if ncolumns < 3 or flat.size == 0 or flat.size % ncolumns:
        raise RasterOpenError(f"'{path}': XYZ body is not rows of {ncolumns}")
    vals = flat.reshape(-1, ncolumns)
    x, y, z = vals[:, ix], vals[:, iy], vals[:, iz]
    xs, ys = np.unique(x), np.unique(y)
    nrows, ncols = ys.size, xs.size
    if nrows < 1 or ncols < 1 or len(vals) > nrows * ncols:
        raise RasterOpenError(f"'{path}': XYZ points do not form a grid")
    for nm, c in (("x", xs), ("y", ys)):
        if c.size >= 2:
            steps = np.diff(c)
            if not np.allclose(steps, steps[0], rtol=1e-6, atol=0):
                raise RasterOpenError(
                    f"'{path}': non-uniform {nm} spacing — XYZ points do "
                    "not form a regular grid"
                )
    sx = float(xs[1] - xs[0]) if ncols >= 2 else 1.0
    sy = float(ys[1] - ys[0]) if nrows >= 2 else 1.0
    col = np.searchsorted(xs, x)
    row = (nrows - 1) - np.searchsorted(ys, y)  # row 0 = north
    if np.unique(row * ncols + col).size != len(vals):
        raise RasterOpenError(f"'{path}': duplicate XYZ grid point")
    sparse = len(vals) < nrows * ncols
    integral = not sparse and bool(np.all(z == np.rint(z)))
    dtype = np.dtype(np.int32) if integral else np.dtype(np.float32)
    arr = np.full((nrows, ncols), np.nan, dtype=np.float64)
    arr[row, col] = z
    src = path[:-3] if path.lower().endswith(".gz") else path
    return Raster(
        path=path, width=ncols, height=nrows, dtype=dtype, nodata=None,
        crs=_crs_from_prj(src),
        x0=float(xs[0] - sx / 2.0), y0=float(ys[-1] + sy / 2.0),
        sx=sx, sy=sy, _data=arr.astype(dtype),
    )


def write_xyz(
    path: str,
    array: np.ndarray,
    *,
    x0: float,
    y0: float,
    sx: float,
    sy: float | None = None,
    wkt: str | None = None,
    header: bool = False,
) -> None:
    """Write a gridded XYZ file (north-first scan lines, x ascending,
    cell-center coordinates — the layout GDAL's XYZ writer emits).
    (x0, y0) is the top-left EDGE like the engine's other writers."""
    a = np.asarray(array)
    if a.ndim != 2:
        raise ValueError("XYZ array must be 2-D")
    nrows, ncols = a.shape
    syv = sx if sy is None else sy
    is_f = a.dtype.kind == "f"
    lines = ["x y z"] if header else []
    for r in range(nrows):
        yv = y0 - (r + 0.5) * syv
        for c in range(ncols):
            xv = x0 + (c + 0.5) * sx
            zv = repr(float(a[r, c])) if is_f else str(int(a[r, c]))
            lines.append(f"{xv!r} {yv!r} {zv}")
    with open(path, "w", encoding="ascii") as f:
        f.write("\n".join(lines) + "\n")
    if wkt is not None:
        with open(os.path.splitext(path)[0] + ".prj", "w") as f:
            f.write(wkt)


# ---------------------------------------------------------------------------
# Esri BIL / EHdr (.bil + .hdr sidecar)
# ---------------------------------------------------------------------------

_BIL_DTYPES = {
    # (nbits, pixeltype) -> numpy kind;  EHdr PIXELTYPE defaults SIGNEDINT
    (8, "UNSIGNEDINT"): "u1", (8, "SIGNEDINT"): "i1",
    (16, "UNSIGNEDINT"): "u2", (16, "SIGNEDINT"): "i2",
    (32, "UNSIGNEDINT"): "u4", (32, "SIGNEDINT"): "i4",
    (32, "FLOAT"): "f4", (64, "FLOAT"): "f8",
}


def open_bil(path: str) -> Raster:
    """Open an Esri BIL via its .hdr sidecar. Band-interleaved-by-line
    multi-band files expose band 1 through a strided memmap view (the
    rasterio ``read(1)`` semantics the reference uses) — nothing beyond
    the touched pages is read."""
    base = os.path.splitext(path)[0]
    hdr_path = None
    for cand in (base + ".hdr", base + ".HDR"):  # GTOPO30 ships .HDR
        if os.path.exists(cand):
            hdr_path = cand
            break
    if hdr_path is None:
        raise RasterOpenError(f"'{path}': missing .hdr sidecar")
    kv: dict[str, str] = {}
    with open(hdr_path, "r", encoding="ascii", errors="replace") as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 2:
                kv[parts[0].upper()] = parts[1]
    try:
        nrows = int(kv["NROWS"])
        ncols = int(kv["NCOLS"])
    except KeyError as e:
        raise RasterOpenError(f"'{path}': .hdr missing {e.args[0]}")
    nbands = int(kv.get("NBANDS", "1"))
    nbits = int(kv.get("NBITS", "8"))
    layout = kv.get("LAYOUT", "BIL").upper()
    pixeltype = kv.get("PIXELTYPE", "SIGNEDINT").upper()
    byteorder = "<" if kv.get("BYTEORDER", "I").upper().startswith("I") else ">"
    skip = int(kv.get("SKIPBYTES", "0"))
    if layout not in ("BIL", "BSQ"):
        raise RasterOpenError(f"'{path}': unsupported layout {layout}")
    kind = _BIL_DTYPES.get((nbits, pixeltype))
    if kind is None:
        raise RasterOpenError(
            f"'{path}': unsupported NBITS={nbits} PIXELTYPE={pixeltype}"
        )
    dtype = np.dtype(byteorder + kind)
    # georeferencing: ULXMAP/ULYMAP are the CENTER of the UL pixel
    sx = float(kv.get("XDIM", "1"))
    sy = float(kv.get("YDIM", kv.get("XDIM", "1")))
    ulx = float(kv.get("ULXMAP", str(sx / 2.0)))
    uly = float(kv.get("ULYMAP", str(nrows * sy - sy / 2.0)))
    x0 = ulx - sx / 2.0
    y0 = uly + sy / 2.0
    nodata = float(kv["NODATA"]) if "NODATA" in kv else None

    if layout == "BIL" and nbands > 1:
        mm = np.memmap(path, dtype=dtype, mode="r", offset=skip,
                       shape=(nrows, nbands, ncols))
        data = mm[:, 0, :]
    else:  # single band, or BSQ where band 1 is the leading plane
        mm = np.memmap(path, dtype=dtype, mode="r", offset=skip,
                       shape=(nrows, ncols))
        data = mm
    return Raster(
        path=path, width=ncols, height=nrows, dtype=dtype, nodata=nodata,
        crs=_crs_from_prj(path), x0=x0, y0=y0, sx=sx, sy=sy, _data=data,
    )


def write_bil(
    path: str,
    array: np.ndarray,
    *,
    x0: float,
    y0: float,
    sx: float,
    sy: float | None = None,
    nodata: float | None = None,
    wkt: str | None = None,
    byteorder: str = "<",
) -> None:
    """Write a single-band BIL + .hdr (GDAL EHdr-compatible)."""
    a = np.asarray(array)
    if a.ndim != 2:
        raise ValueError("BIL array must be 2-D")
    syv = sx if sy is None else sy
    kind = a.dtype.kind
    nbits = a.dtype.itemsize * 8
    pixeltype = {"u": "UNSIGNEDINT", "i": "SIGNEDINT", "f": "FLOAT"}.get(kind)
    if pixeltype is None or (nbits, pixeltype) not in _BIL_DTYPES:
        raise ValueError(f"unsupported BIL dtype {a.dtype}")
    a.astype(a.dtype.newbyteorder(byteorder)).tofile(path)
    nrows, ncols = a.shape
    hdr = [
        "BYTEORDER I" if byteorder == "<" else "BYTEORDER M",
        "LAYOUT BIL",
        f"NROWS {nrows}", f"NCOLS {ncols}", "NBANDS 1",
        f"NBITS {nbits}", f"PIXELTYPE {pixeltype}",
        f"ULXMAP {x0 + sx / 2.0!r}", f"ULYMAP {y0 - syv / 2.0!r}",
        f"XDIM {sx!r}", f"YDIM {syv!r}",
    ]
    if nodata is not None:
        hdr.append(f"NODATA {nodata!r}")
    with open(os.path.splitext(path)[0] + ".hdr", "w") as f:
        f.write("\n".join(hdr) + "\n")
    if wkt is not None:
        with open(os.path.splitext(path)[0] + ".prj", "w") as f:
            f.write(wkt)


# ---------------------------------------------------------------------------
# netCDF3 classic (+ 64-bit offset variant)
# ---------------------------------------------------------------------------

_NC_BYTE, _NC_CHAR, _NC_SHORT, _NC_INT, _NC_FLOAT, _NC_DOUBLE = 1, 2, 3, 4, 5, 6
_NC_DIMENSION, _NC_VARIABLE, _NC_ATTRIBUTE = 0x0A, 0x0B, 0x0C
_NC_DTYPES = {
    _NC_BYTE: ">i1", _NC_CHAR: "S1", _NC_SHORT: ">i2",
    _NC_INT: ">i4", _NC_FLOAT: ">f4", _NC_DOUBLE: ">f8",
}
# candidate names for the elevation variable, in preference order
_NC_DATA_NAMES = ("z", "elevation", "band1", "topo", "height", "dem", "data")
_NC_LAT_NAMES = ("lat", "latitude", "y")
_NC_LON_NAMES = ("lon", "longitude", "x")


class _NCParser:
    """Header parser for the public netCDF classic-format spec."""

    def __init__(self, buf: bytes, path: str):
        self.buf = buf
        self.path = path
        self.pos = 0

    def fail(self, msg: str):
        raise RasterOpenError(f"'{self.path}': {msg}")

    def u4(self) -> int:
        v = struct.unpack_from(">I", self.buf, self.pos)[0]
        self.pos += 4
        return v

    def u8(self) -> int:
        v = struct.unpack_from(">Q", self.buf, self.pos)[0]
        self.pos += 8
        return v

    def name(self) -> str:
        n = self.u4()
        s = self.buf[self.pos:self.pos + n].decode("utf-8", errors="replace")
        self.pos += n + (-n % 4)  # names pad to 4-byte boundaries
        return s

    def values(self, nc_type: int, count: int):
        dt = np.dtype(_NC_DTYPES[nc_type])
        nbytes = dt.itemsize * count
        vals = np.frombuffer(self.buf, dtype=dt, count=count, offset=self.pos)
        self.pos += nbytes + (-nbytes % 4)
        if nc_type == _NC_CHAR:
            return vals.tobytes().decode("utf-8", errors="replace")
        return vals

    def att_list(self) -> dict:
        tag = self.u4()
        n = self.u4()
        if tag == 0 and n == 0:
            return {}
        if tag != _NC_ATTRIBUTE:
            self.fail(f"bad attribute list tag {tag}")
        out = {}
        for _ in range(n):
            nm = self.name()
            t = self.u4()
            cnt = self.u4()
            out[nm] = self.values(t, cnt)
        return out


def _nc_parse(buf: bytes, path: str):
    """-> (dims: list[(name, length)], gatts, vars:
    list[(name, dimids, atts, nc_type, vsize, begin)])"""
    p = _NCParser(buf, path)
    if buf[:3] != b"CDF":
        p.fail("not a netCDF classic file")
    version = buf[3]
    if version not in (1, 2):
        p.fail(f"unsupported netCDF version byte {version} (netCDF-4/HDF5 "
               "files need the HDF5 library; re-export as classic)")
    p.pos = 4
    p.u4()  # numrecs (or STREAMING sentinel) — record vars are rejected below
    tag = p.u4()
    n = p.u4()
    dims: list[tuple[str, int]] = []
    if tag == _NC_DIMENSION:
        for _ in range(n):
            dims.append((p.name(), p.u4()))
    elif not (tag == 0 and n == 0):
        p.fail(f"bad dimension list tag {tag}")
    gatts = p.att_list()
    tag = p.u4()
    n = p.u4()
    vars_: list[tuple[str, tuple[int, ...], dict, int, int, int]] = []
    if tag == _NC_VARIABLE:
        for _ in range(n):
            nm = p.name()
            ndims = p.u4()
            dimids = tuple(p.u4() for _ in range(ndims))
            atts = p.att_list()
            nc_type = p.u4()
            vsize = p.u4()
            begin = p.u8() if version == 2 else p.u4()
            vars_.append((nm, dimids, atts, nc_type, vsize, begin))
    elif not (tag == 0 and n == 0):
        p.fail(f"bad variable list tag {tag}")
    return dims, gatts, vars_


def _nc_scalar(v) -> float:
    if isinstance(v, str):
        return float(v)
    return float(np.asarray(v).ravel()[0])


def open_netcdf(path: str) -> Raster:
    """Open a netCDF3-classic (or 64-bit-offset) 2-D grid as a Raster.

    The data variable is the preferred-name 2-D variable (z/elevation/
    Band1/...), else the unique 2-D non-coordinate variable. Its two
    dimensions must have 1-D coordinate variables with uniform spacing;
    coordinates are cell CENTERS (CF convention), so the affine origin
    is offset half a cell. Ascending-latitude (south-up) grids are
    exposed through a flipped lazy view. Record (unlimited-dimension)
    data variables are rejected loudly — a DEM tile has no time axis."""
    with open(path, "rb") as f:
        head = f.read(max(65536, 8192))
    # the header is almost always < 64 KiB; re-read bigger if the
    # variable list ran past the buffer
    dims = gatts = vars_ = None
    for size in (len(head), 1 << 20, 1 << 24):
        if size == len(head):
            buf = head
        else:
            with open(path, "rb") as f:
                buf = f.read(size)
        try:
            dims, gatts, vars_ = _nc_parse(buf, path)
            break
        except (struct.error, IndexError):
            continue
    if vars_ is None:
        raise RasterOpenError(f"'{path}': unparseable netCDF header")

    dim_names = [d[0] for d in dims]
    coord_vars = {v[0]: v for v in vars_ if len(v[1]) == 1
                  and v[0] == dim_names[v[1][0]]}
    data_cands = [v for v in vars_ if len(v[1]) == 2
                  and v[0] not in coord_vars]
    if not data_cands:
        raise RasterOpenError(f"'{path}': no 2-D data variable")
    by_pref = [v for nm in _NC_DATA_NAMES for v in data_cands
               if v[0].lower() == nm]
    var = by_pref[0] if by_pref else data_cands[0]
    name, dimids, atts, nc_type, _vsize, begin = var
    if nc_type not in _NC_DTYPES or nc_type == _NC_CHAR:
        raise RasterOpenError(f"'{path}': unsupported data type {nc_type}")
    d0, d1 = dims[dimids[0]], dims[dimids[1]]
    if d0[1] == 0:  # record dimension (length stored as 0)
        raise RasterOpenError(
            f"'{path}': record (unlimited-dimension) variable '{name}' — "
            "re-export with fixed dimensions"
        )

    def coord_array(dim_name: str, length: int) -> np.ndarray:
        cv = coord_vars.get(dim_name)
        if cv is None:
            raise RasterOpenError(
                f"'{path}': dimension '{dim_name}' has no coordinate variable"
            )
        cdt = np.dtype(_NC_DTYPES[cv[3]])
        with open(path, "rb") as f:
            f.seek(cv[5])
            raw = f.read(cdt.itemsize * length)
        return np.frombuffer(raw, dtype=cdt, count=length).astype(np.float64)

    # axis roles: latitude-ish first dim expected (CF order lat, lon)
    def looks_lat(nm: str) -> bool:
        return nm.lower() in _NC_LAT_NAMES

    def looks_lon(nm: str) -> bool:
        return nm.lower() in _NC_LON_NAMES

    if looks_lat(d0[0]) or looks_lon(d1[0]):
        lat_dim, lon_dim, transposed = d0, d1, False
    elif looks_lat(d1[0]) or looks_lon(d0[0]):
        lat_dim, lon_dim, transposed = d1, d0, True
    else:
        lat_dim, lon_dim, transposed = d0, d1, False
    lats = coord_array(lat_dim[0], lat_dim[1])
    lons = coord_array(lon_dim[0], lon_dim[1])
    for nm, c in (("lat", lats), ("lon", lons)):
        if c.size >= 2:
            steps = np.diff(c)
            if not np.allclose(steps, steps[0], rtol=1e-6, atol=0):
                raise RasterOpenError(
                    f"'{path}': non-uniform {nm} spacing — rectilinear "
                    "grids with varying cell size are not supported"
                )
    sy = abs(lats[1] - lats[0]) if lats.size >= 2 else 1.0
    sx = abs(lons[1] - lons[0]) if lons.size >= 2 else 1.0
    if lons.size >= 2 and lons[1] < lons[0]:
        raise RasterOpenError(f"'{path}': descending longitude unsupported")

    dtype = np.dtype(_NC_DTYPES[nc_type])
    mm = np.memmap(path, dtype=dtype, mode="r", offset=begin,
                   shape=(d0[1], d1[1]))
    data = mm.T if transposed else mm
    south_up = lats.size >= 2 and lats[1] > lats[0]
    if south_up:
        data = data[::-1, :]  # lazy flipped view
    nodata = None
    for key in ("_FillValue", "missing_value"):
        if key in atts:
            nodata = _nc_scalar(atts[key])
            break
    scale = _nc_scalar(atts["scale_factor"]) if "scale_factor" in atts else 1.0
    offset = _nc_scalar(atts["add_offset"]) if "add_offset" in atts else 0.0
    if scale != 1.0 or offset != 0.0:
        # packed data: materialize the unpacked array (documented eager
        # path — packed DEM exports are modest). CF semantics: the fill
        # value matches the RAW (pre-scale) samples; unpacked fills
        # become NaN, which the whole engine already treats as nodata
        # (read_block maps sentinel->NaN), so the sentinel is dropped.
        raw = np.asarray(data)
        unpacked = raw.astype(np.float64) * scale + offset
        if nodata is not None:
            unpacked[raw == np.asarray(nodata).astype(raw.dtype)] = np.nan
            nodata = None
        data = unpacked.astype(np.float32)
        dtype = np.dtype(np.float32)

    epsg = 4326  # CF lat/lon grids; grid_mapping projections are out of scope
    top_lat = lats.max() if lats.size else 0.0
    return Raster(
        path=path, width=lon_dim[1], height=lat_dim[1], dtype=dtype,
        nodata=nodata, crs=CRSInfo(epsg=epsg),
        x0=float(lons[0] - sx / 2.0) if lons.size else 0.0,
        y0=float(top_lat + sy / 2.0), sx=float(sx), sy=float(sy),
        _data=data,
    )


def write_netcdf(
    path: str,
    array: np.ndarray,
    *,
    lats: np.ndarray,
    lons: np.ndarray,
    var_name: str = "z",
    nodata: float | None = None,
    scale_factor: float | None = None,
    add_offset: float | None = None,
    version: int = 1,
) -> None:
    """Write a minimal netCDF3 classic file (spec-exact; used by tests
    and as a small-grid export). ``array`` row 0 corresponds to
    ``lats[0]``; ascending lats produce a south-up file."""
    a = np.asarray(array)
    if a.ndim != 2 or a.shape != (len(lats), len(lons)):
        raise ValueError("array shape must be (len(lats), len(lons))")
    np_to_nc = {"i1": _NC_BYTE, "i2": _NC_SHORT, "i4": _NC_INT,
                "f4": _NC_FLOAT, "f8": _NC_DOUBLE}
    key = a.dtype.str.lstrip("<>=|")
    if key not in np_to_nc:
        raise ValueError(f"unsupported netCDF dtype {a.dtype}")
    nc_type = np_to_nc[key]

    def pname(s: str) -> bytes:
        b = s.encode()
        return struct.pack(">I", len(b)) + b + b"\x00" * (-len(b) % 4)

    def pvals(t: int, arr: np.ndarray) -> bytes:
        raw = arr.astype(_NC_DTYPES[t]).tobytes()
        return raw + b"\x00" * (-len(raw) % 4)

    def patts(atts: list[tuple[str, int, np.ndarray]]) -> bytes:
        if not atts:
            return struct.pack(">II", 0, 0)
        out = struct.pack(">II", _NC_ATTRIBUTE, len(atts))
        for nm, t, vals in atts:
            out += pname(nm) + struct.pack(">II", t, len(vals)) + pvals(t, vals)
        return out

    dims = [("lat", len(lats)), ("lon", len(lons))]
    header = b"CDF" + bytes([version])
    header += struct.pack(">I", 0)  # numrecs
    header += struct.pack(">II", _NC_DIMENSION, len(dims))
    for nm, ln in dims:
        header += pname(nm) + struct.pack(">I", ln)
    header += struct.pack(">II", 0, 0)  # no global atts

    datts = []
    if nodata is not None:
        datts.append(("_FillValue", nc_type, np.array([nodata])))
    if scale_factor is not None:
        datts.append(("scale_factor", _NC_DOUBLE, np.array([scale_factor])))
    if add_offset is not None:
        datts.append(("add_offset", _NC_DOUBLE, np.array([add_offset])))

    begin_w = 8 if version == 2 else 4
    fmt_begin = ">Q" if version == 2 else ">I"

    def var_header(nm: str, dimids: tuple[int, ...], atts, t: int,
                   vsize: int) -> bytes:
        out = pname(nm) + struct.pack(">I", len(dimids))
        for d in dimids:
            out += struct.pack(">I", d)
        out += patts(atts) + struct.pack(">II", t, vsize)
        return out  # caller appends begin

    lat_t, lon_t = _NC_DOUBLE, _NC_DOUBLE
    lat_raw = pvals(lat_t, np.asarray(lats, dtype=np.float64))
    lon_raw = pvals(lon_t, np.asarray(lons, dtype=np.float64))
    dat_raw = pvals(nc_type, a)

    vh_lat = var_header("lat", (0,), [], lat_t, len(lat_raw))
    vh_lon = var_header("lon", (1,), [], lon_t, len(lon_raw))
    vh_z = var_header(var_name, (0, 1), datts, nc_type, len(dat_raw))
    fixed = (len(header) + struct.calcsize(">II")
             + len(vh_lat) + len(vh_lon) + len(vh_z) + 3 * begin_w)
    b_lat = fixed
    b_lon = b_lat + len(lat_raw)
    b_z = b_lon + len(lon_raw)
    out = header + struct.pack(">II", _NC_VARIABLE, 3)
    out += vh_lat + struct.pack(fmt_begin, b_lat)
    out += vh_lon + struct.pack(fmt_begin, b_lon)
    out += vh_z + struct.pack(fmt_begin, b_z)
    out += lat_raw + lon_raw + dat_raw
    with open(path, "wb") as f:
        f.write(out)


# ---------------------------------------------------------------------------
# GDAL VRT mosaics (XML virtual rasters over other files)
# ---------------------------------------------------------------------------

_VRT_DTYPES = {
    "Byte": "u1", "Int8": "i1", "UInt16": "u2", "Int16": "i2",
    "UInt32": "u4", "Int32": "i4", "Float32": "f4", "Float64": "f8",
}


class _VRTReader:
    """Windowed reads over a VRT band: overlay each SimpleSource /
    ComplexSource (1:1 scaling only) in document order, GDAL's painter
    semantics. Child rasters open lazily through open_raster (any
    supported format, including nested VRTs and http(s) URLs) and are
    cached per reader; their own block caches make repeat windows cheap.
    Duck-types geotiff._BlockReader.read."""

    def __init__(self, path: str, dtype: np.dtype, height: int, width: int,
                 sources: list[dict], fill: float):
        self.path = path
        self.dtype = dtype
        self.height = height
        self.width = width
        self.sources = sources
        self.fill = fill
        self._open: dict[str, Raster] = {}

    def _child(self, fn: str) -> Raster:
        r = self._open.get(fn)
        if r is None:
            from .geotiff import open_raster

            r = open_raster(fn)
            self._open[fn] = r
        return r

    def read(self, r0: int, r1: int, c0: int, c1: int) -> np.ndarray:
        native = self.dtype.newbyteorder("=")
        out = np.full((r1 - r0, c1 - c0), native.type(self.fill),
                      dtype=native)
        for s in self.sources:
            dr0, dc0 = s["dst_yoff"], s["dst_xoff"]
            dr1, dc1 = dr0 + s["ysize"], dc0 + s["xsize"]
            orow0, orow1 = max(r0, dr0), min(r1, dr1)
            ocol0, ocol1 = max(c0, dc0), min(c1, dc1)
            if orow0 >= orow1 or ocol0 >= ocol1:
                continue
            child = self._child(s["filename"])
            sr0 = s["src_yoff"] + (orow0 - dr0)
            sc0 = s["src_xoff"] + (ocol0 - dc0)
            win, (gr, gc) = child.read_window(
                sr0, sr0 + (orow1 - orow0), sc0, sc0 + (ocol1 - ocol0)
            )
            if win.size == 0:
                continue
            win = np.asarray(win)
            # child clipping can shrink the window at raster edges
            rr0 = orow0 + (gr - sr0)
            cc0 = ocol0 + (gc - sc0)
            patch = win.astype(native, copy=False)
            tgt = out[rr0 - r0 : rr0 - r0 + win.shape[0],
                      cc0 - c0 : cc0 - c0 + win.shape[1]]
            if s["src_nodata"] is not None:
                mask = patch != native.type(s["src_nodata"])
                np.copyto(tgt, patch, where=mask)
            else:
                tgt[...] = patch
        return out


def build_vrt(out_path: str, paths: list[str]) -> str:
    """Write a GDAL VRT mosaic over ``paths`` — the gdalbuildvrt twin
    (the reference's most-used dataset-prep tool: six call sites in
    /root/reference/docs/datasets/*.md). Driver-side metadata pass only:
    opens each source header, refuses loudly on anything gdalbuildvrt
    would mis-mosaic (mixed CRS, mixed resolution, mixed dtype,
    grid-misaligned origins) instead of warning and guessing. Children
    inside the VRT's directory are referenced relatively (the mosaic
    stays valid when the dataset directory moves); URLs and outside
    paths stay absolute. The result opens through open_raster (and
    therefore serves the elevation pipeline) like any other raster."""
    from .geotiff import open_raster

    if not paths:
        raise ValueError("build_vrt needs at least one source raster")
    metas = [(p, open_raster(p)) for p in paths]
    _p0, r0 = metas[0]
    dt_names = {v: k for k, v in _VRT_DTYPES.items()}
    key0 = r0.dtype.str.lstrip("<>=|")
    if key0 not in dt_names:
        raise ValueError(f"VRT cannot carry dtype {r0.dtype}")
    for p, r in metas:
        if r.crs is None:
            raise ValueError(f"'{p}' has no CRS; cannot mosaic")
        if (r.crs.epsg, r.crs.wkt) != (r0.crs.epsg, r0.crs.wkt):
            raise ValueError(
                f"mixed CRS: '{p}' differs from '{metas[0][0]}'"
            )
        if (abs(r.sx / r0.sx - 1.0) > 1e-9
                or abs(r.sy / r0.sy - 1.0) > 1e-9):
            raise ValueError(
                f"mixed resolution: '{p}' ({r.sx}, {r.sy}) vs"
                f" ({r0.sx}, {r0.sy})"
            )
        if r.dtype.str.lstrip("<>=|") != key0:
            raise ValueError(
                f"mixed dtype: '{p}' {r.dtype} vs {r0.dtype}"
            )
    xmin = min(r.x0 for _p, r in metas)
    ymax = max(r.y0 for _p, r in metas)
    width = height = 0
    rows = []
    for p, r in metas:
        fx = (r.x0 - xmin) / r0.sx
        fy = (ymax - r.y0) / r0.sy
        xoff, yoff = round(fx), round(fy)
        if abs(fx - xoff) > 1e-3 or abs(fy - yoff) > 1e-3:
            raise ValueError(
                f"'{p}' origin is not aligned to the mosaic grid"
                f" (offset {fx:.6f}, {fy:.6f} px)"
            )
        rows.append((p, r, int(xoff), int(yoff)))
        width = max(width, int(xoff) + r.width)
        height = max(height, int(yoff) + r.height)

    from xml.sax.saxutils import escape as _xesc

    ci = r0.crs
    srs = _xesc(f"EPSG:{ci.epsg}" if ci.epsg else ci.wkt)
    base = os.path.dirname(os.path.abspath(out_path))
    xml = [
        f'<VRTDataset rasterXSize="{width}" rasterYSize="{height}">',
        f"  <SRS>{srs}</SRS>",
        "  <GeoTransform>"
        f"{xmin!r}, {r0.sx!r}, 0.0, {ymax!r}, 0.0, {-r0.sy!r}"
        "</GeoTransform>",
        f'  <VRTRasterBand dataType="{dt_names[key0]}" band="1">',
    ]
    if r0.nodata is not None:
        xml.append(f"    <NoDataValue>{float(r0.nodata)!r}</NoDataValue>")
    for p, r, xoff, yoff in rows:
        ap = os.path.abspath(p)
        if p.startswith(("http://", "https://")):
            fn, rel = p, 0
        elif os.path.commonpath([base, ap]) == base:
            fn, rel = os.path.relpath(ap, base), 1
        else:
            fn, rel = ap, 0
        xml.append("    <SimpleSource>")
        xml.append(
            f'      <SourceFilename relativeToVRT="{rel}">{_xesc(fn)}'
            "</SourceFilename>"
        )
        xml.append("      <SourceBand>1</SourceBand>")
        xml.append(
            f'      <SrcRect xOff="0" yOff="0" xSize="{r.width}"'
            f' ySize="{r.height}"/>'
        )
        xml.append(
            f'      <DstRect xOff="{xoff}" yOff="{yoff}"'
            f' xSize="{r.width}" ySize="{r.height}"/>'
        )
        if r.nodata is not None:
            xml.append(f"      <NODATA>{float(r.nodata)!r}</NODATA>")
        xml.append("    </SimpleSource>")
    xml.append("  </VRTRasterBand>")
    xml.append("</VRTDataset>")
    tmp = out_path + f".tmp{os.getpid()}"
    with open(tmp, "w") as f:
        f.write("\n".join(xml) + "\n")
    os.replace(tmp, out_path)
    return out_path


def open_vrt(path: str) -> Raster:
    """Open a GDAL VRT mosaic (the XML virtual format GDAL builds with
    gdalbuildvrt) as a Raster. Supported: single-band VRTRasterBand with
    SimpleSource / ComplexSource children at 1:1 scale (SrcRect size ==
    DstRect size), north-up GeoTransform, EPSG or WKT SRS. Scaled or
    rotated VRTs and raw-band VRTs are refused loudly."""
    import xml.etree.ElementTree as ET

    try:
        tree = ET.parse(path)
    except ET.ParseError as e:
        raise RasterOpenError(f"'{path}': unparseable VRT XML ({e})")
    root = tree.getroot()
    if root.tag != "VRTDataset":
        raise RasterOpenError(f"'{path}': not a VRTDataset")
    try:
        width = int(root.attrib["rasterXSize"])
        height = int(root.attrib["rasterYSize"])
    except (KeyError, ValueError):
        raise RasterOpenError(f"'{path}': VRT missing raster size")
    gt_el = root.find("GeoTransform")
    if gt_el is None or not gt_el.text:
        raise RasterOpenError(f"'{path}': VRT has no GeoTransform")
    gt = [float(v) for v in gt_el.text.split(",")]
    x0, sx, rot1, y0, rot2, nsy = gt
    if rot1 != 0.0 or rot2 != 0.0 or nsy >= 0 or sx <= 0:
        raise RasterOpenError(
            f"'{path}': only north-up, unrotated VRTs are supported"
        )
    sy = -nsy

    epsg = None
    wkt = None
    srs_el = root.find("SRS")
    if srs_el is not None and srs_el.text:
        txt = srs_el.text.strip()
        m = re.match(r"EPSG:(\d+)$", txt, re.IGNORECASE)
        if m:
            epsg = int(m.group(1))
        elif txt.upper().startswith(("GEOGCS", "PROJCS", "GEOGCRS",
                                     "PROJCRS")):
            wkt = txt
            mw = re.search(
                r'AUTHORITY\[\s*"EPSG"\s*,\s*"?(\d+)"?\s*\]\s*\]\s*$', txt
            )
            if mw:
                epsg = int(mw.group(1))
    if epsg is None and wkt is None:
        raise RasterOpenError(f"'{path}': VRT has no usable SRS")

    bands = root.findall("VRTRasterBand")
    if not bands:
        raise RasterOpenError(f"'{path}': VRT has no raster bands")
    band = bands[0]  # band 1 only, like every other reader here
    if band.attrib.get("subClass") not in (None, "VRTSourcedRasterBand"):
        raise RasterOpenError(
            f"'{path}': VRT band subClass"
            f" '{band.attrib.get('subClass')}' is not supported"
        )
    dt_name = band.attrib.get("dataType", "Float32")
    if dt_name not in _VRT_DTYPES:
        raise RasterOpenError(f"'{path}': VRT dataType {dt_name} unsupported")
    dtype = np.dtype("<" + _VRT_DTYPES[dt_name])
    nd_el = band.find("NoDataValue")
    nodata = float(nd_el.text) if nd_el is not None and nd_el.text else None

    base = os.path.dirname(os.path.abspath(path))
    sources = []
    for src in band:
        if src.tag not in ("SimpleSource", "ComplexSource"):
            continue
        fn_el = src.find("SourceFilename")
        if fn_el is None or not fn_el.text:
            raise RasterOpenError(f"'{path}': VRT source without filename")
        fn = fn_el.text.strip()
        rel = fn_el.attrib.get("relativeToVRT", "0") == "1"
        if rel and not fn.startswith(("http://", "https://")):
            fn = os.path.join(base, fn)
        sr = src.find("SrcRect")
        dr = src.find("DstRect")

        def rect(el, w, h):
            if el is None:
                return 0, 0, w, h
            return (int(float(el.attrib["xOff"])),
                    int(float(el.attrib["yOff"])),
                    int(float(el.attrib["xSize"])),
                    int(float(el.attrib["ySize"])))

        sxo, syo, sxs, sys_ = rect(sr, width, height)
        dxo, dyo, dxs, dys = rect(dr, width, height)
        if (sxs, sys_) != (dxs, dys):
            raise RasterOpenError(
                f"'{path}': scaled VRT sources (SrcRect != DstRect size)"
                " are not supported — regenerate with gdalbuildvrt"
                " without -tr/-outsize"
            )
        nd_src = src.find("NODATA")
        sources.append({
            "filename": fn,
            "src_xoff": sxo, "src_yoff": syo,
            "dst_xoff": dxo, "dst_yoff": dyo,
            "xsize": sxs, "ysize": sys_,
            "src_nodata": float(nd_src.text) if nd_src is not None
            and nd_src.text else None,
        })
    if not sources:
        raise RasterOpenError(f"'{path}': VRT band has no sources")

    blocks = _VRTReader(path, dtype, height, width, sources,
                        nodata if nodata is not None else 0.0)
    return Raster(
        path=path, width=width, height=height, dtype=dtype, nodata=nodata,
        crs=CRSInfo(epsg=epsg, wkt=wkt), x0=x0, y0=y0, sx=sx, sy=sy,
        _blocks=blocks,
    )
