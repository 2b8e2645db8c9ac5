"""MBTiles terrain tiles (Mapbox Terrain-RGB / Terrarium) as rasters.

MBTiles is the SQLite tile-pyramid container (public Mapbox spec 1.3);
encoding elevation into PNG RGB channels is how planet-scale terrain
actually ships on the web — Mapbox Terrain-RGB and the AWS Open Data
Terrain ("Terrarium") tiles both distribute global DEMs this way, and
GDAL reads the container through its MBTiles driver (the reference
therefore accepts it via ``rasterio.open``,
/root/reference/opentopodata/backend.py:89). Decoders:

* ``terrain-rgb``:  elevation = -10000 + (R*65536 + G*256 + B) * 0.1
* ``terrarium``:    elevation = R*256 + G + B/256 - 32768

The SQLite B-tree walker, overflow-chain reader and record decoder are
shared with the GeoPackage module (gpkg.py); PNG tiles decode through
png.py into the process-wide block LRU, so windowed reads touch only
the tiles a query needs. Tiles are Web Mercator (EPSG:3857) XYZ
squares; the ``tiles`` table stores TMS (south-origin) rows, flipped
here. Both the canonical ``tiles`` table and the tippecanoe/mb-util
``map`` + ``images`` de-duplicated layout are supported (the spec
models ``tiles`` as a view over the latter; views have no B-tree, so
the two base tables are joined directly). Missing tiles inside the
bounding tile range read as NaN.

Scale shape: identical to GeoPackage — the reader runs on the
``_ByteSource`` interface, so a remote ``.mbtiles`` object range-reads
its SQLite pages over HTTP with the per-executor chunk LRU; nothing
ever loads the whole pyramid.
"""

from __future__ import annotations

import struct

import numpy as np

from . import png as _png
from .geotiff import CRSInfo, Raster, RasterOpenError, _ByteSource
from .gpkg import GpkgError, _DbWriter, _SQLite, _table_dicts

__all__ = ["open_mbtiles", "write_mbtiles", "write_mbtiles_tiles"]

_ORIGIN = 20037508.342789244  # pi * 6378137 (Web Mercator world edge)

_ENCODINGS = ("terrain-rgb", "terrarium")


class MbtilesError(RasterOpenError):
    """File is not a readable MBTiles terrain db."""


def _decode_elevation(rgb: np.ndarray, encoding: str) -> np.ndarray:
    r = rgb[:, :, 0].astype(np.float64)
    g = rgb[:, :, 1].astype(np.float64)
    b = rgb[:, :, 2].astype(np.float64)
    if encoding == "terrain-rgb":
        return (-10000.0 + (r * 65536.0 + g * 256.0 + b) * 0.1).astype(
            np.float32)
    return (r * 256.0 + g + b / 256.0 - 32768.0).astype(np.float32)


class _MbtilesTileReader:
    """Windowed reads over the tile grid; duck-types
    geotiff._BlockReader.read (same shape as gpkg._GpkgTileReader).

    ``tiles`` maps (grid_row, grid_col) -> (rootpage, rowid, blob_col):
    blobs are fetched LAZILY by rowid (one B-tree descent through the
    byte-source chunk LRU), so opening a planet-scale pyramid indexes
    the tile table without ever materializing its payloads."""

    def __init__(self, source, db, tiles, tile_px, n_rows, n_cols,
                 encoding, zoom):
        self.source = source
        self.db = db
        self.tiles = tiles
        self.tile_h = self.tile_w = tile_px
        self.height = n_rows * tile_px
        self.width = n_cols * tile_px
        self.encoding = encoding
        self.zoom = zoom

    def _fetch(self, key) -> bytes | None:
        loc = self.tiles.get(key)
        if loc is None:
            return None
        root, rowid, blob_col = loc
        row = self.db.row_by_rowid(root, rowid)
        blob = (row[blob_col] if row is not None
                and blob_col < len(row) else None)
        if blob is None:
            return None  # NULL tile_data placeholder == absent tile
        if not isinstance(blob, (bytes, bytearray)):
            raise MbtilesError(
                f"'{self.source.path}': tile rowid {rowid} is not a blob")
        return bytes(blob)

    def _decode(self, key) -> np.ndarray:
        blob = self._fetch(key)
        if blob is None:
            return np.full((self.tile_h, self.tile_w), np.nan,
                           dtype=np.float32)
        if not _png.is_png(blob[:16]):
            raise MbtilesError(
                f"'{self.source.path}': non-PNG tile payload (JPEG/WebP"
                " terrain tiles are not a thing — re-encode)")
        arr = _png.decode_png(blob)
        if arr.dtype != np.uint8 or arr.shape[2] < 3:
            raise MbtilesError(
                f"'{self.source.path}': terrain tiles must be 8-bit"
                f" RGB(A) PNG, got {arr.dtype} x{arr.shape[2]}")
        if arr.shape[0] != self.tile_h or arr.shape[1] != self.tile_w:
            raise MbtilesError(
                f"'{self.source.path}': mixed tile sizes"
                f" ({arr.shape[0]}x{arr.shape[1]} vs {self.tile_h})")
        return _decode_elevation(arr, self.encoding)

    def read(self, r0: int, r1: int, c0: int, c1: int) -> np.ndarray:
        from .geotiff import _cache_get, _cache_put

        out = np.full((r1 - r0, c1 - c0), np.nan, dtype=np.float32)
        tr0, tr1 = r0 // self.tile_h, (r1 - 1) // self.tile_h
        tc0, tc1 = c0 // self.tile_w, (c1 - 1) // self.tile_w
        for tr in range(tr0, tr1 + 1):
            for tc in range(tc0, tc1 + 1):
                ck = (self.source.cache_key, "mbt", self.zoom, tr, tc)
                arr = _cache_get(ck)
                if arr is None:
                    arr = self._decode((tr, tc))
                    _cache_put(ck, arr)
                gr0, gc0 = tr * self.tile_h, tc * self.tile_w
                orow0 = max(r0, gr0)
                orow1 = min(r1, gr0 + self.tile_h, self.height)
                ocol0 = max(c0, gc0)
                ocol1 = min(c1, gc0 + self.tile_w, self.width)
                if orow0 >= orow1 or ocol0 >= ocol1:
                    continue
                out[orow0 - r0 : orow1 - r0, ocol0 - c0 : ocol1 - c0] = \
                    arr[orow0 - gr0 : orow1 - gr0,
                        ocol0 - gc0 : ocol1 - gc0]
        return out


def _tile_index(db: _SQLite, tables):
    """Yield (zoom, col, tms_row, (rootpage, rowid, blob_col)) from
    either layout WITHOUT reading any tile payload: the key columns
    come from prefix scans (gpkg._SQLite.rows_prefix), the blob is
    fetched later by rowid."""
    from .gpkg import _columns

    if "tiles" in tables:
        root, sql = tables["tiles"]
        cols = _columns(sql)
        try:
            iz = cols.index("zoom_level")
            ic = cols.index("tile_column")
            ir = cols.index("tile_row")
            ib = cols.index("tile_data")
        except ValueError:
            raise MbtilesError(f"tiles table lacks spec columns ({cols})")
        need = max(iz, ic, ir) + 1
        for rowid, vals in db.rows_prefix(root, need):
            if any(vals[i] is None for i in (iz, ic, ir)):
                continue
            yield (int(vals[iz]), int(vals[ic]), int(vals[ir]),
                   (root, rowid, ib))
        return
    if "map" in tables and "images" in tables:
        img_root, img_sql = tables["images"]
        icols = _columns(img_sql)
        try:
            iid = icols.index("tile_id")
            idata = icols.index("tile_data")
        except ValueError:
            raise MbtilesError(f"images table lacks spec columns ({icols})")
        by_id = {}
        for rowid, vals in db.rows_prefix(img_root, iid + 1):
            if vals[iid] is not None:
                by_id[vals[iid]] = rowid
        map_root, map_sql = tables["map"]
        mcols = _columns(map_sql)
        try:
            mz = mcols.index("zoom_level")
            mc = mcols.index("tile_column")
            mr = mcols.index("tile_row")
            mi = mcols.index("tile_id")
        except ValueError:
            raise MbtilesError(f"map table lacks spec columns ({mcols})")
        need = max(mz, mc, mr, mi) + 1
        for _rowid, vals in db.rows_prefix(map_root, need):
            rid = by_id.get(vals[mi])
            if rid is not None and None not in (
                    vals[mz], vals[mc], vals[mr]):
                yield (int(vals[mz]), int(vals[mc]), int(vals[mr]),
                       (img_root, rid, idata))
        return
    raise MbtilesError("no 'tiles' table and no 'map'+'images' pair")


def open_mbtiles(path: str, zoom: int | None = None,
                 encoding: str | None = None,
                 source: _ByteSource | None = None) -> Raster:
    """Open an MBTiles terrain pyramid as a Raster.

    ``zoom`` defaults to the finest level present. ``encoding``
    ('terrain-rgb' or 'terrarium') comes from the argument, else the
    metadata table's ``encoding`` key; anything else refuses loudly —
    silently guessing a decoder would produce plausible wrong
    elevations.
    """
    src = source if source is not None else _ByteSource(path)
    try:
        db = _SQLite(src)
    except GpkgError as e:
        raise MbtilesError(str(e))
    tables = db.tables()

    meta = {}
    for _r, d in _table_dicts(db, tables, "metadata"):
        if d.get("name") is not None:
            meta[str(d["name"])] = d.get("value")
    enc = encoding or meta.get("encoding")
    if enc == "mapbox.terrain-rgb" or enc == "mapbox":
        enc = "terrain-rgb"
    if enc not in _ENCODINGS:
        raise MbtilesError(
            f"'{path}': elevation encoding not declared — pass "
            f"encoding= or set a metadata 'encoding' row to one of "
            f"{_ENCODINGS} (found {enc!r})")
    fmt = (meta.get("format") or "png").lower()
    if fmt != "png":
        raise MbtilesError(
            f"'{path}': terrain decode needs PNG tiles, metadata says"
            f" format={fmt!r}")

    try:
        index = list(_tile_index(db, tables))
    except GpkgError as e:
        raise MbtilesError(str(e))
    if not index:
        raise MbtilesError(f"'{path}': no tiles")
    z = zoom if zoom is not None else max(r[0] for r in index)
    level = [(c, tr, loc) for (zz, c, tr, loc) in index if zz == z]
    if not level:
        raise MbtilesError(f"'{path}': no tiles at zoom {z}")

    n = 1 << z
    cols = [c for c, _t, _l in level]
    xyz_rows = [n - 1 - tr for _c, tr, _l in level]
    c_min, c_max = min(cols), max(cols)
    r_min, r_max = min(xyz_rows), max(xyz_rows)

    tiles = {}
    for c, tr, loc in level:
        tiles[(n - 1 - tr - r_min, c - c_min)] = loc
    span = 2.0 * _ORIGIN / n
    reader = _MbtilesTileReader(
        src, db, tiles, 0, r_max - r_min + 1, c_max - c_min + 1, enc, z)
    # the tile size comes from ONE decoded tile (the spec says 256 but
    # 512 exists); every later decode asserts consistency. NULL
    # placeholder rows are skipped when probing.
    first = None
    probe_key = None
    for probe_key in tiles:
        first = reader._fetch(probe_key)
        if first is not None:
            break
    if first is None:
        raise MbtilesError(f"'{path}': zoom {z} has only NULL tiles")
    if not _png.is_png(first[:16]):
        raise MbtilesError(
            f"'{path}': non-PNG tile payload at zoom {z} (JPEG/WebP"
            " terrain tiles are not a thing — re-encode)")
    arr0 = _png.decode_png(first)
    if arr0.shape[0] != arr0.shape[1]:
        raise MbtilesError(f"'{path}': non-square {arr0.shape[:2]} tiles")
    tile_px = arr0.shape[0]
    reader.tile_h = reader.tile_w = tile_px
    reader.height = (r_max - r_min + 1) * tile_px
    reader.width = (c_max - c_min + 1) * tile_px
    if arr0.dtype == np.uint8 and arr0.shape[2] >= 3:
        # the probe's decode is paid for — seed the block LRU so the
        # first window over this tile does not re-fetch and re-inflate
        from .geotiff import _cache_put

        _cache_put((src.cache_key, "mbt", z, probe_key[0], probe_key[1]),
                   _decode_elevation(arr0, enc))
    return Raster(
        path=path, width=reader.width, height=reader.height,
        dtype=np.dtype("<f4"),
        nodata=None,  # absent tiles decode straight to NaN
        crs=CRSInfo(epsg=3857),
        x0=-_ORIGIN + c_min * span, y0=_ORIGIN - r_min * span,
        sx=span / tile_px, sy=span / tile_px,
        _blocks=reader,
    )


def _encode_elevation(block: np.ndarray, encoding: str) -> np.ndarray:
    if encoding == "terrain-rgb":
        v = np.round((block.astype(np.float64) + 10000.0) * 10.0)
        v = np.clip(v, 0, (1 << 24) - 1).astype(np.uint32)
        return np.stack([(v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF],
                        axis=-1).astype(np.uint8)
    v = np.round((block.astype(np.float64) + 32768.0) * 256.0)
    v = np.clip(v, 0, (1 << 24) - 1).astype(np.uint32)
    return np.stack([(v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF],
                    axis=-1).astype(np.uint8)


def write_mbtiles(
    path: str,
    array: np.ndarray,
    *,
    zoom: int,
    min_col: int,
    min_row: int,
    encoding: str = "terrain-rgb",
    tile_px: int = 256,
    name: str = "terrain",
    skip_tiles: tuple = (),
) -> None:
    """Write a single-zoom terrain MBTiles (fixture generator + sink).

    ``array`` is north-up elevations whose top-left pixel sits at the
    top-left corner of XYZ tile (``min_col``, ``min_row``) at ``zoom``;
    its shape must be a multiple of ``tile_px``. ``skip_tiles`` is a
    set of (grid_row, grid_col) offsets to leave out — they read back
    as NaN holes. Terrarium round-trips integer metres exactly;
    terrain-rgb quantizes to 0.1 m.
    """
    if encoding not in _ENCODINGS:
        raise ValueError(f"encoding must be one of {_ENCODINGS}")
    arr = np.asarray(array, dtype=np.float64)
    h, w = arr.shape
    if h % tile_px or w % tile_px:
        raise ValueError(
            f"array shape {arr.shape} is not a multiple of tile_px"
            f" ({tile_px})")
    n = 1 << zoom
    tile_rows = []
    rowid = 0
    max_blob = 0
    skip = set(skip_tiles)
    for tr in range(h // tile_px):
        for tc in range(w // tile_px):
            if (tr, tc) in skip:
                continue
            block = arr[tr * tile_px:(tr + 1) * tile_px,
                        tc * tile_px:(tc + 1) * tile_px]
            blob = _png.encode_png(_encode_elevation(block, encoding),
                                   filter_type=2)
            rowid += 1
            max_blob = max(max_blob, len(blob))
            tms_row = n - 1 - (min_row + tr)
            tile_rows.append((rowid, [zoom, min_col + tc, tms_row, blob]))

    _write_db(path, tile_rows, min_zoom=zoom, max_zoom=zoom,
              encoding=encoding, name=name, max_blob=max_blob)


def write_mbtiles_tiles(path: str, tiles, *, zoom: int | None = None,
                        encoding: str = "terrarium",
                        name: str = "terrain") -> None:
    """Assemble pre-encoded tiles into one MBTiles db.

    ``tiles``: (x, y_xyz, png_bytes) triples with ``zoom`` given, or
    (z, x, y_xyz, png_bytes) quads for a multi-zoom pyramid. The
    convenience sink for bounded exports (jobs/raster tiles
    --mbtiles); the scale sink is the parquet tile-shard DataFrame.
    """
    quads = []
    for t in tiles:
        if len(t) == 3:
            if zoom is None:
                raise ValueError("3-tuple tiles need an explicit zoom=")
            quads.append((zoom, int(t[0]), int(t[1]), bytes(t[2])))
        else:
            quads.append((int(t[0]), int(t[1]), int(t[2]), bytes(t[3])))
    if not quads:
        raise ValueError("no tiles to write")
    tile_rows = []
    max_blob = 0
    for i, (z, x, y, blob) in enumerate(
            sorted(quads, key=lambda t: (t[0], t[1], t[2])), start=1):
        max_blob = max(max_blob, len(blob))
        tile_rows.append((i, [z, x, (1 << z) - 1 - y, blob]))
    _write_db(path, tile_rows,
              min_zoom=min(q[0] for q in quads),
              max_zoom=max(q[0] for q in quads),
              encoding=encoding, name=name, max_blob=max_blob)


def _write_db(path, tile_rows, *, min_zoom, max_zoom, encoding, name,
              max_blob):
    import os

    from .gpkg import _enc_record, _enc_varint

    meta_rows = [
        (1, ["name", name]),
        (2, ["format", "png"]),
        (3, ["encoding", encoding]),
        (4, ["minzoom", str(min_zoom)]),
        (5, ["maxzoom", str(max_zoom)]),
    ]
    page_size = 4096
    while page_size < max_blob + 200 and page_size < 65536:
        page_size *= 2
    dbw = _DbWriter(page_size)
    # page 1 must be sqlite_master; reserve it, build the user tables,
    # then fill page 1 with the real rootpages (the write_gpkg pattern)
    dbw.pages.append(bytearray(page_size))
    tables = [
        ("metadata", "CREATE TABLE metadata (name TEXT, value TEXT)",
         meta_rows),
        ("tiles",
         "CREATE TABLE tiles (zoom_level INTEGER, tile_column INTEGER,"
         " tile_row INTEGER, tile_data BLOB)",
         tile_rows),
    ]
    roots = {t[0]: dbw.table(t[2]) for t in tables}
    master_cells = []
    for i, (tname, sql, _rows) in enumerate(tables, start=1):
        payload = _enc_record(["table", tname, tname, roots[tname], sql])
        master_cells.append(
            _enc_varint(len(payload)) + _enc_varint(i) + payload)
    page1 = dbw.pages[0]
    content = page_size
    offs = []
    for cell in master_cells:
        content -= len(cell)
        page1[content : content + len(cell)] = cell
        offs.append(content)
    page1[100] = 13
    struct.pack_into(">HHHB", page1, 101, 0, len(master_cells),
                     content & 0xFFFF, 0)
    for i, o in enumerate(offs):
        struct.pack_into(">H", page1, 108 + 2 * i, o)

    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(dbw.finish())
    os.replace(tmp, path)
