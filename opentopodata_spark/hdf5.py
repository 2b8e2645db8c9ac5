"""Pure-numpy HDF5 subset reader + writer for netCDF4 DEM grids.

The reference opens anything GDAL reads — including netCDF4/HDF5 DEM
exports (/root/reference/opentopodata/backend.py:89,
docs/notes/performance-optimisation.md) — via libnetcdf/libhdf5. Neither
library exists in this environment, so this module implements the slice
of the PUBLIC HDF5 file-format specification those files use:

- superblock v0/v1 (libnetcdf's default) and v2/v3 (latest-format),
- object headers v1 and v2 (OHDR), with continuation blocks,
- old-style groups (symbol-table message -> B-tree v1 + local heap +
  SNOD) and compact new-style groups (link messages); dense link
  storage (fractal heaps) is refused loudly,
- messages: dataspace, datatype (fixed/float/string), fill value,
  data layout v3 (compact/contiguous/chunked), filter pipeline
  (deflate + shuffle), attributes v1/v2/v3, symbol table, link,
  link info, continuation,
- chunked raw data through B-tree v1 (type 1) with per-chunk deflate /
  shuffle, windowed: only the chunks a read touches are fetched and
  decoded, through the same process-wide block LRU the GeoTIFF reader
  uses (geotiff._cache_get/_cache_put).

The netCDF4 layer on top (`open_netcdf4`) mirrors the CF conventions of
gridformats.open_netcdf (netCDF3): preferred-name 2-D data variable,
1-D lat/lon coordinate variables with uniform spacing, cell-center
coordinates, ascending-latitude grids exposed through a lazy flipped
view, _FillValue/missing_value -> nodata, scale_factor/add_offset
unpacking. Unknown attribute datatypes (vlen DIMENSION_LIST references
etc.) are skipped, not fatal.

`write_netcdf4` emits a minimal, spec-conformant netCDF4-style HDF5
file (superblock v0, symbol-table root group, chunked+deflate data
variable) — the fixture generator for the reader's tests and a real
sink for small grids.
"""

from __future__ import annotations

import os
import struct
import zlib
from dataclasses import dataclass

import numpy as np

from .geotiff import (
    CRSInfo,
    Raster,
    RasterOpenError,
    _ByteSource,
    _cache_get,
    _cache_put,
)

_SIG = b"\x89HDF\r\n\x1a\n"
_UNDEF = 0xFFFFFFFFFFFFFFFF

# message type ids (HDF5 spec IV.A.2)
_M_DATASPACE = 0x0001
_M_LINK_INFO = 0x0002
_M_DATATYPE = 0x0003
_M_FILL_OLD = 0x0004
_M_FILL = 0x0005
_M_LINK = 0x0006
_M_LAYOUT = 0x0008
_M_GROUP_INFO = 0x000A
_M_FILTERS = 0x000B
_M_ATTRIBUTE = 0x000C
_M_CONTINUATION = 0x0010
_M_SYMBOL_TABLE = 0x0011
_M_ATTR_INFO = 0x0015

_FILTER_DEFLATE = 1
_FILTER_SHUFFLE = 2


def _u(buf: bytes, off: int, n: int) -> int:
    return int.from_bytes(buf[off : off + n], "little")


class _H5Error(RasterOpenError):
    pass


@dataclass
class _Dataset:
    name: str
    shape: tuple[int, ...]
    dtype: np.dtype | None
    layout_class: int  # 0 compact, 1 contiguous, 2 chunked
    data_addr: int  # contiguous address / chunk-btree address
    data_size: int  # contiguous size
    compact: bytes | None
    chunk_shape: tuple[int, ...] | None
    filters: list[tuple[int, int, tuple[int, ...]]]  # (id, flags, cvals)
    attrs: dict
    fill: float | None


class _H5File:
    """Minimal random-access HDF5 structure parser (read side)."""

    def __init__(self, source: _ByteSource):
        self.src = source
        head = source.read_at(0, 8)
        if head != _SIG:
            raise _H5Error(f"'{source.path}' is not an HDF5 file")
        sb = source.read_at(0, 64)
        version = sb[8]
        if version in (0, 1):
            if sb[13] != 8 or sb[14] != 8:
                raise _H5Error(
                    f"'{source.path}': unsupported HDF5 offset/length size"
                )
            # v0: header is 24 bytes to base addr; v1 adds 2+2 bytes
            # (indexed-storage k + reserved) before the addresses
            base_off = 24 if version == 0 else 28
            self.base = _u(sb, base_off, 8)
            # root group symbol table entry sits after the 4 addresses
            root_entry_off = base_off + 32
            entry = source.read_at(root_entry_off, 40)
            self.root_addr = _u(entry, 8, 8)
        elif version in (2, 3):
            if sb[9] != 8 or sb[10] != 8:
                raise _H5Error(
                    f"'{source.path}': unsupported HDF5 offset/length size"
                )
            self.base = _u(sb, 12, 8)
            self.root_addr = _u(sb, 36, 8)
        else:
            raise _H5Error(
                f"'{source.path}': unsupported HDF5 superblock v{version}"
            )

    # -- object headers --------------------------------------------------

    def messages(self, addr: int) -> list[tuple[int, bytes]]:
        """All (type, body) messages of the object header at addr,
        continuation blocks resolved."""
        peek = self.src.read_at(addr, 4)
        if peek == b"OHDR":
            return self._messages_v2(addr)
        return self._messages_v1(addr)

    def _messages_v1(self, addr: int) -> list[tuple[int, bytes]]:
        head = self.src.read_at(addr, 16)
        if head[0] != 1:
            raise _H5Error(f"bad object header version {head[0]}")
        n_msgs = _u(head, 2, 2)
        hdr_size = _u(head, 8, 4)
        out: list[tuple[int, bytes]] = []
        # message blocks: the first starts 16 bytes in (12-byte prefix +
        # 4 alignment), continuations are raw message runs
        blocks = [(addr + 16, hdr_size)]
        while blocks and len(out) < n_msgs:
            baddr, bsize = blocks.pop(0)
            buf = self.src.read_at(baddr, bsize)
            pos = 0
            while pos + 8 <= bsize and len(out) < n_msgs:
                mtype = _u(buf, pos, 2)
                msize = _u(buf, pos + 2, 2)
                body = buf[pos + 8 : pos + 8 + msize]
                pos += 8 + msize
                pos = (pos + 7) & ~7 if msize % 8 else pos
                if mtype == _M_CONTINUATION:
                    blocks.append((_u(body, 0, 8), _u(body, 8, 8)))
                else:
                    out.append((mtype, body))
        return out

    def _messages_v2(self, addr: int) -> list[tuple[int, bytes]]:
        head = self.src.read_at(addr, 16)
        flags = head[5]
        pos = 6
        if flags & 0x20:
            pos += 16  # access/mod/change/birth times
        if flags & 0x10:
            pos += 4  # max compact / min dense attributes
        size_bytes = 1 << (flags & 0x3)
        raw = self.src.read_at(addr, pos + size_bytes)
        chunk0 = _u(raw, pos, size_bytes)
        pos += size_bytes
        track_order = bool(flags & 0x04)
        out: list[tuple[int, bytes]] = []
        blocks = [(addr + pos, chunk0, False)]
        while blocks:
            baddr, bsize, is_ochk = blocks.pop(0)
            buf = self.src.read_at(baddr, bsize)
            p = 0
            end = len(buf)
            if buf[:4] == b"OCHK" or is_ochk:
                # continuation blocks carry signature + trailing checksum;
                # chunk 0's size covers messages only (checksum follows it)
                p = 4
                end = len(buf) - 4
            while p + 4 <= end:
                mtype = buf[p]
                msize = _u(buf, p + 1, 2)
                mflags = buf[p + 3]
                p += 4
                if track_order:
                    p += 2
                if p + msize > len(buf):
                    break
                body = buf[p : p + msize]
                p += msize
                if mtype == _M_CONTINUATION:
                    blocks.append((_u(body, 0, 8), _u(body, 8, 8), True))
                elif mtype != 0:
                    out.append((mtype, body))
                del mflags
        return out

    # -- groups -----------------------------------------------------------

    def group_links(self, addr: int) -> dict[str, int]:
        """name -> object header address for the group at addr."""
        links: dict[str, int] = {}
        for mtype, body in self.messages(addr):
            if mtype == _M_SYMBOL_TABLE:
                btree, heap = _u(body, 0, 8), _u(body, 8, 8)
                self._walk_group_btree(btree, heap, links)
            elif mtype == _M_LINK:
                name, target = self._parse_link(body)
                if name is not None:
                    links[name] = target
            elif mtype == _M_LINK_INFO:
                flags = body[1]
                p = 2 + (8 if flags & 1 else 0)
                fheap = _u(body, p, 8)
                if fheap != _UNDEF:
                    raise _H5Error(
                        "dense (fractal-heap) group links are not supported"
                        " — re-export with default libnetcdf settings"
                    )
        return links

    def _parse_link(self, body: bytes):
        version, flags = body[0], body[1]
        if version != 1:
            return None, 0
        p = 2
        ltype = 0
        if flags & 0x08:
            ltype = body[p]
            p += 1
        if flags & 0x04:
            p += 8  # creation order
        if flags & 0x10:
            p += 1  # charset
        nlen_size = 1 << (flags & 0x3)
        nlen = _u(body, p, nlen_size)
        p += nlen_size
        name = body[p : p + nlen].decode("utf-8", "replace")
        p += nlen
        if ltype != 0:
            return None, 0  # soft/external links: skip
        return name, _u(body, p, 8)

    def _walk_group_btree(self, btree: int, heap: int, links: dict) -> None:
        if btree == _UNDEF:
            return
        heap_head = self.src.read_at(heap, 32)
        if heap_head[:4] != b"HEAP":
            raise _H5Error("bad local heap signature")
        heap_data = _u(heap_head, 24, 8)
        heap_size = _u(heap_head, 8, 8)
        names = self.src.read_at(heap_data, heap_size)

        def name_at(off: int) -> str:
            end = names.find(b"\x00", off)
            return names[off:end].decode("utf-8", "replace")

        stack = [btree]
        while stack:
            node_addr = stack.pop()
            head = self.src.read_at(node_addr, 24)
            if head[:4] != b"TREE":
                raise _H5Error("bad group B-tree signature")
            level, entries = head[5], _u(head, 6, 2)
            body = self.src.read_at(node_addr + 24, (2 * entries + 1) * 8)
            children = [_u(body, 8 + 16 * i, 8) for i in range(entries)]
            if level > 0:
                stack.extend(children)
                continue
            for snod_addr in children:
                sh = self.src.read_at(snod_addr, 8)
                if sh[:4] != b"SNOD":
                    raise _H5Error("bad symbol node signature")
                n_sym = _u(sh, 6, 2)
                sbuf = self.src.read_at(snod_addr + 8, 40 * n_sym)
                for i in range(n_sym):
                    off = 40 * i
                    links[name_at(_u(sbuf, off, 8))] = _u(sbuf, off + 8, 8)

    # -- datasets ----------------------------------------------------------

    def dataset(self, name: str, addr: int) -> _Dataset:
        shape: tuple[int, ...] = ()
        dtype: np.dtype | None = None
        layout_class = -1
        data_addr = _UNDEF
        data_size = 0
        compact = None
        chunk_shape = None
        filters: list = []
        attrs: dict = {}
        fill = None
        for mtype, body in self.messages(addr):
            if mtype == _M_DATASPACE:
                shape = _parse_dataspace(body)
            elif mtype == _M_DATATYPE:
                dtype = _parse_datatype(body)
            elif mtype == _M_LAYOUT:
                layout_class, data_addr, data_size, compact, chunk_shape = (
                    _parse_layout(body)
                )
            elif mtype == _M_FILTERS:
                filters = _parse_filters(body)
            elif mtype == _M_ATTRIBUTE:
                k, v = _parse_attribute(body)
                if k is not None:
                    attrs[k] = v
            elif mtype == _M_FILL:
                fill = _parse_fill(body, dtype)
            elif mtype == _M_ATTR_INFO:
                flags = body[1]
                p = 2 + (2 if flags & 1 else 0)
                if _u(body, p, 8) != _UNDEF:
                    raise _H5Error(
                        "dense attribute storage is not supported"
                    )
        return _Dataset(name, shape, dtype, layout_class, data_addr,
                        data_size, compact, chunk_shape, filters, attrs, fill)

    def chunk_map(self, ds: _Dataset) -> dict[tuple[int, ...], tuple[int, int, int]]:
        """chunk grid offsets -> (address, stored size, filter mask)."""
        ndims = len(ds.shape) + 1  # element dimension included in keys
        key_size = 8 + 8 * ndims
        out: dict = {}
        if ds.data_addr == _UNDEF:
            return out
        stack = [ds.data_addr]
        while stack:
            node_addr = stack.pop()
            head = self.src.read_at(node_addr, 24)
            if head[:4] != b"TREE":
                raise _H5Error("bad chunk B-tree signature")
            if head[4] != 1:
                raise _H5Error("expected a raw-data chunk B-tree")
            level, entries = head[5], _u(head, 6, 2)
            body = self.src.read_at(
                node_addr + 24, entries * (key_size + 8) + key_size
            )
            p = 0
            for _ in range(entries):
                size = _u(body, p, 4)
                mask = _u(body, p + 4, 4)
                offs = tuple(
                    _u(body, p + 8 + 8 * d, 8) for d in range(ndims - 1)
                )
                child = _u(body, p + key_size, 8)
                p += key_size + 8
                if level > 0:
                    stack.append(child)
                else:
                    out[offs] = (child, size, mask)
        return out


def _parse_dataspace(body: bytes) -> tuple[int, ...]:
    version = body[0]
    rank = body[1]
    if version == 1:
        p = 8
    elif version == 2:
        p = 4
    else:
        raise _H5Error(f"unsupported dataspace version {version}")
    return tuple(_u(body, p + 8 * i, 8) for i in range(rank))


def _parse_datatype(body: bytes) -> np.dtype | None:
    cls = body[0] & 0x0F
    bits0 = body[1]
    size = _u(body, 4, 4)
    order = ">" if (bits0 & 1) else "<"
    if cls == 0:  # fixed-point
        signed = bool(bits0 & 0x08)
        return np.dtype(f"{order}{'i' if signed else 'u'}{size}")
    if cls == 1:  # float (assume IEEE layouts, the only ones in the wild)
        if size not in (4, 8):
            return None
        return np.dtype(f"{order}f{size}")
    if cls == 3:  # string (fixed length)
        return np.dtype(f"S{size}")
    return None  # vlen / reference / compound: callers skip


def _parse_layout(body: bytes):
    version = body[0]
    if version != 3:
        raise _H5Error(f"unsupported data layout version {version}")
    cls = body[1]
    if cls == 0:  # compact
        size = _u(body, 2, 2)
        return 0, _UNDEF, size, body[4 : 4 + size], None
    if cls == 1:  # contiguous
        return 1, _u(body, 2, 8), _u(body, 10, 8), None, None
    if cls == 2:  # chunked
        ndims = body[2]
        btree = _u(body, 3, 8)
        dims = tuple(_u(body, 11 + 4 * i, 4) for i in range(ndims - 1))
        return 2, btree, 0, None, dims
    raise _H5Error(f"unsupported layout class {cls}")


def _parse_filters(body: bytes) -> list[tuple[int, int, tuple[int, ...]]]:
    version = body[0]
    nf = body[1]
    out = []
    p = 8 if version == 1 else 2
    for _ in range(nf):
        fid = _u(body, p, 2)
        if version == 1 or fid >= 256:
            nlen = _u(body, p + 2, 2)
            p += 4
        else:
            nlen = 0
            p += 2
        flags = _u(body, p, 2)
        nvals = _u(body, p + 2, 2)
        p += 4
        if nlen:
            pad = (nlen + 7) & ~7 if version == 1 else nlen
            p += pad
        cvals = tuple(_u(body, p + 4 * i, 4) for i in range(nvals))
        p += 4 * nvals
        if version == 1 and nvals % 2:
            p += 4
        out.append((fid, flags, cvals))
    return out


def _parse_attribute(body: bytes):
    version = body[0]
    if version not in (1, 2, 3):
        return None, None
    name_size = _u(body, 2, 2)
    dt_size = _u(body, 4, 2)
    ds_size = _u(body, 6, 2)
    p = 8
    if version == 3:
        p += 1  # name charset
    pad = (lambda n: (n + 7) & ~7) if version == 1 else (lambda n: n)
    name = body[p : p + name_size].split(b"\x00")[0].decode("utf-8", "replace")
    p += pad(name_size)
    dtype = _parse_datatype(body[p : p + dt_size])
    p += pad(dt_size)
    try:
        shape = _parse_dataspace(body[p : p + ds_size])
    except _H5Error:
        return None, None
    p += pad(ds_size)
    if dtype is None:
        return None, None  # vlen/reference (DIMENSION_LIST etc.): skip
    n = int(np.prod(shape)) if shape else 1
    raw = body[p : p + n * dtype.itemsize]
    if len(raw) < n * dtype.itemsize:
        return None, None
    vals = np.frombuffer(raw, dtype=dtype, count=n)
    if dtype.kind == "S":
        return name, vals[0].split(b"\x00")[0].decode("utf-8", "replace")
    return name, (vals[0] if n == 1 else vals)


def _parse_fill(body: bytes, dtype):
    version = body[0]
    if version in (1, 2):
        defined = body[3]
        if version == 1 or defined:
            size = _u(body, 4, 4)
            raw = body[8 : 8 + size]
        else:
            return None
    elif version == 3:
        flags = body[1]
        if not flags & 0x20:
            return None
        size = _u(body, 2, 4)
        raw = body[6 : 6 + size]
    else:
        return None
    if dtype is None or len(raw) < dtype.itemsize:
        return None
    return float(np.frombuffer(raw, dtype=dtype, count=1)[0])


# ---------------------------------------------------------------------------
# Windowed chunk reader (duck-types geotiff._BlockReader.read)
# ---------------------------------------------------------------------------


@dataclass
class _H5ChunkReader:
    source: _ByteSource
    dtype: np.dtype
    height: int
    width: int
    chunk_h: int
    chunk_w: int
    chunks: dict[tuple[int, ...], tuple[int, int, int]]
    filters: list[tuple[int, int, tuple[int, ...]]]
    fill: float
    flip: bool = False  # ascending-latitude files: rows served reversed

    def _decode(self, raw: bytes, mask: int) -> np.ndarray:
        for i, (fid, _fl, _cv) in enumerate(reversed(self.filters)):
            idx = len(self.filters) - 1 - i
            if mask & (1 << idx):
                continue
            if fid == _FILTER_DEFLATE:
                raw = zlib.decompress(raw)
            elif fid == _FILTER_SHUFFLE:
                isz = self.dtype.itemsize
                arr = np.frombuffer(raw, dtype=np.uint8)
                raw = (
                    arr.reshape(isz, len(arr) // isz).T.tobytes()
                )
            else:
                raise _H5Error(f"unsupported HDF5 filter id {fid}")
        return np.frombuffer(raw, dtype=self.dtype).reshape(
            self.chunk_h, self.chunk_w
        )

    def read(self, r0: int, r1: int, c0: int, c1: int) -> np.ndarray:
        if self.flip:
            # rows are stored south-up; serve north-up
            sr0 = self.height - r1
            sr1 = self.height - r0
            out = self._read_raw(sr0, sr1, c0, c1)
            return out[::-1, :].copy()
        return self._read_raw(r0, r1, c0, c1)

    def _read_raw(self, r0, r1, c0, c1) -> np.ndarray:
        native = self.dtype.newbyteorder("=")
        out = np.full((r1 - r0, c1 - c0),
                      _fill_cast(self.fill, native), dtype=native)
        cr0, cr1 = r0 // self.chunk_h, (r1 - 1) // self.chunk_h
        cc0, cc1 = c0 // self.chunk_w, (c1 - 1) // self.chunk_w
        for cr in range(cr0, cr1 + 1):
            for cc in range(cc0, cc1 + 1):
                key = (cr * self.chunk_h, cc * self.chunk_w)
                gr0, gc0 = key
                ck = (self.source.cache_key, "h5", key)
                arr = _cache_get(ck)
                if arr is None:
                    ent = self.chunks.get(key)
                    if ent is None:
                        arr = np.full((self.chunk_h, self.chunk_w),
                                      _fill_cast(self.fill, native),
                                      dtype=native)
                    else:
                        addr, size, mask = ent
                        raw = self.source.read_at(addr, size)
                        arr = self._decode(raw, mask).astype(native)
                    _cache_put(ck, arr)
                orow0, orow1 = max(r0, gr0), min(r1, gr0 + self.chunk_h,
                                                 self.height)
                ocol0, ocol1 = max(c0, gc0), min(c1, gc0 + self.chunk_w,
                                                 self.width)
                if orow0 >= orow1 or ocol0 >= ocol1:
                    continue
                out[orow0 - r0 : orow1 - r0, ocol0 - c0 : ocol1 - c0] = arr[
                    orow0 - gr0 : orow1 - gr0, ocol0 - gc0 : ocol1 - gc0
                ]
        return out


@dataclass
class _H5ContigReader:
    """Contiguous dataset window reads (row ranges), optional lat flip."""

    source: _ByteSource
    dtype: np.dtype
    height: int
    width: int
    offset: int
    flip: bool = False

    def read(self, r0: int, r1: int, c0: int, c1: int) -> np.ndarray:
        if self.flip:
            sr0, sr1 = self.height - r1, self.height - r0
            row_bytes = self.width * self.dtype.itemsize
            raw = self.source.read_at(
                self.offset + sr0 * row_bytes, (sr1 - sr0) * row_bytes
            )
            arr = np.frombuffer(raw, dtype=self.dtype).reshape(
                sr1 - sr0, self.width
            )[::-1, c0:c1]
        else:
            row_bytes = self.width * self.dtype.itemsize
            raw = self.source.read_at(
                self.offset + r0 * row_bytes, (r1 - r0) * row_bytes
            )
            arr = np.frombuffer(raw, dtype=self.dtype).reshape(
                r1 - r0, self.width
            )[:, c0:c1]
        return np.ascontiguousarray(arr).astype(
            self.dtype.newbyteorder("="), copy=False
        )


def _fill_cast(v: float, dtype: np.dtype):
    if dtype.kind in "iu":
        return dtype.type(int(v))
    return dtype.type(v)


# ---------------------------------------------------------------------------
# netCDF4 (CF lat/lon grid) assembly
# ---------------------------------------------------------------------------

_DATA_NAMES = ("z", "elevation", "band1", "topo", "height", "dem", "data")
_LAT_NAMES = ("lat", "latitude", "y")
_LON_NAMES = ("lon", "longitude", "x")


def _read_whole(h5: _H5File, ds: _Dataset) -> np.ndarray:
    if ds.dtype is None:
        raise _H5Error(f"variable '{ds.name}' has an unsupported datatype")
    n = int(np.prod(ds.shape)) if ds.shape else 1
    if ds.layout_class == 0:
        return np.frombuffer(ds.compact, dtype=ds.dtype, count=n).reshape(
            ds.shape
        )
    if ds.layout_class == 1:
        raw = h5.src.read_at(ds.data_addr, n * ds.dtype.itemsize)
        return np.frombuffer(raw, dtype=ds.dtype, count=n).reshape(ds.shape)
    if ds.layout_class == 2:
        chunks = h5.chunk_map(ds)
        if len(ds.shape) == 1:
            out = np.full(ds.shape[0],
                          _fill_cast(ds.fill or 0.0,
                                     ds.dtype.newbyteorder("=")),
                          dtype=ds.dtype.newbyteorder("="))
            cw = ds.chunk_shape[0]
            rdr = _H5ChunkReader(h5.src, ds.dtype, 1, ds.shape[0], 1, cw,
                                 {(0, k[0]): v for k, v in chunks.items()},
                                 ds.filters, ds.fill or 0.0)
            return rdr.read(0, 1, 0, ds.shape[0])[0]
        rdr = _H5ChunkReader(
            h5.src, ds.dtype, ds.shape[0], ds.shape[1],
            ds.chunk_shape[0], ds.chunk_shape[1], chunks, ds.filters,
            ds.fill or 0.0,
        )
        return rdr.read(0, ds.shape[0], 0, ds.shape[1])
    raise _H5Error(f"variable '{ds.name}' has no data layout")


def _att_scalar(v) -> float:
    arr = np.asarray(v).ravel()
    return float(arr[0])


def open_netcdf4(path: str, buf: bytes | None = None,
                 source: _ByteSource | None = None) -> Raster:
    """Open a netCDF4 (HDF5-backed) CF lat/lon grid as a Raster.

    Same conventions as gridformats.open_netcdf (the netCDF3 twin):
    preferred-name 2-D variable, uniform 1-D lat/lon coordinate
    variables (cell centers), _FillValue/missing_value nodata,
    scale_factor/add_offset unpacking (eager), ascending-latitude files
    exposed as a lazily flipped north-up view. Chunked variables read
    windowed: interpolation touches only the chunks under its points.
    """
    src = source if source is not None else _ByteSource(path, buf=buf)
    try:
        h5 = _H5File(src)
        links = h5.group_links(h5.root_addr)
        dsets: dict[str, _Dataset] = {}
        for name, addr in links.items():
            try:
                dsets[name] = h5.dataset(name, addr)
            except _H5Error:
                raise
    except _H5Error:
        raise
    except (struct.error, IndexError, ValueError) as e:
        raise _H5Error(f"'{path}': unparseable HDF5 structure ({e})")

    two_d = {n: d for n, d in dsets.items()
             if len(d.shape) == 2 and d.dtype is not None}
    if not two_d:
        raise _H5Error(f"'{path}': no 2-D data variable")
    by_pref = [n for nm in _DATA_NAMES for n in two_d if n.lower() == nm]
    dname = by_pref[0] if by_pref else sorted(two_d)[0]
    var = two_d[dname]

    one_d = {n: d for n, d in dsets.items()
             if len(d.shape) == 1 and d.dtype is not None}

    def find_coord(names: tuple[str, ...], length_a: int, length_b: int):
        for n, d in one_d.items():
            if n.lower() in names and d.shape[0] in (length_a, length_b):
                return n, d
        return None, None

    h, w = var.shape
    lat_name, lat_ds = find_coord(_LAT_NAMES, h, w)
    lon_name, lon_ds = find_coord(_LON_NAMES, h, w)
    if lat_ds is None or lon_ds is None:
        raise _H5Error(
            f"'{path}': missing 1-D lat/lon coordinate variables"
        )
    transposed = lat_ds.shape[0] == w and lon_ds.shape[0] == h and h != w
    lats = _read_whole(h5, lat_ds).astype(np.float64)
    lons = _read_whole(h5, lon_ds).astype(np.float64)
    for nm, c in (("lat", lats), ("lon", lons)):
        if c.size >= 2:
            steps = np.diff(c)
            if not np.allclose(steps, steps[0], rtol=1e-6, atol=0):
                raise _H5Error(
                    f"'{path}': non-uniform {nm} spacing — rectilinear"
                    " grids with varying cell size are not supported"
                )
    if lons.size >= 2 and lons[1] < lons[0]:
        raise _H5Error(f"'{path}': descending longitude unsupported")
    sy = abs(lats[1] - lats[0]) if lats.size >= 2 else 1.0
    sx = abs(lons[1] - lons[0]) if lons.size >= 2 else 1.0
    south_up = lats.size >= 2 and lats[1] > lats[0]

    nodata = None
    for key in ("_FillValue", "missing_value"):
        if key in var.attrs:
            nodata = _att_scalar(var.attrs[key])
            break
    if nodata is None and var.fill is not None:
        nodata = var.fill
    scale = _att_scalar(var.attrs["scale_factor"]) \
        if "scale_factor" in var.attrs else 1.0
    offset = _att_scalar(var.attrs["add_offset"]) \
        if "add_offset" in var.attrs else 0.0

    data = None
    blocks = None
    dtype = var.dtype
    eager = transposed or scale != 1.0 or offset != 0.0
    if eager:
        raw = _read_whole(h5, var)
        if transposed:
            raw = raw.T
        if south_up:
            raw = raw[::-1, :]
        if scale != 1.0 or offset != 0.0:
            unpacked = raw.astype(np.float64) * scale + offset
            if nodata is not None:
                unpacked[np.asarray(raw) ==
                         _fill_cast(nodata, raw.dtype)] = np.nan
                nodata = None
            data = unpacked.astype(np.float32)
            dtype = np.dtype(np.float32)
        else:
            data = np.ascontiguousarray(raw)
        height, width = data.shape
    else:
        height, width = h, w
        if var.layout_class == 2:
            blocks = _H5ChunkReader(
                src, var.dtype, h, w, var.chunk_shape[0], var.chunk_shape[1],
                h5.chunk_map(var), var.filters,
                nodata if nodata is not None else 0.0, flip=south_up,
            )
        elif var.layout_class == 1:
            blocks = _H5ContigReader(
                src, var.dtype, h, w, var.data_addr, flip=south_up,
            )
        else:  # compact
            data = np.frombuffer(var.compact, dtype=var.dtype).reshape(h, w)
            if south_up:
                data = data[::-1, :]

    top_lat = lats.max() if lats.size else 0.0
    left_lon = lons.min() if lons.size else 0.0
    return Raster(
        path=path, width=width, height=height, dtype=dtype, nodata=nodata,
        crs=CRSInfo(epsg=4326), x0=left_lon - sx / 2, y0=top_lat + sy / 2,
        sx=sx, sy=sy, _data=data, _blocks=blocks,
    )


# ---------------------------------------------------------------------------
# Writer: minimal netCDF4-style HDF5 (fixture generator + small-grid sink)
# ---------------------------------------------------------------------------


class _Writer:
    def __init__(self):
        self.buf = bytearray()

    def tell(self) -> int:
        return len(self.buf)

    def write(self, b: bytes) -> int:
        at = len(self.buf)
        self.buf += b
        return at

    def align(self, n: int = 8):
        while len(self.buf) % n:
            self.buf += b"\x00"

    def patch(self, at: int, b: bytes):
        self.buf[at : at + len(b)] = b


def _dt_message(dtype: np.dtype) -> bytes:
    order = 1 if dtype.byteorder == ">" else 0
    if dtype.kind in "iu":
        bits0 = order | (0x08 if dtype.kind == "i" else 0)
        head = bytes([0x10 | 0x00, bits0, 0, 0]) + struct.pack(
            "<I", dtype.itemsize
        )
        return head + struct.pack("<HH", 0, dtype.itemsize * 8)
    if dtype.kind == "f":
        bits0 = order | 0x20  # IEEE mantissa normalization (MSB implied)
        sign_loc = 63 if dtype.itemsize == 8 else 31
        head = bytes([0x10 | 0x01, bits0, sign_loc, 0]) + struct.pack(
            "<I", dtype.itemsize)
        if dtype.itemsize == 4:
            props = struct.pack("<HHBBBBI", 0, 32, 23, 8, 0, 23, 127)
        else:
            props = struct.pack("<HHBBBBI", 0, 64, 52, 11, 0, 52, 1023)
        return head + props
    if dtype.kind == "S":
        # fixed-length string, null-terminated, ASCII
        return bytes([0x10 | 0x03, 0, 0, 0]) + struct.pack(
            "<I", dtype.itemsize)
    raise ValueError(f"unsupported writer dtype {dtype}")


def _ds_message(shape: tuple[int, ...]) -> bytes:
    body = bytes([1, len(shape), 0, 0]) + b"\x00" * 4
    for d in shape:
        body += struct.pack("<Q", d)
    return body


def _attr_message(name: str, value: np.ndarray) -> bytes:
    value = np.atleast_1d(value)
    nb = name.encode() + b"\x00"
    dt = _dt_message(value.dtype)
    ds = _ds_message(value.shape)

    def pad8(b: bytes) -> bytes:
        return b + b"\x00" * ((-len(b)) % 8)

    return (
        bytes([1, 0]) + struct.pack("<HHH", len(nb), len(dt), len(ds))
        + pad8(nb) + pad8(dt) + pad8(ds) + value.tobytes()
    )


def _msg(mtype: int, body: bytes) -> bytes:
    padded = body + b"\x00" * ((-len(body)) % 8)
    return struct.pack("<HHB3x", mtype, len(padded), 0) + padded


def _object_header(messages: list[bytes]) -> bytes:
    body = b"".join(messages)
    return (
        struct.pack("<BBHII4x", 1, 0, len(messages), 1, len(body)) + body
    )


def write_netcdf4(
    path: str,
    array: np.ndarray,
    *,
    x0: float,
    y0: float,
    sx: float,
    sy: float,
    nodata: float | None = None,
    compression: str | None = "deflate",
    shuffle: bool = False,
    chunk: tuple[int, int] = (64, 64),
    ascending_lat: bool = False,
    scale_factor: float | None = None,
    add_offset: float | None = None,
    var_name: str = "elevation",
) -> None:
    """Write a CF lat/lon grid as a netCDF4-style HDF5 file.

    (x0, y0) is the outer upper-left edge (GDAL convention), matching
    write_geotiff; coordinate variables carry cell CENTERS per CF.
    ascending_lat writes the south-up row order many netCDF exports use
    (readers must flip). scale_factor/add_offset write PACKED data.
    """
    array = np.asarray(array)
    h, w = array.shape
    lats = y0 - (np.arange(h) + 0.5) * sy
    lons = x0 + (np.arange(w) + 0.5) * sx
    rows = array
    if ascending_lat:
        lats = lats[::-1]
        rows = rows[::-1, :]
    if scale_factor is not None or add_offset is not None:
        s = scale_factor if scale_factor is not None else 1.0
        o = add_offset if add_offset is not None else 0.0
        packed = np.round((rows.astype(np.float64) - o) / s)
        if nodata is not None:
            packed = np.where(np.isnan(rows.astype(np.float64)),
                              nodata, packed)
        rows = packed.astype(np.int16)

    wtr = _Writer()
    # superblock v0 (96 bytes incl. root symbol-table entry)
    sb_at = wtr.write(
        _SIG + bytes([0, 0, 0, 0, 0, 8, 8, 0])
        + struct.pack("<HHI", 4, 16, 0)
        + struct.pack("<QQQQ", 0, _UNDEF, 0, _UNDEF)
    )
    root_entry_at = wtr.write(b"\x00" * 40)

    lat_le = lats.astype("<f8")
    lon_le = lons.astype("<f8")
    data_le = rows.astype(rows.dtype.newbyteorder("<"))

    # variable object headers -------------------------------------------
    def contiguous_var(name: str, arr: np.ndarray,
                       attrs: list[tuple[str, np.ndarray]]):
        data_at = wtr.write(arr.tobytes())
        msgs = [
            _msg(_M_DATASPACE, _ds_message(arr.shape)),
            _msg(_M_DATATYPE, _dt_message(arr.dtype)),
            _msg(_M_LAYOUT,
                 bytes([3, 1]) + struct.pack("<QQ", data_at,
                                             arr.nbytes)),
        ]
        for k, v in attrs:
            msgs.append(_msg(_M_ATTRIBUTE, _attr_message(k, v)))
        wtr.align()
        return wtr.write(_object_header(msgs))

    lat_oh = contiguous_var("lat", lat_le, [
        ("units", np.frombuffer(b"degrees_north\x00", dtype="S14")),
    ])
    lon_oh = contiguous_var("lon", lon_le, [
        ("units", np.frombuffer(b"degrees_east\x00", dtype="S13")),
    ])

    # data variable: chunked (+deflate/shuffle) or contiguous
    dattrs: list[tuple[str, np.ndarray]] = []
    if nodata is not None:
        dattrs.append(("_FillValue",
                       np.array([nodata]).astype(data_le.dtype)))
    if scale_factor is not None:
        dattrs.append(("scale_factor", np.array([scale_factor], "<f8")))
    if add_offset is not None:
        dattrs.append(("add_offset", np.array([add_offset], "<f8")))

    if compression is None:
        data_oh = contiguous_var(var_name, data_le, dattrs)
    else:
        if compression != "deflate":
            raise ValueError("writer supports compression='deflate' only")
        ch, cw = min(chunk[0], h), min(chunk[1], w)
        isz = data_le.dtype.itemsize
        entries = []  # (row_off, col_off, addr, size)
        for r in range(0, h, ch):
            for c in range(0, w, cw):
                block = np.full((ch, cw),
                                _fill_cast(nodata if nodata is not None
                                           else 0, data_le.dtype),
                                dtype=data_le.dtype)
                rr = min(ch, h - r)
                cc = min(cw, w - c)
                block[:rr, :cc] = data_le[r : r + rr, c : c + cc]
                raw = block.tobytes()
                if shuffle:
                    raw = (np.frombuffer(raw, np.uint8)
                           .reshape(ch * cw, isz).T.tobytes())
                comp = zlib.compress(raw, 6)
                addr = wtr.write(comp)
                entries.append((r, c, addr, len(comp)))
        # single-leaf chunk B-tree (fine for fixture-scale chunk counts)
        if len(entries) > 1024:
            raise ValueError("writer caps at 1024 chunks per variable")
        wtr.align()
        btree_at = wtr.tell()
        node = bytearray()
        node += b"TREE" + bytes([1, 0]) + struct.pack("<H", len(entries))
        node += struct.pack("<QQ", _UNDEF, _UNDEF)
        for r, c, addr, size in entries:
            node += struct.pack("<IIQQQ", size, 0, r, c, 0)
            node += struct.pack("<Q", addr)
        # final key: one past the end in the slowest dimension
        node += struct.pack("<IIQQQ", 0, 0, h, 0, 0)
        wtr.write(bytes(node))
        filters = bytes([1, 1]) + b"\x00" * 6
        fname = b"deflate\x00"
        filters += struct.pack("<HHHH", _FILTER_DEFLATE, len(fname), 1, 1)
        filters += fname + struct.pack("<II", 6, 0)
        if shuffle:
            sname = b"shuffle\x00"
            filters = bytes([1, 2]) + b"\x00" * 6
            filters += struct.pack("<HHHH", _FILTER_SHUFFLE, len(sname), 1, 1)
            filters += sname + struct.pack("<II", isz, 0)
            filters += struct.pack("<HHHH", _FILTER_DEFLATE, len(fname), 1, 1)
            filters += fname + struct.pack("<II", 6, 0)
        layout = bytes([3, 2, 3]) + struct.pack("<Q", btree_at)
        layout += struct.pack("<III", ch, cw, isz)
        msgs = [
            _msg(_M_DATASPACE, _ds_message((h, w))),
            _msg(_M_DATATYPE, _dt_message(data_le.dtype)),
            _msg(_M_FILTERS, filters),
            _msg(_M_LAYOUT, layout),
        ]
        for k, v in dattrs:
            msgs.append(_msg(_M_ATTRIBUTE, _attr_message(k, v)))
        wtr.align()
        data_oh = wtr.write(_object_header(msgs))

    # root group: local heap + SNOD + group B-tree + object header ------
    names = sorted([("lat", lat_oh), ("lon", lon_oh), (var_name, data_oh)])
    heap_data = bytearray(b"\x00" * 8)  # offset 0: empty string
    offsets = {}
    for n, _ in names:
        offsets[n] = len(heap_data)
        heap_data += n.encode() + b"\x00"
        while len(heap_data) % 8:
            heap_data += b"\x00"
    wtr.align()
    heap_seg_at = wtr.write(bytes(heap_data))
    wtr.align()
    heap_at = wtr.write(
        b"HEAP" + bytes([0, 0, 0, 0])
        + struct.pack("<QQQ", len(heap_data), _UNDEF, heap_seg_at)
    )
    snod = bytearray(b"SNOD" + bytes([1, 0]) + struct.pack("<H", len(names)))
    for n, oh in names:
        snod += struct.pack("<QQI4x16x", offsets[n], oh, 0)
    wtr.align()
    snod_at = wtr.write(bytes(snod))
    wtr.align()
    btree_at = wtr.write(
        b"TREE" + bytes([0, 0]) + struct.pack("<H", 1)
        + struct.pack("<QQ", _UNDEF, _UNDEF)
        + struct.pack("<QQQ", 0, snod_at, offsets[names[-1][0]])
    )
    wtr.align()
    root_oh = wtr.write(_object_header([
        _msg(_M_SYMBOL_TABLE, struct.pack("<QQ", btree_at, heap_at)),
    ]))

    # patch the root symbol-table entry + EOF address
    wtr.patch(root_entry_at, struct.pack(
        "<QQI4xQQ", 0, root_oh, 1, btree_at, heap_at
    ))
    eof_field_at = sb_at + 8 + 8 + 8 + 16  # sig + 8 cfg bytes + k/flags + base/free
    wtr.patch(eof_field_at, struct.pack("<Q", len(wtr.buf)))

    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(bytes(wtr.buf))
    os.replace(tmp, path)
