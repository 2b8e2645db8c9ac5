"""Google encoded-polyline decode/encode (pure Python, public algorithm).

The reference accepts polyline-encoded location strings, optionally with the
Google Maps ``enc:`` prefix (/root/reference/opentopodata/api.py:302-340,
via the ``polyline`` package, which is unavailable here). Precision is 1e-5
degrees, deltas are zigzag + base-32 varint encoded with an offset of 63.
"""

from __future__ import annotations


def decode(expression: str, precision: int = 5) -> list[tuple[float, float]]:
    """Decode a polyline string into a list of (lat, lon) tuples."""
    factor = 10.0**precision
    coords: list[tuple[float, float]] = []
    lat = lon = 0
    i = 0
    n = len(expression)
    while i < n:
        values = []
        for _ in range(2):
            shift = result = 0
            while True:
                if i >= n:
                    raise ValueError("truncated polyline")
                b = ord(expression[i]) - 63
                if b < 0:
                    raise ValueError("invalid polyline character")
                i += 1
                result |= (b & 0x1F) << shift
                shift += 5
                if b < 0x20:
                    break
            values.append(~(result >> 1) if result & 1 else result >> 1)
        lat += values[0]
        lon += values[1]
        coords.append((lat / factor, lon / factor))
    return coords


def encode(coords, precision: int = 5) -> str:
    """Encode (lat, lon) pairs into a polyline string."""
    factor = 10.0**precision
    out = []
    prev_lat = prev_lon = 0

    def emit(delta: int):
        v = ~(delta << 1) if delta < 0 else delta << 1
        while v >= 0x20:
            out.append(chr((0x20 | (v & 0x1F)) + 63))
            v >>= 5
        out.append(chr(v + 63))

    for lat, lon in coords:
        ilat = int(round(lat * factor))
        ilon = int(round(lon * factor))
        emit(ilat - prev_lat)
        emit(ilon - prev_lon)
        prev_lat, prev_lon = ilat, ilon
    return "".join(out)
