"""JPEG 2000 (T.800) lossless codec + GeoJP2.

The correctness contract is the LOSSLESS round trip: reversible 5/3 +
EBCOT must reproduce the source samples bit-for-bit — this pins the
whole transform/entropy chain against the original data, not merely
against a twin. Reference parity: the reference reads JP2 DEMs through
GDAL (/root/reference/opentopodata/backend.py:89).
"""

import os

import numpy as np
import pytest

from opentopodata_spark import jp2
from opentopodata_spark.geotiff import RasterOpenError, open_raster


def _dem(h=96, w=96, dtype=np.int16, base=1500, amp=900):
    y, x = np.mgrid[0:h, 0:w]
    return (base + amp * np.sin(x / 9.0) * np.cos(y / 13.0)).astype(dtype)


class TestMqCoder:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_roundtrip(self, seed):
        rng = np.random.RandomState(seed)
        probs = rng.uniform(0.02, 0.98, 19)
        ch = rng.randint(0, 19, 4000)
        dec = (rng.uniform(size=4000) < probs[ch]).astype(int)
        enc = jp2._mq_encoder()
        st = jp2._fresh_ctx()
        for b, d in zip(ch, dec):
            enc.encode(st, int(b), int(d))
        de = jp2._mq_decoder(enc.finish())
        st2 = jp2._fresh_ctx()
        assert [de.decode(st2, int(b)) for b in ch] == dec.tolist()

    def test_table_well_formed(self):
        assert len(jp2._MQ) == 47
        for qe, nmps, nlps, sw in jp2._MQ:
            assert 0 < qe < 0x8000
            assert 0 <= nmps < 47 and 0 <= nlps < 47


class TestTagTree:
    @pytest.mark.parametrize("seed", range(4))
    def test_roundtrip(self, seed):
        rng = np.random.RandomState(seed)
        gw, gh = rng.randint(1, 7), rng.randint(1, 7)
        vals = rng.randint(0, 9, (gh, gw))
        te = jp2._TagTree(gw, gh)
        te.set_values(vals)
        td = jp2._TagTree(gw, gh)
        bits = []
        for j in range(gh):
            for i in range(gw):
                for t in range(1, int(vals[j, i]) + 2):
                    te.encode(bits, i, j, t)

        class _BR:
            def __init__(self, b):
                self.b, self.p = b, 0

            def read(self):
                v = self.b[self.p]
                self.p += 1
                return v

        br = _BR(bits)
        for j in range(gh):
            for i in range(gw):
                zb = 0
                while td.decode(br, i, j, zb + 1):
                    zb += 1
                assert zb == vals[j, i]
        assert br.p == len(bits)


class TestDwt53:
    @pytest.mark.parametrize("seed", range(8))
    def test_exact_roundtrip(self, seed):
        rng = np.random.RandomState(seed)
        h, w = rng.randint(1, 70), rng.randint(1, 70)
        lv = max(0, min(rng.randint(0, 5),
                        max(min(h, w) - 1, 1).bit_length() - 1))
        x = rng.randint(-30000, 30000, (h, w)).astype(np.int64)
        assert np.array_equal(
            jp2._dwt_inverse(jp2._dwt_forward(x, lv), h, w, lv), x)


class TestCodeBlock:
    @pytest.mark.parametrize("orient", ["LL", "HL", "LH", "HH"])
    def test_roundtrip(self, orient):
        rng = np.random.RandomState(hash(orient) % 1000)
        h, w = rng.randint(1, 65), rng.randint(1, 65)
        coefs = (rng.randint(-500, 500, (h, w))
                 * (rng.uniform(size=(h, w)) < 0.3)).astype(np.int64)
        coefs[0, 0] = coefs[0, 0] or 5
        planes = int(np.abs(coefs).max()).bit_length()
        data, n_passes = jp2._BlockEncoder(coefs, orient, planes).run()
        out = jp2._BlockDecoder(data, h, w, orient, planes,
                                n_passes).run()
        assert np.array_equal(out, coefs)


class TestCodestreamLossless:
    @pytest.mark.parametrize("name,arr", [
        ("dem16", _dem()),
        ("neg16", _dem(base=-200, amp=150)),
        ("u8", _dem(dtype=np.uint8, base=128, amp=100)),
        ("u16", _dem(dtype=np.uint16, base=30000, amp=20000)),
        ("tiny", np.array([[5]], dtype=np.uint8)),
        ("thin", np.arange(200, dtype=np.int16)[None, :] - 100),
        ("tall", (np.arange(129, dtype=np.uint16) * 31 % 4096)[:, None]),
        ("const", np.full((40, 40), 1234, dtype=np.uint16)),
        ("zeros", np.zeros((33, 65), dtype=np.int16)),
    ])
    def test_roundtrip(self, name, arr):
        cs = jp2.encode_jp2_codestream(arr, levels=5)
        out = jp2.decode_jp2_codestream(cs)
        assert out.dtype == arr.dtype
        assert np.array_equal(out, arr), name

    def test_random_noise_16bit(self):
        rng = np.random.RandomState(3)
        arr = rng.randint(-32768, 32768, (67, 41)).astype(np.int16)
        out = jp2.decode_jp2_codestream(jp2.encode_jp2_codestream(arr))
        assert np.array_equal(out, arr)

    def test_compresses_smooth_terrain(self):
        arr = _dem(128, 128)
        cs = jp2.encode_jp2_codestream(arr)
        assert len(cs) < arr.nbytes  # beats raw on smooth content

    def test_deterministic(self):
        arr = _dem(50, 70)
        assert (jp2.encode_jp2_codestream(arr)
                == jp2.encode_jp2_codestream(arr))

    def test_float_rejected(self):
        with pytest.raises(jp2.Jp2Error, match="dtype"):
            jp2.encode_jp2_codestream(np.zeros((4, 4), dtype=np.float32))

    def test_truncated_body_raises(self):
        cs = jp2.encode_jp2_codestream(_dem(64, 64))
        with pytest.raises(jp2.Jp2Error, match="truncated|SOD|SOT|SIZ"):
            jp2.decode_jp2_codestream(cs[: len(cs) // 3])


class TestJp2Container:
    def test_geojp2_roundtrip(self, tmp_path):
        dem = _dem()
        p = str(tmp_path / "t.jp2")
        jp2.write_jp2(p, dem, x0=10.0, y0=1.0, sx=1 / 96, sy=1 / 96,
                      epsg=4326)
        r = jp2.open_jp2(p)
        assert (r.crs.epsg, r.width, r.height) == (4326, 96, 96)
        assert abs(r.x0 - 10.0) < 1e-12 and abs(r.y0 - 1.0) < 1e-12
        w, org = r.read_window(10, 60, 5, 90)
        assert org == (10, 5)
        assert np.array_equal(w, dem[10:60, 5:90])

    def test_projected_geojp2(self, tmp_path):
        p = str(tmp_path / "p.jp2")
        jp2.write_jp2(p, _dem(), x0=500000.0, y0=6000000.0, sx=90.0,
                      sy=90.0, epsg=32633)
        r = jp2.open_jp2(p)
        assert r.crs.epsg == 32633 and r.sy == 90.0

    def test_open_raster_dispatch(self, tmp_path):
        p = str(tmp_path / "d.jp2")
        dem = _dem()
        jp2.write_jp2(p, dem, x0=10.0, y0=1.0, sx=1 / 96, sy=1 / 96)
        r = open_raster(p)
        assert np.array_equal(r.read_window(0, 96, 0, 96)[0], dem)

    def test_raw_codestream_without_geo_rejected(self, tmp_path):
        p = str(tmp_path / "raw.j2k")
        with open(p, "wb") as f:
            f.write(jp2.encode_jp2_codestream(_dem(16, 16)))
        with pytest.raises(RasterOpenError, match="georeferencing"):
            open_raster(p)

    def test_not_a_jp2(self, tmp_path):
        with pytest.raises(jp2.Jp2Error, match="signature"):
            jp2.decode_jp2(b"PK\x03\x04 definitely not a jp2 file....")


class TestUnsupportedLoud:
    def _cs(self):
        return bytearray(jp2.encode_jp2_codestream(_dem(32, 32)))

    def _patch_marker_body(self, cs, marker, offset, value):
        i = bytes(cs).index(marker)
        cs[i + 4 + offset] = value
        return bytes(cs)

    def test_multicomponent_rejected(self):
        cs = self._cs()
        i = bytes(cs).index(b"\xff\x51")
        cs[i + 4 + 35] = 3  # Csiz low byte
        with pytest.raises(jp2.Jp2Error, match="component"):
            jp2.decode_jp2_codestream(bytes(cs))

    def test_97_transform_rejected(self):
        cs = self._patch_marker_body(self._cs(), b"\xff\x52", 9, 0)
        with pytest.raises(jp2.Jp2Error, match="9/7|reversible"):
            jp2.decode_jp2_codestream(cs)

    def test_multilayer_rejected(self):
        cs = self._patch_marker_body(self._cs(), b"\xff\x52", 3, 2)
        with pytest.raises(jp2.Jp2Error, match="layer"):
            jp2.decode_jp2_codestream(cs)


class TestElevationDifferential:
    """The same two tiles as GeoTIFF and as GeoJP2 must resolve
    identical elevations through the sequential sampler (JP2 is
    lossless, so no tolerance)."""

    def test_vs_geotiff(self, tmp_path):
        from opentopodata_spark import config, oracle
        from opentopodata_spark.geotiff import write_geotiff

        side = 48
        res = 1.0 / side
        d_tif = tmp_path / "tif"
        d_jp2 = tmp_path / "jp2"
        d_tif.mkdir()
        d_jp2.mkdir()
        for lon0, stem in ((10.0, "N00E010"), (11.0, "N00E011")):
            y, x = np.mgrid[0:side, 0:side]
            grid = (1500 + 900 * np.sin((x + lon0) / 7.0)
                    * np.cos(y / 11.0)).astype(np.int16)
            write_geotiff(str(d_tif / f"{stem}.tif"), grid, x0=lon0,
                          y0=1.0, sx=res, sy=res, epsg=4326)
            jp2.write_jp2(str(d_jp2 / f"{stem}.jp2"), grid, x0=lon0,
                          y0=1.0, sx=res, sy=res, epsg=4326)
        lats = [0.05 + (i * 0.137) % 0.9 for i in range(40)]
        lons = [10.05 + (i * 0.271) % 1.9 for i in range(40)]
        ds_t = config.dataset_from_config("t", path=str(d_tif) + "/",
                                          filename_tile_size=1)
        ds_j = config.dataset_from_config("j", path=str(d_jp2) + "/",
                                          filename_tile_size=1)
        for interp in ("nearest", "bilinear", "cubic"):
            et, _ = oracle.get_elevation(lats, lons, [ds_t], interp)
            ej, _ = oracle.get_elevation(lats, lons, [ds_j], interp)
            assert et == ej, interp
