"""CRS + codec kernel tests."""

import numpy as np
import pytest

from laji_pygeoapi_spark.kernels import codec, crs


def test_tm35fin_roundtrip_precision():
    rng = np.random.RandomState(42)
    lon = rng.uniform(19.1, 31.5, 500)
    lat = rng.uniform(59.5, 70.0, 500)
    x, y = crs.wgs84_to_tm35fin(lon, lat)
    lon2, lat2 = crs.tm35fin_to_wgs84(x, y)
    assert np.hypot(lon2 - lon, lat2 - lat).max() < 1e-9


def test_tm35fin_plausible_helsinki():
    x, y = crs.wgs84_to_tm35fin(24.9384, 60.1699)
    # Helsinki railway station area: E ~385.9 km, N ~6672.0 km
    assert float(x) == pytest.approx(385_900, abs=1500)
    assert float(y) == pytest.approx(6_672_000, abs=1500)


def test_bbox_wkt_reference_golden_tm35fin_passthrough():
    # exact golden from reference tests/test_convert_api_filters.py:88
    wkt = crs.bbox_to_tm35fin_wkt([376244.4479, 6664797.5738, 401678.9648, 6678720.0844])
    assert wkt == ("POLYGON((6664797.5738 376244.4479, 6678720.0844 376244.4479, "
                   "6678720.0844 401678.9648, 6664797.5738 401678.9648, "
                   "6664797.5738 376244.4479))")


def test_bbox_wkt_wgs84_axis_swap_behavior():
    # reference unpacks bbox as (ymin, xmin, ymax, xmax) — swapped axis quirk
    # (convert_api_filters.py:152).  With a WGS84-range bbox the transform runs
    # on the swapped values; we reproduce the behavior (values differ from
    # pyproj far outside the TM zone; structure and monotonicity must hold).
    wkt = crs.bbox_to_tm35fin_wkt([24.7741, 60.1014, 25.2246, 60.2333])
    assert wkt.startswith("POLYGON((")
    nums = wkt.replace("POLYGON((", "").replace("))", "").replace(",", "").split()
    assert len(nums) == 10
    floats = [float(v) for v in nums]
    assert floats[0] != 24.7741  # was transformed


def test_png_roundtrip_lossless():
    img = codec.synth_image(3, 32, 16)
    assert np.array_equal(codec.png_decode(codec.png_encode(img)), img)
    assert codec.psnr(img, codec.png_decode(codec.png_encode(img))) == float("inf")


def test_png_decode_filters():
    # hand-build a PNG using Up filter to exercise the decoder's filter paths
    import struct
    import zlib
    img = codec.synth_image(1, 8, 4)
    h, w, _ = img.shape
    rows = []
    prev = np.zeros(w * 3, np.int32)
    for r in range(h):
        cur = img[r].reshape(-1).astype(np.int32)
        rows.append(bytes([2]) + ((cur - prev) & 0xFF).astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    data = (b"\x89PNG\r\n\x1a\n" + codec._chunk(b"IHDR", ihdr)
            + codec._chunk(b"IDAT", zlib.compress(b"".join(rows)))
            + codec._chunk(b"IEND", b""))
    assert np.array_equal(codec.png_decode(data), img)


def test_fjpg_psnr_above_40():
    img = codec.synth_image(11, 64, 48)
    back = codec.jpeg_decode(codec.jpeg_encode(img))
    assert codec.psnr(img, back) >= 40.0


def test_fnv1a64_known_vector():
    # FNV-1a('hello') = 0xa430d84680aabd0b (public test vector)
    assert codec.fnv1a64(b"hello") == np.uint64(0xA430D84680AABD0B).astype(np.int64)


def test_synth_image_deterministic():
    a = codec.synth_image(5, 16, 16)
    b = codec.synth_image(5, 16, 16)
    assert np.array_equal(a, b)
    assert not np.array_equal(a, codec.synth_image(6, 16, 16))
