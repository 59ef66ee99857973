"""GeoTIFF codec (codecs/geotiff.py) + raster clip-zonal stages."""

import struct

import numpy as np
import pyarrow as pa
import pytest

from ssb_sgis_ray.codecs import geotiff
from ssb_sgis_ray.sources import rasters


@pytest.mark.parametrize("dtype", [np.uint8, np.uint16, np.float32])
@pytest.mark.parametrize("compression", ["none", "deflate"])
def test_roundtrip_dtypes_and_compression(dtype, compression):
    rng = np.random.default_rng(7)
    img = (rng.integers(0, 200, size=(21, 13))).astype(dtype)  # 3 strips @ rps=8
    blob = geotiff.encode_geotiff(
        img, origin=(5000.0, 2500.0), pixel_scale=(2.0, 2.0),
        compression=compression,
    )
    out, (ox, oy, sx, sy) = geotiff.decode_geotiff(blob)
    assert out.dtype == dtype
    np.testing.assert_array_equal(out, img)
    assert (ox, oy, sx, sy) == (5000.0, 2500.0, 2.0, 2.0)


def test_multi_strip_layout_is_real():
    img = np.arange(40 * 6, dtype=np.uint8).reshape(40, 6)
    blob = geotiff.encode_geotiff(img, rows_per_strip=8)
    # independent minimal parse: header -> IFD -> StripOffsets count == 5
    (ifd_off,) = struct.unpack_from("<I", blob, 4)
    (n,) = struct.unpack_from("<H", blob, ifd_off)
    tags = {}
    for i in range(n):
        tag, typ, cnt = struct.unpack_from("<HHI", blob, ifd_off + 2 + 12 * i)
        tags[tag] = (typ, cnt)
    assert tags[273][1] == 5  # StripOffsets
    assert tags[279][1] == 5  # StripByteCounts
    assert sorted(tags) == list(tags)  # spec: IFD entries ascending by tag
    out, _ = geotiff.decode_geotiff(blob)
    np.testing.assert_array_equal(out, img)


def test_rejects_non_tiff_and_bad_layout():
    with pytest.raises(ValueError):
        geotiff.decode_geotiff(b"MM\x00*" + b"\x00" * 16)  # big-endian
    with pytest.raises(ValueError):
        geotiff.encode_geotiff(np.zeros((2, 2, 3), dtype=np.uint8))
    with pytest.raises(ValueError):
        geotiff.encode_geotiff(np.zeros((2, 2), dtype=np.int64))


def test_world_to_pixel_window_inversion_and_clamp():
    tr = (100.0, 900.0, 2.0, 2.0)  # ox, oy(top), sx, sy
    # exact window
    assert geotiff.world_to_pixel_window(tr, (104, 880, 110, 890), (20, 10)) == (
        2, 5, 5, 10,
    )
    # bbox spilling off the raster clamps
    assert geotiff.world_to_pixel_window(tr, (0, 0, 10000, 10000), (20, 10)) == (
        0, 0, 10, 20,
    )


def test_clip_zonal_stage_matches_brute_force():
    ids = np.array([0, 1, 2, 3, 17, 123, 4999], dtype=np.int64)
    built = rasters.BuildGeoTiffs()(pa.table({"doc_id": pa.array(ids)}))
    out = rasters.GeoTiffClipZonal()(built)
    for i, k in enumerate(ids):
        img, _ = geotiff.decode_geotiff(built["tif"][i].as_py())
        px0, py0, px1, py1 = (int(v[i]) for v in rasters.clip_window_params(ids))
        brute = int(img[py0:py1, px0:px1].astype(np.int64).sum())
        assert out["px_sum"][i].as_py() == brute
        assert out["win_w"][i].as_py() == px1 - px0
        assert out["win_h"][i].as_py() == py1 - py0


def test_geotiff_query_end_to_end(ray_session):
    from ssb_sgis_ray import queries as q

    df = q.q_geotiff_clip_zonal("/root/testdata/sf0.001").to_pandas()
    assert len(df) == 500 and df["doc_id"].is_unique
    assert (df["win_w"] * df["win_h"] > 0).all()
