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


def test_elevation_gradient_reference_docstring_example():
    # elevationraster.py:36-62: 5x5 plateau, res (10, 10) -> slope ratio 1
    arr = np.array(
        [
            [100, 100, 100, 100, 100],
            [100, 110, 110, 110, 100],
            [100, 110, 120, 110, 100],
            [100, 110, 110, 110, 100],
            [100, 100, 100, 100, 100],
        ]
    )
    g = rasters.elevation_gradient_array(arr, res=(10.0, 10.0))
    expected = np.array(
        [
            [0.0, 1.0, 1.0, 1.0, 0.0],
            [1.0, 1.0, 1.0, 1.0, 1.0],
            [1.0, 1.0, 0.0, 1.0, 1.0],
            [1.0, 1.0, 1.0, 1.0, 1.0],
            [0.0, 1.0, 1.0, 1.0, 0.0],
        ]
    )
    np.testing.assert_allclose(g, expected)
    # degrees path: arctan(1) = 45deg at every unit-slope cell
    gd = rasters.elevation_gradient_array(arr, res=(10.0, 10.0), degrees=True)
    np.testing.assert_allclose(gd, np.degrees(np.arctan(expected)))
    assert gd.max() <= 90.0


def test_elevation_gradient_stage_closed_form():
    ids = np.array([0, 1, 2, 3, 17, 123, 4999], dtype=np.int64)
    built = rasters.BuildElevationTiffs()(pa.table({"doc_id": pa.array(ids)}))
    out = rasters.ElevationGradientStage()(built)
    w, h, _ = rasters.elevation_params(ids)
    np.testing.assert_array_equal(
        out["grad_sum_q"].to_numpy(), w * h * (2 * w + h - 2)
    )
    np.testing.assert_array_equal(
        out["grad_max_q"].to_numpy(), 4 * w + 2 * h - 8
    )
    # decode really happened: re-derive one doc brute-force from the blob
    img, _ = geotiff.decode_geotiff(built["tif"][3].as_py())
    q = 4.0 * rasters.elevation_gradient_array(img)
    assert out["grad_sum_q"][3].as_py() == int(round(q.sum()))
    assert out["steep_cells"][3].as_py() == int((q >= 40).sum())


def test_sentinel_metadata_regex_edges():
    # doc ids hitting B8A (idx 8), B12 (idx 12), B1 (idx 0) and a mask row
    ids = np.array([8, 12, 13, 0, 7, 21], dtype=np.int64)
    paths = rasters.synth_sentinel_paths(ids)
    assert "_B8A_" in paths[0] and "_B12_" in paths[1] and "_B1_" in paths[2]
    assert paths[3].startswith("masks/")  # 0 % 7 == 0
    out = rasters.SentinelMetadata()(
        pa.table({"doc_id": pa.array(ids), "path": pa.array(paths)})
    )
    bands = out["band"].to_pylist()
    assert bands[0] == "B8A"  # alternation must not stop at B8
    assert bands[1] == "B12"  # greedy two-digit match, not B1
    assert bands[2] == "B1"
    colors = out["color"].to_pylist()
    assert colors[0] == "narrow nir" and colors[1] == "swir"
    assert out["is_mask"].to_pylist() == [0, 0, 0, 1, 1, 1]
    dates = out["date"].to_pylist()
    bi, dn, _ = rasters.sentinel_path_params(ids)
    assert dates == list(dn)
    # a path whose band regex doesn't match (SCL/TCI/metadata file in a
    # real listing) emits a null band/color row instead of crashing
    odd = rasters.SentinelMetadata()(
        pa.table({
            "doc_id": pa.array([99], pa.int64()),
            "path": pa.array(
                ["tiles/S2X_MSIL2A_20170101T104031_nothing_10m.tif"]
            ),
        })
    )
    assert odd["band"][0].as_py() is None
    assert odd["color"][0].as_py() is None


def test_warp_raster_nearest_and_bilinear():
    """warp_raster: nearest is integer-exact on the synthetic linear
    field; bilinear reproduces the SAME linear field exactly at interior
    points (value(y,x) = x + 2y + c is linear, so pixel-center
    interpolation is closed-form); outside pixels take fill."""
    from ssb_sgis_ray.codecs.geotiff import warp_raster

    h, w, base = 24, 32, 7
    img = (np.arange(w)[None, :] + 2 * np.arange(h)[:, None] + base)
    src_tr = (1000.0, 2000.0, 2.0, 2.0)  # north-up, top-left origin

    # identity-CRS coarse resample, nearest: dst pixel center maps to a
    # known source cell
    dst_tr = (1001.0, 1999.0, 3.0, 3.0)
    out, inside = warp_raster(img, src_tr, dst_tr, (10, 12),
                              method="nearest")
    ii, jj = np.meshgrid(np.arange(10), np.arange(12), indexing="ij")
    xs = 1001.0 + 3.0 * (jj + 0.5)
    ys = 1999.0 - 3.0 * (ii + 0.5)
    col = np.floor((xs - 1000.0) / 2.0).astype(int)
    row = np.floor((2000.0 - ys) / 2.0).astype(int)
    ins = (col >= 0) & (col < w) & (row >= 0) & (row < h)
    np.testing.assert_array_equal(inside, ins)
    np.testing.assert_array_equal(out[ins],
                                  (col + 2 * row + base)[ins].astype(float))

    # doubled-unit CRS, bilinear: interior centers reproduce the linear
    # field value at the fractional source position exactly
    dst_tr2 = (2.0 * 1000.0 + 1.0, 2.0 * 2000.0 - 2.0, 3.0, 3.0)
    out2, inside2 = warp_raster(
        img, src_tr, dst_tr2, (8, 9),
        dst_to_src=lambda x, y: (x / 2.0, y / 2.0), method="bilinear")
    ii2, jj2 = np.meshgrid(np.arange(8), np.arange(9), indexing="ij")
    xs2 = (2001.0 + 3.0 * (jj2 + 0.5)) / 2.0
    ys2 = (3998.0 - 3.0 * (ii2 + 0.5)) / 2.0
    u = (xs2 - 1000.0) / 2.0
    v = (2000.0 - ys2) / 2.0
    interior = (u >= 0.5) & (u <= w - 0.5) & (v >= 0.5) & (v <= h - 0.5)
    expect = (u - 0.5) + 2.0 * (v - 0.5) + base
    np.testing.assert_allclose(out2[interior & inside2],
                               expect[interior & inside2], rtol=0, atol=1e-9)
    assert (out2[~inside2] == 0.0).all()
