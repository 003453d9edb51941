"""Raster-tiling invariants (north rule / input_hint): per-row decoded-pixel
PSNR >= 40 dB + caption equality through tile materialization."""

import numpy as np
import pyspark.sql.functions as F

from laji_pygeoapi_spark.kernels import codec
from laji_pygeoapi_spark.operators import tiling
from laji_pygeoapi_spark.sources import fixtures


def test_codec_level_invariant_per_row():
    # decode(encode(x)) vs x: lossless for png, >=40 dB for the lossy path
    for i in range(8):
        img = codec.synth_image(i, 32, 32)
        fmt = "png" if i % 4 != 0 else "jpeg"
        back = codec.decode(codec.encode(img, fmt))
        if fmt == "png":
            assert np.array_equal(back, img)
        else:
            assert codec.psnr(img, back) >= 40.0


def test_tiles_lossless_roundtrip(spark):
    imgs = fixtures.images_df(spark, 150).cache()
    tiles = tiling.materialize_tiles(imgs, zoom=6).toPandas()
    src = imgs.select("image_id", "bytes", "caption").toPandas()
    ver = tiling.verify_tiles(tiles, src)
    assert ver["pass"].all()
    assert ver["caption_ok"].all()
    nonov = ver.loc[~ver["overwritten"], "psnr"]
    assert (nonov == np.inf).all()  # PNG tiles: bit-exact extraction


def test_tiles_lossy_roundtrip_psnr40(spark):
    imgs = fixtures.images_df(spark, 150).cache()
    tiles = tiling.materialize_tiles(imgs, zoom=6, tile_fmt="jpeg").toPandas()
    src = imgs.select("image_id", "bytes", "caption").toPandas()
    ver = tiling.verify_tiles(tiles, src)
    assert ver["pass"].all()
    nonov = ver.loc[~ver["overwritten"], "psnr"]
    assert (nonov >= 40.0).all()
    assert nonov.min() < np.inf  # the check is non-trivial on the lossy path


def test_tile_keys_match_kernel(spark):
    imgs = fixtures.images_df(spark, 100, with_bytes=False)
    out = tiling.assign_tiles(imgs, zoom=9).toPandas()
    from laji_pygeoapi_spark.kernels import cells as C
    tx, ty = C.mercator_tile(out["lon"].to_numpy(), out["lat"].to_numpy(), 9)
    assert (out["tile_x"].to_numpy() == tx).all()
    assert (out["tile_y"].to_numpy() == ty).all()


def test_dense_tile_capped(spark):
    imgs = fixtures.images_df(spark, 300).cache()
    tiles = tiling.materialize_tiles(imgs, zoom=5, max_per_tile=16).toPandas()
    assert (tiles["n_images"] <= 16).all()
    assert tiles["n_images"].sum() > 0


def test_image_pipeline_assignments(spark):
    from laji_pygeoapi_spark.plans.image_pipeline import decode_join_tile
    imgs = fixtures.images_df(spark, 200).cache()
    out = decode_join_tile(imgs).toPandas()
    assert len(out) == 200
    assert out["ok"].all()
    # assignments agree with the kernels
    src = imgs.select("image_id", "lon", "lat").toPandas().set_index("image_id")
    from laji_pygeoapi_spark.kernels import cells as C
    joined = out.set_index("image_id").join(src)
    tx, ty = C.mercator_tile(joined["lon"].to_numpy(), joined["lat"].to_numpy(), 9)
    assert (joined["tile_x"].to_numpy() == tx).all()
    assert (joined["cell_r7"].to_numpy()
            == C.hex_cell(joined["lon"].to_numpy(), joined["lat"].to_numpy(), 7)).all()


def test_vectorize_tiles_roundtrip(spark):
    """Raster->vector closes the loop: polygonized tile regions cover the
    pixels where images were placed, with exact pixel areas."""
    import numpy as np
    import pandas as pd
    from laji_pygeoapi_spark.kernels import codec, geom as G, wkb as W
    from laji_pygeoapi_spark.operators.tiling import vectorize_tiles
    # synthetic tile: black background + two bright rectangles + a donut
    img = np.zeros((256, 256, 3), dtype=np.uint8)
    img[40:80, 30:90] = 200            # 40x60 rect
    img[150:170, 200:220] = 180        # 20x20 rect
    img[100:140, 100:140] = 220        # donut outer
    img[110:130, 110:130] = 0          #   hole
    pdf = pd.DataFrame({"zoom": [8], "x": [140], "y": [70],
                        "tile_png": [codec.encode(img, "png")]})
    out = vectorize_tiles(spark.createDataFrame(pdf)).toPandas()
    areas = sorted(out["area_px"])
    assert areas == [400.0, 1600.0, 2400.0]
    donut = out[out["area_px"] == 1600.0].iloc[0]
    g = W.loads(bytes(donut["wkb"]))
    assert g[0] == "Polygon" and len(g[1]) == 2   # shell + hole
    # every polygon's lon/lat shell ring is CCW and inside the tile bounds
    from laji_pygeoapi_spark.kernels.cells import tile_bounds
    wbd, sbd, ebd, nbd = tile_bounds(8, 140, 70)
    for _, r in out.iterrows():
        shell = W.loads(bytes(r["wkb"]))[1][0]
        assert G.ring_area(shell) > 0             # CCW after the y flip
        assert shell[:, 0].min() >= wbd - 1e-9 and shell[:, 0].max() <= ebd + 1e-9
        assert shell[:, 1].min() >= sbd - 1e-9 and shell[:, 1].max() <= nbd + 1e-9


def test_pyramid_rollup_exact_quadrants(spark):
    """Zoom rollup: each parent quadrant equals the 2x-downsampled child;
    missing children leave black quadrants."""
    import numpy as np
    import pandas as pd
    from laji_pygeoapi_spark.kernels import codec
    from laji_pygeoapi_spark.operators.tiling import build_pyramid_level, TILE_SIZE
    def solid(rgb):
        img = np.zeros((TILE_SIZE, TILE_SIZE, 3), dtype=np.uint8)
        img[:] = rgb
        return codec.encode(img, "png")
    rows = [
        {"zoom": 9, "x": 280, "y": 140, "tile_png": solid((200, 0, 0))},   # TL
        {"zoom": 9, "x": 281, "y": 140, "tile_png": solid((0, 180, 0))},   # TR
        {"zoom": 9, "x": 280, "y": 141, "tile_png": solid((0, 0, 160))},   # BL
        # BR child missing
        {"zoom": 9, "x": 300, "y": 200, "tile_png": solid((9, 9, 9))},     # other parent
    ]
    out = build_pyramid_level(spark.createDataFrame(pd.DataFrame(rows))).toPandas()
    assert sorted(map(tuple, out[["zoom", "x", "y"]].values.tolist())) == \
        [(8, 140, 70), (8, 150, 100)]
    parent = out[(out["x"] == 140)].iloc[0]
    assert parent["n_children"] == 3
    img = codec.decode(bytes(parent["tile_png"]))
    h = TILE_SIZE // 2
    assert tuple(img[10, 10]) == (200, 0, 0)          # TL quadrant
    assert tuple(img[10, h + 10]) == (0, 180, 0)      # TR
    assert tuple(img[h + 10, 10]) == (0, 0, 160)      # BL
    assert tuple(img[h + 10, h + 10]) == (0, 0, 0)    # missing BR -> black


def test_get_tile_partition_pruned(spark, tmp_path):
    """Single-tile GET: the (zoom,x,y) equality predicates resolve as
    PartitionFilters over the hive-partitioned tile store — one tile read,
    store size irrelevant."""
    import os
    import pyspark.sql.functions as F
    from laji_pygeoapi_spark.operators.tiling import get_tile, materialize_tiles
    from laji_pygeoapi_spark.sources import fixtures
    imgs = fixtures.images_df(spark, 120, with_bytes=True)
    tiles = materialize_tiles(imgs, zoom=5)
    troot = str(tmp_path / "tiles")
    (tiles.withColumnRenamed("tile_png", "png").withColumnRenamed("png", "tile_png")
          .write.partitionBy("zoom", "x", "y").parquet(os.path.join(troot, "data")))
    one = tiles.select("zoom", "x", "y").first()
    got = get_tile(spark, troot, one["zoom"], one["x"], one["y"])
    rows = got.collect()
    assert len(rows) == 1
    assert rows[0]["x"] == one["x"] and rows[0]["y"] == one["y"]
    assert len(bytes(rows[0]["tile_png"])) > 0
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    seg = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "zoom" in seg and "x" in seg and "y" in seg, seg


def test_density_grid_and_render_roundtrip(spark):
    """Sparse pixel counts match a numpy-binned reference; the rendered
    grayscale decodes back to the exact scaled histogram."""
    import numpy as np
    import pandas as pd
    from laji_pygeoapi_spark.kernels import codec
    from laji_pygeoapi_spark.operators.tiling import density_grid, render_density_tiles
    rng = np.random.RandomState(11)
    n = 3000
    lon = rng.uniform(24.0, 25.5, n)
    lat = rng.uniform(60.0, 61.0, n)
    df = spark.createDataFrame(pd.DataFrame({"lon": lon, "lat": lat}))
    zoom, size = 9, 64
    grid = density_grid(df, zoom, size=size)
    rows = grid.collect()
    assert sum(r["cnt"] for r in rows) == n
    # numpy reference binning (same formulas)
    world = (1 << zoom) * size
    gx = np.clip(np.floor((lon + 180.0) / 360.0 * world), 0, world - 1).astype(np.int64)
    merc = np.arcsinh(np.tan(np.radians(lat)))
    gy = np.clip(np.floor((1.0 - merc / np.pi) / 2.0 * world), 0, world - 1).astype(np.int64)
    from collections import Counter
    want = Counter(zip(gx // size, gy // size, gx % size, gy % size))
    got = {(r["tile_x"], r["tile_y"], r["px"], r["py"]): r["cnt"] for r in rows}
    assert got == dict(want)
    # render: decoded gray equals the per-tile scaled histogram
    tiles = {(r["tile_x"], r["tile_y"]): r
             for r in render_density_tiles(grid, size=size).collect()}
    (tx, ty), tile = max(tiles.items(), key=lambda kv: kv[1]["n_points"])
    img = codec.decode(bytes(tile["tile_png"]))
    canvas = np.zeros((size, size))
    for (wtx, wty, px, py), c in want.items():
        if (wtx, wty) == (tx, ty):
            canvas[py, px] = c
    expect = np.minimum(255.0, canvas * (255.0 / canvas.max())).astype(np.uint8)
    assert np.array_equal(img[:, :, 0], expect)
    assert tile["max_cnt"] == int(canvas.max())


def test_count_pyramid_levels_consistent(spark):
    import pandas as pd
    from laji_pygeoapi_spark.operators.tiling import count_pyramid
    rng_rows = [{"doc_id": i, "lon": 19.5 + (i % 23) * 0.5,
                 "lat": 59.6 + (i % 17) * 0.6} for i in range(200)]
    out = count_pyramid(spark.createDataFrame(pd.DataFrame(rng_rows)),
                        zmin=5, zmax=8).collect()
    by_zoom = {}
    for r in out:
        by_zoom.setdefault(r["zoom"], {})[(r["x"], r["y"])] = r["cnt"]
    assert set(by_zoom) == {5, 6, 7, 8}
    # every zoom accounts for every point
    for z in by_zoom:
        assert sum(by_zoom[z].values()) == 200
    # each parent tile's count is the sum of its four children
    for (x, y), cnt in by_zoom[7].items():
        kids = sum(v for (cx, cy), v in by_zoom[8].items()
                   if cx >> 1 == x and cy >> 1 == y)
        assert kids == cnt
    # coarser zooms never have more tiles
    assert len(by_zoom[5]) <= len(by_zoom[6]) <= len(by_zoom[8])
