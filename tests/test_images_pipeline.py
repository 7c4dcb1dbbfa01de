"""Image-table fidelity pipeline (FIXTURES F1/F7, north-rule invariant):
decoded-pixel PSNR >= 40 dB (lossy) / exact (lossless) + caption equality
after a full index -> join -> transcode round trip; tile assignment parity
against a naive pandas oracle."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geomesa_spark.operators.multimodal import (avg_hash, decode_stats,
                                                transcode, verify_fidelity)
from geomesa_spark.operators.pip_join import pip_join_broadcast
from geomesa_spark.operators.tiling import tile_pyramid
from geomesa_spark.sources.images import (decode_image, encode_image, psnr,
                                          synthetic_images)

N = 400


@pytest.fixture(scope="module")
def images(spark):
    return synthetic_images(spark, N).cache()


class TestCodec:
    def test_png_lossless(self):
        b = encode_image(7, 32, 16, "png")
        px = decode_image(b)
        assert px.shape == (16, 32, 3)
        b2 = encode_image(7, 32, 16, "png")
        assert b == b2  # deterministic

    def test_jpeg_psnr_above_bar(self):
        from geomesa_spark.sources.images import _pixels
        raw = _pixels(9, 64, 64)
        lossy = decode_image(encode_image(9, 64, 64, "jpeg"))
        val = psnr(raw, lossy)
        assert val >= 40.0, val
        assert val < 60.0  # actually lossy, not accidentally exact


class TestImageTable:
    def test_schema_matches_input_hint(self, images):
        types = dict(images.dtypes)
        assert types["image_id"] == "string"
        assert types["bytes"] == "binary"
        assert types["w"] == "int" and types["h"] == "int"
        assert types["fmt"] == "string" and types["caption"] == "string"
        assert types["phash"] == "bigint"

    def test_decode_stats(self, images):
        out = decode_stats(images.limit(50))
        rows = out.select("mean_r", "std_lum").collect()
        assert all(0 <= r["mean_r"] <= 255 for r in rows)
        assert all(r["std_lum"] > 0 for r in rows)  # random pixels: nonzero variance

    def test_avg_hash_deterministic(self, images):
        h1 = {r["image_id"]: r["ahash"] for r in avg_hash(images.limit(30)).collect()}
        h2 = {r["image_id"]: r["ahash"] for r in avg_hash(images.limit(30)).collect()}
        assert h1 == h2 and len(set(h1.values())) > 1


class TestFidelityPipeline:
    def test_round_trip_psnr_and_captions(self, spark, images, tmp_path):
        # full pipeline: write indexed -> read -> spatial join -> transcode ->
        # verify per-row fidelity against the source table
        from geomesa_spark.sources.layout import read_indexed, write_indexed
        path = str(tmp_path / "imgs")
        write_indexed(images, path, period="week", id_col="image_id")
        table = read_indexed(spark, path)

        polys = [("world_q1", "POLYGON ((-180 -90, 0 -90, 0 0, -180 0, -180 -90))"),
                 ("world_q3", "POLYGON ((0 0, 180 0, 180 90, 0 90, 0 0))")]
        joined = pip_join_broadcast(table, polys)
        processed = transcode(joined, "jpeg")

        fid = verify_fidelity(images, processed).cache()
        n = fid.count()
        assert n > 50  # two quadrants of a uniform sphere
        bad = fid.where(~F.col("fidelity_ok")).collect()
        assert bad == [], bad[:5]
        # lossy rows are genuinely lossy (finite PSNR), all >= 40
        finite = fid.where(F.col("psnr_db") < 1e9).select(F.min("psnr_db")).collect()[0][0]
        assert finite is None or finite >= 40.0
        fid.unpersist()

    def test_tile_assignment_matches_pandas_oracle(self, spark, images):
        got = (tile_pyramid(images, [3], tile_px=256)
               .select("tx", "ty", "px", "py", "cnt").toPandas()
               .sort_values(["tx", "ty", "px", "py"]).reset_index(drop=True))

        pdf = images.select("lon", "lat").toPandas()
        n_px = (1 << 3) * 256
        gx = np.minimum(np.floor((pdf.lon + 180.0) / 360.0 * n_px), n_px - 1).astype(np.int64)
        gy = np.minimum(np.floor((pdf.lat + 90.0) / 180.0 * n_px), n_px - 1).astype(np.int64)
        want = (pd.DataFrame({"tx": gx // 256, "ty": gy // 256,
                              "px": gx % 256, "py": gy % 256})
                .groupby(["tx", "ty", "px", "py"]).size().rename("cnt").reset_index()
                .sort_values(["tx", "ty", "px", "py"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got.astype("int64"), want.astype("int64"), check_dtype=False)


def test_density_polygons_matches_bruteforce(spark):
    """Polygon renderer (grid x PIP composition) vs per-pixel numpy truth."""
    import numpy as np

    from geomesa_spark.geom import algos, wkt
    from geomesa_spark.operators.tiling import density_polygons

    polys = [
        ("diamond", "POLYGON ((44 25, 46 21, 48 25, 46 29, 44 25))"),
        ("tri", "POLYGON ((41 21, 44 21, 41 24, 41 21))"),
    ]
    env = (40.0, 20.0, 50.0, 30.0)
    W = H = 64
    out = {(r.px, r.py): r.weight for r in
           density_polygons(spark, polys, env, W, H,
                            weights={"diamond": 2.0, "tri": 1.0}).collect()}
    # brute force: classify every pixel center against each polygon
    xs = env[0] + (np.arange(W) + 0.5) * (env[2] - env[0]) / W
    ys = env[1] + (np.arange(H) + 0.5) * (env[3] - env[1]) / H
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    want = np.zeros((W, H))
    for pid, w in (("diamond", 2.0), ("tri", 1.0)):
        g = wkt.wkt_loads(dict(polys)[pid])
        m = algos.points_intersect(gx.ravel(), gy.ravel(), g).reshape(W, H)
        want += m * w
    for i in range(W):
        for j in range(H):
            assert out.get((i, j), 0.0) == want[i, j], (i, j)
    assert sum(1 for v in out.values() if v > 0) > 50


def test_header_meta_native_parse(spark):
    """with_header_meta parses fmt/w/h from the GSI1 container with pure
    Catalyst expressions (no decode): every parsed field must equal the
    stored column, and the projection must stay JVM-side (no
    ArrowEvalPython introduced by the parse itself)."""
    from geomesa_spark.sources.images import (synthetic_images,
                                              with_header_meta)
    imgs = synthetic_images(spark, 300)
    meta = with_header_meta(imgs)
    assert meta.where(
        "NOT hdr_ok OR hdr_fmt != fmt OR hdr_w != w OR hdr_h != h"
    ).count() == 0
    # bytes generation is one pandas UDF; the header parse must not add
    # another python stage
    base_plan = imgs._jdf.queryExecution().executedPlan().toString()
    meta_plan = meta._jdf.queryExecution().executedPlan().toString()
    assert meta_plan.count("EvalPython") == base_plan.count("EvalPython")


class TestVideoAudioPlumbing:
    """frame_sample / audio_features: real mapInPandas fan-out plumbing
    over the deterministic GSV1/GSA1 containers (real codecs gated)."""

    def test_video_codec_round_trip(self):
        from geomesa_spark.sources.images import decode_image
        from geomesa_spark.sources.media import (decode_video_frames,
                                                 encode_video)
        blob = encode_video(7, 5, w=8, h=6)
        frames = decode_video_frames(blob)
        assert len(frames) == 5
        px = decode_image(frames[3])
        assert px.shape == (6, 8, 3)
        # frame 3 is independently reproducible (seed*1000 + idx)
        from geomesa_spark.sources.images import encode_image
        assert frames[3] == encode_image(7003, 8, 6, "png")

    def test_foreign_video_gated(self):
        import pytest as _pytest
        from geomesa_spark.sources.media import decode_video_frames
        with _pytest.raises(NotImplementedError, match="ffmpeg"):
            decode_video_frames(b"\x00\x00\x00\x20ftypmp42")

    def test_frame_sample_fanout(self, spark):
        from geomesa_spark.operators.multimodal import frame_sample
        from geomesa_spark.sources.media import synthetic_videos
        vids = synthetic_videos(spark, 20)
        out = frame_sample(vids, every_n=3)
        assert out.columns == ["video_id", "frame_idx", "frame_bytes"]
        got = {(r.video_id, r.frame_idx) for r in out.collect()}
        want = set()
        for r in vids.select("video_id", "n_frames").collect():
            for i in range(0, r.n_frames, 3):
                want.add((r.video_id, i))
        assert got == want
        # each sampled frame is a decodable image blob
        from geomesa_spark.sources.images import decode_image
        one = out.where("video_id = 1 AND frame_idx = 0").collect()[0]
        assert decode_image(bytes(one.frame_bytes)).ndim == 3

    def test_audio_features_match_numpy(self, spark):
        import numpy as np
        from geomesa_spark.operators.multimodal import audio_features
        from geomesa_spark.sources.media import (decode_audio,
                                                 synthetic_audio)
        aud = synthetic_audio(spark, 10)
        rows = {r.audio_id: r for r in audio_features(aud).collect()}
        assert len(rows) == 10
        for r in aud.collect():
            rate, x = decode_audio(bytes(r.bytes))
            got = rows[r.audio_id]
            assert got.sample_rate == rate
            assert got.n_samples == len(x)
            assert got.duration_ms == len(x) * 1000 // rate
            assert got.rms_milli == int(float(np.sqrt(np.mean(x * x))) * 1000)
            zc = int(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1])))
            assert got.zero_crossings == zc
