"""Streaming windowed agg == batch windowed agg on bounded input; CLI smoke."""

import subprocess
import sys

from pycuda_raster_spark.streaming.windows import (
    run_windowed_stream,
    windowed_event_counts,
)

SF_DIR = "/root/testdata/sf0.001"


def test_streaming_equals_batch_windowed_agg(spark, tmp_path):
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    batch = {
        (r.win_start, r.event_type): (r.n, r.total)
        for r in windowed_event_counts(events).collect()
    }
    src = str(tmp_path / "ev")
    events.write.parquet(src)
    got = {
        (r.win_start, r.event_type): (r.n, r.total)
        for r in run_windowed_stream(
            spark, src, str(tmp_path / "ckpt"), query_name="we_test"
        ).collect()
    }
    assert got == batch and len(got) > 0


def test_cli_multi_output(spark, tmp_path):
    from pycuda_raster_spark.fixtures import CorpusSpec, images_df

    src = str(tmp_path / "imgs")
    images_df(spark, CorpusSpec(n_images=6, w=24, h=24)).write.parquet(src)
    out_s, out_h = str(tmp_path / "slope"), str(tmp_path / "hs")
    r = subprocess.run(
        [sys.executable, "-m", "pycuda_raster_spark", src,
         out_s, "slope", out_h, "hillshade", "--cores=4"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert r.returncode == 0, r.stderr[-1500:]
    s = spark.read.parquet(out_s)
    assert s.count() == 6 and "slope" in s.columns and "hillshade" not in s.columns
    h = spark.read.parquet(out_h)
    assert h.count() == 6 and "hillshade" in h.columns
