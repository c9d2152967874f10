"""Incremental aggregate maintenance equals full recompute, and the
multimodal binary column is skipped by metadata-only scans."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigquery_etl_spark.operators.incremental_agg import merge_agg_state, partial_agg

MEASURES = {
    "total": ("sum", "v"),
    "n": ("count", "v"),
    "lo": ("min", "v"),
    "hi": ("max", "v"),
}


def test_incremental_equals_full_recompute(spark):
    b1 = spark.createDataFrame([("a", 1.0), ("a", 2.0), ("b", 5.0)], "k string, v double")
    b2 = spark.createDataFrame([("a", 10.0), ("c", 7.0)], "k string, v double")
    b3 = spark.createDataFrame([("b", -1.0)], "k string, v double")

    state = None
    for b in (b1, b2, b3):
        state = merge_agg_state(state, partial_agg(b, ["k"], MEASURES), ["k"], MEASURES)

    full = partial_agg(b1.unionAll(b2).unionAll(b3), ["k"], MEASURES)
    got = sorted(map(tuple, state.collect()))
    want = sorted(map(tuple, full.collect()))
    assert got == want
    # derived avg at read time
    avg = {r.k: r.total / r.n for r in state.collect()}
    assert avg["a"] == (1 + 2 + 10) / 3


def test_media_metadata_scan_skips_binary(spark, tmp_path):
    from bigquery_etl_spark.operators.multimodal import make_fake_media, media_stats

    path = str(tmp_path / "media")
    make_fake_media(spark, n=24).write.mode("overwrite").parquet(path)
    media = spark.read.parquet(path)
    # media_stats aggregates avg content length, which needs the binary
    # column — use a metadata-only projection instead for the prune check
    meta_only = media.groupBy("kind").agg(F.avg("meta.duration_ms").alias("d"))
    plan = meta_only._jdf.queryExecution().toString()
    import re

    m = re.search(r"ReadSchema: struct<([^>]*)", plan)
    assert m and "content" not in m.group(1), plan
    # and the full stats query still works when it does need the bytes
    assert {r.kind for r in media_stats(media).collect()} == {"image", "audio", "video"}


def test_apply_change_feed_matches_recompute(spark):
    from bigquery_etl_spark.operators.incremental_agg import (
        apply_change_feed,
        partial_agg,
    )
    from bigquery_etl_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30), (4, "c", 40)],
        "k long, g string, v long",
    )
    # v2: delete 1, move 3 from b->a, update 4's value, insert 5 in new group d
    new = spark.createDataFrame(
        [(2, "a", 20), (3, "a", 30), (4, "c", 45), (5, "d", 50)],
        "k long, g string, v long",
    )
    state = partial_agg(
        old, ["g"], {"total": ("sum", "v"), "n_rows": ("count", "v")}
    )
    out = apply_change_feed(
        state, snapshot_diff(old, new, ["k"]), ["g"], {"total": "v"}, "n_rows"
    )
    got = sorted(map(tuple, out.select("g", "total", "n_rows").collect()))
    # recompute from v2: a={2:20,3:30}, b gone (count 0 -> removed), c={4:45}, d={5:50}
    assert got == [("a", 50, 2), ("c", 45, 1), ("d", 50, 1)]


def test_apply_change_feed_rejects_unknown_change_type(spark):
    import pytest

    from bigquery_etl_spark.operators.incremental_agg import apply_change_feed

    state = spark.createDataFrame([("a", 10, 1)], "g string, total long, n_rows long")
    bad = spark.createDataFrame(
        [("a", 5, "update")],  # Debezium-style single 'update' row
        "g string, v long, _change_type string",
    )
    out = apply_change_feed(state, bad, ["g"], {"total": "v"}, "n_rows")
    with pytest.raises(Exception, match="unknown _change_type"):
        out.collect()


def test_apply_change_feed_null_sum_exact(spark):
    """ADVICE r3: a group whose surviving measure rows are ALL NULL must
    be maintained as SUM = NULL (the full-recompute answer), not 0 —
    the __nn companion tracks net non-NULL contributions."""
    from bigquery_etl_spark.operators.incremental_agg import apply_change_feed
    from bigquery_etl_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "a", None), (3, "b", 30)],
        "k long, g string, v long",
    )
    # v2: delete the only non-NULL 'a' row -> a's recomputed SUM is NULL;
    # add another all-NULL group d
    new = spark.createDataFrame(
        [(2, "a", None), (3, "b", 30), (5, "d", None)],
        "k long, g string, v long",
    )
    state = old.groupBy("g").agg(
        F.sum("v").alias("total"),
        F.count("v").cast("bigint").alias("total__nn"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    out = apply_change_feed(
        state, snapshot_diff(old, new, ["k"]), ["g"], {"total": "v"}, "n_rows"
    )
    got = {r.g: (r.total, r.n_rows) for r in out.collect()}
    # full recompute over new
    want = {
        r.g: (r.total, r.n_rows)
        for r in new.groupBy("g")
        .agg(F.sum("v").alias("total"), F.count(F.lit(1)).alias("n_rows"))
        .collect()
    }
    assert got == want
    assert got["a"] == (None, 1) and got["d"] == (None, 1)


def test_apply_change_feed_seeds_missing_nn(spark):
    """A state built without __nn bookkeeping still folds (approximate
    seeding documented in apply_change_feed)."""
    from bigquery_etl_spark.operators.incremental_agg import apply_change_feed

    state = spark.createDataFrame(
        [("a", 10, 1)], "g string, total long, n_rows long"
    )
    batch = spark.createDataFrame(
        [("a", 5, "insert")], "g string, v long, _change_type string"
    )
    out = apply_change_feed(state, batch, ["g"], {"total": "v"}, "n_rows")
    row = out.collect()[0]
    assert (row.g, row.total, row.n_rows) == ("a", 15, 2)
