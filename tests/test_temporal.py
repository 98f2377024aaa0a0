"""asof_join: hand-built edge cases + brute-force twin on the corpus."""

from pyspark.sql import functions as F

from cianparser_spark.ops.temporal import asof_join

SF = "/root/testdata/sf0.001"


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_asof_basic_backward_and_nulls(spark):
    left = _df(spark, [(1, 10, "a"), (1, 25, "b"), (2, 5, "c")],
               "k long, ts long, lbl string")
    right = _df(spark, [(1, 8, 100), (1, 20, 200), (2, 9, 300)],
                "k long, ts long, rid long")
    out = {(r["k"], r["ts"]): r["r_rid"]
           for r in asof_join(left, right, ["k"], "ts", ["rid"]).collect()}
    assert out == {(1, 10): 100,   # latest right ts<=10 is 8
                   (1, 25): 200,   # latest right ts<=25 is 20
                   (2, 5): None}   # no right row at or before 5


def test_asof_equal_ts_is_inclusive(spark):
    left = _df(spark, [(1, 10)], "k long, ts long")
    right = _df(spark, [(1, 10, 7)], "k long, ts long, rid long")
    got = asof_join(left, right, ["k"], "ts", ["rid"]).collect()
    assert got[0]["r_rid"] == 7  # right row AT the left ts matches


def test_asof_tiebreak_largest_wins(spark):
    left = _df(spark, [(1, 10)], "k long, ts long")
    right = _df(spark, [(1, 10, 1), (1, 10, 9), (1, 10, 4)],
                "k long, ts long, rid long")
    got = asof_join(left, right, ["k"], "ts", ["rid"],
                    tiebreak_col="rid").collect()
    assert got[0]["r_rid"] == 9


def test_asof_matches_bruteforce_on_corpus(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id")
    got = {(r["user_id"], r["event_id"]): r["r_event_id"]
           for r in asof_join(clicks, views, ["user_id"], "ts",
                              ["event_id"], tiebreak_col="event_id").collect()}
    # brute force in Python
    vrows = sorted(((r["user_id"], r["ts"], r["event_id"])
                    for r in views.collect()), key=lambda t: (t[0], t[1], t[2]))
    want = {}
    for r in clicks.collect():
        best = None
        for (u, ts, vid) in vrows:
            if u == r["user_id"] and ts <= r["ts"]:
                best = vid
        want[(r["user_id"], r["event_id"])] = best
    assert got == want and len(got) > 100
