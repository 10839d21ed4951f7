"""UDTF framework demo: frame_explode flattens array-or-object frames in
SQL, agreeing with the normalizers' from_json+explode path."""

from liq_stream_spark.functions.udtf_demo import register_udtfs


def test_frame_explode_udtf(spark):
    register_udtfs(spark)
    spark.createDataFrame(
        [
            ('[{"e":"a"},{"e":"b"}]',),
            ('{"e":"solo"}',),
            ("ping",),
            (None,),
        ],
        "value string",
    ).createOrReplaceTempView("frames_t")
    got = spark.sql(
        "SELECT fe.event_json, fe.idx FROM frames_t, "
        "LATERAL frame_explode(value) fe ORDER BY fe.event_json"
    ).collect()
    assert [(r["event_json"], r["idx"]) for r in got] == [
        ('{"e":"a"}', 0),
        ('{"e":"b"}', 1),
        ('{"e":"solo"}', 0),
    ]
