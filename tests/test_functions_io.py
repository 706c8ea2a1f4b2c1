"""Unit tests: scalar function library (§2.8/§2.9), histogram algebra,
ordered-collect legacy semantics (A5), host-variant join (J13),
schema declaration/evolution (§1.3), JSON/CSV sources (S5/S7)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from docker_etl_spark.functions import (
    bug_id_from_bugzilla_url,
    extract_array,
    hist_count_at0,
    hist_enum_nz,
    hist_extract,
    hist_sum_maps,
    host_variants,
    truncate_version,
    url_host,
    url_parse,
)
from docker_etl_spark.operators.aggregates import (
    group_percentiles,
    ordered_limited_collect,
)
from docker_etl_spark.sources.io import load_table, struct_type_from_fields


def one(spark, value, fn):
    return spark.createDataFrame([(value,)], "v string").select(fn(F.col("v")).alias("o")).first().o


def test_url_parse_components(spark):
    r = one(spark, "https://www.example.com/path/x?q=1#frag", url_parse)
    assert r.protocol == "https"
    assert r.host == "www.example.com"
    assert r.path == "/path/x"
    assert r.query == "q=1"
    assert r.fragment == "frag"


def test_url_host_strip_www(spark):
    df = spark.createDataFrame(
        [("https://www.mozilla.org/a",), ("https://m.site.io/b",)], "v string"
    )
    rows = df.select(
        url_host("v").alias("h"), url_host("v", strip_www=True).alias("s")
    ).collect()
    assert (rows[0].h, rows[0].s) == ("www.mozilla.org", "mozilla.org")
    assert (rows[1].h, rows[1].s) == ("m.site.io", "m.site.io")


def test_bug_id_from_bugzilla_url(spark):
    assert one(spark, "https://bugzilla.mozilla.org/show_bug.cgi?id=18345", bug_id_from_bugzilla_url) == 18345
    assert one(spark, "https://example.com/nope", bug_id_from_bugzilla_url) is None


def test_truncate_version(spark):
    assert one(spark, "109.0.1", truncate_version) == 109.0
    df = spark.createDataFrame([("109.5.1",)], "v string")
    assert df.select(truncate_version("v", "minor").alias("o")).first().o == 109.5
    assert one(spark, "garbage", truncate_version) is None


def test_extract_array_scalar_fallback(spark):
    """EXTRACT_ARRAY routine: JSON array → elements; scalar → 1-elem."""
    df = spark.createDataFrame([('["a","b"]',), ('"solo"',), (None,)], "v string")
    rows = df.select(extract_array("v").alias("a")).collect()
    assert rows[0].a == ["a", "b"]
    assert rows[1].a == ["solo"]
    assert rows[2].a is None


def test_histogram_algebra(spark):
    payload = '{"values": {"0": 3, "2": 5, "7": 0}}'
    df = spark.createDataFrame([(payload,)], "v string").select(
        hist_extract("v").alias("h")
    )
    r = df.select(
        hist_count_at0("h").alias("at0"), hist_enum_nz("h").alias("nz")
    ).first()
    assert r.at0 == 3
    assert [(e.key, e.value) for e in r.nz] == [(0, 3), (2, 5)]

    sums = spark.createDataFrame([(1,)], "i int").select(
        hist_sum_maps(
            F.array(
                F.create_map(F.lit(0), F.lit(1).cast("bigint"), F.lit(3), F.lit(2).cast("bigint")).cast("map<int,bigint>"),
                F.create_map(F.lit(3), F.lit(5).cast("bigint"), F.lit(9), F.lit(1).cast("bigint")).cast("map<int,bigint>"),
            )
        ).alias("m")
    ).first()
    assert dict(sums.m) == {0: 1, 3: 7, 9: 1}


def test_ordered_collect_legacy_nulls_mode(spark):
    """A5: the reference's deliberately-misaligned legacy mode keeps
    NULLs (consuming limit slots); aligned mode filters them first
    (out_of_date_details.sql:133-140)."""
    rows = [(1, i, None if i % 2 else float(i)) for i in range(6)]
    df = spark.createDataFrame(rows, "k int, ord int, v double")
    aligned = ordered_limited_collect(
        df, ["k"], ["ord"], "v", limit=3, descending=True, ignore_nulls=True
    ).first()
    legacy = ordered_limited_collect(
        df, ["k"], ["ord"], "v", limit=3, descending=True, ignore_nulls=False
    ).first()
    assert aligned["values"] == [4.0, 2.0, 0.0]
    assert legacy["values"] == [None, 4.0, None]


def test_approx_percentile_close_to_exact(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    exact = group_percentiles(li, ["l_returnflag"], "l_quantity", [0.5]).collect()
    approx = group_percentiles(
        li, ["l_returnflag"], "l_quantity", [0.5], approximate=True
    ).collect()
    e = {r.l_returnflag: r.percentiles[0] for r in exact}
    a = {r.l_returnflag: r.percentiles[0] for r in approx}
    for k in e:
        assert abs(e[k] - a[k]) <= 2.0, (k, e[k], a[k])


def test_host_variant_expansion_join(spark):
    """J13: bug hosts match site hosts under {host, www.host, m.host}."""
    bugs = spark.createDataFrame(
        [(1, "example.com"), (2, "other.net")], "bug int, host string"
    )
    sites = spark.createDataFrame(
        [("www.example.com", 10), ("m.other.net", 20), ("unrelated.org", 30)],
        "site_host string, rank int",
    )
    expanded = bugs.select(
        "bug", F.explode(host_variants("host")).alias("variant")
    )
    joined = expanded.join(sites, expanded["variant"] == sites["site_host"])
    got = {(r.bug, r.rank) for r in joined.collect()}
    assert got == {(1, 10), (2, 20)}


def test_struct_type_from_fields_and_evolution(spark, tmp_path):
    """§1.3: declared schemas + additive evolution via mergeSchema."""
    schema = struct_type_from_fields(
        [("id", "bigint", False), ("name", "string", True)]
    )
    assert [f.name for f in schema.fields] == ["id", "name"]
    p = str(tmp_path / "evolve")
    spark.createDataFrame([(1, "a")], schema).write.parquet(p)
    spark.createDataFrame(
        [(2, "b", 9.5)], "id bigint, name string, score double"
    ).write.mode("append").parquet(p)
    merged = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(merged.columns) == {"id", "name", "score"}
    rows = {r.id: r.score for r in merged.collect()}
    assert rows[1] is None and rows[2] == 9.5


def test_json_and_csv_sources_roundtrip(spark, tmp_path):
    """S5 (JSON lines) + S7 (CSV with explicit schema) + D4 truncate."""
    df = spark.createDataFrame([(1, "x"), (2, "y")], "id bigint, s string")
    jp, cp = str(tmp_path / "j"), str(tmp_path / "c")
    df.write.json(jp)
    df.write.option("header", True).csv(cp)
    jback = spark.read.json(jp)
    assert {(r.id, r.s) for r in jback.collect()} == {(1, "x"), (2, "y")}
    cback = spark.read.schema("id bigint, s string").option("header", True).csv(cp)
    assert {(r.id, r.s) for r in cback.collect()} == {(1, "x"), (2, "y")}
    # WRITE_TRUNCATE disposition
    spark.createDataFrame([(9, "z")], "id bigint, s string").write.mode(
        "overwrite"
    ).json(jp)
    assert [(r.id, r.s) for r in spark.read.json(jp).collect()] == [(9, "z")]


def test_schema_new_fields_and_conform(spark):
    """§1.3 / U4: additive schema diff + live conform — the
    _get_new_fields/add_table_fields pair (bqhelpers.py:469-555)."""
    from pyspark.sql.types import StructType

    from docker_etl_spark.sources.io import conform_to_schema, schema_new_fields

    declared = StructType.fromDDL(
        "id BIGINT, name STRING, score DOUBLE, meta STRUCT<a: INT, b: STRING>"
    )
    actual = StructType.fromDDL("id BIGINT, name STRING, meta STRUCT<a: INT>")
    diff = schema_new_fields(declared, actual)
    assert [(p, f.dataType.simpleString()) for p, f in diff] == [
        ("score", "double"),
        ("meta.b", "string"),
    ]

    df = spark.createDataFrame([(1, "x")], "id BIGINT, name STRING")
    out = conform_to_schema(
        df, StructType.fromDDL("id BIGINT, name STRING, score DOUBLE")
    )
    assert out.columns == ["id", "name", "score"]
    assert out.first()["score"] is None
    # idempotent on an already-conformed frame
    assert conform_to_schema(out, out.schema).columns == out.columns


def test_parse_user_story_reference_semantics(spark):
    """Twin of the reference's parse_user_story contract
    (etl/bugzilla.py:407-433): first-colon split, repeated keys
    accumulate in line order, no-colon/blank lines skipped, empty
    key kept, None/empty input -> empty map."""
    from docker_etl_spark.functions.scalars import parse_user_story

    df = spark.createDataFrame(
        [
            (1, "platform:win\nimpact:high\nnote:a:b:c\n\nskip me\nimpact:low\n:anon"),
            (2, ""),
            (3, None),
            (4, "windows:\r\nmac:ok"),
        ],
        "id int, story string",
    )
    rows = {r.id: r.m for r in df.select("id", parse_user_story("story").alias("m")).collect()}
    assert rows[1] == {
        "platform": ["win"],
        "impact": ["high", "low"],
        "note": ["a:b:c"],
        "": ["anon"],
    }
    assert rows[2] == {}
    assert rows[3] == {}
    assert rows[4] == {"windows": [""], "mac": ["ok"]}  # \r\n split, empty value


def test_conform_nested_additive_evolution(spark, tmp_path):
    """Live nested migration (etl/update_schema.py:474-676): adding
    a.b.c-style fields — including inside array-of-struct elements —
    yields typed NULLs where parents exist, preserves NULL parents,
    keeps existing values, and drops undeclared columns."""
    from pyspark.sql import Row
    from pyspark.sql.types import StructType

    from docker_etl_spark.sources.io import conform_to_schema

    old = StructType.fromDDL(
        "id BIGINT, meta STRUCT<a: BIGINT, src: STRUCT<path: STRING>>, "
        "runs ARRAY<STRUCT<n: BIGINT>>, legacy STRING"
    )
    p = str(tmp_path / "t.parquet")
    spark.createDataFrame(
        [
            (1, Row(a=7, src=Row(path="x")), [Row(n=1), Row(n=2)], "drop-me"),
            (2, None, None, "drop-me-too"),
        ],
        old,
    ).write.parquet(p)

    declared = StructType.fromDDL(
        "id BIGINT, meta STRUCT<a: BIGINT, b: STRING, "
        "src: STRUCT<path: STRING, format: STRING>>, "
        "runs ARRAY<STRUCT<n: BIGINT, tag: STRING>>, extra DOUBLE"
    )
    out = conform_to_schema(spark.read.parquet(p), declared)
    assert out.columns == ["id", "meta", "runs", "extra"]
    assert out.schema["meta"].dataType == declared["meta"].dataType
    assert out.schema["runs"].dataType == declared["runs"].dataType
    rows = {r.id: r for r in out.collect()}
    r1 = rows[1]
    assert r1.meta.a == 7 and r1.meta.b is None
    assert r1.meta.src.path == "x" and r1.meta.src.format is None
    assert [(e.n, e.tag) for e in r1.runs] == [(1, None), (2, None)]
    assert r1.extra is None
    r2 = rows[2]
    assert r2.meta is None and r2.runs is None  # NULL parents stay NULL

    # round-trip: writing and re-conforming is a no-op
    again = conform_to_schema(out, declared)
    assert again.schema == out.schema
