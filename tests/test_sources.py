import json

from node_etl_spark.context import Context
from node_etl_spark.operators import Nothing
from node_etl_spark.sources import (
    CsvSource,
    JsonSource,
    NdjsonSource,
    PagedRestSource,
    ParquetSource,
    folder_source,
)

CTX = Context()


def test_parquet_source_with_template(spark, sf_dir):
    src = ParquetSource("$DATA/region.parquet")
    df = src.load(spark, Context(config={"DATA": sf_dir}))
    assert df.count() == 5


def test_csv_roundtrip(spark, tmp_path):
    p = tmp_path / "data.csv"
    # reference ParserCSV knobs: delimiter/escape/headers; escape
    # applies to quote chars inside quoted fields (fast-csv semantics)
    p.write_text('id;name\n1;alpha\n2;"be;\\"ta"\n')
    df = CsvSource(str(p), delimiter=";", escape="\\", headers=True).load(spark, CTX)
    rows = {(int(r.id), r.name) for r in df.collect()}
    assert rows == {(1, "alpha"), (2, 'be;"ta')}


def test_json_root_node(spark, tmp_path):
    # reference rootNode "data.*" (JSONStream path)
    p = tmp_path / "doc.json"
    p.write_text(json.dumps({"meta": 1, "data": [{"id": 1, "v": "x"}, {"id": 2, "v": "y"}]}))
    df = JsonSource(str(p), root_node="data.*").load(spark, CTX)
    assert {(r.id, r.v) for r in df.collect()} == {(1, "x"), (2, "y")}


def test_ndjson_permissive_skips_bad_lines(spark, tmp_path):
    # reference ReaderJSONS warn-and-skip (job-reader-jsons.js:41-44)
    p = tmp_path / "rows.jsons"
    p.write_text('{"id": 1}\nNOT-JSON\n{"id": 3}\n')
    df = NdjsonSource(str(p), schema="id bigint").load(spark, CTX)
    assert sorted(r.id for r in df.collect() if r.id is not None) == [1, 3]


def test_folder_glob_with_filter(spark, tmp_path):
    # reference ReaderFolder glob + filename predicate
    (tmp_path / "a-keep.jsons").write_text('{"v": 1}\n')
    (tmp_path / "b-keep.jsons").write_text('{"v": 2}\n')
    (tmp_path / "c-skip.txt").write_text('{"v": 99}\n')
    src = folder_source(str(tmp_path), fmt="json", path_filter_glob="*-keep.jsons")
    df = src.load(spark, CTX)
    assert sorted(r.v for r in df.collect()) == [1, 2]


def test_paged_rest_source(spark):
    # reference ReaderPaged state machine: offset/limit pages, stop on
    # empty page, totalRows short-circuit
    pages = {
        0: {"total": 5, "data": [{"id": i} for i in range(3)]},
        3: {"total": 5, "data": [{"id": i} for i in range(3, 5)]},
        5: {"total": 5, "data": []},
    }
    calls = []

    def fake_fetch(url, req_options=None):
        offset = int(url.split("offset=")[1].split("&")[0])
        calls.append(offset)
        return json.dumps(pages.get(offset, {"total": 5, "data": []})).encode()

    src = PagedRestSource(
        "http://api/x?offset={%offset%}&limit={%limit%}",
        rows_path="data",
        total_path="total",
        fetch=fake_fetch,
        retry_wait_s=0.0,
        name="paged",
    )

    def url_gen(template, state):
        from node_etl_spark.context import render_template

        state.setdefault("limit", 3)
        return render_template(
            template, {"offset": state["page"] * 3, "limit": 3}
        )

    src.url_gen = url_gen
    ctx = Context()
    df = src.load(spark, ctx)
    assert sorted(r.id for r in df.collect()) == [0, 1, 2, 3, 4]
    assert ctx.state["paged"]["total_rows_processed"] == 5
    assert calls == [0, 3]  # stopped via totalRows, no extra page fetch


def test_noop_drain(spark):
    Nothing.drain(spark.range(10).toDF("v"))


def test_xml_roundtrip(spark, tmp_path):
    # reference ParserXML xmlNode == rowTag (job-parser-xml.js:15-17)
    from node_etl_spark.sources import XmlSink, XmlSource

    df = spark.createDataFrame([(1, "alpha"), (2, "beta")], "id bigint, name string")
    dest = str(tmp_path / "xml_out")
    XmlSink(dest, row_tag="item").write(df, CTX)
    back = XmlSource(dest, row_tag="item").load(spark, CTX)
    assert {(r.id, r.name) for r in back.collect()} == {(1, "alpha"), (2, "beta")}


def test_parallel_paged_rest_datasource(spark, tmp_path):
    # partition-parallel paged scan: page files behind file:// URLs,
    # 7 pages of 4 rows (last short) split into 3-page task ranges
    import json as _json

    from node_etl_spark.sources.paged import (
        PagedRestReader,
        register_paged_rest,
    )

    total, size = 26, 4
    rows = [{"id": i, "name": f"r{i}"} for i in range(total)]
    for p in range(7):
        (tmp_path / f"page_{p}.json").write_text(
            _json.dumps({"data": rows[p * size : (p + 1) * size]})
        )
    register_paged_rest(spark)
    df = (
        spark.read.format("paged_rest")
        .schema("id long, name string")
        .option("url_template", f"file://{tmp_path}/page_{{%page%}}.json")
        .option("total_rows", total)
        .option("page_size", size)
        .option("pages_per_partition", 3)
        .load()
    )
    got = sorted((r.id, r.name) for r in df.collect())
    assert got == [(i, f"r{i}") for i in range(total)]
    # the page space really is split into parallel ranges
    reader = PagedRestReader(
        df.schema,
        {
            "url_template": "x",
            "total_rows": str(total),
            "page_size": str(size),
            "pages_per_partition": "3",
        },
    )
    parts = reader.partitions()
    assert [(p.start_page, p.end_page) for p in parts] == [(0, 3), (3, 6), (6, 7)]


def test_fetch_details_enrichment(spark, tmp_path):
    # API-case JoinDetail: per-row URL fetch executor-side, NULL on
    # fetch error (reference pass-through-on-error), payload parsed
    # downstream with from_json
    import json as _json

    from pyspark.sql import functions as F

    from node_etl_spark.sources.paged import fetch_details

    for key in (1, 2):  # row 3 has no file -> fetch error -> NULL
        (tmp_path / f"detail_{key}.json").write_text(
            _json.dumps({"score": key * 10})
        )
    df = spark.createDataFrame([(1,), (2,), (3,)], "id int").withColumn(
        "url", F.concat(F.lit(f"file://{tmp_path}/detail_"), "id", F.lit(".json"))
    )
    out = fetch_details(df, "url", max_per_second=1000).withColumn(
        "score", F.from_json("payload", "score INT").getField("score")
    )
    got = {r.id: r.score for r in out.collect()}
    assert got == {1: 10, 2: 20, 3: None}
