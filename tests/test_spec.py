import json

from node_etl_spark.pipeline import Catalog
from node_etl_spark.spec import from_spec, op_from_spec, to_spec


def test_spec_filter_map_reduce(spark, sf_dir):
    spec = {
        "name": "orders-by-status",
        "chain": [
            {"op": "parquet", "path": f"{sf_dir}/orders.parquet"},
            {"op": "filter", "expr": "o_totalprice > 1000"},
            {"op": "reducer", "keys": ["o_orderstatus"],
             "aggs": {"n": "count(1)"}},
        ],
    }
    out = from_spec(spec).run(spark)
    rows = {r.o_orderstatus: r.n for r in out.collect()}
    assert sum(rows.values()) > 0


def test_spec_json_roundtrip(spark, sf_dir):
    # spec documents survive JSON serialization (reference job.js:49-64)
    spec = {
        "name": "p",
        "chain": [
            {"op": "parquet", "path": f"{sf_dir}/region.parquet"},
            {"op": "sorter", "by": ["r_regionkey"], "limit": 3},
        ],
    }
    pipe = from_spec(json.loads(json.dumps(spec)))
    assert to_spec(pipe) == spec
    assert len(pipe.run(spark).collect()) == 3


def test_spec_catalog_refs(spark, sf_dir):
    # by-name references resolve through the catalog; unresolved -> error
    cat = Catalog()
    src = op_from_spec(
        {"op": "parquet", "path": f"{sf_dir}/nation.parquet", "name": "nation-src"}
    )
    cat.save(src)
    pipe = from_spec(
        {"name": "p", "chain": [{"op": "ref", "name": "nation-src"},
                                {"op": "filter", "expr": "n_regionkey = 0"}]},
        catalog=cat,
    )
    assert pipe.run(spark).count() == 5
    try:
        from_spec({"name": "x", "chain": [{"op": "ref", "name": "missing"}]}, cat)
        raise AssertionError("unresolved ref must be a hard error")
    except KeyError:
        pass


def test_spec_nested_pipeline_and_vocab_join(spark, sf_dir):
    from node_etl_spark.sources import FrameSource
    from node_etl_spark.tables import table

    nation = table(spark, sf_dir, "nation").withColumnRenamed(
        "n_nationkey", "c_nationkey"
    )
    cat = Catalog()
    cat.save(FrameSource(nation, name="nation_vocab"))
    spec = {
        "name": "enrich",
        "chain": [
            {"op": "parquet", "path": f"{sf_dir}/customer.parquet"},
            {"op": "pipeline", "name": "inner", "chain": [
                {"op": "mapper", "cols": {
                    "c_custkey": "c_custkey", "c_nationkey": "c_nationkey"}},
            ]},
            {"op": "joiner", "vocabs": [
                {"ref": "nation_vocab", "on": "c_nationkey",
                 "select": {"nation_name": "n_name"}}]},
        ],
    }
    out = from_spec(spec, cat).run(spark)
    assert out.filter("nation_name IS NULL").count() == 0
    assert set(out.columns) == {"c_custkey", "c_nationkey", "nation_name"}


def test_catalog_file_roundtrip(spark, sf_dir, tmp_path):
    from node_etl_spark.spec import dump_catalog, load_catalog

    cat = Catalog()
    cat.save(op_from_spec(
        {"op": "parquet", "path": f"{sf_dir}/region.parquet", "name": "regions"}))
    pipe = from_spec(
        {"name": "top-regions", "chain": [
            {"op": "ref", "name": "regions"},
            {"op": "sorter", "by": ["r_regionkey"], "limit": 2}]},
        catalog=cat,
    )
    cat.save(pipe)
    store = str(tmp_path / "jobs.json")
    dump_catalog(cat, store)

    reloaded = load_catalog(store)
    out = reloaded.get("top-regions").run(spark)
    assert [r.r_regionkey for r in out.collect()] == [0, 1]


def test_example_dwh_spec(spark, sf_dir, tmp_path):
    # examples/dwh_quarterly.json end-to-end: the bor-dwc DWH shape as
    # one spec document (vocab join + computed key + reduce + sink)
    import os

    from pyspark.sql import functions as F

    from node_etl_spark.sources import ParquetSource
    from node_etl_spark.tables import table

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = json.load(open(os.path.join(root, "examples", "dwh_quarterly.json")))
    cat = Catalog()
    cat.save(ParquetSource("$DATA/customer.parquet", name="customer-vocab"))
    out = str(tmp_path / "dwh")
    from_spec(spec, catalog=cat).run(
        spark, config={"DATA": sf_dir, "OUT": out}
    )
    got = spark.read.parquet(out + "/quarterly_revenue")
    # cross-check against the direct DataFrame computation
    o = table(spark, sf_dir, "orders").filter("o_orderdate >= '1995-01-01'")
    c = table(spark, sf_dir, "customer")
    want = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy(
            F.concat(
                F.year("o_orderdate"), F.lit("-Q"), F.quarter("o_orderdate")
            ).alias("order_quarter"),
            F.col("c_mktsegment").alias("segment"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )
    assert got.count() == want.count() > 0
    assert got.select(*want.columns).exceptAll(want).isEmpty()


def test_example_corpus_curation_spec(spark, sf_dir, tmp_path):
    # examples/corpus_curation.json end-to-end: the training-data
    # curation pipeline (clean -> quality gate -> exact dedup ->
    # deterministic split) as one declarative document
    import os

    from pyspark.sql import functions as F

    from node_etl_spark.tables import table

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = json.load(open(os.path.join(root, "examples", "corpus_curation.json")))
    out = str(tmp_path / "corpus")
    pipe = from_spec(spec)
    pipe.run(spark, config={"DATA": sf_dir, "OUT": out})
    got = spark.read.parquet(out + "/curated")
    n_in = table(spark, sf_dir, "documents").count()
    n_out = got.count()
    assert 0 < n_out <= n_in
    assert set(got.columns) >= {
        "doc_id", "text", "quality", "entropy", "split",
        "n_tokens", "pack_id", "pack_offset",
    }
    # quality + entropy gates held
    assert got.filter("quality < 0.2").count() == 0
    assert got.filter("entropy < 3.0").count() == 0
    # split assignment total and determinism (re-run -> same rows)
    assert got.filter("split IS NULL").count() == 0
    sizes = {r["split"]: r["n"] for r in
             got.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sizes["train"] > sizes.get("val", 0)
    # packing layout: offsets stay within budget and pack 0 starts at 0
    assert got.filter("pack_offset >= 2048 OR pack_offset < 0").count() == 0
    first = (
        got.filter("split = 'train'")
        .orderBy("doc_id")
        .select("pack_id", "pack_offset")
        .first()
    )
    assert first["pack_id"] == 0 and first["pack_offset"] == 0
    # round-trips through to_spec like every spec-built pipeline
    assert to_spec(pipe)["name"] == "corpus-curation"


def test_spec_splitter_fanout_and_route(spark, sf_dir, tmp_path):
    # reference Splitter semantics from a spec document: broadcast
    # fan-out (all receivers get every row) and routed split
    # (exactly-one-receiver, row-conserving)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    fan = {
        "name": "fanout",
        "chain": [
            {"op": "parquet", "path": "$DATA/nation.parquet"},
            {"op": "splitter", "receivers": [
                {"op": "parquet_sink", "path": a},
                {"op": "ndjson_sink", "path": b},
            ]},
        ],
    }
    from_spec(fan).run(spark, config={"DATA": sf_dir})
    n = spark.read.parquet(sf_dir + "/nation.parquet").count()
    assert spark.read.parquet(a).count() == n
    assert spark.read.json(b).count() == n

    ra, rb = str(tmp_path / "even"), str(tmp_path / "odd")
    routed = {
        "name": "routed",
        "chain": [
            {"op": "parquet", "path": "$DATA/nation.parquet"},
            {"op": "splitter", "route": "n_nationkey % 2",
             "receivers": [
                 {"op": "parquet_sink", "path": ra},
                 {"op": "parquet_sink", "path": rb},
             ]},
        ],
    }
    from_spec(routed).run(spark, config={"DATA": sf_dir})
    ne = spark.read.parquet(ra).count()
    no = spark.read.parquet(rb).count()
    assert ne + no == n and ne > 0 and no > 0
    assert spark.read.parquet(ra).filter("n_nationkey % 2 <> 0").count() == 0


def test_example_api_enrichment_spec(spark, sf_dir, tmp_path):
    # examples/api_enrichment.json end-to-end: the reference's trud.js
    # shape (per-master URL detail fetch + enrichment) as one spec
    # document; nation 3's detail file is missing -> NULL population
    # (reference pass-through-on-error)
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = json.load(open(os.path.join(root, "examples", "api_enrichment.json")))
    api = tmp_path / "api"
    api.mkdir()
    n = spark.read.parquet(sf_dir + "/nation.parquet").count()
    for k in range(n):
        if k == 3:
            continue
        (api / f"nation_{k}.json").write_text('{"population": %d}' % (k * 1000))
    out = str(tmp_path / "out")
    from_spec(spec).run(
        spark, config={"DATA": sf_dir, "API": f"file://{api}", "OUT": out}
    )
    got = {r.n_nationkey: r.population for r in
           spark.read.parquet(out + "/enriched_nations").collect()}
    assert len(got) == n
    assert got[3] is None
    assert got[5] == 5000


def test_spec_dq_report_mode(spark, tmp_path):
    import pyspark.sql.functions as F

    from node_etl_spark.spec import from_spec

    src = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, 5.0), (2, 50.0), (None, 5.0)], "id int, v double"
    ).write.parquet(src)
    pipe = from_spec(
        {
            "name": "dq-report",
            "chain": [
                {"op": "parquet", "path": src},
                {
                    "op": "dq",
                    "checks": [
                        {"kind": "not_null", "col": "id"},
                        {"kind": "in_range", "col": "v", "lo": 0, "hi": 10},
                    ],
                    "unique": [["id"]],
                },
            ],
        }
    )
    out = {r["check"]: r["n_violations"] for r in pipe.run(spark).collect()}
    assert out == {"not_null(id)": 1, "in_range(v)": 1, "unique(id)": 0}


def test_spec_dq_enforce_mode_raises_and_passes(spark, tmp_path):
    import pytest

    from node_etl_spark.spec import from_spec

    src = str(tmp_path / "t2")
    spark.createDataFrame([(1,), (2,), (None,)], "id int").write.parquet(src)
    bad = from_spec(
        {
            "name": "dq-enforce",
            "chain": [
                {"op": "parquet", "path": src},
                {"op": "dq", "mode": "enforce",
                 "checks": [{"kind": "not_null", "col": "id"}]},
            ],
        }
    )
    with pytest.raises(ValueError, match="not_null"):
        bad.run(spark).collect()

    ok = from_spec(
        {
            "name": "dq-enforce-ok",
            "chain": [
                {"op": "parquet", "path": src},
                {"op": "dq", "mode": "enforce", "unique": [["id"]]},
            ],
        }
    )
    assert ok.run(spark).count() == 3  # rows pass through untouched


def test_example_corpus_search_spec(spark, sf_dir, tmp_path):
    # examples/corpus_search.json end-to-end: clean -> dedup ->
    # keywords -> bm25 top-k, cross-checked against bm25_topk on the
    # same curated frame
    import os

    from node_etl_spark.functions.search import bm25_topk

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = json.load(open(os.path.join(root, "examples", "corpus_search.json")))
    out = str(tmp_path / "search")
    from_spec(spec).run(spark, config={"DATA": sf_dir, "OUT": out})
    got = spark.read.parquet(out + "/search_hits")
    assert got.count() > 0
    assert set(got.columns) == {"doc_id", "bm25", "n_terms_hit"}

    # same curated frame by hand
    from node_etl_spark.context import Context

    curated = from_spec({"name": "c", "chain": spec["chain"][:3]}).to_frame(
        spark, Context(config={"DATA": sf_dir})
    )
    want = {
        r.doc_id: r.bm25
        for r in bm25_topk(curated, ["hash", "stream", "vector"], k=25).collect()
    }
    assert {r.doc_id: r.bm25 for r in got.collect()} == want


def test_keywords_op_joins_top_tfidf(spark):
    from node_etl_spark.spec import from_spec as fs

    df = spark.createDataFrame(
        [(1, "alpha alpha beta"), (2, "beta gamma"), (3, "")],
        ["doc_id", "text"],
    )
    pipe = fs({"name": "k", "chain": [{"op": "keywords"}]})
    got = {
        r.doc_id: r.keyword
        for r in pipe.to_frame(spark, head=df).collect()
    }
    # doc 1: alpha (tf=2, rarer than beta); doc 3 has no tokens -> null
    assert got[1] == "alpha"
    assert got[3] is None


def test_spec_paged_rest_and_http_sinks(spark):
    # reference spec-document parity: ReaderPaged and WriterJSON http
    # destinations as spec nodes, reqOptions shape included (transport
    # swapped post-build — specs carry config, not code)
    calls = {"fetch": [], "post": []}

    def fake_fetch(url, req_options=None):
        calls["fetch"].append((url, req_options))
        page = int(url.split("offset=")[1]) // 100
        return json.dumps(
            {"data": [{"id": page}] if page == 0 else [], "total": 1}
        ).encode()

    src = op_from_spec(
        {
            "op": "paged_rest",
            "url": "http://api.example.org/x?offset={%offset%}",
            "rows_path": "data",
            "total_path": "total",
            "req_options": {"auth": {"user": "u", "password": "p"}},
            "name": "pr",
        }
    )
    assert to_spec(src)["req_options"]["auth"]["user"] == "u"
    src.fetch = fake_fetch
    src.retry_wait_s = 0.0
    from node_etl_spark.context import Context

    df = src.load(spark, Context())
    assert df.count() == 1
    assert calls["fetch"][0][1] == {"auth": {"user": "u", "password": "p"}}

    sink = op_from_spec(
        {
            "op": "json_array_sink",
            "path": "http://collector.example.org/in",
            "req_options": {"method": "put"},
        }
    )
    sink.transport = lambda url, data, ro: calls["post"].append((url, data, ro))
    sink.write(spark.range(2).toDF("id"), Context())
    (url, data, ro), = calls["post"]
    assert url.endswith("/in") and ro == {"method": "put"}
    assert json.loads(data) == [{"id": 0}, {"id": 1}]

    hs = op_from_spec(
        {"op": "http_ndjson_sink", "url": "http://c.example.org/r", "batch_rows": 5}
    )
    assert hs.batch_rows == 5
    ms = op_from_spec({"op": "mongo_sink", "url": "mongodb://h/db/coll"})
    assert ms.url.endswith("/coll")


def test_spec_skyline_and_ols(spark, sf_dir):
    sky = from_spec(
        {
            "name": "sky",
            "chain": [
                {"op": "parquet", "path": f"{sf_dir}/part.parquet"},
                {"op": "skyline", "maximize": ["p_size"],
                 "minimize": ["p_retailprice"]},
            ],
        }
    ).run(spark)
    rows = sky.collect()
    assert len(rows) >= 1
    # no row in the frontier dominates another
    for a in rows:
        for b in rows:
            assert not (
                b.p_size >= a.p_size
                and b.p_retailprice <= a.p_retailprice
                and (b.p_size > a.p_size or b.p_retailprice < a.p_retailprice)
            )


def test_spec_containment_dedup_drops_contained(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "PAD the quick brown fox jumps over the lazy dog PAD"),
            (3, "entirely different words live here today"),
        ],
        "doc_id long, text string",
    )
    from node_etl_spark.context import Context

    op = op_from_spec({"op": "containment_dedup"})
    kept = {r.doc_id for r in op.apply(df, Context()).collect()}
    assert kept == {2, 3}


def test_spec_pcm_energy_node(spark):
    from node_etl_spark.context import Context

    df = spark.createDataFrame([(1, bytes([128] * 10))], "doc_id long, content binary")
    op = op_from_spec({"op": "pcm_energy", "window": 4})
    rows = {(r.win, r.energy) for r in op.apply(df, Context()).collect()}
    assert rows == {(0, 0), (1, 0), (2, 0)}


def test_example_training_mix_spec(spark, sf_dir, tmp_path):
    import json as _json

    spec = _json.load(open("examples/training_mix.json"))
    from node_etl_spark.spec import from_spec

    from_spec(spec).run(spark, config={"DATA": sf_dir, "OUT": str(tmp_path)})
    out = spark.read.parquet(str(tmp_path / "mixed"))
    n_in = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    n_out = out.count()
    assert 0 < n_out < n_in            # really thinned
    assert "text" in out.columns        # full rows survive the mix


def test_spec_resample_sources_emits_copies(spark):
    from node_etl_spark.context import Context
    from node_etl_spark.spec import op_from_spec

    df = spark.createDataFrame(
        [(i, "low", 10) for i in range(10)] + [(100 + i, "high", 10) for i in range(90)],
        "doc_id long, source string, n_chars long",
    )
    op = op_from_spec(
        {"op": "resample_sources", "budget_frac": 1.0,
         "proportions": {"low": 0.5, "high": 0.5}}
    )
    out = op.apply(df, Context()).collect()
    low = [r for r in out if r.source == "low"]
    assert len(low) == 50  # f = 1000*0.5/100 = 5 copies each
    assert {r.copy for r in low} == {1, 2, 3, 4, 5}


def test_spec_temperature_mix_keeps_rows(spark):
    from node_etl_spark.context import Context
    from node_etl_spark.spec import op_from_spec

    df = spark.createDataFrame(
        [(i, "big", 10) for i in range(90)]
        + [(100 + i, "small", 10) for i in range(10)],
        "doc_id long, source string, n_chars long",
    )
    op = op_from_spec(
        {"op": "temperature_mix", "alpha": 0.3, "budget_frac": 0.5}
    )
    out = op.apply(df, Context()).collect()
    assert 0 < len(out) < 100
    assert {"doc_id", "source", "n_chars"} <= set(out[0].asDict())


def test_spec_heavy_hitters(spark):
    from node_etl_spark.context import Context
    from node_etl_spark.spec import op_from_spec

    df = spark.createDataFrame(
        [("hot",)] * 50 + [(f"t{i}",) for i in range(50)], "item string"
    )
    op = op_from_spec({"op": "heavy_hitters", "col": "item", "k": 4})
    out = {r.item: r.cnt for r in op.apply(df, Context()).collect()}
    assert out == {"hot": 50}


def test_spec_canonical_url(spark):
    from node_etl_spark.context import Context
    from node_etl_spark.spec import op_from_spec

    df = spark.createDataFrame(
        [("https://A.org/p?utm_source=x",)], "url string"
    )
    op = op_from_spec({"op": "canonical_url"})
    assert op.apply(df, Context()).collect()[0].url == "https://a.org/p"


def test_spec_semdedup_drops_dups(spark):
    from node_etl_spark.context import Context
    from node_etl_spark.spec import op_from_spec

    df = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.999, 0.01]),
            (50, [0.0, 1.0]),
        ],
        "vec_id bigint, embedding array<float>",
    )
    # seed_mod pinned: this test exercises the op plumbing, not the
    # default sqrt-balanced stride (covered in test_similarity)
    op = op_from_spec({"op": "semdedup", "seed_mod": 50, "threshold": 0.9})
    kept = {r.vec_id for r in op.apply(df, Context()).collect()}
    assert kept == {0, 50}


def test_spec_bloom_semi_join_with_path(spark, tmp_path):
    from node_etl_spark.context import Context
    from node_etl_spark.spec import op_from_spec

    keys = spark.createDataFrame([(2,), (4,)], "k bigint")
    keys.write.parquet(str(tmp_path / "keys"))
    df = spark.createDataFrame([(i,) for i in range(10)], "k bigint")
    op = op_from_spec(
        {"op": "bloom_semi_join", "path": str(tmp_path / "keys"), "on": "k"}
    )
    got = {r.k for r in op.apply(df, Context()).collect()}
    assert got == {2, 4}


def test_example_web_corpus_refresh_spec(spark, sf_dir, tmp_path):
    import json as _json

    spec = _json.load(open("examples/web_corpus_refresh.json"))
    from node_etl_spark.spec import from_spec

    from_spec(spec).run(spark, config={"DATA": sf_dir, "OUT": str(tmp_path)})
    out = spark.read.parquet(str(tmp_path / "refreshed"))
    n_in = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    n_out = out.count()
    assert 0 < n_out <= n_in
    assert "text" in out.columns


def test_spec_fuzzy_dedup_drops_typo_twins(spark):
    from node_etl_spark.context import Context
    from node_etl_spark.spec import op_from_spec

    df = spark.createDataFrame(
        [(0, "alpha"), (1, "alpho"), (2, "gamma"), (3, "alpha")],
        "doc_id long, text string",
    )
    op = op_from_spec({"op": "fuzzy_dedup", "k": 2})
    kept = {r.doc_id for r in op.apply(df, Context()).collect()}
    # 0/1/3 are one lev<=2 cluster (keep lowest id 0); 2 untouched
    assert kept == {0, 2}


def test_example_media_features_spec(spark, tmp_path):
    # examples/media_features.json end-to-end: opaque binary ingest
    # (binaryFile source, glob-scoped) -> REAL BMP decode through the
    # Arrow hook -> typed feature projection -> parquet. A corrupt
    # file rides along and must be dropped by the null-row filter.
    import json as _json
    import os

    from node_etl_spark.functions.multimodal import encode_bmp24
    from node_etl_spark.spec import from_spec

    data = tmp_path / "media"
    data.mkdir()
    # two 2x2 BMPs with known pixels + one corrupt .bmp + one non-bmp
    px_a = [[(10, 20, 30), (10, 20, 30)], [(10, 20, 30), (10, 20, 30)]]
    px_b = [[(0, 0, 0), (255, 255, 255)], [(255, 255, 255), (0, 0, 0)]]
    (data / "a.bmp").write_bytes(encode_bmp24(2, 2, px_a))
    (data / "b.bmp").write_bytes(encode_bmp24(2, 2, px_b))
    (data / "broken.bmp").write_bytes(b"BM garbage")
    (data / "notes.txt").write_bytes(b"not an image, excluded by glob")

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = _json.load(
        open(os.path.join(root, "examples", "media_features.json"))
    )
    out = str(tmp_path / "out")
    from_spec(spec).run(spark, config={"DATA": str(data), "OUT": out})
    got = {
        os.path.basename(r.path): r
        for r in spark.read.parquet(out + "/image_features").collect()
    }
    assert set(got) == {"a.bmp", "b.bmp"}  # corrupt dropped, txt unscanned
    a, b = got["a.bmp"], got["b.bmp"]
    assert (a.width, a.height, a.n_px) == (2, 2, 4)
    assert (a.mean_r, a.mean_g, a.mean_b) == (10.0, 20.0, 30.0)
    assert (b.mean_r, b.mean_g, b.mean_b) == (127.5, 127.5, 127.5)


def test_decode_image_auto_routes_mixed_codecs(spark):
    # codec "auto" (explicit opt-in; the default stays "bmp"): one
    # scan over a MIXED media
    # folder routes each file by magic bytes to its real decoder —
    # BMP/PNG/JPEG pixels, GIF frame-0 palette sums; WAV and garbage
    # are not images and become null rows (warn-and-skip)
    from node_etl_spark.functions.multimodal import (
        encode_bmp24,
        encode_gif,
        encode_jpeg_gray,
        encode_png24,
        encode_wav16,
    )
    from node_etl_spark.context import Context
    from node_etl_spark.spec import op_from_spec

    rows = [
        ("a.bmp", bytearray(encode_bmp24(2, 1, [[(1, 2, 3), (4, 5, 6)]]))),
        ("b.png", bytearray(encode_png24(2, 1, [[(1, 2, 3), (4, 5, 6)]]))),
        ("c.jpg", bytearray(encode_jpeg_gray(8, 8, [[42] * 8] * 8))),
        ("d.gif", bytearray(encode_gif(
            2, 1, [[[0, 1]]], [(10, 20, 30), (40, 50, 60)]))),
        ("e.wav", bytearray(encode_wav16(8000, [1, 2, 3]))),
        ("f.bin", bytearray(b"garbage")),
    ]
    df = spark.createDataFrame(rows, "path string, content binary")
    # mixed-folder routing is an explicit opt-in (default stays 'bmp'
    # for spec backward compatibility — ADVICE r8)
    op = op_from_spec({"op": "decode_image", "codec": "auto"})
    got = {
        r.path: (r.width, r.height, r.channels, r.features)
        for r in op.apply(df, Context()).collect()
    }
    assert got["a.bmp"] == (2, 1, 3, [5.0, 7.0, 9.0])
    assert got["b.png"] == (2, 1, 3, [5.0, 7.0, 9.0])
    assert got["c.jpg"] == (8, 8, 1, [2688.0])
    assert got["d.gif"] == (2, 1, 3, [50.0, 70.0, 90.0])
    assert got["e.wav"] == (None, None, None, None)
    assert got["f.bin"] == (None, None, None, None)
    # explicit single-codec ops still reject cross-format files
    op_gif = op_from_spec({"op": "decode_image", "codec": "gif"})
    got = {
        r.path: r.width
        for r in op_gif.apply(df, Context()).collect()
    }
    assert got["d.gif"] == 2 and got["a.bmp"] is None
    # omitted codec = the original 'bmp' contract: BMP decodes, the
    # PNG next to it stays a null-feature row (no silent auto-routing)
    op_default = op_from_spec({"op": "decode_image"})
    got = {
        r.path: r.width
        for r in op_default.apply(df, Context()).collect()
    }
    assert got["a.bmp"] == 2 and got["b.png"] is None


def test_example_webdataset_ingest_spec(spark, tmp_path):
    # examples/webdataset_ingest.json end-to-end: tar-shard binary
    # ingest -> member explode -> magic-sniffed image decode ->
    # typed projection -> parquet
    import json as _json
    import os

    from node_etl_spark.functions.multimodal import (
        encode_png24,
        encode_tar_shard,
    )
    from node_etl_spark.spec import from_spec

    data = tmp_path / "shards"
    data.mkdir()
    png = encode_png24(2, 2, [[(1, 2, 3)] * 2] * 2)
    (data / "shard-000.tar").write_bytes(
        encode_tar_shard([("a.png", png), ("a.txt", b"caption")])
    )
    (data / "shard-001.tar.gz").write_bytes(
        encode_tar_shard([("b.png", png)], compress=True)
    )
    (data / "ignore.bin").write_bytes(b"not a shard, excluded by glob")

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = _json.load(
        open(os.path.join(root, "examples", "webdataset_ingest.json"))
    )
    out = str(tmp_path / "out")
    from_spec(spec).run(spark, config={"DATA": str(data), "OUT": out})
    got = {
        r.member: (r.width, r.height, r.channels, r.n_px)
        for r in spark.read.parquet(out + "/shard_image_features").collect()
    }
    # caption member decodes to null -> filtered; both shards' PNGs land
    assert got == {"a.png": (2, 2, 3, 4), "b.png": (2, 2, 3, 4)}


def test_example_webdataset_image_dedup_spec(spark, tmp_path):
    # examples/webdataset_image_dedup.json end-to-end (verdict r9 ask
    # #6): shard ingest -> explode -> magic-sniffed decode + aHash ->
    # banding near-dup removal — the q301->q309 pipeline as a
    # declarative Job document. Two identical BMPs across DIFFERENT
    # shards collapse to the lexicographically-lowest member; a
    # visually distinct image and survives; the caption member drops
    # at the ahash stage.
    import json as _json
    import os

    from node_etl_spark.functions.multimodal import (
        encode_bmp24,
        encode_tar_shard,
    )
    from node_etl_spark.spec import from_spec

    def bmp(bright_left):
        px = [
            [((200 if (x < 40 if bright_left else y < 24) else 10),) * 3
             for x in range(80)]
            for y in range(48)
        ]
        return encode_bmp24(80, 48, px)

    data = tmp_path / "shards"
    data.mkdir()
    (data / "shard-000.tar").write_bytes(
        encode_tar_shard(
            [("x.bmp", bmp(True)), ("z.bmp", bmp(False)),
             ("x.txt", b"caption, not an image")]
        )
    )
    (data / "shard-001.tar.gz").write_bytes(
        encode_tar_shard([("y.bmp", bmp(True))], compress=True)
    )

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = _json.load(
        open(os.path.join(root, "examples", "webdataset_image_dedup.json"))
    )
    out = str(tmp_path / "out")
    from_spec(spec).run(spark, config={"DATA": str(data), "OUT": out})
    rows = spark.read.parquet(out + "/unique_images").collect()
    got = {r.member: (r.width, r.height) for r in rows}
    # y.bmp (identical to x.bmp, hamming 0) was removed; the two
    # survivors' fingerprints are far apart (left-half vs top-half
    # bright ~ hamming 30 on the 60-bit grid)
    assert got == {"x.bmp": (80, 48), "z.bmp": (80, 48)}
    ph = {r.member: r.phash for r in rows}
    assert bin(ph["x.bmp"] ^ ph["z.bmp"]).count("1") > 4


def test_simhash_dedup_spec_op(spark):
    # unit shape: near fingerprints (hamming <= max_hamming) collapse
    # keep-lowest-id; far ones survive; extra columns pass through
    from node_etl_spark.context import Context
    from node_etl_spark.spec import op_from_spec

    df = spark.createDataFrame(
        [(1, 0b111, "a"), (2, 0b110, "b"), (3, (1 << 59) - 1, "c")],
        "doc_id bigint, simhash bigint, tag string",
    )
    op = op_from_spec({"op": "simhash_dedup", "max_hamming": 1})
    got = sorted(
        (r.doc_id, r.tag) for r in op.apply(df, Context()).collect()
    )
    assert got == [(1, "a"), (3, "c")]


def test_unicode_normalize_spec_op(spark):
    from node_etl_spark.context import Context
    from node_etl_spark.spec import op_from_spec

    df = spark.createDataFrame(
        [(1, "Café STRASSE")], "id bigint, text string"
    )
    op = op_from_spec(
        {
            "op": "unicode_normalize",
            "strip_accents": True,
            "casefold": True,
            "out": "norm",
        }
    )
    row = op.apply(df, Context()).collect()[0]
    assert row.text == "Café STRASSE"
    assert row.norm == "cafe strasse"


def test_compress_decompress_text_spec_ops(spark):
    from node_etl_spark.context import Context
    from node_etl_spark.spec import op_from_spec

    df = spark.createDataFrame([(1, "payload")], "id bigint, text string")
    packed = op_from_spec(
        {"op": "compress_text", "codec": "lzma", "out": "blob"}
    ).apply(df, Context())
    row = op_from_spec(
        {"op": "decompress_text", "col": "blob", "out": "back"}
    ).apply(packed, Context()).collect()[0]
    assert bytes(row.blob)[:6] == b"\xfd7zXZ\x00"
    assert row.back == "payload"


def test_video_frames_spec_op(spark):
    from node_etl_spark.functions.multimodal import (
        encode_avi_mjpeg,
        encode_jpeg_gray,
    )
    from node_etl_spark.context import Context
    from node_etl_spark.spec import op_from_spec

    jpegs = [
        encode_jpeg_gray(8, 8, [[2 * ((f * 11 + 3) % 128)] * 8] * 8)
        for f in range(3)
    ]
    df = spark.createDataFrame(
        [(7, 2, bytearray(encode_avi_mjpeg(8, 8, jpegs, 40)))],
        "doc_id bigint, k int, content binary",
    )
    op = op_from_spec({"op": "video_frames", "every_k": 2})
    got = sorted(
        (r.frame_idx, r.frame_ts_ms) for r in op.apply(df, Context()).collect()
    )
    assert got == [(0, 0), (2, 80)]
    # per-row stride via column name
    op_col = op_from_spec({"op": "video_frames", "every_k": "k"})
    got = sorted(r.frame_idx for r in op_col.apply(df, Context()).collect())
    assert got == [0, 2]


def test_example_video_frame_sample_spec(spark, tmp_path):
    # examples/video_frame_sample.json end-to-end: AVI folder scan ->
    # MJPEG frame sampling -> typed projection -> parquet
    import json as _json
    import os

    from node_etl_spark.functions.multimodal import (
        encode_avi_mjpeg,
        encode_jpeg_gray,
    )
    from node_etl_spark.spec import from_spec

    data = tmp_path / "clips"
    data.mkdir()
    img = [[2 * ((3 + (x // 8) * 13) % 128) for x in range(16)]
           for _ in range(8)]
    jpegs = [encode_jpeg_gray(16, 8, img) for _ in range(5)]
    (data / "a.avi").write_bytes(encode_avi_mjpeg(16, 8, jpegs, 40))
    (data / "junk.txt").write_text("not a clip")
    (data / "bad.avi").write_bytes(b"RIFF garbage")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = _json.load(
        open(os.path.join(root, "examples", "video_frame_sample.json"))
    )
    out = str(tmp_path / "out")
    from_spec(spec).run(spark, config={"DATA": str(data), "OUT": out})
    got = spark.read.parquet(out + "/video_frames")
    rows = sorted(
        (r.frame_idx, r.frame_ts_ms, r.n_px, float(r.mean_gray))
        for r in got.collect()
    )
    want_mean = round(sum(map(sum, img)) / 128.0, 4)
    assert rows == [(0, 0, 128, want_mean), (2, 80, 128, want_mean),
                    (4, 160, 128, want_mean)]


def test_image_ahash_spec_op(spark):
    from node_etl_spark.context import Context
    from node_etl_spark.functions.multimodal import encode_bmp24
    from node_etl_spark.spec import op_from_spec

    img = [[((37 * (y // 4) + 91 * (x // 8) + 13) % 256,) * 3
            for x in range(80)] for y in range(24)]
    df = spark.createDataFrame(
        [(1, bytearray(encode_bmp24(80, 24, img))), (2, bytearray(b"junk"))],
        "doc_id bigint, content binary",
    )
    op = op_from_spec({"op": "image_ahash"})
    rows = op.apply(df, Context()).collect()
    assert len(rows) == 1 and rows[0].doc_id == 1
    assert rows[0].width == 80 and 0 < rows[0].phash < (1 << 60)


def test_cdc_dedup_and_quantile_sketch_and_dp_release_spec_ops(spark):
    import pytest

    from node_etl_spark.spec import op_from_spec

    df = spark.createDataFrame(
        [(i, "the corpus repeats this exact sentence over and over. " * 4)
         for i in range(6)],
        "doc_id bigint, text string",
    )
    out = op_from_spec({"op": "cdc_dedup"}).apply(df, None)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 6
    # five of six identical docs store nothing new
    assert sum(1 for r in rows.values() if r["n_new_chunks"] == 0) == 5

    nums = spark.range(0, 1000).selectExpr("CAST(id AS DOUBLE) AS value")
    qs = op_from_spec(
        {"op": "quantile_sketch", "col": "value", "qs": [0.1, 0.5, 0.9]}
    ).apply(nums, None)
    got = {r["q"]: r["est"] for r in qs.collect()}
    assert abs(got[0.5] - 500) < 25 and abs(got[0.9] - 900) < 25

    rel = op_from_spec(
        {
            "op": "dp_release",
            "group_cols": ["g"],
            "seed": "s1",
            "k_anon": 3,
        }
    ).apply(
        spark.createDataFrame(
            [("a",)] * 20 + [("b",)], schema="g string"
        ),
        None,
    )
    rows = {r["g"]: r["n_noisy"] for r in rel.collect()}
    assert set(rows) == {"a"} and abs(rows["a"] - 20) <= 16

    # seed is mandatory: silent noise reuse is the failure mode
    with pytest.raises(KeyError):
        op_from_spec({"op": "dp_release", "group_cols": ["g"]})


def test_snapshot_spec_source_and_sink(spark, tmp_path):
    from node_etl_spark.spec import from_spec

    tbl = str(tmp_path / "snap_tbl")
    # run 1: commit 0..9; run 2: append 10..14 — one version per run
    for lo, hi in [(0, 10), (10, 15)]:
        from_spec(
            {
                "name": "commit",
                "chain": [
                    {"op": "parquet", "path": "{%src%}"},
                    {
                        "op": "snapshot_sink",
                        "path": tbl,
                        "stats_cols": ["id"],
                    },
                ],
            }
        ).run(
            spark,
            args={"src": _write_range(spark, tmp_path, lo, hi)},
        )

    read_all = from_spec(
        {"name": "r", "chain": [{"op": "snapshot", "path": tbl}]}
    ).run(spark)
    assert {r["id"] for r in read_all.collect()} == set(range(15))

    as_of = from_spec(
        {
            "name": "r1",
            "chain": [{"op": "snapshot", "path": tbl, "version": 1}],
        }
    ).run(spark)
    assert as_of.count() == 10

    ranged = from_spec(
        {
            "name": "r2",
            "chain": [
                {"op": "snapshot", "path": tbl, "where": ["id", 12, None]}
            ],
        }
    ).run(spark)
    assert {r["id"] for r in ranged.collect()} == {12, 13, 14}


def _write_range(spark, tmp_path, lo, hi):
    import uuid

    p = str(tmp_path / f"src-{uuid.uuid4().hex[:8]}")
    spark.range(lo, hi).write.parquet(p)
    return p


def test_examples_snapshot_store_and_private_release(spark, sf_dir, tmp_path):
    # examples/governed_corpus_store.json: curate -> CDC store stats ->
    # one atomic snapshot commit per run (re-runs append new versions);
    # examples/private_release.json: suppressed + noised counts out
    import json as _json
    import os

    from node_etl_spark.sources.snapshot import SnapshotTable
    from node_etl_spark.spec import from_spec

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = str(tmp_path / "gov")
    spec = _json.load(
        open(os.path.join(root, "examples", "governed_corpus_store.json"))
    )
    for _ in range(2):  # two runs -> two versions
        from_spec(spec).run(spark, config={"DATA": sf_dir, "OUT": out})
    t = SnapshotTable(out + "/corpus_table")
    assert t.versions() == [1, 2]
    v1, v2 = t.read(spark, 1).count(), t.read(spark, 2).count()
    assert 0 < v1 and v2 == 2 * v1  # append semantics
    assert set(t.read(spark).columns) == {
        "doc_id", "n_chunks", "n_new_chunks", "stored_chars"
    }
    # commit-time zonemaps captured for the stats column
    assert all("doc_id" in v for v in t.manifest(2)["stats"].values())

    rel_out = str(tmp_path / "rel")
    spec2 = _json.load(
        open(os.path.join(root, "examples", "private_release.json"))
    )
    from_spec(spec2).run(spark, config={"DATA": sf_dir, "OUT": rel_out})
    got = spark.read.json(rel_out + "/release")
    rows = got.collect()
    assert 0 < len(rows) <= 15  # k-anon may suppress small cells
    assert all(r["n_noisy"] >= 0 for r in rows)
