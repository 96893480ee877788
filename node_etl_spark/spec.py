"""Declarative pipeline specs: JSON documents -> Pipeline.

Reference: jobs are Mongoose documents — type + fields + by-UUID
references to other jobs — serialized for transport (jobs/job.js:49-64)
and resolved at run time (``ensureDepts``, job-pipeline.js:153-165).
Here a pipeline is a plain JSON-able dict: ``{"op": <type>, ...}``
nodes in a ``chain``, with ``{"op": "ref", "name": ...}`` for
catalog-resolved references. Two deliberate departures (SURVEY §1.2):

* no string-eval'd user code — predicates/projections are Spark SQL
  expression strings, compiled by Catalyst, not a ``vm`` sandbox;
* the catalog is an in-memory/name registry, not MongoDB.

``from_spec`` attaches the originating dict to each op, so a
spec-built pipeline round-trips via ``to_spec`` (the reference's
serialize path).
"""

from __future__ import annotations

from typing import Any, Callable, Mapping

from .operators import (
    AntiJoin,
    Array2Map,
    AsofJoin,
    Filter,
    JoinDetail,
    Joiner,
    Limit,
    Map2Array,
    Mapper,
    Nothing,
    RangeJoin,
    RouteTag,
    Reducer,
    SemiJoin,
    Sorter,
    Thru,
    TreeFlatten,
    Uniquer,
    Vocab,
)
from .operators.base import FnTransform, Op
from .pipeline import Catalog, Pipeline
from .sources import (
    BinarySource,
    CompressedNdjsonSource,
    CsvSource,
    TokenShardSink,
    TokenShardSource,
    JsonArraySink,
    JsonSource,
    NdjsonSink,
    NdjsonSource,
    ParquetSink,
    ParquetSource,
    SnapshotSink,
    SnapshotSource,
    XmlSource,
)


def _vocab_from_spec(d: Mapping[str, Any], catalog: Catalog | None) -> Vocab:
    if "ref" in d:
        if catalog is None:
            raise KeyError(f"vocab ref {d['ref']!r} but no catalog")
        source = catalog.get(d["ref"])
    else:
        source = ParquetSource(d["path"])
    return Vocab(source, on=d["on"], select=d.get("select"), prefix=d.get("prefix", ""))


def _joiner(d: Mapping[str, Any], catalog: Catalog | None) -> Joiner:
    return Joiner([_vocab_from_spec(v, catalog) for v in d["vocabs"]])


_REGISTRY: dict[str, Callable[..., Op]] = {
    # sources (reference readers+parsers, SURVEY §2.1/§2.2)
    "parquet": lambda d, c: ParquetSource(d["path"], options=d.get("options")),
    "csv": lambda d, c: CsvSource(
        d["path"],
        delimiter=d.get("delimiter", ","),
        escape=d.get("escape", '"'),
        headers=d.get("headers", False),
        encoding=d.get("encoding"),
        schema=d.get("schema"),
    ),
    "json": lambda d, c: JsonSource(
        d["path"], root_node=d.get("root_node", "*"),
        multiline=d.get("multiline", True),
    ),
    "ndjson": lambda d, c: NdjsonSource(d["path"], schema=d.get("schema")),
    # per-file-compressed NDJSON shards (.jsonl.gz/.jsonl.zst/...):
    # binaryFile scan + magic-sniffing decompress; schema REQUIRED
    "ndjson_z": lambda d, c: CompressedNdjsonSource(
        d["path"], schema=d["schema"], glob=d.get("glob")
    ),
    # packed token shards (sources/tokenshards.py): the fixed-dtype
    # binary export trainers consume; see token_shards_sink below
    "token_shards": lambda d, c: TokenShardSource(
        d["path"],
        glob=d.get("glob", "*.tokens"),
        rows_per_task=d.get("rows_per_task"),
    ),
    "xml": lambda d, c: XmlSource(d["path"], row_tag=d.get("row_tag", "item")),
    # manifest-versioned snapshot table (sources/snapshot.py): AS-OF
    # reads with optional zonemap-pruned key ranges
    "snapshot": lambda d, c: SnapshotSource(
        d["path"], version=d.get("version"), where=d.get("where")
    ),
    # opaque media ingest (functions/multimodal.py): one row per file
    "binary": lambda d, c: BinarySource(
        d["path"],
        options={"pathGlobFilter": d["glob"]} if d.get("glob") else None,
    ),
    # reference ReaderPaged as a spec node: url template with
    # {%offset%}/{%limit%} placeholders, reqOptions shape per
    # job-reader.js (headers / auth / method)
    "paged_rest": lambda d, c: _paged_rest_source(d),
    # row transforms (§2.3)
    "filter": lambda d, c: Filter(d["expr"]),
    "mapper": lambda d, c: Mapper(d["cols"]),
    "thru": lambda d, c: Thru(
        explode=d.get("explode"), explode_as=d.get("explode_as"),
        keep=d.get("keep"), unpivot=tuple(d["unpivot"]) if d.get("unpivot") else None,
    ),
    "sorter": lambda d, c: Sorter(
        by=d["by"], ascending=d.get("ascending"), limit=d.get("limit")
    ),
    "reducer": lambda d, c: Reducer(keys=d["keys"], aggs=d["aggs"]),
    "uniquer": lambda d, c: Uniquer(keys=d["keys"], order_by=d.get("order_by")),
    "array2map": lambda d, c: Array2Map(
        fields=d["fields"], id_key=d.get("id_key", "id"),
        value_field=d.get("value_field"),
    ),
    "map2array": lambda d, c: Map2Array(
        fields=d["fields"], id_key=d.get("id_key", "id"),
        value_key=d.get("value_key", "value"), explode=d.get("explode", False),
    ),
    "nothing": lambda d, c: Nothing(),
    "limit": lambda d, c: Limit(d["n"]),
    "tree_flatten": lambda d, c: TreeFlatten(
        id_col=d.get("id_col", "id"), parent_col=d.get("parent_col", "parent"),
    ),
    # joins (§2.4)
    "joiner": _joiner,
    "join_detail": lambda d, c: JoinDetail(
        ParquetSource(d["path"]) if "path" in d else c.get(d["ref"]),
        on=d["on"], aggs=d.get("aggs"), nest_as=d.get("nest_as"),
    ),
    "semi_join": lambda d, c: SemiJoin(
        ParquetSource(d["path"]) if "path" in d else c.get(d["ref"]), on=d["on"]
    ),
    "anti_join": lambda d, c: AntiJoin(
        ParquetSource(d["path"]) if "path" in d else c.get(d["ref"]), on=d["on"]
    ),
    "asof_join": lambda d, c: AsofJoin(
        ParquetSource(d["path"]) if "path" in d else c.get(d["ref"]),
        on=d["on"], left_ts=d["left_ts"], right_ts=d["right_ts"],
        payload=d["payload"], right_id=d.get("right_id"),
    ),
    "range_join": lambda d, c: RangeJoin(
        ParquetSource(d["path"]) if "path" in d else c.get(d["ref"]),
        point=d["point"], lo=d.get("lo", "lo"), hi=d.get("hi", "hi"),
        on=d.get("on", ()), bucket_width=d.get("bucket_width"),
    ),
    # sinks (§2.5)
    "parquet_sink": lambda d, c: ParquetSink(d["path"], mode=d.get("mode", "overwrite")),
    # one pipeline run = one atomic manifest commit
    "snapshot_sink": lambda d, c: SnapshotSink(
        d["path"],
        mode=d.get("mode", "append"),
        stats_cols=d.get("stats_cols"),
    ),
    "token_shards_sink": lambda d, c: TokenShardSink(
        d["path"],
        id_col=d.get("id_col", "seq_id"),
        tokens_col=d.get("tokens_col", "tokens"),
        dtype=d.get("dtype", "uint16"),
    ),
    "ndjson_sink": lambda d, c: NdjsonSink(d["path"], mode=d.get("mode", "overwrite")),
    # destination may be a path or an http(s) URL (reference WriterJSON
    # + getWriteStreamByUrl); req_options carries headers/auth/method
    "json_array_sink": lambda d, c: JsonArraySink(
        d["path"], req_options=d.get("req_options")
    ),
    "http_ndjson_sink": lambda d, c: _http_ndjson_sink(d),
    "mongo_sink": lambda d, c: _mongo_sink(d),
    # fan-out / routed multi-sink (reference Splitter receivers are
    # job ids, jobs/hi-order/job-splitter.js:17-19 — here nested sink
    # nodes or catalog refs; `route` picks exactly one receiver index
    # per row, no route broadcasts to all)
    "splitter": lambda d, c: _splitter(d, c),
    "route_tag": lambda d, c: RouteTag(d["route"], as_col=d.get("as", "route")),
}


def _splitter(d: Mapping[str, Any], c: Catalog | None) -> Op:
    from .operators import Splitter

    return Splitter(
        [op_from_spec(r, c) for r in d["receivers"]], route=d.get("route")
    )


# -- training-data curation ops (functions/ surfaced declaratively) --


def _clean_text_op(d: Mapping[str, Any], c: Catalog | None) -> Op:
    from .functions.text import clean_text

    col = d.get("text_col", "text")
    return FnTransform(
        lambda df: df.withColumn(col, clean_text(col)), name="clean_text"
    )


def _redact_pii_op(d: Mapping[str, Any], c: Catalog | None) -> Op:
    from .functions.text import redact_pii

    col = d.get("text_col", "text")
    # "kinds" absent -> all patterns; explicitly empty or typo'd kinds
    # raise inside redact_pii (a silently-disabled scrub is worse than
    # an error)
    kinds = tuple(d["kinds"]) if "kinds" in d else None
    return FnTransform(
        lambda df: df.withColumn(col, redact_pii(col, kinds=kinds)),
        name="redact_pii",
    )


def _quality_op(d: Mapping[str, Any], c: Catalog | None) -> Op:
    from pyspark.sql import functions as F

    from .functions.text import quality_score

    col, mn = d.get("text_col", "text"), d.get("min")

    def fn(df):
        out = df.withColumn("quality", quality_score(col))
        return out.filter(F.col("quality") >= mn) if mn is not None else out

    return FnTransform(fn, name="quality")


def _lang_op(d: Mapping[str, Any], c: Catalog | None) -> Op:
    from .functions.text import lang_guess

    col = d.get("text_col", "text")
    return FnTransform(
        lambda df: df.withColumn("lang_guess", lang_guess(col)), name="lang"
    )


def _exact_dedup_op(d: Mapping[str, Any], c: Catalog | None) -> Op:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from .functions.text import normalize_text

    col, idc = d.get("text_col", "text"), d.get("id_col", "doc_id")

    def fn(df):
        # keep the min-id representative per normalized fingerprint —
        # the declarative twin of dedup.exact_dup_groups
        w = Window.partitionBy("__fp").orderBy(idc)
        return (
            df.withColumn("__fp", F.md5(normalize_text(col)))
            .withColumn("__rn", F.row_number().over(w))
            .filter("__rn = 1")
            .drop("__fp", "__rn")
        )

    return FnTransform(fn, name="exact_dedup")


def _pack_sequences_op(d: Mapping[str, Any], c: Catalog | None) -> Op:
    """Concatenate-and-chunk sequence packing (the q131 shape):
    delegates to functions/text.py pack_sequences — the single source
    of the oracle-parity window shapes."""
    from .functions.text import pack_sequences

    col = d.get("text_col", "text")
    idc = d.get("id_col", "doc_id")
    shard = d.get("shard_col", "source")
    budget = int(d.get("budget", 2048))

    return FnTransform(
        lambda df: pack_sequences(
            df, text_col=col, id_col=idc, shard_col=shard, budget=budget
        ),
        name="pack_sequences",
    )


def _token_entropy_op(d: Mapping[str, Any], c: Catalog | None) -> Op:
    """Token-distribution entropy quality signal (the q132 shape),
    joined back as an ``entropy`` column; optional ``min`` filter
    drops low-entropy (boilerplate/repetitive) documents. Delegates
    to functions/text.py token_entropy."""
    from pyspark.sql import functions as F

    from .functions.text import token_entropy

    col = d.get("text_col", "text")
    idc, mn = d.get("id_col", "doc_id"), d.get("min")

    def fn(df):
        ent = token_entropy(df, text_col=col, id_col=idc).select(
            idc, "entropy"
        )
        out = df.join(ent, on=idc, how="left")
        return out.filter(F.col("entropy") >= mn) if mn is not None else out

    return FnTransform(fn, name="token_entropy")


def _fetch_details_op(d: Mapping[str, Any], c: Catalog | None) -> Op:
    from .sources.paged import FetchDetails

    return FetchDetails(
        url_template=d.get("url_template"),
        url_col=d.get("url_col"),
        out_col=d.get("out", "payload"),
        max_per_second=d.get("max_per_second"),
        req_options=d.get("req_options"),
    )


def _paged_rest_source(d: Mapping[str, Any]) -> Op:
    from .sources.paged import PagedRestSource

    return PagedRestSource(
        d["url"],
        rows_path=d.get("rows_path"),
        total_path=d.get("total_path"),
        req_options=d.get("req_options"),
        max_pages=d.get("max_pages", 100_000),
        name=d.get("name"),
    )


def _http_ndjson_sink(d: Mapping[str, Any]) -> Op:
    from .sources.writers import HttpNdjsonSink

    return HttpNdjsonSink(
        d["url"],
        req_options=d.get("req_options"),
        batch_rows=d.get("batch_rows", 10_000),
    )


def _mongo_sink(d: Mapping[str, Any]) -> Op:
    from .sources.writers import MongoSink

    return MongoSink(d["url"], batch_rows=d.get("batch_rows", 1000))


def _dq_op(d: Mapping[str, Any], c: Catalog | None) -> Op:
    """Declarative data-quality gate (functions/dq.py).

    ``mode: "report"`` replaces the stream with the long-format check
    report; ``mode: "enforce"`` runs the suite eagerly and raises on
    any failed check, passing rows through untouched otherwise — the
    strict inverse of the reference's silent skip-bad-rows policy
    (job-reader-jsons.js:41-44).
    """
    from .functions import dq

    def build_checks(specs):
        out = []
        for spec in specs:
            kind = spec["kind"]
            if kind == "not_null":
                out.append(dq.not_null(spec["col"]))
            elif kind == "in_range":
                out.append(dq.in_range(spec["col"], spec["lo"], spec["hi"]))
            elif kind == "accepted_values":
                out.append(dq.accepted_values(spec["col"], spec["values"]))
            elif kind == "matches":
                out.append(dq.matches(spec["col"], spec["pattern"]))
            else:
                raise KeyError(f"unknown dq check kind: {kind!r}")
        return out

    def fn(df):
        spark = df.sparkSession
        refs = [
            (r["col"], spark.read.parquet(r["path"]), r["key"])
            for r in d.get("references", [])
        ]
        report = dq.dq_suite(
            df,
            checks=build_checks(d.get("checks", [])),
            unique=[list(u) for u in d.get("unique", [])],
            references=refs,
        )
        if d.get("mode", "report") == "enforce":
            failed = [r["check"] for r in report.collect() if not r["passed"]]
            if failed:
                raise ValueError(f"dq enforce: failed checks: {failed}")
            return df
        return report

    return FnTransform(fn, name="dq")


def _hash_split_op(d: Mapping[str, Any], c: Catalog | None) -> Op:
    from .functions.sampling import hash_split

    return FnTransform(
        lambda df: hash_split(df, d["id"], d["splits"], seed=d.get("seed", 42)),
        name="hash_split",
    )


def _bm25_op(d: Mapping[str, Any], c: Catalog | None) -> Op:
    from .functions.search import bm25_topk

    return FnTransform(
        lambda df: bm25_topk(
            df,
            list(d["terms"]),
            k=d.get("k", 10),
            id_col=d.get("id", "doc_id"),
            text_col=d.get("text", "text"),
        ),
        name="bm25",
    )


def _keywords_op(d: Mapping[str, Any], c: Catalog | None) -> Op:
    """Join each document with its top TF-IDF keyword (q126 shape:
    df as a COUNT window over the posting grid, no join for df)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from .functions.search import tokens

    id_col = d.get("id", "doc_id")
    text_col = d.get("text", "text")

    def fn(df):
        n = df.agg(F.count(F.lit(1)).alias("n_docs"))
        tf = (
            tokens(df, id_col, text_col)
            .groupBy(id_col, "term")
            .agg(F.count(F.lit(1)).alias("tf"))
        )
        scored = (
            tf.withColumn(
                "df", F.count(F.lit(1)).over(Window.partitionBy("term"))
            )
            .crossJoin(F.broadcast(n))
            .withColumn(
                "score",
                F.expr(
                    "CAST(tf AS DOUBLE)"
                    " * (ln((CAST(n_docs AS DOUBLE) + 1.0)"
                    " / (CAST(df AS DOUBLE) + 1.0)) + 1.0)"
                ),
            )
        )
        top = (
            scored.withColumn(
                "rn",
                F.row_number().over(
                    Window.partitionBy(id_col).orderBy(
                        F.desc("score"), F.asc("term")
                    )
                ),
            )
            .filter("rn = 1")
            .select(id_col, F.col("term").alias("keyword"))
        )
        return df.join(top, id_col, "left")

    return FnTransform(fn, name="keywords")


def _skyline_op(d: Mapping[str, Any], c: Catalog | None) -> Op:
    from .functions.frontier import skyline

    mx = tuple(d.get("maximize", ()))
    mn = tuple(d.get("minimize", ()))
    return FnTransform(
        lambda df: skyline(df, maximize=mx, minimize=mn), name="skyline"
    )


def _ols_trend_op(d: Mapping[str, Any], c: Catalog | None) -> Op:
    from .functions.profile import ols_trend

    g, x, y = list(d["group_cols"]), d["x_col"], d["y_col"]
    return FnTransform(lambda df: ols_trend(df, g, x, y), name="ols_trend")


def _containment_dedup_op(d: Mapping[str, Any], c: Catalog | None) -> Op:
    from pyspark.sql import functions as F

    from .functions.dedup import containment_pairs

    col, idc = d.get("text_col", "text"), d.get("id_col", "doc_id")

    def fn(df):
        # drop documents fully contained in a longer document — the
        # curation form of q143 (pairs stream -> anti-join)
        contained = containment_pairs(df, text_col=col, id_col=idc).select(
            F.col("contained_id").alias(idc)
        )
        return df.join(contained, idc, "left_anti")

    return FnTransform(fn, name="containment_dedup")


def _pcm_energy_op(d: Mapping[str, Any], c: Catalog | None) -> Op:
    from .functions.multimodal import pcm_window_energy

    idc = d.get("id_col", "doc_id")
    col = d.get("content_col", "content")
    w = int(d.get("window", 256))
    return FnTransform(
        lambda df: pcm_window_energy(df, id_col=idc, content_col=col, window=w),
        name="pcm_energy",
    )


def _mix_sources_op(d: Mapping[str, Any], c: Catalog | None) -> Op:
    from .functions.sampling import mix_sources

    props = dict(d["proportions"])
    idc = d.get("id_col", "doc_id")

    def fn(df):
        # the operator emits the (id, source, keep_rate) decision;
        # the pipeline op keeps the full selected ROWS
        kept = mix_sources(
            df,
            props,
            budget_frac=float(d.get("budget_frac", 0.4)),
            source_col=d.get("source_col", "source"),
            id_col=idc,
            size_col=d.get("size_col", "n_chars"),
        ).select(idc)
        return df.join(kept, idc, "left_semi")

    return FnTransform(fn, name="mix_sources")


def _resample_sources_op(d: Mapping[str, Any], c: Catalog | None) -> Op:
    from .functions.sampling import resample_sources

    props = dict(d["proportions"])
    idc = d.get("id_col", "doc_id")

    def fn(df):
        # full rows at the resampled grain, tagged with the copy index
        picks = resample_sources(
            df,
            props,
            budget_frac=float(d.get("budget_frac", 1.0)),
            source_col=d.get("source_col", "source"),
            id_col=idc,
            size_col=d.get("size_col", "n_chars"),
        ).select(idc, "copy")
        return df.join(picks, idc)

    return FnTransform(fn, name="resample_sources")


def _temperature_mix_op(d: Mapping[str, Any], c: Catalog | None) -> Op:
    from .functions.sampling import temperature_mix

    idc = d.get("id_col", "doc_id")

    def fn(df):
        kept = temperature_mix(
            df,
            alpha=float(d.get("alpha", 0.5)),
            budget_frac=float(d.get("budget_frac", 0.5)),
            source_col=d.get("source_col", "source"),
            id_col=idc,
            size_col=d.get("size_col", "n_chars"),
        ).select(idc)
        return df.join(kept, idc, "left_semi")

    return FnTransform(fn, name="temperature_mix")


def _heavy_hitters_op(d: Mapping[str, Any], c: Catalog | None) -> Op:
    from .functions.sketch import heavy_hitters

    def fn(df):
        return heavy_hitters(df, d["col"], k=int(d.get("k", 100)))

    return FnTransform(fn, name="heavy_hitters")


def _canonical_url_op(d: Mapping[str, Any], c: Catalog | None) -> Op:
    from pyspark.sql import functions as F

    from .functions.text import canonicalize_url

    col = d.get("col", "url")
    out = d.get("out", col)

    def fn(df):
        return df.withColumn(out, canonicalize_url(F.col(col)))

    return FnTransform(fn, name="canonical_url")


def _semdedup_op(d: Mapping[str, Any], c: Catalog | None) -> Op:
    from pyspark.sql import functions as F

    from .functions.similarity import semdedup

    idc = d.get("id_col", "vec_id")

    def fn(df):
        sm = d.get("seed_mod")
        removed = semdedup(
            df,
            id_col=idc,
            vec_col=d.get("vec_col", "embedding"),
            seed_mod=int(sm) if sm is not None else None,
            threshold=float(d.get("threshold", 0.9)),
        ).select(F.col("dup_id").alias(idc))
        return df.join(removed, idc, "left_anti")

    return FnTransform(fn, name="semdedup")


def _fuzzy_dedup_op(d: Mapping[str, Any], c: Catalog | None) -> Op:
    """Edit-distance near-dup removal: pair the corpus at levenshtein
    <= k (deletion neighborhoods for short strings — the default —
    or the PassJoin segment filter via ``"method": "passjoin"`` for
    long ones), then drop every non-canonical member of each pair
    cluster (keep-lowest-id, the exact_dedup survivorship rule)."""
    from pyspark.sql import functions as F

    from .functions import dedup as dd
    from .functions.graph import dedup_clusters

    idc = d.get("id_col", "doc_id")
    strc = d.get("str_col", "text")
    k = int(d.get("k", 2))
    method = d.get("method", "deletion")

    def fn(df):
        pair_fn = (
            dd.edit_distance_pairs
            if method == "passjoin"
            else dd.deletion_neighborhood_pairs
        )
        pairs = pair_fn(
            df, k=k, id_col=idc, str_col=strc,
            block_col=d.get("block_col"),
        )
        removed = (
            dedup_clusters(
                df, pairs, id_col=idc, block_col=d.get("block_col")
            )
            .filter(~F.col("is_canonical"))
            .select(F.col("doc_id").alias(idc))
        )
        return df.join(removed, idc, "left_anti")

    return FnTransform(fn, name="fuzzy_dedup")


def _decode_image_op(d: Mapping[str, Any], c: Catalog | None) -> Op:
    """Arrow-batched image decode over (path, content) rows. ``codec``
    picks the decoder: ``bmp``/``png``/``jpeg``/``gif`` = the REAL
    pure-stdlib parsers (functions/multimodal.py), ``auto`` = route
    each file by magic bytes (mixed folders), ``fake`` = the
    deterministic digest stand-in for formats whose libraries are
    absent (color JPEG, video). Corrupt files become null-feature
    rows — the reference's warn-and-skip error policy.

    The default codec is ``bmp`` — the original contract from the
    round-6 media wave. Specs over mixed folders must opt into
    ``codec: "auto"`` explicitly (ADVICE r8: an implicit default flip
    to ``auto`` would silently really-decode PNG/JPEG/GIF files that
    previously became null-feature rows, changing downstream
    ``width IS NOT NULL`` filters without any spec edit)."""
    from .functions.multimodal import (
        _fake_decode,
        decode_bmp_features,
        decode_image_auto,
        decode_jpeg_features,
        decode_png_features,
        extract_image_features,
    )
    from .functions.multimodal import sniff_media_type

    def _gif_only(content):
        if sniff_media_type(content) != "gif":
            raise ValueError("not a GIF")
        return decode_image_auto(content)  # frame-0 palette-mapped sums

    codec = d.get("codec", "bmp")
    decoders = {
        "bmp": decode_bmp_features,
        "png": decode_png_features,
        "jpeg": decode_jpeg_features,
        "gif": _gif_only,
        "auto": decode_image_auto,
        "fake": _fake_decode,
    }
    if codec not in decoders:
        raise KeyError(
            f"unknown image codec {codec!r} (supported: bmp, png, jpeg, "
            "gif, auto, fake; color JPEG/video need libraries absent "
            "from this environment)"
        )
    decode = decoders[codec]

    def fn(df):
        return extract_image_features(df, decode_fn=decode)

    return FnTransform(fn, name="decode_image")


def _video_frames_op(d: Mapping[str, Any], c: Catalog | None) -> Op:
    """Real MJPEG-in-AVI frame sampling (r9): parse the AVI container,
    decode every k-th frame's baseline JPEG payload, emit exact
    per-frame stats. ``every_k`` is an int stride or the NAME of an
    int column for per-row adaptive sampling; skipped frames are
    never entropy-decoded. Other fourccs reject with the documented
    ffmpeg deployment-dependency message (PARITY.md codec closure)."""
    from .functions.multimodal import video_frame_stats

    id_col = d.get("id_col", "doc_id")
    content_col = d.get("content_col", "content")
    every_k = d.get("every_k", 1)

    def fn(df):
        return video_frame_stats(
            df, id_col=id_col, content_col=content_col, every_k=every_k
        )

    return FnTransform(fn, name="video_frames")


def _image_ahash_op(d: Mapping[str, Any], c: Catalog | None) -> Op:
    """Real-pixel perceptual fingerprint (r9): decode BMP/PNG/JPEG
    binaries, 6x10-cell average hash with the exact integer mean
    rule; output (id, phash, width, height) feeds the banding dedup
    ops downstream."""
    from .functions.multimodal import image_ahash

    id_col = d.get("id_col", "doc_id")
    content_col = d.get("content_col", "content")
    rows = int(d.get("rows", 6))
    cols = int(d.get("cols", 10))

    def fn(df):
        return image_ahash(
            df, id_col=id_col, content_col=content_col, rows=rows, cols=cols
        )

    return FnTransform(fn, name="image_ahash")


def _simhash_dedup_op(d: Mapping[str, Any], c: Catalog | None) -> Op:
    """Fingerprint near-dup REMOVAL (r10, verdict r9 ask #6): Manku
    combination banding pairs over an integer fingerprint column
    (``sig_col``, e.g. image_ahash's phash or simhash64's sketch),
    connected-component clusters, keep-lowest-id survivorship — the
    q309 pair stage plus the exact_dedup survivorship rule as one
    declarative op. Scale shape: 20-bit combo-key bucket join +
    fixed-round union-find, never all-pairs."""
    from pyspark.sql import functions as F

    from .functions import dedup as dd
    from .functions.graph import dedup_clusters

    idc = d.get("id_col", "doc_id")
    sig = d.get("sig_col", "simhash")
    max_hamming = int(d.get("max_hamming", 4))
    bits = int(d.get("bits", 60))
    blocks = int(d.get("blocks", 6))

    def fn(df):
        sigs = df.select(
            F.col(idc).alias("doc_id"), F.col(sig).alias("simhash")
        )
        pairs = dd.simhash_band_pairs(
            sigs,
            max_hamming=max_hamming,
            bits=bits,
            blocks=blocks,
            collapse_identical=True,
        )
        removed = (
            dedup_clusters(sigs, pairs, id_col="doc_id")
            .filter(~F.col("is_canonical"))
            .select(F.col("doc_id").alias(idc))
        )
        return df.join(removed, idc, "left_anti")

    return FnTransform(fn, name="simhash_dedup")


def _warc_records_op(d: Mapping[str, Any], c: Catalog | None) -> Op:
    """Common Crawl-style WARC shard explode (r10): shard binary ->
    one row per record (warc_type, target_uri, content_type, HTTP
    status/content-type/body for `response` records). gzip-member-
    per-record, whole-shard gzip, and plain framings all sniffed;
    corrupt shards warn-and-skip. Partition-local 1:N."""
    from .functions.web import explode_warc_records

    def fn(df):
        return explode_warc_records(
            df,
            id_col=d.get("id_col", "path"),
            content_col=d.get("content_col", "content"),
            parse_http=bool(d.get("parse_http", True)),
        )

    return FnTransform(fn, name="warc_records")


def _html_text_op(d: Mapping[str, Any], c: Catalog | None) -> Op:
    """HTML -> (title, body) text extraction (r10): stdlib html.parser,
    entities decoded, script/style/noscript/template dropped,
    whitespace normalized. Adds ``title``/``body`` (or ``out`` prefix)
    string columns from the HTML column ``col``."""
    from pyspark.sql import functions as F

    from .functions.web import html_text

    col = d.get("col", "html")
    out = d.get("out", "")
    mode = d.get("mode", "exact")  # r11: 'fast' = compiled-regex twin
    t_name = f"{out}title" if out else "title"
    b_name = f"{out}body" if out else "body"

    def fn(df):
        parts = html_text(F.col(col), mode=mode)
        return df.withColumns(
            {t_name: parts["title"], b_name: parts["body"]}
        )

    return FnTransform(fn, name="html_text")


def _cdx_index_op(d: Mapping[str, Any], c: Catalog | None) -> Op:
    """CDX index build (r11): per-member .warc.gz shard rows ->
    (path, offset, length, warc_type, record_id, target_uri) — the
    compressed member byte ranges random access reads through."""
    from .functions.web import build_cdx_index

    def fn(df):
        return build_cdx_index(
            df,
            path_col=d.get("path_col", "path"),
            content_col=d.get("content_col", "content"),
        )

    return FnTransform(fn, name="cdx_index")


def _warc_fetch_op(d: Mapping[str, Any], c: Catalog | None) -> Op:
    """CDX ranged fetch (r11): (path, offset, length) rows -> records
    via one ranged read + one member inflate each; bad ranges skip."""
    from .functions.web import fetch_warc_records

    def fn(df):
        return fetch_warc_records(
            df, parse_http=bool(d.get("parse_http", True))
        )

    return FnTransform(fn, name="warc_fetch")


def _robots_filter_op(d: Mapping[str, Any], c: Catalog | None) -> Op:
    """robots.txt gate (r11): boolean `allowed` column (or row filter
    with ``drop: true``) from a {host: robots.txt} dict in the spec —
    rules are host-cardinality-sized, the canonical broadcast side."""
    from pyspark.sql import functions as F

    from .functions.web import robots_allowed

    col = d.get("col", "url")
    robots = dict(d.get("robots", {}))
    agent = d.get("agent", "*")
    out = d.get("out", "allowed")

    def fn(df):
        ok = robots_allowed(F.col(col), robots, agent=agent)
        if d.get("drop"):
            return df.where(ok)
        return df.withColumn(out, ok)

    return FnTransform(fn, name="robots_filter")


def _bloom_semi_join_op(d: Mapping[str, Any], c: Catalog | None) -> Op:
    from .functions.sketch import bloom_semi_join

    if "ref" in d:
        if c is None:
            raise KeyError(f"bloom_semi_join ref {d['ref']!r} but no catalog")
        keys_source = c.get(d["ref"])
    else:
        keys_source = Pipeline([ParquetSource(d["path"])])

    def fn(df):
        keys = (
            keys_source.run(df.sparkSession)
            if isinstance(keys_source, Pipeline)
            else keys_source
        )
        return bloom_semi_join(
            df,
            keys,
            d["on"],
            d.get("keys_on", d["on"]),
            bits_per_key=int(d.get("bits_per_key", 12)),
        )

    return FnTransform(fn, name="bloom_semi_join")


def _explode_tar_op(d: Mapping[str, Any], c: Catalog | None) -> Op:
    """1:N tar/tar.gz shard explode over binary rows (WebDataset-style
    ingestion): one output row per regular member."""
    from .functions.multimodal import explode_tar_members

    def fn(df):
        return explode_tar_members(
            df,
            id_col=d.get("id", "path"),
            content_col=d.get("content", "content"),
        )

    return FnTransform(fn, name="explode_tar")


def _webdataset_samples_op(d: Mapping[str, Any], c: Catalog | None) -> Op:
    """WebDataset sample grouping: members -> one row per sample with
    a map<ext, binary> parts column (adjacency-based, shuffle-free)."""
    from .functions.multimodal import webdataset_samples

    def fn(df):
        return webdataset_samples(
            df,
            id_col=d.get("id", "path"),
            content_col=d.get("content", "content"),
        )

    return FnTransform(fn, name="webdataset_samples")


def _compress_text_op(d: Mapping[str, Any], c: Catalog | None) -> Op:
    """Compress a string column into a binary column (stdlib
    gzip/zlib/bz2/lzma, deterministic encodes)."""
    from .functions.multimodal import compress_text

    col = d.get("col", "text")

    def fn(df):
        return df.withColumn(
            d.get("out", col), compress_text(col, d.get("codec", "gzip"))
        )

    return FnTransform(fn, name="compress_text")


def _decompress_text_op(d: Mapping[str, Any], c: Catalog | None) -> Op:
    """Decompress a binary column back to a string column; the default
    ``codec='auto'`` sniffs gzip/zlib/bz2/lzma magics per value.
    Unknown containers / corrupt payloads become NULL."""
    from .functions.multimodal import decompress_text

    col = d.get("col", "content")

    def fn(df):
        return df.withColumn(
            d.get("out", col), decompress_text(col, d.get("codec", "auto"))
        )

    return FnTransform(fn, name="decompress_text")


def _unicode_normalize_op(d: Mapping[str, Any], c: Catalog | None) -> Op:
    """Unicode canonicalization of a text column (NFC/NFD/NFKC/NFKD +
    optional accent strip / casefold), in place or into ``out``."""
    from .functions.text import unicode_normalize

    col = d.get("col", "text")

    def fn(df):
        return df.withColumn(
            d.get("out", col),
            unicode_normalize(
                col,
                d.get("form", "NFC"),
                strip_accents=bool(d.get("strip_accents", False)),
                casefold=bool(d.get("casefold", False)),
            ),
        )

    return FnTransform(fn, name="unicode_normalize")


_REGISTRY.update(
    {
        # corpus curation (functions/text.py, functions/sampling.py,
        # functions/dedup.py — net-new vs reference, SURVEY §2.6)
        "clean_text": _clean_text_op,
        "redact_pii": _redact_pii_op,
        "quality": _quality_op,
        "lang": _lang_op,
        "exact_dedup": _exact_dedup_op,
        "hash_split": _hash_split_op,
        "pack_sequences": _pack_sequences_op,
        "token_entropy": _token_entropy_op,
        "dq": _dq_op,
        # API-case JoinDetail (reference examples/trud.js)
        "fetch_details": _fetch_details_op,
        # retrieval (functions/search.py)
        "bm25": _bm25_op,
        "keywords": _keywords_op,
        # analytics / multimodal net-new (functions/frontier.py,
        # functions/profile.py, functions/dedup.py, functions/multimodal.py)
        "skyline": _skyline_op,
        "ols_trend": _ols_trend_op,
        "containment_dedup": _containment_dedup_op,
        "pcm_energy": _pcm_energy_op,
        "mix_sources": _mix_sources_op,
        "resample_sources": _resample_sources_op,
        "temperature_mix": _temperature_mix_op,
        "heavy_hitters": _heavy_hitters_op,
        "canonical_url": _canonical_url_op,
        "semdedup": _semdedup_op,
        "fuzzy_dedup": _fuzzy_dedup_op,
        "bloom_semi_join": _bloom_semi_join_op,
        "decode_image": _decode_image_op,
        "video_frames": _video_frames_op,
        "image_ahash": _image_ahash_op,
        "simhash_dedup": _simhash_dedup_op,
        "warc_records": _warc_records_op,
        "html_text": _html_text_op,
        "cdx_index": _cdx_index_op,
        "warc_fetch": _warc_fetch_op,
        "robots_filter": _robots_filter_op,
        "explode_tar": _explode_tar_op,
        "compress_text": _compress_text_op,
        "decompress_text": _decompress_text_op,
        "webdataset_samples": _webdataset_samples_op,
        "unicode_normalize": _unicode_normalize_op,
    }
)


def op_from_spec(d: Mapping[str, Any], catalog: Catalog | None = None) -> Op:
    """One spec node -> Op. ``{"op": "ref"}`` resolves from the catalog
    (reference ensureDepts — unresolved refs are hard errors)."""
    kind = d.get("op")
    if kind == "ref":
        if catalog is None:
            raise KeyError(f"ref {d.get('name')!r} but no catalog")
        return catalog.get(d["name"])
    if kind == "pipeline":
        return from_spec(d, catalog)
    factory = _REGISTRY.get(kind)
    if factory is None:
        raise KeyError(f"unknown op type: {kind!r}")
    op = factory(d, catalog)
    if "name" in d:  # reference Job.name field
        op.name = d["name"]
    op._spec = dict(d)
    return op


def from_spec(spec: Mapping[str, Any], catalog: Catalog | None = None) -> Pipeline:
    """Pipeline document -> Pipeline. ``{"name", "chain": [nodes]}``."""
    pipe = Pipeline(
        [op_from_spec(node, catalog) for node in spec["chain"]],
        catalog=catalog,
        name=spec.get("name"),
    )
    pipe._spec = dict(spec)
    return pipe


def to_spec(op: Op) -> dict[str, Any]:
    """Serialize a spec-built op/pipeline back to its document
    (reference jobs/job.js:49-64). Only spec-built ops carry their
    document; hand-built ops raise."""
    spec = getattr(op, "_spec", None)
    if spec is None:
        raise ValueError(f"{op!r} was not built from a spec")
    return spec


def dump_catalog(catalog: Catalog, path: str) -> None:
    """Persist a catalog of spec-built jobs as one JSON file — the
    file-backed stand-in for the reference's MongoDB job store
    (SURVEY §1.4: "catalog = files or a table, not Mongo"). Hand-built
    ops (no spec document) are skipped; persist those as code."""
    import json

    docs = {}
    for name, op in catalog._jobs.items():
        spec = getattr(op, "_spec", None)
        if spec is not None:
            docs[name] = spec
    with open(path, "w", encoding="utf-8") as fh:
        json.dump(docs, fh, indent=2)


def load_catalog(path: str) -> Catalog:
    """Rebuild a catalog from a JSON job-store file; by-name refs
    between jobs resolve against the catalog being built (documents
    are loaded in file order, so forward refs follow the same
    save-dependencies-first discipline as the reference)."""
    import json

    with open(path, encoding="utf-8") as fh:
        docs = json.load(fh)
    catalog = Catalog()
    for name, spec in docs.items():
        op = (
            from_spec(spec, catalog)
            if spec.get("op") == "pipeline" or "chain" in spec
            else op_from_spec(spec, catalog)
        )
        op.name = name
        catalog.save(op)
    return catalog


# -- r11-continuation spec ops: storage-dedup, quantile sketch, and
# -- privacy release join the JSON-able op surface


def _cdc_dedup_op(d: Mapping[str, Any], c: Catalog | None) -> Op:
    """{"op": "cdc_dedup", "id_col": ..., "text_col": ..., "window":
    16, "mask": 32} -> per-document incremental-store stats under
    corpus-wide content-defined chunk dedup (functions/dedup.py
    cdc_store_stats)."""
    from .functions.dedup import cdc_store_stats

    idc = d.get("id_col", "doc_id")
    txt = d.get("text_col", "text")
    window = int(d.get("window", 16))
    mask = int(d.get("mask", 32))
    return FnTransform(
        lambda df: cdc_store_stats(df, idc, txt, window, mask),
        name="cdc_dedup",
    )


def _quantile_sketch_op(d: Mapping[str, Any], c: Catalog | None) -> Op:
    """{"op": "quantile_sketch", "col": ..., "qs": [0.5, ...],
    "delta": 100} -> one row per requested quantile (q, est) from a
    merged t-digest (functions/sketch.py). The digest builds
    partition-locally and merges driver-side — the bounded-collect
    contract documented at tdigest_partials."""
    from .functions.sketch import (
        tdigest_merge,
        tdigest_partials,
        tdigest_quantile,
    )

    col = d.get("col", "value")
    qs = [float(q) for q in d.get("qs", [0.25, 0.5, 0.75])]
    delta = int(d.get("delta", 100))

    def fn(df):
        spark = df.sparkSession
        parts = tdigest_partials(df, col, delta).collect()
        digest = tdigest_merge(
            [(r["mean"], r["weight"]) for r in parts], delta
        )
        return spark.createDataFrame(
            [(q, float(tdigest_quantile(digest, q))) for q in qs],
            schema="q double, est double",
        )

    return FnTransform(fn, name="quantile_sketch")


def _dp_release_op(d: Mapping[str, Any], c: Catalog | None) -> Op:
    """{"op": "dp_release", "group_cols": [...], "seed": ...,
    "k_anon": 5} -> noisy per-group counts (functions/privacy.py
    dp_release_counts). ``seed`` is REQUIRED: an implicit default
    would silently reuse noise across releases, which is exactly the
    privacy failure the mechanism exists to prevent."""
    from .functions.privacy import dp_release_counts

    if "seed" not in d:
        raise KeyError("dp_release requires an explicit 'seed'")
    cols = list(d.get("group_cols", []))
    if not cols:
        raise KeyError("dp_release requires non-empty 'group_cols'")
    return FnTransform(
        lambda df: dp_release_counts(
            df,
            cols,
            seed=str(d["seed"]),
            k_anon=int(d.get("k_anon", 0)),
            k_max=int(d.get("k_max", 16)),
        ),
        name="dp_release",
    )


_REGISTRY.update(
    {
        "cdc_dedup": _cdc_dedup_op,
        "quantile_sketch": _quantile_sketch_op,
        "dp_release": _dp_release_op,
    }
)
