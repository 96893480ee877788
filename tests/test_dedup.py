from node_etl_spark.functions import dedup as D
from pyspark.sql import functions as F


def docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_exact_dup_groups_normalizes(spark):
    df = docs_df(
        spark,
        [(1, "Hello  World"), (2, "hello world"), (3, "different doc")],
    )
    out = {r.keep_id: r.n_copies for r in D.exact_dup_groups(df).collect()}
    assert out == {1: 2, 3: 1}  # 1 and 2 normalize to the same content


def test_shingle_rows_short_doc_empty(spark):
    df = docs_df(spark, [(1, "one two"), (2, "a b c d")])
    rows = D.shingle_rows(df, n=3).collect()
    assert {r.doc_id for r in rows} == {2}
    assert {r.shingle for r in rows} == {"a_b_c", "b_c_d"}


def test_minhash_finds_planted_near_dup(spark):
    base = " ".join(f"w{i}" for i in range(40))
    near = " ".join(f"w{i}" for i in range(39)) + " zz"  # one token changed
    far = " ".join(f"x{i}" for i in range(40))
    df = docs_df(spark, [(1, base), (2, near), (3, far)])
    pairs = D.minhash_dedup(df, threshold=0.8).collect()
    assert [(p.d1, p.d2) for p in pairs] == [(1, 2)]
    assert pairs[0].jac > 0.85


def test_lsh_candidates_subset_of_jaccard(spark, sf_dir):
    # LSH-verified pairs must be a subset of the exact all-pairs result
    from node_etl_spark.tables import table

    docs = table(spark, sf_dir, "documents")
    sh = D.shingle_rows(docs)
    exact = {(r.d1, r.d2) for r in D.jaccard_pairs(sh, 0.8).collect()}
    lsh = {(r.d1, r.d2) for r in D.minhash_dedup(docs, threshold=0.8).collect()}
    assert lsh <= exact
    assert len(lsh) >= 0.8 * len(exact)  # high recall at jac>=0.8


def test_simhash_identical_docs_hamming_zero(spark):
    df = docs_df(spark, [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "x y z")])
    sigs = D.simhash32(df)
    vals = {r.doc_id: r.simhash for r in sigs.collect()}
    assert vals[1] == vals[2] != vals[3]
    pairs = {(r.d1, r.d2): r.hamming for r in D.simhash_pairs(sigs, max_hamming=0).collect()}
    assert pairs == {(1, 2): 0}


def test_prefix_filter_is_exact(spark, sf_dir):
    # PPJoin prefix candidates must not lose any qualifying pair:
    # prefix-filtered output == plain inverted-index output
    from node_etl_spark.functions.dedup import jaccard_pairs, shingle_rows
    from node_etl_spark.tables import table

    sh = shingle_rows(table(spark, sf_dir, "documents"))
    plain = {(r.d1, r.d2, r.jac) for r in jaccard_pairs(sh, 0.8).collect()}
    pref = {
        (r.d1, r.d2, r.jac)
        for r in jaccard_pairs(sh, 0.8, prefix_filter=True).collect()
    }
    assert plain == pref and len(plain) > 0


def test_dedup_ops_tolerate_null_and_empty_text(spark):
    # reference policy: malformed rows skipped, pipeline keeps going
    from node_etl_spark.functions.dedup import (
        exact_dup_groups,
        minhash_dedup,
        shingle_rows,
        simhash32,
    )

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "a b"), (4, "one two three four"),
         (5, "one two three four")],
        "doc_id bigint, text string",
    )
    # shingles: null/empty/short docs contribute zero rows, no crash
    sh = shingle_rows(df)
    assert {r.doc_id for r in sh.collect()} == {4, 5}
    pairs = minhash_dedup(df, threshold=0.8)
    assert {(r.d1, r.d2) for r in pairs.collect()} == {(4, 5)}
    # exact dedup counts null and empty separately (md5(NULL) is null)
    groups = exact_dup_groups(df)
    assert groups.count() == 4  # null-fp, '', 'a b', the dup pair
    # simhash ignores null text rows rather than erroring
    sigs = simhash32(df.filter("text IS NOT NULL"))
    assert sigs.count() == 4


def test_decontaminate_pairs(spark):
    from node_etl_spark.functions.dedup import decontaminate_pairs

    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),   # shares 5-gram w/ 10
            (2, "one two three four five six"),           # no overlap
            (3, "common common common common common x"),  # boilerplate only
            (4, "common common common common common z"),  # boilerplate only
        ],
        "doc_id int, text string",
    )
    test = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta epsilon eta"),
            (11, "common common common common common y"),
        ],
        "doc_id int, text string",
    )
    got = decontaminate_pairs(train, test, n=5).collect()
    pairs = {(r.train_doc, r.test_doc): r.n_shared for r in got}
    # without max_df: the real overlap AND the boilerplate pairs
    assert pairs == {(1, 10): 1, (3, 11): 1, (4, 11): 1}
    # boilerplate shingle is in 3 docs, the real overlap in 2 ->
    # max_df=2 keeps contamination evidence, drops the common phrase
    got2 = decontaminate_pairs(train, test, n=5, max_df=2).collect()
    assert {(r.train_doc, r.test_doc) for r in got2} == {(1, 10)}


def test_simhash_preserves_string_id_type(spark):
    # id_col contract: output id type follows the input column type
    # (ADVICE r01: schema used to hardcode `doc_id long`)
    from node_etl_spark.functions.dedup import simhash32

    df = spark.createDataFrame(
        [("a", "x y z"), ("b", "x y z")], "name string, text string"
    )
    out = simhash32(df, text_col="text", id_col="name")
    assert dict(out.dtypes) == {"doc_id": "string", "simhash": "bigint"}
    rows = {r.doc_id: r.simhash for r in out.collect()}
    assert set(rows) == {"a", "b"} and rows["a"] == rows["b"]


def test_jaccard_auto_selects_prefix_filter(spark):
    # the auto path computes sum(df*(df-1)/2) over shingle document
    # frequencies and flips to PPJoin above the budget; both regimes
    # must return identical (exact) pairs, and the switchover is
    # visible as the df-ranking window in the executed plan
    base = " ".join(f"w{i}" for i in range(30))
    near = " ".join(f"w{i}" for i in range(29)) + " zz"
    df = docs_df(spark, [(1, base), (2, near), (3, "aa bb cc dd ee")])

    def plan_of(out):
        return out._jdf.queryExecution().executedPlan().toString()

    sh = D.shingle_rows(df)
    plain = D.jaccard_pairs(sh, threshold=0.8, auto_pairs_budget=10**9)
    assert "row_number" not in plan_of(plain)  # under budget: plain join
    ppjoin = D.jaccard_pairs(
        D.shingle_rows(df), threshold=0.8, auto_pairs_budget=0
    )
    assert "row_number" in plan_of(ppjoin)  # over budget: PPJoin prefixes
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, ppjoin.collect())
    )


# ------------------------------------------- substring containment


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_containment_finds_quoted_doc(spark):
    from node_etl_spark.functions.dedup import containment_pairs

    base = "the quick brown fox jumps over the lazy dog near the river bank"
    rows = [
        (1, base),
        (2, "PREFIX words here " + base + " and a long suffix follows"),
        (3, "completely unrelated content about spark partitions and shuffles"),
    ]
    got = {
        (r.contained_id, r.container_id)
        for r in containment_pairs(_docs(spark, rows)).collect()
    }
    assert got == {(1, 2)}


def test_containment_normalizes_whitespace_and_case(spark):
    from node_etl_spark.functions.dedup import containment_pairs

    rows = [
        (1, "Alpha   Beta\tGamma Delta Epsilon Zeta"),
        (2, "intro alpha beta gamma delta epsilon zeta outro is much longer"),
    ]
    got = {
        (r.contained_id, r.container_id)
        for r in containment_pairs(_docs(spark, rows)).collect()
    }
    assert got == {(1, 2)}


def test_containment_equal_texts_emit_once_smaller_id_contained(spark):
    from node_etl_spark.functions.dedup import containment_pairs

    t = "identical content appears twice in this corpus of documents"
    got = {
        (r.contained_id, r.container_id)
        for r in containment_pairs(_docs(spark, [(5, t), (9, t)])).collect()
    }
    assert got == {(5, 9)}


def test_containment_short_docs_out_of_scope(spark):
    from node_etl_spark.functions.dedup import containment_pairs

    # contained side under window + k - 1 = 11 normalized chars is
    # below the winnowing guarantee and excluded by contract
    rows = [(1, "tiny text"), (2, "this holds tiny text inside a longer doc")]
    assert containment_pairs(_docs(spark, rows)).count() == 0


def test_containment_transitive_chain_all_pairs(spark):
    from node_etl_spark.functions.dedup import containment_pairs

    s = "core shared sentence fragment"
    mid = "left pad " + s + " right pad"
    rows = [
        (1, s),
        (2, mid),
        (3, "outer prefix " + mid + " outer suffix"),
    ]
    got = {
        (r.contained_id, r.container_id)
        for r in containment_pairs(_docs(spark, rows)).collect()
    }
    assert got == {(1, 2), (1, 3), (2, 3)}


# ------------------------------------------- sorted-neighborhood


def test_global_row_index_matches_total_order(spark):
    from node_etl_spark.util import global_row_index

    df = spark.createDataFrame(
        [(i, f"k{i % 7:02d}") for i in range(200)], "rid long, key string"
    ).repartition(8)
    out = global_row_index(df, ["key", "rid"]).collect()
    expected = sorted(((r.key, r.rid) for r in out))
    got = sorted(out, key=lambda r: r.idx)
    assert [r.idx for r in got] == list(range(200))
    assert [(r.key, r.rid) for r in got] == expected


def test_grouped_row_index_matches_group_window(spark):
    # round-8 window sweep: the distributed per-group rank must be
    # bit-identical to row_number() OVER (PARTITION BY grp ORDER BY
    # v, rid), including when one group spans many range partitions
    # and when a group key is NULL
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from node_etl_spark.util import grouped_row_index

    rows = [
        (i, None if i % 97 == 0 else f"g{i % 3}", (i * 37) % 101)
        for i in range(5000)
    ]
    df = spark.createDataFrame(rows, "rid long, grp string, v long").repartition(16)
    out = grouped_row_index(
        df, ["grp"], ["v", "rid"], "gidx", num_partitions=12
    )
    w = Window.partitionBy("grp").orderBy("v", "rid")
    want = df.select(
        "rid", (F.row_number().over(w) - 1).cast("bigint").alias("gidx")
    )
    got = {r.rid: r.gidx for r in out.collect()}
    exp = {r.rid: r.gidx for r in want.collect()}
    assert got == exp


def test_sorted_neighborhood_window_pairs_exact(spark):
    from node_etl_spark.functions.dedup import sorted_neighborhood_pairs

    df = spark.createDataFrame(
        [(i, f"name{i:03d}") for i in range(10)], "rid long, key string"
    )
    pairs = {
        (r.id_a, r.id_b)
        for r in sorted_neighborhood_pairs(df, "key", "rid", window=3).collect()
    }
    expected = {
        (a, b) for a in range(10) for b in range(10) if 0 < b - a < 3
    }
    assert pairs == expected


def test_sorted_neighborhood_crosses_equal_keys_deterministically(spark):
    from node_etl_spark.functions.dedup import sorted_neighborhood_pairs

    # duplicate keys: ranks tie-break on id, every adjacent pair found
    df = spark.createDataFrame(
        [(1, "same"), (2, "same"), (3, "same")], "rid long, key string"
    )
    pairs = {
        (r.id_a, r.id_b)
        for r in sorted_neighborhood_pairs(df, "key", "rid", window=2).collect()
    }
    assert pairs == {(1, 2), (2, 3)}


def test_simhash_band_pairs_complete_at_max_hamming(spark):
    # four flipped bits landing in FOUR DIFFERENT blocks: single-chunk
    # banding with chunks <= max_hamming misses this pair; the 2-of-6
    # combination banding must find it (pigeonhole: 2 blocks untouched)
    base = (1 << 60) - 1
    h2 = base ^ (1 << 1) ^ (1 << 11) ^ (1 << 21) ^ (1 << 31)  # blocks 0-3
    h3 = base ^ (1 << 1) ^ (1 << 2) ^ (1 << 3) ^ (1 << 4) ^ (1 << 5)  # ham 5
    sigs = spark.createDataFrame(
        [(1, base), (2, h2), (3, h3)], "doc_id long, simhash long"
    )
    pairs = {(r.d1, r.d2): r.hamming for r in
             D.simhash_band_pairs(sigs, max_hamming=4).collect()}
    assert pairs[(1, 2)] == 4
    assert (1, 3) not in pairs  # hamming 5 verified away


def test_simhash60_matches_manual(spark):
    import hashlib

    df = spark.createDataFrame([(7, "a b")], "doc_id long, text string")
    got = D.simhash60(df).first()["simhash"]
    hs = [int(hashlib.md5(t.encode()).hexdigest()[:15], 16) for t in ("a", "b")]
    expect = sum(
        1 << i
        for i in range(60)
        if sum(1 if (h >> i) & 1 else -1 for h in hs) > 0
    )
    assert got == expect


def test_edit_distance_pairs_matches_brute_force(spark):
    import random

    rng = random.Random(7)
    alpha = "abcdef"
    base_words = ["".join(rng.choice(alpha) for _ in range(rng.randint(6, 12)))
                  for _ in range(12)]
    rows = []
    rid = 0
    for w in base_words:
        for _ in range(4):
            s = list(w)
            for _ in range(rng.randint(0, 5)):
                op = rng.choice("ids")
                p = rng.randrange(len(s)) if s else 0
                if op == "i":
                    s.insert(p, rng.choice(alpha))
                elif op == "d" and s:
                    del s[p]
                elif s:
                    s[p] = rng.choice(alpha)
            rows.append((rid, "".join(s)))
            rid += 1
    rows.append((rid, "ab"))      # short-string fallback branch
    rows.append((rid + 1, "ac"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.d1, r.d2, r.dist) for r in
           D.edit_distance_pairs(df, k=4).collect()}
    a, b = df.alias("a"), df.alias("b")
    brute = {
        (r.d1, r.d2, r.dist)
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("d1"),
            F.col("b.doc_id").alias("d2"),
            F.levenshtein(F.col("a.text"), F.col("b.text")).cast("int").alias("dist"),
        )
        .filter("dist <= 4")
        .collect()
    }
    assert got == brute
    assert brute  # the generator actually produced close pairs


def test_deletion_neighborhood_pairs_matches_brute_force(spark):
    import random

    rng = random.Random(11)
    alpha = "abcde"
    words = ["".join(rng.choice(alpha) for _ in range(rng.randint(5, 10)))
             for _ in range(10)]
    rows, rid = [], 0
    for w in words:
        for _ in range(5):
            s = list(w)
            for _ in range(rng.randint(0, 3)):
                op = rng.choice("ids")
                p = rng.randrange(len(s)) if s else 0
                if op == "i":
                    s.insert(p, rng.choice(alpha))
                elif op == "d" and s:
                    del s[p]
                elif s:
                    s[p] = rng.choice(alpha)
            rows.append((rid, "".join(s)))
            rid += 1
    rows += [(rid, ""), (rid + 1, "a"), (rid + 2, "b"), (rid + 3, "ab")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for k in (1, 2):
        got = {(r.d1, r.d2, r.dist) for r in
               D.deletion_neighborhood_pairs(df, k=k).collect()}
        a, b = df.alias("a"), df.alias("b")
        brute = {
            (r.d1, r.d2, r.dist)
            for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
            .select(
                F.col("a.doc_id").alias("d1"),
                F.col("b.doc_id").alias("d2"),
                F.levenshtein(F.col("a.text"), F.col("b.text"))
                .cast("int").alias("dist"),
            )
            .filter(f"dist <= {k}")
            .collect()
        }
        assert got == brute, f"k={k}"
        assert brute


def test_edit_distance_short_guard_raises_unblocked(spark):
    # 8 strings shorter than k+1=5 chars with limit=5 -> the
    # unblocked straggler pass would be all-pairs: must raise
    import pytest

    rows = [(i, "ab"[: 1 + i % 2] + "cd") for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    with pytest.raises(ValueError, match="short_allpairs_limit"):
        D.edit_distance_pairs(df, k=4, short_allpairs_limit=5)


def test_edit_distance_short_guard_opt_out_and_correct(spark):
    # limit=None accepts the quadratic pass and still returns exact
    # pairs over the short strings
    rows = [(0, "ab"), (1, "ac"), (2, "zz"), (3, "ab")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.d1, r.d2, r.dist) for r in
           D.edit_distance_pairs(df, k=1, short_allpairs_limit=None)
           .collect()}
    assert (0, 1, 1) in got and (0, 3, 0) in got and (1, 3, 1) in got
    assert not any({d1, d2} == {2} for d1, d2, _ in got)


def test_edit_distance_short_guard_is_per_block_when_blocked(spark):
    # 12 short strings total but max 3 per block: with block_col set
    # the straggler join is per-block bounded, so limit=5 must PASS
    # (the r5 guard wrongly counted the corpus-wide total and made
    # its own "set block_col" advice impossible to follow)
    rows = [(i, "ab" + "cd"[: i % 2], f"blk{i // 3}") for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, text string, b string")
    out = D.edit_distance_pairs(
        df, k=4, block_col="b", short_allpairs_limit=5
    )
    assert out.count() >= 1  # same-block near-dups found

    # ...but one oversized block must still trip it
    rows_big = [(i, "ab", "same") for i in range(7)]
    df_big = spark.createDataFrame(
        rows_big, "doc_id long, text string, b string"
    )
    import pytest

    with pytest.raises(ValueError, match="in one b block"):
        D.edit_distance_pairs(
            df_big, k=4, block_col="b", short_allpairs_limit=5
        )


def test_duplicate_spans_merges_planted_repeats(spark):
    # Two docs share an 10-token verbatim passage; doc 3 repeats a
    # 8-token run internally; doc 4 is clean. Spans must be maximal
    # (one merged span, not per-window rows) and 1-based inclusive.
    passage = " ".join(f"p{i}" for i in range(10))
    uniq = lambda tag, n: " ".join(f"{tag}{i}" for i in range(n))
    run = " ".join(f"r{i}" for i in range(8))
    rows = [
        (1, uniq("a", 5) + " " + passage + " " + uniq("b", 5)),
        (2, passage + " " + uniq("c", 12)),
        (3, run + " " + uniq("d", 9) + " " + run),
        (4, uniq("e", 30)),
    ]
    df = docs_df(spark, rows)
    got = {(r.doc_id, r.span_start, r.span_end, r.span_tokens)
           for r in D.duplicate_spans(df, k=8).collect()}
    # doc 1: passage occupies tokens 6..15; doc 2: tokens 1..10
    # doc 3: run at 1..8 and again at 18..25 (8 + 9 + 8 tokens)
    assert got == {
        (1, 6, 15, 10),
        (2, 1, 10, 10),
        (3, 1, 8, 8),
        (3, 18, 25, 8),
    }


def test_duplicate_spans_ignores_short_and_null_docs(spark):
    rows = [(1, None), (2, "a b c"), (3, "x " * 3)]
    df = docs_df(spark, rows)
    assert D.duplicate_spans(df, k=8).collect() == []


def test_simhash60_carry_cols_pass_through(spark):
    df = spark.createDataFrame(
        [(1, "a b", "web"), (2, None, "web"), (3, "c d", "books")],
        "doc_id bigint, text string, src string",
    )
    rows = {r.doc_id: r.src for r in
            D.simhash60(df, carry_cols=["src"]).collect()}
    assert rows == {1: "web", 3: "books"}  # null-text row dropped


def test_simhash_band_pairs_segment_scoped(spark):
    # identical signatures across segments must NOT pair; within a
    # segment they must, and the segment column rides the output
    sigs = spark.createDataFrame(
        [(1, 42, "en|web"), (2, 42, "en|books"), (3, 42, "en|web"),
         (4, 40, "en|web")],  # hamming(42,40)=1, same segment
        "doc_id long, simhash long, seg string",
    )
    got = {(r.d1, r.d2): (r.hamming, r.seg) for r in
           D.simhash_band_pairs(
               sigs, max_hamming=2, segment_col="seg").collect()}
    assert got == {(1, 3): (0, "en|web"),
                   (1, 4): (1, "en|web"),
                   (3, 4): (1, "en|web")}


def test_simhash_dedup_groups_canonical_is_min(spark):
    from node_etl_spark.functions import graph as G

    docs = spark.createDataFrame(
        [(i, "t", "s1" if i < 4 else "s2") for i in range(1, 7)],
        "doc_id bigint, text string, seg string",
    )
    # chain 1-2, 2-3 in s1; 5-6 in s2; doc 4 clean
    pairs = spark.createDataFrame(
        [(1, 2, 0, "s1"), (2, 3, 1, "s1"), (5, 6, 2, "s2")],
        "d1 bigint, d2 bigint, hamming int, seg string",
    )
    out = {r.doc_id: (r.cluster_id, r.is_canonical) for r in
           G.dedup_clusters(docs, pairs, block_col="seg").collect()}
    assert out == {1: (1, True), 2: (1, False), 3: (1, False),
                   5: (5, True), 6: (5, False)}


def test_incremental_neardup_probe_finds_planted_match(spark, tmp_path):
    corpus = docs_df(spark, [
        (1, " ".join(f"w{i}" for i in range(40))),
        (2, " ".join(f"x{i}" for i in range(40))),
    ])
    # batch doc 10 is a one-token edit of corpus doc 1; 11 is novel
    batch = docs_df(spark, [
        (10, " ".join(f"w{i}" for i in range(39)) + " zz"),
        (11, " ".join(f"y{i}" for i in range(40))),
    ])
    path = str(tmp_path / "idx")
    D.neardup_index_write(corpus, path)
    got = D.neardup_index_probe(batch, path, threshold=0.8).collect()
    assert [(r.new_id, r.corpus_id) for r in got] == [(10, 1)]
    assert got[0].jac > 0.85
    # probe never pairs batch docs with each other: novel doc absent
    # appending the batch = appending its bucket/shingle rows; the
    # index parquets exist and round-trip
    assert spark.read.parquet(f"{path}/buckets").count() == 8  # 2 docs x 4 bands


def test_collapse_identical_components_equal_full_pairs(spark):
    from node_etl_spark.functions import dedup as D
    from node_etl_spark.functions import graph as G

    # sketches: 0b0000 x3 (ids 1,2,3), 0b0001 (id 4, hamming 1 to the
    # zeros), 0b1111 x2 (ids 5,6, far away) -> components {1,2,3,4}
    # and {5,6} under max_hamming=1
    rows = [(1, 0, "s"), (2, 0, "s"), (3, 0, "s"),
            (4, 1, "s"), (5, 15, "s"), (6, 15, "s")]
    sigs = spark.createDataFrame(
        rows, "doc_id bigint, simhash bigint, seg string"
    )
    docs = sigs.select("doc_id", "seg")

    def clusters(collapse):
        pairs = D.simhash_band_pairs(
            sigs, max_hamming=1, bits=4, blocks=2, segment_col="seg",
            collapse_identical=collapse,
        )
        out = G.dedup_clusters(docs, pairs, block_col="seg")
        return {(r.doc_id, r.cluster_id) for r in out.collect()}

    full, star = clusters(False), clusters(True)
    assert star == full
    assert {(1, 1), (2, 1), (3, 1), (4, 1), (5, 5), (6, 5)} == star


def test_collapse_identical_emits_stars_not_cliques(spark):
    from node_etl_spark.functions import dedup as D

    # 4 identical sketches: full form emits C(4,2)=6 pairs, collapsed
    # form emits 3 star edges at hamming 0
    sigs = spark.createDataFrame(
        [(i, 7) for i in range(1, 5)], "doc_id bigint, simhash bigint"
    )
    full = D.simhash_band_pairs(sigs, max_hamming=1, bits=4, blocks=2)
    star = D.simhash_band_pairs(
        sigs, max_hamming=1, bits=4, blocks=2, collapse_identical=True
    )
    assert full.count() == 6
    rows = star.collect()
    assert len(rows) == 3
    assert all(r.d1 == 1 and r.hamming == 0 for r in rows)


def test_cdc_chunks_shift_resilience_and_reassembly(spark):
    from node_etl_spark.functions.dedup import cdc_chunks

    base = (
        "The quick brown fox jumps over the lazy dog. " * 12
        + "A genuinely unique closing sentence appears here."
    )
    shifted = "XYZ " + base  # 4-char prefix insertion
    df = spark.createDataFrame(
        [(1, base), (2, shifted)], schema="doc_id bigint, text string"
    )
    rows = cdc_chunks(df, "doc_id", "text").collect()
    by_doc = {1: [], 2: []}
    for r in rows:
        by_doc[r["id"]].append((r["chunk_idx"], r["chunk_md5"], r["chunk_len"]))
    for d in by_doc.values():
        d.sort()
    # chunk lengths reassemble to the document
    assert sum(l for _, _, l in by_doc[1]) == len(base)
    assert sum(l for _, _, l in by_doc[2]) == len(shifted)
    # content-defined property: after the insertion, MOST chunk hashes
    # are shared (a fixed-block chunker would share none)
    h1 = {h for _, h, _ in by_doc[1]}
    h2 = {h for _, h, _ in by_doc[2]}
    assert len(h1 & h2) / len(h1) > 0.7

    # empty documents produce no chunks
    empty = spark.createDataFrame(
        [(3, "")], schema="doc_id bigint, text string"
    )
    assert cdc_chunks(empty, "doc_id", "text").count() == 0


def test_cdc_store_stats_charges_first_occurrence_once(spark):
    from node_etl_spark.functions.dedup import cdc_store_stats

    from node_etl_spark.functions.dedup import cdc_chunks

    text = "the corpus repeats this exact sentence over and over again. " * 10
    df = spark.createDataFrame(
        [(1, text), (2, text)], schema="doc_id bigint, text string"
    )
    out = {r["doc_id"]: r for r in cdc_store_stats(df).collect()}
    # identical docs chunk identically
    assert out[1]["n_chunks"] == out[2]["n_chunks"]
    # dedup also fires WITHIN doc 1 (the text repeats), so doc 1 owns
    # exactly its distinct hashes — and doc 2 owns nothing at all
    distinct1 = (
        cdc_chunks(df.where("doc_id = 1"), "doc_id", "text")
        .select("chunk_md5")
        .distinct()
        .count()
    )
    assert out[1]["n_new_chunks"] == distinct1 < out[1]["n_chunks"]
    assert out[2]["n_new_chunks"] == 0
    assert out[2]["stored_chars"] == 0
    assert 0 < out[1]["stored_chars"] < len(text)
