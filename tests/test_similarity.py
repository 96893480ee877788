import math

from node_etl_spark.functions import similarity as S


def vec_df(spark, rows):
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def test_brute_force_topk_exact(spark):
    df = vec_df(
        spark,
        [
            (1, [1.0, 0.0]),
            (2, [0.9, 0.1]),   # closest to 1
            (3, [0.0, 1.0]),   # orthogonal to 1
            (4, [-1.0, 0.0]),  # opposite
        ],
    )
    out = S.brute_force_topk(df, df.filter("vec_id = 1"), k=3)
    rows = sorted(out.collect(), key=lambda r: r.rank)
    assert [r.neighbor_id for r in rows] == [2, 3, 4]
    assert abs(rows[0].sim - 0.9 / math.sqrt(0.82)) < 1e-6


def test_lsh_topk_recall_on_clusters(spark):
    # three tight clusters; LSH must put cluster-mates in the same bucket
    rows = []
    vid = 0
    for cx, cy in [(1.0, 0.0), (0.0, 1.0), (-1.0, -1.0)]:
        for j in range(5):
            rows.append((vid, [cx + 0.01 * j, cy + 0.013 * j, cx * 0.5, cy * 0.5]))
            vid += 1
    df = vec_df(spark, rows)
    out = S.lsh_topk(df, df, dim=4, k=1, n_tables=4, planes_per_table=3)
    top1 = {r.query_id: r.neighbor_id for r in out.collect()}
    same_cluster = sum(1 for q, n in top1.items() if q // 5 == n // 5)
    assert same_cluster >= 0.9 * len(top1)


def test_lsh_vs_brute_force_recall(spark, sf_dir):
    from node_etl_spark.tables import table

    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter("vec_id < 10")
    bf = {(r.query_id, r.neighbor_id) for r in S.brute_force_topk(emb, queries, k=5).collect()}
    ann = {(r.query_id, r.neighbor_id) for r in S.lsh_topk(emb, queries, dim=64, k=5).collect()}
    # approximate: expect meaningful overlap with exact top-5
    assert len(bf & ann) / len(bf) >= 0.5


def test_ivf_topk_recall_vs_brute_force(spark, sf_dir):
    from node_etl_spark.functions.similarity import brute_force_topk, ivf_topk
    from node_etl_spark.tables import table

    emb = table(spark, sf_dir, "embeddings")
    q = emb.filter("vec_id < 20")
    exact = {(r.query_id, r.neighbor_id) for r in brute_force_topk(emb, q, k=5).collect()}
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(emb, q, k=5, n_cells=8, n_probe=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5  # probing half the cells must recover >=50%
    # every query still gets k results (cells are never empty enough to starve)
    per_q = {}
    for qid, _ in approx:
        per_q[qid] = per_q.get(qid, 0) + 1
    assert all(v == 5 for v in per_q.values())


def test_blocked_gemm_rejects_non_integral_ids(spark):
    # the blocked operators pack ids into int64 arrays and block on
    # floor(id / block_size) — string keys must fail fast, not coerce
    import pytest

    from node_etl_spark.functions.similarity import brute_force_topk

    df = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", [0.0, 1.0])],
        "vec_id string, embedding array<double>",
    )
    with pytest.raises(TypeError, match="integral id"):
        brute_force_topk(df, df, k=1)


def test_blocked_gemm_rejects_string_query_ids(spark):
    # corpus OK but query ids string -> still a fast TypeError
    import pytest

    from node_etl_spark.functions.similarity import brute_force_topk

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id bigint, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [("q1", [1.0, 0.0])], "vec_id string, embedding array<double>"
    )
    with pytest.raises(TypeError, match="integral id"):
        brute_force_topk(corpus, queries, k=1)


def test_lsh_neardup_subset_of_exact(spark, sf_dir):
    # LSH pruning may MISS pairs (bucket non-collision) but must never
    # invent or mis-score one: every emitted pair is in the exact set
    # with the identical rounded sim, and recall tracks the s-curve
    from node_etl_spark.tables import table

    emb = table(spark, sf_dir, "embeddings")
    exact = {
        (r.a, r.b): r.sim
        for r in S.cosine_neardup_pairs(emb, 0.4, mode="exact").collect()
    }
    lsh = {
        (r.a, r.b): r.sim
        for r in S.cosine_neardup_pairs(emb, 0.4, mode="lsh").collect()
    }
    assert set(lsh) <= set(exact)
    assert all(lsh[p] == exact[p] for p in lsh)
    # theory: recall = 1-(1-(1-theta/pi)^4)^8 ~ 0.75 at sim 0.4 and
    # rises with sim; the observed mix must clear a loose floor
    assert len(lsh) / len(exact) >= 0.5


def test_neardup_auto_switches_to_lsh(spark, sf_dir):
    # auto mode must route by corpus size: a tiny threshold forces the
    # LSH path, whose plan has the bucket equi-join and no quadratic
    # block cross-join (the "<=" theta-join shows as nested-loop)
    from node_etl_spark.tables import table

    emb = table(spark, sf_dir, "embeddings")
    lsh_plan = S.cosine_neardup_pairs(
        emb, 0.4, mode="auto", auto_lsh_above=10
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in lsh_plan
    exact_plan = S.cosine_neardup_pairs(
        emb, 0.4, mode="auto", auto_lsh_above=10_000_000
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in exact_plan  # block_i <= block_j tiles


def test_cosine_neardup_lsh_degenerate_corpora(spark):
    # explicit lsh mode on an empty or all-null frame must return an
    # empty result with the right schema, not crash probing the dim
    empty = spark.createDataFrame([], "vec_id bigint, embedding array<float>")
    out = S.cosine_neardup_pairs(empty, 0.5, mode="lsh")
    assert out.columns == ["a", "b", "sim"] and out.count() == 0
    nulls = spark.createDataFrame(
        [(1, None), (2, None)], "vec_id bigint, embedding array<float>"
    )
    out2 = S.cosine_neardup_pairs(nulls, 0.5, mode="lsh")
    assert out2.columns == ["a", "b", "sim"] and out2.count() == 0


# ------------------------------------------------ scalar quantization


def test_quantize_embeddings_codes_and_roundtrip(spark):
    from node_etl_spark.functions.similarity import quantize_embeddings

    df = spark.createDataFrame(
        [
            (1, [0.0, 10.0, 5.0]),
            (2, [1.0, 20.0, 5.0]),
            (3, [2.0, 30.0, 5.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    got = {r.vec_id: list(r.q) for r in quantize_embeddings(df).collect()}
    # dim0 range [0,2]: codes 0, 128 (round(127.5)), 255
    # dim1 range [10,30]: codes 0, 128, 255
    # dim2 constant -> 0 everywhere
    assert got[1] == [0, 0, 0]
    assert got[2] == [128, 128, 0]
    assert got[3] == [255, 255, 0]


def test_quantize_embeddings_bounds(spark, sf_dir):
    from node_etl_spark.functions.similarity import quantize_embeddings
    from node_etl_spark.tables import table
    import pyspark.sql.functions as F

    emb = table(spark, sf_dir, "embeddings")
    q = quantize_embeddings(emb)
    stats = q.select(
        F.min(F.array_min("q")).alias("lo"),
        F.max(F.array_max("q")).alias("hi"),
        F.min("n_dims").alias("d1"),
        F.max("n_dims").alias("d2"),
    ).first()
    assert stats.lo == 0 and stats.hi == 255
    assert stats.d1 == stats.d2  # constant dimensionality


# ------------------------------------------------ multi-probe LSH


def test_multiprobe_improves_or_matches_recall(spark, sf_dir):
    from node_etl_spark.functions.similarity import brute_force_topk, lsh_topk
    from node_etl_spark.tables import table

    emb = table(spark, sf_dir, "embeddings")
    q = emb.filter("vec_id < 10")
    exact = {(r.query_id, r.neighbor_id) for r in brute_force_topk(emb, q, k=5).collect()}
    base = {(r.query_id, r.neighbor_id) for r in lsh_topk(emb, q, dim=64, k=5).collect()}
    probed = {
        (r.query_id, r.neighbor_id)
        for r in lsh_topk(emb, q, dim=64, k=5, n_probes=2).collect()
    }
    r_base = len(exact & base) / len(exact)
    r_probed = len(exact & probed) / len(exact)
    assert r_probed >= r_base
    assert r_probed >= 0.6


def test_probe_buckets_flip_exactly_one_bit(spark):
    import pandas as pd

    from node_etl_spark.functions.similarity import (
        lsh_buckets_udf,
        lsh_probe_buckets_udf,
    )

    df = spark.createDataFrame(
        [(1, [0.3, -0.2, 0.9, 0.1])], "vec_id long, embedding array<float>"
    )
    base = df.select(lsh_buckets_udf(4, 4, 3)("embedding").alias("b")).first()["b"]
    probed = df.select(
        lsh_probe_buckets_udf(4, 4, 3, 2)("embedding").alias("p")
    ).first()["p"]
    for t in range(4):
        assert probed[t][0] == base[t]
        for extra in probed[t][1:]:
            x = extra ^ base[t]
            assert x != 0 and (x & (x - 1)) == 0  # exactly one bit flipped
        assert len(set(probed[t])) == 3  # base + 2 distinct probes


def test_semdedup_finds_in_cluster_dups(spark):
    # ids 0 and 50 are the centroid seeds (seed_mod=50); 1 is nearly
    # parallel to 0 (same cluster, cos ~ 1), 51 nearly parallel to 50,
    # 3 is orthogonal to everything
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0, 0.0]),
        (50, [0.0, 1.0, 0.0, 0.0]),
        (51, [0.0, 0.998, 0.02, 0.0]),
        (3, [0.0, 0.0, 1.0, 0.0]),
    ]
    out = S.semdedup(vec_df(spark, rows), seed_mod=50, threshold=0.9)
    got = {(r.dup_id, r.keep_id, r.cluster_id) for r in out.collect()}
    assert got == {(1, 0, 0), (51, 50, 50)}


def test_semdedup_keeper_is_smallest_id(spark):
    # three mutually-similar vectors in one cluster: 1 and 2 both
    # record the SMALLEST earlier id (0) as keeper, not each other
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.99, 0.01]),
        (2, [0.98, 0.02]),
    ]
    out = S.semdedup(vec_df(spark, rows), seed_mod=50, threshold=0.9)
    keepers = {r.dup_id: r.keep_id for r in out.collect()}
    assert keepers == {1: 0, 2: 0}


def test_pq_codes_identical_vectors_share_fingerprint(spark):
    # 8-dim, 2 blocks of 4; vectors 0 and 100 are seeds (codebook);
    # 1 copies 0 exactly -> same codes as 0; 2 mixes block halves
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0]),
        (100, [0.0, 1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0]),
    ]
    out = S.pq_encode(
        vec_df(spark, rows), dim=8, n_blocks=2, seed_mod=100
    )
    by_id = {r.vec_id: r for r in out.collect()}
    assert by_id[1].code_fp == by_id[0].code_fp
    assert by_id[1].recon_err == 0.0
    assert by_id[2].code_fp != by_id[0].code_fp
    assert by_id[2].recon_err == 0.0  # block halves match different seeds
    assert by_id[0].recon_err == 0.0  # seeds quantize to themselves


def test_bitext_margin_prefers_isolated_pairs(spark):
    # a0<->b0 are near-parallel and isolated; a1 is a hub vector
    # moderately close to BOTH b vectors, so its margin stays low
    a = vec_df(
        spark,
        [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (2, [0.5, 0.5, 0.5, 0.5]),
        ],
    )
    b = vec_df(
        spark,
        [
            (1, [0.999, 0.01, 0.0, 0.0]),
            (3, [0.6, 0.4, 0.5, 0.5]),
        ],
    )
    out = S.bitext_margin_pairs(a, b, k=2, threshold=0.0)
    rows = {r.src_id: r for r in out.collect()}
    assert rows[0].tgt_id == 1
    # isolated near-parallel pair scores a higher margin than the hub
    assert rows[0].margin > rows[2].margin


# ------------------------------------------------ adaptive LSH ladder


def test_lsh_adaptive_config_ladder():
    # rung rule: smallest P with n <= 64 * 2^P; T holds recall
    assert S.lsh_adaptive_config(500) == (8, 4)
    assert S.lsh_adaptive_config(1024) == (8, 4)
    assert S.lsh_adaptive_config(1025) == (8, 5)
    assert S.lsh_adaptive_config(2000) == (8, 5)
    assert S.lsh_adaptive_config(20000) == (17, 9)
    # beyond the last rung: pinned at the final entry
    t, p = S.lsh_adaptive_config(10**12)
    assert (p, t) == S.LSH_LADDER[-1]
    # bucket occupancy bound holds on every rung boundary
    for planes, _tables in S.LSH_LADDER:
        n = S.LSH_TARGET_OCCUPANCY << planes
        assert S.lsh_adaptive_config(n)[1] == planes


def test_plane_weight_is_md5_exact():
    import hashlib

    h = int(hashlib.md5(b"plane:7:3").hexdigest()[:8], 16)
    assert S._plane_weight(7, 3) == h / 2147483648.0 - 1.0
    assert -1.0 <= S._plane_weight(0, 0) < 1.0


# ------------------------------------------------ binary sign sketches


def test_sign_sketch_neardup_composition(spark):
    # planted: v1 is v0 with two tiny component nudges (flips <= 2
    # bits); v2 is an unrelated pattern. The sketch -> banding
    # composition must pair (0, 1) and only that.
    import numpy as np

    rng = np.random.default_rng(5)
    v0 = rng.normal(size=60)
    v1 = v0.copy()
    # nudge two components across the mean boundary
    m = v0.mean()
    above = np.where(v0 > m)[0]
    v1[above[0]] = m - abs(v0[above[0]] - m) - 0.5
    v2 = -v0
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate([v0, v1, v2])],
        "vec_id long, embedding array<float>",
    )
    from node_etl_spark.functions.dedup import simhash_band_pairs
    from pyspark.sql import functions as F

    sigs = S.sign_sketch60(df).select(
        F.col("vec_id").alias("doc_id"), F.col("sketch").alias("simhash")
    )
    pairs = {(r.d1, r.d2) for r in
             simhash_band_pairs(sigs, max_hamming=4).collect()}
    assert (0, 1) in pairs
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_sign_sketch_near_mean_cross_engine(spark):
    # The r4 failure mode: a component within ~1e-9 of its vector
    # mean flipped a bit on one engine only (Spark and DuckDB's
    # FLOAT->DECIMAL(38,30) casts diverge by ~1.5e-11). The integer
    # grid must make both engines agree bit-for-bit on exactly this
    # adversarial input.
    import duckdb

    # v0: one component 0.98e-9 above its own mean (59x 0.1 plus
    # 0.1 + 1e-9 => x0 - mean = (59/60)*1e-9). v1: a clearly mixed
    # vector so nonzero sketches are exercised too.
    v0 = [0.1 + 1e-9] + [0.1] * 59
    v1 = [(-1.0) ** i * (0.05 + 0.001 * i) for i in range(60)]
    df = spark.createDataFrame(
        [(0, v0), (1, v1)], "vec_id bigint, embedding array<double>"
    )
    got = {r.vec_id: r.sketch for r in S.sign_sketch60(df).collect()}

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE embeddings AS SELECT * FROM (VALUES "
        "(0, " + str(v0) + "::DOUBLE[]), (1, " + str(v1) + "::DOUBLE[])"
        ") t(vec_id, embedding)"
    )
    sql = "WITH " + S.sign_sketch60_sql() + " SELECT doc_id, simhash FROM sigs"
    want = {r[0]: r[1] for r in con.execute(sql).fetchall()}
    assert got == want
    # the near-mean component quantizes onto the same 1e-6 grid cell
    # as the mean itself -> deterministically NOT above it
    assert got[0] == 0


def test_ahash60_matches_manual_grid():
    from node_etl_spark.functions.multimodal import (
        AHASH_CLASSES,
        _fake_gray_grid,
    )

    content = b"hello world 42!"
    cells = _fake_gray_grid(content)
    assert len(cells) == 60
    assert cells[AHASH_CLASSES.index("l")] == 3
    assert cells[AHASH_CLASSES.index("4")] == 1
    assert cells[AHASH_CLASSES.index(" ")] == 2


def _planted_corpus(n_base=200, n_dups=50, noise=0.02, seed=11):
    import numpy as np

    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n_base, 64))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = [(i, base[i].tolist()) for i in range(n_base)]
    truth = set()
    for k in range(n_dups):
        v = base[4 * k] + noise * rng.normal(size=64)
        v /= np.linalg.norm(v)
        rows.append((n_base + k, v.tolist()))
        truth.add((n_base + k, 4 * k))  # (dup_id, keep_id), dup id larger
    return rows, truth


def test_semdedup_capped_agreement_bracket(spark):
    # Capped mode is the 100 TB shape (fixed k, GEMM assignment,
    # max_cluster_size chunks) and an APPROXIMATION: bracket its
    # agreement against ground truth and against exact mode on a
    # planted-near-dup corpus (cosine ~0.99 pairs).
    rows, truth = _planted_corpus()
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    exact = {(r.dup_id, r.keep_id)
             for r in S.semdedup(df, threshold=0.95).collect()}
    capped = {(r.dup_id, r.keep_id)
              for r in S.semdedup(df, threshold=0.95, mode="capped",
                                  n_clusters=8, max_cluster_size=16)
              .collect()}
    # precision vs ground truth is exact-cosine-verified by
    # construction: every emitted pair must be a planted pair
    # (no base-base pair reaches cosine 0.95 among 200 random
    # 64-dim unit vectors)
    assert capped <= truth and exact <= truth
    # recall brackets (measured 0.86 exact / 0.70 capped on this
    # seed; floor set with margin — regressions to id-ordered
    # chunking measured ~0.45 and must fail)
    assert len(exact) / len(truth) >= 0.75
    assert len(capped) / len(truth) >= 0.55
    # capped agrees with exact on most of what exact finds
    assert len(capped & exact) / len(exact) >= 0.55


def test_semdedup_capped_empty_and_mode_validation(spark):
    import pytest

    df = spark.createDataFrame(
        [], "vec_id bigint, embedding array<double>"
    )
    assert S.semdedup(df, mode="capped").collect() == []
    with pytest.raises(ValueError, match="mode"):
        S.semdedup(df, mode="bogus")


def test_ivf_pq_config_ladder():
    assert S.ivf_pq_config(500) == (8, 3)
    assert S.ivf_pq_config(1000) == (8, 3)
    assert S.ivf_pq_config(1001) == (16, 4)
    assert S.ivf_pq_config(2000) == (16, 4)
    # above the last rung the config PINS (no silent restart)
    assert S.ivf_pq_config(10**9) == (512, 9)


def test_ivf_pq_topk_structure_and_recall(spark, sf_dir):
    import numpy as np
    from node_etl_spark.tables import table

    emb = table(spark, sf_dir, "embeddings")
    got = S.ivf_pq_topk(emb, k=5).collect()
    by_q = {}
    for r in got:
        assert r.neighbor_id != r.query_id  # self excluded
        by_q.setdefault(r.query_id, []).append((r.rank, r.dist))
    for q, rows in by_q.items():
        rows.sort()
        assert [r[0] for r in rows] == list(range(1, len(rows) + 1))
        dists = [r[1] for r in rows]
        assert dists == sorted(dists)  # exact dist ascending in rank
    # recall@5 vs exact L2 over the raw vectors: PQ over 8 seeded
    # codewords is coarse, but the composed index must still place a
    # majority of true neighbors in the returned set
    rows = emb.filter("embedding is not null").collect()
    ids = np.array([r.vec_id for r in rows])
    X = np.array([list(r.embedding) for r in rows], dtype=np.float64)
    hits = total = 0
    for q in by_q:
        qi = np.where(ids == q)[0][0]
        d = ((X - X[qi]) ** 2).sum(axis=1)
        d[qi] = np.inf
        true5 = set(ids[np.argsort(d, kind="stable")[:5]])
        approx = {r.neighbor_id for r in got if r.query_id == q}
        hits += len(true5 & approx)
        total += 5
    recall = hits / total
    assert recall >= 0.4, recall  # bracket: probed cells + 8-code PQ


# -- Johnson-Lindenstrauss sign projection ----------------------------


def test_jl_signs_match_duckdb_md5_parity():
    # the matrix must be re-derivable in-engine: DuckDB's md5-parity
    # formula (the oracle's jl_signs CTE) gives the identical signs
    import duckdb

    signs = S.jl_signs(k=4, dim=8)
    rows = duckdb.sql(
        """
        SELECT j, i, CASE WHEN CAST(('0x' || substring(md5(
                   CAST(j AS VARCHAR) || ':' || CAST(i AS VARCHAR)
               ), 1, 15)) AS BIGINT) % 2 = 0 THEN 1 ELSE -1 END
        FROM unnest(range(4)) AS a(j), unnest(range(8)) AS b(i)
        """
    ).fetchall()
    for j, i, s in rows:
        assert signs[j][i] == s


def test_jl_project_preserves_distance_in_expectation(spark):
    # E[proj_d2] = k * orig_d2 (unscaled ±1 form): over enough pairs
    # the mean distortion must bracket 1
    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-0.5, 0.5) for _ in range(64)]) for i in range(80)
    ]
    df = vec_df(spark, rows)
    proj = {r.vec_id: r.proj for r in S.jl_project(df, k=16).collect()}
    assert all(len(p) == 16 for p in proj.values())
    qx = {
        vid: [math.floor(float(x) * 1e6 + 0.5) for x in emb]
        for vid, emb in rows
    }
    ratios = []
    for a in range(0, 79):
        b = a + 1
        od = sum((qx[a][i] - qx[b][i]) ** 2 for i in range(64))
        pd = sum((proj[a][j] - proj[b][j]) ** 2 for j in range(16))
        ratios.append(pd / od / 16)
    mean = sum(ratios) / len(ratios)
    assert 0.7 < mean < 1.3, mean


def test_jl_project_exact_integer_contract(spark):
    # projection of a known vector = sign-weighted sum of the grid
    emb = [0.25] * 32 + [-0.125] * 32
    df = vec_df(spark, [(0, emb)])
    (row,) = S.jl_project(df, k=3).collect()
    signs = S.jl_signs(k=3, dim=64)
    q = [math.floor(x * 1e6 + 0.5) for x in emb]
    for j in range(3):
        assert row.proj[j] == sum(s * x for s, x in zip(signs[j], q))


# -- power-iteration top principal direction --------------------------


def test_power_iteration_finds_planted_axis(spark):
    # data = strong axis e_3 + weak noise axes: the dominant
    # eigenvector of X^T X is e_3, so |v| must peak there at the grid
    # max and stay small elsewhere
    import random

    rng = random.Random(3)
    rows = []
    for i in range(60):
        main = rng.choice([-0.9, 0.9])
        v = [rng.uniform(-0.05, 0.05) for _ in range(8)]
        v[3] += main
        rows.append((i, v))
    df = vec_df(spark, rows)
    out = {r.j: r.v for r in S.power_iteration_pc(df, rounds=5, dim=8).collect()}
    assert set(out) == set(range(8))
    assert abs(out[3]) == 1_000_000  # L-inf max lands on the axis
    for j in range(8):
        if j != 3:
            assert abs(out[j]) < 200_000, (j, out[j])


def test_power_iteration_matches_numpy_eigvec(spark):
    import random

    import numpy as np

    rng = random.Random(11)
    rows = [
        (i, [rng.uniform(-0.4, 0.4) for _ in range(16)]) for i in range(50)
    ]
    df = vec_df(spark, rows)
    out = {r.j: r.v for r in S.power_iteration_pc(df, rounds=12, dim=16).collect()}
    v = np.array([out[j] for j in range(16)], dtype=float)
    v /= np.linalg.norm(v)
    X = np.array(
        [[math.floor(x * 1e6 + 0.5) for x in emb] for _, emb in rows]
    )
    w, vecs = np.linalg.eigh(X.T @ X)
    top = vecs[:, -1]
    assert abs(float(np.dot(v, top))) > 0.99


def test_power_iteration_exact_vs_python_reference(spark):
    # bit-exactness of the Arrow-round implementation against a pure
    # Python-int replay of the same iteration, including rows that
    # exceed the int64 fast-path bounds (|q| ~ 1e12 forces the exact
    # fallback) and a short row the NULL-propagating semantics drop
    import random

    import numpy as np

    rng = random.Random(7)
    dim, rounds = 8, 3
    rows = []
    for i in range(30):
        scale = 1e6 if i % 7 == 0 else 1.0  # mixed magnitudes
        rows.append(
            (i, [rng.uniform(-1, 1) * scale for _ in range(dim)])
        )
    rows.append((99, [0.5] * (dim - 2)))  # short row: dropped
    df = vec_df(spark, rows)
    out = {
        r.j: r.v
        for r in S.power_iteration_pc(df, rounds=rounds, dim=dim).collect()
    }

    # reference: same quantization (float32 storage, double math),
    # exact Python ints throughout
    Q = []
    for _, emb in rows:
        if len(emb) < dim:
            continue
        Q.append(
            [
                math.floor(float(np.float32(x)) * 1e6 + 0.5)
                for x in emb[:dim]
            ]
        )
    v = [1_000_000] * dim
    for _ in range(rounds):
        s = [sum(q * w for q, w in zip(qi, v)) for qi in Q]
        w = [
            sum(si * qi[j] for si, qi in zip(s, Q)) for j in range(dim)
        ]
        m = max(abs(float(x)) for x in w)
        v = [
            math.floor(float(w[j]) / m * 1e6 + 0.5) if m > 0 else 0
            for j in range(dim)
        ]
    assert out == {j: v[j] for j in range(dim)}


def test_knn_label_eval_separable_clusters(spark):
    # two tight clusters with distinct labels: the confusion matrix
    # must be purely diagonal
    rows = []
    vid = 0
    for label, (cx, cy) in [(0, (1.0, 0.0)), (1, (-1.0, 0.1))]:
        for j in range(6):
            rows.append((vid, [cx + 0.01 * j, cy + 0.01 * j], label))
            vid += 1
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )
    out = S.knn_label_eval(df, df, k=3).collect()
    conf = {(r.true_label, r.pred_label): r.n for r in out}
    assert conf == {(0, 0): 6, (1, 1): 6}


def test_knn_label_eval_majority_tiebreak(spark):
    # probe at the midpoint of one vector from each label with k=2:
    # the vote ties 1-1 and the (count desc, label asc) tie-break
    # must pick the SMALLER label deterministically
    df = spark.createDataFrame(
        [
            (0, [1.0, 0.0], 7),
            (1, [0.0, 1.0], 3),
            (2, [0.7071, 0.7071], 3),
        ],
        "vec_id bigint, embedding array<float>, label int",
    )
    out = S.knn_label_eval(df, df.filter("vec_id = 2"), k=2).collect()
    (r,) = out
    assert r.true_label == 3 and r.pred_label == 3  # min label wins tie


def test_kcenter_picks_spread_points(spark):
    from node_etl_spark.functions.similarity import kcenter_select

    # three tight clusters on a line at 0, 100, 200 (+ jitter); k=3
    # must pick one point from each cluster, seeded at min id
    import itertools

    rows = []
    vid = 0
    for base in (0.0, 100.0, 200.0):
        for j in range(5):
            rows.append((vid, [base + 0.1 * j] + [0.0] * 3))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = kcenter_select(df, k=3).collect()
    assert [r.rnd for r in out] == [1, 2, 3]
    picked = [r.vec_id for r in out]
    assert picked[0] == 0  # seed = min id
    clusters = {v // 5 for v in picked}
    assert clusters == {0, 1, 2}
    # the seed row reports d2 = 0; later rounds decrease or hold
    assert out[0].d2 == 0
    assert out[1].d2 >= out[2].d2


def test_kcenter_integer_grid_exactness(spark):
    from node_etl_spark.functions.similarity import kcenter_select

    # distance between quantized [0.000001] and [0.000003] grids is
    # (1-3)^2 = 4 exactly
    df = spark.createDataFrame(
        [(1, [0.000001, 0.0]), (2, [0.000003, 0.0])],
        "vec_id long, embedding array<float>",
    )
    out = {r.rnd: r for r in kcenter_select(df, k=2).collect()}
    assert out[2].vec_id == 2 and out[2].d2 == 4


def test_topk_recall_audit_boolean_semantics(spark):
    # the r7 gate frame: exact columns + a floor boolean that flips
    # when the approximate path loses too many true neighbors
    from node_etl_spark.functions.similarity import topk_recall_audit

    exact = spark.createDataFrame(
        [(q, n) for q in (1, 2) for n in (10, 11, 12)],
        "query_id long, neighbor_id long",
    )
    # approx recovers 4 of 6 exact pairs -> recall 0.667
    approx = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10), (2, 12), (2, 99)],
        "query_id long, neighbor_id long",
    )
    (row,) = topk_recall_audit(exact, approx, k=3, recall_floor=0.6).collect()
    assert (row.n_queries, row.n_exact_pairs, row.k) == (2, 6, 3)
    assert row.recall_ok  # 0.667 >= 0.6
    (row,) = topk_recall_audit(exact, approx, k=3, recall_floor=0.7).collect()
    assert not row.recall_ok  # 0.667 < 0.7
