"""Property-based tests (hypothesis): structural invariants that
example-based tests under-cover — tree round-trips and pivot inverses
over arbitrary shapes."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as hst

from node_etl_spark.operators.tree import build_document, flatten_document

# random forests: each node a small id/label dict with optional children
node_st = hst.deferred(
    lambda: hst.fixed_dictionaries(
        {"id": hst.integers(0, 10**6), "label": hst.text(max_size=8)},
        optional={"children": hst.lists(node_st, max_size=3)},
    )
)


def _strip_empty_children(node):
    node = dict(node)
    kids = node.pop("children", None)
    if kids:
        node["children"] = [_strip_empty_children(k) for k in kids]
    return node


def _unique_ids(node, seen):
    if node["id"] in seen:
        return False
    seen.add(node["id"])
    return all(_unique_ids(k, seen) for k in node.get("children", []))


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(doc=node_st)
def test_tree_flatten_build_roundtrip(spark, doc):
    doc = _strip_empty_children(doc)
    if not _unique_ids(doc, set()):
        return  # duplicate ids are out of contract (reference keys maps by id)
    flat = flatten_document(spark, doc, level_key=None, mpath_key=None)
    rows = [r.asDict() for r in flat.collect()]
    rebuilt = build_document(rows)
    assert _normalize(rebuilt) == _normalize(doc)


def _normalize(node):
    node = dict(node)
    kids = node.pop("children", None)
    out = {k: node[k] for k in sorted(node) if k != "parent"}
    if kids:
        out["children"] = sorted(
            (_normalize(k) for k in kids), key=lambda d: d["id"]
        )
    return out


from node_etl_spark.context import Context
from node_etl_spark.operators import Array2Map, Map2Array


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(entries=hst.dictionaries(
    hst.text(alphabet="abcdef", min_size=1, max_size=4),
    hst.integers(-10**6, 10**6),
    min_size=1, max_size=6,
))
def test_array2map_map2array_inverse(spark, entries):
    rows = [(1, [{"id": k, "n": v} for k, v in entries.items()])]
    df = spark.createDataFrame(
        rows, "row_id int, st array<struct<id:string,n:bigint>>"
    )
    ctx = Context()
    as_map = Array2Map(fields=["st"], id_key="id", value_field="n").apply(df, ctx)
    back = Map2Array(fields=["st"], id_key="id", value_key="n").apply(as_map, ctx)
    got = {e["id"]: e["n"] for e in back.collect()[0].st}
    assert got == entries


# ------------------------- connected components vs reference union-find

edge_st = hst.lists(
    hst.tuples(hst.integers(0, 30), hst.integers(0, 30)),
    min_size=0,
    max_size=40,
)


def _union_find(edges):
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in edges:
        for v in (s, d):
            parent.setdefault(v, v)
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[max(rs, rd)] = min(rs, rd)
    # min-id label per vertex that touches at least one non-loop edge
    touched = {v for s, d in edges if s != d for v in (s, d)}
    return {v: find(v) for v in touched}


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(edges=edge_st)
def test_connected_components_match_union_find(spark, edges):
    from node_etl_spark.functions.graph import connected_components

    df = spark.createDataFrame(edges or [(0, 0)], "src long, dst long")
    got = {
        r["id"]: r["component"]
        for r in connected_components(df).collect()
    }
    want = _union_find(edges)
    # engine emits rows only for non-root vertices; roots self-label
    for v, root in want.items():
        assert got.get(v, v) == root
    assert set(got) <= set(want)


# ------------------------------------------------ skyline invariants


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    pts=hst.lists(
        hst.tuples(hst.integers(0, 50), hst.integers(0, 50)),
        min_size=1,
        max_size=40,
    )
)
def test_skyline_equals_bruteforce(spark, pts):
    from node_etl_spark.functions.frontier import skyline

    rows = [(i, float(x), float(y)) for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    got = {r.id for r in skyline(df, maximize=("x", "y")).collect()}

    def dominated(i):
        xi, yi = pts[i]
        return any(
            (xj >= xi and yj >= yi and (xj > xi or yj > yi))
            for j, (xj, yj) in enumerate(pts)
            if j != i
        )

    want = {i for i in range(len(pts)) if not dominated(i)}
    assert got == want


# ------------------------------------------------ CUSUM invariants


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    vals=hst.lists(hst.integers(-100, 100), min_size=1, max_size=30),
    ref=hst.integers(-50, 50),
)
def test_cusum_prefix_identity_matches_recursion(spark, vals, ref):
    from node_etl_spark.functions.dq import cusum_shift

    df = spark.createDataFrame(
        [("g", t, v, ref) for t, v in enumerate(vals)],
        "g string, t long, value long, baseline long",
    )
    got = {
        r.t: (r.s_pos, r.s_neg)
        for r in cusum_shift(df, ["g"], "t", "value", 10, ref_col="baseline").collect()
    }
    sp = sn = 0
    for t, v in enumerate(vals):
        sp = max(0, sp + (v - ref))
        sn = max(0, sn - (v - ref))
        assert got[t] == (sp, sn), (t, vals, ref)


@settings(max_examples=60, deadline=None)
@given(
    w=hst.integers(1, 12),
    h=hst.integers(1, 6),
    seed=hst.integers(0, 2**31),
    topdown=hst.booleans(),
)
def test_bmp24_roundtrip_property(w, h, seed, topdown):
    # pure-Python property: encode->decode is the identity over any
    # dimensions (every 4-byte padding remainder) and pixel contents;
    # top-down variants (negative height) decode to the same rows
    import struct

    from node_etl_spark.functions.multimodal import decode_bmp24, encode_bmp24

    rnd = seed
    pixels = []
    for y in range(h):
        row = []
        for x in range(w):
            rnd = (1103515245 * rnd + 12345) % (2**31)
            row.append(((rnd >> 16) % 256, (rnd >> 8) % 256, rnd % 256))
        pixels.append(row)
    blob = encode_bmp24(w, h, pixels)
    if topdown:
        blob = bytearray(blob)
        struct.pack_into("<i", blob, 22, -h)
        row_size = (3 * w + 3) // 4 * 4
        off = 54
        rows = [
            bytes(blob[off + i * row_size : off + (i + 1) * row_size])
            for i in range(h)
        ]
        blob[off:] = b"".join(reversed(rows))
        blob = bytes(blob)
    gw, gh, got = decode_bmp24(blob)
    assert (gw, gh, got) == (w, h, pixels)


@settings(max_examples=40, deadline=None)
@given(
    mcs=hst.integers(2, 8),
    idx=hst.lists(hst.integers(0, 255), min_size=1, max_size=4000),
)
def test_gif_lzw_roundtrip_property(mcs, idx):
    # pure-Python property: the GIF LZW layer is the identity over any
    # index stream whose values fit the palette width — including
    # streams long enough to grow code width and reset the dictionary
    from node_etl_spark.functions.multimodal import (
        _gif_lzw_decode,
        _gif_lzw_encode,
    )

    idx = [v % (1 << mcs) for v in idx]
    assert _gif_lzw_decode(_gif_lzw_encode(idx, mcs), mcs, len(idx)) == idx


@settings(max_examples=40, deadline=None)
@given(
    blocks=hst.lists(
        hst.lists(hst.integers(-1023, 1023), min_size=64, max_size=64),
        min_size=1,
        max_size=6,
    ),
    zero_mask=hst.lists(hst.integers(0, 63), min_size=0, max_size=60),
)
def test_jpeg_entropy_layer_roundtrip_property(blocks, zero_mask):
    # pure-Python property: the Huffman/run-length layer inverts ANY
    # integer coefficient sequence (zero_mask forces long zero runs so
    # ZRL/EOB paths are hit often, not just on hand-picked cases)
    from node_etl_spark.functions.multimodal import (
        _JPEG_AC_BITS,
        _JPEG_AC_VALS,
        _JPEG_DC_BITS,
        _JPEG_DC_VALS,
        _decode_block_coeffs,
        _encode_block_coeffs,
        _huff_codes,
        _huff_decode_table,
        _JpegBitReader,
        _JpegBitWriter,
    )

    for blk in blocks:
        for k in zero_mask:
            if k:  # never zero the DC slot: categories stay exercised
                blk[k] = 0
    dc_codes = _huff_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _huff_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)
    dc_tab = _huff_decode_table(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_tab = _huff_decode_table(_JPEG_AC_BITS, _JPEG_AC_VALS)
    w = _JpegBitWriter()
    pred = 0
    for blk in blocks:
        pred = _encode_block_coeffs(w, blk, pred, dc_codes, ac_codes)
    w.align()
    br = _JpegBitReader(bytes(w.out) + b"\xff\xd9", 0)
    pred = 0
    for blk in blocks:
        got = _decode_block_coeffs(br, pred, dc_tab, ac_tab)
        pred = got[0]
        assert got == blk


@settings(max_examples=30, deadline=None)
@given(
    names=hst.lists(
        hst.text(
            alphabet="abcdefghijklmnopqrstuvwxyz0123456789._-",
            min_size=1,
            max_size=40,
        ).filter(lambda s: not s.startswith(".")),
        min_size=1,
        max_size=8,
        unique=True,
    ),
    payload=hst.binary(min_size=0, max_size=2000),
    compress=hst.booleans(),
)
def test_tar_shard_roundtrip_property(names, payload, compress):
    # pure-Python property: shard encode->walk is the identity over
    # arbitrary member names (dots, dashes, underscores) and payload
    # slices, compressed or not
    from node_etl_spark.functions.multimodal import (
        encode_tar_shard,
        iter_tar_members,
    )

    members = [
        (name, payload[i::max(1, len(names))])
        for i, name in enumerate(names)
    ]
    blob = encode_tar_shard(members, compress=compress)
    assert list(iter_tar_members(blob)) == members


@settings(max_examples=30, deadline=None)
@given(
    s=hst.text(
        alphabet=hst.sampled_from(
            "abce ̧́̀éàÇﬁA"
        ),
        max_size=60,
    )
)
def test_unicode_normalize_agrees_with_duckdb_property(s):
    # cross-engine property on the q303 charset family: the stdlib
    # unicodedata path and DuckDB's ICU path agree on NFC and accent
    # stripping for arbitrary mixes of composed chars, decomposed
    # sequences, and bare combining marks
    import unicodedata

    import duckdb

    nfc_py = unicodedata.normalize("NFC", s)
    strip_py = unicodedata.normalize(
        "NFC",
        "".join(
            ch
            for ch in unicodedata.normalize("NFD", nfc_py)
            if unicodedata.category(ch) != "Mn"
        ),
    )
    nfc_db, strip_db = duckdb.sql(
        "select nfc_normalize(?), strip_accents(nfc_normalize(?))",
        params=[s, s],
    ).fetchone()
    assert nfc_py == nfc_db
    assert strip_py == strip_db


@settings(max_examples=40, deadline=None)
@given(
    blocks=hst.lists(
        hst.lists(hst.integers(-1023, 1023), min_size=64, max_size=64),
        min_size=1,
        max_size=6,
    ),
    zero_mask=hst.lists(hst.integers(0, 63), min_size=0, max_size=60),
    dc_al=hst.integers(0, 3),
    ac_al=hst.integers(0, 3),
    split=hst.sampled_from([1, 5, 20, 62]),
    ri=hst.sampled_from([0, 0, 1, 2]),
)
def test_progressive_scan_layer_roundtrip_property(
    blocks, zero_mask, dc_al, ac_al, split, ri
):
    # pure-Python property over the T.81 Annex G scan pipeline: for
    # ANY integer coefficient sequence, the full progressive scan
    # script (DC first/refine, banded AC first with EOB runs, AC
    # refinement correction bits, restarts inside every scan) must
    # reconstruct the exact coefficients. This exercises the
    # general-coefficient paths the constant-block gate (q307) cannot:
    # nonzero ACs across both bands, ZRL-in-refinement, buffered
    # correction bits riding EOB runs
    from node_etl_spark.functions.multimodal import (
        _JPEG_DC_BITS,
        _JPEG_DC_VALS,
        _JPEG_PROG_AC_BITS,
        _JPEG_PROG_AC_VALS,
        _decode_prog_ac_first,
        _decode_prog_ac_refine,
        _decode_prog_dc_first,
        _decode_prog_dc_refine,
        _encode_ac_first_scan,
        _encode_ac_refine_scan,
        _encode_dc_first_scan,
        _encode_dc_refine_scan,
        _huff_codes,
        _huff_decode_table,
        _JpegBitReader,
        _JpegBitWriter,
    )

    for blk in blocks:
        for k in zero_mask:
            if k:
                blk[k] = 0
    dc_codes = _huff_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _huff_codes(_JPEG_PROG_AC_BITS, _JPEG_PROG_AC_VALS)
    dc_tab = _huff_decode_table(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_tab = _huff_decode_table(_JPEG_PROG_AC_BITS, _JPEG_PROG_AC_VALS)

    bands = [(1, split), (split + 1, 63)]
    scans = []  # (encode_fn, decode_fn) pairs in script order
    scans.append((
        lambda w: _encode_dc_first_scan(w, blocks, dc_codes, dc_al, ri),
        lambda br, c, coefs: _decode_prog_dc_first(
            br, c, coefs, dc_tab, dc_al, ri),
    ))
    for ss, se in bands:
        scans.append((
            (lambda ss, se: lambda w: _encode_ac_first_scan(
                w, blocks, ac_codes, ss, se, ac_al, ri))(ss, se),
            (lambda ss, se: lambda br, c, coefs: _decode_prog_ac_first(
                br, c, coefs, ac_tab, ss, se, ac_al, ri))(ss, se),
        ))
    for al in range(dc_al - 1, -1, -1):
        scans.append((
            (lambda al: lambda w: _encode_dc_refine_scan(
                w, blocks, al, ri))(al),
            (lambda al: lambda br, c, coefs: _decode_prog_dc_refine(
                br, c, coefs, al, ri))(al),
        ))
    for al in range(ac_al - 1, -1, -1):
        for ss, se in bands:
            scans.append((
                (lambda ss, se, al: lambda w: _encode_ac_refine_scan(
                    w, blocks, ac_codes, ss, se, al, ri))(ss, se, al),
                (lambda ss, se, al: lambda br, c, coefs:
                 _decode_prog_ac_refine(
                     br, c, coefs, ac_tab, ss, se, al, ri))(ss, se, al),
            ))

    coefs = [[0] * 64 for _ in blocks]
    for enc, dec in scans:
        w = _JpegBitWriter()
        enc(w)  # each scan emitter aligns at its end
        data = bytes(w.out) + b"\xff\xd9"
        br = _JpegBitReader(data, 0)
        dec(br, data, coefs)
    assert coefs == blocks


@settings(max_examples=60, deadline=None)
@given(data=hst.binary(min_size=0, max_size=70000))
def test_snappy_raw_and_framed_roundtrip_property(data):
    # ANY byte string survives snappy round-trips in both containers;
    # 70000-byte inputs force multi-chunk framed streams and the
    # two-byte literal-length form in the raw stream
    from node_etl_spark.functions.multimodal import (
        _snappy_frame_compress,
        _snappy_frame_decompress,
        _snappy_raw_compress,
        _snappy_raw_decompress,
    )

    assert _snappy_raw_decompress(_snappy_raw_compress(data)) == data
    assert _snappy_frame_decompress(_snappy_frame_compress(data)) == data


@settings(max_examples=40, deadline=None)
@given(data=hst.binary(min_size=0, max_size=70000))
def test_zstd_roundtrip_property(data):
    # ANY byte string: the stored-frame writer round-trips through the
    # pure RFC 8878 decoder, and (when the system libzstd is present)
    # real entropy-coded frames decode identically through BOTH engines
    from node_etl_spark.functions.multimodal import (
        _libzstd,
        _zstd_lib_compress,
        _zstd_lib_decompress,
        _zstd_py_decompress,
        _zstd_stored_compress,
    )

    assert _zstd_py_decompress(_zstd_stored_compress(data)) == data
    if _libzstd() is not None:
        blob = _zstd_lib_compress(data, 3)
        assert _zstd_py_decompress(blob) == data
        assert _zstd_lib_decompress(blob) == data
        assert _zstd_lib_decompress(_zstd_stored_compress(data)) == data


@settings(max_examples=40, deadline=None)
@given(
    members=hst.lists(
        hst.tuples(
            hst.text(
                alphabet=hst.characters(
                    min_codepoint=48, max_codepoint=122
                ),
                min_size=1,
                max_size=30,
            ),
            hst.binary(min_size=0, max_size=2000),
        ),
        min_size=1,
        max_size=8,
    ),
    gz=hst.booleans(),
)
def test_warc_roundtrip_property(members, gz):
    # ANY (uri, payload) record set survives the WARC writer/walker
    # pair in both framings, byte-exactly and in order
    from node_etl_spark.functions.web import encode_warc_gz, iter_warc_records

    recs = [
        ("response", f"https://x/{name}", payload, "application/http")
        for name, payload in members
    ]
    shard = encode_warc_gz(recs, per_record_gzip=gz)
    got = list(iter_warc_records(shard))
    assert [r["target_uri"] for r in got] == [r[1] for r in recs]
    assert [r["payload"] for r in got] == [p for _, p in members]


@settings(max_examples=40, deadline=None)
@given(
    seqs=hst.lists(
        hst.lists(hst.integers(0, 65535), min_size=0, max_size=300),
        min_size=1,
        max_size=10,
    )
)
def test_token_shard_roundtrip_property(seqs):
    # ANY uint16 sequence set survives the shard pack/parse pair,
    # incl. empty sequences and multi-sequence payload offsets
    import struct
    import zlib

    import numpy as np

    from node_etl_spark.sources.tokenshards import (
        _MAGIC,
        parse_token_shard,
    )

    ids = list(range(len(seqs)))
    payload = np.concatenate(
        [np.asarray(s, dtype=np.uint16) for s in seqs]
        or [np.empty(0, np.uint16)]
    ).tobytes()
    head = bytearray(_MAGIC)
    head.append(2)
    head += struct.pack("<I", len(ids))
    for sid, s in zip(ids, seqs):
        head += struct.pack("<qi", sid, len(s))
    blob = (
        bytes(head) + payload
        + struct.pack("<I", zlib.crc32(payload) & 0xFFFFFFFF)
    )
    got_ids, got_arrays = parse_token_shard(blob)
    assert got_ids == ids
    assert [list(a) for a in got_arrays] == seqs


@settings(max_examples=30, deadline=None)
@given(
    w=hst.integers(1, 20),
    h=hst.integers(1, 12),
    ct_depth=hst.sampled_from(
        [(0, 1), (0, 2), (0, 4), (0, 8), (2, 8), (3, 2), (3, 8), (4, 8), (6, 8)]
    ),
    interlace=hst.integers(0, 1),
    seed=hst.integers(0, 2**31),
)
def test_png_variant_roundtrip_property(w, h, ct_depth, interlace, seed):
    # ANY dims (incl. 1xN / Nx1, which empty several Adam7 passes),
    # every supported color-type/depth pair, both interlace modes
    import random

    from node_etl_spark.functions.multimodal import decode_png, encode_png

    ct, depth = ct_depth
    rng = random.Random(seed)
    pal = [((i * 37 + 11) % 256, (i * 53) % 256, (i * 91) % 256)
           for i in range(min(1 << depth, 16))]
    scale = {1: 255, 2: 85, 4: 17, 8: 1}[depth]
    if ct == 0:
        px = [[rng.randrange(1 << depth) for _ in range(w)] for _ in range(h)]
        want = [[(v * scale,) * 3 for v in r] for r in px]
    elif ct == 2:
        px = [[tuple(rng.randrange(256) for _ in range(3))
               for _ in range(w)] for _ in range(h)]
        want = px
    elif ct == 3:
        px = [[rng.randrange(len(pal)) for _ in range(w)] for _ in range(h)]
        want = [[pal[v] for v in r] for r in px]
    elif ct == 4:
        px = [[(rng.randrange(256), rng.randrange(256))
               for _ in range(w)] for _ in range(h)]
        want = [[(v[0],) * 3 for v in r] for r in px]
    else:
        px = [[tuple(rng.randrange(256) for _ in range(4))
               for _ in range(w)] for _ in range(h)]
        want = [[v[:3] for v in r] for r in px]
    blob = encode_png(
        w, h, px, color_type=ct, bit_depth=depth, palette=pal,
        interlace=interlace,
    )
    assert decode_png(blob) == (w, h, want)


@given(
    payloads=hst.lists(
        hst.binary(min_size=0, max_size=200_000), min_size=1, max_size=8
    ),
    per_member=hst.booleans(),
)
@settings(deadline=None, max_examples=40)
def test_warc_streaming_reader_property(payloads, per_member):
    # r11 streaming reader: ANY record sizes (incl. ones spanning many
    # 64 KiB inflate windows) through any framing reproduce the
    # payloads in order
    from node_etl_spark.functions.web import (
        encode_warc_gz,
        iter_warc_records,
    )

    recs = [
        ("resource", f"https://p/{i}", p, "application/octet-stream")
        for i, p in enumerate(payloads)
    ]
    shard = encode_warc_gz(recs, per_record_gzip=per_member)
    got = list(iter_warc_records(shard))
    assert [r["payload"] for r in got] == payloads
    assert [r["target_uri"] for r in got] == [
        f"https://p/{i}" for i in range(len(payloads))
    ]


@given(
    payloads=hst.lists(
        hst.binary(min_size=0, max_size=5_000), min_size=1, max_size=10
    )
)
@settings(deadline=None, max_examples=40)
def test_cdx_member_ranges_property(payloads):
    # r11 CDX: member ranges PARTITION the shard exactly, and every
    # range independently decompresses to its own record
    from node_etl_spark.functions.web import (
        encode_warc_gz,
        iter_warc_members,
        iter_warc_records,
    )

    recs = [
        ("resource", f"https://p/{i}", p, "application/octet-stream")
        for i, p in enumerate(payloads)
    ]
    shard = encode_warc_gz(recs, per_record_gzip=True)
    members = list(iter_warc_members(shard))
    assert len(members) == len(payloads)
    pos = 0
    for (off, ln, rec), want in zip(members, payloads):
        assert off == pos
        assert rec["payload"] == want
        (back,) = iter_warc_records(shard[off : off + ln])
        assert back["payload"] == want
        pos = off + ln
    assert pos == len(shard)


@given(
    seqs=hst.lists(
        hst.tuples(
            hst.integers(-(2**62), 2**62),
            hst.lists(hst.integers(0, 2**32 - 1), max_size=50),
        ),
        min_size=1,
        max_size=30,
    ),
    rows_per_task=hst.integers(1, 40),
)
@settings(deadline=None, max_examples=40)
def test_token_shard_range_reads_property(tmp_path_factory, seqs, rows_per_task):
    # r11 ranged reads: any row-range slicing of a uint32 shard
    # reconstructs exactly the sequences the whole-shard parser sees
    import os
    import struct
    import zlib

    import numpy as np

    from node_etl_spark.sources.tokenshards import (
        _read_shard_range,
        parse_token_shard,
    )

    ids = [s for s, _ in seqs]
    toks = [t for _, t in seqs]
    payload = np.concatenate(
        [np.asarray(t, dtype=np.uint32) for t in toks]
        or [np.empty(0, np.uint32)]
    ).tobytes()
    head = bytearray(b"TSH1")
    head.append(4)
    head += struct.pack("<I", len(ids))
    for sid, t in zip(ids, toks):
        head += struct.pack("<qi", sid, len(t))
    blob = bytes(head) + payload + struct.pack(
        "<I", zlib.crc32(payload) & 0xFFFFFFFF
    )
    want_ids, want_arrays = parse_token_shard(blob)
    assert want_ids == ids
    assert [a.tolist() for a in want_arrays] == toks

    d = tmp_path_factory.mktemp("shard")
    f = os.path.join(str(d), "s.tokens")
    open(f, "wb").write(blob)
    got_ids, got_toks = [], []
    start = 0
    while start < len(ids):
        sids, arrays = _read_shard_range(f, start, rows_per_task)
        got_ids.extend(sids)
        got_toks.extend(a.tolist() for a in arrays)
        start += rows_per_task
    assert got_ids == ids
    assert got_toks == toks


@settings(max_examples=40, deadline=None)
@given(data=hst.binary(min_size=0, max_size=30000))
def test_zstd_dict_roundtrip_property(data):
    # dictionary frames round-trip for ARBITRARY payloads (not just
    # record-shaped ones the dict was trained for), and every
    # last-byte corruption is detected (advanced-API XXH64)
    import pytest

    from node_etl_spark.functions import multimodal as M

    if M._libzstd_dict() is None:
        pytest.skip("libzstd dict API absent")
    samples = [f"sample record {i} with shared shape".encode() for i in range(64)]
    d = M.zstd_train_dict(samples, 2048)
    blob = M.zstd_compress_dict(data, d)
    assert M.zstd_decompress_dict(blob, d) == data
    if len(blob) > 0:
        bad = bytearray(blob)
        bad[-1] ^= 0xFF
        with pytest.raises(ValueError):
            M.zstd_decompress_dict(bytes(bad), d)


@settings(max_examples=60, deadline=None)
@given(
    vals=hst.lists(
        hst.floats(
            min_value=-1e9,
            max_value=1e9,
            allow_nan=False,
            allow_infinity=False,
        ),
        min_size=1,
        max_size=4000,
    ),
    n_parts=hst.integers(1, 7),
)
def test_tdigest_property(vals, n_parts):
    # invariants for any input and any partitioning: mass conserved,
    # quantiles monotone in q, bounded by min/max, rank error within
    # the q326 audit bound, and merge order-insensitive
    from node_etl_spark.functions.sketch import (
        _td_compress,
        tdigest_merge,
        tdigest_quantile,
    )

    step = max(1, len(vals) // n_parts)
    parts = [vals[i : i + step] for i in range(0, len(vals), step)]
    partials = []
    for p in parts:
        partials += _td_compress([(v, 1.0) for v in sorted(p)], 100)
    digest = tdigest_merge(partials, 100)
    assert abs(sum(w for _, w in digest) - len(vals)) < 1e-9 * max(
        1, len(vals)
    )
    sv = sorted(vals)
    qs = [0.0, 0.1, 0.3, 0.5, 0.7, 0.9, 1.0]
    ests = [tdigest_quantile(digest, q) for q in qs]
    assert ests == sorted(ests)
    # rank tolerance: the t-digest bound plus the 1/n quantization
    # floor (with n values, ranks only exist on a 1/n grid)
    eps = 0.005 + 1.0 / len(sv)
    for q, e in zip(qs, ests):
        assert sv[0] <= e <= sv[-1]
        lo = sum(1 for v in sv if v < e) / len(sv)
        hi = sum(1 for v in sv if v <= e) / len(sv)
        assert lo - eps <= q <= hi + eps
    # merge is order-insensitive (sorted-merge determinism)
    assert tdigest_merge(list(reversed(partials)), 100) == digest


@settings(max_examples=50, deadline=None)
@given(
    text=hst.text(
        alphabet=hst.characters(codec="utf-8", exclude_categories=("Cs",)),
        max_size=2000,
    ),
    prefix=hst.text(
        alphabet=hst.characters(min_codepoint=33, max_codepoint=126),
        max_size=10,
    ),
)
def test_cdc_chunking_property(text, prefix):
    # pure-python replay of the chunker's boundary rule (the weighted-
    # codepoint polynomial, term by term): chunks always reassemble to
    # the document, and boundary positions after an insertion coincide
    # with the original ones beyond the window
    from node_etl_spark.functions.dedup import _CDC_M, _CDC_POWS, _cdc_cuts

    def cuts(t, w=16, mask=32):
        out = []
        for i in range(w, len(t)):
            h = sum(
                ord(c) * _CDC_POWS[w - 1 - k]
                for k, c in enumerate(t[i - w : i])
            ) % _CDC_M
            if h % mask == 0:
                out.append(i)
        # the numpy fast path must agree with the scalar replay exactly
        assert _cdc_cuts(t, w, mask) == out
        return out

    n = len(text)
    c = cuts(text) + ([n] if n else [])
    prev = 0
    parts = []
    for e in c:
        parts.append(text[prev:e])
        prev = e
    assert "".join(parts) == text
    assert all(p for p in parts) or n == 0

    if n >= 64 and prefix:
        shifted = prefix + text
        k = len(prefix)
        c1 = set(cuts(text))
        c2 = {i - k for i in cuts(shifted)}
        # beyond the window, boundaries are content-determined: every
        # original cut at position >= window reappears shifted
        tail1 = {i for i in c1 if i >= 16}
        assert tail1 <= c2


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ops=hst.lists(
        hst.sampled_from(["append", "delete", "compact"]),
        min_size=1,
        max_size=6,
    )
)
def test_snapshot_history_property(spark, tmp_path_factory, ops):
    # any commit sequence: version numbers are dense, every historical
    # version stays readable and content-stable after later commits
    from pyspark.sql import functions as F

    from node_etl_spark.sources.snapshot import SnapshotTable

    t = SnapshotTable(str(tmp_path_factory.mktemp("snap") / "tbl"))
    nxt = 0
    expected = {}  # version -> frozenset of ids
    live = set()
    for op in ops:
        if op == "append" or not t.versions():
            ids = set(range(nxt, nxt + 5))
            nxt += 5
            t.append(
                spark.createDataFrame(
                    [(i,) for i in sorted(ids)], schema="id bigint"
                ).withColumn("b", (F.col("id") % 3).cast("int"))
            )
            live |= ids
        elif op == "delete":
            t.delete(spark, "b = 1")
            live = {i for i in live if i % 3 != 1}
        else:
            t.compact(spark, target_files=1)
        expected[max(t.versions())] = frozenset(live)
    for v, ids in expected.items():
        got = frozenset(
            r["id"] for r in t.read(spark, v).collect()
        )
        assert got == ids, (v, ops)
    assert t.versions() == list(range(1, len(expected) + 1))
