import hashlib

from pyspark.sql import functions as F

from node_etl_spark.functions import multimodal as M


def make_files(tmp_path, n=4):
    for i in range(n):
        (tmp_path / f"img{i}.bin").write_bytes(bytes([i]) * (100 + i * 37))
    (tmp_path / "skip.txt").write_text("not media")
    return str(tmp_path)


def test_binary_folder_glob(spark, tmp_path):
    path = make_files(tmp_path)
    df = M.binary_folder(spark, path, glob="*.bin")
    assert df.count() == 4
    assert {"path", "content", "length"} <= set(df.columns)


def test_extract_image_features_schema_and_determinism(spark, tmp_path):
    path = make_files(tmp_path)
    out = M.extract_image_features(M.binary_folder(spark, path, glob="*.bin"))
    rows = {r.path.split("/")[-1]: r for r in out.collect()}
    assert len(rows) == 4
    r0 = rows["img0.bin"]
    assert r0.n_bytes == 100
    assert len(r0.features) == 8
    # deterministic fake: same content -> same features on rerun
    again = {
        r.path.split("/")[-1]: r
        for r in M.extract_image_features(
            M.binary_folder(spark, path, glob="*.bin")
        ).collect()
    }
    assert again["img0.bin"].features == r0.features


def test_extract_features_corrupt_input_null_row(spark, tmp_path):
    path = make_files(tmp_path, n=2)

    def explode_decoder(content):
        raise ValueError("corrupt")

    out = M.extract_image_features(
        M.binary_folder(spark, path, glob="*.bin"), decode_fn=explode_decoder
    )
    rows = out.collect()
    assert len(rows) == 2  # rows survive with null features (warn-and-skip policy)
    assert all(r.features is None and r.width is None for r in rows)
    assert all(r.n_bytes > 0 for r in rows)


def test_sample_frames_1_to_n(spark, tmp_path):
    path = make_files(tmp_path)
    out = M.sample_frames(M.binary_folder(spark, path, glob="*.bin"), max_frames=3)
    by_path = {}
    for r in out.collect():
        by_path.setdefault(r.path.split("/")[-1], []).append(r)
    assert all(1 <= len(v) <= 3 for v in by_path.values())
    f = sorted(by_path["img1.bin"], key=lambda r: r.frame_idx)[0]
    assert f.frame_ts_ms == 0
    expected = hashlib.md5(bytes([1]) * 64).hexdigest()
    assert f.frame_md5 == expected


def test_media_dedup_key(spark, tmp_path):
    (tmp_path / "a.bin").write_bytes(b"same-bytes")
    (tmp_path / "b.bin").write_bytes(b"same-bytes")
    (tmp_path / "c.bin").write_bytes(b"other")
    df = M.attach_media_metadata(M.binary_folder(spark, str(tmp_path), glob="*.bin"))
    groups = df.groupBy("media_md5").count().collect()
    counts = sorted(r["count"] for r in groups)
    assert counts == [1, 2]


def test_pcm_window_energy_exact_windows(spark):
    from node_etl_spark.functions.multimodal import pcm_window_energy

    # 5 bytes, window 4: full window [0,1,2,3] then partial [4]
    df = spark.createDataFrame(
        [(1, bytes([128, 129, 127, 130, 100]))], "doc_id long, content binary"
    )
    rows = {
        (r.win, r.n_samples, r.energy)
        for r in pcm_window_energy(df, window=4).collect()
    }
    # energies: (0^2+1^2+1^2+2^2)=6 ; (28^2)=784
    assert rows == {(0, 4, 6), (1, 1, 784)}


def test_pcm_window_energy_skips_empty_and_null(spark):
    from node_etl_spark.functions.multimodal import pcm_window_energy

    df = spark.createDataFrame(
        [(1, b""), (2, None), (3, bytes([0] * 3))], "doc_id long, content binary"
    )
    rows = [(r.doc_id, r.win, r.energy) for r in pcm_window_energy(df, window=8).collect()]
    assert rows == [(3, 0, 3 * 128 * 128)]


def test_ahash60_carry_cols_and_segment_scoped_pairs(spark):
    from node_etl_spark.functions import dedup as D
    from node_etl_spark.functions.multimodal import ahash60

    rows = [
        (1, b"aaa bbb ccc 123", "album1"),
        (2, b"aaa bbb ccc 123", "album1"),   # identical -> hamming 0
        (3, b"aaa bbb ccc 123", "album2"),   # identical but other album
        (4, b"zzz qqq!!!", "album1"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, content binary, src string"
    )
    sigs = ahash60(df, id_col="doc_id", carry_cols=("src",))
    got = {r.doc_id: (r.phash, r.src) for r in sigs.collect()}
    assert got[1] == got[2] and got[1][0] == got[3][0]  # same fingerprint
    assert got[1][1] == "album1" and got[3][1] == "album2"
    pairs = D.simhash_band_pairs(
        sigs.withColumnRenamed("phash", "simhash"),
        max_hamming=1, segment_col="src",
    ).collect()
    # only the within-album identical pair survives the segment scope
    assert [(p.d1, p.d2, p.hamming) for p in pairs] == [(1, 2, 0)]


def test_bmp24_roundtrip_all_padding_widths():
    # widths 4-8 hit every 4-byte row-padding remainder; values cover
    # the full byte range
    from node_etl_spark.functions.multimodal import decode_bmp24, encode_bmp24

    for w in range(4, 9):
        for h in (1, 3, 4):
            pixels = [
                [((x * 37 + y * 11) % 256, (x + y) % 256, (255 - x * y) % 256)
                 for x in range(w)]
                for y in range(h)
            ]
            blob = encode_bmp24(w, h, pixels)
            gw, gh, rows = decode_bmp24(blob)
            assert (gw, gh) == (w, h)
            assert rows == pixels


def test_bmp24_decodes_topdown_layout():
    # negative height = top-down row order; the decoder must not flip
    import struct

    from node_etl_spark.functions.multimodal import decode_bmp24, encode_bmp24

    pixels = [[(y, 0, 0) for _ in range(4)] for y in range(3)]
    blob = bytearray(encode_bmp24(4, 3, pixels))
    # rewrite height to -3 and re-order rows top-down in place
    struct.pack_into("<i", blob, 22, -3)
    row_size = 12
    off = 54
    rows = [bytes(blob[off + i * row_size : off + (i + 1) * row_size]) for i in range(3)]
    blob[off:] = b"".join(reversed(rows))
    gw, gh, got = decode_bmp24(bytes(blob))
    assert (gw, gh) == (4, 3)
    assert got == pixels


def test_bmp24_rejects_non_bmp_and_truncated():
    import pytest

    from node_etl_spark.functions.multimodal import decode_bmp24, encode_bmp24

    with pytest.raises(ValueError):
        decode_bmp24(b"PNG not a bmp at all........................................")
    blob = encode_bmp24(5, 4, [[(1, 2, 3)] * 5 for _ in range(4)])
    with pytest.raises(ValueError):
        decode_bmp24(blob[:-8])  # truncated pixel array


def test_decode_bmp_features_through_arrow_hook(spark, tmp_path):
    # the REAL decoder through extract_image_features: pixel sums out,
    # corrupt input -> null row (the warn-and-skip policy)
    from node_etl_spark.functions.multimodal import (
        decode_bmp_features,
        encode_bmp24,
        extract_image_features,
    )

    pixels = [[(10, 20, 30), (40, 50, 60)], [(70, 80, 90), (100, 110, 120)]]
    good = encode_bmp24(2, 2, pixels)
    df = spark.createDataFrame(
        [("a", good), ("b", b"garbage bytes")], "path string, content binary"
    )
    got = {
        r.path: (r.width, r.height, r.channels, r.features)
        for r in extract_image_features(df, decode_fn=decode_bmp_features).collect()
    }
    assert got["a"] == (2, 2, 3, [220.0, 260.0, 300.0])
    assert got["b"] == (None, None, None, None)


def test_png24_roundtrip_every_filter_type():
    # each of the five scanline filters (None/Sub/Up/Average/Paeth)
    # forced for a whole image, plus the default 0..4 cycle; values
    # cover the byte range; odd widths exercise the bpp offsets
    from node_etl_spark.functions.multimodal import decode_png24, encode_png24

    for w, h in ((1, 1), (4, 3), (7, 5), (5, 6)):
        pixels = [
            [((x * 37 + y * 11) % 256, (x + y * 3) % 256, (255 - x * y) % 256)
             for x in range(w)]
            for y in range(h)
        ]
        for filters in (None, [0], [1], [2], [3], [4]):
            blob = encode_png24(w, h, pixels, filters=filters)
            gw, gh, rows = decode_png24(blob)
            assert (gw, gh) == (w, h)
            assert rows == pixels, (w, h, filters)


def test_png24_rejects_bad_signature_crc_and_unsupported():
    import struct

    import pytest

    from node_etl_spark.functions.multimodal import decode_png24, encode_png24

    blob = encode_png24(4, 3, [[(1, 2, 3)] * 4 for _ in range(3)])
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png24(b"BM" + blob[2:])
    flipped = bytearray(blob)
    flipped[20] ^= 0xFF  # corrupt a byte inside IHDR -> CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        decode_png24(bytes(flipped))
    with pytest.raises(ValueError, match="truncated"):
        decode_png24(blob[:24])
    # rewrite colortype to 6 (RGBA) WITH a valid CRC: unsupported
    import zlib

    ihdr = struct.pack(">IIBBBBB", 4, 3, 8, 6, 0, 0, 0)
    chunk = (
        struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    )
    rgba = blob[:8] + chunk + blob[8 + len(chunk):]
    with pytest.raises(ValueError, match="truecolor"):
        decode_png24(rgba)


def test_decode_png_features_through_arrow_hook(spark):
    # the REAL PNG decoder through extract_image_features: pixel sums
    # out, corrupt input -> null row (the warn-and-skip policy)
    from node_etl_spark.functions.multimodal import (
        decode_png_features,
        encode_png24,
        extract_image_features,
    )

    good = encode_png24(2, 2, [[(1, 2, 3), (4, 5, 6)], [(7, 8, 9), (100, 110, 120)]])
    df = spark.createDataFrame(
        [("a", bytearray(good)), ("b", bytearray(b"not a png"))],
        "path string, content binary",
    )
    got = {
        r.path: (r.width, r.height, r.channels, r.features)
        for r in extract_image_features(df, decode_fn=decode_png_features).collect()
    }
    assert got["a"] == (2, 2, 3, [112.0, 125.0, 138.0])
    assert got["b"] == (None, None, None, None)


def test_wav16_roundtrip_and_stdlib_cross_check():
    # our encoder must round-trip through our parser AND through the
    # INDEPENDENT stdlib wave module (which walks the same chunk
    # stream), junk chunk and odd-size padding included
    import io
    import struct
    import wave

    from node_etl_spark.functions.multimodal import decode_wav16, encode_wav16

    samples = [((i * 17 + 31) % 4096) - 2048 for i in range(300)]
    for junk in (None, b"x" * 7, b"y" * 8):  # absent, odd (pad byte), even
        blob = encode_wav16(16000, samples, junk=junk)
        rate, got = decode_wav16(blob)
        assert rate == 16000 and got == samples
    blob = encode_wav16(16000, samples)
    w = wave.open(io.BytesIO(blob))
    assert (w.getframerate(), w.getnchannels(), w.getsampwidth()) == (16000, 1, 2)
    ind = struct.unpack(f"<{w.getnframes()}h", w.readframes(w.getnframes()))
    assert list(ind) == samples


def test_wav16_rejects_non_wav_truncated_and_stereo():
    import struct

    import pytest

    from node_etl_spark.functions.multimodal import decode_wav16, encode_wav16

    blob = encode_wav16(8000, [0, 1, -1, 32767, -32768])
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav16(b"RIFX" + blob[4:])
    with pytest.raises(ValueError, match="missing fmt"):
        decode_wav16(blob[:12])
    stereo = bytearray(blob)
    struct.pack_into("<H", stereo, blob.find(b"fmt ") + 8 + 2, 2)
    with pytest.raises(ValueError, match="mono PCM16"):
        decode_wav16(bytes(stereo))


def test_wav_window_energy_through_arrow_hook(spark):
    # real WAV in, per-window integer energies out; corrupt file
    # yields no rows (warn-and-skip)
    from node_etl_spark.functions.multimodal import (
        encode_wav16,
        wav_window_energy,
    )

    samples = [3] * 64 + [-2] * 10  # two windows: full + trailing partial
    blob = encode_wav16(12000, samples)
    df = spark.createDataFrame(
        [(1, bytearray(blob)), (2, bytearray(b"not a wav"))],
        "doc_id long, content binary",
    )
    rows = sorted(
        wav_window_energy(df, window=64).collect(), key=lambda r: r.win
    )
    assert [(r.doc_id, r.sample_rate, r.win, r.n_samples, r.energy) for r in rows] == [
        (1, 12000, 0, 64, 64 * 9),
        (1, 12000, 1, 10, 10 * 4),
    ]


# ---------------------------------------------------------- JPEG codec


def test_jpeg_entropy_layer_exact_for_any_coeff_block():
    # The Huffman/run-length/magnitude layer is exactly invertible for
    # ANY integer coefficient block (lossiness lives only in
    # DCT+quantization). Drive encoder/decoder block primitives
    # directly with adversarial blocks: long zero runs needing ZRL,
    # trailing zeros needing EOB, max-category values, negatives.
    import random

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

    dc_codes = _huff_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _huff_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)
    dc_tab = _huff_decode_table(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_tab = _huff_decode_table(_JPEG_AC_BITS, _JPEG_AC_VALS)

    rng = random.Random(42)
    blocks = [
        [0] * 64,                     # all-zero: bare EOB
        [1023] + [0] * 63,            # max DC category
        [-1023] + [0] * 62 + [-1],    # negative DC, last-slot AC (no EOB)
        [0] * 63 + [5],               # 62-zero run: 3 ZRLs + coded run
        [7] + [0, 1] * 31 + [0],      # alternating short runs
    ]
    for _ in range(50):
        blk = [rng.randint(-1023, 1023)]
        for _k in range(63):
            blk.append(rng.choice([0, 0, 0, rng.randint(-255, 255)]))
        blocks.append(blk)

    w = _JpegBitWriter()
    pred = 0
    for blk in blocks:
        pred = _encode_block_coeffs(w, blk, pred, dc_codes, ac_codes)
    w.align()
    data = bytes(w.out) + b"\xff\xd9"

    br = _JpegBitReader(data, 0)
    pred = 0
    for blk in blocks:
        got = _decode_block_coeffs(br, pred, dc_tab, ac_tab)
        pred = got[0]
        assert got == blk


def test_jpeg_constant_block_roundtrip_exact_with_restarts():
    # constant-per-block images with EVEN levels survive the lossy
    # pipeline exactly (DC step 16 divides 8*level; ACs quantize to
    # 0) — the q299 gate's input class, here across every restart
    # interval including none
    from node_etl_spark.functions.multimodal import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    vals = [0, 2, 84, 128, 254, 126, 200, 66]
    w, h = 32, 16  # 4x2 blocks
    img = [
        [vals[(y // 8) * 4 + (x // 8)] for x in range(w)] for y in range(h)
    ]
    for ri in (0, 1, 2, 3, 7):
        blob = encode_jpeg_gray(w, h, img, restart_interval=ri)
        gw, gh, rows = decode_jpeg_gray(blob)
        assert (gw, gh) == (w, h)
        assert rows == img
        if ri:
            assert b"\xff\xd0" in blob  # RST0 really appears
            assert b"\xff\xdd" in blob  # DRI segment


def test_jpeg_lossy_roundtrip_bounded_error_and_edge_padding():
    # general content: decode is approximate but bounded, and
    # non-multiple-of-8 dims exercise edge-replication padding + crop
    import numpy as np

    from node_etl_spark.functions.multimodal import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    for w, h in ((5, 3), (17, 9), (24, 16), (30, 21)):
        img = [
            [min(255, 40 + 3 * x + 5 * y) for x in range(w)]
            for y in range(h)
        ]
        gw, gh, rows = decode_jpeg_gray(encode_jpeg_gray(w, h, img))
        assert (gw, gh) == (w, h)
        mae = np.abs(np.asarray(rows, float) - np.asarray(img, float)).mean()
        assert mae < 4.0, (w, h, mae)


def test_jpeg_marker_stream_is_spec_conformant():
    # no second decoder exists in this env (no Pillow), so assert the
    # emitted stream structurally against T.81/JFIF: marker layout,
    # Annex-K table bytes in zigzag order, SOF0 geometry, EOI tail
    import struct

    from node_etl_spark.functions.multimodal import (
        _JPEG_AC_BITS,
        _JPEG_AC_VALS,
        _JPEG_DC_BITS,
        _JPEG_DC_VALS,
        _JPEG_QUANT_LUMA,
        _JPEG_ZIGZAG,
        encode_jpeg_gray,
    )

    blob = encode_jpeg_gray(24, 8, [[8] * 24] * 8, restart_interval=2)
    assert blob[:2] == b"\xff\xd8" and blob[-2:] == b"\xff\xd9"
    segs = {}
    pos = 2
    while blob[pos + 1] != 0xDA:
        assert blob[pos] == 0xFF
        (ln,) = struct.unpack_from(">H", blob, pos + 2)
        segs[blob[pos + 1]] = blob[pos + 4 : pos + 2 + ln]
        pos += 2 + ln
    assert segs[0xE0][:5] == b"JFIF\x00"
    assert segs[0xDB][0] == 0x00  # 8-bit table 0
    assert list(segs[0xDB][1:65]) == [
        _JPEG_QUANT_LUMA[_JPEG_ZIGZAG[k]] for k in range(64)
    ]
    prec, hh, ww, nc = struct.unpack_from(">BHHB", segs[0xC0], 0)
    assert (prec, hh, ww, nc) == (8, 8, 24, 1)
    dht = segs[0xC4]
    assert dht[0] == 0x00 and list(dht[1:17]) == _JPEG_DC_BITS
    ndc = sum(_JPEG_DC_BITS)
    assert list(dht[17 : 17 + ndc]) == _JPEG_DC_VALS
    assert dht[17 + ndc] == 0x10
    assert list(dht[18 + ndc : 34 + ndc]) == _JPEG_AC_BITS
    assert list(dht[34 + ndc :]) == _JPEG_AC_VALS
    assert struct.unpack(">H", segs[0xDD])[0] == 2
    assert b"\xff\xd0" in blob  # 3 MCUs, interval 2 -> one RST0


def test_jpeg_rejects_non_jpeg_truncated_and_unsupported():
    import pytest

    from node_etl_spark.functions.multimodal import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    blob = encode_jpeg_gray(16, 8, [[100] * 16] * 8)
    for bad in (
        b"",
        b"\x89PNG",
        b"\xff\xd8\xff\xd9",          # no SOF/SOS
        blob[: len(blob) // 2],        # truncated mid-stream
        # SOF2 + a baseline-style scan header (Ss=0,Se=63) is malformed
        # for progressive (DC scans must have Se=0) — r9: progressive
        # itself now DECODES, see test_progressive_jpeg_* below
        blob.replace(b"\xff\xc0", b"\xff\xc2", 1),
    ):
        with pytest.raises(ValueError):
            decode_jpeg_gray(bad)
    # stuffing corruption: drop the 0x00 after a stuffed 0xFF in the
    # entropy stream, if one exists — the reader must not misparse
    sos = blob.find(b"\xff\xda")
    stuffed = blob.find(b"\xff\x00", sos)
    if stuffed != -1:
        with pytest.raises(ValueError):
            decode_jpeg_gray(blob[:stuffed + 1] + blob[stuffed + 2 :])


def test_decode_jpeg_features_through_arrow_hook(spark):
    from node_etl_spark.functions.multimodal import (
        decode_jpeg_features,
        encode_jpeg_gray,
        extract_image_features,
    )

    good = encode_jpeg_gray(8, 8, [[42] * 8] * 8)
    df = spark.createDataFrame(
        [("a", bytearray(good)), ("b", bytearray(b"not a jpeg"))],
        "path string, content binary",
    )
    got = {
        r.path: (r.width, r.height, r.channels, r.features)
        for r in extract_image_features(
            df, decode_fn=decode_jpeg_features
        ).collect()
    }
    assert got["a"] == (8, 8, 1, [42.0 * 64])
    assert got["b"] == (None, None, None, None)


# ----------------------------------------------------------- GIF codec


def test_gif_lzw_exact_incl_width_growth_and_dict_reset():
    # long random streams force code-width growth to 12 bits and the
    # 4096-entry dictionary reset; short runs force the KwKwK case
    import random

    from node_etl_spark.functions.multimodal import (
        _gif_lzw_decode,
        _gif_lzw_encode,
    )

    rng = random.Random(3)
    for mcs in (2, 3, 8):
        for n in (1, 7, 300, 30000):
            idx = [rng.randrange(1 << mcs) for _ in range(n)]
            assert _gif_lzw_decode(_gif_lzw_encode(idx, mcs), mcs, n) == idx
    assert _gif_lzw_decode(_gif_lzw_encode([1] * 7, 2), 2, 7) == [1] * 7


def test_gif_container_roundtrip_multi_frame_delays_palette():
    import random

    from node_etl_spark.functions.multimodal import decode_gif, encode_gif

    rng = random.Random(9)
    for _ in range(10):
        w, h = rng.randint(1, 12), rng.randint(1, 9)
        npal = rng.randint(2, 17)
        pal = [
            (rng.randrange(256), rng.randrange(256), rng.randrange(256))
            for _ in range(npal)
        ]
        nf = rng.randint(1, 5)
        frames = [
            [[rng.randrange(npal) for _ in range(w)] for _ in range(h)]
            for _ in range(nf)
        ]
        delays = [rng.randint(1, 50) for _ in range(nf)]
        blob = encode_gif(w, h, frames, pal, delays)
        # planted extensions really appear (decoder must skip them)
        assert b"NETSCAPE2.0" in blob and b"\x21\xfe" in blob
        gw, gh, gpal, gframes = decode_gif(blob)
        assert (gw, gh) == (w, h)
        assert [tuple(p) for p in gpal[:npal]] == pal
        assert [d for d, _ in gframes] == delays
        assert [r for _, r in gframes] == frames


def test_gif_rejects_non_gif_truncated_and_unsupported():
    import pytest

    from node_etl_spark.functions.multimodal import decode_gif, encode_gif

    blob = encode_gif(4, 3, [[[1, 0, 1, 0]] * 3], [(0, 0, 0), (255, 0, 0)])
    for bad in (
        b"",
        b"GIF89a",
        blob[:20],
        blob.replace(b"GIF89a", b"GIF99a"),
        blob[:-1],  # missing trailer
    ):
        with pytest.raises(ValueError):
            decode_gif(bad)
    # interlace flag set -> unsupported (stub policy, not garbage out)
    img_desc = blob.find(b"\x2c")
    tweaked = bytearray(blob)
    tweaked[img_desc + 9] |= 0x40
    with pytest.raises(ValueError):
        decode_gif(bytes(tweaked))


def test_gif_frame_stats_through_arrow_hook(spark):
    from node_etl_spark.functions.multimodal import (
        encode_gif,
        gif_frame_stats,
    )

    pal = [(10, 0, 0), (20, 0, 0), (30, 0, 0)]
    frames = [
        [[0, 1], [2, 0]],  # sum_idx 3, sum_r 10+20+30+10=70
        [[2, 2], [2, 2]],  # sum_idx 8, sum_r 120
        [[1, 1], [1, 1]],  # sum_idx 4, sum_r 80
    ]
    blob = encode_gif(2, 2, frames, pal, delays_cs=[5, 7, 9])
    df = spark.createDataFrame(
        [(1, bytearray(blob)), (2, bytearray(b"junk"))],
        "doc_id bigint, content binary",
    )
    got = {
        (r.doc_id, r.frame_idx): (r.frame_ts_ms, r.n_px, r.sum_idx, r.sum_r)
        for r in gif_frame_stats(df, every_k=2).collect()
    }
    # every_k=2 keeps frames 0 and 2; timestamps are cumulative delays
    assert got == {
        (1, 0): (50, 4, 3, 70),
        (1, 2): (210, 4, 4, 80),
    }


# ------------------------------------------------- WebDataset shards


def test_tar_shard_deterministic_and_gzip_sniffed():
    from node_etl_spark.functions.multimodal import (
        encode_tar_shard,
        iter_tar_members,
    )

    members = [("1.txt", b"hello"), ("1.cls", b"en"), ("2.txt", b"x" * 600)]
    plain = encode_tar_shard(members)
    gz = encode_tar_shard(members, compress=True)
    assert plain == encode_tar_shard(members)  # content-addressable
    assert gz[:2] == b"\x1f\x8b"
    assert list(iter_tar_members(plain)) == members
    assert list(iter_tar_members(gz)) == members  # r:* sniffs gzip


def test_explode_tar_members_through_arrow_hook(spark):
    from node_etl_spark.functions.multimodal import (
        encode_tar_shard,
        explode_tar_members,
    )

    shard = encode_tar_shard([("a.txt", b"abc"), ("a.cls", b"1")])
    df = spark.createDataFrame(
        [(1, bytearray(shard)), (2, bytearray(b"not a tar"))],
        "doc_id bigint, content binary",
    )
    got = {
        (r.doc_id, r.member_name): (r.member_size, bytes(r.member_bytes))
        for r in explode_tar_members(df).collect()
    }
    # corrupt shard contributes no rows (warn-and-skip)
    assert got == {
        (1, "a.txt"): (3, b"abc"),
        (1, "a.cls"): (1, b"1"),
    }


def test_webdataset_samples_adjacency_grouping(spark):
    from node_etl_spark.functions.multimodal import (
        encode_tar_shard,
        webdataset_samples,
    )

    # two samples; multi-dot extension stays whole; a leading
    # directory prefix is stripped to the basename (shards often
    # carry a data/ prefix)
    shard = encode_tar_shard(
        [
            ("data/000/017.jpg", b"JPG"),
            ("data/000/017.meta.json", b"{}"),
            ("data/000/018.jpg", b"JPG2"),
            ("data/000/018.txt", b"caption"),
        ]
    )
    df = spark.createDataFrame(
        [(7, bytearray(shard))], "doc_id bigint, content binary"
    )
    got = {
        r.sample_key: {k: bytes(v) for k, v in r.parts.items()}
        for r in webdataset_samples(df).collect()
    }
    assert got == {
        "017": {"jpg": b"JPG", "meta.json": b"{}"},
        "018": {"jpg": b"JPG2", "txt": b"caption"},
    }


def test_webdataset_shard_composes_with_image_decode(spark):
    # the full multimodal ingest chain: tar shard -> member explode ->
    # magic-sniffed real decode; one partition-local pipeline
    from node_etl_spark.functions.multimodal import (
        decode_image_auto,
        encode_png24,
        encode_tar_shard,
        explode_tar_members,
        extract_image_features,
    )

    png = encode_png24(2, 1, [[(1, 2, 3), (4, 5, 6)]])
    shard = encode_tar_shard([("s.png", png), ("s.txt", b"caption")])
    df = spark.createDataFrame(
        [(1, bytearray(shard))], "doc_id bigint, content binary"
    )
    members = explode_tar_members(df).select(
        F.col("member_name").alias("path"),
        F.col("member_bytes").alias("content"),
    )
    got = {
        r.path: (r.width, r.channels, r.features)
        for r in extract_image_features(
            members, decode_fn=decode_image_auto
        ).collect()
    }
    assert got["s.png"] == (2, 3, [5.0, 7.0, 9.0])
    assert got["s.txt"] == (None, None, None)  # not an image: null row


# --------------------------------------------- compressed text columns


def test_compress_decompress_all_codecs_and_sniff():
    from node_etl_spark.functions.multimodal import (
        _TEXT_CODECS,
        compress_bytes,
        decompress_bytes,
        sniff_compression,
    )

    data = ("héllo wörld " * 50).encode("utf-8")
    for codec in _TEXT_CODECS:
        blob = compress_bytes(data, codec)
        assert sniff_compression(blob) == codec
        assert decompress_bytes(blob, codec) == data
        assert decompress_bytes(blob, "auto") == data  # sniffed
        assert compress_bytes(data, codec) == blob  # deterministic
    import pytest

    with pytest.raises(ValueError):
        compress_bytes(data, "lz4")  # genuinely unknown codec name
    with pytest.raises(ValueError):
        decompress_bytes(b"\x28\xb5\x2f\xfd unknown zstd frame")
    with pytest.raises(ValueError):
        decompress_bytes(b"\x1f\x8b corrupt gzip")

    # ADVICE r8: RFC1950-valid zlib streams with smaller deflate
    # windows (CMF low nibble 8, CINFO<=7 — other writers emit these)
    # must sniff as zlib too, not just the common 0x78
    import zlib

    for wbits in (9, 11, 13, 15):  # CMF 0x18/0x38/0x58/0x78
        co = zlib.compressobj(9, zlib.DEFLATED, wbits)
        blob = co.compress(data) + co.flush()
        assert sniff_compression(blob) == "zlib", hex(blob[0])
        assert decompress_bytes(blob, "auto") == data
    # CINFO>7 (reserved) and non-deflate CM stay unknown even when the
    # FCHECK checksum happens to divide
    assert sniff_compression(b"\x88\x00garbage") is None
    assert sniff_compression(b"\x79\x04garbage") is None


def test_decoders_normalize_truncation_to_valueerror():
    # ADVICE r8: docstrings promise ValueError on corrupt input, but a
    # struct.unpack_from on a truncated segment used to leak
    # struct.error — the _corrupt_as_valueerror wrapper closes the gap
    import pytest

    from node_etl_spark.functions.multimodal import (
        decode_bmp24,
        decode_gif,
        decode_jpeg_gray,
        decode_png24,
        decode_wav16,
        encode_gif,
    )

    gif = encode_gif(2, 1, [[[0, 1]]], [(1, 2, 3), (4, 5, 6)])
    cases = [
        (decode_gif, b"GIF89a\x02\x00"),  # header cut mid-LSD
        (decode_gif, gif[:15]),
        (decode_jpeg_gray, b"\xff\xd8\xff\xc0\x00"),  # SOF cut mid-length
        (decode_wav16, b"RIFF\x10\x00\x00\x00WAVEfmt \x02"),
        (decode_bmp24, b"BM" + b"\x00" * 10),
        (decode_png24, b"\x89PNG\r\n\x1a\n\x00\x00"),
    ]
    for fn, blob in cases:
        with pytest.raises(ValueError):
            fn(blob)


def test_gif_frame_stats_rejects_every_k_zero(spark):
    # ADVICE r8: every_k=0 used to ZeroDivisionError inside the
    # executor (fi % every_k), failing the whole task; now rejected
    # up front before the mapInPandas stage is built
    import pytest

    from node_etl_spark.functions.multimodal import gif_frame_stats

    df = spark.createDataFrame(
        [(1, bytearray(b""))], "doc_id bigint, content binary"
    )
    for bad in (0, -1):
        with pytest.raises(ValueError):
            gif_frame_stats(df, every_k=bad)


def test_compress_text_columns_roundtrip_nulls_and_garbage(spark):
    from node_etl_spark.functions.multimodal import (
        compress_text,
        decompress_text,
    )

    df = spark.createDataFrame(
        [(1, "hello"), (2, None)], "id bigint, t string"
    )
    packed = df.select("id", compress_text("t", "bz2").alias("blob"))
    out = {
        r.id: r.t2
        for r in packed.select(
            "id", decompress_text("blob").alias("t2")
        ).collect()
    }
    assert out == {1: "hello", 2: None}
    # unknown container (zstd-shaped) and corrupt payloads -> NULL
    bad = spark.createDataFrame(
        [(1, bytearray(b"\x28\xb5\x2f\xfdzstd")), (2, bytearray(b"BZh junk"))],
        "id bigint, blob binary",
    )
    got = {
        r.id: r.t
        for r in bad.select(
            "id", decompress_text("blob").alias("t")
        ).collect()
    }
    assert got == {1: None, 2: None}


def test_avi_mjpeg_container_roundtrip_and_adversaries():
    import pytest

    from node_etl_spark.functions.multimodal import (
        decode_avi_mjpeg,
        decode_jpeg_gray,
        encode_avi_mjpeg,
        encode_jpeg_gray,
        sniff_media_type,
    )

    def frame(d, f, bw, bh):
        return [
            [2 * ((d * 7 + f * 11 + (x // 8) * 13 + (y // 8) * 19) % 128)
             for x in range(8 * bw)]
            for y in range(8 * bh)
        ]

    jpegs = [
        encode_jpeg_gray(16, 8, frame(3, f, 2, 1), restart_interval=f % 3)
        for f in range(4)
    ]
    avi = encode_avi_mjpeg(16, 8, jpegs, ms_per_frame=25)
    assert sniff_media_type(avi) == "avi"
    w, h, uspf, frames = decode_avi_mjpeg(avi)
    # timing comes back in MICROSECONDS (ADVICE r9: 30fps = 33333 us
    # must not floor to 33 ms and drift); 25 ms/frame encodes as 25000
    assert (w, h, uspf) == (16, 8, 25000)
    assert frames == jpegs  # byte-exact payload recovery through JUNK
    # every recovered frame decodes to the exact constant-block pixels
    for f, payload in enumerate(frames):
        fw, fh, rows = decode_jpeg_gray(payload)
        assert (fw, fh) == (16, 8) and rows == frame(3, f, 2, 1)
    # a standard 30 fps file stores dwMicroSecPerFrame=33333: the
    # decoder must hand it back un-floored (ts for frame 30 is then
    # 30*33333//1000 = 999 ms, not 30*33 = 990)
    import struct as _struct

    fps30 = bytearray(avi)
    _struct.pack_into("<I", fps30, bytes(fps30).find(b"avih") + 8, 33333)
    assert decode_avi_mjpeg(bytes(fps30))[2] == 33333
    # odd-length payloads exercise the RIFF pad-byte rule
    odd = encode_avi_mjpeg(4, 4, [b"\xff\xd8\x01", b"\xff\xd8\x02\x03"])
    assert decode_avi_mjpeg(odd)[3] == [b"\xff\xd8\x01", b"\xff\xd8\x02\x03"]
    # junk=None still decodes (JUNK is optional)
    assert decode_avi_mjpeg(
        encode_avi_mjpeg(4, 4, [b"\xff\xd8\x01"], junk=None)
    )[3] == [b"\xff\xd8\x01"]
    for bad in (
        b"",
        b"RIFF\x04\x00\x00\x00WAVE",  # WAV, not AVI
        avi[:40],  # truncated mid-hdrl
        avi[:-3],  # truncated mid-idx1
        avi.replace(b"vidsMJPG", b"vidsH264"),  # ffmpeg-only fourcc
    ):
        with pytest.raises(ValueError):
            decode_avi_mjpeg(bad)


def test_video_frame_stats_through_arrow_hook(spark):
    import pytest

    from node_etl_spark.functions.multimodal import (
        encode_avi_mjpeg,
        encode_jpeg_gray,
        video_frame_stats,
    )

    def clip(d, nf, bw, bh, mspf):
        jpegs = [
            encode_jpeg_gray(
                8 * bw, 8 * bh,
                [
                    [2 * ((d * 7 + f * 11 + (x // 8) * 13 + (y // 8) * 19)
                          % 128)
                     for x in range(8 * bw)]
                    for y in range(8 * bh)
                ],
            )
            for f in range(nf)
        ]
        return bytearray(encode_avi_mjpeg(8 * bw, 8 * bh, jpegs, mspf))

    rows = [
        (1, 1, clip(1, 4, 1, 1, 20)),
        (2, 2, clip(2, 5, 2, 1, 30)),   # stride 2 -> frames 0,2,4
        (3, 1, bytearray(b"not an avi")),  # corrupt: zero rows
        (None, 1, clip(9, 2, 1, 1, 10)),  # null id skipped
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, k int, content binary"
    )
    # constant stride
    got = video_frame_stats(df, every_k=2).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert sorted(r.frame_idx for r in by_doc[1]) == [0, 2]
    assert sorted(r.frame_idx for r in by_doc[2]) == [0, 2, 4]
    assert 3 not in by_doc and None not in by_doc
    # per-row stride column
    got = video_frame_stats(df, every_k="k").collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert sorted(r.frame_idx for r in by_doc[1]) == [0, 1, 2, 3]
    assert sorted(r.frame_idx for r in by_doc[2]) == [0, 2, 4]
    # container-derived timestamps and exact constant-block sums
    f2 = {r.frame_idx: r for r in by_doc[2]}
    assert f2[2].frame_ts_ms == 60 and f2[4].frame_ts_ms == 120
    assert f2[0].n_px == 128
    v = [2 * ((2 * 7 + 0 * 11 + bx * 13) % 128) for bx in (0, 1)]
    assert f2[0].sum_gray == 64 * sum(v)
    with pytest.raises(ValueError):
        video_frame_stats(df, every_k=0)


def test_progressive_jpeg_matches_baseline_decode():
    # progressive (SOF2) and baseline (SOF0) quantize identically, so
    # the progressive scan pipeline (DC first/refine, banded AC first
    # with EOB runs, AC refinement correction bits) must reconstruct
    # the SAME coefficients — decode equality with the already
    # oracle-gated baseline path validates both entropy directions
    import random

    from node_etl_spark.functions.multimodal import (
        decode_jpeg_gray,
        encode_jpeg_gray,
        encode_jpeg_progressive_gray,
    )

    rng = random.Random(42)
    for _ in range(8):
        w, h = rng.randint(3, 40), rng.randint(3, 30)
        img = [[rng.randint(0, 255) for _ in range(w)] for _ in range(h)]
        ri = rng.choice([0, 0, 1, 2, 5])
        base = decode_jpeg_gray(
            encode_jpeg_gray(w, h, img, restart_interval=ri)
        )
        for dc_al, ac_al, split in [(1, 2, 5), (0, 0, 5), (2, 3, 20),
                                    (1, 1, 1), (3, 4, 62)]:
            prog = decode_jpeg_gray(
                encode_jpeg_progressive_gray(
                    w, h, img, restart_interval=ri,
                    dc_al=dc_al, ac_al=ac_al, spectral_split=split,
                )
            )
            assert prog == base, (dc_al, ac_al, split, ri)


def test_progressive_jpeg_exact_on_constant_blocks_and_rejections():
    import pytest

    from node_etl_spark.functions.multimodal import (
        decode_jpeg_gray,
        encode_jpeg_progressive_gray,
    )

    img = [[2 * ((7 + (x // 8) * 13 + (y // 8) * 19) % 128)
            for x in range(24)] for y in range(16)]
    for ri in (0, 2):
        blob = encode_jpeg_progressive_gray(24, 16, img, restart_interval=ri)
        assert decode_jpeg_gray(blob) == (24, 16, img)
    with pytest.raises(ValueError):
        encode_jpeg_progressive_gray(24, 16, img, spectral_split=0)
    with pytest.raises(ValueError):
        encode_jpeg_progressive_gray(24, 16, img, dc_al=14)
    blob = encode_jpeg_progressive_gray(24, 16, img)
    for bad in (blob[:60], blob[:-4], blob[: len(blob) // 2]):
        with pytest.raises(ValueError):
            decode_jpeg_gray(bad)


def test_progressive_jpeg_through_avi_and_arrow_hook(spark):
    # progressive frames ride the SAME decode hook: extract_image_
    # features and MJPEG-AVI frame stats need no changes (the decoder
    # dispatches on SOF marker)
    from node_etl_spark.functions.multimodal import (
        encode_avi_mjpeg,
        encode_jpeg_progressive_gray,
        video_frame_stats,
    )

    img = [[2 * ((5 + (x // 8) * 13) % 128) for x in range(16)]
           for _ in range(8)]
    avi = encode_avi_mjpeg(
        16, 8, [encode_jpeg_progressive_gray(16, 8, img)], ms_per_frame=10
    )
    df = spark.createDataFrame(
        [(1, bytearray(avi))], "doc_id bigint, content binary"
    )
    rows = video_frame_stats(df).collect()
    assert len(rows) == 1
    assert rows[0].n_px == 128 and rows[0].sum_gray == sum(map(sum, img))


def test_color_jpeg_constant_mcu_exact_all_subsamplings():
    from node_etl_spark.functions.multimodal import (
        decode_jpeg_ycbcr,
        encode_jpeg_color,
    )

    def planes(d, w, h, mw, mh):
        y = [[128 + 2 * (((d * 3 + (x // mw) * 7 + (y_ // mh) * 11) % 60)
                         - 30) for x in range(w)] for y_ in range(h)]
        cb = [[128 + 17 * (((d + (x // mw) * 5 + (y_ // mh) * 3) % 5) - 2)
               for x in range(w)] for y_ in range(h)]
        cr = [[128 + 17 * (((d * 2 + (x // mw) * 3 + (y_ // mh) * 7) % 5)
                           - 2) for x in range(w)] for y_ in range(h)]
        return y, cb, cr

    for mode, (sh, sv) in [("444", (1, 1)), ("422", (2, 1)),
                           ("420", (2, 2))]:
        mw, mh = 8 * sh, 8 * sv
        for d, w, h, ri in [(3, mw, mh, 0), (7, 2 * mw + 5, mh + 3, 2),
                            (11, 3 * mw, 2 * mh + 1, 1)]:
            y, cb, cr = planes(d, w, h, mw, mh)
            blob = encode_jpeg_color(
                w, h, y, cb, cr, subsampling=mode, restart_interval=ri
            )
            assert decode_jpeg_ycbcr(blob) == (w, h, y, cb, cr), (mode, d)


def test_color_jpeg_444_luma_matches_gray_pipeline():
    # on random input the 444 luma channel must reproduce EXACTLY what
    # the oracle-gated grayscale codec produces (same quant table, same
    # DCT path) — pins the color MCU interleave to a verified baseline
    import random

    from node_etl_spark.functions.multimodal import (
        decode_jpeg_gray,
        decode_jpeg_ycbcr,
        encode_jpeg_color,
        encode_jpeg_gray,
    )

    rng = random.Random(5)
    for _ in range(3):
        w, h = rng.randint(3, 25), rng.randint(3, 20)
        y = [[rng.randint(0, 255) for _ in range(w)] for _ in range(h)]
        cb = [[rng.randint(0, 255) for _ in range(w)] for _ in range(h)]
        cr = [[rng.randint(0, 255) for _ in range(w)] for _ in range(h)]
        _, _, gy, _, _ = decode_jpeg_ycbcr(
            encode_jpeg_color(w, h, y, cb, cr, subsampling="444")
        )
        assert gy == decode_jpeg_gray(encode_jpeg_gray(w, h, y))[2]


def test_color_jpeg_rgb_layer_and_auto_routing(spark):
    from node_etl_spark.functions.multimodal import (
        decode_image_auto,
        decode_jpeg_rgb,
        encode_jpeg_color,
        encode_jpeg_gray,
        sniff_media_type,
    )

    # neutral chroma: RGB == (Y,Y,Y) exactly for the even-constant class
    yp = [[2 * ((x // 8 + (yy // 8) * 3 + 5) % 128) for x in range(24)]
          for yy in range(16)]
    cp = [[128] * 24 for _ in range(16)]
    blob = encode_jpeg_color(24, 16, yp, cp, cp, subsampling="420")
    assert sniff_media_type(blob) == "jpeg"
    w, h, rgb = decode_jpeg_rgb(blob)
    assert (w, h) == (24, 16)
    assert all(rgb[yy][x] == (yp[yy][x],) * 3
               for yy in range(16) for x in range(24))
    # decode_image_auto routes color JPEG to per-channel RGB sums
    gw, gh, ch, feats = decode_image_auto(blob)
    want = float(sum(map(sum, yp)))
    assert (gw, gh, ch) == (24, 16, 3) and feats == [want, want, want]
    # ...and still routes grayscale JPEG through the gray path
    gblob = encode_jpeg_gray(16, 8, [[100] * 16] * 8)
    gw, gh, ch, feats = decode_image_auto(gblob)
    assert (gw, gh, ch) == (16, 8, 1)


def test_color_jpeg_rejections():
    import pytest

    from node_etl_spark.functions.multimodal import (
        decode_jpeg_gray,
        decode_jpeg_ycbcr,
        encode_jpeg_color,
        encode_jpeg_gray,
    )

    yp = [[100] * 16 for _ in range(8)]
    cp = [[128] * 16 for _ in range(8)]
    blob = encode_jpeg_color(16, 8, yp, cp, cp)
    with pytest.raises(ValueError):
        decode_jpeg_ycbcr(encode_jpeg_gray(16, 8, yp))  # gray -> wrong fn
    with pytest.raises(ValueError):
        decode_jpeg_gray(blob)  # color -> wrong fn
    for bad in (b"", b"\xff\xd8\xff\xd9", blob[:40], blob[:-3]):
        with pytest.raises(ValueError):
            decode_jpeg_ycbcr(bad)
    with pytest.raises(ValueError):
        encode_jpeg_color(16, 8, yp, cp, cp, subsampling="411")


def test_image_ahash_real_decode_and_band_pairs(spark):
    from node_etl_spark.functions import dedup as D
    from node_etl_spark.functions.multimodal import (
        encode_bmp24,
        encode_jpeg_gray,
        encode_png24,
        image_ahash,
    )

    def bmp_img(cells, w=40, h=24):
        # 4x10 grid of (h//?(rows))... build per-pixel from a 6x10 cell fn
        return [
            [(cells(y * 6 // h, x * 10 // w),) * 3 for x in range(w)]
            for y in range(h)
        ]

    base = lambda i, j: (37 * i + 91 * j + 13) % 256  # noqa: E731
    mut = lambda i, j: 255 if (i, j) == (0, 0) else base(i, j)  # noqa: E731
    rows = [
        (1, bytearray(encode_bmp24(
            40, 24, bmp_img(base)))),
        (2, bytearray(encode_bmp24(
            40, 24, bmp_img(mut)))),           # near-dup of 1
        (3, bytearray(encode_png24(
            40, 24, [[p for p in r] for r in bmp_img(base)]))),  # PNG twin
        (4, bytearray(encode_jpeg_gray(
            16, 16, [[2 * ((x // 8) * 30 + (y // 8) * 50) % 256
                      for x in range(16)] for y in range(16)]))),
        (5, bytearray(b"not an image")),       # corrupt: no row
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, content binary")
    sigs = {r.doc_id: r for r in image_ahash(df).collect()}
    assert set(sigs) == {1, 2, 3, 4}
    assert (sigs[1].width, sigs[1].height) == (40, 24)
    # PNG and BMP of the SAME pixels must fingerprint identically
    # (both lossless -> same gray plane)
    assert sigs[3].phash == sigs[1].phash
    # the 1-cell mutation stays hamming-close but not identical
    ham = bin(sigs[1].phash ^ sigs[2].phash).count("1")
    assert 1 <= ham <= 4
    pairs = D.simhash_band_pairs(
        image_ahash(df).select(
            "doc_id", F.col("phash").alias("simhash")
        ),
        max_hamming=4,
    ).collect()
    got = {(p.d1, p.d2) for p in pairs}
    assert (1, 2) in got and (1, 3) in got and (2, 3) in got
    assert not any(4 in p for p in got)


def test_decoders_normalize_short_segments_to_valueerror():
    # r9 review finding: a segment whose LENGTH field is valid but
    # whose payload is shorter than the fields being indexed used to
    # leak IndexError past the documented ValueError contract
    import struct

    import pytest

    from node_etl_spark.functions.multimodal import (
        decode_jpeg_gray,
        decode_jpeg_ycbcr,
    )

    soi = b"\xff\xd8"
    sof0 = b"\xff\xc0" + struct.pack(">H", 2 + 6) + struct.pack(
        ">BHHB", 8, 8, 8, 1
    )  # 6-byte SOF payload: component list truncated
    with pytest.raises(ValueError):
        decode_jpeg_gray(soi + sof0 + b"\xff\xd9")
    good_sof = b"\xff\xc0" + struct.pack(">H", 2 + 9) + struct.pack(
        ">BHHB", 8, 8, 8, 1
    ) + bytes((1, 0x11, 0))
    short_sos = b"\xff\xda" + struct.pack(">H", 2 + 1) + bytes((1,))
    with pytest.raises(ValueError):
        decode_jpeg_gray(soi + good_sof + short_sos + b"\xff\xd9")
    with pytest.raises(ValueError):
        decode_jpeg_ycbcr(soi + good_sof.replace(
            struct.pack(">BHHB", 8, 8, 8, 1),
            struct.pack(">BHHB", 8, 8, 8, 3),
        ) + short_sos + b"\xff\xd9")


def test_video_frame_stats_null_stride_skips_row(spark):
    # r9 review finding: a NULL in the per-row stride column used to
    # crash the whole task via int(NaN) outside the guard
    from node_etl_spark.functions.multimodal import (
        encode_avi_mjpeg,
        encode_jpeg_gray,
        video_frame_stats,
    )

    img = [[100] * 8] * 8
    clip = bytearray(
        encode_avi_mjpeg(8, 8, [encode_jpeg_gray(8, 8, img)] * 3, 10)
    )
    df = spark.createDataFrame(
        [(1, 1, clip), (2, None, clip)],
        "doc_id bigint, k int, content binary",
    )
    rows = video_frame_stats(df, every_k="k").collect()
    assert sorted({r.doc_id for r in rows}) == [1]
    assert len(rows) == 3


def test_avi_multistream_keeps_only_the_video_stream():
    # r9 review finding: frames from OTHER streams (audio, a second
    # video stream) must not interleave into the frame numbering, and
    # a non-video stream's fourcc must not trigger rejection
    import struct

    from node_etl_spark.functions.multimodal import (
        decode_avi_mjpeg,
        encode_avi_mjpeg,
    )

    jpegs = [b"\xff\xd8\x01", b"\xff\xd8\x02"]
    base = bytearray(encode_avi_mjpeg(8, 8, jpegs, 10))

    def chunk(tag, data):
        pad = b"\x00" if len(data) % 2 else b""
        return tag + struct.pack("<I", len(data)) + data + pad

    def lst(kind, data):
        return chunk(b"LIST", kind + data)

    # append an AUDIO strl AFTER the video strl (stream 1) and plant
    # its '01wb'-style data chunk inside movi as '01dc' noise
    strh_aud = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh", b"auds", b"PCM ", 0, 0, 0, 0,
        1, 8000, 0, 100, 0, 0, 1, 0, 0, 0, 0,
    )
    audio_strl = lst(b"strl", chunk(b"strh", strh_aud))
    hdrl_at = bytes(base).find(b"hdrl")
    # splice the audio strl into the hdrl list (grow both LIST sizes)
    hdrl_len_at = hdrl_at - 4
    (hdrl_len,) = struct.unpack_from("<I", base, hdrl_len_at)
    grown = bytearray(bytes(base))
    insert_at = hdrl_at + hdrl_len  # end of hdrl payload
    grown[insert_at:insert_at] = audio_strl
    struct.pack_into("<I", grown, hdrl_len_at, hdrl_len + len(audio_strl))
    struct.pack_into(
        "<I", grown, 4, struct.unpack_from("<I", grown, 4)[0]
        + len(audio_strl)
    )
    # plant a foreign '01dc' chunk at the head of movi
    movi_at = bytes(grown).find(b"movi")
    noise = chunk(b"01dc", b"NOTJPEG")
    (movi_len,) = struct.unpack_from("<I", grown, movi_at - 4)
    grown[movi_at + 4 : movi_at + 4] = noise
    struct.pack_into("<I", grown, movi_at - 4, movi_len + len(noise))
    struct.pack_into(
        "<I", grown, 4, struct.unpack_from("<I", grown, 4)[0] + len(noise)
    )
    w, h, uspf, frames = decode_avi_mjpeg(bytes(grown))
    assert frames == jpegs  # stream-0 frames only, in order


def test_webdataset_shard_composes_with_video_decode(spark):
    # r9 capstone composition: WebDataset tar shard -> member explode
    # -> MJPEG-AVI frame sampling; clips ride shards exactly like
    # images do (q301/q302 gate the shard path, q306 the video path —
    # this pins that they COMPOSE, still partition-local)
    from node_etl_spark.functions.multimodal import (
        encode_avi_mjpeg,
        encode_jpeg_gray,
        encode_tar_shard,
        explode_tar_members,
        video_frame_stats,
    )

    def clip(v, nf, mspf):
        img = [[2 * (v % 128)] * 8] * 8
        return encode_avi_mjpeg(
            8, 8, [encode_jpeg_gray(8, 8, img)] * nf, mspf
        )

    shard = encode_tar_shard(
        [
            ("a.avi", clip(10, 3, 20)),
            ("a.json", b'{"label": "cat"}'),
            ("b.avi", clip(20, 2, 40)),
        ]
    )
    df = spark.createDataFrame(
        [(1, bytearray(shard))], "doc_id bigint, content binary"
    )
    members = explode_tar_members(df).select(
        F.col("member_name").alias("doc_id"),
        F.col("member_bytes").alias("content"),
    )
    stats = video_frame_stats(members, every_k=2).collect()
    by = {}
    for r in stats:
        by.setdefault(r.doc_id, []).append((r.frame_idx, r.frame_ts_ms))
    # JSON sidecar is not an AVI: warn-and-skip, no row
    assert set(by) == {"a.avi", "b.avi"}
    assert sorted(by["a.avi"]) == [(0, 0), (2, 40)]
    assert sorted(by["b.avi"]) == [(0, 0)]
    assert all(r.sum_gray == 64 * 2 * (10 % 128) for r in stats
               if r.doc_id == "a.avi")


def test_snappy_raw_and_framed_codec():
    import pytest

    from node_etl_spark.functions.multimodal import (
        _crc32c,
        _snappy_frame_compress,
        _snappy_frame_decompress,
        _snappy_raw_compress,
        _snappy_raw_decompress,
        compress_bytes,
        decompress_bytes,
        sniff_compression,
    )

    # public CRC-32C check value (Castagnoli; distinct from zlib.crc32)
    assert _crc32c(b"123456789") == 0xE3069283
    assert _crc32c(b"") == 0

    data = ("snappy round trip " * 500).encode() + bytes(range(256))
    for payload in (b"", b"x", data, bytes(70000)):  # multi-chunk framed
        framed = compress_bytes(payload, "snappy")
        assert sniff_compression(framed) == "snappy"
        assert decompress_bytes(framed, "auto") == payload
        assert _snappy_frame_compress(payload) == framed  # deterministic
        raw = _snappy_raw_compress(payload)
        assert decompress_bytes(raw, "snappy") == payload  # raw, no magic
        assert sniff_compression(raw) in (None, "zlib") or payload == b""

    # copy tags from the public format description: 1-byte-offset
    # (len 4-11), 2-byte-offset, and self-overlapping copies
    raw = bytes([12, 3 << 2]) + b"abcd" + bytes([1 | (4 << 2), 4])
    assert _snappy_raw_decompress(raw) == b"abcdabcdabcd"
    raw = bytes([8, 1 << 2]) + b"xy" + bytes([2 | (5 << 2)]) + (2).to_bytes(
        2, "little"
    )
    assert _snappy_raw_decompress(raw) == b"xyxyxyxy"
    raw = bytes([5, 0 << 2]) + b"a" + bytes([1 | (0 << 2), 1])  # RLE via
    assert _snappy_raw_decompress(raw) == b"aaaaa"  # overlap, off=1 len=4
    # skippable + padding chunks in the framed container are ignored
    framed = bytearray(compress_bytes(b"hello", "snappy"))
    framed += bytes((0xFE, 3, 0, 0)) + b"pad"
    framed += bytes((0x80, 1, 0, 0)) + b"s"
    assert _snappy_frame_decompress(bytes(framed)) == b"hello"

    for bad in (
        b"\xff\x06\x00\x00sNaPpX",           # wrong magic
        compress_bytes(b"hello", "snappy")[:-1],  # truncated chunk
        bytes([200]),                        # truncated varint
        bytes([4, 1 | (0 << 2), 9]),         # copy offset beyond output
    ):
        with pytest.raises(ValueError):
            decompress_bytes(bad, "snappy")
    # checksum mismatch: flip a payload byte
    blob = bytearray(compress_bytes(b"checksum me", "snappy"))
    blob[-1] ^= 0xFF
    with pytest.raises(ValueError):
        decompress_bytes(bytes(blob), "auto")


def test_snappy_text_columns_roundtrip(spark):
    from node_etl_spark.functions.multimodal import (
        compress_text,
        decompress_text,
    )

    df = spark.createDataFrame(
        [(1, "héllo snappy"), (2, None), (3, "x" * 100000)],
        "doc_id bigint, text string",
    )
    out = df.select(
        "doc_id",
        decompress_text(compress_text("text", "snappy"), "auto").alias("t2"),
    )
    got = {r.doc_id: r.t2 for r in out.collect()}
    assert got[1] == "héllo snappy" and got[2] is None
    assert got[3] == "x" * 100000  # multi-chunk framed value


def test_snappy_framed_prefers_uncompressed_chunks():
    # ADVICE r9: the framing spec recommends uncompressed (0x01)
    # chunks when compression does not shrink — with the all-literal
    # raw encoder that is every chunk, and the blob gets smaller
    from node_etl_spark.functions.multimodal import (
        _SNAPPY_MAGIC,
        _crc32c,
        _snappy_frame_decompress,
        _snappy_mask_crc,
        _snappy_raw_compress,
        compress_bytes,
        decompress_bytes,
    )

    payload = b"not very compressible \x00\x01\x02" * 40
    framed = compress_bytes(payload, "snappy")
    assert framed[len(_SNAPPY_MAGIC)] == 0x01  # uncompressed chunk type
    # 0x01 body = crc + raw bytes: total = magic + 4 hdr + 4 crc + len
    assert len(framed) == len(_SNAPPY_MAGIC) + 8 + len(payload)
    assert decompress_bytes(framed, "auto") == payload
    # legacy 0x00 (compressed) chunks from earlier rounds still decode
    comp = _snappy_raw_compress(payload)
    crc = _snappy_mask_crc(_crc32c(payload)).to_bytes(4, "little")
    body = crc + comp
    legacy = (
        _SNAPPY_MAGIC
        + bytes((0x00,))
        + len(body).to_bytes(3, "little")
        + body
    )
    assert _snappy_frame_decompress(legacy) == payload
    # CRC covers the UNCOMPRESSED bytes: flipping a raw data byte in
    # an 0x01 chunk still fails the checksum deterministically
    import pytest

    bad = bytearray(framed)
    bad[-1] ^= 0xFF
    with pytest.raises(ValueError):
        decompress_bytes(bytes(bad), "auto")


def test_zlib_sniff_false_positive_reports_unknown_container():
    # ADVICE r9: the RFC1950 sniff is a 1/31 heuristic — arbitrary
    # binary passing it must surface as 'unknown compression
    # container' under auto, not 'corrupt zlib'; explicit codec='zlib'
    # keeps the precise corrupt-payload error
    import pytest

    from node_etl_spark.functions.multimodal import (
        decompress_bytes,
        sniff_compression,
    )

    fake = b"\x78\x9cdefinitely not a deflate stream"
    assert sniff_compression(fake) == "zlib"  # header passes the sniff
    with pytest.raises(ValueError, match="unknown compression container"):
        decompress_bytes(fake, "auto")
    with pytest.raises(ValueError, match="corrupt zlib payload"):
        decompress_bytes(fake, "zlib")


def test_corrupt_wrapper_propagates_foreign_indexerrors():
    # ADVICE r9: only byte-parsing IndexErrors raised inside
    # multimodal.py are 'truncated input'; an IndexError whose deepest
    # frame is in OTHER code (a helper bug) must propagate so
    # warn-and-skip callers do not swallow it
    import struct

    import pytest

    from node_etl_spark.functions.multimodal import _corrupt_as_valueerror

    @_corrupt_as_valueerror
    def foreign_bug():
        return [][5]  # deepest frame: THIS test file

    with pytest.raises(IndexError):
        foreign_bug()

    @_corrupt_as_valueerror
    def truncated_parse():
        struct.unpack_from("<I", b"\x01", 0)

    with pytest.raises(ValueError, match="truncated input"):
        truncated_parse()


def test_xxh64_matches_jvm_xxhash64(spark):
    # two independent XXH64 implementations (pure-stdlib Python vs
    # Spark's JVM expression, which hashes binary values with seed 42)
    # must agree on random inputs — the pure one also computes the
    # zstd frame checksum (seed 0, low 32 bits)
    import random

    from pyspark.sql import functions as F

    from node_etl_spark.functions.multimodal import _xxh64

    rng = random.Random(11)
    blobs = [
        b"",
        b"a",
        b"xxh64 test vector",
        bytes(rng.randrange(256) for _ in range(31)),
        bytes(rng.randrange(256) for _ in range(32)),
        bytes(rng.randrange(256) for _ in range(33)),
        bytes(rng.randrange(256) for _ in range(1000)),
    ]
    df = spark.createDataFrame(
        [(i, bytearray(b)) for i, b in enumerate(blobs)], "i int, b binary"
    )
    jvm = {
        r.i: r.h
        for r in df.select("i", F.xxhash64("b").alias("h")).collect()
    }
    for i, b in enumerate(blobs):
        mine = _xxh64(b, seed=42)
        if mine >= 1 << 63:
            mine -= 1 << 64  # JVM longs are signed
        assert mine == jvm[i], f"xxh64 mismatch on blob {i}"


def test_zstd_pure_decoder_matches_libzstd():
    # the pure-stdlib RFC 8878 decoder must reproduce libzstd's output
    # bit-for-bit across levels (predefined/RLE/FSE-described tables,
    # raw/RLE/Huffman literals incl. 4-stream, multi-block frames,
    # repeat offsets, content checksums)
    import random

    import pytest

    from node_etl_spark.functions import multimodal as M

    if M._libzstd() is None:
        pytest.skip("libzstd not present on this system")
    rng = random.Random(7)
    cases = [
        b"",
        b"a",
        b"hello zstd " * 3,
        bytes(rng.randrange(256) for _ in range(5000)),  # incompressible
        b"the quick brown fox jumps over the lazy dog. " * 500,
        bytes(rng.randrange(4) for _ in range(200000)),  # multi-block
        b"\x00" * 300000,  # RLE-heavy
    ]
    for _ in range(25):  # structured randoms stress many table cells
        unit = bytes(rng.randrange(256) for _ in range(rng.randrange(1, 50)))
        cases.append(
            b"".join(
                unit[: rng.randrange(1, len(unit) + 1)] for _ in range(150)
            )
        )
    for lvl in (1, 3, 9, 19):
        for i, payload in enumerate(cases):
            blob = M._zstd_lib_compress(payload, lvl)
            assert M.sniff_compression(blob) == "zstd"
            assert M._zstd_py_decompress(blob) == payload, (lvl, i)
            assert M._zstd_lib_decompress(blob) == payload


def test_zstd_stored_frames_and_corruption_policy():
    import pytest

    from node_etl_spark.functions import multimodal as M

    payloads = [b"", b"x", b"stored frame " * 10, bytes(range(256)) * 600]
    for p in payloads:
        stored = M._zstd_stored_compress(p)
        assert M.sniff_compression(stored) == "zstd"
        # the pure decoder reads it...
        assert M._zstd_py_decompress(stored) == p
        # ...and so does the REAL library (interop proof)
        if M._libzstd() is not None:
            assert M._zstd_lib_decompress(stored) == p
        assert M.decompress_bytes(M.compress_bytes(p, "zstd"), "auto") == p

    # skippable frame prefix is legal and contributes nothing — on
    # BOTH engines (ADVICE r10: the lib path used to size its buffer
    # from the first frame and reject these as corrupt), and so are
    # concatenated frames
    skip = (0x184D2A50).to_bytes(4, "little") + (3).to_bytes(4, "little")
    framed = skip + b"pad" + M._zstd_stored_compress(b"after skip")
    assert M._zstd_py_decompress(framed) == b"after skip"
    multi = (
        framed
        + M._zstd_stored_compress(b" and more")
        + skip
        + b"end"
    )
    assert M._zstd_py_decompress(multi) == b"after skip and more"
    if M._libzstd() is not None:
        assert M._zstd_lib_decompress(framed) == b"after skip"
        assert M._zstd_lib_decompress(multi) == b"after skip and more"
        real = M._zstd_lib_compress(b"lib frame " * 40, 3)
        assert (
            M._zstd_lib_decompress(skip + b"xyz" + real + real)
            == b"lib frame " * 80
        )
        # identical bytes, identical verdicts: the sniffed 'zstd'
        # dispatch stays engine-independent
        assert M.decompress_bytes(multi, "auto") == b"after skip and more"

    good = M._zstd_stored_compress(b"checksum me, zstd")
    for mutate in (
        lambda b: b[:-1] + bytes([b[-1] ^ 0xFF]),  # checksum flip
        lambda b: b[:10],  # truncated
        lambda b: b"\x00" + b[1:],  # broken magic
    ):
        bad = mutate(bytearray(good))
        with pytest.raises(ValueError):
            M._zstd_py_decompress(bytes(bad))
    # reserved block type (3) rejects
    hdr = M._zstd_stored_compress(b"q")[:6]  # magic+fhd+fcs
    bad_block = hdr + ((1 << 3) | (3 << 1) | 1).to_bytes(3, "little") + b"q"
    with pytest.raises(ValueError):
        M._zstd_py_decompress(bad_block)
    # dictionary frames are rejected, not mis-decoded
    dict_frame = bytes(M._ZSTD_MAGIC) + bytes([0x21, 0x07]) + b"\x00" * 8
    with pytest.raises(ValueError):
        M._zstd_py_decompress(dict_frame)


def test_zstd_text_columns_roundtrip(spark):
    from node_etl_spark.functions.multimodal import (
        compress_text,
        decompress_text,
    )

    df = spark.createDataFrame(
        [(1, "héllo zstd"), (2, None), (3, "z" * 100000)],
        "doc_id bigint, text string",
    )
    out = df.select(
        "doc_id",
        decompress_text(compress_text("text", "zstd"), "auto").alias("t2"),
    )
    got = {r.doc_id: r.t2 for r in out.collect()}
    assert got[1] == "héllo zstd" and got[2] is None
    assert got[3] == "z" * 100000


def test_zstd_pure_decoder_mutation_fuzz():
    # corrupt-input policy under adversarial mutation: every 1-byte
    # mutation of a valid frame either still decodes (mutations in
    # unchecked padding) or raises ValueError — never another
    # exception type, never a hang (output is capped). This is the
    # contract decompress_text's warn-and-skip NULL policy rests on.
    import random

    from node_etl_spark.functions import multimodal as M

    rng = random.Random(3)
    base_payloads = [
        b"the quick brown fox jumps over the lazy dog. " * 40,
        bytes(rng.randrange(256) for _ in range(400)),
    ]
    frames = [M._zstd_stored_compress(base_payloads[0])]
    if M._libzstd() is not None:
        frames += [M._zstd_lib_compress(p, 3) for p in base_payloads]
    checked = 0
    for frame in frames:
        for _ in range(300):
            bad = bytearray(frame)
            i = rng.randrange(len(bad))
            bad[i] ^= 1 << rng.randrange(8)
            try:
                M._zstd_py_decompress(bytes(bad))
            except ValueError:
                checked += 1
            # any other exception type fails the test by propagating
        # truncations at every prefix length (sampled)
        for cut in range(1, len(frame), max(1, len(frame) // 50)):
            try:
                M._zstd_py_decompress(frame[:cut])
            except ValueError:
                checked += 1
    assert checked > 100  # most mutations must be caught, not decoded


def test_bmp_gray_np_matches_scalar_decoder():
    # the image_ahash hot path must produce the EXACT gray integers of
    # decode_bmp24 ((r+g+b)//3) on random images, odd widths (row
    # padding), top-down layouts, and reject the same variants
    import random
    import struct

    import numpy as np
    import pytest

    from node_etl_spark.functions.multimodal import (
        _bmp_gray_np,
        decode_bmp24,
        encode_bmp24,
    )

    rng = random.Random(5)
    for w, h in [(1, 1), (3, 2), (5, 7), (80, 48), (17, 4)]:
        px = [
            [tuple(rng.randrange(256) for _ in range(3)) for _ in range(w)]
            for _ in range(h)
        ]
        blob = encode_bmp24(w, h, px)
        gw, gh, gray = _bmp_gray_np(blob)
        dw, dh, rows = decode_bmp24(blob)
        ref = np.asarray(rows, dtype=np.int64).sum(axis=2) // 3
        assert (gw, gh) == (dw, dh) == (w, h)
        assert np.array_equal(gray, ref), (w, h)
        # top-down variant: negate the height field; both decoders
        # must agree on the flipped orientation
        td = bytearray(blob)
        struct.pack_into("<i", td, 22, -h)
        _, _, gray_td = _bmp_gray_np(bytes(td))
        _, _, rows_td = decode_bmp24(bytes(td))
        ref_td = np.asarray(rows_td, dtype=np.int64).sum(axis=2) // 3
        assert np.array_equal(gray_td, ref_td)
    for bad in (b"", b"BM" + b"\x00" * 20, encode_bmp24(2, 2, [[(0,) * 3] * 2] * 2)[:30]):
        with pytest.raises(ValueError):
            _bmp_gray_np(bad)


def test_png_variant_roundtrips_and_adam7():
    # r10 general PNG codec: every legal depth/color-type combination
    # (gray 1/2/4/8, palette 1/2/4/8, truecolor, gray+alpha, RGBA)
    # round-trips in BOTH interlace modes at odd dims (sub-byte row
    # padding + empty Adam7 passes); grays scale exactly (255, 85,
    # 17 are integers); alpha drops; the strict truecolor decoder and
    # the general one agree
    import random
    import struct
    import zlib

    import pytest

    from node_etl_spark.functions import multimodal as M

    rng = random.Random(9)
    W, H = 13, 7
    pal = [((i * 37 + 11) % 256, (i * 53) % 256, (i * 91) % 256)
           for i in range(16)]
    scale = {1: 255, 2: 85, 4: 17, 8: 1}
    for interlace in (0, 1):
        for ct, depths in ((0, (1, 2, 4, 8)), (2, (8,)), (3, (1, 2, 4, 8)),
                           (4, (8,)), (6, (8,))):
            for d in depths:
                p = pal[: min(1 << d, 16)]
                if ct == 0:
                    px = [[rng.randrange(1 << d) for _ in range(W)]
                          for _ in range(H)]
                    want = [[(v * scale[d],) * 3 for v in r] for r in px]
                elif ct == 2:
                    px = [[tuple(rng.randrange(256) for _ in range(3))
                           for _ in range(W)] for _ in range(H)]
                    want = px
                elif ct == 3:
                    px = [[rng.randrange(len(p)) for _ in range(W)]
                          for _ in range(H)]
                    want = [[p[v] for v in r] for r in px]
                elif ct == 4:
                    px = [[(rng.randrange(256), rng.randrange(256))
                           for _ in range(W)] for _ in range(H)]
                    want = [[(v[0],) * 3 for v in r] for r in px]
                else:
                    px = [[tuple(rng.randrange(256) for _ in range(4))
                           for _ in range(W)] for _ in range(H)]
                    want = [[v[:3] for v in r] for r in px]
                blob = M.encode_png(
                    W, H, px, color_type=ct, bit_depth=d, palette=p,
                    interlace=interlace,
                )
                assert M.decode_png(blob) == (W, H, want), (ct, d, interlace)

    rgb = [[(x, y, x + y) for x in range(5)] for y in range(4)]
    blob = M.encode_png24(5, 4, rgb)
    assert M.decode_png(blob) == M.decode_png24(blob)

    # 16-bit grayscale: high-byte reduction
    samples = [[(y * 3 + x) * 1000 % 65536 for x in range(3)]
               for y in range(2)]
    raw = bytearray()
    for row in samples:
        raw.append(0)
        raw += b"".join(struct.pack(">H", v) for v in row)

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    blob16 = (M._PNG_SIG
              + chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 2, 16, 0, 0, 0, 0))
              + chunk(b"IDAT", zlib.compress(bytes(raw)))
              + chunk(b"IEND", b""))
    _, _, rows16 = M.decode_png(blob16)
    assert rows16 == [[(struct.pack(">H", v)[0],) * 3 for v in row]
                      for row in samples]

    # corrupt variants reject: palette overrun, illegal combo, junk
    bad_pal = M.encode_png(2, 2, [[3] * 2] * 2, color_type=3, bit_depth=2,
                           palette=pal[:2])
    for bad in (
        bad_pal,                       # index 3 with a 2-entry PLTE
        blob16[:40],                   # truncated
        blob16.replace(b"\x10\x00\x00", b"\x10\x03\x00", 1),  # 16/3 illegal
    ):
        with pytest.raises(ValueError):
            M.decode_png(bad)


def test_png_decoder_mutation_fuzz():
    # ValueError-only corrupt-input contract for the general PNG
    # decoder (the same battery the zstd pure decoder passes): every
    # 1-byte mutation / truncation either decodes or raises ValueError
    import random

    from node_etl_spark.functions import multimodal as M

    rng = random.Random(4)
    pal = [((i * 37 + 11) % 256, (i * 53) % 256, (i * 91) % 256)
           for i in range(16)]
    frames = [
        M.encode_png(9, 5, [[rng.randrange(16) for _ in range(9)]
                            for _ in range(5)],
                     color_type=3, bit_depth=4, palette=pal, interlace=1),
        M.encode_png(7, 6, [[tuple(rng.randrange(256) for _ in range(3))
                             for _ in range(7)] for _ in range(6)],
                     color_type=2, interlace=0),
    ]
    caught = 0
    for frame in frames:
        for _ in range(400):
            bad = bytearray(frame)
            bad[rng.randrange(len(bad))] ^= 1 << rng.randrange(8)
            try:
                M.decode_png(bytes(bad))
            except ValueError:
                caught += 1
        for cut in range(1, len(frame), max(1, len(frame) // 40)):
            try:
                M.decode_png(frame[:cut])
            except ValueError:
                caught += 1
    assert caught > 400  # CRCs catch nearly every mutation


def test_zstd_dictionary_train_compress_roundtrip():
    import pytest

    from node_etl_spark.functions import multimodal as M

    if M._libzstd_dict() is None:
        pytest.skip("libzstd (dict API) not present on this system")

    recs = [
        (
            f"orderkey={i}|custkey={i * 7 % 997}|status={'PFO'[i % 3]}"
            f"|priority=3-MEDIUM|date=1997-0{1 + i % 9}-1{i % 10}"
        ).encode()
        for i in range(2000)
    ]
    d = M.zstd_train_dict(recs[::4], 4096)
    assert 0 < len(d) <= 4096

    with_dict = [M.zstd_compress_dict(r, d) for r in recs]
    plain = [M.compress_bytes(r, "zstd") for r in recs]
    # bit-exact round trip through the dictionary decoder
    assert all(
        M.zstd_decompress_dict(c, d) == r for c, r in zip(with_dict, recs)
    )
    # THE size claim: on small structured records the dict store beats
    # both plain per-record zstd frames AND the raw bytes (plain
    # frames typically EXPAND records this small)
    assert sum(map(len, with_dict)) < sum(map(len, plain))
    assert sum(map(len, with_dict)) < sum(map(len, recs))

    # dict frames carry the dictID: decoding WITHOUT the dict (or with
    # a wrong one) raises, never returns garbage
    with pytest.raises(ValueError):
        M.zstd_decompress_dict(with_dict[0], b"")
    with pytest.raises(ValueError):
        M.zstd_decompress_dict(with_dict[0], b"not the dictionary" * 9)

    # advanced-API writer embeds the XXH64 checksum: every last-byte
    # flip is DETECTED (the legacy usingDict writer emits no checksum
    # and silently decodes some flips to garbage — q325's first
    # gate run caught exactly that)
    for c in with_dict[:50]:
        b = bytearray(c)
        b[-1] ^= 0xFF
        with pytest.raises(ValueError):
            M.zstd_decompress_dict(bytes(b), d)


def test_zstd_dictionary_fallbacks():
    from node_etl_spark.functions import multimodal as M

    # empty dict degrades to plain frames with identical semantics
    payload = b"fallback payload " * 4
    blob = M.zstd_compress_dict(payload, b"")
    assert M.zstd_decompress_dict(blob, b"") == payload
    assert M.decompress_bytes(blob, "auto") == payload

    # the trainer refuses tiny sample sets -> empty-dict sentinel,
    # never an exception (the pipeline degrades, it doesn't fail)
    assert M.zstd_train_dict([b"a", b"b"], 4096) == b""
    assert M.zstd_train_dict([], 4096) == b""
