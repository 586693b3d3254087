"""Multimodal lane tests: Arrow plumbing, decode-stub policy, byte
exactness the SQL oracle can't see (frame bytes, checksums)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from imdbmapreduce_spark import registry
from imdbmapreduce_spark.catalog import table
from imdbmapreduce_spark.operators.multimodal import (
    _FRAME_BYTES,
    _FRAME_STEP,
    _HAS_PIL,
    _RESIZE_BOX,
    _src_dims,
    decode_image,
    fake_decode,
    frame_lane,
    resize_lane,
    with_payload,
)


def test_payload_shape(spark, sf_dir):
    mm = with_payload(table(spark, sf_dir, "documents"))
    row = mm.first()
    assert set(mm.columns) == {"doc_id", "media_type", "payload", "meta"}
    assert isinstance(row.payload, (bytes, bytearray))
    assert row.meta.n_bytes == len(row.payload)
    assert row.meta.format == row.media_type


def test_decode_image_is_stubbed():
    if _HAS_PIL:
        pytest.skip("PIL present; stub not in effect")
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG...")


def test_features_match_python_reference(spark, sf_dir):
    """mapInPandas lane output == driver-side fake_decode on raw bytes."""
    out = {r.doc_id: r for r in registry.get("multimodal_features").fn(spark, sf_dir).collect()}
    docs = table(spark, sf_dir, "documents").select("doc_id", "text").limit(20).collect()
    assert len(out) >= len(docs)
    for d in docs:
        ref = fake_decode(d.text.encode("utf-8"))
        got = out[d.doc_id]
        assert (got.n_bytes, got.checksum, got.width, got.height) == (
            ref["n_bytes"],
            ref["checksum"],
            ref["width"],
            ref["height"],
        ), d.doc_id


def test_resize_lane_geometry_and_bytes(spark, sf_dir):
    """Resized output: aspect-preserving integer geometry, length contract,
    deterministic tiled bytes (the parts the SQL oracle can't see)."""
    mm = with_payload(table(spark, sf_dir, "documents")).filter(
        F.col("media_type") == "image"
    )
    originals = {r.doc_id: bytes(r.payload) for r in mm.limit(5).collect()}
    rows = resize_lane(mm).filter(F.col("doc_id").isin(*originals)).collect()
    assert rows
    for r in rows:
        data = originals[r.doc_id]
        src_w, src_h = _src_dims(len(data))
        assert (r.src_w, r.src_h) == (src_w, src_h)
        m = max(src_w, src_h)
        assert r.out_w == max(1, src_w * _RESIZE_BOX // m)
        assert r.out_h == max(1, src_h * _RESIZE_BOX // m)
        assert max(r.out_w, r.out_h) == _RESIZE_BOX  # fits the box exactly
        resized = bytes(r.resized)
        assert r.out_bytes == r.out_w * r.out_h == len(resized)
        reps = -(-len(resized) // len(data))
        assert resized == (data * reps)[: len(resized)]  # deterministic tiling


def test_audio_chunk_sums_match_numpy(spark, sf_dir):
    """Audio windows: integer sample sums equal a direct numpy reference
    on the raw bytes (the part the geometry oracle can't see)."""
    import numpy as np
    from imdbmapreduce_spark.operators.multimodal import _AUDIO_WINDOW, audio_lane

    mm = with_payload(table(spark, sf_dir, "documents")).filter(
        F.col("media_type") == "audio"
    )
    originals = {r.doc_id: bytes(r.payload) for r in mm.limit(4).collect()}
    rows = audio_lane(mm).filter(F.col("doc_id").isin(*originals)).collect()
    assert rows
    for r in rows:
        data = originals[r.doc_id]
        samples = np.frombuffer(data[: len(data) - len(data) % 2], dtype="<i2").astype(
            np.int64
        )
        w = samples[r.chunk_idx * _AUDIO_WINDOW : (r.chunk_idx + 1) * _AUDIO_WINDOW]
        assert r.n_samples == len(w)
        assert r.sum_abs == int(np.abs(w).sum())
        assert r.sum_sq == int((w * w).sum())


def test_frame_bytes_reassemble(spark, sf_dir):
    """Sampled frames must be exact slices: stride geometry + content."""
    mm = with_payload(table(spark, sf_dir, "documents")).filter(
        F.col("media_type") == "video"
    )
    originals = {r.doc_id: bytes(r.payload) for r in mm.limit(5).collect()}
    frames = frame_lane(mm).filter(F.col("doc_id").isin(*originals)).collect()
    assert frames
    for fr in frames:
        data = originals[fr.doc_id]
        lo = fr.frame_idx * _FRAME_BYTES
        assert fr.frame_idx % _FRAME_STEP == 0
        assert bytes(fr.frame_bytes) == data[lo : lo + _FRAME_BYTES]
        assert fr.frame_len == len(fr.frame_bytes)


def test_real_codec_lane_decodes_ppm_in_ci(spark, sf_dir):
    """The real-codec lane EXECUTES without any codec library: binary
    PPM decodes in pure Python. Checks (a) the parser against hand-built
    PPMs (incl. a header comment and a corrupt raster that must raise),
    and (b) the registered query end-to-end — decoded geometry is the
    truth derived from the actual bytes (r4 verdict item 5: the
    perpetual PIL skip no longer gates the real-decode path)."""
    from imdbmapreduce_spark.operators.multimodal import (
        decode_ppm_features,
        image_features_real,
    )

    def ppm(w, h, fill=7, comment=False):
        head = b"P6\n" + (b"# c\n" if comment else b"") + f"{w} {h}\n255\n".encode()
        return head + bytes([fill]) * (w * h * 3)

    got = decode_ppm_features(ppm(5, 3, comment=True))
    assert (got["width"], got["height"]) == (5, 3)
    with pytest.raises(ValueError, match="raster"):
        decode_ppm_features(ppm(5, 3)[:-1])
    with pytest.raises(ValueError, match="P6"):
        decode_ppm_features(b"P5\n1 1\n255\n\x00")

    rows = [(i, "image", bytearray(ppm(4 + i, 2 + i, fill=i))) for i in range(3)]
    mm = spark.createDataFrame(rows, "doc_id long, media_type string, payload binary")
    out = {r.doc_id: r for r in image_features_real(mm).collect()}
    for i in range(3):
        assert (out[i].width, out[i].height) == (4 + i, 2 + i)
        assert out[i].n_bytes == len(bytes(rows[i][2]))
        assert out[i].checksum == sum(bytes(rows[i][2])) % (1 << 31)

    # registered query: every synthesized payload decodes to the
    # doc_id-derived geometry (the oracle re-proves this externally)
    reg = registry.get("image_features_real").fn(spark, sf_dir).collect()
    assert reg and all(
        r.width == r.doc_id % 8 + 8 and r.height == r.doc_id % 4 + 4 for r in reg
    )


@pytest.mark.skipif(not _HAS_PIL, reason="PNG/JPEG decode needs PIL; PPM lane covers CI")
def test_real_codec_lane_decodes_true_geometry(spark):
    """When the environment gains PIL, the real decode lane auto-upgrades:
    build genuine PNGs, push them through the same mapInPandas plumbing as
    multimodal_features, and check the decoded geometry is the truth, not
    the fake-decode heuristic."""
    import io

    from PIL import Image

    from imdbmapreduce_spark.operators.multimodal import image_features_real

    sizes = [(32, 8), (17, 23), (64, 1)]
    rows = []
    for i, (w, h) in enumerate(sizes):
        buf = io.BytesIO()
        Image.new("RGB", (w, h), color=(i, i, i)).save(buf, format="PNG")
        rows.append((i, "image", bytearray(buf.getvalue())))
    mm = spark.createDataFrame(rows, "doc_id long, media_type string, payload binary")
    out = {r.doc_id: r for r in image_features_real(mm).collect()}
    for i, (w, h) in enumerate(sizes):
        assert (out[i].width, out[i].height) == (w, h)
        assert out[i].n_bytes == len(bytes(rows[i][2]))


def test_ahash_lane_matches_python_replay_and_finds_planted_dupes(spark):
    """The perceptual-hash composition: (a) the Arrow lane's fingerprints
    equal the pure-Python ahash64 spec bit-for-bit; (b) byte-identical
    payloads collide at Hamming 0 and surface as a pair through the
    shared banded join; (c) a perturbed payload pairs up iff its true
    Hamming distance is within the band guarantee."""
    import numpy as np

    from imdbmapreduce_spark.operators.dedup import hamming_pairs
    from imdbmapreduce_spark.operators.multimodal import ahash64, phash_lane

    base = ("the quick brown fox jumps over the lazy dog " * 20).encode()
    near = bytearray(base)
    near[7] ^= 0x01  # one-bit payload perturbation
    far = bytes(np.random.default_rng(7).integers(0, 256, len(base), dtype=np.uint8))
    rows = [(0, base), (1, bytes(base)), (2, bytes(near)), (3, far)]
    mm = spark.createDataFrame(rows, "doc_id long, payload binary")

    got = {r.doc_id: r.fp for r in phash_lane(mm).collect()}
    assert got == {i: ahash64(bytes(p)) for i, p in rows}
    assert got[0] == got[1]  # identical bytes → identical fingerprint

    pairs = {
        (r.doc_a, r.doc_b): r.hamming
        for r in hamming_pairs(phash_lane(mm)).collect()
    }
    assert pairs.get((0, 1)) == 0
    true_h = bin(got[0] ^ got[2]).count("1")
    if true_h <= 3:
        assert pairs.get((0, 2)) == true_h and pairs.get((1, 2)) == true_h
    else:
        assert (0, 2) not in pairs
    # the unrelated payload must not pair with the base family at <=3 bits
    assert all(3 not in p for p in pairs)


def test_image_phash_dupes_registered_runs(spark, sf_dir):
    from imdbmapreduce_spark import registry

    df = registry.get("image_phash_dupes").fn(spark, sf_dir)
    assert df.columns == ["doc_a", "doc_b", "hamming"]
    rows = df.collect()
    for r in rows:
        assert r.doc_a < r.doc_b and 0 <= r.hamming <= 3


def test_bmp_decoder_roundtrip_and_rejects():
    """decode_bmp_features parses a hand-built uncompressed 24-bit BMP
    (independent struct.pack construction — not the Spark synthesis
    expression) and rejects corrupt containers loudly."""
    import struct

    from imdbmapreduce_spark.operators.multimodal import decode_bmp_features

    def make(w, h, raster, bpp=24, compression=0, offset=54):
        rl = len(raster)
        return (
            b"BM"
            + struct.pack("<III", offset + rl, 0, offset)
            + struct.pack("<Iii", 40, w, h)
            + struct.pack("<HH", 1, bpp)
            + struct.pack("<IIIIII", compression, rl, 0, 0, 0, 0)
            + raster
        )

    w, h = 12, 5
    raster = (b"0123456789abcdef" * 100)[: w * h * 3]
    p = make(w, h, raster)
    assert decode_bmp_features(p) == {
        "n_bytes": len(p),
        "checksum": sum(p) % (1 << 31),
        "width": w,
        "height": h,
    }
    # top-down row order (negative height) decodes to the same geometry
    assert decode_bmp_features(make(w, -h, raster))["height"] == h
    # padded stride: width 5 -> 15-byte rows pad to 16
    raster5 = (b"x" * (16 * 3))[: 16 * 3]
    assert decode_bmp_features(make(5, 3, raster5))["width"] == 5
    import pytest as _pytest

    for bad in [
        b"XX" + p[2:],  # magic
        p[:-1],  # file-size cross-check
        make(w, h, raster[:-3]),  # raster length vs stride*h
        make(w, h, raster, bpp=8),  # unsupported depth
        make(w, h, raster, compression=1),  # RLE unsupported
        p[:40],  # truncated headers
    ]:
        with _pytest.raises(ValueError):
            decode_bmp_features(bad)


def test_audio_spectral_features_matches_float_dft(spark, sf_dir):
    """The Q7 fixed-point DFT must (a) replay exactly in pure Python
    int math and (b) track the true float DFT within the coefficient
    quantization bound: |re_q/128 - Re(X_k)| <= sum|s| * (0.5/128)."""
    import numpy as np

    from imdbmapreduce_spark import registry
    from imdbmapreduce_spark.catalog import table
    from imdbmapreduce_spark.operators.multimodal import (
        _SPEC_BINS,
        _SPEC_SCALE,
        _SPEC_WIN,
        _spec_tables,
    )

    docs = {
        r.doc_id: r.text.encode("utf-8")
        for r in table(spark, sf_dir, "documents").collect()
        if r.doc_id % 3 == 1
    }
    cos_l, sin_l = _spec_tables()
    cos_t, sin_t = np.array(cos_l, dtype=np.int64), np.array(sin_l, dtype=np.int64)

    want = {}
    for doc_id, data in docs.items():
        s = np.frombuffer(data[: len(data) - (len(data) % 2)], dtype="<i2").astype(
            np.int64
        )
        for ci in range(0, -(-len(s) // _SPEC_WIN)):
            w = s[ci * _SPEC_WIN : (ci + 1) * _SPEC_WIN]
            n = np.arange(len(w), dtype=np.int64)
            for k in _SPEC_BINS:
                idx = (k * n) % _SPEC_WIN
                want[(doc_id, ci, k)] = (
                    int((w * cos_t[idx]).sum()),
                    int((w * sin_t[idx]).sum()),
                )

    rows = registry.get("audio_spectral_features").fn(spark, sf_dir).collect()
    got = {(r.doc_id, r.chunk_idx, r.bin): (r.re_q, r.im_q) for r in rows}
    assert got == want

    # float-DFT parity within the quantization bound
    checked = 0
    for (doc_id, ci, k), (re_q, im_q) in list(want.items())[:64]:
        data = docs[doc_id]
        s = np.frombuffer(data[: len(data) - (len(data) % 2)], dtype="<i2").astype(
            np.float64
        )
        w = s[ci * _SPEC_WIN : (ci + 1) * _SPEC_WIN]
        n = np.arange(len(w))
        true_re = float((w * np.cos(2 * np.pi * k * n / _SPEC_WIN)).sum())
        true_im = float((w * np.sin(2 * np.pi * k * n / _SPEC_WIN)).sum())
        bound = np.abs(w).sum() * (0.5 / _SPEC_SCALE) + 1e-9
        assert abs(re_q / _SPEC_SCALE - true_re) <= bound
        assert abs(im_q / _SPEC_SCALE - true_im) <= bound
        checked += 1
    assert checked > 0


def test_jpeg_codec_lossless_on_constant_block_class():
    """The oracle-checkability theorem, asserted directly: constant 8x8
    blocks with the flat q=8 table round-trip BIT-EXACTLY through the
    full baseline pipeline (DCT, quantize, Huffman encode, byte-stuffed
    bitstream, Huffman decode, dequant, IDCT)."""
    import numpy as np

    from imdbmapreduce_spark.operators.jpeg import (
        decode_baseline,
        encode_baseline_gray,
    )

    rng = np.random.default_rng(11)
    for h, w in [(8, 8), (16, 24), (8, 16), (16, 16)]:
        blocks = rng.integers(0, 256, (h // 8, w // 8))
        img = np.kron(blocks, np.ones((8, 8), dtype=np.int64)).astype(np.uint8)
        payload = encode_baseline_gray(img)
        assert payload[:2] == b"\xff\xd8" and payload[-2:] == b"\xff\xd9"
        d = decode_baseline(payload)
        assert (d["width"], d["height"], d["n_components"]) == (w, h, 1)
        assert np.array_equal(d["pixels"], img)


def test_jpeg_codec_lossy_path_matches_numpy_dct_reference():
    """Non-constant images exercise AC coefficients, runs, ZRL and
    category extension; the decoded pixels must equal an INDEPENDENT
    numpy replay of quantize-then-dequantize (same DCT basis, none of
    the codec's Huffman machinery) — so the entropy coding layer is
    proven transparent even where quantization is lossy."""
    import numpy as np

    from imdbmapreduce_spark.operators.jpeg import (
        _C,
        FLAT_Q8,
        decode_baseline,
        encode_baseline_gray,
    )

    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, (16, 24)).astype(np.uint8)
    got = decode_baseline(encode_baseline_gray(img))["pixels"]

    q = np.full((8, 8), float(FLAT_Q8[0]))
    want = np.zeros_like(img)
    sh = img.astype(np.float64) - 128.0
    for by in range(0, 16, 8):
        for bx in range(0, 24, 8):
            coef = _C @ sh[by : by + 8, bx : bx + 8] @ _C.T
            deq = np.round(coef / q) * q
            blk = _C.T @ deq @ _C + 128.0
            want[by : by + 8, bx : bx + 8] = np.clip(np.round(blk), 0, 255)
    assert np.array_equal(got, want)


def test_jpeg_decoder_rejects_out_of_subset():
    """Subset boundaries are validated, not silently mis-decoded."""
    import numpy as np
    import pytest as _pytest

    from imdbmapreduce_spark.operators.jpeg import (
        decode_baseline,
        encode_baseline_gray,
    )

    img = np.full((8, 8), 99, dtype=np.uint8)
    payload = bytearray(encode_baseline_gray(img))
    with _pytest.raises(ValueError, match="SOI"):
        decode_baseline(b"\x89PNG\r\n")
    # flip SOF0 (C0) to progressive (C2)
    i = bytes(payload).find(b"\xff\xc0")
    payload[i + 1] = 0xC2
    with _pytest.raises(ValueError, match="baseline"):
        decode_baseline(bytes(payload))
    payload[i + 1] = 0xC0
    with _pytest.raises(ValueError, match="multiples of 8"):
        encode_baseline_gray(np.zeros((7, 8), dtype=np.uint8))


def test_jpeg_lane_matches_python_replay(spark, sf_dir):
    """The registered lane's rows equal a driver-side replay: md5-derived
    constant blocks, encode, decode, features from decoded pixels. The
    DuckDB oracle additionally hash-checks this in the driver sweep."""
    import hashlib

    import numpy as np

    rows = {
        r.doc_id: r
        for r in registry.get("image_features_real_jpeg").fn(spark, sf_dir).collect()
    }
    docs = table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    assert len(rows) == len(docs)
    for d in docs:
        m = hashlib.md5(d.text.encode("utf-8")).hexdigest()
        bw, bh = d.doc_id % 3 + 1, d.doc_id % 2 + 1
        want_sum = 64 * sum(ord(m[k]) for k in range(bw * bh))
        r = rows[d.doc_id]
        assert (r.width, r.height, r.n_blocks) == (bw * 8, bh * 8, bw * bh)
        assert r.pixel_sum == want_sum, d.doc_id


def test_png_codec_roundtrip_all_filters():
    """Random-image round-trips: heights >= 5 force every filter type
    (rows cycle 0..4), so one scrambled unfilter fails the identity."""
    import random

    from imdbmapreduce_spark.operators.png import decode_gray, encode_gray

    rng = random.Random(7)
    for _ in range(10):
        w, h = rng.randint(1, 40), rng.randint(5, 40)
        img = [[rng.randint(0, 255) for _ in range(w)] for _ in range(h)]
        d = decode_gray(encode_gray(img))
        assert (d["width"], d["height"]) == (w, h)
        assert d["pixels"] == img


def test_png_codec_detects_corruption_and_truncation():
    import pytest

    from imdbmapreduce_spark.operators.png import decode_gray, encode_gray

    img = [[(3 * x + y) % 256 for x in range(16)] for y in range(8)]
    good = encode_gray(img)
    flipped = bytearray(good)
    flipped[len(good) // 2] ^= 0xFF  # inside some chunk -> CRC must trip
    with pytest.raises(ValueError):
        decode_gray(bytes(flipped))
    with pytest.raises(ValueError):
        decode_gray(good[: len(good) - 13])  # IEND gone
    with pytest.raises(ValueError):
        decode_gray(b"\x89PNX" + good[4:])  # bad signature


def test_png_multi_idat_reassembly():
    """The encoder splits DEFLATE output across 64-byte IDAT chunks;
    the decoder must concatenate them before inflating."""
    from imdbmapreduce_spark.operators.png import (
        _IDAT_SPLIT,
        decode_gray,
        encode_gray,
    )

    img = [[(x * 31 + y * 7) % 256 for x in range(64)] for y in range(32)]
    payload = encode_gray(img)
    assert payload.count(b"IDAT") > 1, "fixture must exercise multi-IDAT"
    assert _IDAT_SPLIT == 64
    assert decode_gray(payload)["pixels"] == img


def test_png_paeth_predictor_spec_order():
    """Paeth tie-breaks must prefer left, then above, then upper-left
    (RFC 2083 §6.6) — a decoder with >= instead of <= still round-trips
    its own encoder but fails on foreign bitstreams."""
    from imdbmapreduce_spark.operators.png import _paeth

    assert _paeth(1, 1, 1) == 1  # all distances tie -> left
    assert _paeth(10, 10, 4) == 10  # pa == pb (a == b) -> left
    assert _paeth(5, 9, 8) == 5  # pa smallest -> left
    assert _paeth(9, 5, 8) == 5  # pb smallest -> above
    assert _paeth(0, 4, 2) == 2  # pc smallest -> upper-left
    assert _paeth(11, 8, 10) == 8  # pb == pc tie -> above beats upper-left


def test_doc_compression_signal_replay_and_structure(spark, sf_dir):
    """Byte-identical Python replay (same stdlib zlib, same level), plus
    the signal's reason to exist: repeated text compresses strictly
    below its shuffled-token counterpart."""
    import random
    import zlib

    from imdbmapreduce_spark import registry

    out = {
        r.doc_id: (r.n_raw, r.n_zlib, r.ratio_ppm)
        for r in registry.get("doc_compression_signal").fn(spark, sf_dir).collect()
    }
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    assert len(out) == len(docs)
    for r in docs:
        raw = r.text.encode("utf-8")
        z = zlib.compress(raw, 6)
        assert out[r.doc_id] == (
            len(raw),
            len(z),
            len(z) * 1_000_000 // len(raw) if raw else 0,
        )
    toks = ("the quick brown fox jumps over the lazy dog " * 40).split()
    repeated = " ".join(toks)
    rng = random.Random(3)
    shuffled_toks = list(set(toks)) * 1  # distinct words, then pad to length
    shuffled = " ".join(
        rng.choice(shuffled_toks) + str(rng.randint(0, 9999)) for _ in toks
    )
    r1 = len(zlib.compress(repeated.encode(), 6)) / len(repeated.encode())
    r2 = len(zlib.compress(shuffled.encode(), 6)) / len(shuffled.encode())
    assert r1 < r2


def test_jpeg_decodes_non_mcu_aligned_dimensions():
    """A baseline JPEG whose SOF dims are not multiples of 8 must decode
    (blocks are MCU-padded, output clipped) — real encoders pad blocks
    and declare true dims; review r9 caught the (h, w) plane allocation
    crashing on exactly this class."""
    import numpy as np

    from imdbmapreduce_spark.operators.jpeg import (
        decode_baseline,
        encode_baseline_gray,
    )

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (16, 16)).astype(np.uint8)
    p = bytearray(encode_baseline_gray(img))
    i = p.find(b"\xff\xc0")
    p[i + 5 : i + 7] = (10).to_bytes(2, "big")  # declare 10x12 of the 16x16
    p[i + 7 : i + 9] = (12).to_bytes(2, "big")
    d = decode_baseline(bytes(p))
    assert (d["width"], d["height"]) == (12, 10)
    full = decode_baseline(bytes(encode_baseline_gray(img)))["pixels"]
    assert (d["pixels"] == full[:10, :12]).all()


def test_jpeg_tolerates_fill_bytes_and_standalone_markers():
    """T.81 B.1.1.2: 0xFF fill bytes may precede any marker, and
    TEM/RSTn carry no length field — both legal in foreign baseline
    payloads decode_image_features routes here."""
    import numpy as np

    from imdbmapreduce_spark.operators.jpeg import (
        decode_baseline,
        encode_baseline_gray,
    )

    img = (np.arange(64, dtype=np.uint8).reshape(8, 8) * 3) % 256
    q = bytes(encode_baseline_gray(img))
    padded = q[:2] + b"\xff" + b"\xff\x01" + q[2:]  # fill byte + TEM
    ref = decode_baseline(q)["pixels"]
    assert (decode_baseline(padded)["pixels"] == ref).all()


def test_decode_image_features_dispatches_png_without_pil():
    """PNG payloads must route to the pure-Python codec, not the PIL
    stub (review r9: the dispatch was missing while the docstrings
    claimed all four formats decode for real)."""
    from imdbmapreduce_spark.operators.multimodal import decode_image_features
    from imdbmapreduce_spark.operators.png import encode_gray

    img = [[(x * 7 + y) % 256 for x in range(12)] for y in range(9)]
    payload = encode_gray(img)
    got = decode_image_features(payload)
    assert (got["width"], got["height"]) == (12, 9)
    assert got["n_bytes"] == len(payload)
    assert got["checksum"] == sum(payload) % (1 << 31)


def test_jpeg_truncated_and_fill_tail_payloads_raise_valueerror():
    """The marker scan must keep the documented ValueError contract on
    truncated / all-0xFF-tail payloads instead of IndexError (advice
    r9: decode_image_features routes ANY 0xFFD8-prefixed bytes here,
    so foreign garbage hits this path)."""
    import pytest as _pytest

    from imdbmapreduce_spark.operators.jpeg import decode_baseline

    for payload in (
        b"\xff\xd8",                # SOI then nothing
        b"\xff\xd8\xff",            # marker byte missing
        b"\xff\xd8\xff\xff\xff",    # all-0xFF tail: fill scan hits the end
        b"\xff\xd8\xff\xff\xff\xff",
    ):
        with _pytest.raises(ValueError):
            decode_baseline(payload)


def test_png_rejects_empty_and_zero_dim_images():
    """encode_gray must raise ValueError (not IndexError) on empty
    input; decode_gray must reject spec-invalid 0-width/0-height IHDR
    geometry the h*(w+1) length check passes vacuously (advice r9)."""
    import struct as _struct
    import zlib as _zlib

    import pytest as _pytest

    from imdbmapreduce_spark.operators.png import _SIG, _chunk, decode_gray, encode_gray

    with _pytest.raises(ValueError):
        encode_gray([])
    with _pytest.raises(ValueError):
        encode_gray([[]])

    def degenerate(w, h):
        ihdr = _struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
        idat = _chunk(b"IDAT", _zlib.compress(b"\x00" * (h * (w + 1))))
        return _SIG + _chunk(b"IHDR", ihdr) + idat + _chunk(b"IEND", b"")

    for w, h in ((0, 5), (5, 0), (0, 0)):
        with _pytest.raises(ValueError, match="geometry"):
            decode_gray(degenerate(w, h))


def test_audio_oracle_chunk_bound_is_derived_per_row():
    """The audio/video oracles derive chunk indices from each payload's
    own length (scalar list range), so a payload of ANY size yields the
    same geometry the uncapped Spark lane computes (r9 verdict task 7:
    the old fixed range(0, 100000) bound silently truncated payloads
    past ~25.6M samples). Replayed here in DuckDB with a synthetic
    payload far past any fixed bound, at exact-multiple and off-by-one
    boundaries."""
    import duckdb as _duckdb

    from imdbmapreduce_spark.operators.multimodal import _AUDIO_WINDOW

    con = _duckdb.connect()
    # n_samples per synthetic doc: exact multiple of the window, one
    # over, one under, and one 200k-chunk payload (2x the old cap)
    cases = {
        1: _AUDIO_WINDOW * 3,
        2: _AUDIO_WINDOW * 3 + 1,
        3: _AUDIO_WINDOW * 3 - 1,
        4: _AUDIO_WINDOW * 200_000,
    }
    rows = con.execute(
        f"""
        WITH a AS (
          SELECT * FROM (VALUES {', '.join(f'({d}, {n})' for d, n in cases.items())})
            t(doc_id, n_samples)
        )
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
               CAST(SUM(LEAST({_AUDIO_WINDOW},
                              u.full_n - CAST(u.i AS BIGINT)*{_AUDIO_WINDOW}))
                    AS BIGINT) AS tot
        FROM (SELECT doc_id, n_samples AS full_n,
                     unnest(range(0, (n_samples + {_AUDIO_WINDOW} - 1) // {_AUDIO_WINDOW}))
                       AS i
              FROM a) u
        GROUP BY doc_id ORDER BY doc_id
        """
    ).fetchall()
    got = {d: (nc, tot) for d, nc, tot in rows}
    for d, n in cases.items():
        want_chunks = -(-n // _AUDIO_WINDOW)
        assert got[d] == (want_chunks, n)
