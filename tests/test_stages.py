"""Stage-level tests: extraction byte-identity, NER, pair gen, scoring,
canonicalization, multimodal plumbing."""

import numpy as np
import pyarrow as pa
import pytest

from opennre_ray.fixtures import default_alias_table, entity_id, render_html
from opennre_ray.stages.extract import ExtractText, extract_text
from opennre_ray.stages.ner import (
    AliasMatcher,
    SentenceMentions,
    normalize_surface,
    split_sentences,
)
from opennre_ray.stages.pairs import generate_pairs


def test_extract_text_byte_identical_roundtrip():
    """North-star invariant: extractor inverts the page template exactly."""
    for text in ["plain words here", "a & b < c > d", "multi  space",
                 "unicode Máel 中文 text"]:
        html = render_html(7, text)
        assert extract_text(html) == text


def test_extract_drops_boilerplate():
    html = (b"<html><head><script>x</script></head><body>"
            b"<nav>menu</nav><p>keep this</p><footer>f</footer></body></html>")
    assert extract_text(html) == "keep this"


def test_extract_fallback_no_paragraphs():
    assert "hello world" in extract_text(b"<html><body>hello world</body></html>")


def test_extract_against_real_documents(ray_session, sf_dir):
    """Per-url byte identity over the whole sf0.001 corpus via Ray."""
    from opennre_ray.sources.pages import read_pages

    pages = read_pages(sf_dir, drop_text=False)
    extracted = pages.map_batches(
        lambda b: pa.table({
            "url": b.column("url"),
            "orig": b.column("text"),
            "got": pa.array([extract_text(h)
                             for h in b.column("html").to_pylist()]),
        }), batch_format="pyarrow")
    bad = extracted.map_batches(
        lambda b: b.filter(pa.compute.not_equal(b.column("orig"),
                                                b.column("got"))),
        batch_format="pyarrow")
    assert bad.count() == 0


def test_split_sentences_offsets():
    text = "First sentence. Second one! Third?"
    sents = split_sentences(text)
    assert [s for _, s in sents] == ["First sentence.", "Second one!", "Third?"]
    for start, s in sents:
        assert text[start: start + len(s)] == s


def test_split_sentences_windows_long_text():
    text = " ".join(["word"] * 60)
    sents = split_sentences(text, max_tokens=24)
    assert len(sents) == 3
    for start, s in sents:
        assert text[start: start + len(s)] == s
        assert len(s.split()) <= 24


def test_alias_matcher_leftmost_longest():
    table = default_alias_table()
    m = AliasMatcher(table)
    found = m.find("the hash join was slow")
    # multi-word 'hash join' must win over bare 'hash'/'join'
    assert [(f[2]) for f in found] == ["hash join"]
    assert found[0][3] == entity_id("join")
    s = "the hash join was slow"
    st, en, surf, _ = found[0]
    assert s[st:en] == surf


def test_normalize_surface():
    assert normalize_surface("  Máel   DÚIN ") == "mael duin"
    assert normalize_surface("Spark") == "spark"


def test_sentence_mentions_stage():
    stage = SentenceMentions()
    batch = pa.table({
        "url": ["u1", "u2"],
        "text": ["the spark table join was fast.",
                 "nothing to see here."],
    })
    out = stage(batch)
    assert out.num_rows == 1            # u2 has <2 mentions
    assert out.column("url")[0].as_py() == "u1"
    surfaces = out.column("m_surface")[0].as_py()
    assert surfaces == ["spark", "table", "join"]
    # char offsets index into the sentence
    sent = out.column("sentence")[0].as_py()
    for st, en, sf in zip(out.column("m_start")[0].as_py(),
                          out.column("m_end")[0].as_py(), surfaces):
        assert sent[st:en] == sf


def test_generate_pairs_gap_cap_and_selfpair():
    batch = pa.table({
        "url": ["u"], "sent_idx": [0],
        "sentence": ["spark table join hash"],
        "m_start": [[0, 6, 12, 17]],
        "m_end": [[5, 11, 16, 21]],
        "m_surface": [["spark", "table", "join", "hash"]],
        "m_entity": [["e1", "e2", "e3", "e4"]],
    })
    out = generate_pairs(batch, max_gap=2, max_pairs=100)
    pairs = set(zip(out.column("h_id").to_pylist(),
                    out.column("t_id").to_pylist()))
    # within gap 2: (1,2),(1,3),(2,3),(2,4),(3,4)
    assert pairs == {("e1", "e2"), ("e1", "e3"), ("e2", "e3"),
                     ("e2", "e4"), ("e3", "e4")}
    # self pairs skipped
    batch2 = batch.set_column(
        batch.schema.get_field_index("m_entity"), "m_entity",
        pa.array([["e1", "e1", "e1", "e1"]], pa.list_(pa.string())))
    assert generate_pairs(batch2).num_rows == 0


def test_relation_scorer_stage_matches_single_infer():
    from opennre_ray import get_model
    from opennre_ray.stages.score import RelationScorer

    scorer = RelationScorer("wiki80_cnn_softmax")
    batch = pa.table({
        "url": ["u"], "sent_idx": [0],
        "text": ["the spark table join was fast"],
        "h_id": ["e1"], "h_name": ["spark"], "h_start": [4], "h_end": [9],
        "t_id": ["e2"], "t_name": ["join"], "t_start": [16], "t_end": [20],
    })
    out = scorer(batch)
    m = get_model("wiki80_cnn_softmax")
    rel, score = m.infer({"text": "the spark table join was fast",
                          "h": {"pos": (4, 9)}, "t": {"pos": (16, 20)}})
    assert out.column("pred_rel")[0].as_py() == rel
    assert abs(out.column("score")[0].as_py() - score) < 1e-6
    assert out.column("model_hash")[0].as_py() == m.model_hash


def test_canonicalize_map(ray_session):
    import ray.data as rd
    from opennre_ray.stages.canonicalize import (
        CanonicalizeIds, build_canonical_map)

    inst = rd.from_items([
        {"h_name": "Spark", "h_id": "A", "t_name": "table", "t_id": "T"},
        {"h_name": "spark", "h_id": "B", "t_name": "table", "t_id": "T"},
        {"h_name": "SPARK", "h_id": "B", "t_name": "Table", "t_id": "T"},
    ])
    canon = build_canonical_map(inst)
    # 'spark' surface: B appears 2×, A 1× → canonical B
    assert canon["spark"] == "B"
    assert canon["table"] == "T"
    stage = CanonicalizeIds(canon)
    out = stage(pa.table({
        "h_name": ["Spark"], "h_id": ["A"],
        "t_name": ["TABLE"], "t_id": ["X"]}))
    assert out.column("h_id")[0].as_py() == "B"
    assert out.column("t_id")[0].as_py() == "T"


def test_multimodal_plumbing(ray_session, sf_dir):
    import ray.data as rd
    from opennre_ray.stages.multimodal import (
        DecodeImage, media_feature_pipeline)

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"]).limit(32)
    feats = media_feature_pipeline(docs, batch_size=16).to_pandas()
    assert len(feats) == 32
    assert np.asarray(feats["features"].iloc[0]).shape == (14,)   # 3+3+8
    # real-decoder path raises the documented stub error
    with pytest.raises(NotImplementedError):
        DecodeImage(fake=False)._decode(b"x", 4, 4)


def test_multimodal_resize_and_frame_sample(ray_session, sf_dir):
    import ray.data as rd
    from opennre_ray.stages.multimodal import (
        DecodeImage, ResizeImage, SampleFrames, synthesize_media_batch)

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"]).limit(16)
    media = docs.map_batches(synthesize_media_batch, batch_format="pyarrow")
    resized = (media.map_batches(DecodeImage, batch_format="pyarrow",
                                 batch_size=8, concurrency=(1, 2))
               .map_batches(ResizeImage, fn_constructor_args=((4, 4),),
                            batch_format="numpy", batch_size=8,
                            concurrency=(1, 2))).to_pandas()
    assert np.asarray(resized["image"].iloc[0]).shape == (4, 4, 3)
    frames = media.map_batches(SampleFrames(every=2, max_frames=3),
                               batch_format="pyarrow").to_pandas()
    assert set(frames["frame_idx"].unique()) <= {0, 2, 4}
    assert (frames.groupby("media_id").size() <= 3).all()
    with pytest.raises(NotImplementedError):
        SampleFrames(fake=False)._frames(b"x" * 1024)


def test_lineage_resume(tmp_path, ray_session):
    import ray.data as rd
    from opennre_ray.state.lineage import (
        ShardManifest, completed_shards, run_sharded)

    out = str(tmp_path / "graph")
    calls = []

    def build(name):
        def _build():
            calls.append(name)
            return rd.range(10)
        return _build

    shards = {"s0": build("s0"), "s1": build("s1")}
    mk = lambda n: ShardManifest(n, input_path=f"in/{n}", model_hash="h")
    r1 = run_sharded(shards, out, mk)
    assert r1["completed"] == ["s0", "s1"] and calls == ["s0", "s1"]
    assert completed_shards(out) == ["s0", "s1"]
    # resume: nothing re-runs
    r2 = run_sharded(shards, out, mk)
    assert r2["completed"] == [] and r2["skipped"] == ["s0", "s1"]
    assert calls == ["s0", "s1"]


def test_top_vocab_and_oov_stats(ray_session):
    """top_vocab: exact (cnt DESC, token ASC) cutoff incl. boundary ties;
    oov_stats counts tokens outside the broadcast vocab."""
    import ray.data as rd

    from opennre_ray.functions.textstats import oov_stats, top_vocab

    rows = [
        {"doc_id": 0, "text": "aa aa aa bb bb cc"},
        {"doc_id": 1, "text": "bb cc dd"},
        {"doc_id": 2, "text": "  "},          # whitespace-only: 0 tokens
        {"doc_id": 3, "text": "aa zz zz"},
    ]
    ds = rd.from_items(rows).repartition(2)
    # counts: aa=4, bb=3, cc=2, zz=2, dd=1 -> top3 cuts the cc/zz tie at
    # cnt=2 lexicographically: cc in, zz out
    vocab = top_vocab(ds, 3)
    assert vocab == frozenset({"aa", "bb", "cc"})

    got = (oov_stats(ds, vocab).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert got["n_tokens"].tolist() == [6, 3, 0, 3]
    assert got["oov_cnt"].tolist() == [0, 1, 0, 2]


def test_tfidf_topk_paths_agree(ray_session):
    """Broadcast-df and beyond-broadcast (token-bucketed join) tf-idf
    produce identical top-k, and match a hand oracle on a tiny corpus."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from opennre_ray.functions.textstats import tfidf_topk

    docs = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": ["apple banana apple", "banana cherry",
                 "apple cherry cherry durian", ""],
    })
    ds = rd.from_pandas(docs).repartition(3)

    cols = ["doc_id", "token", "tf", "score"]

    def norm(out_ds):
        df = out_ds.to_pandas()[cols]
        return (df.sort_values(["doc_id", "score", "token"],
                               ascending=[True, False, True])
                .reset_index(drop=True).astype({"tf": np.int64}))

    bcast = norm(tfidf_topk(ds, k=2, n_docs=4))
    joined = norm(tfidf_topk(ds, k=2, n_docs=4, broadcast_limit=0,
                             rows_hint=20))
    pd.testing.assert_frame_equal(bcast, joined, check_dtype=False)

    # hand check: doc 0 'apple' tf=2 df=2 → 2·ln(2); 'banana' tf=1 df=2
    got0 = bcast[bcast.doc_id == 0]
    assert got0.iloc[0].token == "apple"
    assert got0.iloc[0].score == round(2 * np.log(4 / 2), 6)
    assert 3 not in set(bcast.doc_id)      # empty doc emits nothing


def test_png_roundtrip_all_filters():
    """decode_png inverts every scanline filter type: encode with
    filter 0 (roundtrip), then hand-construct filtered streams for
    Sub/Up/Average/Paeth and check against the reference unfiltering."""
    import struct
    import zlib

    from opennre_ray.stages.imagecodec import (PNG_SIGNATURE, decode_png,
                                               encode_png)

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(13, 9, 3), dtype=np.uint8)
    assert (decode_png(encode_png(img)) == img).all()

    # hand-filter each scanline with type y%5 and rebuild the stream
    h, w, ch = img.shape
    stride = w * ch
    flat = img.reshape(h, stride).astype(np.int32)
    raw = bytearray()
    for y in range(h):
        ft = y % 5
        prev = flat[y - 1] if y else np.zeros(stride, np.int32)
        cur = flat[y]
        if ft == 0:
            enc = cur
        elif ft == 1:
            a = np.concatenate([np.zeros(ch, np.int32), cur[:-ch]])
            enc = cur - a
        elif ft == 2:
            enc = cur - prev
        elif ft == 3:
            a = np.concatenate([np.zeros(ch, np.int32), cur[:-ch]])
            enc = cur - ((a + prev) >> 1)
        else:
            a = np.concatenate([np.zeros(ch, np.int32), cur[:-ch]])
            b = prev
            c = np.concatenate([np.zeros(ch, np.int32), prev[:-ch]])
            p = a + b - c
            pa_, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
            pred = np.where((pa_ <= pb) & (pa_ <= pc), a,
                            np.where(pb <= pc, b, c))
            enc = cur - pred
        raw += bytes([ft]) + (enc % 256).astype(np.uint8).tobytes()

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    payload = (PNG_SIGNATURE
               + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
               + chunk(b"IDAT", zlib.compress(bytes(raw)))
               + chunk(b"IEND", b""))
    assert (decode_png(payload) == img).all()


def test_png_gray_and_rgba_normalize_to_rgb():
    import struct
    import zlib

    from opennre_ray.stages.imagecodec import PNG_SIGNATURE, decode_png

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    def build(ctype, ch, arr):
        h, w = arr.shape[:2]
        raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
        return (PNG_SIGNATURE
                + chunk(b"IHDR",
                        struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0))
                + chunk(b"IDAT", zlib.compress(raw))
                + chunk(b"IEND", b""))

    g = np.arange(12, dtype=np.uint8).reshape(3, 4, 1)
    got = decode_png(build(0, 1, g))
    assert got.shape == (3, 4, 3) and (got[:, :, 0] == g[:, :, 0]).all() \
        and (got[:, :, 1] == g[:, :, 0]).all()

    rgba = np.random.RandomState(0).randint(
        0, 256, size=(3, 4, 4), dtype=np.uint8)
    got = decode_png(build(6, 4, rgba))
    assert (got == rgba[:, :, :3]).all()


def test_ppm_decode_and_sniff():
    from opennre_ray.stages.imagecodec import decode_ppm, sniff_decode

    img = np.random.RandomState(1).randint(
        0, 256, size=(5, 7, 3), dtype=np.uint8)
    payload = b"P6\n# a comment\n7 5\n255\n" + img.tobytes()
    assert (decode_ppm(payload) == img).all()
    assert (sniff_decode(payload) == img).all()
    import pytest as _pytest
    with _pytest.raises(NotImplementedError):
        sniff_decode(b"\xff\xd8\xff\xe0 jpeg-ish")


def test_decode_image_real_codec_in_pipeline(ray_session):
    """DecodeImage(fake=False) over real PNG payloads inside a Ray
    actor-pool stage — the decode gate is now a working path."""
    import ray.data as rd

    from opennre_ray.stages.imagecodec import encode_png
    from opennre_ray.stages.multimodal import DecodeImage, ImageFeatures

    rng = np.random.RandomState(7)
    imgs = [rng.randint(0, 256, size=(16, 16, 3), dtype=np.uint8)
            for _ in range(6)]
    tbl = pa.table({
        "media_id": pa.array([f"m{i}" for i in range(6)]),
        "payload": pa.array([encode_png(im) for im in imgs], pa.binary()),
        "mime": pa.array(["image/png"] * 6),
        "width": pa.array([16] * 6, pa.int32()),
        "height": pa.array([16] * 6, pa.int32()),
    })
    ds = rd.from_arrow(tbl)
    decoded = ds.map_batches(lambda b: DecodeImage(fake=False)(b),
                             batch_format="pyarrow", batch_size=3)
    feats = decoded.map_batches(ImageFeatures, batch_format="numpy",
                                batch_size=3, concurrency=(1, 2))
    out = feats.take_all()
    assert len(out) == 6
    by_id = {r["media_id"]: r["features"] for r in out}
    # feature head = per-channel means of the REAL decoded pixels
    np.testing.assert_allclose(
        by_id["m0"][:3], imgs[0].astype(np.float32).mean(axis=(0, 1)),
        rtol=1e-5)


def test_wav_roundtrip_and_variants():
    from opennre_ray.stages.audiocodec import decode_wav, encode_wav

    rng = np.random.RandomState(5)
    s = rng.randint(-3000, 3000, size=(441, 2)).astype(np.int16)
    payload = encode_wav(s, 44100)
    got, rate = decode_wav(payload)
    assert rate == 44100 and (got == s).all()

    # float32 WAV (format tag 3) decodes too
    import struct
    f = np.linspace(-1, 1, 100, dtype="<f4").reshape(100, 1)
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 8000 * 4, 4, 32)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", f.nbytes) + f.tobytes())
    got2, rate2 = decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert rate2 == 8000 and np.allclose(got2[:, 0], f[:, 0])

    import pytest as _pytest
    with _pytest.raises(NotImplementedError):
        # ADPCM format tag -> named plug point, not silence
        fmt = struct.pack("<HHIIHH", 2, 1, 8000, 8000, 1, 4)
        body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", 0))
        decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)


def test_decode_audio_stage_in_pipeline(ray_session):
    import ray.data as rd

    from opennre_ray.stages.audiocodec import encode_wav
    from opennre_ray.stages.multimodal import DecodeAudio

    rng = np.random.RandomState(9)
    clips = [rng.randint(-2000, 2000, size=(800, 1)).astype(np.int16)
             for _ in range(5)]
    tbl = pa.table({
        "media_id": pa.array([f"a{i}" for i in range(5)]),
        "payload": pa.array([encode_wav(c, 16000) for c in clips],
                            pa.binary()),
    })
    out = (rd.from_arrow(tbl)
           .map_batches(DecodeAudio, batch_format="pyarrow",
                        batch_size=2, concurrency=(1, 2))
           .take_all())
    assert len(out) == 5
    by_id = {r["media_id"]: r["features"] for r in out}
    mono = clips[0].astype(np.float64).mean(axis=1)
    assert abs(by_id["a0"][0] - np.sqrt((mono ** 2).mean())) < 1e-3
    assert abs(by_id["a0"][2] - 800 / 16000) < 1e-6
