"""Unit tests for encoders/heads/bag aggregators (SURVEY.md §2.2-2.4).

Oracles are slow, obviously-correct pure-Python re-derivations of the
documented reference math (the reference itself needs torch, absent here),
plus golden determinism checks in the reference's style
(``/root/reference/tests/test_inference.py:8-11``: fixed input → fixed
(relation, score)).
"""

import numpy as np
import pytest

from opennre_ray import get_model, nn
from opennre_ray.fixtures import default_rel2id, default_word2id
from opennre_ray.models import (
    bag_attention_eval,
    bag_attention_train,
    bag_average_eval,
    bag_one_eval,
    bag_one_train,
    encode_instances,
)

GOLDEN_ITEM = {
    "text": "He was the son of Máel Dúin mac Máele Fithrich, and grandson "
            "of the high king Áed Uaridnach (died 612).",
    "h": {"pos": (18, 46)},
    "t": {"pos": (78, 91)},
}


def vocab():
    d = dict(default_word2id())
    d["[UNK]"] = len(d)
    d["[PAD]"] = len(d)
    return d


# ---------------------------------------------------------------------------
# Encoding (M1/M2)
# ---------------------------------------------------------------------------

def test_encode_basic_shapes_and_positions():
    v = vocab()
    L = 8
    out = encode_instances(
        ["the table was fast"], np.array([[4, 9]]), np.array([[14, 18]]),
        v, max_length=L, with_mask=True)
    # tokens: the | table | was | fast
    assert out["token"].shape == (1, L)
    assert out["token"][0][0] == v["the"]
    assert out["token"][0][1] == v["table"]
    assert out["token"][0][4] == v["[PAD]"]
    # head starts at token 1, tail at token 3
    # pos1[i] = min(i - 1 + L, 2L-1), pos2[i] = min(i - 3 + L, 2L-1), 0 past len
    assert list(out["pos1"][0][:4]) == [7, 8, 9, 10]
    assert list(out["pos2"][0][:4]) == [5, 6, 7, 8]
    assert list(out["pos1"][0][4:]) == [0] * 4
    # PCNN mask: 1 up to and incl. first entity start, 2 up to second, 3 after
    assert list(out["mask"][0][:4]) == [1, 1, 2, 2]
    assert list(out["mask"][0][4:]) == [0] * 4


def test_encode_reversed_entities():
    v = vocab()
    # tail appears before head in the text
    out = encode_instances(
        ["fast table the value"], np.array([[15, 20]]), np.array([[5, 10]]),
        v, max_length=6)
    # tokens: fast table the value ; head=value(idx 3), tail=table(idx 1)
    L = 6
    assert out["pos1"][0][0] == 0 - 3 + L    # head start 3
    assert out["pos2"][0][0] == 0 - 1 + L    # tail start 1


def test_encode_pretokenized_branch():
    v = vocab()
    out = encode_instances(
        [None], np.array([[1, 2]]), np.array([[3, 4]]), v, max_length=5,
        token_lists=[["the", "table", "was", "fast", "x"]])
    assert out["token"][0][1] == v["table"]
    assert out["token"][0][4] == v["[UNK]"]


def test_encode_truncation_and_clamp():
    v = vocab()
    L = 4
    text = " ".join(["data"] * 10)
    out = encode_instances([text], np.array([[0, 4]]), np.array([[45, 49]]),
                           v, max_length=L)
    assert out["token"].shape == (1, L)
    # tail start token index 9 clamps to L; pos2 capped at 2L-1
    assert (out["pos2"][0] <= 2 * L - 1).all()


def test_encode_entity_masking():
    v = vocab()
    out = encode_instances(["the table was fast"], np.array([[4, 9]]),
                           np.array([[14, 18]]), v, max_length=8,
                           mask_entity=True)
    assert out["token"][0][1] == v["[UNK]"]
    assert out["token"][0][3] == v["[UNK]"]


# ---------------------------------------------------------------------------
# Forward passes vs slow oracles
# ---------------------------------------------------------------------------

def slow_conv1d(x, w, b, padding):
    B, L, C = x.shape
    H, _, K = w.shape
    xp = np.zeros((B, L + 2 * padding, C), dtype=np.float64)
    xp[:, padding: padding + L] = x
    Lout = L + 2 * padding - K + 1
    out = np.zeros((B, Lout, H))
    for bi in range(B):
        for l in range(Lout):
            for h in range(H):
                out[bi, l, h] = (xp[bi, l: l + K].T * w[h]).sum() + b[h]
    return out


def test_conv1d_matches_slow_oracle():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 6, 5)).astype(np.float32)
    w = rng.standard_normal((4, 5, 3)).astype(np.float32)
    b = rng.standard_normal(4).astype(np.float32)
    fast = nn.conv1d(x, w, b, padding=1)
    slow = slow_conv1d(x, w, b, padding=1)
    np.testing.assert_allclose(fast, slow, rtol=1e-4, atol=1e-5)


def test_softmax_and_layernorm():
    x = np.array([[1.0, 2.0, 3.0]])
    s = nn.softmax(x)
    np.testing.assert_allclose(s.sum(), 1.0, rtol=1e-6)
    assert s[0, 2] > s[0, 1] > s[0, 0]
    g = np.ones(3, np.float32)
    bta = np.zeros(3, np.float32)
    ln = nn.layer_norm(x.astype(np.float32), g, bta)
    np.testing.assert_allclose(ln.mean(), 0.0, atol=1e-6)


def test_cnn_pipeline_batch_equals_single():
    """Batch-of-N forward == N single forwards (no cross-row leakage)."""
    m = get_model("wiki80_cnn_softmax")
    texts = ["the spark table join was fast",
             "slow hash stream window merge sort data"]
    h = np.array([[4, 9], [5, 9]])
    t = np.array([[16, 20], [12, 18]])
    enc = m.encoder.encode_batch(texts, h, t)
    rep = m.encoder(enc)
    for i in range(2):
        enc1 = m.encoder.encode_batch([texts[i]], h[i: i + 1], t[i: i + 1])
        rep1 = m.encoder(enc1)
        np.testing.assert_allclose(rep[i], rep1[0], rtol=1e-5, atol=1e-6)


def test_pcnn_segments_differ_from_cnn():
    m = get_model("wiki80_pcnn_softmax")
    assert m.encoder.hidden_size == 690
    rel, score = m.infer({"text": "the spark table join was fast",
                          "h": {"pos": (4, 9)}, "t": {"pos": (16, 20)}})
    assert rel in m.rel2id and 0 < score <= 1


def test_golden_determinism_cnn():
    """Reference-style golden gate: fixed input → bit-stable (rel, score)."""
    m = get_model("wiki80_cnn_softmax")
    r1 = m.infer(GOLDEN_ITEM)
    r2 = get_model("wiki80_cnn_softmax").infer(GOLDEN_ITEM)
    assert r1 == r2
    assert abs(r1[1] - m.infer(GOLDEN_ITEM)[1]) < 1e-9


# Pinned expected outputs for the golden sentence under each seeded model
# (the engine's analogue of the reference's hard-coded
# ('father', 0.7500484585762024) ± 1e-6 gate, tests/test_inference.py:8-11;
# those checkpoints require torch + network, absent here). Any drift in
# tokenization, encoding, seeding, or forward math trips these.
GOLDEN_EXPECTED = {
    "wiki80_cnn_softmax": ("NA", 0.16976232826709747),
    "wiki80_pcnn_softmax": ("educated_at", 0.16718536615371704),
    "wiki80_bert_softmax": ("country", 0.1157071590423584),
    "wiki80_rnn_softmax": ("located_in", 0.11777178198099136),
    "wiki80_lstm_softmax": ("founder_of", 0.11167243123054504),
}


@pytest.mark.parametrize("name", sorted(GOLDEN_EXPECTED))
def test_golden_pinned_scores(name):
    rel, score = get_model(name).infer(GOLDEN_ITEM)
    want_rel, want_score = GOLDEN_EXPECTED[name]
    assert rel == want_rel
    assert abs(score - want_score) < 1e-6


def test_bert_encode_markers_and_forward():
    m = get_model("wiki80_bert_softmax")
    enc = m.encoder.encode_batch(["the customer data was big"],
                                 np.array([[4, 12]]), np.array([[13, 17]]))
    vocab = m.encoder.vocab
    row = list(enc["token"][0])
    assert row[0] == vocab["[CLS]"]
    assert vocab["[unused0]"] in row and vocab["[unused1]"] in row
    assert vocab["[unused2]"] in row and vocab["[unused3]"] in row
    assert enc["att_mask"][0].sum() > 0
    # pos1 points at [unused0], pos2 at [unused2]
    assert row[enc["pos1"][0]] == vocab["[unused0]"]
    assert row[enc["pos2"][0]] == vocab["[unused2]"]
    rep = m.encoder(enc)
    assert rep.shape == (1, 64)


def test_bert_entity_encoder_concat_dim():
    m = get_model("wiki80_bertentity_softmax")
    rel, score = m.infer({"text": "the customer data was big",
                          "h": {"pos": (4, 12)}, "t": {"pos": (13, 17)}})
    assert m.encoder.hidden_size == 128
    assert 0 < score <= 1


# ---------------------------------------------------------------------------
# Bag aggregators (G5-G9) vs slow oracles
# ---------------------------------------------------------------------------

def _softmax1(v):
    e = np.exp(v - v.max())
    return e / e.sum()


def test_bag_attention_eval_oracle():
    rng = np.random.default_rng(1)
    n, H, N = 4, 6, 3
    rep = rng.standard_normal((n, H)).astype(np.float32)
    fc_w = rng.standard_normal((N, H)).astype(np.float32)
    fc_b = rng.standard_normal(N).astype(np.float32)
    diag = rng.standard_normal(H).astype(np.float32)
    got = bag_attention_eval(rep, fc_w, fc_b, diag)
    # slow: per relation r, attention over instances with query fc_w[r]*diag
    want = np.zeros(N)
    for r in range(N):
        att = _softmax1(rep @ (fc_w.T * diag[:, None])[:, r])
        rep_r = att @ rep
        want[r] = _softmax1(rep_r @ fc_w.T + fc_b)[r]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_bag_attention_train_oracle():
    rng = np.random.default_rng(2)
    rep = rng.standard_normal((3, 5)).astype(np.float32)
    fc_w = rng.standard_normal((4, 5)).astype(np.float32)
    fc_b = np.zeros(4, np.float32)
    diag = np.ones(5, np.float32)
    got = bag_attention_train(rep, 2, fc_w, fc_b, diag)
    att = _softmax1(rep @ fc_w[2])
    want = (att @ rep) @ fc_w.T + fc_b
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_bag_average_and_one():
    rng = np.random.default_rng(3)
    rep = rng.standard_normal((5, 4)).astype(np.float32)
    fc_w = rng.standard_normal((3, 4)).astype(np.float32)
    fc_b = np.zeros(3, np.float32)
    avg = bag_average_eval(rep, fc_w, fc_b)
    np.testing.assert_allclose(avg, _softmax1(rep.mean(0) @ fc_w.T), rtol=1e-5)
    one = bag_one_eval(rep, fc_w, fc_b)
    probs = np.stack([_softmax1(r @ fc_w.T) for r in rep])
    np.testing.assert_allclose(one, probs.max(0), rtol=1e-5)
    # train: picks argmax instance on gold label then raw logits
    got = bag_one_train(rep, 1, fc_w, fc_b)
    best = probs[:, 1].argmax()
    np.testing.assert_allclose(got, rep[best] @ fc_w.T, rtol=1e-5)


def test_bag_infer_single_instance_reduces_to_sentence():
    """A 1-instance bag under 'avg' == softmax of that instance's logits."""
    m = get_model("nyt10_pcnn_avg")
    item = {"text": "the spark table join was fast",
            "h": {"pos": (4, 9)}, "t": {"pos": (16, 20)}}
    rel, score = m.infer_bag([item])
    enc = m.encoder.encode_batch([item["text"]], np.array([[4, 9]]),
                                 np.array([[16, 20]]))
    probs = m.head.scores(m.encoder(enc))[0]
    assert m.rel2id[rel] == probs.argmax()
    np.testing.assert_allclose(score, probs.max(), rtol=1e-5)
