"""Few-shot RE, NER surface, RNN/LSTM encoder tests."""

import numpy as np
import pytest

from opennre_ray import get_model
from opennre_ray.fewshot import FewShotProto, GazetteerNER
from opennre_ray.fixtures import entity_id


def _item(text, h, t):
    return {"text": text, "h": {"pos": h}, "t": {"pos": t}}


SUPPORT = [
    (_item("the spark table join was fast", (4, 9), (16, 20)), "relA"),
    (_item("a spark table join is fast", (2, 7), (14, 18)), "relA"),
    (_item("slow hash stream window merge", (5, 9), (10, 16)), "relB"),
    (_item("the hash stream window runs", (4, 8), (9, 15)), "relB"),
]


def test_fewshot_proto_classifies_support_like_queries():
    fs = FewShotProto().fit(SUPPORT)
    assert fs.classes == ["relA", "relB"]
    rel, score = fs.infer(_item("the spark table join was fast",
                                (4, 9), (16, 20)))
    assert rel == "relA" and 0.5 < score <= 1.0
    rel2, _ = fs.infer(_item("slow hash stream window merge", (5, 9), (10, 16)))
    assert rel2 == "relB"


def test_fewshot_scores_sum_to_one():
    fs = FewShotProto().fit(SUPPORT)
    rep = fs._encode([s[0] for s in SUPPORT])
    probs = fs.scores(rep)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, rtol=1e-5)


def test_fewshot_dataset_classification(ray_session):
    import ray.data as rd

    fs = FewShotProto().fit(SUPPORT)
    rows = [{"text": "the spark table join was fast", "h_start": 4,
             "h_end": 9, "t_start": 16, "t_end": 20}] * 5
    out = fs.classify_dataset(rd.from_items(rows)).to_pandas()
    assert (out["pred_rel"] == "relA").all()
    # matches single-item infer exactly
    rel, score = fs.infer(_item("the spark table join was fast", (4, 9),
                                (16, 20)))
    np.testing.assert_allclose(out["score"], score, rtol=1e-5)


def test_gazetteer_ner_contract():
    ner = GazetteerNER()
    out = ner.ner("the hash join was slow")
    assert out == [{"name": "hash join", "pos": [4, 13],
                    "id": entity_id("join")}]
    # token-list variant (reference base_model.py:63-71 is_token flag)
    out2 = ner.ner(["the", "spark", "runs"], is_token=True)
    assert out2[0]["name"] == "spark"


@pytest.mark.parametrize("name,hid", [("wiki80_rnn_softmax", 128),
                                      ("wiki80_lstm_softmax", 128)])
def test_rnn_lstm_encoders(name, hid):
    m = get_model(name)
    assert m.encoder.hidden_size == hid
    item = _item("the spark table join was fast", (4, 9), (16, 20))
    rel, score = m.infer(item)
    assert rel in m.rel2id and 0 < score <= 1
    # deterministic + batch==single consistency (atol: batched vs single
    # GEMMs take different BLAS paths, ~1e-7 float32 noise)
    assert get_model(name).infer(item) == (rel, score)
    texts = [item["text"]] * 3
    h = np.tile([4, 9], (3, 1))
    t = np.tile([16, 20], (3, 1))
    rep = m.encoder(m.encoder.encode_batch(texts, h, t))
    np.testing.assert_allclose(rep[0], rep[2], rtol=1e-5, atol=1e-6)


def test_lstm_ignores_trailing_padding():
    """Final-state readout must come from the last REAL token, not pads."""
    m = get_model("wiki80_lstm_softmax")
    short = m.encoder.encode_batch(["spark table join"],
                                   np.array([[0, 5]]), np.array([[12, 16]]))
    rep_short = m.encoder(short)
    assert rep_short.shape == (1, 128)
    assert np.isfinite(rep_short).all()
