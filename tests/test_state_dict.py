"""Weight import/export adapter (registry.load_model / export_state_dict).

The seeded registry stands in for real checkpoints inside the sandbox;
these tests prove the adapter would run the reference's ACTUAL weights:
a state dict exported to .npz (either this repo's flat format or the
reference torch key convention) rebuilds a model whose forward replays
the original bit-exactly.
"""

import os

import numpy as np
import pytest

from opennre_ray.registry import export_state_dict, get_model, load_model

ITEM = {"text": "the spark table join was fast",
        "h": {"pos": (4, 9)}, "t": {"pos": (16, 20)}}


def test_roundtrip_cnn_softmax(tmp_path):
    m = get_model("wiki80_cnn_softmax")
    path = str(tmp_path / "cnn.npz")
    export_state_dict(m, path)
    m2 = load_model("wiki80_cnn_softmax", path)
    assert m2.model_hash == m.model_hash
    assert m2.infer(ITEM) == m.infer(ITEM)


def test_roundtrip_bert_layers(tmp_path):
    m = get_model("wiki80_bert_softmax")
    path = str(tmp_path / "bert.npz")
    export_state_dict(m, path)
    m2 = load_model("wiki80_bert_softmax", path)
    assert m2.model_hash == m.model_hash
    assert m2.infer(ITEM) == m.infer(ITEM)


def test_roundtrip_bag_att_keeps_aggregator(tmp_path):
    m = get_model("nyt10_pcnn_att")
    path = str(tmp_path / "bag.npz")
    export_state_dict(m, path)
    m2 = load_model("nyt10_pcnn_att", path)
    assert m2.aggregator == "att"
    assert np.array_equal(m2.diag, m.diag)
    bag = [ITEM, {"text": "slow hash stream window merge",
                  "h": {"pos": (5, 9)}, "t": {"pos": (10, 16)}}]
    assert m2.infer_bag(bag) == m.infer_bag(bag)


def test_torch_convention_keys(tmp_path):
    """A reference-style torch state dict (prefixed keys, Conv1d/Linear
    layouts, fixed mask-embedding buffer present) loads and replays the
    same forward as the internal-format export."""
    m = get_model("wiki80_pcnn_softmax")
    w = m.encoder.w
    sd = {
        "sentence_encoder.word_embedding.weight": w["word_emb"],
        "sentence_encoder.pos1_embedding.weight": w["pos1_emb"],
        "sentence_encoder.pos2_embedding.weight": w["pos2_emb"],
        "sentence_encoder.conv.weight": w["conv_w"],
        "sentence_encoder.conv.bias": w["conv_b"],
        "sentence_encoder.mask_embedding.weight": np.eye(
            4, 3, k=-1, dtype=np.float32),     # fixed buffer — ignored
        "fc.weight": m.head.fc_w,
        "fc.bias": m.head.fc_b,
    }
    path = str(tmp_path / "torch_pcnn.npz")
    np.savez(path, **sd)
    m2 = load_model("wiki80_pcnn_softmax", path)
    assert m2.model_hash == m.model_hash
    assert m2.infer(ITEM) == m.infer(ITEM)


def test_torch_rnn_bias_pairs_sum(tmp_path):
    """torch RNNs carry bias_ih + bias_hh; the fused cell adds them."""
    m = get_model("wiki80_lstm_softmax")
    w = m.encoder.w
    rng = np.random.default_rng(3)
    b_ih = rng.standard_normal(w["lstm_b"].shape).astype(np.float32)
    sd = {
        "sentence_encoder.word_embedding.weight": w["word_emb"],
        "sentence_encoder.pos1_embedding.weight": w["pos1_emb"],
        "sentence_encoder.pos2_embedding.weight": w["pos2_emb"],
        "sentence_encoder.lstm.weight_ih_l0": w["lstm_w_ih"],
        "sentence_encoder.lstm.weight_hh_l0": w["lstm_w_hh"],
        "sentence_encoder.lstm.bias_ih_l0": b_ih,
        "sentence_encoder.lstm.bias_hh_l0": w["lstm_b"] - b_ih,
        "fc.weight": m.head.fc_w,
        "fc.bias": m.head.fc_b,
    }
    path = str(tmp_path / "torch_lstm.npz")
    np.savez(path, **sd)
    m2 = load_model("wiki80_lstm_softmax", path)
    assert np.allclose(m2.encoder.w["lstm_b"], w["lstm_b"], atol=1e-6)
    r1, r2 = m.infer(ITEM), m2.infer(ITEM)
    assert r1[0] == r2[0] and abs(r1[1] - r2[1]) < 1e-6


def test_shape_mismatch_raises(tmp_path):
    m = get_model("wiki80_cnn_softmax")
    path = str(tmp_path / "bad.npz")
    export_state_dict(m, path)
    # rel2id with the wrong relation count must be rejected loudly
    with pytest.raises(ValueError, match="relations"):
        load_model("wiki80_cnn_softmax", path,
                   rel2id={"NA": 0, "only_rel": 1})


@pytest.mark.skipif(
    not (os.environ.get("OPENNRE_RAY_WIKI80_CKPT")
         and os.path.exists(os.path.join(
             os.environ.get("OPENNRE_RAY_WIKI80_CKPT", ""),
             "wiki80_cnn_softmax.npz"))),
    reason="real wiki80 checkpoint not present (no torch/network in "
           "sandbox) — convert with scripts/convert_wiki80_ckpt.py and "
           "set OPENNRE_RAY_WIKI80_CKPT")
def test_real_wiki80_checkpoint_golden_parity():
    """The reference's golden inference (tests/test_inference.py:8-11):
    ('father', 0.7500484585762024 ± 1e-6) through load_model on the
    converted real checkpoint + real vocab."""
    import json

    d = os.environ["OPENNRE_RAY_WIKI80_CKPT"]
    with open(os.path.join(d, "rel2id.json")) as fh:
        rel2id = json.load(fh)
    with open(os.path.join(d, "word2id.json")) as fh:
        word2id = json.load(fh)
    m = load_model("wiki80_cnn_softmax",
                   os.path.join(d, "wiki80_cnn_softmax.npz"),
                   rel2id=rel2id, word2id=word2id)
    rel, score = m.infer({
        "text": "He was the son of Máel Dúin mac Máele Fithrich, and "
                "grandson of the high king Áed Uaridnach (died 612).",
        "h": {"pos": (18, 46)}, "t": {"pos": (78, 91)}})
    assert rel == "father"
    assert abs(score - 0.7500484585762024) < 1e-6
