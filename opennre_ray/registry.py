"""Model registry: name → assembled (encoder, head) with deterministic weights.

Mirrors the reference's registry-by-name surface (``opennre/pretrain.py:
126-178``: ``wiki80_cnn_softmax`` = CNNEncoder(max_length=40, hidden 230) +
SoftmaxNN; ``wiki80_bert*`` = max_length 80) but, since this sandbox has no
network and no torch, checkpoints are *seeded* — every weight tensor is drawn
from a name-keyed PRNG so any two processes (driver, actors, tests) construct
bit-identical models. ``model_hash`` content-addresses the weights for
lineage columns (SURVEY.md §4 checkpoint/lineage design).
"""

from __future__ import annotations

import hashlib

import numpy as np

from . import fixtures
from .models import (
    BertSentenceEncoder,
    CnnSentenceEncoder,
    LstmSentenceEncoder,
    PcnnSentenceEncoder,
    RnnSentenceEncoder,
    SigmoidHead,
    SoftmaxHead,
)


def _seed_for(name: str) -> int:
    return int.from_bytes(hashlib.sha256(name.encode()).digest()[:4], "little")


def _cnn_weights(rng, vocab_size, word_dim=50, pos_dim=5, hidden=230,
                 kernel=3, max_length=40):
    emb_in = word_dim + 2 * pos_dim
    scale = 1.0 / np.sqrt(emb_in * kernel)
    w = {
        "word_emb": rng.standard_normal((vocab_size + 2, word_dim)).astype(np.float32) / np.sqrt(word_dim),
        "pos1_emb": rng.standard_normal((2 * max_length, pos_dim)).astype(np.float32) / np.sqrt(pos_dim),
        "pos2_emb": rng.standard_normal((2 * max_length, pos_dim)).astype(np.float32) / np.sqrt(pos_dim),
        "conv_w": (rng.standard_normal((hidden, emb_in, kernel)).astype(np.float32) * scale),
        "conv_b": np.zeros(hidden, dtype=np.float32),
    }
    # padding_idx=0 rows are zero in the reference position embeddings
    w["pos1_emb"][0] = 0
    w["pos2_emb"][0] = 0
    # [PAD] word row zero, mirroring the reference's blank row init
    w["word_emb"][-1] = 0
    return w


def _bert_weights(rng, vocab_size, hidden=64, n_layers=2, inner=128,
                  max_length=80, entity_repr=False):
    def mat(*shape, scale=0.02):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    w = {
        "word_emb": mat(vocab_size, hidden),
        "pos_emb": mat(max_length, hidden),
        "type_emb": mat(2, hidden),
        "emb_ln_g": np.ones(hidden, dtype=np.float32),
        "emb_ln_b": np.zeros(hidden, dtype=np.float32),
        "pool_w": mat(hidden, hidden),
        "pool_b": np.zeros(hidden, dtype=np.float32),
        "layers": [],
    }
    for _ in range(n_layers):
        w["layers"].append({
            "q_w": mat(hidden, hidden), "q_b": np.zeros(hidden, np.float32),
            "k_w": mat(hidden, hidden), "k_b": np.zeros(hidden, np.float32),
            "v_w": mat(hidden, hidden), "v_b": np.zeros(hidden, np.float32),
            "o_w": mat(hidden, hidden), "o_b": np.zeros(hidden, np.float32),
            "ln_g": np.ones(hidden, np.float32), "ln_b": np.zeros(hidden, np.float32),
            "i_w": mat(inner, hidden), "i_b": np.zeros(inner, np.float32),
            "f_w": mat(hidden, inner), "f_b": np.zeros(hidden, np.float32),
            "f_ln_g": np.ones(hidden, np.float32), "f_ln_b": np.zeros(hidden, np.float32),
        })
    if entity_repr:
        w["ent_w"] = mat(2 * hidden, 2 * hidden)
        w["ent_b"] = np.zeros(2 * hidden, dtype=np.float32)
    return w


def _weights_hash(w) -> str:
    h = hashlib.sha256()

    def feed(obj):
        if isinstance(obj, dict):
            for k in sorted(obj):
                h.update(k.encode())
                feed(obj[k])
        elif isinstance(obj, list):
            for item in obj:
                feed(item)
        else:
            h.update(np.ascontiguousarray(obj).tobytes())

    feed(w)
    return h.hexdigest()[:16]


class NREModel:
    """Assembled encoder + head, the unit scorer actors hold per process."""

    def __init__(self, name, encoder, head, aggregator=None, diag=None):
        self.name = name
        self.encoder = encoder
        self.head = head
        self.aggregator = aggregator   # bag-level models only ('att'/'avg'/'one')
        self.diag = diag
        self.rel2id = head.rel2id
        self.id2rel = head.id2rel
        self.model_hash = None  # filled by get_model

    # --- single-item convenience, matching the reference infer() contract ---
    def infer(self, item: dict) -> tuple[str, float]:
        """One instance dict → (relation, score); reference
        ``softmax_nn.py:28-39``. Batch pipelines use the stage API instead."""
        texts = [item.get("text")]
        token_lists = [item.get("token")] if "text" not in item else None
        h = np.array([list(item["h"]["pos"])])
        t = np.array([list(item["t"]["pos"])])
        enc = self.encoder.encode_batch(texts, h, t, token_lists=token_lists)
        rep = self.encoder(enc)
        pred, score = self.head.infer_batch(rep)
        return self.id2rel[int(pred[0])], float(score[0])

    def infer_bag(self, bag: list[dict]) -> tuple[str, float]:
        """Bag of instance dicts → (relation, score); reference
        ``bag_attention.py:33-66``."""
        from .models import BAG_EVAL_AGGREGATORS
        texts = [it.get("text") for it in bag]
        h = np.array([list(it["h"]["pos"]) for it in bag])
        t = np.array([list(it["t"]["pos"]) for it in bag])
        enc = self.encoder.encode_batch(texts, h, t)
        rep = self.encoder(enc)
        scores = BAG_EVAL_AGGREGATORS[self.aggregator](
            rep, self.head.fc_w, self.head.fc_b, diag=self.diag)
        pred = int(scores.argmax())
        return self.id2rel[pred], float(scores[pred])


def get_model(name: str, rel2id=None, word2id=None) -> NREModel:
    """Build a named model with deterministic seeded weights.

    Supported names (hyperparameters per reference ``pretrain.py:126-178``):
      wiki80_cnn_softmax, wiki80_pcnn_softmax       (max_length=40, hidden 230)
      wiki80_bert_softmax, wiki80_bertentity_softmax (max_length=80)
      wiki80_cnn_sigmoid                             (multi-label head)
      nyt10_pcnn_att / nyt10_pcnn_avg / nyt10_pcnn_one (bag-level)
    """
    rng = np.random.default_rng(_seed_for(name))
    rel2id = rel2id or fixtures.default_rel2id()
    n_rel = len(rel2id)
    aggregator = None
    diag = None

    if "bert" in name:
        vocab = bert_vocab = fixtures.bert_vocab()
        entity_repr = "bertentity" in name
        hidden = 64
        enc = BertSentenceEncoder(
            vocab, _bert_weights(rng, len(vocab), hidden=hidden,
                                 entity_repr=entity_repr),
            max_length=80, hidden_size=hidden, n_layers=2, n_heads=4,
            entity_repr=entity_repr)
    else:
        word2id = word2id or fixtures.default_word2id()
        weights = _cnn_weights(rng, len(word2id))
        if "lstm" in name or "_rnn_" in name or name.endswith("rnn_softmax"):
            hidden = 128
            emb_in = weights["conv_w"].shape[1]
            del weights["conv_w"], weights["conv_b"]
            scale = 1.0 / np.sqrt(hidden)
            if "lstm" in name:
                weights["lstm_w_ih"] = (rng.standard_normal(
                    (4 * hidden, emb_in)).astype(np.float32) * scale)
                weights["lstm_w_hh"] = (rng.standard_normal(
                    (4 * hidden, hidden)).astype(np.float32) * scale)
                weights["lstm_b"] = np.zeros(4 * hidden, np.float32)
                cls = LstmSentenceEncoder
            else:
                weights["rnn_w_ih"] = (rng.standard_normal(
                    (hidden, emb_in)).astype(np.float32) * scale)
                weights["rnn_w_hh"] = (rng.standard_normal(
                    (hidden, hidden)).astype(np.float32) * scale)
                weights["rnn_b"] = np.zeros(hidden, np.float32)
                cls = RnnSentenceEncoder
            enc = cls(word2id, weights, max_length=40, hidden_size=hidden)
        else:
            cls = PcnnSentenceEncoder if "pcnn" in name else CnnSentenceEncoder
            enc = cls(word2id, weights, max_length=40, hidden_size=230)

    head_cls = SigmoidHead if "sigmoid" in name else SoftmaxHead
    fc_w = (rng.standard_normal((n_rel, enc.hidden_size)).astype(np.float32)
            / np.sqrt(enc.hidden_size))
    fc_b = np.zeros(n_rel, dtype=np.float32)
    head = head_cls(fc_w, fc_b, rel2id)

    for agg in ("att", "avg", "one"):
        if name.endswith("_" + agg):
            aggregator = agg
    if aggregator == "att":
        diag = np.ones(enc.hidden_size, dtype=np.float32)

    model = NREModel(name, enc, head, aggregator=aggregator, diag=diag)
    model.model_hash = _weights_hash(
        {"enc": enc.w, "fc_w": fc_w, "fc_b": fc_b})
    return model


# ---------------------------------------------------------------------------
# Weight import/export: run REAL checkpoints through the numpy forward.
#
# The sandbox has no torch and no network, so get_model() draws seeded
# weights — but the architectures match the reference exactly
# (``opennre/encoder/cnn_encoder.py``, ``pcnn_encoder.py``,
# ``model/softmax_nn.py``), so a user holding the reference's actual
# wiki80 checkpoint can export it once
# (``np.savez(path, **{k: t.cpu().numpy() for k, t in sd.items()})``)
# and load_model() runs it here, closing the golden-score gap
# (reference ``tests/test_inference.py:8-11``) outside the sandbox.
# ---------------------------------------------------------------------------

#: torch-convention state-dict keys → internal names. Array layouts
#: already agree: Conv1d (H, C, K), Embedding (V, D), Linear (out, in).
_TORCH_KEY_MAP = {
    "sentence_encoder.word_embedding.weight": "word_emb",
    "sentence_encoder.pos1_embedding.weight": "pos1_emb",
    "sentence_encoder.pos2_embedding.weight": "pos2_emb",
    "sentence_encoder.conv.weight": "conv_w",
    "sentence_encoder.conv.bias": "conv_b",
    "sentence_encoder.lstm.weight_ih_l0": "lstm_w_ih",
    "sentence_encoder.lstm.weight_hh_l0": "lstm_w_hh",
    "sentence_encoder.rnn.weight_ih_l0": "rnn_w_ih",
    "sentence_encoder.rnn.weight_hh_l0": "rnn_w_hh",
    "fc.weight": "fc_w",
    "fc.bias": "fc_b",
}
#: torch RNN/LSTM carry two bias vectors per gate set; the fused cell
#: adds them, so both keys accumulate into the single internal bias
_TORCH_BIAS_SUM = {
    "sentence_encoder.lstm.bias_ih_l0": "lstm_b",
    "sentence_encoder.lstm.bias_hh_l0": "lstm_b",
    "sentence_encoder.rnn.bias_ih_l0": "rnn_b",
    "sentence_encoder.rnn.bias_hh_l0": "rnn_b",
}
#: fixed (non-trained) buffers the numpy forward derives itself
_TORCH_IGNORED = frozenset({"sentence_encoder.mask_embedding.weight"})

_HEAD_KEYS = ("fc_w", "fc_b", "diag")


def _flatten_tree(obj, prefix: str = "") -> dict:
    out: dict = {}
    if isinstance(obj, dict):
        for k, v in obj.items():
            out.update(_flatten_tree(v, f"{prefix}{k}."))
    elif isinstance(obj, list):
        for i, v in enumerate(obj):
            out.update(_flatten_tree(v, f"{prefix}{i}."))
    else:
        out[prefix[:-1]] = np.asarray(obj)
    return out


def _nested_set(root: dict, parts: list[str], value) -> None:
    node = root
    for i, p in enumerate(parts[:-1]):
        nxt = [] if parts[i + 1].isdigit() else {}
        if p.isdigit():
            idx = int(p)
            while len(node) <= idx:
                node.append(None)
            if node[idx] is None:
                node[idx] = nxt
            node = node[idx]
        else:
            node = node.setdefault(p, nxt)
    last = parts[-1]
    if last.isdigit():
        idx = int(last)
        while len(node) <= idx:
            node.append(None)
        node[idx] = value
    else:
        node[last] = value


def export_state_dict(model: NREModel, path: str) -> None:
    """Write the model's weights as a flat ``.npz`` state dict — keys
    ``encoder.<name>`` (``encoder.layers.<i>.<name>`` for transformer
    blocks) plus ``fc_w`` / ``fc_b`` / optional ``diag``. The same
    format ``load_model`` ingests, so models round-trip bit-exactly."""
    flat = _flatten_tree({"encoder": model.encoder.w})
    flat["fc_w"] = model.head.fc_w
    flat["fc_b"] = model.head.fc_b
    if model.diag is not None:
        flat["diag"] = model.diag
    np.savez(path, **flat)


def load_model(name: str, path: str, rel2id=None, word2id=None,
               n_heads: int = 4) -> NREModel:
    """Build ``name``'s architecture with weights IMPORTED from an
    ``.npz`` state dict instead of the seeded registry draw.

    Accepts either this module's export format (``export_state_dict``)
    or a reference torch state dict saved array-per-key
    (``_TORCH_KEY_MAP`` translates names; RNN/LSTM bias pairs sum; the
    fixed PCNN mask-embedding buffer is ignored). Hyperparameters
    (hidden size, max length, layer count) are inferred from array
    shapes; ``rel2id`` / ``word2id`` must match the checkpoint's output
    and vocabulary dimensions — mismatches raise ``ValueError`` with
    both shapes. ``model_hash`` content-addresses the LOADED weights, so
    lineage columns distinguish real-checkpoint from seeded runs.
    """
    rel2id = rel2id or fixtures.default_rel2id()
    raw = np.load(path)
    flat: dict = {}
    bias_acc: dict = {}
    for k in raw.files:
        if k in _TORCH_IGNORED:
            continue
        v = np.asarray(raw[k], dtype=np.float32)
        if k in _TORCH_BIAS_SUM:
            tgt = _TORCH_BIAS_SUM[k]
            bias_acc[tgt] = bias_acc.get(tgt, 0) + v
            continue
        k = _TORCH_KEY_MAP.get(k, k)
        if k not in _HEAD_KEYS and not k.startswith("encoder."):
            k = f"encoder.{k}"
        flat[k] = v
    for tgt, v in bias_acc.items():
        flat[f"encoder.{tgt}"] = v.astype(np.float32)

    enc_w: dict = {}
    for k, v in flat.items():
        if k.startswith("encoder."):
            _nested_set(enc_w, k.split(".")[1:], v)

    if "fc_w" not in flat:
        raise ValueError(f"state dict at {path} has no fc weights "
                         f"(keys: {sorted(raw.files)[:8]}...)")
    fc_w, fc_b = flat["fc_w"], flat.get(
        "fc_b", np.zeros(flat["fc_w"].shape[0], np.float32))
    if fc_w.shape[0] != len(rel2id):
        raise ValueError(f"fc_w has {fc_w.shape[0]} relations but rel2id "
                         f"has {len(rel2id)}")

    if "bert" in name:
        vocab = word2id or fixtures.bert_vocab()
        entity_repr = "ent_w" in enc_w
        enc = BertSentenceEncoder(
            vocab, enc_w, max_length=enc_w["pos_emb"].shape[0],
            hidden_size=enc_w["word_emb"].shape[1],
            n_layers=len(enc_w["layers"]), n_heads=n_heads,
            entity_repr=entity_repr)
    else:
        word2id = word2id or fixtures.default_word2id()
        max_length = enc_w["pos1_emb"].shape[0] // 2
        if "lstm_w_hh" in enc_w:
            enc = LstmSentenceEncoder(word2id, enc_w, max_length=max_length,
                                      hidden_size=enc_w["lstm_w_hh"].shape[1])
        elif "rnn_w_hh" in enc_w:
            enc = RnnSentenceEncoder(word2id, enc_w, max_length=max_length,
                                     hidden_size=enc_w["rnn_w_hh"].shape[1])
        else:
            cls = PcnnSentenceEncoder if "pcnn" in name \
                else CnnSentenceEncoder
            enc = cls(word2id, enc_w, max_length=max_length,
                      hidden_size=enc_w["conv_w"].shape[0])
        n_vocab = enc_w["word_emb"].shape[0]
        if len(enc.token2id) != n_vocab:
            raise ValueError(
                f"word_emb has {n_vocab} rows but the vocabulary resolves "
                f"to {len(enc.token2id)} tokens (incl. [UNK]/[PAD]) — pass "
                f"the checkpoint's own word2id")
    if fc_w.shape[1] != enc.hidden_size:
        raise ValueError(f"fc_w expects {fc_w.shape[1]}-d representations "
                         f"but the encoder produces {enc.hidden_size}-d")

    head_cls = SigmoidHead if "sigmoid" in name else SoftmaxHead
    head = head_cls(fc_w, fc_b, rel2id)
    aggregator = next((a for a in ("att", "avg", "one")
                       if name.endswith("_" + a)), None)
    diag = None
    if aggregator == "att":
        diag = flat.get("diag", np.ones(enc.hidden_size, dtype=np.float32))

    model = NREModel(name, enc, head, aggregator=aggregator, diag=diag)
    model.model_hash = _weights_hash(
        {"enc": enc.w, "fc_w": fc_w, "fc_b": fc_b})
    return model
