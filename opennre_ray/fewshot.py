"""Few-shot relation extraction + the NER user-extension surface.

The reference *declares* both hooks but implements neither:
``FewShotRE.infer(support, query)`` (``model/base_model.py:37-57``) and
``NER.ner(sentence)`` (``:59-71``). This engine ships working versions:

- ``FewShotProto`` — prototypical-network-style nearest-centroid classifier
  (Snell et al. 2017 semantics) over any sentence encoder's representations;
  support set is tiny (N-way K-shot) → broadcast, queries stream through
  ``map_batches``.
- ``GazetteerNER`` — mention detection behind the exact ``[{name, pos}]``
  contract of the reference's NER hook, backed by the alias-table matcher
  the KG pipeline uses.
"""

from __future__ import annotations

import numpy as np

from .registry import get_model
from .stages.ner import AliasMatcher, normalize_surface
from .fixtures import default_alias_table


def proto_scores(rep: np.ndarray, prototypes: np.ndarray) -> np.ndarray:
    """Softmax over negative squared distances to class prototypes.

    Single definition shared by the local ``scores`` path and the
    distributed ``classify_dataset`` stage so the two can never drift.
    """
    d2 = ((rep[:, None, :] - prototypes[None, :, :]) ** 2).sum(-1)
    z = -d2
    z -= z.max(axis=1, keepdims=True)
    e = np.exp(z)
    return e / e.sum(axis=1, keepdims=True)


class FewShotProto:
    """N-way K-shot nearest-centroid relation classifier.

    ``support``: list of (item_dict, relation_name). Class prototype =
    mean encoder representation of its support instances; query score =
    softmax over negative squared euclidean distances to prototypes.
    """

    def __init__(self, model_name: str = "wiki80_cnn_softmax"):
        self.model = get_model(model_name)
        self.prototypes: np.ndarray | None = None
        self.classes: list[str] = []

    def _encode(self, items):
        texts = [it.get("text") for it in items]
        h = np.array([list(it["h"]["pos"]) for it in items])
        t = np.array([list(it["t"]["pos"]) for it in items])
        enc = self.model.encoder.encode_batch(texts, h, t)
        return self.model.encoder(enc)

    def fit(self, support: list[tuple[dict, str]]):
        by_class: dict[str, list[dict]] = {}
        for item, rel in support:
            by_class.setdefault(rel, []).append(item)
        self.classes = sorted(by_class)
        protos = [self._encode(by_class[c]).mean(axis=0)
                  for c in self.classes]
        self.prototypes = np.stack(protos)
        return self

    def scores(self, rep: np.ndarray) -> np.ndarray:
        """(B, H) reps → (B, N) softmax over -squared-distance."""
        return proto_scores(rep, self.prototypes)

    def infer(self, query: dict) -> tuple[str, float]:
        """Reference FewShotRE.infer contract: one query → (relation, score)."""
        rep = self._encode([query])
        probs = self.scores(rep)[0]
        best = int(probs.argmax())
        return self.classes[best], float(probs[best])

    def classify_dataset(self, instances_ds):
        """Streaming classification of an instance Dataset (map_batches).

        Prototypes are constructor state in each worker's cached stage —
        the broadcast-small-side pattern.
        """
        import pyarrow as pa

        proto = self.prototypes
        classes = list(self.classes)
        model_name = self.model.name

        def classify(batch: pa.Table) -> pa.Table:
            from .stages.score import cached

            model = cached(("fewshot_enc", model_name),
                           lambda: get_model(model_name))
            texts = batch.column("text").to_pylist()
            h = np.stack([batch.column("h_start").to_numpy(zero_copy_only=False),
                          batch.column("h_end").to_numpy(zero_copy_only=False)], 1)
            t = np.stack([batch.column("t_start").to_numpy(zero_copy_only=False),
                          batch.column("t_end").to_numpy(zero_copy_only=False)], 1)
            rep = model.encoder(model.encoder.encode_batch(texts, h, t))
            probs = proto_scores(rep, proto)
            pred = probs.argmax(axis=1)
            return (batch
                    .append_column("pred_rel", pa.array(
                        [classes[int(p)] for p in pred], pa.string()))
                    .append_column("score", pa.array(
                        probs[np.arange(len(pred)), pred].astype(np.float32))))

        return instances_ds.map_batches(classify, batch_format="pyarrow")


class GazetteerNER:
    """The reference's NER hook (``base_model.py:59-71``), implemented.

    ``ner(sentence)`` → list of ``{'name': surface, 'pos': [start, end],
    'id': entity_id}`` — the same mention contract the KG pipeline's
    SentenceMentions stage emits.
    """

    def __init__(self, alias_table: dict[str, str] | None = None):
        self.matcher = AliasMatcher(alias_table or default_alias_table())

    def ner(self, sentence: str, is_token: bool = False):
        if is_token:
            sentence = " ".join(sentence)
        return [{"name": surface, "pos": [start, end], "id": eid}
                for start, end, surface, eid in self.matcher.find(sentence)]
