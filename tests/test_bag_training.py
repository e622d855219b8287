"""Bag-attention training (L2/G5): gradient check + loss descent."""

import numpy as np
import pandas as pd
import pytest

from opennre_ray import get_model
from opennre_ray.training import BagAttentionTrainer, SgdOptimizer, fix_seed, train_bag_re


def _bag_batch(model):
    texts = ["the spark table join was fast", "a spark table join is fast",
             "slow hash stream window merge", "data batch merge sort key"]
    h = np.array([[4, 9], [2, 7], [5, 9], [0, 4]])
    t = np.array([[16, 20], [14, 18], [10, 16], [11, 16]])
    enc = model.encoder.encode_batch(texts, h, t)
    scopes = [(0, 2), (2, 4)]          # two bags of two instances
    labels = np.array([1, 2])
    return enc, scopes, labels


def test_bag_gradient_check():
    fix_seed(0)
    model = get_model("nyt10_pcnn_att", rel2id=None)
    # use the CNN variant for the trainer (shared conv backward)
    model = get_model("wiki80_cnn_softmax")
    model.diag = np.ones(model.encoder.hidden_size, np.float32)
    trainer = BagAttentionTrainer(model, optimizer=SgdOptimizer(lr=0.0))
    enc, scopes, labels = _bag_batch(model)

    captured = {}
    trainer.opt.step = lambda params, grads: captured.update(grads)
    trainer.train_step_bags(enc, scopes, labels)

    def num_grad(param, idx, eps=1e-3):
        p = trainer.params[param]
        orig = p[idx]
        p[idx] = orig + eps
        lp = trainer.bag_loss(enc, scopes, labels)
        p[idx] = orig - eps
        lm = trainer.bag_loss(enc, scopes, labels)
        p[idx] = orig
        return (lp - lm) / (2 * eps)

    checks = [("fc_w", (1, 5)), ("fc_w", (3, 7)), ("fc_b", (2,)),
              ("diag", (11,)), ("conv_w", (9, 20, 1)),
              ("word_emb", (int(enc["token"][0][1]), 4))]
    for name, idx in checks:
        num = num_grad(name, idx)
        ana = captured[name][idx]
        assert abs(num - ana) < 5e-3 * max(1.0, abs(num)), (name, num, ana)


def test_bag_training_descends_and_memorizes():
    fix_seed(0)
    model = get_model("wiki80_cnn_softmax")
    model.diag = np.ones(model.encoder.hidden_size, np.float32)
    trainer = BagAttentionTrainer(model, optimizer=SgdOptimizer(lr=0.3,
                                                                weight_decay=0))
    enc, scopes, labels = _bag_batch(model)
    losses = [trainer.train_step_bags(enc, scopes, labels)[0]
              for _ in range(40)]
    assert losses[-1] < losses[0] * 0.2
    # the trained weights drive the EVAL bag aggregator to the same labels
    from opennre_ray.models import bag_attention_eval
    rep = model.encoder(enc)
    for (s, e), label in zip(scopes, labels):
        scores = bag_attention_eval(rep[s:e], model.head.fc_w,
                                    model.head.fc_b, trainer.params["diag"])
        assert scores.argmax() == label


def test_pcnn_trainer_gradient_check():
    from opennre_ray.training import PcnnSoftmaxTrainer

    fix_seed(3)
    model = get_model("wiki80_pcnn_softmax")
    trainer = PcnnSoftmaxTrainer(model, optimizer=SgdOptimizer(lr=0.0))
    texts = ["the spark table join was fast", "slow hash stream window merge"]
    h = np.array([[4, 9], [5, 9]])
    t = np.array([[16, 20], [10, 16]])
    enc = model.encoder.encode_batch(texts, h, t)
    labels = np.array([1, 2])

    captured = {}
    trainer.opt.step = lambda params, grads: captured.update(grads)
    trainer.train_step(enc, labels)
    for name, idx in [("fc_w", (1, 100)), ("conv_w", (5, 10, 1)),
                      ("conv_b", (3,)),
                      ("word_emb", (int(enc["token"][0][1]), 2))]:
        num = trainer.grads_numerical(enc, labels, name, idx)
        ana = captured[name][idx]
        assert abs(num - ana) < 5e-3 * max(1.0, abs(num)), (name, num, ana)


def test_pcnn_bag_attention_trainer_descends():
    from opennre_ray.models import bag_attention_eval
    from opennre_ray.training import PcnnBagAttentionTrainer

    fix_seed(4)
    model = get_model("wiki80_pcnn_softmax")
    model.diag = np.ones(model.encoder.hidden_size, np.float32)
    trainer = PcnnBagAttentionTrainer(model, optimizer=SgdOptimizer(
        lr=0.3, weight_decay=0))
    texts = ["the spark table join was fast", "a spark table join is fast",
             "slow hash stream window merge", "data batch merge sort key"]
    h = np.array([[4, 9], [2, 7], [5, 9], [0, 4]])
    t = np.array([[16, 20], [14, 18], [10, 16], [11, 16]])
    enc = model.encoder.encode_batch(texts, h, t)
    scopes = [(0, 2), (2, 4)]
    labels = np.array([1, 2])
    losses = [trainer.train_step_bags(enc, scopes, labels)[0]
              for _ in range(40)]
    assert losses[-1] < losses[0] * 0.25
    rep = model.encoder(enc)
    for (s, e), label in zip(scopes, labels):
        scores = bag_attention_eval(rep[s:e], model.head.fc_w,
                                    model.head.fc_b, trainer.params["diag"])
        assert scores.argmax() == label


def test_multilabel_trainer_descends_and_scores():
    from opennre_ray.pipelines.evalmetrics import multilabel_eval
    from opennre_ray.training import MultiLabelTrainer

    fix_seed(2)
    model = get_model("wiki80_cnn_sigmoid")
    trainer = MultiLabelTrainer(model, optimizer=SgdOptimizer(lr=0.5,
                                                              weight_decay=0))
    enc, _, _ = _bag_batch(model)
    n_rel = len(model.rel2id)
    labels = np.zeros((4, n_rel), dtype=np.int64)
    labels[0, 1] = labels[1, 1] = 1
    labels[2, 2] = 1
    labels[3, 3] = labels[3, 4] = 1      # genuinely multi-label row
    losses = []
    for _ in range(60):
        loss, acc = trainer.train_step_multilabel(enc, labels)
        losses.append(loss)
    assert losses[-1] < losses[0] * 0.2
    # eval path: sigmoid head scores reproduce the memorized label matrix
    scores = model.head.scores(model.encoder(enc))
    m = multilabel_eval(scores, labels, model.rel2id)
    assert m["acc"] == 1.0 and m["micro_f1_05"] == 1.0


def test_train_bag_re_loop():
    fix_seed(1)
    rows = []
    data = [("the spark table join was fast", 4, 9, 16, 20, "E1", "E2", "father"),
            ("a spark table join is fast", 2, 7, 14, 18, "E1", "E2", "father"),
            ("slow hash stream window merge", 5, 9, 10, 16, "E3", "E4", "country"),
            ("data batch merge sort key", 0, 4, 11, 16, "E5", "E6", "NA")]
    for text, hs, he, ts, te, hid, tid, rel in data * 4:
        rows.append({"text": text, "h_start": hs, "h_end": he, "t_start": ts,
                     "t_end": te, "h_id": hid, "t_id": tid, "relation": rel})
    df = pd.DataFrame(rows)
    model = get_model("wiki80_cnn_softmax")
    model.diag = np.ones(model.encoder.hidden_size, np.float32)
    hist = train_bag_re(model, df, epochs=3, lr=0.2, use_class_weights=True)
    assert len(hist) == 3
    assert hist[-1]["loss"] < hist[0]["loss"]


def test_train_bag_re_selects_pcnn_trainer():
    """The reference's recommended pcnn+att config must train (the CNN
    trainer would shape-mismatch on the (N, 3H) head)."""
    fix_seed(5)
    rows = []
    for text, hs, he, ts, te, hid, tid, rel in [
            ("the spark table join was fast", 4, 9, 16, 20, "E1", "E2",
             "father"),
            ("slow hash stream window merge", 5, 9, 10, 16, "E3", "E4",
             "country")] * 3:
        rows.append({"text": text, "h_start": hs, "h_end": he, "t_start": ts,
                     "t_end": te, "h_id": hid, "t_id": tid, "relation": rel})
    model = get_model("nyt10_pcnn_att")
    hist = train_bag_re(model, pd.DataFrame(rows), epochs=2, lr=0.2,
                        bag_size=2)
    assert len(hist) == 2 and hist[-1]["loss"] < hist[0]["loss"]


def test_bag_seed_is_content_stable():
    """Seed must not depend on Python's per-process salted hash()."""
    import subprocess
    import sys

    code = ("from opennre_ray.pipelines.bag import bag_seed;"
            "print(bag_seed('Q1', 'Q2'))")
    outs = {subprocess.run([sys.executable, "-c", code], cwd="/root/repo",
                           capture_output=True, text=True).stdout.strip()
            for _ in range(2)}
    assert len(outs) == 1 and outs.pop().isdigit()
