"""CLI entry mirroring the reference's supervised training scripts
(``example/train_supervised_cnn.py`` argparse surface) on the Ray-Data
engine: JSONL instances stream through ``read_instances_jsonl`` and the
numpy trainer; the best checkpoint by ``--metric`` lands at ``--ckpt``.

The driver (this script) owns the Ray session; the library never inits.

Examples:
    python train_job.py --encoder cnn --train_file train.jsonl \
        --val_file val.jsonl --rel2id_file rel2id.json \
        --ckpt /tmp/my_cnn --max_epoch 3
    python train_job.py --only_test --ckpt /tmp/my_cnn \
        --test_file test.jsonl --rel2id_file rel2id.json --encoder cnn
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def _eval(model, ds, batch_size):
    import numpy as np

    from opennre_ray.pipelines.evalmetrics import sentence_eval

    golds, preds = [], []
    for batch in ds.iter_batches(batch_size=batch_size,
                                 batch_format="numpy"):
        h = np.stack([batch["h_start"], batch["h_end"]], axis=1)
        t = np.stack([batch["t_start"], batch["t_end"]], axis=1)
        enc = model.encoder.encode_batch(list(batch["text"]), h, t)
        rep = model.encoder(enc)
        pred, _ = model.head.infer_batch(rep)
        golds.extend(model.rel2id[r] for r in batch["relation"])
        preds.extend(pred.tolist())
    return sentence_eval(golds, preds, model.rel2id)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="", help="checkpoint path (.npz)")
    ap.add_argument("--only_test", action="store_true")
    ap.add_argument("--encoder", default="cnn",
                    choices=["cnn", "pcnn", "bert"])
    ap.add_argument("--mode", default="sentence",
                    choices=["sentence", "bag", "multilabel"],
                    help="bag = attention-aggregated bag RE "
                         "(mirrors example/train_bag_cnn.py); multilabel = "
                         "annotated multi-label eval "
                         "(mirrors example/test_multilabel_cnn.py)")
    ap.add_argument("--bag_size", default=0, type=int)
    ap.add_argument("--metric", default="micro_f1",
                    choices=["micro_f1", "acc"])
    ap.add_argument("--train_file", default="")
    ap.add_argument("--val_file", default="")
    ap.add_argument("--test_file", default="")
    ap.add_argument("--rel2id_file", required=True)
    ap.add_argument("--batch_size", default=64, type=int)
    ap.add_argument("--lr", default=0.1, type=float)
    ap.add_argument("--weight_decay", default=1e-5, type=float)
    ap.add_argument("--max_epoch", default=3, type=int)
    ap.add_argument("--seed", default=42, type=int)
    ap.add_argument("--num-cpus", default=8, type=int)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR",
                 log_to_driver=False)

    from opennre_ray.registry import get_model
    from opennre_ray.sources.instances import read_instances_jsonl
    from opennre_ray.training import (load_checkpoint, train_sentence_re)

    with open(args.rel2id_file) as fh:
        rel2id = json.load(fh)

    if args.encoder == "bert":
        # the numpy training loops and .npz checkpoints cover the conv
        # encoders; BERT is registry-weights inference/eval only
        if args.mode == "bag" or not (args.mode == "multilabel"
                                      or args.only_test):
            ap.error("--encoder bert supports --mode multilabel or "
                     "sentence-mode --only_test evaluation only")
        if args.ckpt:
            ap.error("--encoder bert cannot load conv .npz checkpoints; "
                     "evaluation uses the named registry weights")

    out: dict = {"encoder": args.encoder, "metric": args.metric,
                 "mode": args.mode}
    if args.mode == "bag":
        from opennre_ray.training import train_bag_re

        model = get_model(f"nyt10_{args.encoder}_att", rel2id=rel2id)
        df = read_instances_jsonl(args.train_file).to_pandas()
        history = train_bag_re(model, df, epochs=args.max_epoch,
                               bag_size=args.bag_size, lr=args.lr,
                               weight_decay=args.weight_decay,
                               seed=args.seed)
        out["final_train"] = {k: history[-1][k] for k in ("loss", "acc")}
        print(json.dumps(out))
        ray.shutdown()
        return

    if args.mode == "multilabel":
        if args.ckpt:
            ap.error("--mode multilabel evaluates the named registry "
                     "sigmoid model; custom checkpoints are not supported "
                     "on this path (train with --mode sentence and eval "
                     "via --only_test instead)")
        from opennre_ray.pipelines.evalmetrics import multilabel_eval
        from opennre_ray.sources.instances import label_matrix_from_instances
        from opennre_ray.stages.score import score_matrix_udf

        ds = read_instances_jsonl(args.test_file).map_batches(
            score_matrix_udf(f"wiki80_{args.encoder}_sigmoid",
                             rel2id=rel2id),
            batch_format="pyarrow")
        df = ds.to_pandas().sort_values("row_id").reset_index(drop=True)
        labels = label_matrix_from_instances(df, rel2id)
        scores = np.stack(df["rel_scores"].to_numpy()).astype(np.float64)
        out["multilabel"] = {
            k: float(v) for k, v in
            multilabel_eval(scores, labels, rel2id).items()
            if np.isscalar(v) or isinstance(v, float)}
        print(json.dumps(out))
        ray.shutdown()
        return

    model = get_model(f"wiki80_{args.encoder}_softmax", rel2id=rel2id)
    if not args.only_test:
        train_ds = read_instances_jsonl(args.train_file)
        val_ds = (read_instances_jsonl(args.val_file)
                  if args.val_file else None)
        history = train_sentence_re(
            model, train_ds, epochs=args.max_epoch,
            batch_size=args.batch_size, lr=args.lr,
            weight_decay=args.weight_decay, val_ds=val_ds,
            ckpt_path=args.ckpt or None, seed=args.seed,
            metric=args.metric)
        out["final_train"] = {k: history[-1][k] for k in ("loss", "acc")}
        if val_ds is not None:
            out["best_val"] = max(h["val"][args.metric] for h in history)
            if args.ckpt:
                # test with the BEST checkpoint (just saved), not the
                # final epoch's weights — the reference examples reload
                # the best ckpt before the test pass
                w = load_checkpoint(args.ckpt)
                model.encoder.load_weights(w["enc"])
                model.head.fc_w = np.asarray(w["fc_w"], dtype=np.float32)
                model.head.fc_b = np.asarray(w["fc_b"], dtype=np.float32)
    elif args.ckpt:
        w = load_checkpoint(args.ckpt)
        model.encoder.load_weights(w["enc"])   # re-derives the conv cache
        model.head.fc_w = np.asarray(w["fc_w"], dtype=np.float32)
        model.head.fc_b = np.asarray(w["fc_b"], dtype=np.float32)

    if args.test_file:
        out["test"] = _eval(model, read_instances_jsonl(args.test_file),
                            args.batch_size)

    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
