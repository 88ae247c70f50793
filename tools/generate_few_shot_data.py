#!/usr/bin/env python
"""Few-shot fold generators (reference: datasets/generate_few_shot_data*.py):
pre-generate ``{way}way_{shot}shot/{fold}.pkl`` files from ModelNet or
ScanObjectNN so few-shot runs are reproducible across methods.

Each pkl holds {'train': [(points, label), ...], 'test': [...]} with `way`
sampled classes, `shot` train samples and 20 test samples per class.
"""
from __future__ import annotations

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def generate(dataset_train, dataset_test, out_root: str, ways, shots,
             folds: int = 10, test_per_class: int = 20, seed: int = 0):
    by_class_train, by_class_test = {}, {}
    for ds, store in ((dataset_train, by_class_train),
                      (dataset_test, by_class_test)):
        for i in range(len(ds)):
            item = ds[i]
            store.setdefault(int(item["label"]), []).append(
                np.asarray(item["points"], np.float32))
    classes = sorted(by_class_train)
    for way in ways:
        for shot in shots:
            out_dir = os.path.join(out_root, f"{way}way_{shot}shot")
            os.makedirs(out_dir, exist_ok=True)
            for fold in range(folds):
                rng = np.random.default_rng(seed * 131071 + way * 1009 +
                                            shot * 101 + fold)
                chosen = rng.choice(classes, way, replace=False)
                train, test = [], []
                for new_label, c in enumerate(chosen):
                    tr = by_class_train[int(c)]
                    te = by_class_test.get(int(c))
                    tr_idx = rng.choice(len(tr), shot, replace=len(tr) < shot)
                    train += [(tr[j], new_label) for j in tr_idx]
                    if te is None:
                        # no test samples for this class: draw the fold's
                        # test pool from the train samples NOT used as
                        # shots — silently reusing the shot pool would
                        # leak identical clouds into both splits
                        rest = [j for j in range(len(tr))
                                if j not in set(tr_idx.tolist())]
                        if not rest:
                            raise ValueError(
                                f"class {c} has no test split and no "
                                f"train samples beyond the {shot} shots - "
                                "cannot build a leak-free fold")
                        te = [tr[j] for j in rest]
                    te_idx = rng.choice(len(te), min(test_per_class, len(te)),
                                        replace=False)
                    test += [(te[j], new_label) for j in te_idx]
                with open(os.path.join(out_dir, f"{fold}.pkl"), "wb") as f:
                    pickle.dump({"train": train, "test": test}, f)
            print(f"wrote {way}way_{shot}shot x{folds} folds")


def main():
    from point_dae_tpu.data.datasets import DATASETS

    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="ModelNet",
                   choices=["ModelNet", "ScanObjectNN", "ScanObjectNN_hardest",
                            "Synthetic"])
    p.add_argument("--data_path", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--ways", type=int, nargs="+", default=[5, 10])
    p.add_argument("--shots", type=int, nargs="+", default=[10, 20])
    p.add_argument("--folds", type=int, default=10)
    args = p.parse_args()

    cls = DATASETS.get(args.dataset)
    train = cls({"DATA_PATH": args.data_path, "ROOT": args.data_path,
                 "subset": "train"})
    test = cls({"DATA_PATH": args.data_path, "ROOT": args.data_path,
                "subset": "test"})
    generate(train, test, args.out, args.ways, args.shots, args.folds)


if __name__ == "__main__":
    main()
