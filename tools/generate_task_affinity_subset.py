#!/usr/bin/env python
"""Category-balanced ShapeNet-55 subset lists for the task-affinity probe.

Reference: datasets/generate_ShapeNet55DatasetClass_for_task_affinity.py
:46-113 — from the full ShapeNet-55 ``train.txt``/``test.txt`` file lists,
randomly keep at most 50 samples per category for train and 100 per
category for test (a small balanced train set, a large eval set), writing
``{out}/{split}.txt`` in the same ``taxonomy-model.npy`` line format the
ShapeNet/ShapeNetClass loaders read.

Unlike the reference (module-level ``random`` with no seed), sampling is
seeded for reproducible splits; pass --seed to vary.
"""
import argparse
import os
import random


def generate_subset(list_dir: str, out_dir: str, per_cat_train: int = 50,
                    per_cat_test: int = 100, seed: int = 0) -> dict:
    """Write balanced {out_dir}/{train,test}.txt; returns kept counts."""
    rng = random.Random(seed)
    os.makedirs(out_dir, exist_ok=True)
    kept = {}
    for subset, cap in (("train", per_cat_train), ("test", per_cat_test)):
        src = os.path.join(list_dir, f"{subset}.txt")
        by_cat = {}
        with open(src) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                # 'taxonomy-model.npy' (model ids never contain '-')
                taxonomy, _, rest = line.partition("-")
                model = rest.split(".")[0]
                by_cat.setdefault(taxonomy, []).append(model)
        n = 0
        with open(os.path.join(out_dir, f"{subset}.txt"), "w") as f:
            for taxonomy in by_cat:
                models = by_cat[taxonomy]
                if len(models) > cap:
                    models = rng.sample(models, cap)
                for model in models:
                    f.write(f"{taxonomy}-{model}.npy\n")
                n += len(models)
        kept[subset] = n
    return kept


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Balanced ShapeNet-55 subset for task affinity "
                    "(generate_ShapeNet55DatasetClass_for_task_affinity.py "
                    "role)")
    p.add_argument("--list_dir", required=True,
                   help="dir holding the full train.txt/test.txt "
                        "(e.g. data/ShapeNet55-34/ShapeNet-55)")
    p.add_argument("--out", required=True,
                   help="output dir (e.g. .../ShapeNet-55-subset-task-affinity)")
    p.add_argument("--per_cat_train", type=int, default=50)
    p.add_argument("--per_cat_test", type=int, default=100)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    kept = generate_subset(args.list_dir, args.out, args.per_cat_train,
                           args.per_cat_test, args.seed)
    print(f"wrote {kept['train']} train / {kept['test']} test lines "
          f"under {args.out}")


if __name__ == "__main__":
    main()
