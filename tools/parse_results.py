#!/usr/bin/env python
"""Log-scraping results aggregator (role of parse_test_res.py in the
reference): scans experiment logs for the '[Validation] EPOCH:',
'[TEST] acc = ', '[Validation_vote]' and 'Best inctance avg mIOU is:' lines
(the same log-line API, SURVEY.md §5) and reports mean/std (or 95% CI) over
seed directories. Modes: --multi-exp (aggregate over subdirectories),
--ci95, --few-shot (group by way/shot in the path), --taskaffinity.
"""
from __future__ import annotations

import argparse
import math
import os
import re
from collections import defaultdict

PATTERNS = {
    "val_acc": re.compile(r"\[Validation\] EPOCH: \d+\s+acc = ([\d.]+)"),
    "vote_acc": re.compile(r"\[Validation_vote\].*?vote_acc = ([\d.]+)"),
    "test_acc": re.compile(r"\[TEST\] acc = ([\d.]+)"),
    "miou": re.compile(r"Best inctance avg mIOU is: ([\d.]+)"),
    "affinity": re.compile(r"\[TaskAffinity\] test CE = ([\d.]+)"),
    "svm": re.compile(r"\[SVM\] best acc = ([\d.]+)"),
}


def best_from_log(path: str, mode: str) -> float | None:
    keys = {"acc": ("vote_acc", "val_acc", "test_acc"),
            "miou": ("miou",),
            "taskaffinity": ("affinity",),
            "svm": ("svm",)}[mode]
    values = []
    with open(path, errors="ignore") as f:
        text = f.read()
    for k in keys:
        values += [float(v) for v in PATTERNS[k].findall(text)]
        if values:
            break
    if not values:
        return None
    return min(values) if mode == "taskaffinity" else max(values)


def collect(directory: str, mode: str):
    results = []
    for root, _, files in os.walk(directory):
        for fn in files:
            if fn.endswith(".log"):
                v = best_from_log(os.path.join(root, fn), mode)
                if v is not None:
                    results.append((root, v))
    return results


def summarize(values, ci95=False):
    n = len(values)
    mean = sum(values) / n
    std = math.sqrt(sum((v - mean) ** 2 for v in values) / max(n - 1, 1))
    if ci95:
        half = 1.96 * std / math.sqrt(n)
        return f"{mean:.2f} +- {half:.2f} (95% CI, n={n})"
    return f"{mean:.2f} +- {std:.2f} (n={n})"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("directory")
    p.add_argument("--mode", choices=["acc", "miou", "taskaffinity", "svm"],
                   default="acc")
    p.add_argument("--multi-exp", action="store_true",
                   help="aggregate each subdirectory separately")
    p.add_argument("--ci95", action="store_true")
    p.add_argument("--few-shot", action="store_true",
                   help="group results by way/shot parsed from paths")
    args = p.parse_args()

    results = collect(args.directory, args.mode)
    if not results:
        print("no results found")
        return
    if args.few_shot:
        groups = defaultdict(list)
        pat = re.compile(r"(\d+)way[_-](\d+)shot")
        for path, v in results:
            m = pat.search(path)
            key = f"{m.group(1)}way_{m.group(2)}shot" if m else "unknown"
            groups[key].append(v)
        for key in sorted(groups):
            print(f"{key}: {summarize(groups[key], args.ci95)}")
    elif args.multi_exp:
        groups = defaultdict(list)
        for path, v in results:
            rel = os.path.relpath(path, args.directory)
            groups[rel.split(os.sep)[0]].append(v)
        for key in sorted(groups):
            print(f"{key}: {summarize(groups[key], args.ci95)}")
    else:
        for path, v in sorted(results):
            print(f"{path}: {v:.2f}")
        print(f"ALL: {summarize([v for _, v in results], args.ci95)}")


if __name__ == "__main__":
    main()
