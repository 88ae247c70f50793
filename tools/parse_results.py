#!/usr/bin/env python
"""Log-scraping results aggregator (role of parse_test_res.py AND
parse_acc_affinity.py in the reference): scans experiment logs for the
'[Validation] EPOCH:', '[TEST] acc = ', '[Validation_vote]',
'Best inctance avg mIOU is:' and '[Validation] Acc: ... loss = ' lines
(the same log-line API, SURVEY.md §5) and reports
'max; avg +- std' (or 95% CI) over seed directories.

Modes: --multi-exp (aggregate over subdirectories, with
--name_required/--name_forbidded filters like parse_acc_affinity.py),
--ci95, --few-shot (group by way/shot read from the logged
'args.way :'/'args.shot :' lines, falling back to the path), --mode
taskaffinity (min loss per log), and --matrix (pivot multi-exp directory
results into the pretrain-corruption x downstream-task affinity table,
the aggregation parse_acc_affinity.py:232-283 builds by repeated
filtered runs).
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
    # engine line: "[TEST_VOTE] iter N: acc = X best = Y" (optional _acc/
    # " acc" spellings tolerated for older logs)
    "test_vote": re.compile(r"\[TEST_VOTE\].*best(?:_acc| acc)? = ([\d.]+)"),
    "miou": re.compile(r"Best inctance avg mIOU is: ([\d.]+)"),
    "affinity": re.compile(r"\[TaskAffinity\] test CE = ([\d.]+)"),
    # reference task-affinity line (runner_finetune.py:1269)
    "affinity_ref": re.compile(r"\[Validation\] Acc: [\d.]+\s+loss = ([\d.]+)"),
    "svm": re.compile(r"\[SVM\] best acc = ([\d.]+)"),
    "way": re.compile(r"args\.way : (\d+)"),
    "shot": re.compile(r"args\.shot : (\d+)"),
}


def best_from_log(path: str, mode: str) -> float | None:
    # vote results outrank their plain counterparts: a test log holds both
    # [TEST] and [TEST_VOTE] lines, and stopping at the first matching key
    # would report the lower non-vote number
    keys = {"acc": ("vote_acc", "test_vote", "val_acc", "test_acc"),
            "miou": ("miou",),
            "taskaffinity": ("affinity", "affinity_ref"),
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


def way_shot_from_log(path: str) -> str | None:
    """Few-shot grouping key from the logged args lines (the reference's
    parse_function_fewshot reads 'args.way :'/'args.shot :',
    parse_acc_affinity.py:152-183)."""
    with open(path, errors="ignore") as f:
        text = f.read()
    w = PATTERNS["way"].search(text)
    s = PATTERNS["shot"].search(text)
    if w and s and w.group(1) != "-1":
        return f"{w.group(1)}way_{s.group(1)}shot"
    return None


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
    """'max; avg +- std' like parse_acc_affinity.py:118-121."""
    n = len(values)
    mean = sum(values) / n
    std = math.sqrt(sum((v - mean) ** 2 for v in values) / max(n - 1, 1))
    if ci95:
        std = 1.96 * std / math.sqrt(n)
    return (f"{max(values):.3f};  {mean:.3f} +- {std:.3f} "
            f"({'95% CI' if ci95 else 'std'}, n={n})")


def name_filter(name: str, required, forbidden) -> bool:
    """parse_acc_affinity.py:252-266 directory filters."""
    for req in required or ():
        if req not in name:
            return False
    for forb in forbidden or ():
        if forb in name:
            return False
    return True


def print_matrix(cells, row_names, col_names):
    width = max([len(r) for r in row_names] + [8])
    print("\t".join([" " * width] + list(col_names)))
    for r in row_names:
        row = [f"{r:<{width}}"]
        for c in col_names:
            v = cells.get((r, c))
            row.append(f"{sum(v) / len(v):.3f}" if v else "-")
        print("\t".join(row))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("directory")
    p.add_argument("--mode", choices=["acc", "miou", "taskaffinity", "svm"],
                   default="acc")
    p.add_argument("--multi-exp", action="store_true",
                   help="aggregate each subdirectory separately")
    p.add_argument("--ci95", action="store_true")
    p.add_argument("--few-shot", action="store_true",
                   help="group results by way/shot (from logged args lines, "
                        "falling back to paths)")
    p.add_argument("--name_required", nargs="+", default=[],
                   help="only aggregate dirs containing ALL these substrings")
    p.add_argument("--name_forbidded", nargs="+", default=[],
                   help="skip dirs containing ANY of these substrings")
    p.add_argument("--matrix", action="store_true",
                   help="pivot multi-exp results into a (pretrain x task) "
                        "affinity matrix via --row-pattern/--col-pattern")
    p.add_argument("--row-pattern",
                   default=r"pretrain_PointCAE_(?P<key>[A-Za-z0-9_]+?)(?:Point|$)",
                   help="regex with a 'key' group applied to the directory "
                        "name for matrix rows (default: corruption tag)")
    p.add_argument("--col-pattern",
                   default=r"(?P<key>scan_hardest|scan_objbg|modelnet|"
                           r"fewshot|svm|taskaffinity|partseg)",
                   help="regex with a 'key' group for matrix columns")
    args = p.parse_args()

    results = collect(args.directory, args.mode)
    results = [(path, v) for path, v in results
               if name_filter(os.path.relpath(path, args.directory),
                              args.name_required, args.name_forbidded)]
    if not results:
        print("no results found")
        return

    if args.matrix:
        rp, cp = re.compile(args.row_pattern), re.compile(args.col_pattern)
        cells, rows, cols = defaultdict(list), [], []
        for path, v in results:
            rel = os.path.relpath(path, args.directory)
            rm, cm = rp.search(rel), cp.search(rel)
            r = rm.group("key") if rm else "unknown"
            c = cm.group("key") if cm else "unknown"
            cells[(r, c)].append(v)
            if r not in rows:
                rows.append(r)
            if c not in cols:
                cols.append(c)
        print_matrix(cells, sorted(rows), sorted(cols))
        return

    if args.few_shot:
        groups = defaultdict(list)
        path_pat = re.compile(r"(\d+)way[_-](\d+)shot")
        seen_logs = {}
        for root, _, files in os.walk(args.directory):
            for fn in files:
                if fn.endswith(".log"):
                    seen_logs[root] = way_shot_from_log(
                        os.path.join(root, fn)) or seen_logs.get(root)
        for path, v in results:
            key = seen_logs.get(path)
            if key is None:
                m = path_pat.search(path)
                key = f"{m.group(1)}way_{m.group(2)}shot" if m else "unknown"
            groups[key].append(v)
        for key in sorted(groups):
            print(f"* {key}: {summarize(groups[key], args.ci95)}")
    elif args.multi_exp:
        groups = defaultdict(list)
        for path, v in results:
            rel = os.path.relpath(path, args.directory)
            groups[rel.split(os.sep)[0]].append(v)
        for key in sorted(groups):
            print(f"* {key}: {summarize(groups[key], args.ci95)}")
    else:
        for path, v in sorted(results):
            print(f"{path}: {v:.3f}")
        print(f"* ALL: {summarize([v for _, v in results], args.ci95)}")


if __name__ == "__main__":
    main()
