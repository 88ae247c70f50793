#!/usr/bin/env python
"""Paper-style result figures from experiment logs (role of the reference's
``plot.py``, the 1.7k-LoC figure generator, and
``plot_results_dataset_variants.py``).

Eight figure modes, all scraped from the same log-line formats that
``tools/parse_results.py`` consumes (the log formats are an API,
SURVEY.md §5):

  accuracy        — final/best accuracy per experiment directory, bar chart
                    (mean ± std across seed subdirs, like parse_test_res.py).
  corruption      — per-corruption OA heatmap (corruption x level) from the
                    harness's per-level dict lines (engine/robustness.py).
  curves          — validation-accuracy-vs-epoch training curves from
                    ``[Validation] EPOCH: <e> acc = ...`` lines.
  robustness_bars — per-corruption CE bars vs the DGCNN mCE=1 baseline
                    (plot.py's robustness figure family).
  fewshot         — way/shot grouped-bar grid (mean ± ci95), keys from the
                    logged ``args.way :``/``args.shot :`` lines.
  affinity_matrix — pretrain-corruption x downstream-task heatmap (the
                    parse_acc_affinity.py aggregation as a figure).
  ablation        — accuracy vs a swept hyper-parameter, one line figure
                    (plot.py's rotate_alpha / translate_tau / shear_eta /
                    scale blocks, plot.py:17-99); the swept value is parsed
                    from each experiment directory name (trailing number by
                    default, override with --param-re).
  dataset_variants— corruption x pose-variant grouped bars
                    (plot_results_dataset_variants.py:14-44): groups are
                    corruption recipes, series are Random-/SVD-/Manual-Pose
                    parsed from directory names.

Usage:
  python tools/plot_results.py accuracy   experiments/finetune_* -o acc.png
  python tools/plot_results.py corruption experiments/<exp> -o corr.png
  python tools/plot_results.py curves     experiments/pretrain_* -o curves.png

Matplotlib is optional at import time (headless Agg backend); figures are
PNG files, matching the reference's offline-analysis workflow.
"""
from __future__ import annotations

import argparse
import glob
import os
import re
import sys
from collections import defaultdict

import numpy as np

_VAL = re.compile(r"\[Validation\] EPOCH:\s*(\d+)\s+acc = ([0-9.]+)")
_TEST = re.compile(r"\[TEST\] acc = ([0-9.]+)")
# harness per-level line: {'acc': <v>, 'corruption': '<name>', 'level': <l>}
# (modelnetc_utils dict format, engine/robustness.py); the legacy
# '[Corruption] <name> level <l>: OA = <v>' form still parses
_CORR = re.compile(
    r"\{'acc': ([0-9.]+), 'corruption': '(\w+)', 'level': (\d+)\}")
_CORR_LEGACY = re.compile(r"\[Corruption\] (\w+) level (\d+): OA = ([0-9.]+)")


def _logs_under(path: str):
    return sorted(glob.glob(os.path.join(path, "**", "*.log"), recursive=True))


def _scan(path: str, regex):
    hits = []
    for log in _logs_under(path):
        with open(log, errors="replace") as f:
            for line in f:
                m = regex.search(line)
                if m:
                    hits.append(m.groups())
    return hits


def _best_acc(path: str) -> list:
    """Best accuracy per seed-run log under ``path`` — delegates to
    parse_results.best_from_log so the figure numbers and the text
    summaries can never drift (the log-line regexes are an API maintained
    in ONE place)."""
    try:
        from parse_results import best_from_log       # run as a script
    except ImportError:
        from tools.parse_results import best_from_log  # imported as module

    out = []
    for log in _logs_under(path):
        v = best_from_log(log, "acc")
        if v is not None:
            out.append(v)
    return out


def _fig():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def plot_accuracy(dirs, out):
    plt = _fig()
    names, means, stds = [], [], []
    for d in dirs:
        accs = _best_acc(d)
        if not accs:
            print(f"# no accuracy lines under {d}", file=sys.stderr)
            continue
        names.append(os.path.basename(os.path.normpath(d)))
        means.append(float(np.mean(accs)))
        stds.append(float(np.std(accs)))
    if not names:
        raise SystemExit("nothing to plot")
    fig, ax = plt.subplots(figsize=(max(6, 0.9 * len(names)), 4))
    x = np.arange(len(names))
    ax.bar(x, means, yerr=stds, capsize=3)
    ax.set_xticks(x)
    ax.set_xticklabels(names, rotation=30, ha="right", fontsize=8)
    ax.set_ylabel("accuracy")
    lo = min(m - s for m, s in zip(means, stds))
    ax.set_ylim(max(0.0, lo - 0.05), 1.0)
    for xi, m in zip(x, means):
        ax.text(xi, m, f"{m:.3f}", ha="center", va="bottom", fontsize=7)
    fig.tight_layout()
    fig.savefig(out, dpi=160)
    print(f"wrote {out} ({len(names)} experiments)")


def plot_corruption(dirs, out):
    plt = _fig()
    table = defaultdict(dict)
    for d in dirs:
        for oa, name, lv in _scan(d, _CORR):
            table[name][int(lv)] = float(oa)
        for name, lv, oa in _scan(d, _CORR_LEGACY):
            table[name][int(lv)] = float(oa)
    if not table:
        raise SystemExit("no [Corruption] lines found")
    names = sorted(table)
    levels = sorted({lv for r in table.values() for lv in r})
    mat = np.full((len(names), len(levels)), np.nan)
    for i, n in enumerate(names):
        for j, lv in enumerate(levels):
            if lv in table[n]:
                mat[i, j] = table[n][lv]
    fig, ax = plt.subplots(figsize=(1.2 * len(levels) + 3, 0.45 * len(names) + 2))
    im = ax.imshow(mat, aspect="auto", cmap="viridis", vmin=0, vmax=1)
    ax.set_xticks(range(len(levels)))
    ax.set_xticklabels([f"L{lv}" for lv in levels])
    ax.set_yticks(range(len(names)))
    ax.set_yticklabels(names, fontsize=8)
    for i in range(len(names)):
        for j in range(len(levels)):
            if np.isfinite(mat[i, j]):
                ax.text(j, i, f"{mat[i, j]:.2f}", ha="center", va="center",
                        fontsize=7,
                        color="white" if mat[i, j] < 0.6 else "black")
    ax.set_title("OA per corruption / level")
    fig.colorbar(im, ax=ax, shrink=0.8)
    fig.tight_layout()
    fig.savefig(out, dpi=160)
    print(f"wrote {out} ({len(names)} corruptions x {len(levels)} levels)")


def plot_curves(dirs, out):
    plt = _fig()
    fig, ax = plt.subplots(figsize=(7, 4.2))
    plotted = 0
    for d in dirs:
        hits = _scan(d, _VAL)
        if not hits:
            continue
        by_epoch = defaultdict(list)
        for e, a in hits:
            by_epoch[int(e)].append(float(a))
        xs = sorted(by_epoch)
        ys = [float(np.mean(by_epoch[e])) for e in xs]
        ax.plot(xs, ys, marker=".", markersize=3,
                label=os.path.basename(os.path.normpath(d)))
        plotted += 1
    if not plotted:
        raise SystemExit("no [Validation] lines found")
    ax.set_xlabel("epoch")
    ax.set_ylabel("validation acc")
    ax.legend(fontsize=7)
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(out, dpi=160)
    print(f"wrote {out} ({plotted} curves)")


_CE_LINE = re.compile(r"\{'CE': ([0-9.]+), 'OA': ([0-9.]+), "
                      r"'RCE': ([0-9.]+), 'corruption': '(\w+)'")
_WAY = re.compile(r"args\.way : (\d+)")
_SHOT = re.compile(r"args\.shot : (\d+)")


def plot_robustness_bars(dirs, out):
    """Per-corruption CE bars with the DGCNN mCE=1.0 baseline line (the
    reference plot.py's corruption-robustness figure family), scraped from
    the modelnetc-format dict lines the harness logs."""
    plt = _fig()
    ces = defaultdict(list)
    for d in dirs:
        for ce, oa, rce, name in _scan(d, _CE_LINE):
            ces[name].append(float(ce))
    if not ces:
        raise SystemExit("no corruption CE lines found")
    names = sorted(ces)
    means = [float(np.mean(ces[n])) for n in names]
    fig, ax = plt.subplots(figsize=(max(6, 0.9 * len(names)), 4))
    x = np.arange(len(names))
    ax.bar(x, means, color=["tab:green" if m < 1 else "tab:red"
                            for m in means])
    ax.axhline(1.0, color="k", linestyle="--", linewidth=1,
               label="DGCNN baseline (mCE=1)")
    ax.set_xticks(x)
    ax.set_xticklabels(names, rotation=30, ha="right", fontsize=8)
    ax.set_ylabel("CE (lower is better)")
    mce = float(np.mean(means))
    ax.set_title(f"ModelNet-C corruption errors  (mCE = {mce:.3f})")
    for xi, m in zip(x, means):
        ax.text(xi, m, f"{m:.3f}", ha="center", va="bottom", fontsize=7)
    ax.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(out, dpi=160)
    print(f"wrote {out} ({len(names)} corruptions, mCE={mce:.3f})")


def plot_fewshot(dirs, out):
    """Few-shot way/shot grid (mean +- ci95 per cell), grouped bars —
    the reference's few-shot table/figure, keys read from the logged
    'args.way :'/'args.shot :' lines."""
    plt = _fig()
    cells = defaultdict(list)
    for d in dirs:
        for log in _logs_under(d):
            with open(log, errors="replace") as f:
                text = f.read()
            w, s = _WAY.search(text), _SHOT.search(text)
            vals = [float(a) for _, a in _VAL.findall(text)] + \
                   [float(a) for a in _TEST.findall(text)]
            if w and s and w.group(1) != "-1" and vals:
                cells[(int(w.group(1)), int(s.group(1)))].append(max(vals))
    if not cells:
        raise SystemExit("no few-shot runs found (need args.way/shot lines)")
    ways = sorted({w for w, _ in cells})
    shots = sorted({s for _, s in cells})
    fig, ax = plt.subplots(figsize=(1.6 * len(ways) * len(shots) + 2, 4))
    width = 0.8 / max(len(shots), 1)
    for j, s in enumerate(shots):
        xs, ms, cis = [], [], []
        for i, w in enumerate(ways):
            v = cells.get((w, s))
            if v:
                xs.append(i + j * width)
                ms.append(float(np.mean(v)))
                cis.append(1.96 * float(np.std(v)) / max(len(v), 1) ** 0.5)
        ax.bar(xs, ms, width=width, yerr=cis, capsize=3, label=f"{s}-shot")
    ax.set_xticks([i + width * (len(shots) - 1) / 2 for i in range(len(ways))])
    ax.set_xticklabels([f"{w}-way" for w in ways])
    ax.set_ylabel("accuracy")
    ax.set_title("Few-shot classification (mean ± ci95)")
    ax.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(out, dpi=160)
    print(f"wrote {out} ({len(cells)} way/shot cells)")


def plot_affinity_matrix(dirs, out):
    """Pretrain-corruption x downstream-task heatmap (the
    parse_acc_affinity.py aggregation rendered as plot.py's affinity
    figure). Row/col keys parsed from directory names."""
    plt = _fig()
    rowp = re.compile(r"pretrain_PointCAE_([A-Za-z0-9_]+?)(?:Point|$)")
    colp = re.compile(r"(scan_hardest|scan_objbg|modelnet|fewshot|svm|"
                      r"taskaffinity|partseg)")
    cells = defaultdict(list)
    for d in dirs:
        name = os.path.basename(os.path.normpath(d))
        rm, cm = rowp.search(name), colp.search(name)
        accs = _best_acc(d)
        if accs:
            cells[(rm.group(1) if rm else "unknown",
                   cm.group(1) if cm else "unknown")].append(
                float(np.mean(accs)))
    if not cells:
        raise SystemExit("nothing to plot")
    rows = sorted({r for r, _ in cells})
    cols = sorted({c for _, c in cells})
    mat = np.full((len(rows), len(cols)), np.nan)
    for (r, c), v in cells.items():
        mat[rows.index(r), cols.index(c)] = float(np.mean(v))
    fig, ax = plt.subplots(figsize=(1.5 * len(cols) + 3,
                                    0.5 * len(rows) + 2))
    im = ax.imshow(mat, aspect="auto", cmap="viridis")
    ax.set_xticks(range(len(cols)))
    ax.set_xticklabels(cols, rotation=30, ha="right", fontsize=8)
    ax.set_yticks(range(len(rows)))
    ax.set_yticklabels(rows, fontsize=8)
    for i in range(len(rows)):
        for j in range(len(cols)):
            if np.isfinite(mat[i, j]):
                # black on the bright (high) end of viridis, white on the
                # dark end — CE values have arbitrary scale, so normalize
                lo, hi = np.nanmin(mat), np.nanmax(mat)
                frac = 0.5 if hi <= lo else (mat[i, j] - lo) / (hi - lo)
                ax.text(j, i, f"{mat[i, j]:.2f}", ha="center", va="center",
                        fontsize=7,
                        color="black" if frac > 0.6 else "white")
    ax.set_title("corruption x task affinity")
    fig.colorbar(im, ax=ax, shrink=0.8)
    fig.tight_layout()
    fig.savefig(out, dpi=160)
    print(f"wrote {out} ({len(rows)} corruptions x {len(cols)} tasks)")


def plot_ablation(dirs, out, param_re=r"([0-9]+(?:\.[0-9]+)?)/*$"):
    """Accuracy vs swept hyper-parameter, red line+markers like the
    reference's alpha/tau/eta ablation figures (plot.py:17-99). The swept
    value comes from each directory name; accuracy is the per-directory
    best (mean across seed logs)."""
    plt = _fig()
    pat = re.compile(param_re)
    pts = []
    for d in dirs:
        name = os.path.normpath(d)
        m = pat.search(os.path.basename(name))
        accs = _best_acc(d)
        if not m or not accs:
            print(f"# skipping {d} (param match: {bool(m)}, "
                  f"accs: {len(accs)})", file=sys.stderr)
            continue
        pts.append((float(m.group(1)), float(np.mean(accs))))
    if not pts:
        raise SystemExit("no (param, acc) points found")
    pts.sort()
    xs, ys = zip(*pts)
    fig, ax = plt.subplots(figsize=(7, 4.2))
    ax.plot(xs, ys, "ro-", linewidth=2, ms=8)
    ax.set_xlabel("swept parameter value")
    ax.set_ylabel("accuracy")
    for x, y in pts:
        ax.annotate(f"{y:.3f}", (x, y), textcoords="offset points",
                    xytext=(0, 6), ha="center", fontsize=7)
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(out, dpi=160)
    print(f"wrote {out} ({len(pts)} sweep points)")


# the 17 corruption recipes of the dataset-variants figure, longest-match
# first so e.g. 'affine_r3_dropout_local' resolves before 'affine_r3'
# (plot_results_dataset_variants.py:14-16)
_VARIANT_CORRUPTIONS = [
    "affine_r3_dropout_local", "affine_r3_dropout_patch", "affine_r3",
    "dropout_global", "dropout_local", "dropout_patch", "add_global",
    "add_local", "jitter", "shear", "rotate_z", "rotate", "reflection",
    "scale_nonorm", "scale", "translate", "density", "clean",
]
# patterns match the generated-config suffixes (gen_cfgs.py POSES):
# '_svd', '_random', default = as-authored/aligned (Manual). Regexes
# because experiment dirs append the model name after the stem
# (cli.py:create_experiment_dir) and the corruption 'random_add' must
# not read as Random-Pose.
_POSE_SERIES = [(r"_svd", "SVD-Pose"), (r"_random(?!_add)", "Random-Pose"),
                (r"", "Manual-Pose")]      # fallback last


def plot_dataset_variants(dirs, out):
    """Corruption x pose-variant grouped accuracy bars, the
    plot_results_dataset_variants.py figure: one bar group per corruption
    recipe, one series per dataset pose variant (Random/SVD/Manual),
    values scraped from logs instead of hard-coded."""
    plt = _fig()
    cells = defaultdict(list)
    for d in dirs:
        name = os.path.basename(os.path.normpath(d)).lower()
        corr = next((c for c in _VARIANT_CORRUPTIONS if c in name), "other")
        pose = next(lab for key, lab in _POSE_SERIES
                    if re.search(key, name))
        accs = _best_acc(d)
        if accs:
            cells[(corr, pose)].append(float(np.mean(accs)))
    if not cells:
        raise SystemExit("nothing to plot")
    corrs = [c for c in _VARIANT_CORRUPTIONS + ["other"]
             if any(k[0] == c for k in cells)]
    poses = [lab for _, lab in _POSE_SERIES
             if any(k[1] == lab for k in cells)]
    width = 0.85 / len(poses)
    fig, ax = plt.subplots(figsize=(max(8, 1.2 * len(corrs)), 4.5))
    colors = {"Random-Pose": "g", "SVD-Pose": "b", "Manual-Pose": "r"}
    vals = []
    for j, pose in enumerate(poses):
        xs, ms = [], []
        for i, c in enumerate(corrs):
            v = cells.get((c, pose))
            if v:
                xs.append(i + j * width)
                ms.append(float(np.mean(v)))
        ax.bar(xs, ms, width=width, fc=colors[pose], label=pose)
        vals.extend(ms)
    ax.set_ylim(min(vals) * 0.99, max(vals) * 1.005)
    ax.set_xticks([i + width * (len(poses) - 1) / 2
                   for i in range(len(corrs))])
    ax.set_xticklabels(corrs, rotation=13, ha="right",
                       rotation_mode="anchor", fontsize=8)
    ax.set_ylabel("Acc.")
    ax.legend(fontsize=9)
    fig.tight_layout()
    fig.savefig(out, dpi=160)
    print(f"wrote {out} ({len(corrs)} corruptions x {len(poses)} poses)")


def main():
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("mode", choices=["accuracy", "corruption", "curves",
                                    "robustness_bars", "fewshot",
                                    "affinity_matrix", "ablation",
                                    "dataset_variants"])
    p.add_argument("dirs", nargs="+", help="experiment directories (globs ok)")
    p.add_argument("-o", "--out", default="figure.png")
    p.add_argument("--param-re", default=r"([0-9]+(?:\.[0-9]+)?)/*$",
                   help="ablation mode: regex capturing the swept value "
                        "from each directory name")
    args = p.parse_args()
    dirs = []
    for d in args.dirs:
        dirs.extend(sorted(glob.glob(d)) or [d])
    if args.mode == "ablation":
        return plot_ablation(dirs, args.out, args.param_re)
    {"accuracy": plot_accuracy,
     "corruption": plot_corruption,
     "curves": plot_curves,
     "robustness_bars": plot_robustness_bars,
     "fewshot": plot_fewshot,
     "affinity_matrix": plot_affinity_matrix,
     "dataset_variants": plot_dataset_variants}[args.mode](dirs, args.out)


if __name__ == "__main__":
    main()
