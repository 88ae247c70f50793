"""CLI argument parsing + dispatch (reference: utils/parser.py:5-145 flags,
main.py:16-115 dispatch).

Flag set and experiment-directory conventions mirror the reference so shell
recipes translate 1:1:
``experiments/<cfg_name><model_name>/<cfgs_parent>/<exp_name>``;
``--model_name`` overrides ``config.model.NAME`` (how released runs select
Point_CAE_DGCNN_FCOnly / PointCAE_transformer_fc_global_folding_local,
rerun.sh:37-40, rerun2.sh:38-41); ``--total_bs`` overrides the batch size;
``model.corrupt_type`` inherits the train dataset's corrupt_type when unset
(main.py:51-55).
"""
from __future__ import annotations

import argparse
import os
import time

from .utils.config import cfg_from_yaml_file, save_config
from .utils.logger import get_logger, print_log


def get_args(argv=None):
    p = argparse.ArgumentParser("point_dae_tpu")
    p.add_argument("--config", type=str, required=True, help="yaml config file")
    p.add_argument("--model_name", type=str, default=None,
                   help="override config.model.NAME")
    p.add_argument("--launcher", choices=["none", "spmd"], default="none",
                   help="kept for CLI parity; TPU SPMD needs no launcher")
    p.add_argument("--local_rank", type=int, default=0)
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--deterministic", action="store_true")
    p.add_argument("--sync_bn", action="store_true",
                   help="parity flag; BN stats are global-batch by default on TPU")
    p.add_argument("--exp_name", type=str, default="default")
    p.add_argument("--loss", type=str, default="cd1",
                   help="parity flag (unconsumed in the reference too)")
    p.add_argument("--root_folder", type=str, default="experiments",
                   help="experiments root (utils/parser.py:38)")
    p.add_argument("--start_ckpts", type=str, default=None)
    p.add_argument("--ckpts", type=str, default=None)
    p.add_argument("--val_freq", type=int, default=1)
    p.add_argument("--vote", action="store_true")
    p.add_argument("--resume", action="store_true")
    # resume automatically when ckpt-last exists (preemption-safe restarts;
    # TPU-native addition beyond the reference's manual --resume)
    p.add_argument("--auto_resume", action="store_true")
    p.add_argument("--test", action="store_true")
    p.add_argument("--test_corruption", action="store_true")
    # pre-generated ModelNet-C directory (clean.h5 + {corruption}_{level}.h5,
    # the modelnetc_utils layout); default mirrors its ./data/modelnet_c
    p.add_argument("--modelnet_c_root", type=str, default=None)
    p.add_argument("--so3_rotation", action="store_true")
    p.add_argument("--finetune_model", action="store_true")
    p.add_argument("--svm_classification", action="store_true")
    p.add_argument("--vis_saliency", action="store_true")
    p.add_argument("--task_affinity", action="store_true")
    p.add_argument("--scratch_model", action="store_true")
    # reference choices (ScanObjectNN difficulty) + the rotation protocols,
    # which run_net_rotation also accepts through this flag
    p.add_argument("--mode", choices=["easy", "median", "hard",
                                      "z2z", "z2so3", "so32so3", None],
                   default=None)
    p.add_argument("--total_bs", type=int, default=None)
    p.add_argument("--way", type=int, default=-1)
    p.add_argument("--shot", type=int, default=-1)
    p.add_argument("--fold", type=int, default=-1)
    args = p.parse_args(argv)

    # validations as in utils/parser.py:108-122
    if args.test and args.resume:
        raise ValueError("--test and --resume are exclusive")
    if args.resume and args.start_ckpts is not None:
        raise ValueError("--resume and --start_ckpts are exclusive")
    if args.test and args.ckpts is None:
        raise ValueError("ckpts shouldn't be None in test mode")
    if args.model_name == "none":        # reference no-override sentinel
        args.model_name = None
    # exp_name decorations (utils/parser.py:127-132) — these shape the
    # experiment tree that parse_results.py later walks
    if args.test:
        args.exp_name = "test_" + args.exp_name
    if args.test_corruption:
        args.exp_name = "test_corruption_" + args.exp_name
    if args.mode is not None:
        args.exp_name = args.exp_name + "_" + args.mode
    create_experiment_dir(args)
    return args


def create_experiment_dir(args) -> None:
    """experiments/<cfg stem + model_name>/<cfg parent>/<exp_name> tree
    (utils/parser.py:139-145)."""
    stem = os.path.splitext(os.path.basename(args.config))[0]
    if args.model_name:
        stem = stem + args.model_name
    parent = os.path.basename(os.path.dirname(args.config)) or "cfgs"
    # keep absolute --root_folder paths absolute; './'-prefixing would
    # silently re-root them under the cwd
    root = getattr(args, "root_folder", "experiments")
    args.experiment_path = os.path.join(root, stem, parent, args.exp_name)
    args.tfboard_path = os.path.join(root, stem, parent,
                                     "TFBoard", args.exp_name)
    args.log_name = stem
    os.makedirs(args.experiment_path, exist_ok=True)
    os.makedirs(args.tfboard_path, exist_ok=True)


def load_config(args):
    cfg = cfg_from_yaml_file(args.config)
    if args.model_name:
        cfg["model"]["NAME"] = args.model_name
    if args.total_bs:
        cfg["total_bs"] = args.total_bs
    # corrupt_type propagation — pretrain only, exactly like main.py:50-55
    # (finetune/scratch/test/test_corruption runs leave model.corrupt_type
    # untouched even when the dataset config carries one)
    if not (args.finetune_model or args.scratch_model or args.test
            or args.test_corruption):
        model_ct = cfg.get("model", {}).get("corrupt_type", None)
        train = cfg.get("dataset", {}).get("train", {})
        ds_ct = train.get("others", {}).get("corrupt_type", None)
        if (not model_ct) and ds_ct:
            cfg["model"]["corrupt_type"] = ds_ct
    # few-shot overrides (keyed on --shot like main.py:87-93)
    if args.shot != -1:
        for split in cfg.get("dataset", {}).values():
            if isinstance(split, dict) and "others" in split:
                split["others"]["way"] = args.way
                split["others"]["shot"] = args.shot
                split["others"]["fold"] = args.fold
    save_config(cfg, os.path.join(args.experiment_path, "config.yaml"))
    return cfg


def main(argv=None):
    from .utils.cache import enable_compilation_cache

    enable_compilation_cache()
    args = get_args(argv)
    logger = get_logger(args.log_name,
                        os.path.join(args.experiment_path,
                                     f"{time.strftime('%Y%m%d_%H%M%S')}.log"))
    config = load_config(args)
    print_log(f"config: {args.config} model: {config['model']['NAME']}",
              logger=logger)
    # 'args.<key> : <val>' / 'config.<key> = <val>' lines are a log-format
    # API (log_args_to_file/log_config_to_file, utils/config.py:7-18):
    # parse_acc_affinity.py-style few-shot aggregation reads way/shot from
    # these lines, so emit them identically
    for key, val in vars(args).items():
        print_log(f"args.{key} : {val}", logger=logger)

    def _log_cfg(cfg, pre="config"):
        for key, val in cfg.items():
            if isinstance(val, dict):
                print_log(f"{pre}.{key} = edict()", logger=logger)
                _log_cfg(val, f"{pre}.{key}")
            else:
                print_log(f"{pre}.{key} : {val}", logger=logger)

    _log_cfg(config)

    # segmentation configs are recognized by dataset (see the ShapeNetPart
    # dispatch below); their model signature (pts, cls_label) doesn't fit the
    # classification/reconstruction test harnesses, so --test routes to the
    # partseg evaluator FIRST
    _train_base = config.get("dataset", {}).get("train", {}).get("_base_", {})
    _ds_name = _train_base.get("NAME", "") if isinstance(_train_base, dict) \
        else str(_train_base)
    _is_partseg = "ShapeNetPart" in str(_ds_name)
    if args.test_corruption:
        from .engine.robustness import test_net_corruption

        return test_net_corruption(config, args, logger_name=args.log_name)
    if args.test and _is_partseg:
        from .engine.partseg import test_partseg

        return test_partseg(config, args, logger_name=args.log_name)
    if args.test:
        if args.finetune_model:
            from .engine.finetune import test_net

            return test_net(config, args, logger_name=args.log_name)
        # plain --test on a pretrain config = reconstruction visualization
        # (reference main.py dispatches to tools/runner.py:14-113)
        from .engine.visualization import test_vis_reconstruction

        return test_vis_reconstruction(config, args, logger_name=args.log_name)
    if args.so3_rotation:
        from .engine.rotation import run_net_rotation

        return run_net_rotation(config, args, logger_name=args.log_name)
    if args.vis_saliency:
        from .engine.saliency import vis_saliency_map

        return vis_saliency_map(config, args, logger_name=args.log_name)
    # segmentation runner only for ShapeNetPart configs (segmentation/main.py
    # equivalent) — classification heads that merely use the partseg-style
    # ENCODER (e.g. DGCNN_PartSeg, PointNetNoT_PartSeg) go through the normal
    # finetune path like the reference's main.py does
    if _is_partseg:
        from .engine.partseg import run_partseg

        return run_partseg(config, args, logger_name=args.log_name)
    if args.svm_classification:
        from .engine.probe import svm_classification

        return svm_classification(config, args, logger_name=args.log_name)
    if args.task_affinity:
        from .engine.probe import task_affinity

        return task_affinity(config, args, logger_name=args.log_name)
    if args.finetune_model or args.scratch_model:
        from .engine.finetune import run_finetune

        return run_finetune(config, args, logger_name=args.log_name)
    from .engine.pretrain import run_pretrain

    return run_pretrain(config, args, logger_name=args.log_name)


if __name__ == "__main__":
    main()
