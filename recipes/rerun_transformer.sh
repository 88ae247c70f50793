#!/bin/bash
# Transformer released-checkpoint pipeline (reference rerun2.sh:31-49).
set -e
CFG=cfgs/pretrain_PointCAE_transformer_dropout_patch_affine_r3_maskpatch_p0005_whole.yaml
python main.py --config $CFG --model_name PointCAE_transformer_fc_global_folding_local --exp_name pretrain "$@"
CKPT=experiments/pretrain_PointCAE_transformer_dropout_patch_affine_r3_maskpatch_p0005_wholePointCAE_transformer_fc_global_folding_local/cfgs/pretrain/ckpt-best
python main.py --config cfgs/finetune_scan_hardest_transferring_features.yaml \
    --finetune_model --ckpts $CKPT --exp_name finetune_hardest "$@"
