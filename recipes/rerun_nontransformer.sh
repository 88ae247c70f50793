#!/bin/bash
# Non-transformer released-checkpoint pipeline (reference rerun.sh:31-47):
# pretrain Point_CAE_DGCNN_FCOnly on ShapeNet-55 with affine_r3 + dropout_local,
# then SVM linear probe on ScanObjectNN OBJ_BG (target 85.5 +- 0.7).
set -e
CFG=cfgs/pretrain_PointCAE_affine_r3_dropout_local_4xlonger.yaml
python main.py --config $CFG --model_name Point_CAE_DGCNN_FCOnly --exp_name pretrain "$@"
python main.py --config cfgs/finetune_scan_objbg_svm.yaml \
    --finetune_model --svm_classification --model_name DGCNN_feat \
    --ckpts experiments/pretrain_PointCAE_affine_r3_dropout_local_4xlongerPoint_CAE_DGCNN_FCOnly/cfgs/pretrain/ckpt-best \
    --exp_name svm "$@"
