#!/bin/bash
# Evaluation battery (reference run.sh): ModelNet40 finetune from a DGCNN
# DAE checkpoint, the three SO(3) rotation protocols, ModelNet-C corruption
# robustness, and the ScanObjectNN SVM probes. Pass the pretrain checkpoint
# as $1; extra flags forward to every run.
set -e
CKPT=${1:?usage: run_eval.sh <pretrain-ckpt> [extra flags]}
shift || true

# ModelNet40 finetune (run.sh:52-59; author log 93.1)
python main.py --config cfgs/finetune_modelnet_transferring_features_1k_smooth_officialmodelnet.yaml \
    --finetune_model --model_name DGCNN --ckpts "$CKPT" --exp_name modelnet "$@"
FT=experiments/finetune_modelnet_transferring_features_1k_smooth_officialmodelnetDGCNN/cfgs/modelnet/ckpt-best

# ModelNet-C corruption robustness (run.sh:61-114; needs data/modelnet_c)
python main.py --config cfgs/finetune_modelnet_transferring_features_1k_smooth_officialmodelnet.yaml \
    --test_corruption --model_name DGCNN --ckpts "$FT" --exp_name test_corruption "$@"

# SO(3) rotation protocols
for MODE in z2z z2so3 so32so3; do
  python main.py --config cfgs/finetune_modelnet_rotation_${MODE}_officialmodelnet.yaml \
      --so3_rotation --mode $MODE --model_name DGCNN --ckpts "$CKPT" \
      --exp_name rotation_$MODE "$@"
done

# ScanObjectNN SVM probes (objbg / hardest / objonly, 2048 + 1k)
for DS in objbg hardest objonly; do
  for NP in "" _1k; do
    python main.py --config cfgs/finetune_scan_${DS}_svm_classification_clean${NP}.yaml \
        --finetune_model --svm_classification --model_name DGCNN_feat \
        --ckpts "$CKPT" --exp_name svm_${DS}${NP} "$@"
  done
done
