"""Torch-checkpoint -> flax-params converter for released reference weights.

Implements the full key pipeline: the prefix-strip rules of the reference
loaders (module./MAE_encoder./base_model., models/Point_MAE.py:646-655), a
per-family name translation from torch module paths to our flax tree paths,
and the layout transposes (torch Linear stores (out, in); Conv1d(k=1) stores
(out, in, 1); our Dense kernels are (in, out)).

Usage:
    from point_dae_tpu.utils.convert_torch import convert_state_dict
    flat = convert_state_dict(load_torch_checkpoint("ckpt.pth"), family="transformer")
    params = merge_pretrained(params, flat)
"""
from __future__ import annotations

import re
from typing import Dict, Optional

import numpy as np


def _t(name: str, v: np.ndarray, kind: str) -> np.ndarray:
    """Layout translation: torch Linear/Conv1d weights -> Dense kernels."""
    if kind == "kernel":
        if v.ndim == 2:          # Linear (out, in) -> (in, out)
            return v.T
        if v.ndim == 3:          # Conv1d k=1 (out, in, 1) -> (in, out)
            return v[:, :, 0].T
        if v.ndim == 4:          # Conv2d k=1 (out, in, 1, 1) -> (in, out)
            return v[:, :, 0, 0].T
    return v


def _emit(out: Dict[str, np.ndarray], path: str, torch_name: str,
          v: np.ndarray) -> None:
    leaf = torch_name.rsplit(".", 1)[-1]
    if leaf == "weight":
        if v.ndim == 1:  # norm scale
            out[f"{path}/scale"] = v
        else:
            out[f"{path}/kernel"] = _t(torch_name, v, "kernel")
    elif leaf == "bias":
        out[f"{path}/bias"] = v
    elif leaf == "running_mean":
        out[f"{path}/mean"] = v          # goes into batch_stats
    elif leaf == "running_var":
        out[f"{path}/var"] = v
    elif leaf == "num_batches_tracked":
        pass
    else:
        out[path] = v


# ---- transformer family (MaskTransformer + PointCAE/Point_MAE heads) ----
# torch path -> flax path templates. {i} = block index.
_TRANSFORMER_RULES = [
    # patch embed (Encoder, PointCAE_transformer.py:20-51)
    (r"^encoder\.first_conv\.0\.(weight|bias)$", "encoder/conv1"),
    (r"^encoder\.first_conv\.1\.(.*)$", "encoder/bn1"),
    (r"^encoder\.first_conv\.3\.(weight|bias)$", "encoder/conv2"),
    (r"^encoder\.second_conv\.0\.(weight|bias)$", "encoder/conv3"),
    (r"^encoder\.second_conv\.1\.(.*)$", "encoder/bn2"),
    (r"^encoder\.second_conv\.3\.(weight|bias)$", "encoder/conv4"),
    # pos embeds
    (r"^pos_embed\.0\.(weight|bias)$", "pos_embed/fc1"),
    (r"^pos_embed\.2\.(weight|bias)$", "pos_embed/fc2"),
    (r"^decoder_pos_embed\.0\.(weight|bias)$", "decoder_pos_embed/fc1"),
    (r"^decoder_pos_embed\.2\.(weight|bias)$", "decoder_pos_embed/fc2"),
    # transformer blocks (encoder)
    (r"^blocks\.blocks\.(\d+)\.norm1\.(.*)$", "blocks/block{0}/norm1"),
    (r"^blocks\.blocks\.(\d+)\.norm2\.(.*)$", "blocks/block{0}/norm2"),
    (r"^blocks\.blocks\.(\d+)\.attn\.qkv\.(.*)$", "blocks/block{0}/attn/qkv"),
    (r"^blocks\.blocks\.(\d+)\.attn\.proj\.(.*)$", "blocks/block{0}/attn/proj"),
    (r"^blocks\.blocks\.(\d+)\.mlp\.fc1\.(.*)$", "blocks/block{0}/mlp_fc1"),
    (r"^blocks\.blocks\.(\d+)\.mlp\.fc2\.(.*)$", "blocks/block{0}/mlp_fc2"),
    (r"^norm\.(.*)$", "norm"),
    # decoder blocks
    (r"^MAE_decoder\.blocks\.(\d+)\.norm1\.(.*)$", "MAE_decoder/block{0}/norm1"),
    (r"^MAE_decoder\.blocks\.(\d+)\.norm2\.(.*)$", "MAE_decoder/block{0}/norm2"),
    (r"^MAE_decoder\.blocks\.(\d+)\.attn\.qkv\.(.*)$", "MAE_decoder/block{0}/attn/qkv"),
    (r"^MAE_decoder\.blocks\.(\d+)\.attn\.proj\.(.*)$", "MAE_decoder/block{0}/attn/proj"),
    (r"^MAE_decoder\.blocks\.(\d+)\.mlp\.fc1\.(.*)$", "MAE_decoder/block{0}/mlp_fc1"),
    (r"^MAE_decoder\.blocks\.(\d+)\.mlp\.fc2\.(.*)$", "MAE_decoder/block{0}/mlp_fc2"),
    (r"^MAE_decoder\.norm\.(.*)$", "MAE_decoder/norm"),
    # tokens + heads
    (r"^mask_token$", "mask_token"),
    (r"^cls_token$", "cls_token"),
    (r"^cls_pos$", "cls_pos"),
    (r"^increase_dim\.0\.(weight|bias)$", "increase_dim"),
    (r"^coarse_pred\.0\.(weight|bias)$", "coarse_pred/dense0"),
    (r"^coarse_pred\.2\.(weight|bias)$", "coarse_pred/dense1"),
    (r"^coarse_pred\.4\.(weight|bias)$", "coarse_pred/dense2"),
    (r"^folding1\.0\.(weight|bias)$", "fold/folding1/dense0"),
    (r"^folding1\.2\.(weight|bias)$", "fold/folding1/dense1"),
    (r"^folding1\.4\.(weight|bias)$", "fold/folding1/dense2"),
    (r"^folding2\.0\.(weight|bias)$", "fold/folding2/dense0"),
    (r"^folding2\.2\.(weight|bias)$", "fold/folding2/dense1"),
    (r"^folding2\.4\.(weight|bias)$", "fold/folding2/dense2"),
    # finetune head
    (r"^cls_head_finetune\.0\.(.*)$", "cls_head_finetune/fc0"),
    (r"^cls_head_finetune\.1\.(.*)$", "cls_head_finetune/bn0"),
    (r"^cls_head_finetune\.4\.(.*)$", "cls_head_finetune/fc1"),
    (r"^cls_head_finetune\.5\.(.*)$", "cls_head_finetune/bn1"),
    (r"^cls_head_finetune\.8\.(.*)$", "cls_head_finetune/cls"),
]

# ---- DGCNN family (dgcnn_util.py + PointCAE_DGCNN.py) ----
_DGCNN_RULES = [
    (r"^dgcnn_encoder\.conv1\.0\.(weight)$", "dgcnn_encoder/ec1/conv"),
    (r"^dgcnn_encoder\.bn1\.(.*)$", "dgcnn_encoder/ec1/bn"),
    (r"^dgcnn_encoder\.conv2\.0\.(weight)$", "dgcnn_encoder/ec2/conv"),
    (r"^dgcnn_encoder\.bn2\.(.*)$", "dgcnn_encoder/ec2/bn"),
    (r"^dgcnn_encoder\.conv3\.0\.(weight)$", "dgcnn_encoder/ec3/conv"),
    (r"^dgcnn_encoder\.bn3\.(.*)$", "dgcnn_encoder/ec3/bn"),
    (r"^dgcnn_encoder\.conv4\.0\.(weight)$", "dgcnn_encoder/ec4/conv"),
    (r"^dgcnn_encoder\.bn4\.(.*)$", "dgcnn_encoder/ec4/bn"),
    (r"^dgcnn_encoder\.conv5\.0\.(weight)$", "dgcnn_encoder/conv5"),
    (r"^dgcnn_encoder\.bn5\.(.*)$", "dgcnn_encoder/bn5"),
    # the bnX modules are ALSO registered inside the convX Sequentials
    # (dgcnn_util.py:90-111), so state_dict emits each BN twice; the
    # convX.1 aliases carry identical tensors and map to the same leaves
    (r"^dgcnn_encoder\.conv([1-4])\.1\.(.*)$", "dgcnn_encoder/ec{0}/bn"),
    (r"^dgcnn_encoder\.conv5\.1\.(.*)$", "dgcnn_encoder/bn5"),
    (r"^recfc\.0\.(weight|bias)$", "recfc/dense0"),
    (r"^recfc\.2\.(weight|bias)$", "recfc/dense1"),
    (r"^recfc\.4\.(weight|bias)$", "recfc/dense2"),
    (r"^folding1\.0\.(weight|bias)$", "folding1/dense0"),
    (r"^folding1\.2\.(weight|bias)$", "folding1/dense1"),
    (r"^folding1\.4\.(weight|bias)$", "folding1/dense2"),
    (r"^folding2\.0\.(weight|bias)$", "folding2/dense0"),
    (r"^folding2\.2\.(weight|bias)$", "folding2/dense1"),
    (r"^folding2\.4\.(weight|bias)$", "folding2/dense2"),
    # projection head (PointCAE_DGCNN.py:468-470)
    (r"^proj\.0\.(weight|bias)$", "proj/dense0"),
    (r"^proj\.2\.(weight|bias)$", "proj/dense1"),
    # cls head (PointCAE_DGCNN.py:581-590: Linear BN LeakyReLU Linear BN
    # LeakyReLU Dropout Linear)
    (r"^cls_head_finetune\.0\.(.*)$", "cls_head/fc1"),
    (r"^cls_head_finetune\.1\.(.*)$", "cls_head/bn1"),
    (r"^cls_head_finetune\.3\.(.*)$", "cls_head/fc2"),
    (r"^cls_head_finetune\.4\.(.*)$", "cls_head/bn2"),
    (r"^cls_head_finetune\.7\.(.*)$", "cls_head/cls"),
    (r"^cls\.(weight|bias)$", "cls"),
]

# MlMAE's torch layout equals the transformer family's
# (Point_MlMAE.py:213-365 uses MaskTransformer/Encoder/TransformerDecoder
# with identical attribute names); our flax _MlEncoder keeps its ViT blocks
# directly at block{i} (no 'blocks' scope), so only that segment remaps.
_MLMAE_RULES = [(pat, tmpl.replace("blocks/block{0}", "block{0}"))
                for pat, tmpl in _TRANSFORMER_RULES]

# masksurf shares the transformer module naming (MaskSurf_v2.py MaskTransformer
# uses Encoder/pos_embed/blocks/norm exactly like PointCAE_transformer); extras:
_MASKSURF_RULES = _TRANSFORMER_RULES + [
    (r"^increase_dim2\.0\.(weight|bias)$", "increase_dim2"),
    (r"^increase_dim2\.(weight|bias)$", "increase_dim2"),
    (r"^loss_weight$", "loss_weight"),
]


def _stn_rules(prefix: str, dst: str):
    """STN3d/STNkd naming (pointnet_util.py:18-92): conv1-3 + bn1-3 point
    stack, fc1-2 + bn4-5 head, fc3 output."""
    return [
        (prefix + r"conv1\.(.*)$", dst + "/c1_fc"),
        (prefix + r"bn1\.(.*)$", dst + "/c1_bn"),
        (prefix + r"conv2\.(.*)$", dst + "/c2_fc"),
        (prefix + r"bn2\.(.*)$", dst + "/c2_bn"),
        (prefix + r"conv3\.(.*)$", dst + "/c3_fc"),
        (prefix + r"bn3\.(.*)$", dst + "/c3_bn"),
        (prefix + r"fc1\.(.*)$", dst + "/f1_fc"),
        (prefix + r"bn4\.(.*)$", dst + "/f1_bn"),
        (prefix + r"fc2\.(.*)$", dst + "/f2_fc"),
        (prefix + r"bn5\.(.*)$", dst + "/f2_bn"),
        (prefix + r"fc3\.(.*)$", dst + "/f3"),
    ]


# ---- PointNet family (pointnet_util.py STN3d/STNkd/PointNetEncoder +
# PointCAE_pointnet.py heads). Torch path root: pointnet_encoder.
_POINTNET_RULES = (
    _stn_rules(r"^pointnet_encoder\.stn\.", "pointnet_encoder/stn")
    + _stn_rules(r"^pointnet_encoder\.fstn\.", "pointnet_encoder/fstn")
    + [
        (r"^pointnet_encoder\.conv1\.(.*)$", "pointnet_encoder/c1_fc"),
        (r"^pointnet_encoder\.bn1\.(.*)$", "pointnet_encoder/c1_bn"),
        (r"^pointnet_encoder\.conv2\.(.*)$", "pointnet_encoder/c2_fc"),
        (r"^pointnet_encoder\.bn2\.(.*)$", "pointnet_encoder/c2_bn"),
        (r"^pointnet_encoder\.conv3\.(.*)$", "pointnet_encoder/c3_fc"),
        (r"^pointnet_encoder\.bn3\.(.*)$", "pointnet_encoder/c3_bn"),
        # DAE FC decoder (reference names it folding1, a 3-Linear stack)
        (r"^folding1\.0\.(weight|bias)$", "recfc/dense0"),
        (r"^folding1\.2\.(weight|bias)$", "recfc/dense1"),
        (r"^folding1\.4\.(weight|bias)$", "recfc/dense2"),
        # cls head (PointCAE_pointnet.py:145-154: Linear BN ReLU Dropout
        # Linear BN ReLU Linear)
        (r"^cls_head_finetune\.0\.(.*)$", "cls_head/fc1"),
        (r"^cls_head_finetune\.1\.(.*)$", "cls_head/bn1"),
        (r"^cls_head_finetune\.4\.(.*)$", "cls_head/fc2"),
        (r"^cls_head_finetune\.5\.(.*)$", "cls_head/bn2"),
        (r"^cls_head_finetune\.7\.(.*)$", "cls_head/cls"),
        (r"^cls\.(weight|bias)$", "cls"),     # linear-probe heads
    ])

# ---- PointNet++ family (pointnetv2_util.py:319-345 encoder built on the
# pointnet2_ops wheel: sa{j}.mlps.0.layer{i}.conv / .bn.bn (SharedMLP +
# _BNBase nesting, extensions/pointnet2/pytorch_utils.py:8-62) +
# PointCAE_pointnetv2.py heads). Torch path root: pointnetv2_encoder.
_POINTNET2_RULES = [
    (r"^pointnetv2_encoder\.sa(\d+)\.mlps\.0\.layer(\d+)\.conv\.(weight|bias)$",
     "pointnetv2_encoder/sa{0}/mlp{1}_fc"),
    (r"^pointnetv2_encoder\.sa(\d+)\.mlps\.0\.layer(\d+)\.bn\.bn\.(.*)$",
     "pointnetv2_encoder/sa{0}/mlp{1}_bn"),
    # PCN decoder (folding1 Linear stack, folding2 Conv1d stack — our
    # SplitMLP keeps nn.Dense-on-concat kernel layout so a straight
    # transpose converts; concat orders match the reference forward)
    (r"^folding1\.0\.(weight|bias)$", "folding1/dense0"),
    (r"^folding1\.2\.(weight|bias)$", "folding1/dense1"),
    (r"^folding1\.4\.(weight|bias)$", "folding1/dense2"),
    (r"^folding2\.0\.(weight|bias)$", "folding2/dense0"),
    (r"^folding2\.2\.(weight|bias)$", "folding2/dense1"),
    (r"^folding2\.4\.(weight|bias)$", "folding2/dense2"),
    # MA2E heads (PointCAE_pointnetv2.py:186-220)
    (r"^pos_embed\.0\.(weight|bias)$", "pos_embed/dense0"),
    (r"^pos_embed\.2\.(weight|bias)$", "pos_embed/dense1"),
    (r"^coarse_pred\.0\.(weight|bias)$", "coarse_pred/dense0"),
    (r"^coarse_pred\.2\.(weight|bias)$", "coarse_pred/dense1"),
    (r"^coarse_pred\.4\.(weight|bias)$", "coarse_pred/dense2"),
    # projection head (PointCAE_pointnetv2.py:631-746)
    (r"^proj\.0\.(weight|bias)$", "proj/dense0"),
    (r"^proj\.2\.(weight|bias)$", "proj/dense1"),
    # cls head (PointCAE_pointnetv2.py:757-767: Linear BN ReLU Dropout
    # Linear BN ReLU Dropout Linear)
    (r"^cls_head_finetune\.0\.(.*)$", "cls_head/fc1"),
    (r"^cls_head_finetune\.1\.(.*)$", "cls_head/bn1"),
    (r"^cls_head_finetune\.4\.(.*)$", "cls_head/fc2"),
    (r"^cls_head_finetune\.5\.(.*)$", "cls_head/bn2"),
    (r"^cls_head_finetune\.8\.(.*)$", "cls_head/cls"),
    (r"^cls\.(weight|bias)$", "cls"),
]

# ---- dVAE tokenizer (DiscreteVAE, MaskSurf_v2.py:175-209 — the Point-BERT
# dVAE.pth layout that MaskSurf_v2_token_dis's dvae_config.ckpt points at).
# Torch roots: encoder. / dgcnn_1. / codebook / dgcnn_2. / decoder. ; our
# SplitDense keeps the concat-kernel layout so decoder.final_conv.0 (Conv1d
# over [global, seed, pt]) converts by straight transpose.
_DVAE_RULES = [
    (r"^encoder\.first_conv\.0\.(weight|bias)$", "encoder/conv1"),
    (r"^encoder\.first_conv\.1\.(.*)$", "encoder/bn1"),
    (r"^encoder\.first_conv\.3\.(weight|bias)$", "encoder/conv2"),
    (r"^encoder\.second_conv\.0\.(weight|bias)$", "encoder/conv3"),
    (r"^encoder\.second_conv\.1\.(.*)$", "encoder/bn2"),
    (r"^encoder\.second_conv\.3\.(weight|bias)$", "encoder/conv4"),
    (r"^codebook$", "codebook"),
    (r"^dgcnn_(\d)\.input_trans\.(weight|bias)$", "dgcnn_{0}/input_trans"),
    (r"^dgcnn_(\d)\.layer(\d)\.0\.weight$", "dgcnn_{0}/layer{1}"),
    (r"^dgcnn_(\d)\.layer(\d)\.1\.(weight|bias)$", "dgcnn_{0}/layer{1}_gn"),
    # folding decoder (Decoder, MaskSurf_v2.py:19-78): Linear mlp stack
    # (indices 0/2/4) + Conv1d final_conv stack (0/1/3/4/6)
    (r"^decoder\.mlp\.0\.(weight|bias)$", "decoder/mlp/dense0"),
    (r"^decoder\.mlp\.2\.(weight|bias)$", "decoder/mlp/dense1"),
    (r"^decoder\.mlp\.4\.(weight|bias)$", "decoder/mlp/dense2"),
    (r"^decoder\.final_conv\.0\.(weight|bias)$", "decoder/final0"),
    (r"^decoder\.final_conv\.1\.(.*)$", "decoder/final_bn0"),
    (r"^decoder\.final_conv\.3\.(weight|bias)$", "decoder/final1"),
    (r"^decoder\.final_conv\.4\.(.*)$", "decoder/final_bn1"),
    (r"^decoder\.final_conv\.6\.(weight|bias)$", "decoder/final_out"),
]

# ---- Point-M2AE family (Point_M2AE.py H_Encoder: token_embed /
# encoder_pos_embeds / encoder_blocks.{i}.blocks.{j} / encoder_norms;
# Token_Embed naming from Point_M2AE_modules.py:169-215).
_M2AE_RULES = [
    (r"^h_encoder\.token_embed\.(\d+)\.first_conv\.0\.(weight|bias)$",
     "h_encoder/token_embed{0}/conv1"),
    (r"^h_encoder\.token_embed\.(\d+)\.first_conv\.1\.(.*)$",
     "h_encoder/token_embed{0}/bn1"),
    (r"^h_encoder\.token_embed\.(\d+)\.first_conv\.3\.(weight|bias)$",
     "h_encoder/token_embed{0}/conv2"),
    (r"^h_encoder\.token_embed\.(\d+)\.second_conv\.0\.(weight|bias)$",
     "h_encoder/token_embed{0}/conv3"),
    (r"^h_encoder\.token_embed\.(\d+)\.second_conv\.1\.(.*)$",
     "h_encoder/token_embed{0}/bn2"),
    (r"^h_encoder\.token_embed\.(\d+)\.second_conv\.3\.(weight|bias)$",
     "h_encoder/token_embed{0}/conv4"),
    (r"^h_encoder\.encoder_pos_embeds\.(\d+)\.0\.(weight|bias)$",
     "h_encoder/pos_embed{0}/dense0"),
    (r"^h_encoder\.encoder_pos_embeds\.(\d+)\.2\.(weight|bias)$",
     "h_encoder/pos_embed{0}/dense1"),
    (r"^h_encoder\.encoder_blocks\.(\d+)\.blocks\.(\d+)\.norm1\.(.*)$",
     "h_encoder/stage{0}/block{1}/norm1"),
    (r"^h_encoder\.encoder_blocks\.(\d+)\.blocks\.(\d+)\.norm2\.(.*)$",
     "h_encoder/stage{0}/block{1}/norm2"),
    (r"^h_encoder\.encoder_blocks\.(\d+)\.blocks\.(\d+)\.attn\.qkv\.(.*)$",
     "h_encoder/stage{0}/block{1}/attn/qkv"),
    (r"^h_encoder\.encoder_blocks\.(\d+)\.blocks\.(\d+)\.attn\.proj\.(.*)$",
     "h_encoder/stage{0}/block{1}/attn/proj"),
    (r"^h_encoder\.encoder_blocks\.(\d+)\.blocks\.(\d+)\.mlp\.fc1\.(.*)$",
     "h_encoder/stage{0}/block{1}/mlp_fc1"),
    (r"^h_encoder\.encoder_blocks\.(\d+)\.blocks\.(\d+)\.mlp\.fc2\.(.*)$",
     "h_encoder/stage{0}/block{1}/mlp_fc2"),
    (r"^h_encoder\.encoder_norms\.(\d+)\.(.*)$", "h_encoder/norm{0}"),
    # hierarchical decoder (Point_M2AE.py:209-239)
    (r"^h_decoder\.(\d+)\.blocks\.(\d+)\.norm1\.(.*)$",
     "h_decoder{0}/block{1}/norm1"),
    (r"^h_decoder\.(\d+)\.blocks\.(\d+)\.norm2\.(.*)$",
     "h_decoder{0}/block{1}/norm2"),
    (r"^h_decoder\.(\d+)\.blocks\.(\d+)\.attn\.qkv\.(.*)$",
     "h_decoder{0}/block{1}/attn/qkv"),
    (r"^h_decoder\.(\d+)\.blocks\.(\d+)\.attn\.proj\.(.*)$",
     "h_decoder{0}/block{1}/attn/proj"),
    (r"^h_decoder\.(\d+)\.blocks\.(\d+)\.mlp\.fc1\.(.*)$",
     "h_decoder{0}/block{1}/mlp_fc1"),
    (r"^h_decoder\.(\d+)\.blocks\.(\d+)\.mlp\.fc2\.(.*)$",
     "h_decoder{0}/block{1}/mlp_fc2"),
    (r"^decoder_pos_embeds\.(\d+)\.0\.(weight|bias)$",
     "decoder_pos_embed{0}/dense0"),
    (r"^decoder_pos_embeds\.(\d+)\.2\.(weight|bias)$",
     "decoder_pos_embed{0}/dense1"),
    # token propagation (PointNetFeaturePropagation fuse + res stack,
    # Point_M2AE_modules.py:53-123)
    (r"^token_prop\.(\d+)\.fuse\.net\.0\.(weight|bias)$",
     "token_prop{0}/fuse_conv"),
    (r"^token_prop\.(\d+)\.fuse\.net\.1\.(.*)$", "token_prop{0}/fuse_bn"),
    (r"^token_prop\.(\d+)\.extraction\.operation\.(\d+)\.net1\.0\.(weight|bias)$",
     "token_prop{0}/res{1}_conv1"),
    (r"^token_prop\.(\d+)\.extraction\.operation\.(\d+)\.net1\.1\.(.*)$",
     "token_prop{0}/res{1}_bn1"),
    (r"^token_prop\.(\d+)\.extraction\.operation\.(\d+)\.net2\.0\.(weight|bias)$",
     "token_prop{0}/res{1}_conv2"),
    (r"^token_prop\.(\d+)\.extraction\.operation\.(\d+)\.net2\.1\.(.*)$",
     "token_prop{0}/res{1}_bn2"),
    (r"^decoder_norm\.(.*)$", "decoder_norm"),
    # fc-center pretrain heads (Point_M2AE.py:343-366)
    # fc-center heads: INDEX ORDER IS REVERSED between frameworks — the
    # reference's coarse_pred_0 consumes the COARSEST scale
    # (encoder_dims[2] -> 3*num_groups[2], Point_M2AE.py:342-364, applied
    # to the reversed x_vis_list at :443-453) while our coarse_pred_0 is
    # the finest (built in num_groups order). Reference M2AE is always
    # 3-scale, so the mapping is fixed.
    (r"^coarse_pred_0\.0\.(weight|bias)$", "coarse_pred_2/dense0"),
    (r"^coarse_pred_0\.2\.(weight|bias)$", "coarse_pred_2/dense1"),
    (r"^coarse_pred_0\.4\.(weight|bias)$", "coarse_pred_2/dense2"),
    (r"^coarse_pred_1\.0\.(weight|bias)$", "coarse_pred_1/dense0"),
    (r"^coarse_pred_1\.2\.(weight|bias)$", "coarse_pred_1/dense1"),
    (r"^coarse_pred_1\.4\.(weight|bias)$", "coarse_pred_1/dense2"),
    (r"^coarse_pred_2\.0\.(weight|bias)$", "coarse_pred_0/dense0"),
    (r"^coarse_pred_2\.2\.(weight|bias)$", "coarse_pred_0/dense1"),
    (r"^coarse_pred_2\.4\.(weight|bias)$", "coarse_pred_0/dense2"),
    (r"^mask_token$", "mask_token"),
    (r"^rec_head\.(weight|bias)$", "rec_head"),
    # finetune head (Point_M2AE.py _Finetune: Linear BN ReLU Dropout
    # Linear BN ReLU Dropout Linear)
    (r"^cls_head_finetune\.0\.(.*)$", "cls_head_finetune/fc0"),
    (r"^cls_head_finetune\.1\.(.*)$", "cls_head_finetune/bn0"),
    (r"^cls_head_finetune\.4\.(.*)$", "cls_head_finetune/fc1"),
    (r"^cls_head_finetune\.5\.(.*)$", "cls_head_finetune/bn1"),
    (r"^cls_head_finetune\.8\.(.*)$", "cls_head_finetune/cls"),
]

_FAMILIES = {
    "transformer": _TRANSFORMER_RULES,
    "dgcnn": _DGCNN_RULES,
    "masksurf": _MASKSURF_RULES,
    "mlmae": _MLMAE_RULES,
    # MaskFeat: student uses the transformer naming; the frozen teacher is
    # serialized under 'pointmae.MAE_encoder.*' (MaskFeat_transformer.py:
    # 396-405 loads it as a submodule) and lands in our 'teacher' subtree
    "maskfeat": [
        (r"^pointmae\.MAE_encoder\." + pat.lstrip("^"), "teacher/" + tmpl)
        for pat, tmpl in _TRANSFORMER_RULES
    ] + [
        # MaskFeat_dgcnn: frozen nopooling-DGCNN teacher serialized under
        # 'teacher_model.dgcnn_encoder.*' (MaskFeat_DGCNN.py:391-407)
        (r"^teacher_model\." + pat.lstrip("^"),
         tmpl.replace("dgcnn_encoder/", "teacher/"))
        for pat, tmpl in _DGCNN_RULES if pat.startswith(r"^dgcnn_encoder")
    ] + _TRANSFORMER_RULES,
    "pointnet": _POINTNET_RULES,
    "pointnet2": _POINTNET2_RULES,
    "m2ae": _M2AE_RULES,
    "dvae": _DVAE_RULES,
}


def convert_state_dict(sd: Dict[str, np.ndarray], family: str = "transformer",
                       ) -> Dict[str, np.ndarray]:
    """Translate a prefix-stripped torch state dict into flat flax paths
    ('a/b/c' -> kernel/scale/bias leaves). Unmatched keys are returned under
    their original names so merge_pretrained reports them."""
    rules = _FAMILIES[family]
    out: Dict[str, np.ndarray] = {}
    for name, v in sd.items():
        v = np.asarray(v)
        for pat, tmpl in rules:
            m = re.match(pat, name)
            if m:
                groups = [g for g in m.groups() if g is not None and g.isdigit()]
                path = tmpl.format(*groups)
                if name.endswith(("token", "cls_pos")):
                    # M2AE stores mask_token as (1, C); ours is (1, 1, C)
                    if family == "m2ae" and v.ndim == 2:
                        v = v[None]
                    out[path] = v
                else:
                    _emit(out, path, name, v)
                break
        else:
            out[name] = v  # unmatched; surfaces in the key-diff report
    return out


def convert_checkpoint(pth_path: str, family: str = "transformer",
                       encoder_prefix: Optional[str] = None
                       ) -> Dict[str, np.ndarray]:
    """Load + strip + translate a reference .pth in one call. Keys whose flax
    destination lives under the MAE_encoder submodule get that prefix when
    ``encoder_prefix`` is given (pretrain-model trees nest the encoder)."""
    from .checkpoint import load_torch_checkpoint

    sd = load_torch_checkpoint(pth_path)
    flat = convert_state_dict(sd, family)
    if encoder_prefix:
        enc_tops = ("encoder/", "pos_embed/", "blocks/", "norm/")
        flat = {
            (encoder_prefix + "/" + k if k.startswith(enc_tops) else k): v
            for k, v in flat.items()}
    return flat
