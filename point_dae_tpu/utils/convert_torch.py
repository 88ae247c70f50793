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
    (r"^recfc\.0\.(weight|bias)$", "recfc/dense0"),
    (r"^recfc\.2\.(weight|bias)$", "recfc/dense1"),
    (r"^recfc\.4\.(weight|bias)$", "recfc/dense2"),
    (r"^folding1\.0\.(weight|bias)$", "folding1/dense0"),
    (r"^folding1\.2\.(weight|bias)$", "folding1/dense1"),
    (r"^folding1\.4\.(weight|bias)$", "folding1/dense2"),
    (r"^folding2\.0\.(weight|bias)$", "folding2/dense0"),
    (r"^folding2\.2\.(weight|bias)$", "folding2/dense1"),
    (r"^folding2\.4\.(weight|bias)$", "folding2/dense2"),
]

_FAMILIES = {
    "transformer": _TRANSFORMER_RULES,
    "dgcnn": _DGCNN_RULES,
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
