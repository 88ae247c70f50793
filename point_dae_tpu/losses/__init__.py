from .chamfer import (
    nn_distance,
    chamfer_l1,
    chamfer_l2,
    chamfer_l2_split,
    masked_chamfer_l1,
    masked_chamfer_l2,
    chamfer_l2_withnormal,
    chamfer_l2_withnormal_l1,
    chamfer_l2_withnormal_strict,
    chamfer_l2_withnormal_normalindex,
    chamfer_l2_withnormal_strict_normalindex,
    chamfer_l2_withnormal_onlynormalindex,
    chamfer_l2_coarse2fine,
    dis_normalized_l1,
    dis_normalized_l2,
    dis_normalized_l2_strict,
    build_loss_func,
)
from .emd import emd_approx, emd_cost, emd_loss

__all__ = [
    "nn_distance", "chamfer_l1", "chamfer_l2", "chamfer_l2_split",
    "masked_chamfer_l1", "masked_chamfer_l2",
    "chamfer_l2_withnormal", "chamfer_l2_withnormal_l1",
    "chamfer_l2_withnormal_strict", "chamfer_l2_withnormal_normalindex",
    "chamfer_l2_withnormal_strict_normalindex",
    "chamfer_l2_withnormal_onlynormalindex", "chamfer_l2_coarse2fine",
    "dis_normalized_l1", "dis_normalized_l2", "dis_normalized_l2_strict",
    "build_loss_func", "emd_approx", "emd_cost", "emd_loss",
]
