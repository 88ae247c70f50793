"""Checkpoint save/load/resume + key-diff reporting + torch-checkpoint import.

Replaces tools/builder.py:155-228 (save/resume with 'module.' strip) and
utils/checkpoint.py:16-47 (colored missing/unexpected key reporter) in the
reference. Storage is Orbax (PyTree checkpointing); the layout keeps the
reference's single-directory-per-experiment convention with 'ckpt-best' /
'ckpt-last' entries holding {params, batch_stats, opt_state, epoch, metrics}.

``load_torch_checkpoint`` implements the released-checkpoint key remapping
rules (models/Point_MAE.py:643-674): strip 'module.', re-root 'MAE_encoder.'
/ 'base_model.', then match into the flax tree with strict=False semantics and
a key-diff report.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from .logger import print_log


def _ckptr():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(experiment_path: str, name: str, state, epoch: int,
                    best_metric: float, logger: Optional[str] = None) -> None:
    """ckpt-best/ckpt-last writer (tools/builder.py:191-200)."""
    if experiment_path is None:
        return
    import flax.serialization

    path = os.path.abspath(os.path.join(experiment_path, name))
    payload = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        # serialize through flax so namedtuple/dataclass optimizer states
        # restore into the same structure (orbax alone would return dicts)
        "opt_state": flax.serialization.to_state_dict(
            jax.device_get(state.opt_state)),
        "step": int(jax.device_get(state.step)),
        "epoch": int(epoch),
        "best_metric": float(best_metric),
    }
    _ckptr().save(path, payload, force=True)
    print_log(f"Saved checkpoint at {path}", logger=logger)


def resume_checkpoint(experiment_path: str, state,
                      name: str = "ckpt-last",
                      logger: Optional[str] = None) -> Tuple[Any, int, float]:
    """Resume from ckpt-last (tools/builder.py:155-189). Returns
    (state, start_epoch, best_metric)."""
    path = os.path.abspath(os.path.join(experiment_path, name))
    if not os.path.exists(path):
        print_log(f"[RESUME] no checkpoint at {path}", logger=logger)
        return state, 0, 0.0
    restored = _ckptr().restore(path)
    import flax.serialization
    import jax.numpy as jnp

    state = state.replace(
        params=jax.tree_util.tree_map(jnp.asarray, restored["params"]),
        batch_stats=jax.tree_util.tree_map(jnp.asarray, restored["batch_stats"]),
        opt_state=flax.serialization.from_state_dict(
            jax.device_get(state.opt_state), restored["opt_state"]),
        step=jnp.asarray(restored["step"], jnp.int32))
    print_log(f"[RESUME] epoch {restored['epoch']} "
              f"(best {restored['best_metric']:.4f})", logger=logger)
    return state, int(restored["epoch"]) + 1, float(restored["best_metric"])


def load_params(experiment_path: str, name: str = "ckpt-best") -> Dict:
    """Load only params/batch_stats (the --ckpts warm-start path).

    Accepts either (experiment_dir, ckpt_name) or a full checkpoint path in
    either argument (callers pass --ckpts straight through)."""
    if os.path.isabs(name):
        path = name
    elif os.path.exists(name) and experiment_path == name:
        # a relative checkpoint path passed through both arguments
        path = os.path.abspath(name)
    elif experiment_path == name:
        # same value in both args but nothing on disk: report the path the
        # user actually typed instead of joining it with itself (a baffling
        # doubled path in orbax's error)
        raise FileNotFoundError(f"checkpoint not found: {name!r}")
    else:
        path = os.path.abspath(os.path.join(experiment_path, name))
    restored = _ckptr().restore(path)
    return restored


# ------------------------------------------------------------- key diffing

def flatten_keys(tree, prefix="") -> Dict[str, Any]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_keys(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = tree
    return out


def report_key_diff(expected: Dict, loaded: Dict,
                    logger: Optional[str] = None) -> Tuple[list, list]:
    """Missing/unexpected key report (utils/checkpoint.py:16-47 role)."""
    exp = set(flatten_keys(expected))
    got = set(flatten_keys(loaded))
    missing = sorted(exp - got)
    unexpected = sorted(got - exp)
    if missing:
        print_log("missing keys:\n  " + "\n  ".join(missing), logger=logger)
    if unexpected:
        print_log("unexpected keys:\n  " + "\n  ".join(unexpected), logger=logger)
    return missing, unexpected


def merge_pretrained(params: Dict, pretrained_flat: Dict[str, np.ndarray],
                     logger: Optional[str] = None) -> Dict:
    """strict=False load: copy matching keys (by flattened path + shape),
    keep everything else; report the diff."""
    flat = flatten_keys(params)
    hits, misses = 0, []
    out = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy tree

    def set_path(tree, path, val):
        keys = path.split("/")
        node = tree
        for k in keys[:-1]:
            node = node[k]
        node[keys[-1]] = val

    for path, val in pretrained_flat.items():
        if path in flat and tuple(flat[path].shape) == tuple(np.shape(val)):
            set_path(out, path, np.asarray(val, dtype=np.asarray(flat[path]).dtype))
            hits += 1
        else:
            misses.append(path)
    print_log(f"[LOAD] merged {hits} tensors, {len(misses)} unmatched",
              logger=logger)
    if misses:
        print_log("unmatched:\n  " + "\n  ".join(misses[:50]), logger=logger)
    return out


# ----------------------------------------------------- torch ckpt importing

def strip_torch_prefixes(state_dict: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """The released-checkpoint remap (models/Point_MAE.py:646-655):
    'module.' always stripped; 'MAE_encoder.'/'base_model.' re-rooted."""
    out = {}
    for k, v in state_dict.items():
        k = k[len("module."):] if k.startswith("module.") else k
        if k.startswith("MAE_encoder."):
            k = k[len("MAE_encoder."):]
        elif k.startswith("base_model."):
            k = k[len("base_model."):]
        out[k] = v
    return out


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Read a reference .pth checkpoint into numpy (torch-cpu is available).

    Returns the raw (prefix-stripped) name->array dict; model-family-specific
    name translation into flax trees lives in ``convert_torch.py``."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("base_model", ckpt.get("model", ckpt))
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
          for k, v in sd.items()}
    return strip_torch_prefixes(sd)
