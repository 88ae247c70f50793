#!/usr/bin/env python
"""Convert a reference PyTorch ``.pth`` checkpoint into a framework checkpoint.

Turnkey front-end for the released Point-DAE checkpoints (README.md:52-57,
rerun.sh:31-32, rerun2.sh:31-32): load the ``.pth`` (module./base_model
prefixes stripped like tools/builder.py:203-228), translate names/layouts
with the per-family rules in utils/convert_torch.py, merge into a
freshly-initialized model tree (printing the missing/unexpected key report,
models/Point_MAE.py:656-673 role), and save an Orbax checkpoint the
``--ckpts`` flag of every runner accepts.

    python tools/convert_checkpoint.py \
        --pth ckpt-last.pth --config cfgs/<pretrain-or-finetune cfg>.yaml \
        --out converted_ckpt

Family is inferred from the model NAME; override with --family.
"""
import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def guess_family(model_name: str) -> str:
    n = model_name.lower()
    if "dgcnn" in n:
        return "dgcnn"
    if "m2ae" in n or "mdae" in n:
        return "m2ae"
    if "masksurf" in n:
        return "masksurf"
    if "mlmae" in n:
        return "mlmae"
    if "maskfeat" in n:
        return "maskfeat"
    if "pointnetv2" in n or "pointnet2" in n or "pointnet_2" in n:
        return "pointnet2"
    if "pointnet" in n:
        return "pointnet"
    return "transformer"


def split_flat(flat):
    """Converted flat keys -> (params, batch_stats) dicts: BN running
    mean/var live in the batch_stats collection."""
    p, bs = {}, {}
    for k, v in flat.items():
        (bs if k.endswith(("/mean", "/var")) else p)[k] = v
    return p, bs


def init_variables(model, config, seed: int = 0):
    """Initialize the model tree with the same signatures the engines use
    (finetune head: (B,N,3); pretrain DAE: corrupted+clean)."""
    import jax
    import jax.numpy as jnp

    npoints = 1024
    for split in ("train", "test"):
        others = config.get("dataset", {}).get(split, {}).get("others", {})
        if "npoints" in others:
            npoints = int(others["npoints"])
            break
    npoints = int(config.get("npoints", npoints))
    rngs = {"params": jax.random.key(seed),
            "corrupt": jax.random.key(seed + 1),
            "mask": jax.random.key(seed + 2),
            "droppath": jax.random.key(seed + 3),
            "dropout": jax.random.key(seed + 4)}
    pts = jnp.zeros((2, npoints, 3), jnp.float32)
    attempts = (
        ("classification (pts)", (pts,)),
        # pretrain DAE signature: (corrupted, clean-with-normals)
        ("pretrain DAE (corrupted, clean)",
         (pts, jnp.zeros((2, npoints, 6), jnp.float32))),
        # part segmentation: (pts, category one-hot)
        ("part-seg (pts, cls_onehot)",
         (pts, jnp.zeros((2, 16), jnp.float32))),
    )
    errors = []
    for label, args_ in attempts:
        try:
            return jax.jit(functools.partial(model.init, train=True))(
                rngs, *args_)
        except TypeError as e:
            errors.append(f"  {label}: {e}")
    raise TypeError(
        "could not initialize the model with any known call signature:\n"
        + "\n".join(errors))


def convert(pth: str, config_path: str, out: str, family: str = None,
            encoder_prefix: str = None) -> dict:
    import jax

    from point_dae_tpu.models import build_model_from_cfg
    from point_dae_tpu.utils.checkpoint import _ckptr, merge_pretrained
    from point_dae_tpu.utils.config import cfg_from_yaml_file
    from point_dae_tpu.utils.convert_torch import convert_checkpoint

    config = cfg_from_yaml_file(config_path)
    name = config["model"]["NAME"]
    family = family or guess_family(name)
    print(f"model={name} family={family}")
    model = build_model_from_cfg(config["model"])
    variables = init_variables(model, config)
    flat = convert_checkpoint(pth, family, encoder_prefix=encoder_prefix)
    flat_p, flat_bs = split_flat(flat)
    params = merge_pretrained(variables["params"], flat_p)
    batch_stats = merge_pretrained(variables.get("batch_stats", {}), flat_bs)
    payload = {"params": jax.device_get(params),
               "batch_stats": jax.device_get(batch_stats)}
    path = os.path.abspath(out)
    _ckptr().save(path, payload, force=True)
    print(f"saved converted checkpoint at {path}")
    return payload


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Reference .pth -> framework checkpoint converter")
    p.add_argument("--pth", required=True, help="reference .pth checkpoint")
    p.add_argument("--config", required=True,
                   help="config yaml naming the target model")
    p.add_argument("--out", required=True,
                   help="output checkpoint path (pass to --ckpts)")
    p.add_argument("--family", default=None,
                   choices=[None, "transformer", "dgcnn", "masksurf",
                            "mlmae", "maskfeat", "pointnet", "pointnet2",
                            "m2ae"],
                   help="name-translation rule family (default: infer)")
    p.add_argument("--encoder_prefix", default=None,
                   help="nest encoder keys under this submodule (e.g. "
                        "MAE_encoder for pretrain-model trees)")
    args = p.parse_args(argv)
    convert(args.pth, args.config, args.out, args.family,
            args.encoder_prefix)


if __name__ == "__main__":
    main()
