#!/usr/bin/env python
"""Entry point (role of main.py in the reference). Example:

    python main.py --config cfgs/pretrain_synthetic_dgcnn.yaml --exp_name demo
"""
from point_dae_tpu.cli import main

if __name__ == "__main__":
    main()
