#!/usr/bin/env python
"""Training entry point: `python train.py params/args_train_*.txt`
(byte-compatible with the reference CLI, reference train.py:576-640)."""

import os
import sys

from mde_tpu.config import TrainArgParser, parse_cli
from mde_tpu.train.driver import main_train
from mde_tpu.utils import setup_exp_dir

if __name__ == "__main__":
    parser = TrainArgParser(
        description="Training script. Default values of all arguments are "
                    "recommended for reproducibility",
        fromfile_prefix_chars="@", conflict_handler="resolve")
    args = parse_cli(parser, mode="train")

    if args.root != "." and not os.path.isdir(args.root):
        os.makedirs(args.root)
    args.exp_dir = setup_exp_dir(args.root, args.name,
                                 interactive=sys.stdin.isatty())

    main_train(args)
