#!/usr/bin/env python
"""Evaluation entry point: `python evaluate.py params/args_test_*.txt`
(reference evaluate.py:159-179)."""

from mde_tpu.config import EvalArgParser, parse_cli
from mde_tpu.evaluate import evaluate

if __name__ == "__main__":
    parser = EvalArgParser(description="Model evaluator",
                           fromfile_prefix_chars="@", conflict_handler="resolve")
    args = parse_cli(parser, mode="eval")
    evaluate(args)
