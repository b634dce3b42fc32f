"""Small data-prep tools, one subcommand each (reference misc_scripts/).

  strip-glove-vocab  — GloVe vocab.txt ("token count" per line) -> tokens only
                       (reference misc_scripts/strip_glove_vocab_file.py:12-18)
  npy-to-int32       — recursively convert every .npy under a path to int32
                       (reference misc_scripts/npy_convert_to_int32.py:11-23)
  get-classes        — imgCatIds.json -> ordered class-name list, one per line
                       (reference misc_scripts/get_classes.py, which ends in a
                       debugger breakpoint; this prints / writes the list)
"""

import argparse
import json
import os
import sys

import numpy as np


def strip_glove_vocab(vocab_file: str, output_file: str, force: bool = False):
    vocab_file = os.path.abspath(vocab_file)
    output_file = os.path.abspath(output_file)
    if not os.path.isfile(vocab_file):
        sys.exit(f"vocab file not found: {vocab_file}")
    if os.path.exists(output_file) and not force:
        sys.exit(f"output exists (pass --force to overwrite): {output_file}")
    with open(vocab_file) as fin, open(output_file, "w") as fout:
        for line in fin:
            fout.write(line.split(" ")[0] + "\n")


def npy_to_int32(path: str):
    n = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".npy"):
                full = os.path.join(root, f)
                np.save(full, np.load(full).astype(np.int32))
                n += 1
    print(f"converted {n} .npy files under {path}")


def get_classes(json_path: str, output_file=None, n_classes: int = 101):
    with open(json_path) as f:
        meta = json.load(f)
    names = ["background"] * n_classes
    for cat in meta["categories"]:
        names[cat["id"]] = cat["name"]
    text = "\n".join(names)
    if output_file:
        with open(output_file, "w") as f:
            f.write(text + "\n")
    else:
        print(text)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("strip-glove-vocab")
    sp.add_argument("--vocab_file", required=True)
    sp.add_argument("--output_file", required=True)
    sp.add_argument("--force", action="store_true")

    np_ = sub.add_parser("npy-to-int32")
    np_.add_argument("--path", required=True)

    gc = sub.add_parser("get-classes")
    gc.add_argument("--json", required=True, help="imgCatIds.json path")
    gc.add_argument("--output_file", default=None)
    gc.add_argument("--n_classes", type=int, default=101)

    args = p.parse_args(argv)
    if args.cmd == "strip-glove-vocab":
        strip_glove_vocab(args.vocab_file, args.output_file, args.force)
    elif args.cmd == "npy-to-int32":
        npy_to_int32(args.path)
    else:
        get_classes(args.json, args.output_file, args.n_classes)


if __name__ == "__main__":
    main()
