#!/usr/bin/env python
"""Build per-class GloVe embedding tables (reference misc_scripts/glove_load_test.py,
strip_glove_vocab_file.py, npy_convert_to_int32.py re-designed as one tool).

Given a GloVe text file (word <dim floats> per line) and a class list, emits a
(num_classes, dim) .npy table. Multi-word class names sum their word vectors;
classes absent from the vocabulary fall back to zeros (with a warning).

Usage:
  python scripts/build_glove_tables.py glove.twitter.27B.25d.txt classes.txt out.npy
  python scripts/build_glove_tables.py --shuffle seed out.npy shuffled_out.npy  # class-shuffle a table
"""

import argparse

import numpy as np


def load_glove(path: str, needed: set) -> dict:
    """Stream the GloVe file, keeping only words we need."""
    vecs = {}
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip().split(" ")
            if parts[0] in needed:
                vecs[parts[0]] = np.asarray(parts[1:], dtype=np.float64)
    return vecs


def build_table(glove_path: str, class_names, verbose=True) -> np.ndarray:
    words = set()
    for name in class_names:
        words.update(name.lower().replace("-", " ").split())
    vecs = load_glove(glove_path, words)
    dim = len(next(iter(vecs.values())))
    table = np.zeros((len(class_names), dim), dtype=np.float64)
    for i, name in enumerate(class_names):
        parts = name.lower().replace("-", " ").split()
        found = [vecs[w] for w in parts if w in vecs]
        if not found and verbose:
            print(f"warning: no embedding for class '{name}', using zeros")
        for v in found:
            table[i] += v
    return table


def shuffle_table(src: str, dst: str, seed: int = 0):
    """Class-shuffled variant (the reference's *_shuffled.npy ablation files)."""
    table = np.load(src)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(len(table))
    np.save(dst, table[perm])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("glove_or_src")
    ap.add_argument("classes_or_dst")
    ap.add_argument("out", nargs="?")
    ap.add_argument("--shuffle", type=int, default=None, metavar="SEED")
    args = ap.parse_args()

    if args.shuffle is not None:
        shuffle_table(args.glove_or_src, args.classes_or_dst, args.shuffle)
        print(f"wrote shuffled table -> {args.classes_or_dst}")
        return

    with open(args.classes_or_dst) as f:
        class_names = [ln.strip() for ln in f if ln.strip()]
    table = build_table(args.glove_or_src, class_names)
    np.save(args.out, table)
    print(f"wrote ({table.shape[0]}, {table.shape[1]}) table -> {args.out}")


if __name__ == "__main__":
    main()
