#!/usr/bin/env python
"""Aggregate results.json across scenes into a table (reference show.py twin).

Usage:
  python show.py results/d-nerf_1.0/*/           # dirs containing results.json
  python show.py -r results/                     # recursive search
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("dirs", nargs="*", help="dirs containing results.json")
    p.add_argument("-r", "--root", default=None,
                   help="search this tree for results.json files")
    args = p.parse_args()

    from gaussianprediction_tpu.eval.metrics import results_table

    result_dirs = {}
    if args.root:
        for dirpath, _, files in os.walk(args.root):
            if "results.json" in files:
                name = os.path.relpath(dirpath, args.root)
                result_dirs[name] = dirpath
    for d in args.dirs:
        if os.path.exists(os.path.join(d, "results.json")):
            result_dirs[os.path.basename(os.path.normpath(d))] = d
    if not result_dirs:
        print("no results.json found")
        return
    print(results_table(result_dirs))


if __name__ == "__main__":
    main()
