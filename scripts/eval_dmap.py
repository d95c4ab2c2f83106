"""Quantify every serving-speed approximation as ΔmAP (VERDICT r2 item 4).

Trains the flagship Faster R-CNN on synthetic COCO-style data (or loads a
cached checkpoint), then evaluates that ONE checkpoint under each inference
profile in ``detax.train.profiles`` — the exact parity path is the oracle.

Writes /tmp/dmap_table.json and prints a markdown table.

Run: python scripts/eval_dmap.py [--steps 300] [--size 256] [--eval 64]
"""

import argparse
import json
import os
import pickle
import time

import jax

from detax.train.profiles import PROFILES, eval_profile, train_flagship


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--eval", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--classes", type=int, default=8)
    ap.add_argument("--params", default="/tmp/dmap_params.pkl",
                    help="trained-params cache (skips training when present)")
    ap.add_argument("--retrain", action="store_true")
    args = ap.parse_args()

    if os.path.exists(args.params) and not args.retrain:
        print(f"loading cached params from {args.params}")
        with open(args.params, "rb") as f:
            params = pickle.load(f)
    else:
        print(f"training flagship @{args.size}px, {args.classes} classes, {args.steps} steps")
        params, _ = train_flagship(args.size, args.classes, args.steps, args.batch)
        with open(args.params, "wb") as f:
            pickle.dump(jax.device_get(params), f)

    table = {}
    for profile in PROFILES:
        t0 = time.time()
        m = eval_profile(params, args.size, args.classes, profile, args.eval, args.batch)
        table[profile] = m
        print(
            f"{profile:14s} mAP={m['mAP']:.4f} AP50={m['AP50']:.4f} ({time.time()-t0:.0f}s)",
            flush=True,
        )

    base = table["exact"]["mAP"]
    out = {
        "config": {k: v for k, v in vars(args).items() if k != "retrain"},
        "profiles": table,
        "delta_vs_exact": {k: round(v["mAP"] - base, 4) for k, v in table.items()},
    }
    with open("/tmp/dmap_table.json", "w") as f:
        json.dump(out, f, indent=2)

    print("\n| profile | mAP | ΔmAP vs exact |")
    print("|---|---|---|")
    for k, v in table.items():
        print(f"| {k} | {v['mAP']:.4f} | {v['mAP'] - base:+.4f} |")


if __name__ == "__main__":
    main()
