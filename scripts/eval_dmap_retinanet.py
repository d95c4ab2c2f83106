"""Quantify RetinaNet's selection approximations as ΔmAP (VERDICT r2 weak
item 4: the anchor-first deviation needed its own trained-checkpoint row).

Trains an exact-profile RetinaNet on synthetic COCO-style data, then
evaluates that ONE checkpoint under each selection profile — flat exact
top-k is the oracle. Writes /tmp/dmap_retina.json.

Run: python scripts/eval_dmap_retinanet.py [--steps 300] [--size 256]
"""

import argparse
import json
import os
import pickle
import time

import jax

from detax.train.profiles import (
    RETINA_PROFILES,
    eval_retina_profile,
    train_retinanet,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--eval", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--classes", type=int, default=8)
    ap.add_argument("--params", default="/tmp/dmap_retina_params.pkl")
    ap.add_argument("--retrain", action="store_true")
    args = ap.parse_args()

    if os.path.exists(args.params) and not args.retrain:
        print(f"loading cached params from {args.params}")
        with open(args.params, "rb") as f:
            params = pickle.load(f)
    else:
        print(f"training retinanet @{args.size}px, {args.classes} classes, {args.steps} steps")
        params, _ = train_retinanet(args.size, args.classes, args.steps, args.batch)
        with open(args.params, "wb") as f:
            pickle.dump(jax.device_get(params), f)

    table = {}
    for profile in RETINA_PROFILES:
        t0 = time.time()
        m = eval_retina_profile(params, args.size, args.classes, profile, args.eval, args.batch)
        table[profile] = m
        print(f"{profile:10s} mAP={m['mAP']:.4f} AP50={m['AP50']:.4f} ({time.time()-t0:.0f}s)",
              flush=True)

    base = table["exact"]["mAP"]
    out = {
        "config": {k: v for k, v in vars(args).items() if k != "retrain"},
        "profiles": table,
        "delta_vs_exact": {k: round(v["mAP"] - base, 4) for k, v in table.items()},
    }
    with open("/tmp/dmap_retina.json", "w") as f:
        json.dump(out, f, indent=1)
    print("\n| profile | mAP | Δ vs exact |")
    print("|---|---|---|")
    for k, v in table.items():
        print(f"| {k} | {v['mAP']:.4f} | {v['mAP'] - base:+.4f} |")


if __name__ == "__main__":
    main()
