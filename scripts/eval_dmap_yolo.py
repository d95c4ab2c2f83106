"""Quantify YOLO's candidate-count / NMS levers as ΔmAP (round-3 agenda:
"fewer candidates/level is the lever, needs a YOLO dmAP harness").

Trains an exact-profile YOLO on synthetic COCO-style data, then evaluates
that ONE checkpoint under each inference profile — 1000-candidate XLA NMS
is the oracle. Writes /tmp/dmap_yolo.json.

Run: python scripts/eval_dmap_yolo.py [--steps 600] [--size 256]
"""

import argparse
import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from detax.train.profiles import YOLO_PROFILES, eval_yolo_profile, train_yolo


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--eval", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--classes", type=int, default=8)
    ap.add_argument("--params", default="/tmp/dmap_yolo_params.pkl")
    ap.add_argument("--retrain", action="store_true")
    args = ap.parse_args()

    if os.path.exists(args.params) and not args.retrain:
        print(f"loading cached params from {args.params}")
        with open(args.params, "rb") as f:
            params = pickle.load(f)
    else:
        print(f"training yolo @{args.size}px, {args.classes} classes, {args.steps} steps")
        params, _ = train_yolo(args.size, args.classes, args.steps, args.batch)
        with open(args.params, "wb") as f:
            pickle.dump(jax.device_get(params), f)

    table = {}
    for profile in YOLO_PROFILES:
        t0 = time.time()
        m = eval_yolo_profile(params, args.size, args.classes, profile, args.eval, args.batch)
        table[profile] = m
        print(f"{profile:10s} mAP={m['mAP']:.4f} AP50={m['AP50']:.4f} ({time.time()-t0:.0f}s)",
              flush=True)

    base = table["exact"]["mAP"]
    out = {
        "config": {k: v for k, v in vars(args).items() if k != "retrain"},
        "profiles": table,
        "delta_vs_exact": {k: round(v["mAP"] - base, 4) for k, v in table.items()},
    }
    with open("/tmp/dmap_yolo.json", "w") as f:
        json.dump(out, f, indent=1)
    print("\n| profile | mAP | Δ vs exact |")
    print("|---|---|---|")
    for k, v in table.items():
        print(f"| {k} | {v['mAP']:.4f} | {v['mAP'] - base:+.4f} |")


if __name__ == "__main__":
    main()
