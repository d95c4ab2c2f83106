"""Per-fusion time / MFU / bandwidth audit of the flagship serving program
(VERDICT r2 item 3).

Captures a jax.profiler device trace of the exact bench.py serving program,
aggregates per-HLO-op device time, model FLOPs, and bytes accessed, and
prints a table: where the batch time goes, which fusions are MXU-bound vs
HBM-bound, and each conv fusion's MFU against the chip's bf16 peak.

Writes /tmp/hlo_profile.json.

Run: python scripts/profile_hlo.py [batch] [iters]
"""

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

# TPU v5e (v5 lite) peaks
PEAK_BF16_FLOPS = 197e12
PEAK_HBM_BPS = 819e9

SIZE = 640


def build_serving_fwd(batch):
    """The bench.py flagship serving program (kept in sync with bench.py)."""
    from detax.configs import FasterRCNNConf, PreprocessConf
    from detax.models import FasterRCNN
    from detax.structures.image_batch import ImageBatch

    base = FasterRCNNConf(preprocess=PreprocessConf(image_size=SIZE))
    conf = base.replace(
        rpn=base.rpn.replace(
            pre_nms_topk=(2000, 512), post_nms_topk=(2000, 256),
            nms_impl="pallas", topk_impl="approx", topk_recall=0.8,
        ),
        roi=base.roi.replace(
            nms_impl="pallas", topk_impl="approx", pre_nms_candidates=512,
            box_pooler=base.roi.box_pooler.replace(
                sampling_ratio=2, impl="pallas", keep_ph_pad=True
            ),
        ),
    )
    model = FasterRCNN(conf=conf, dtype=jnp.bfloat16)
    images = ImageBatch.from_pixels(jnp.zeros((batch, SIZE, SIZE, 3), jnp.float32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), images)

    def fwd(p, im):
        d = model.apply(p, im)
        # scalar reduce inside jit: a materialized output would measure the
        # host tunnel, not the chip
        return d.boxes.sum() + d.scores.sum()

    return jax.jit(fwd), params, images


def capture(fwd, params, images, iters):
    trace_dir = "/tmp/detax_hlo_trace"
    os.system(f"rm -rf {trace_dir}")
    t0 = time.time()
    np.asarray(fwd(params, images))  # compile
    print(f"compile: {time.time() - t0:.0f}s", flush=True)
    np.asarray(fwd(params, images))  # warm
    with jax.profiler.trace(trace_dir):
        for _ in range(iters):
            s = fwd(params, images)
        np.asarray(s)
    paths = glob.glob(trace_dir + "/plugins/profile/*/*.trace.json.gz")
    assert paths, "no trace captured"
    with gzip.open(sorted(paths)[-1]) as f:
        return json.load(f)


def aggregate(data, iters):
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in data["traceEvents"]
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    tpu_pids = {p for p, n in pids.items() if "TPU" in n}
    ops = defaultdict(lambda: {"ps": 0, "flops": 0, "bytes": 0, "n": 0,
                               "cat": "", "long": ""})
    for e in data["traceEvents"]:
        if e.get("ph") != "X" or e.get("pid") not in tpu_pids:
            continue
        a = e.get("args", {})
        if "device_duration_ps" not in a:
            continue
        o = ops[e["name"]]
        o["ps"] += int(a["device_duration_ps"])
        o["flops"] = int(a.get("model_flops", 0) or 0)  # per-execution
        o["bytes"] = int(a.get("raw_bytes_accessed", a.get("bytes_accessed", 0)) or 0)
        o["n"] += 1
        o["cat"] = a.get("hlo_category", "")
        o["long"] = a.get("long_name", e["name"])
    rows = []
    for name, o in ops.items():
        t_s = o["ps"] * 1e-12 / iters  # per-iteration seconds
        execs = max(1, o["n"] // iters)
        flops = o["flops"] * execs
        byts = o["bytes"] * execs
        rows.append({
            "op": name,
            "category": o["cat"],
            "ms_per_iter": t_s * 1e3,
            "calls_per_iter": execs,
            "mfu": flops / t_s / PEAK_BF16_FLOPS if t_s > 0 else 0.0,
            "hbm_util": byts / t_s / PEAK_HBM_BPS if t_s > 0 else 0.0,
            "gflops": flops / 1e9,
            "mbytes": byts / 1e6,
            "long_name": o["long"][:200],
        })
    rows.sort(key=lambda r: -r["ms_per_iter"])
    return rows


def main(batch=128, iters=5):
    fwd, params, images = build_serving_fwd(batch)
    data = capture(fwd, params, images, iters)
    rows = aggregate(data, iters)
    total_ms = sum(r["ms_per_iter"] for r in rows)
    conv_ms = sum(r["ms_per_iter"] for r in rows if "convolution" in r["category"])
    conv_fl = sum(r["gflops"] for r in rows if "convolution" in r["category"])
    print(f"\ndevice total {total_ms:.1f} ms/iter | conv {conv_ms:.1f} ms "
          f"({conv_fl / conv_ms * 1e3 / (PEAK_BF16_FLOPS / 1e9):.1%} MFU aggregate)"
          if conv_ms else f"\ndevice total {total_ms:.1f} ms/iter")
    print(f"{'ms':>8} {'x':>4} {'MFU':>6} {'HBM':>6} {'category':<22} op")
    for r in rows[:40]:
        print(f"{r['ms_per_iter']:8.3f} {r['calls_per_iter']:4d} "
              f"{r['mfu']:6.1%} {r['hbm_util']:6.1%} {r['category']:<22.22} {r['op'][:60]}")
    out = {"batch": batch, "iters": iters, "total_ms": total_ms, "rows": rows}
    with open("/tmp/hlo_profile.json", "w") as f:
        json.dump(out, f, indent=1)
    print("\nwrote /tmp/hlo_profile.json")


if __name__ == "__main__":
    main(*(int(x) for x in sys.argv[1:]))
