"""Capture an XLA profile of the pretrain step and print a device-time
breakdown by op category.

Usage: python scripts/profile_step.py [B] [ATTN] [MMIXED] [MLP] [GELU] [DECMLP]
Writes the raw trace under /tmp/avsiam_trace/ and prints per-category device
ms/step (fusions, pallas kernels, convert, copy/layout, dots, ...), the
profile-driven workflow that found round 2's wins (BENCH_NOTES.md).

DECMLP sets dec_mlp_impl explicitly (default: inherit MLP). Needed to profile
the measured-catastrophic lnfres+lnfres config, which the inherit path now
guards against (models/cavmae.py:MAEDecoder).
"""

import collections
import glob
import gzip
import json
import os
import sys
import time

import jax
import jax.numpy as jnp


def build_step(B, attn, mmixed, mlp, gelu, dec_mlp=None):
    from avsiam_tpu.configs import (CAVMAEConfig, OptimizerConfig,
                                    PretrainConfig, ViTConfig, replace)
    from avsiam_tpu.models import CAVMAEPretrain
    from avsiam_tpu.train.pretrain import init_state, make_pretrain_step
    mcfg = CAVMAEConfig(dtype=jnp.bfloat16, attn_impl=attn,
                        mmixed_impl=mmixed, mlp_impl=mlp,
                        dec_mlp_impl=dec_mlp,
                        vit=replace(ViTConfig(), gelu=gelu))
    cfg = PretrainConfig(model=mcfg, opt=OptimizerConfig(), batch_size=B)
    model = CAVMAEPretrain(mcfg)
    rng = jax.random.PRNGKey(0)
    a = jax.random.normal(rng, (B, 1024, 128), jnp.float32)
    v = jax.random.normal(rng, (B, 3, 224, 224), jnp.float32)
    state = init_state(rng, model, cfg, (a, v))
    step = make_pretrain_step(model, cfg)
    return state, step, (a, v), rng


CATEGORIES = (
    ("pallas_attn", ("attn", "pallas", "custom-call")),
    ("convert", ("convert",)),
    ("copy_layout", ("copy", "pad", "slice", "transpose", "bitcast",
                     "reshape", "concatenate", "dynamic")),
    ("dot", ("dot", "conv")),
    ("reduce", ("reduce", "all-reduce")),
    ("fusion", ("fusion",)),
)


def categorize(name: str) -> str:
    n = name.lower()
    for cat, keys in CATEGORIES:
        if any(k in n for k in keys):
            return cat
    return "other"


def parse_trace(logdir: str, n_steps: int):
    files = glob.glob(os.path.join(logdir, "plugins", "profile", "*",
                                   "*.trace.json.gz"))
    if not files:
        print("no trace file found under", logdir)
        return
    path = max(files, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device lanes: pids whose process name mentions TPU/device XLA Ops
    pid_names = {}
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    device_pids = {p for p, n in pid_names.items()
                   if "TPU" in n or "/device" in n.lower()}
    op_tids = {pt for pt, n in tid_names.items() if "XLA Ops" in n}
    agg = collections.defaultdict(float)
    byname = collections.defaultdict(float)
    bycat = collections.defaultdict(lambda: collections.defaultdict(float))
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        key = (e.get("pid"), e.get("tid"))
        if e.get("pid") not in device_pids or (op_tids and key not in op_tids):
            continue
        dur = e.get("dur", 0) / 1000.0  # us -> ms
        name = e.get("name", "?")
        cat = categorize(name)
        agg[cat] += dur
        byname[name] += dur
        bycat[cat][name] += dur
        total += dur
    print(f"\ndevice op time over {n_steps} steps: {total:.1f} ms "
          f"({total / n_steps:.1f} ms/step)")
    for cat, ms in sorted(agg.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:12s} {ms / n_steps:8.2f} ms/step")
    print("\ntop 20 ops (ms/step):")
    for name, ms in sorted(byname.items(), key=lambda kv: -kv[1])[:20]:
        print(f"  {ms / n_steps:8.2f}  {name[:100]}")
    for cat in ("copy_layout", "convert", "reduce", "fusion"):
        print(f"\ntop 10 {cat} ops (ms/step):")
        for name, ms in sorted(bycat[cat].items(), key=lambda kv: -kv[1])[:10]:
            print(f"  {ms / n_steps:8.2f}  {name[:100]}")


def main():
    # same persistent compile cache as bench.py (helps when the backend
    # supports caching; harmless otherwise)
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    attn = sys.argv[2] if len(sys.argv) > 2 else "auto"
    mmixed = sys.argv[3] if len(sys.argv) > 3 else "exact"
    mlp = sys.argv[4] if len(sys.argv) > 4 else "dense"
    gelu = sys.argv[5] if len(sys.argv) > 5 else "erf"
    dec_mlp = sys.argv[6] if len(sys.argv) > 6 else None
    logdir = os.environ.get("TRACE_DIR", "/tmp/avsiam_trace")
    n_steps = int(os.environ.get("TRACE_STEPS", "3"))

    state, step, batch, rng = build_step(B, attn, mmixed, mlp, gelu, dec_mlp)
    lr = jnp.float32(2e-4)
    t0 = time.perf_counter()
    state, m = step(state, batch, rng, lr)
    float(jax.device_get(m["loss"]))
    print(f"compile+first step: {time.perf_counter() - t0:.0f}s")

    jax.profiler.start_trace(logdir)
    for _ in range(n_steps):
        state, m = step(state, batch, rng, lr)
    float(jax.device_get(m["loss"]))
    jax.profiler.stop_trace()
    parse_trace(logdir, n_steps)


if __name__ == "__main__":
    main()
