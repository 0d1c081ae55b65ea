"""Map profiler trace op names to their optimized-HLO definitions.

The per-category breakdown (scripts/profile_step.py) shows WHERE device time
goes (fusion/convert/copy buckets) but not WHAT those ops compute. This tool
closes the loop: it compiles the pretrain step, dumps the optimized HLO, and
prints — for the top-K ops of the most recent trace — the HLO definition
line plus an op-type tally of the fused computation body, so "fusion.377
1.5 ms/step" becomes "fusion.377: [64,720,2048] bf16 loop fusion = erf, mult,
add ... (the decoder GELU)".

Usage:
  python scripts/hlo_map.py dump [B] [ATTN] [MMIXED] [MLP] [GELU]
      -> compiles and writes /tmp/step_hlo.txt (slow on TPU: remote compile)
  python scripts/hlo_map.py map [K]
      -> cross-references /tmp/step_hlo.txt with the latest trace under
         /tmp/avsiam_trace (run scripts/profile_step.py first)
"""

import collections
import glob
import gzip
import json
import os
import re
import sys

HLO_PATH = "/tmp/step_hlo.txt"
TRACE_DIR = "/tmp/avsiam_trace"


def dump(argv):
    import jax
    import jax.numpy as jnp
    from profile_step import build_step
    B = int(argv[0]) if argv else 64
    attn = argv[1] if len(argv) > 1 else "auto"
    mmixed = argv[2] if len(argv) > 2 else "exact"
    mlp = argv[3] if len(argv) > 3 else "dense"
    gelu = argv[4] if len(argv) > 4 else "erf"
    dec_mlp = argv[5] if len(argv) > 5 else None
    state, step, batch, rng = build_step(B, attn, mmixed, mlp, gelu, dec_mlp)
    lr = jnp.float32(2e-4)
    # build_step returns the already-jitted (donated) step
    lowered = step.lower(state, batch, rng, lr)
    compiled = lowered.compile()
    txt = compiled.as_text()
    with open(HLO_PATH, "w") as f:
        f.write(txt)
    print(f"wrote {HLO_PATH}: {len(txt) / 1e6:.1f} MB, "
          f"{txt.count(chr(10))} lines")
    # Roofline inputs from XLA's own cost model: total FLOPs and HBM bytes
    # accessed by the compiled step. Combined with the measured envelope
    # (BENCH_NOTES.md: ~330 GB/s HBM, ~330 TF/s bf16 GEMM stacks) this gives
    # step-time floors: bytes/BW vs flops/peak — whichever is larger is the
    # bound the measured step time should be judged against.
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        fl = ca.get("flops", float("nan"))
        by = ca.get("bytes accessed", float("nan"))
        print(f"cost_analysis: {fl / 1e12:.2f} TFLOP/step, "
              f"{by / 1e9:.2f} GB accessed/step")
        print(f"floors at measured envelope: compute {fl / 330e12 * 1e3:.1f} "
              f"ms (330 TF/s), memory {by / 330e9 * 1e3:.1f} ms (330 GB/s)")
    except Exception as e:  # cost model availability varies by backend
        print("cost_analysis unavailable:", e)


def load_trace_optimes():
    files = glob.glob(os.path.join(TRACE_DIR, "plugins", "profile", "*",
                                   "*.trace.json.gz"))
    if not files:
        raise SystemExit(f"no trace file under {TRACE_DIR} — run "
                         "scripts/profile_step.py first")
    path = max(files, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    op_tids = {pt for pt, n in tid_names.items() if "XLA Ops" in n}
    byname = collections.defaultdict(float)
    for e in events:
        if e.get("ph") != "X" or (e.get("pid"), e.get("tid")) not in op_tids:
            continue
        byname[e.get("name", "?")] += e.get("dur", 0) / 1000.0  # us -> ms
    return byname


# an HLO def line: "  %name.123 = f32[64,720]{...} opcode(...), calls=%comp"
_DEF_RE = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(.*)$")


def index_hlo(txt):
    defs = {}
    comps = {}          # computation name -> list of opcode strings
    cur_comp = None
    for line in txt.splitlines():
        m = _DEF_RE.match(line)
        stripped = line.strip()
        if stripped.startswith("%") and stripped.endswith("{"):
            # computation header: "%fused_computation.12 (param_0: ...) {"
            cur_comp = stripped.split()[0].lstrip("%")
            comps[cur_comp] = []
        elif stripped == "}":
            cur_comp = None
        elif m:
            name, body = m.group(1), m.group(2)
            defs.setdefault(name, body)
            if cur_comp is not None:
                op = body.split("(")[0].split()
                if len(op) >= 2:
                    comps[cur_comp].append(op[1])
    return defs, comps


def map_ops(argv):
    K = int(argv[0]) if argv else 60
    with open(HLO_PATH) as f:
        txt = f.read()
    defs, comps = index_hlo(txt)
    byname = load_trace_optimes()
    n_steps = int(os.environ.get("TRACE_STEPS", "3"))  # match profile_step.py
    print(f"trace ops: {len(byname)}, hlo defs: {len(defs)}")
    for name, ms in sorted(byname.items(), key=lambda kv: -kv[1])[:K]:
        body = defs.get(name)
        if body is None:
            print(f"{ms / n_steps:7.2f}  {name:32s}  <not in HLO dump>")
            continue
        shape = body.split(" ")[0]
        mcall = re.search(r"(?:calls|fusion)=%?([\w.\-]+)", body)
        tail = ""
        if mcall and mcall.group(1) in comps:
            tally = collections.Counter(comps[mcall.group(1)])
            tail = " :: " + ", ".join(f"{op}x{n}" if n > 1 else op
                                      for op, n in tally.most_common(8))
        kind = re.search(r"kind=(\w+)", body)
        head = body.split("(")[0].split()
        opcode = head[-1] if head else "?"
        print(f"{ms / n_steps:7.2f}  {name:32s}  {opcode} {shape} "
              f"{kind.group(1) if kind else ''}{tail}"[:240])


_META_RE = re.compile(r'op_name="([^"]*)"')


def by_module(argv):
    """Aggregate trace device time by model-component path (from HLO op_name
    metadata): answers 'how much does the decoder cost end to end'."""
    with open(HLO_PATH) as f:
        txt = f.read()
    defs, _ = index_hlo(txt)
    byname = load_trace_optimes()
    n_steps = int(os.environ.get("TRACE_STEPS", "3"))
    groups = collections.defaultdict(float)
    detail = collections.defaultdict(lambda: collections.defaultdict(float))
    for name, ms in byname.items():
        body = defs.get(name, "")
        m = _META_RE.search(body)
        path = m.group(1) if m else "<no-metadata>"
        # strip jit(step)/jit(step)/ and jvp/transpose wrappers to the model
        # component: e.g. .../decoder/blocks_6/mlp/... -> decoder
        parts = [p for p in path.split("/")
                 if p and not p.startswith(("jit(", "jvp(", "transpose("))]
        bwd = "transpose(" in path
        grp = parts[0] if parts else path or "<none>"
        sub = "/".join(parts[:3]) + (" [bwd]" if bwd else " [fwd]")
        groups[grp] += ms
        detail[grp][sub] += ms
    total = sum(groups.values())
    print(f"total device {total / n_steps:.1f} ms/step")
    for grp, ms in sorted(groups.items(), key=lambda kv: -kv[1]):
        print(f"\n{grp:28s} {ms / n_steps:8.2f} ms/step")
        for sub, sms in sorted(detail[grp].items(), key=lambda kv: -kv[1])[:10]:
            if sms / n_steps >= 0.3:
                print(f"    {sub:60s} {sms / n_steps:7.2f}")


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    if sys.argv[1] == "dump":
        dump(sys.argv[2:])
    elif sys.argv[1] == "bymodule":
        by_module(sys.argv[2:])
    else:
        map_ops(sys.argv[2:])
