"""Rank the train step's optimized-HLO instructions by output bytes.

Approximates per-op HBM writes from the compiled module text — enough to
identify which fusions carry the memory-bound step's traffic.
Usage: probe_hlo.py [BATCH] [SEQ] [TOPN]  (+ env knobs as usual)
"""
import os, re, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp

from dna_tpu.config.core import MeshConfig
from dna_tpu.data.loader import ShardedLoader
from dna_tpu.experiments import build, get_experiment
from dna_tpu.parallel.mesh import build_mesh
from dna_tpu.train.state import create_train_state
from dna_tpu.train.step import make_train_step

# probe_hlo.py [EXP] [BATCH] [SEQ] [TOPN] [k=v ...] — EXP optional (a
# leading non-numeric arg), default dnabert2_pretrain
args = sys.argv[1:]
EXP = args.pop(0) if args and not args[0].isdigit() else "dnabert2_pretrain"
B = int(args.pop(0)) if args and args[0].isdigit() else 128
S = int(args.pop(0)) if args and args[0].isdigit() else 128
TOPN = int(args.pop(0)) if args and args[0].isdigit() else 30

cfg = get_experiment(EXP, [
    f"data.batch_size={B}", f"data.max_length={S}",
    f"data.num_samples={B*4}", "model.remat=false",
] + args)
mesh = build_mesh(MeshConfig(dp=1))
exp = build(cfg, mesh=mesh)
dummy = jnp.zeros((2, S), jnp.int32)
init = lambda r: exp.model.init(r, dummy, None, deterministic=True)["params"]
state, sh = create_train_state(init, exp.tx, mesh, exp.rules, jax.random.key(0))
step = make_train_step(exp.model, exp.task_fn, exp.tx, mesh, exp.rules, sh,
                       mlm_gather=exp.cfg.model.mlm_gather)
loader = ShardedLoader(exp.dataset, B, seed=0)
batch = next(iter(loader))
txt = step.jitted.lower(state, batch).compile().as_text()

DT = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "s8": 1, "u8": 1, "pred": 1,
      "f16": 2, "s64": 8, "u64": 8, "s16": 2, "u16": 2}
shape_re = re.compile(r"(f32|bf16|s32|u32|s8|u8|pred|f16|s64|u64|s16|u16)"
                      r"\[([\d,]*)\]")

def shape_bytes(seg: str) -> int:
    total = 0
    for dt, dims in shape_re.findall(seg):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DT[dt]
    return total

rows = []
in_entry = False
for line in txt.splitlines():
    if line.startswith("ENTRY"):
        in_entry = True
        continue
    if in_entry and line.startswith("}"):
        in_entry = False
    if not in_entry:
        continue
    m = re.match(r"\s+%?([\w.\-]+) = (.*)", line)
    if not m:
        continue
    name, rest = m.groups()
    head = rest.split("(")[0].split()
    if not head:
        continue
    op = head[-1]
    out_seg = rest.split(" %")[0] if " %" in rest else rest
    b = shape_bytes(rest.split("(")[0])
    meta = ""
    mm = re.search(r'op_name="([^"]+)"', line)
    if mm:
        meta = mm.group(1)[-90:]
    rows.append((b, name, op, meta))

rows.sort(reverse=True)
total = sum(r[0] for r in rows)
print(f"ENTRY instructions: {len(rows)}, sum of output bytes: "
      f"{total/1e9:.2f} GB (writes only; reads roughly double this)")
for b, name, op, meta in rows[:TOPN]:
    print(f"{b/1e6:9.1f} MB  {op:<22} {name:<40} {meta}")

# aggregate by op_name stem
from collections import defaultdict
agg = defaultdict(float)
for b, name, op, meta in rows:
    stem = re.sub(r"layer_\d+", "layer_*", meta) or op
    agg[stem] += b
print("\n--- aggregated by op_name (layers merged) ---")
for k, v in sorted(agg.items(), key=lambda kv: -kv[1])[:TOPN]:
    print(f"{v/1e9:7.3f} GB  {k}")
