"""Per-op roofline table: measured trace time vs max(compute, memory) SoL.

The r4 per-op MFU table priced every op by FLOPs alone, which misreads ops
sitting at a roofline intersection — e.g. the MLP wo-bwd fusion carries the
GLU dgate/dvalue HBM writes, so its "74% MFU" may be memory-time, not MXU
inefficiency. This tool prices each traced op by BOTH axes:

  roofline_ms = max(flops / PEAK_FLOPS, (reads+writes) / PEAK_BW)
  util        = roofline_ms / measured_ms

Flow (two phases, both needed):
  1. timeout 560 python scripts/probe_trace.py [EXP] [B] [S] [k=v ...]
     -> /tmp/jaxtrace (5 traced steps on TPU)
  2. python scripts/roofline.py [EXP] [B] [S] [k=v ...]
     -> compiles the SAME step (remote-compile cache makes this cheap),
        parses the optimized HLO for per-instruction flops/bytes, joins
        with the newest trace by instruction name, prints the table.

FLOPs come from dot ops inside each fusion's called computation (2*M*N*K);
bytes from operand + output shapes. Convolutions and reductions count as
bytes-only (their FLOPs are negligible here). Peak numbers are v5e:
197 TFLOP/s bf16 MXU, 819 GB/s HBM.
"""
import gzip
import json
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_FLOPS = float(os.environ.get("ROOFLINE_PEAK_FLOPS", 197e12))  # bf16
PEAK_BW = float(os.environ.get("ROOFLINE_PEAK_BW", 819e9))

DT = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "s8": 1, "u8": 1, "pred": 1,
      "f16": 2, "s64": 8, "u64": 8, "s16": 2, "u16": 2, "f64": 8}
SHAPE_RE = re.compile(
    r"\b(f32|bf16|s32|u32|s8|u8|pred|f16|s64|u64|s16|u16|f64)\[([\d,]*)\]")


def shape_bytes(seg):
    total = 0
    for dt, dims in SHAPE_RE.findall(seg):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DT[dt]
    return total


def shape_elems_dims(seg):
    m = SHAPE_RE.search(seg)
    if not m:
        return None, []
    dims = [int(d) for d in m.group(2).split(",") if d]
    return m.group(1), dims


def split_shape_op_args(rest):
    """'<shape> <op>(<args>), attrs' -> (shape_seg, op, args_seg).

    The shape may itself contain parens (tuple types, layout annotations
    like {1,0:T(8,128)S(1)}), so the op-args '(' is found by scanning: the
    first '(' at brace-depth 0 whose preceding char is a word char."""
    brace = paren = 0
    for i, c in enumerate(rest):
        if c == "{":
            brace += 1
        elif c == "}":
            brace -= 1
        elif c == "(" and brace == 0:
            if i > 0 and (rest[i - 1].isalnum() or rest[i - 1] in "-_"):
                # walk back to the start of the op identifier
                j = i - 1
                while j > 0 and (rest[j - 1].isalnum() or rest[j - 1] in "-_"):
                    j -= 1
                return rest[:j], rest[j:i], rest[i:]
            paren += 1
        elif c == ")" and brace == 0:
            paren -= 1
    return rest, "", ""


def parse_module(txt):
    """comps: comp -> {name -> rec}; entry: name of the ENTRY computation.
    rec = dict(out_b, dims, ops, flops, kind, calls). Names repeat across
    fused computations, so everything is computation-scoped; HLO text is
    topologically ordered, so operand lookups resolve within the pass."""
    comps = {}
    cur_comp = None
    entry = None
    for line in txt.splitlines():
        if line and not line[0].isspace() and line.rstrip().endswith("{"):
            # computation headers sit at column 0: `%fused_computation.N
            # (params) -> shape {` / `ENTRY %main.N (...) {`
            mh = re.match(r"(ENTRY\s+)?%?([\w.\-]+)", line)
            if mh and mh.group(2) not in ("HloModule",):
                cur_comp = mh.group(2)
                comps.setdefault(cur_comp, {})
                if mh.group(1):
                    entry = cur_comp
        m = re.match(r"\s+(ROOT\s+)?%?([\w.\-]+) = (.*)", line)
        if not m or cur_comp is None:
            continue
        name, rest = m.group(2), m.group(3)
        shape_seg, kind, argseg = split_shape_op_args(rest)
        out_b = shape_bytes(shape_seg)
        _, dims = shape_elems_dims(shape_seg)
        # operand names: %name tokens in the args list only (not attrs)
        depth = 0
        arg_end = len(argseg) - 1
        for i, c in enumerate(argseg):
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    arg_end = i
                    break
        args_only = argseg[:arg_end + 1]
        ops = re.findall(r"%([\w.\-]+)", args_only)
        flops = 0
        if kind == "dot":
            # 2 * out_elems * K;  K = product of lhs contracting dims,
            # lhs shape from the operand's definition in this computation
            lhs_dims = []
            if ops:
                lhs_rec = comps[cur_comp].get(ops[0])
                if lhs_rec:
                    lhs_dims = lhs_rec["dims"]
            cm = re.search(r"lhs_contracting_dims=\{([\d,]*)\}", rest)
            k = 1
            if cm and lhs_dims:
                for ci in cm.group(1).split(","):
                    if ci:
                        ci = int(ci)
                        if ci < len(lhs_dims):
                            k *= lhs_dims[ci]
            out_elems = 1
            for d in dims:
                out_elems *= d
            flops = 2 * out_elems * k
        elif kind == "convolution":
            # XLA TPU lowers matmuls to convolutions: flops =
            # 2 * out_elems * kernel_elems / out_features (the kernel dim
            # labeled 'o' in dim_labels=<in>_<kernel>-><out>)
            k_dims = []
            if len(ops) > 1:
                k_rec = comps[cur_comp].get(ops[1])
                if k_rec:
                    k_dims = k_rec["dims"]
            dm = re.search(r"dim_labels=\w+_(\w+)->\w+", rest)
            out_elems = 1
            for d in dims:
                out_elems *= d
            if dm and k_dims:
                k_elems = 1
                for d in k_dims:
                    k_elems *= d
                o_pos = dm.group(1).find("o")
                o_dim = k_dims[o_pos] if 0 <= o_pos < len(k_dims) else 1
                flops = 2 * out_elems * k_elems // max(o_dim, 1)
        calls = None
        cm = re.search(r"calls=%?([\w.\-]+)", rest)
        if cm:
            calls = cm.group(1)
        comps[cur_comp][name] = dict(out_b=out_b, dims=dims, ops=ops,
                                     flops=flops, kind=kind, calls=calls)
    return comps, entry


def comp_flops(comp, comps, seen=None):
    """Total dot FLOPs in a computation, recursing through nested calls."""
    seen = seen if seen is not None else set()
    if comp in seen or comp not in comps:
        return 0
    seen.add(comp)
    f = 0
    for rec in comps[comp].values():
        f += rec["flops"]
        if rec["calls"]:
            f += comp_flops(rec["calls"], comps, seen)
    return f


def fusion_flops(name, comps, entry):
    rec = comps.get(entry, {}).get(name)
    if rec is None:
        return 0
    f = rec["flops"]
    if rec["calls"]:
        f += comp_flops(rec["calls"], comps)
    return f


def entry_io_bytes(name, comps, entry):
    ent = comps.get(entry, {})
    rec = ent.get(name)
    if rec is None:
        return 0
    reads = 0
    for op in rec["ops"]:
        o = ent.get(op)
        if o is not None:
            reads += o["out_b"]
    return reads + rec["out_b"]


def newest_trace(root):
    base = os.path.join(root, "plugins", "profile")
    runs = sorted(os.listdir(base))
    d = os.path.join(base, runs[-1])
    for f in os.listdir(d):
        if f.endswith(".trace.json.gz"):
            return os.path.join(d, f)
    raise FileNotFoundError(f"no trace in {d}")


def trace_times(root, n_steps):
    path = newest_trace(root)
    with gzip.open(path) as f:
        data = json.load(f)
    ev = data.get("traceEvents", [])
    dev_pids = set()
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            nm = e.get("args", {}).get("name", "")
            if "TPU" in nm or "/device" in nm.lower():
                dev_pids.add(e["pid"])
    t = defaultdict(float)
    n = defaultdict(int)
    src = {}
    for e in ev:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        t[e["name"]] += e["dur"] / 1e3 / n_steps
        n[e["name"]] += 1
        a = e.get("args") or {}
        for k in ("tf_op", "source", "op_name", "long_name"):
            if k in a and e["name"] not in src:
                src[e["name"]] = str(a[k])[:80]
    return t, n, src, path


def main():
    args = sys.argv[1:]
    EXP = args.pop(0) if args and not args[0].isdigit() else "dnabert2_pretrain"
    B = int(args.pop(0)) if args and args[0].isdigit() else 192
    S = int(args.pop(0)) if args and args[0].isdigit() else 128
    n_steps = int(os.environ.get("ROOFLINE_STEPS", "5"))
    root = os.environ.get("ROOFLINE_TRACE", "/tmp/jaxtrace")

    import jax
    import jax.numpy as jnp

    from dna_tpu.config.core import MeshConfig
    from dna_tpu.data.loader import ShardedLoader
    from dna_tpu.experiments import build, get_experiment
    from dna_tpu.parallel.mesh import build_mesh
    from dna_tpu.train.state import create_train_state
    from dna_tpu.train.step import make_train_step

    cfg = get_experiment(EXP, [
        f"data.batch_size={B}", f"data.max_length={S}",
        f"data.num_samples={B*4}",
    ] + args)
    mesh = build_mesh(MeshConfig(dp=1))
    exp = build(cfg, mesh=mesh)
    dummy = jnp.zeros((2, S), jnp.int32)
    init = lambda r: exp.model.init(r, dummy, None, deterministic=True)["params"]
    state, sh = create_train_state(init, exp.tx, mesh, exp.rules,
                                   jax.random.key(0))
    step = make_train_step(exp.model, exp.task_fn, exp.tx, mesh, exp.rules,
                           sh, mlm_gather=exp.cfg.model.mlm_gather)
    loader = ShardedLoader(exp.dataset, B, seed=0)
    batch = next(iter(loader))
    txt = step.jitted.lower(state, batch).compile().as_text()
    comps, entry = parse_module(txt)

    times, counts, srcs, path = trace_times(root, n_steps)
    print(f"# trace: {path}")
    rows = []
    matched = unmatched = 0.0
    for name, ms in times.items():
        rec = comps.get(entry, {}).get(name)
        if rec is None:
            unmatched += ms
            continue
        matched += ms
        fl = fusion_flops(name, comps, entry)
        io = entry_io_bytes(name, comps, entry)
        t_c = fl / PEAK_FLOPS * 1e3
        t_m = io / PEAK_BW * 1e3
        sol = max(t_c, t_m)
        rows.append((ms, sol, t_c, t_m, name, srcs.get(name, "")))
    rows.sort(reverse=True)
    tot_ms = sum(r[0] for r in rows)
    tot_sol = sum(r[1] for r in rows)
    print(f"# matched {matched:.1f} ms/step, unmatched {unmatched:.1f} "
          f"(dispatch/infeed/etc.)")
    print(f"# step roofline floor: {tot_sol:.1f} ms vs measured {tot_ms:.1f}"
          f" -> {100*tot_sol/max(tot_ms,1e-9):.0f}% of roofline overall")
    print(f"{'ms/step':>8} {'SoL':>7} {'cSoL':>7} {'mSoL':>7} {'util%':>6}"
          f"  {'bound':<5} name / src")
    for ms, sol, t_c, t_m, name, src in rows[:int(os.environ.get(
            "ROOFLINE_TOP", "40"))]:
        bound = "mem" if t_m >= t_c else "flop"
        util = 100 * sol / ms if ms else 0
        print(f"{ms:8.3f} {sol:7.3f} {t_c:7.3f} {t_m:7.3f} {util:6.1f}"
              f"  {bound:<5} {name}  [{src}]")


if __name__ == "__main__":
    main()
