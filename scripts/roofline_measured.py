"""Measured roofline for the two hot kernels (SVD likelihood, GRB EATS).

Run on the attached TPU:  python scripts/roofline_measured.py

Replaces the XLA cost-model "effective bytes" roofline (BENCHMARKS.md,
round 4) with measured evidence:

  (a) a MEASURED HBM streaming ceiling: device-busy time of a triad
      (y = a*x + y) over HBM-resident arrays far larger than VMEM, whose
      true HBM traffic is known exactly (2 reads + 1 write per element);
  (b) a MEASURED per-op-class device-time split for each kernel from the
      profiler timeline (dot/conv = MXU ops vs fusion = VPU/elementwise
      vs copy/data movement), which is hardware-counter time, not model;
  (c) the compiled executable's memory_analysis (real argument / output /
      temp allocation bytes emitted by XLA codegen, not the cost model)
      -> an implied HBM GB/s floor for each kernel: bytes that MUST cross
      HBM at least once per call divided by measured device time;
  (d) the XLA cost-model flops/bytes, printed for contrast with (c).

The verdict each kernel gets is one of:
  HBM-bound    implied GB/s within 70% of the measured triad ceiling
  MXU-bound    dot/conv ops >= 60% of device time
  VPU-bound    fusion (elementwise) ops >= 60% of device time and the
               implied HBM GB/s is far below the ceiling
plus the measured headroom (ceiling / implied GB/s, or MXU peak / rate).

Writes artifacts/roofline_measured.json and prints a summary table.

Reference context: the reference has no such accounting; its benchmark
metric is wall-clock on a Slurm cluster (doc/Cluster_Resources.md:7-27).
SURVEY.md section 5 makes throughput counters the benchmark metric here.
"""

import glob
import gzip
import json
import os
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# v5e single-chip peaks, for headroom statements only
HBM_PEAK_GBS = 819.0
MXU_PEAK_BF16_TFLOPS = 197.0
MXU_PEAK_F32_TFLOPS = 49.0


def _device_timeline(trace_dir):
    """Parse a jax.profiler trace dir -> (busy_us, op_rows).

    op_rows: list of (name, total_us, count) aggregated over the device
    tracks' X-phase events (the measured hardware timeline). busy_us is
    the union of event intervals (overlap-merged), same recipe as
    bench._profiled_device_rate.
    """
    files = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        return None, []
    ev = json.load(gzip.open(files[0], "rt")).get("traceEvents", [])
    names = {e["pid"]: str(e.get("args", {}).get("name", ""))
             for e in ev if e.get("ph") == "M"
             and e.get("name") == "process_name"}
    tpu_pids = {pid for pid, n in names.items()
                if "TPU" in n or "tpu" in n or "Device" in n}
    spans, agg = [], {}
    for e in ev:
        if e.get("ph") != "X" or e.get("pid") not in tpu_pids:
            continue
        dur = float(e.get("dur", 0.0))
        if not dur:
            continue
        spans.append((float(e["ts"]), float(e["ts"]) + dur))
        key = str(e.get("name", "?"))
        t, c = agg.get(key, (0.0, 0))
        agg[key] = (t + dur, c + 1)
    if not spans:
        return None, []
    spans.sort()
    busy, cur_s, cur_e = 0.0, spans[0][0], spans[0][1]
    for s, e in spans[1:]:
        if s > cur_e:
            busy += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    busy += cur_e - cur_s
    rows = sorted(((k, t, c) for k, (t, c) in agg.items()),
                  key=lambda r: -r[1])
    return busy, rows


def _classify(name):
    """Map a timeline op name to a hardware-unit class."""
    n = name.lower()
    # infeed/outfeed/host copies first: they are not chip compute
    if any(k in n for k in ("infeed", "outfeed", "transfer", "stream")):
        return "host-io"
    if any(k in n for k in ("dot", "conv", "matmul", "einsum")):
        return "mxu"
    if any(k in n for k in ("copy", "transpose", "bitcast", "reshape",
                            "slice", "concat", "pad", "gather",
                            "scatter", "dynamic-update")):
        return "data-movement"
    if "fusion" in n or any(k in n for k in (
            "add", "mul", "exp", "log", "tanh", "select", "compare",
            "reduce", "broadcast", "iota", "convert", "while", "scan")):
        return "vpu-elementwise"
    return "other"


def _class_split(rows):
    total = sum(t for _, t, _ in rows) or 1.0
    split = {}
    for name, t, _ in rows:
        c = _classify(name)
        split[c] = split.get(c, 0.0) + t
    return {k: v / total for k, v in sorted(split.items(),
                                            key=lambda kv: -kv[1])}, total


def _traced_run(fn, args_list, iters):
    """Run fn over args_list iters times under the profiler; return
    (busy_us_per_call, rows, wall_s_per_call)."""
    import jax
    # warm (compile outside the trace)
    out = fn(args_list[0])
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    n_calls = 0
    t0 = time.perf_counter()
    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            for i in range(iters):
                out = fn(args_list[i % len(args_list)])
                n_calls += 1
            np.asarray(jax.tree_util.tree_leaves(out)[0])
        wall = time.perf_counter() - t0
        busy_us, rows = _device_timeline(td)
    if busy_us is None:
        return None, [], wall / n_calls
    return busy_us / n_calls, rows, wall / n_calls


def _memory_analysis(compiled):
    """Real codegen allocation sizes (bytes). Not the cost model."""
    try:
        ma = compiled.memory_analysis()
        return {
            "argument_bytes": int(ma.argument_size_in_bytes),
            "output_bytes": int(ma.output_size_in_bytes),
            "temp_bytes": int(ma.temp_size_in_bytes),
            "alias_bytes": int(getattr(ma, "alias_size_in_bytes", 0)),
        }
    except Exception as exc:   # backend without memory_analysis
        return {"error": str(exc)[:200]}


def _cost_model(compiled):
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return {"flops": float(cost.get("flops", float("nan"))),
                "bytes_accessed": float(cost.get("bytes accessed",
                                                 float("nan")))}
    except Exception as exc:
        return {"error": str(exc)[:200]}


def measure_stream_ceiling():
    """Triad y = a*x + y over HBM-resident arrays: measured GB/s."""
    import jax
    import jax.numpy as jnp
    n = 64 * 1024 * 1024          # 256 MiB per f32 array, >> 128 MiB VMEM
    x = jnp.arange(n, dtype=jnp.float32) * 1e-9
    y = jnp.ones((n,), jnp.float32)
    triad = jax.jit(lambda a, xx, yy: a * xx + yy)
    args = [(jnp.float32(1.0 + 1e-6 * i), x, y) for i in range(8)]
    fn = lambda a: triad(*a)
    busy_us, _rows, wall = _traced_run(fn, args, iters=12)
    traffic = 3 * n * 4           # read x, read y, write out
    out = {"n_elements": n, "bytes_per_call": traffic,
           "wall_s_per_call": wall}
    if busy_us:
        out["measured_gbs"] = traffic / (busy_us * 1e-6) / 1e9
        out["fraction_of_peak"] = out["measured_gbs"] / HBM_PEAK_GBS
    return out


def kernel_report(label, fn, args_list, batch, iters=10):
    import jax
    jfn = jax.jit(fn)
    compiled = jfn.lower(args_list[0]).compile()
    busy_us, rows, wall = _traced_run(jfn, args_list, iters)
    split, dev_total_us = ({}, 0.0)
    if rows:
        split, dev_total_us = _class_split(rows)
    mem = _memory_analysis(compiled)
    cost = _cost_model(compiled)
    rep = {
        "label": label, "batch": batch,
        "device_us_per_call": busy_us,
        "wall_s_per_call": wall,
        "op_class_time_fractions": split,
        "top_ops": [{"name": n[:120], "total_us": t, "count": c}
                    for n, t, c in rows[:12]],
        "memory_analysis": mem,
        "cost_model": cost,
    }
    if busy_us and "argument_bytes" in mem:
        # Floor on HBM traffic: every argument (weights, data tensors,
        # proposal batch) and output must cross HBM at least once per
        # call; temps may live in VMEM so are excluded from the floor.
        floor_bytes = mem["argument_bytes"] + mem["output_bytes"]
        rep["hbm_floor_bytes_per_call"] = floor_bytes
        rep["implied_hbm_gbs_floor"] = floor_bytes / (busy_us * 1e-6) / 1e9
    if busy_us and "flops" in cost and np.isfinite(cost.get("flops", np.nan)):
        rep["measured_tflops"] = cost["flops"] / (busy_us * 1e-6) / 1e12
    return rep


def verdict(rep, ceiling_gbs):
    split = rep.get("op_class_time_fractions", {})
    implied = rep.get("implied_hbm_gbs_floor")
    mxu = split.get("mxu", 0.0)
    vpu = split.get("vpu-elementwise", 0.0)
    if implied and ceiling_gbs and implied >= 0.7 * ceiling_gbs:
        bound = "HBM-bound"
        headroom = ceiling_gbs / implied
    elif mxu >= 0.6:
        bound = "MXU-bound"
        tf = rep.get("measured_tflops", 0.0)
        headroom = (MXU_PEAK_BF16_TFLOPS / tf) if tf else float("nan")
    elif vpu >= 0.6:
        bound = "VPU-bound"
        headroom = (ceiling_gbs / implied) if implied else float("nan")
    else:
        bound = "mixed"
        headroom = float("nan")
    return {"bound": bound, "headroom_x": headroom,
            "mxu_frac": mxu, "vpu_frac": vpu}


def build_svd_case():
    import jax
    import bench
    ana, _svd = bench.build_svd_analysis()
    rng = np.random.default_rng(0)
    B = bench.BATCH
    u0 = rng.uniform(0.05, 0.95, (B, ana.priors.ndim)).astype(np.float32)
    args = [jax.device_put(u0 + 1e-6 * i) for i in range(8)]
    return ana.batched_logl, args, B


def build_grb_case(batch=256):
    import jax
    import jax.numpy as jnp
    from nmma_tpu.models import grb
    rng = np.random.default_rng(0)
    t_obs = np.geomspace(0.1, 300.0, 64)
    nu = np.array([1.4e14, 2.4e17])
    base = {
        "log10_E0": rng.uniform(51, 54, batch),
        "thetaCore": rng.uniform(0.02, 0.3, batch),
        "thetaWing": rng.uniform(0.35, 0.7, batch),
        "inclination_EM": rng.uniform(0.0, 0.6, batch),
        "log10_n0": rng.uniform(-4, 0, batch),
        "p": rng.uniform(2.1, 2.8, batch),
        "log10_epsilon_e": rng.uniform(-2, -0.5, batch),
        "log10_epsilon_B": rng.uniform(-4, -1, batch),
        "luminosity_distance": rng.uniform(30, 300, batch),
    }
    args = [{k: jnp.asarray(v + 1e-6 * i) for k, v in base.items()}
            for i in range(8)]
    fn = lambda ps: jax.vmap(
        lambda p: grb.grb_afterglow_flux_density(t_obs, nu, p))(ps)
    return fn, args, batch


def main():
    os.environ.setdefault("NMMA_TPU_DISABLE_PALLAS", "1")  # measure the
    # production default paths (XLA GRB form; SVD has no Pallas need)
    import jax
    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}",
          flush=True)

    print("== HBM streaming ceiling (triad) ==", flush=True)
    ceiling = measure_stream_ceiling()
    print(json.dumps(ceiling, indent=1), flush=True)
    cgbs = ceiling.get("measured_gbs")

    reports = {"stream_ceiling": ceiling}
    print("== SVD production likelihood ==", flush=True)
    fn, args, B = build_svd_case()
    rep = kernel_report("svd_likelihood", fn, args, B)
    rep["verdict"] = verdict(rep, cgbs)
    if rep.get("device_us_per_call"):
        rep["device_evals_per_s"] = B / (rep["device_us_per_call"] * 1e-6)
    reports["svd"] = rep
    print(json.dumps({k: v for k, v in rep.items() if k != "top_ops"},
                     indent=1), flush=True)

    print("== GRB EATS kernel (XLA form, B=256) ==", flush=True)
    fn, args, B = build_grb_case()
    rep = kernel_report("grb_eats", fn, args, B)
    rep["verdict"] = verdict(rep, cgbs)
    if rep.get("device_us_per_call"):
        rep["device_evals_per_s"] = B / (rep["device_us_per_call"] * 1e-6)
    reports["grb"] = rep
    print(json.dumps({k: v for k, v in rep.items() if k != "top_ops"},
                     indent=1), flush=True)

    out = os.path.join(REPO, "artifacts", "roofline_measured.json")
    with open(out, "w") as f:
        json.dump(reports, f, indent=1)
    print(f"wrote {out}", flush=True)

    for key in ("svd", "grb"):
        r = reports[key]
        v = r["verdict"]
        print(f"{key}: {v['bound']} (mxu {v['mxu_frac']:.2f}, vpu "
              f"{v['vpu_frac']:.2f}), implied HBM floor "
              f"{r.get('implied_hbm_gbs_floor', float('nan')):.1f} GB/s "
              f"vs measured ceiling {cgbs or float('nan'):.1f} GB/s, "
              f"headroom {v['headroom_x']:.1f}x", flush=True)


if __name__ == "__main__":
    main()
