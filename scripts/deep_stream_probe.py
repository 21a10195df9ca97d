#!/usr/bin/env python
"""Deep-forest stream roofline probe (VERDICT r4 weak #3 / next #3).

The perf model charges subtree-split rank configs a streamed-bottom-slab
term at RANK_STREAM_GBPS = 700 GB/s and the notes call deep14/15
"STREAM-bound" — but no artifact had decomposed a deep config's step into
stream vs compute the way UNITBENCH did for the headline. This probe does,
on the SHIPPING deep14 (512,4) ls8 and deep15 (1024,1) ls9 configs:

  - stream-once mode (default): plane-resident margins with bottom slabs
    loading once per ROW CHUNK;
  - row-outer mode (stream_once=False): same kernel, slabs load once per
    ROW TILE — `streams_ratio`x the bytes. If deep is stream-bound, time
    scales with the streamed bytes; if compute-bound, it barely moves;
  - achieved_gbps: streamed bytes / measured time, against the 700 GB/s
    model constant and the compute-share prediction.

One (config, mode) per process (the runtime device-caches only the first
large executable; slope timing would still cancel the per-call re-ship but
the noise floor triples).

Parent:  python scripts/deep_stream_probe.py            -> DEEPBENCH_r05.json
Child:   python scripts/deep_stream_probe.py --config deep14 --mode once
Reference capability being beaten either way: Struct.h:1414-1606, 2103-2164.
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

CONFIGS = {
    # family shape (run_sweep.SHAPES), rows for the probe
    "deep14": dict(trees=60, depth=14, cols=20, rows=4096),
    "deep15": dict(trees=30, depth=15, cols=16, rows=4096),
}


def run_config(name: str, mode: str) -> int:
    import jax
    import jax.numpy as jnp

    from tahoe_tpu.config import TpuLimits
    from tahoe_tpu.engine.feasibility import rank_default_tiles
    from tahoe_tpu.forest import quantize, synthetic
    from tahoe_tpu.ops.rank_kernel import RankFoldEngine

    interpret = jax.default_backend() == "cpu"
    c = CONFIGS[name]
    forest = synthetic.generate_forest(c["trees"], c["depth"], c["cols"], seed=1)
    rt, tt = rank_default_tiles(forest)
    rows = c["rows"]
    data = synthetic.generate_data(rows, c["cols"], missing_prob=0.0, seed=2)

    def fence(r):
        return float(np.asarray(r).ravel()[0])

    def slope(run_k, k1=2, k2=8, n=3):
        def timed(k):
            fence(run_k(k))
            ts = []
            for _ in range(n):
                t0 = time.perf_counter()
                fence(run_k(k))
                ts.append(time.perf_counter() - t0)
            return float(np.median(ts))

        t1, t2 = timed(k1), timed(k2)
        tries = 0
        while (t2 - t1) < 0.02 and tries < 5:
            k2 = k1 + (k2 - k1) * max(2, int(0.04 / max(t2 - t1, 1e-3)))
            t2 = timed(k2)
            tries += 1
        # flag the CLAUDE.md invalid-reading class instead of silently
        # emitting a noise-floor slope (r5 review finding): deltas under
        # ~20 ms are fence-RTT jitter
        slope._last_delta = t2 - t1
        return max((t2 - t1) / (k2 - k1), 1e-9)

    eng = RankFoldEngine(forest, row_tile=rt, tree_tile=tt,
                         stream_once=(None if mode == "once" else False),
                         interpret=interpret, limits=TpuLimits())
    planes = jax.device_put(jnp.asarray(quantize.encode_rank_planes_np(
        quantize.transform_rows_np(eng.q, data))))

    @functools.partial(jax.jit, static_argnames=("k",))
    def planes_k(tables, pl_, k):
        def body(_, acc):
            pp = pl_ + (acc[:1, None] * 0).astype(jnp.int8)
            return eng._margins_planes(tables, pp)

        return jax.lax.fori_loop(0, k, body,
                                 jnp.zeros(pl_.shape[0], jnp.float32))

    t = slope(lambda k: planes_k(eng.tables, planes, k))

    D, Ls, G = eng.depth, eng.split_level, eng.groups
    Tp = eng.padded_trees
    # streamed bottom working set per grid pass: int8 matrices for levels
    # >= Ls (one column = 128*G bytes/node, incl. the 128-lane pad of each
    # subtree-group slab) + the f32 leaf slabs; top tables are fetched once
    # per tree tile (their index map is constant over the inner dims)
    SGr = (tt << Ls) // 128
    bot_mat = sum(Tp // tt * SGr * (1 << b) * 128 * 128 * G
                  for b in range(D - Ls))
    bot_leaf = Tp // tt * SGr * (1 << (D - Ls)) * 128 * 4
    rpad = rows + (-rows) % rt
    if eng.stream_chunk_rows:
        chunk = max(rt, (eng.stream_chunk_rows // rt) * rt)
        n_pass = -(-rpad // chunk)
    else:
        n_pass = rpad // rt
    streamed = (bot_mat + bot_leaf) * n_pass

    out = {
        "config": name, "mode": mode, "tiles": [rt, tt], "rows": rows,
        "slope_delta_s": round(getattr(slope, "_last_delta", float("nan")), 4),
        "noise_guarded": bool(getattr(slope, "_last_delta", 0.0) >= 0.02),
        "split_level": Ls, "groups": G, "depth": D,
        "stream_chunk_rows": eng.stream_chunk_rows,
        "passes": n_pass,
        "streamed_bytes_per_predict": streamed,
        "us_per_sample": round(t * 1e6 / rows, 5),
        "achieved_gbps": round(streamed / t / 1e9, 1),
        "model_stream_us_per_sample": round(streamed / 700e9 * 1e6 / rows, 5),
    }
    if mode == "once":
        from tahoe_tpu.perf_model.calibrate import Calibration

        cal = Calibration.default()
        nodes = forest.num_trees * (1 << D)
        compute_s = rows * nodes * (
            cal.fold_node_ns / 1e9 * 0.15 + 128.0 * G / 206e12)
        out["model_compute_us_per_sample"] = round(compute_s * 1e6 / rows, 5)
    print(json.dumps(out), flush=True)
    return 0


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--config", default=None)
    p.add_argument("--mode", default="once", choices=["once", "outer"])
    p.add_argument("--out", default=None)
    args = p.parse_args()
    if args.config:
        return run_config(args.config, args.mode)

    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.join(os.path.expanduser("~"), ".cache",
                                "tahoe_tpu_xla"))
    report = {"runs": [], "ok": True}
    for name in CONFIGS:
        for mode in ("once", "outer"):
            try:
                r = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--config", name, "--mode", mode],
                    capture_output=True, text=True, env=env, timeout=1800,
                )
                payload = None
                for line in reversed(r.stdout.strip().splitlines() or [""]):
                    if line.strip().startswith("{"):
                        payload = json.loads(line)
                        break
                if payload is None:
                    payload = {"config": name, "mode": mode,
                               "error": r.stderr.strip()[-500:]}
                    report["ok"] = False
            except subprocess.TimeoutExpired:
                payload = {"config": name, "mode": mode, "error": "timeout"}
                report["ok"] = False
            report["runs"].append(payload)
            print(json.dumps(payload), flush=True)

    # stream-vs-compute verdict per config: time ratio vs streams ratio
    byc = {}
    for r in report["runs"]:
        if "error" not in r:
            byc.setdefault(r["config"], {})[r["mode"]] = r
    for name, d in byc.items():
        if "once" in d and "outer" in d:
            sr = d["outer"]["passes"] / max(d["once"]["passes"], 1)
            tr = d["outer"]["us_per_sample"] / d["once"]["us_per_sample"]
            report[name + "_streams_ratio"] = round(sr, 2)
            report[name + "_time_ratio"] = round(tr, 2)

    out = args.out or os.path.join(repo, "DEEPBENCH_r05.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
