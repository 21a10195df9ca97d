"""Headline benchmark: SUSY-class per-sample latency on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": <us/sample>, "unit": "us/sample", "vs_baseline": N,
   ...secondary metrics...}

``value`` is the best EXACT-strategy full-predict latency on an
arbitrary-threshold SUSY-class forest (500 trees, depth 8, 18 features) —
the apples-to-apples number against the reference's best published SUSY
strategy (0.120020 us/sample on its GPU, BASELINE.md); vs_baseline > 1 means
faster than Tahoe's best. Secondary keys report the int8 rank-MXU engine:
full predict (rank transform inside the loop) and plane-resident steady state
(inputs pre-encoded once per batch, the production serving path — the analog
of the reference timing device-resident data, BaseTahoeTest.h:684-698).

All timings use the chained-iteration slope (the remote runtime acks
dispatches before execution; naive timing measures enqueue rate — see
.claude/skills/verify/SKILL.md). Exactly one engine family runs before the
primary measurement (the runtime device-caches only the first large
executable; the slope method cancels per-call re-ship overhead for the rest).
"""
import argparse
import functools
import json
import os
import sys
import time

import numpy as np

# remote Mosaic compiles run 30-90 s each; default the persistent XLA cache
# (same path every session) so driver runs reuse this session's binaries
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/tahoe_tpu_xla"))

REFERENCE_BEST_US = 0.120020  # Tahoe strategy 3 on SUSY, README.md:66-67
REFERENCE_FIL_US = 0.990169   # Tahoe's FIL-style dense baseline, README.md:58


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=65536)
    p.add_argument("--epochs", type=int, default=24)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--quick", action="store_true", help="small/fast variant")
    args = p.parse_args()
    if args.quick:
        args.rows, args.epochs, args.warmup = 4096, 6, 2

    import jax
    import jax.numpy as jnp

    from tahoe_tpu.config import TpuLimits
    from tahoe_tpu.forest import compiler, quantize, synthetic
    from tahoe_tpu.ops import oracle
    from tahoe_tpu.ops.fold_kernel import FoldKernelEngine
    from tahoe_tpu.ops.rank_kernel import RankFoldEngine

    interpret = jax.default_backend() == "cpu"
    forest = synthetic.susy_class_forest(seed=0)
    data = synthetic.generate_data(args.rows, 18, missing_prob=0.02, seed=1)
    want = oracle.predict(forest, data)
    data_d = jax.device_put(jnp.asarray(data))

    def fence(r):
        return float(np.asarray(r).ravel()[0])

    def slope(run_k, k1, k2, n=3):
        def timed(k):
            fence(run_k(k))
            ts = []
            for _ in range(n):
                t0 = time.perf_counter()
                fence(run_k(k))
                ts.append(time.perf_counter() - t0)
            return float(np.median(ts))

        t1, t2 = timed(k1), timed(k2)
        # noise guard: deltas below ~20 ms are jitter-dominated (fence RTT
        # ~25 ms) — stretch the chain until the slope is trustworthy
        tries = 0
        while (t2 - t1) < 0.02 and tries < 4:
            k2 = k1 + (k2 - k1) * max(2, int(0.04 / max(t2 - t1, 1e-3)))
            t2 = timed(k2)
            tries += 1
        return max((t2 - t1) / (k2 - k1), 1e-9)

    k1, k2 = args.warmup, args.warmup + args.epochs

    def median3(run_k):
        """Three independent slope measurements -> (median, min, max).

        Chip throughput drifts +-15% on minute scales (CLAUDE.md); the
        median of three slopes is robust to one outlier without selecting
        the favorable tail the way best-of-N does (ADVICE r2 #1).  Every
        timed path below gets the SAME policy, and the band is reported
        so the selection is visible in the JSON output.
        """
        ts = sorted(slope(run_k, k1, k2) for _ in range(3))
        return ts[1], ts[0], ts[2]

    # --- primary: fused f32 fold kernel (SPLIT_FOREST), exact, no transform --
    fold = FoldKernelEngine(
        compiler.levelize(forest), row_tile=128, tree_tile=128,
        interpret=interpret,
    )
    t_fold, t_fold_lo, t_fold_hi = median3(lambda k: fold.predict_k(data_d, k))
    us_fold = t_fold * 1e6 / args.rows
    preds = fold.predict(data_d)
    err = float(np.abs(np.asarray(preds) - want).max())

    # --- secondary: int8 rank-MXU engine ------------------------------------
    # (2048, 128) ls4: the r4 session-2 sweeps (scripts/r4_headline{,3}.py,
    # 65536 rows, medians-of-3, SAME session) measured rt2048 full 0.1228
    # [0.1186, 0.1260] / 0.1240 [0.1234, 0.1246] vs rt1024's 0.1285 — the
    # per-chunk dots latch a 128x128 weight tile per 128 output columns, so
    # MXU weight-load efficiency ~ Rt/(Rt+128): 94% at rt2048 vs 89%.
    # rt4096 (68.8 MiB) busts the 64 MiB Mosaic cap; ls5/cc4096 measured
    # worse. transform_row_tile: r3's trt4096 "0.099" was DRIFT (it beat
    # the planes-only path, impossible); r4 re-measures: trt2048 0.1273 /
    # trt4096 0.1314 (trt_sweep), 0.1265 vs rt2048's 0.1240 (r4_headline3)
    # — trt2048 ships. col_chunk 2048 = one whole bottom slab per dot at
    # ls4 (0.1203 vs 0.1287 at cc1024, r4_headline round 1).
    rank = RankFoldEngine(
        forest, row_tile=2048, tree_tile=128, split_level=4, col_chunk=2048,
        transform_row_tile=2048, interpret=interpret, limits=TpuLimits(),
    )
    t_rank_full, t_rank_lo, t_rank_hi = median3(
        lambda k: rank.predict_k(data_d, k))
    us_rank_full = t_rank_full * 1e6 / args.rows

    planes = jax.device_put(jnp.asarray(
        quantize.encode_rank_planes_np(quantize.transform_rows_np(rank.q, data))
    ))

    @functools.partial(jax.jit, static_argnames=("k",))
    def planes_k(tables, pl_, k):
        def body(_, acc):
            pp = pl_ + (acc[:1, None] * 0).astype(jnp.int8)
            return rank._margins_planes(tables, pp)

        return jax.lax.fori_loop(0, k, body, jnp.zeros(pl_.shape[0], jnp.float32))

    t_rank_planes, t_pl_lo, t_pl_hi = median3(
        lambda k: planes_k(rank.tables, planes, k))
    us_rank_planes = t_rank_planes * 1e6 / args.rows
    err_rank = float(np.abs(np.asarray(rank.predict(data_d)) - want).max())

    if err > 1e-3 or err_rank > 1e-3:
        print(json.dumps({"metric": "SUSY-class per-sample latency",
                          "value": None, "unit": "us/sample",
                          "vs_baseline": 0.0,
                          "error": f"parity fold={err} rank={err_rank}"}))
        return 1

    best_exact_full = min(us_fold, us_rank_full)
    print(json.dumps({
        "metric": "SUSY-class (500 trees, depth 8, 18 feat) per-sample latency",
        "value": round(best_exact_full, 6),
        "unit": "us/sample",
        "vs_baseline": round(REFERENCE_BEST_US / best_exact_full, 3),
        "vs_reference_fil_baseline": round(REFERENCE_FIL_US / best_exact_full, 2),
        "fold_kernel_us": round(us_fold, 6),
        "fold_band_us": [round(t_fold_lo * 1e6 / args.rows, 6),
                         round(t_fold_hi * 1e6 / args.rows, 6)],
        "rank_mxu_full_us": round(us_rank_full, 6),
        "rank_band_us": [round(t_rank_lo * 1e6 / args.rows, 6),
                         round(t_rank_hi * 1e6 / args.rows, 6)],
        "rank_mxu_planes_us": round(us_rank_planes, 6),
        "planes_band_us": [round(t_pl_lo * 1e6 / args.rows, 6),
                           round(t_pl_hi * 1e6 / args.rows, 6)],
        "vs_baseline_serving": round(REFERENCE_BEST_US / us_rank_planes, 3),
        "max_err_vs_oracle": max(err, err_rank),
        "rows": args.rows,
        "epochs": args.epochs,
        "device": str(jax.devices()[0]),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
