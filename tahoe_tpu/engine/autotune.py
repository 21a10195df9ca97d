"""Exhaustive strategy enumeration — measure everything, pick the winner.

The reference's core benchmarking loop (BaseTahoeTest.h:633-710): build the
compiled forest once, run every strategy with warmup + timed epochs +
per-strategy correctness verdicts, skip infeasible ones with cost=inf, return
the argmin. Here each strategy can run in an isolated subprocess (see
bench_worker for why) or in-process (tests, non-axon runtimes).
"""
from __future__ import annotations

import dataclasses
import json
import os
import subprocess
import sys
import tempfile
import time
from typing import Dict, Optional

import numpy as np

from tahoe_tpu.config import ORACLE_ATOL, Strategy
from tahoe_tpu.forest import io
from tahoe_tpu.forest.spec import ForestSpec

# reference epoch counts: 5 warmup, 50 timed for the adaptive strategies
# (BaseTahoeTest.h:43, 684-698)
WARMUP_EPOCHS = 5
TIMED_EPOCHS = 50


@dataclasses.dataclass
class StrategyResult:
    strategy: Strategy
    us_per_sample: float = float("inf")
    max_err: float = float("nan")
    correct: bool = False
    skipped_reason: Optional[str] = None
    error: Optional[str] = None
    # (row_tile, tree_tile) that produced us_per_sample; None = defaults
    tiles: Optional[tuple] = None
    # [min, max] of the worker's three slope measurements (median-of-3
    # recording, VERDICT r4 #2); None for legacy/skip records
    us_band: Optional[list] = None

    @property
    def ran(self) -> bool:
        return self.skipped_reason is None and self.error is None


def tile_candidates(strategy: Strategy, spec: ForestSpec):
    """Tile configs to try per strategy when tile tuning is on. The defaults
    come first; extra candidates are the measured near-winners on v5e
    (scripts/tile_sweep.py). Infeasible candidates fail cleanly in the worker
    and are skipped."""
    if strategy == Strategy.RANK_MXU:
        # defaults first; (1024, 128) auto-split was the r2 SUSY-class winner
        cands = [None, (1024, 128), (512, 128), (256, 128), (128, 64)]
    elif strategy == Strategy.SPLIT_FOREST:
        cands = [None, (128, 64), (128, 128), (256, 64)]
    elif strategy == Strategy.VMEM_FOREST:
        cands = [None, (128, max(8, spec.num_trees))]
    else:
        return [None]
    seen, out = set(), []
    for c in cands:
        if c not in seen:
            seen.add(c)
            out.append(c)
    return out


def enumerate_strategies(
    spec: ForestSpec,
    data: np.ndarray,
    *,
    strategies=tuple(Strategy),
    subprocess_isolation: bool = True,
    warmup: int = WARMUP_EPOCHS,
    epochs: int = TIMED_EPOCHS,
    verbose: bool = True,
    tune_tiles: bool = False,
) -> Dict[Strategy, StrategyResult]:
    results: Dict[Strategy, StrategyResult] = {}
    with tempfile.TemporaryDirectory(prefix="tahoe_bench_") as td:
        spec_path = os.path.join(td, "forest.npz")
        data_path = os.path.join(td, "data.npy")
        io.save_forest_npz(spec_path, spec)
        np.save(data_path, np.asarray(data, np.float32))

        for s in strategies:
            cands = tile_candidates(s, spec) if tune_tiles else [None]
            r = StrategyResult(strategy=s)
            for tiles in cands:
                payload = _run_one(spec_path, data_path, s, warmup, epochs,
                                   subprocess_isolation, tiles)
                cand = StrategyResult(strategy=s, tiles=tiles)
                if "skipped" in payload:
                    cand.skipped_reason = payload["skipped"]
                elif "error" in payload:
                    cand.error = payload["error"]
                else:
                    cand.us_per_sample = payload["us_per_sample"]
                    cand.max_err = payload["max_err"]
                    cand.correct = payload["correct"]
                    cand.us_band = payload.get("us_band")
                if tiles is None:
                    r = cand
                elif (cand.ran and cand.correct
                      and cand.us_per_sample < r.us_per_sample):
                    r = cand
            results[s] = r
            if verbose:
                _print_result(r)
    return results


def best_strategy(results: Dict[Strategy, StrategyResult]) -> Optional[Strategy]:
    ran = [r for r in results.values() if r.ran and r.correct]
    if not ran:
        return None
    return min(ran, key=lambda r: r.us_per_sample).strategy


def _run_one(spec_path, data_path, strategy, warmup, epochs, isolate,
             tiles=None) -> dict:
    rt, tt = tiles if tiles else (None, None)
    if isolate:
        env = dict(os.environ)
        repo_root = os.path.abspath(
            os.path.join(os.path.dirname(__file__), "..", "..")
        )
        env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
        # persistent XLA compile cache so repeated enumerations don't pay the
        # (remote) compile cost per subprocess
        env.setdefault(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache", "tahoe_tpu_xla"),
        )
        cmd = [
            sys.executable, "-m", "tahoe_tpu.engine.bench_worker",
            spec_path, data_path, strategy.name, str(warmup), str(epochs),
            str(rt) if rt else "-", str(tt) if tt else "-",
        ]
        # Per-strategy wall cap. 1200 s covers every strategy except
        # cold-cache compiles of the depth-18 banded rank / depth-bucketed
        # forms (~54-66 us/sample dead tiers whose MEASUREMENT is quick but
        # whose Mosaic compile alone can exceed the cap on a fresh
        # container — r8's rf_deep18 record). The reference's enumeration
        # has no per-strategy cap at all (BaseTahoeTest.h:684-698), so a
        # sweep that wants complete dead-tier records can raise this.
        cap = int(os.environ.get("TAHOE_BENCH_TIMEOUT_S", "1200"))
        try:
            out = subprocess.run(
                cmd, capture_output=True, text=True, env=env, timeout=cap
            )
        except subprocess.TimeoutExpired:
            return {"error": f"benchmark subprocess timed out (> {cap} s)"}
        for line in reversed(out.stdout.strip().splitlines() or [""]):
            line = line.strip()
            if line.startswith("{"):
                try:
                    return json.loads(line)
                except json.JSONDecodeError:
                    continue
        return {"error": f"worker produced no result (stderr tail: "
                         f"{out.stderr.strip()[-300:]})"}
    from tahoe_tpu.engine import bench_worker

    return bench_worker.run(spec_path, data_path, strategy.name, warmup,
                            epochs, rt, tt)


def _print_result(r: StrategyResult) -> None:
    """Per-strategy report in the spirit of the reference's output contract
    (strategy banner + µs/sample + correctness verdict, BaseTahoeTest.h:682-704)."""
    n = r.strategy.strategy_number
    if r.skipped_reason:
        print(f"Using the #{n} strategy ({r.strategy.name}): skipped — {r.skipped_reason}")
        return
    if r.error:
        print(f"Using the #{n} strategy ({r.strategy.name}): FAILED — {r.error}")
        return
    verdict = "correct" if r.correct else "INCORRECT"
    tiles = f" [tiles {r.tiles[0]}x{r.tiles[1]}]" if r.tiles else ""
    print(
        f"Using the #{n} strategy ({r.strategy.name}): "
        f"{r.us_per_sample:.6f} us/sample — results are {verdict} "
        f"(max err {r.max_err:.2e}, tol {ORACLE_ATOL}){tiles}"
    )
