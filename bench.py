"""Benchmark: 3D flow-past-sphere FSI step throughput on one chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "Mcells/s", "vs_baseline": N}

Metric: million Eulerian cell-updates per second for the full fused
coupled FSI timestep (CFL dt control + penalty IBM interaction +
rotational-form Navier-Stokes step with unbounded Poisson velocity
recovery), rolled out with a single on-device ``lax.scan`` - the
north-star configuration of BASELINE.json ("3D 256^3 FSI
Mcell-updates/sec/chip").

The reference publishes no numbers (BASELINE.md), and its MPI stack cannot
be provisioned here (no mpi4py/FFTW/pystencils, no egress), so vs_baseline
uses a MEASURED proxy: the same fused FSI step - dense reference-shaped
IBM path, reference-faithful forcing-grid sizing (n_eq = 120 at 256^3) -
timed on the host CPU via XLA (doc/baseline_cpu_measurement.py, results
in doc/baseline_cpu_measured.json: 31.50 s/step at 256^3 on 1 core,
compile excluded), scaled by an IDEAL 64-rank speedup (generous to the
reference) -> 0.4922 s/step at 256^3. See BASELINE.md for the derivation.
"""

import json
import os
import time

GRID = int(os.environ.get("BENCH_GRID", "256"))
STEPS = int(os.environ.get("BENCH_STEPS", "10"))
# BENCH_CASE selects the flagship workload (VERDICT r04 next #3):
#   sphere    - rigid flow-past-sphere FSI at (G, G, G)  [the north star]
#   rod       - flexible-rod FSI at the reference's own aspect (G, G/4, G)
#               (flow_past_rod_case.py:309-314: nz=nx, ny=nx/4)
#   multibody - mixed rod + rigid sphere at (G/2, G/2, G) (BASELINE cfg 5)
CASE = os.environ.get("BENCH_CASE", "sphere")


def _case_grid(case: str, g: int) -> tuple[int, int, int]:
    if case == "rod":
        return (g, max(8, g // 4), g)
    if case == "multibody":
        return (max(8, g // 2), max(8, g // 2), g)
    return (g, g, g)


def _baseline_sec_per_step() -> float | None:
    """Measured-CPU-derived 64-rank baseline for THIS case AT THE BENCHED
    GRID (see module docstring); read from the measurement artifact so the
    numbers and their provenance stay in one place. Returns None when the
    artifact has no measurement for this case+grid - vs_baseline is then
    emitted as null rather than a meaningless cross-config ratio."""
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "doc",
        "baseline_cpu_measured.json",
    )
    import sys

    fallback_256 = 0.4922  # the recorded sphere 256^3 measurement, inlined
    try:
        with open(path) as f:
            data = json.load(f)
        if CASE == "sphere":
            per_grid = data["measured_sec_per_step_1core"]
        else:
            per_grid = data.get("cases", {}).get(CASE, {}).get(
                "measured_sec_per_step_1core", {}
            )
        ranks = float(data["assumed_ranks"])
        if str(GRID) not in per_grid:
            print(
                f"WARNING: no measured CPU baseline for case {CASE} at "
                f"grid {GRID} (have {sorted(per_grid)}); emitting "
                "vs_baseline=null",
                file=sys.stderr,
            )
            return None
        return float(per_grid[str(GRID)]) / ranks
    except (OSError, KeyError, ValueError, TypeError) as e:
        # keep stdout as the single JSON line; warn loudly on stderr so a
        # missing/corrupt artifact cannot silently skew vs_baseline
        print(
            f"WARNING: baseline artifact unreadable ({e!r}); using the "
            f"inlined recorded 256^3 measurement {fallback_256} s/step",
            file=sys.stderr,
        )
        return fallback_256 if GRID == 256 and CASE == "sphere" else None


BASELINE_SEC_PER_STEP = _baseline_sec_per_step()


def main():
    import jax

    # persistent compile cache: the axon tunnel makes fresh compiles slow
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    # Round 4: the fast spectral mode (3-pass bf16 conv-kernel matmuls,
    # solve rel err 6.6e-6 vs HIGHEST ~1e-7, sphere Cd identical to 4
    # decimals; + the numerically-exact fused spectral-curl recovery) is
    # the TPU DEFAULT (ops/poisson.py DEFAULT_FAST_SPECTRAL). BENCH_FAST
    # forces it on explicitly; BENCH_NO_FAST=1 benches the 6-pass HIGHEST
    # tier (~1e-7) for A/B.
    if os.environ.get("BENCH_NO_FAST"):
        import sopht_mpi_tpu

        sopht_mpi_tpu.enable_fast_spectral(False)
    elif os.environ.get("BENCH_FAST"):
        import sopht_mpi_tpu

        sopht_mpi_tpu.enable_fast_spectral()

    import numpy as np

    from __graft_entry__ import (
        _build_fsi_case,
        _build_multibody_bench_case,
        _build_rod_bench_case,
    )
    from sopht_mpi_tpu.models import scan_steps

    grid_size = _case_grid(CASE, GRID)
    if CASE == "rod":
        # BENCH_ROD_REFRESH=flow_step measures the opt-in frozen-loads
        # approximation arm (see build_rod_fsi_step); default = the
        # reference's per-substep-refresh semantics
        fsi_step, (carry,) = _build_rod_bench_case(
            grid_size=grid_size,
            substep_load_refresh=os.environ.get(
                "BENCH_ROD_REFRESH", "every"
            ),
        )
    elif CASE == "multibody":
        fsi_step, (carry,) = _build_multibody_bench_case(
            grid_size=grid_size,
            substep_load_refresh=os.environ.get(
                "BENCH_ROD_REFRESH", "every"
            ),
        )
    elif CASE == "sphere":
        fsi_step, (carry,) = _build_fsi_case(grid_size=grid_size)
    else:
        raise ValueError(f"BENCH_CASE must be sphere|rod|multibody, got {CASE}")

    # warmup / compile
    carry, _ = scan_steps(fsi_step, carry, STEPS, donate=True)
    jax.block_until_ready(carry)

    t0 = time.perf_counter()
    carry, diag = scan_steps(fsi_step, carry, STEPS, donate=True)
    jax.block_until_ready(carry)
    t1 = time.perf_counter()

    # sparse-window cases carry a per-step window_ok flag - a tripped
    # window means clipped forcing, so the number would not be honest
    if isinstance(diag, tuple) and len(diag) == 2 and hasattr(
        diag[1], "dtype"
    ) and diag[1].dtype == bool:
        assert bool(np.all(np.asarray(diag[1]))), "forcing window tripped"

    n_cells = int(np.prod(grid_size))
    sec_per_step = (t1 - t0) / STEPS
    mcells_per_s = n_cells / sec_per_step / 1e6
    vs_baseline = (
        round(BASELINE_SEC_PER_STEP / sec_per_step, 3)
        if BASELINE_SEC_PER_STEP is not None
        else None
    )
    # self-describing accuracy tier (VERDICT r04 next #4): which spectral
    # tier the solve ran, and its validated solve-error class
    from sopht_mpi_tpu.ops.poisson import resolve_fast_spectral

    fast = resolve_fast_spectral(None)
    grid_tag = (
        f"{GRID}cubed" if CASE == "sphere"
        else "x".join(str(g) for g in grid_size)
    )
    print(
        json.dumps(
            {
                "metric": f"3d_fsi_{CASE}_{grid_tag}_step_throughput",
                "value": round(mcells_per_s, 3),
                "unit": "Mcells/s",
                "vs_baseline": vs_baseline,
                "sec_per_step": round(sec_per_step, 6),
                "grid": list(grid_size),
                "steps": STEPS,
                "case": CASE,
                "fast_spectral": bool(fast),
                "solve_rel_err_class": (
                    "~6.6e-6 (bf16 3-pass conv tier)"
                    if fast
                    else "~1e-7 (HIGHEST; reference FFTW-f32 class)"
                ),
            }
        )
    )


def _looks_transient(text: str) -> bool:
    """Known-transient axon-tunnel / remote-TPU fault signatures
    (PLAN.md "Benchmarking gotchas"): the device comes back after a
    wedge-out period; the code is not at fault."""
    return any(
        s in text
        for s in (
            "FAILED_PRECONDITION",
            "FailedPrecondition",
            "UNAVAILABLE",
            "DEADLINE_EXCEEDED",
            "TPU device error",
            "Socket closed",
        )
    )


def _run_with_retries():
    """Run the measurement in a FRESH subprocess with bounded retries on
    transient tunnel faults, so a single wedged-relay fault cannot cost the
    round its bench artifact (round-2 BENCH_r02.json was rc=1 on exactly
    such a fault). The child prints the single JSON line; the parent
    forwards only that line to stdout."""
    import subprocess
    import sys

    attempts = int(os.environ.get("BENCH_RETRIES", "3"))
    last_rc = 1
    for i in range(attempts):
        env = dict(os.environ, _SOPHT_BENCH_CHILD="1")
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env,
                capture_output=True,
                text=True,
                timeout=int(os.environ.get("BENCH_ATTEMPT_TIMEOUT", "3000")),
            )
        except subprocess.TimeoutExpired as e:
            print(f"bench attempt {i + 1}/{attempts}: timeout ({e})",
                  file=sys.stderr)
            last_rc = 124
            time.sleep(60)
            continue
        if proc.stderr:
            sys.stderr.write(proc.stderr)
        json_lines = [
            ln for ln in proc.stdout.splitlines()
            if ln.startswith("{") and '"metric"' in ln
        ]
        if proc.returncode == 0 and json_lines:
            sys.stdout.write(json_lines[-1] + "\n")
            return
        last_rc = proc.returncode or 1
        blob = proc.stdout + proc.stderr
        if not _looks_transient(blob):
            # real failure: forward output and stop retrying
            sys.stdout.write(proc.stdout)
            sys.exit(last_rc)
        print(
            f"bench attempt {i + 1}/{attempts}: transient device fault "
            f"(rc={proc.returncode}); backing off before retry",
            file=sys.stderr,
        )
        # after a tunnel fault the device can stay wedged for minutes
        time.sleep(30 * (i + 1))
    sys.exit(last_rc)


if __name__ == "__main__":
    if os.environ.get("_SOPHT_BENCH_CHILD"):
        main()
    else:
        _run_with_retries()
