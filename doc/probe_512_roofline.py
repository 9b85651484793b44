"""Per-pass roofline accounting of the 512^3 single-chip FSI step
(VERDICT r04 next #6: "prove the floor or break it").

Measures every hot pass of the 512^3 step at its production shapes with
the tunnel-safe scan-amortized protocol (utils.profiling.measure_op_time)
and reports achieved HBM GB/s against the measured ~187 GB/s device
floor (PLAN.md "Measured device facts"). Shape-changing FFT passes are
measured as their forward+inverse PAIRS (shape-preserving chains, the
historical PLAN.md protocol); bytes per pass count HBM-resident inputs +
outputs (+ the Green's function read for the conv pass - its internal
doubled spectrum lives in VMEM only).

Run on the real chip (exclusive):  python doc/probe_512_roofline.py
Writes doc/roofline_512.json and prints the table.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

HBM_FLOOR_GBPS = 187.0  # measured elementwise-scale bandwidth (PLAN.md)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import sopht_mpi_tpu

    sopht_mpi_tpu.enable_fast_spectral()  # the production 512^3 config

    from sopht_mpi_tpu.ops import poisson as poisson_mod
    from sopht_mpi_tpu.ops.pallas_stencils_3d import (
        curl_3d_pallas,
        diffusion_penalise_vector_3d_pallas,
        rotational_curl_add_3d_pallas,
    )
    from sopht_mpi_tpu.parallel.pallas_fft import (
        fft_greens_ifft_pass,
        fft_pass_padded,
        ifft_pass_truncated,
        irfft_pass_merge,
        rfft_pass_padded_split,
    )
    from sopht_mpi_tpu.utils.profiling import measure_op_time

    N = int(os.environ.get("ROOFLINE_GRID", "512"))
    mx = my = mz = 2 * N
    bx = mx // 2
    f32 = jnp.float32
    nbytes = lambda *arrs: sum(
        4 * int(jnp.size(a)) if hasattr(a, "shape") else 4 * int(a)
        for a in arrs
    )
    gb = 1e9

    key = jax.random.PRNGKey(0)
    rows = []

    def row(label, seconds, moved_bytes, note=""):
        gbps = moved_bytes / seconds / gb
        rows.append(
            dict(
                pass_=label,
                ms=round(seconds * 1e3, 2),
                gbytes=round(moved_bytes / gb, 3),
                achieved_gbps=round(gbps, 1),
                pct_of_floor=round(100 * gbps / HBM_FLOOR_GBPS, 1),
                note=note,
            )
        )
        print(
            f"{label:<34s} {seconds * 1e3:8.2f} ms  "
            f"{moved_bytes / gb:7.2f} GB  {gbps:6.1f} GB/s  "
            f"{100 * gbps / HBM_FLOOR_GBPS:5.1f}% of floor  {note}",
            flush=True,
        )

    # greens FIRST (the build transients need max HBM headroom), then the
    # passes in decreasing-footprint order, freeing between measurements
    print("building 512^3 greens (device)...", flush=True)
    solver = poisson_mod.UnboundedPoissonSolver3D(N, N, N, x_range=1.0,
                                                  real_t=f32)
    greens = solver.fourier_greens_times_dx_pow_dim
    g_bulk = (
        greens[0]
        if isinstance(greens, tuple)
        else poisson_mod.split_pallas_greens(greens)[0]
    )

    # -- z conv pass (fused fwd*greens*inv; shape-preserving) -------------
    def z_arm():
        zp = (
            jax.random.normal(key, (1, N, my * bx), f32),
            jax.random.normal(key, (1, N, my * bx), f32),
            g_bulk.reshape(1, mz, my * bx),
        )

        def z_conv(p):
            fr, fi = fft_greens_ifft_pass(p[0], p[1], p[2], True)
            return fr, fi, p[2]

        b = 2 * (N * my * bx) * 4 * 2 + (mz * my * bx) * 4
        row("z conv fused pass (fast tier)",
            measure_op_time(z_conv, zp, iters=3, repeats=3), b,
            "per component; MXU-bound by design")

    z_arm()

    # -- y mid pair: padded fwd + truncated inv ---------------------------
    def y_arm():
        yp = (
            jax.random.normal(key, (N, N, bx), f32),
            jax.random.normal(key, (N, N, bx), f32),
        )

        def y_pair(p):
            fr, fi = fft_pass_padded(p[0], p[1], my)
            return ifft_pass_truncated(fr, fi)

        b = 2 * (N * N * bx) * 4 * 2 + 2 * (N * my * bx) * 4 * 2
        row("y fwd+inv mid pair",
            measure_op_time(y_pair, yp, iters=5, repeats=3), b,
            "per component")

    y_arm()

    # -- x edge pair: r2c split + c2r merge (shape-preserving chain) ------
    def x_arm():
        x_in = jax.random.normal(key, (N * N, N), f32)

        def x_pair(v):
            fr, fi, sr, si = rfft_pass_padded_split(v, mx)
            return irfft_pass_merge(fr, fi, sr, si, mx, N)

        b = (N * N * N) * 4 * 2 + (2 * N * N * bx + 2 * N * N) * 4 * 2
        row("x r2c+c2r edge pair",
            measure_op_time(x_pair, x_in, iters=5, repeats=3), b,
            "per component")

    x_arm()

    # -- stencil passes at 512^3 (drop the greens ref first) --------------
    dx_val = solver.dx
    del solver, greens, g_bulk
    w = jax.random.normal(key, (3, N, N, N), f32)
    fsv = jnp.asarray([1.0, 0.0, 0.0], f32)
    b3 = 4 * 3 * N * N * N  # one vector field

    row("curl (+fsv,+l1max)", measure_op_time(
        lambda x: curl_3d_pallas(x, 0.5 / dx_val, add_vector=fsv,
                                 compute_l1_max=True)[0],
        w, iters=5, repeats=3), 2 * b3)
    row("rotational transport", measure_op_time(
        lambda x: rotational_curl_add_3d_pallas(x, w, 0.5),
        w, iters=5, repeats=3), 3 * b3)
    row("diffusion+penalise", measure_op_time(
        lambda x: diffusion_penalise_vector_3d_pallas(x, 0.1, 2),
        w, iters=5, repeats=3), 2 * b3)

    # -- aggregate: the solve-dominated step ------------------------------
    per_comp = sum(r["ms"] for r in rows[:3])
    stencil = sum(r["ms"] for r in rows[3:])
    print(
        f"\nsolve passes x3 components = {3 * per_comp:.1f} ms; "
        f"stencil passes = {stencil:.1f} ms; "
        f"sum = {3 * per_comp + stencil:.1f} ms "
        "(chained step overlaps some of this; measured step "
        "~= 0.349 s at 385 Mcells/s, round 4)"
    )
    out = {
        "grid": N,
        "hbm_floor_gbps": HBM_FLOOR_GBPS,
        "passes": rows,
        "sum_solve_x3_ms": round(3 * per_comp, 1),
        "sum_stencils_ms": round(stencil, 1),
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "roofline_512.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
