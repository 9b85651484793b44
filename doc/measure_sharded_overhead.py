"""Measure the shard_map wrapper overhead of the sharded Pallas stencil
path on ONE real chip (VERDICT r03 next #1 'Done' criterion): build the
flagship 256^3 rigid-FSI case on a (1,1) mesh - every stencil runs the
per-shard shard_map kernels (self-permute halos) while the Poisson solve
keeps the single-device fast path - and compare sec/step against the
meshless build (the unsharded plane kernels).

Run on the real chip (serialize with other TPU work):
    python doc/measure_sharded_overhead.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run(mesh, label, steps=10, reps=3):
    """Steady-state sec/step: repeat the timed call and report the LAST
    rep (PLAN.md fixed-point protocol - on a remote-compile relay the
    first timed call can still book one-off costs; the sharded build
    measured 41.6/37.5/37.6 ms across reps where the single-call reading
    was 39.8)."""
    import jax

    from __graft_entry__ import _build_fsi_case
    from sopht_mpi_tpu.models import scan_steps

    step, (carry,) = _build_fsi_case(grid_size=(256, 256, 256), mesh=mesh)
    carry, _ = scan_steps(step, carry, steps, donate=True)
    jax.block_until_ready(carry)
    secs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        carry, _ = scan_steps(step, carry, steps, donate=True)
        jax.block_until_ready(carry)
        secs.append((time.perf_counter() - t0) / steps)
    sec = secs[-1]
    hist = ", ".join(f"{s * 1e3:.2f}" for s in secs)
    print(
        f"{label:<28s} {sec * 1e3:8.2f} ms/step "
        f"({256**3 / sec / 1e6:6.1f} Mcells/s)  reps=[{hist}]",
        flush=True,
    )
    return sec


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from sopht_mpi_tpu.parallel import create_mesh

    base = run(None, "meshless (plane kernels)")
    mesh = create_mesh(3, (1, 1), devices=jax.devices()[:1])
    sharded = run(mesh, "mesh (1,1) shard_map path")
    print(
        f"wrapper overhead: {(sharded - base) * 1e3:+.2f} ms/step "
        f"({(sharded / base - 1) * 100:+.1f}%)"
    )


if __name__ == "__main__":
    main()
