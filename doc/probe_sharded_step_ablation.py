"""Ablate the mesh-(1,1) residual wrapper overhead (+4.15 ms/step at
256^3 after round 4's fused sharded diffpen + replicated sparse IBM):

  A. meshless baseline
  B. mesh (1,1), current code (sharding constraints on the IBM window)
  C. mesh (1,1), with_sharding_constraint patched to identity (tests
     whether the explicit replicate/reshard constraints force copies)
  D. mesh (1,1), dense IBM (sparse_forcing=False) for reference

Each timing is the steady state of repeated timed scan_steps calls
(fixed-point check per PLAN.md: first call may hide a recompile).

Run alone (the chip is exclusive): python doc/probe_sharded_step_ablation.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def measure(mesh, steps=10, reps=3, sparse=None):
    import jax

    from __graft_entry__ import _build_fsi_case
    from sopht_mpi_tpu.models import scan_steps

    step, (carry,) = _build_fsi_case(
        grid_size=(256, 256, 256), mesh=mesh, sparse_forcing=sparse
    )
    carry, _ = scan_steps(step, carry, steps, donate=True)
    jax.block_until_ready(carry)
    secs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        carry, _ = scan_steps(step, carry, steps, donate=True)
        jax.block_until_ready(carry)
        secs.append((time.perf_counter() - t0) / steps)
    return secs


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from sopht_mpi_tpu.parallel import create_mesh

    def report(label, secs):
        ms = ", ".join(f"{s * 1e3:.2f}" for s in secs)
        print(f"{label:<38s} [{ms}] ms/step", flush=True)

    report("A meshless", measure(None))
    mesh = create_mesh(3, (1, 1), devices=jax.devices()[:1])
    report("B mesh(1,1) current", measure(mesh))

    # C: identity-patch the sharding constraints used by the sparse step
    orig = jax.lax.with_sharding_constraint
    jax.lax.with_sharding_constraint = lambda x, s: x
    try:
        report("C mesh(1,1) no-constraints", measure(mesh))
    finally:
        jax.lax.with_sharding_constraint = orig

    report("D mesh(1,1) dense IBM", measure(mesh, sparse=False))


if __name__ == "__main__":
    main()
