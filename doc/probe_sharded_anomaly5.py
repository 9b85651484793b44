"""Fifth-stage: confirm the anomaly is sharding-fixed-point RECOMPILES.

Theory: the init carry's leaf shardings (NamedSharding fields + default
scalars) differ from the step's GSPMD-inferred OUTPUT shardings, so the
second scan_steps call - the timed one in measure_sharded_overhead.py -
recompiles (remote_compile over the axon tunnel: seconds), which was
booked as per-step cost. Call 3+ should hit the fixed point and be fast.

Run alone on the real chip:  python doc/probe_sharded_anomaly5.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_log_compiles", True)

    from sopht_mpi_tpu.parallel import create_mesh
    from __graft_entry__ import _build_fsi_case
    from sopht_mpi_tpu.models import scan_steps

    mesh = create_mesh(3, (1, 1), devices=jax.devices()[:1])
    step, (carry,) = _build_fsi_case(grid_size=(256, 256, 256), mesh=mesh)

    def fetch(c):
        np.asarray(c.flow_state.primary_field.ravel()[:2])

    for i in range(5):
        t0 = time.perf_counter()
        carry, _ = scan_steps(step, carry, 5, donate=True)
        fetch(carry)
        sec = (time.perf_counter() - t0) / 5
        print(f"call {i}: {sec*1e3:9.2f} ms/step", flush=True)

    def shard_desc(c):
        return [
            (path, str(leaf.sharding))
            for path, leaf in jax.tree_util.tree_leaves_with_path(c)
        ]

    step2, (carry2,) = _build_fsi_case(grid_size=(256, 256, 256), mesh=mesh)
    out2, _ = scan_steps(step2, carry2, 1, donate=False)
    for (p1, s1), (p2, s2) in zip(shard_desc(carry2), shard_desc(out2)):
        mark = "  SAME" if s1 == s2 else "  DIFF"
        if mark == "  DIFF":
            print(f"{mark} {jax.tree_util.keystr(p1)}\n   in : {s1}\n"
                  f"   out: {s2}", flush=True)


if __name__ == "__main__":
    main()
