"""Fourth-stage isolation: the compiled sharded FSI step is ~70 ms/step
(probe 3 J), so the 1.5-3.5 s/step readings came from the MEASUREMENT
path (scan_steps + jax.block_until_ready + donate on a NamedSharding
carry through the axon relay). Identify which ingredient:

  P1 sharded 3x256^3: jit(x+1); time block_until_ready vs tiny fetch
  P2 unsharded same
  P3 scan_steps donate=True on the sharded carry, sync via tiny fetch
  P4 scan_steps donate=False on the sharded carry, sync via tiny fetch

Run alone on the real chip:  python doc/probe_sharded_anomaly4.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def tiny_fetch(x):
    import jax
    import numpy as np

    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf.ravel()[:2])


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from sopht_mpi_tpu.parallel import create_mesh
    from sopht_mpi_tpu.parallel.mesh import shard_vector_field

    mesh = create_mesh(3, (1, 1), devices=jax.devices()[:1])

    inc = jax.jit(lambda x: x + 1)

    for label, arr in (
        ("P1 sharded", shard_vector_field(
            jnp.ones((3, 256, 256, 256), jnp.float32), mesh)),
        ("P2 unsharded", jnp.ones((3, 256, 256, 256), jnp.float32)),
    ):
        y = inc(arr)
        tiny_fetch(y)
        y = inc(y)
        t0 = time.perf_counter()
        jax.block_until_ready(y)
        t_block = time.perf_counter() - t0
        y = inc(y)
        t0 = time.perf_counter()
        tiny_fetch(y)
        t_fetch = time.perf_counter() - t0
        print(f"{label:<14s} block_until_ready {t_block*1e3:9.2f} ms   "
              f"tiny-fetch {t_fetch*1e3:9.2f} ms", flush=True)

    from __graft_entry__ import _build_fsi_case
    from sopht_mpi_tpu.models import scan_steps

    step, (carry,) = _build_fsi_case(grid_size=(256, 256, 256), mesh=mesh)

    for label, donate in (("P3 scan donate=True", True),
                          ("P4 scan donate=False", False)):
        c, _ = scan_steps(step, carry, 5, donate=donate)
        tiny_fetch(c.flow_state.primary_field)
        t0 = time.perf_counter()
        c, _ = scan_steps(step, c, 5, donate=donate)
        tiny_fetch(c.flow_state.primary_field)
        sec = (time.perf_counter() - t0) / 5
        print(f"{label:<24s} {sec*1e3:9.2f} ms/step (tiny-fetch sync)",
              flush=True)
        if donate:
            carry = _build_fsi_case(grid_size=(256, 256, 256),
                                    mesh=mesh)[1][0]


if __name__ == "__main__":
    main()
