"""Profiling helper tests."""

import jax.numpy as jnp

from sopht_mpi_tpu.utils import block_timer, measure_op_time


def test_block_timer_records_elapsed():
    results = {}
    with block_timer("t", results=results, echo=None):
        results["x"] = jnp.ones((8, 8)) * 2
    assert results["elapsed_s"] > 0


def test_measure_op_time_positive():
    t = measure_op_time(lambda x: x * 1.0001 + 1e-6, jnp.ones((64, 64)),
                        iters=4, repeats=1)
    assert t > 0
