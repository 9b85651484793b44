# Developer entry points (counterpart of the reference's Makefile targets,
# /root/reference/Makefile:13-31,90-92, minus the MPI/FFTW build machinery
# that the TPU stack does not need).

.PHONY: test test-fast bench bench-fast lint examples-smoke

test:
	python -m pytest tests/ -x -q

test-fast:
	python -m pytest tests/ -x -q -k "not simulator and not interaction"

bench:
	python bench.py

bench-small:
	BENCH_GRID=128 BENCH_STEPS=10 python bench.py

bench-fast:
	BENCH_FAST=1 python bench.py

lint:
	python -m compileall -q sopht_mpi_tpu examples tests bench.py __graft_entry__.py

examples-smoke:
	JAX_PLATFORMS=cpu python examples/2d/lamb_oseen_vortex.py --grid-size 64
