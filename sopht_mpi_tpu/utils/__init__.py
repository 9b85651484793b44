"""Utilities: precision, logging, IO, plotting, diagnostics.

Counterpart of /root/reference/sopht_mpi/utils/ minus the MPI machinery
(which lives in sopht_mpi_tpu.parallel as mesh/sharding helpers).
"""

from sopht_mpi_tpu.utils.types import get_dtype_eps, get_real_t, get_test_tol
