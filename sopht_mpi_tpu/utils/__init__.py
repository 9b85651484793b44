"""Utilities: precision, logging, IO, plotting, diagnostics.

Counterpart of /root/reference/sopht_mpi/utils/ minus the MPI machinery
(which lives in sopht_mpi_tpu.parallel as mesh/sharding helpers).
"""

from sopht_mpi_tpu.utils.types import get_dtype_eps, get_real_t, get_test_tol
from sopht_mpi_tpu.utils.logging_utils import FlowLogger, logger
from sopht_mpi_tpu.utils.plotting import Plotter2D, compile_video, lab_cmap
from sopht_mpi_tpu.utils.io import (
    CosseratRodIO,
    FieldBinding,
    FieldIO,
    load_rod_state,
    save_rod_state,
)
from sopht_mpi_tpu.utils.native_io import AsyncFieldDumper
from sopht_mpi_tpu.utils.snapshots import SnapshotWriter
from sopht_mpi_tpu.utils.profiling import block_timer, measure_op_time
from sopht_mpi_tpu.utils.checkpoint import CarryCheckpointer
