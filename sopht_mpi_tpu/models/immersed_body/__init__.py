from sopht_mpi_tpu.models.immersed_body.forcing_grids import (
    CircularCylinderForcingGrid,
    EmptyForcingGrid,
    ImmersedBodyForcingGrid,
    SphereForcingGrid,
)
from sopht_mpi_tpu.models.immersed_body.interaction import (
    ImmersedBodyFlowInteraction,
    RigidBodyFlowInteraction,
)
