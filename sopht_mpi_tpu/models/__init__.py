"""Physics models: flow simulators, immersed bodies, rods, rigid bodies.

Counterpart of /root/reference/sopht_mpi/simulator/ (L3 in SURVEY.md) plus
the external PyElastica structural-dynamics dependency, re-implemented in
JAX so the whole FSI step jits.
"""

from sopht_mpi_tpu.models.flow.simulator_2d import UnboundedFlowSimulator2D
from sopht_mpi_tpu.models.flow.simulator_3d import UnboundedFlowSimulator3D
from sopht_mpi_tpu.models.rigid_body import (
    Cylinder,
    RigidBodyState,
    Sphere,
    rigid_body_position_verlet_step,
)
from sopht_mpi_tpu.models.immersed_body import (
    CircularCylinderForcingGrid,
    CosseratRodEdgeForcingGrid,
    CosseratRodElementCentricForcingGrid,
    CosseratRodFlowInteraction,
    CosseratRodSurfaceForcingGrid,
    EmptyForcingGrid,
    ImmersedBodyForcingGrid,
    ImmersedBodyFlowInteraction,
    RigidBodyFlowInteraction,
    SphereForcingGrid,
)
from sopht_mpi_tpu.models import elastica
from sopht_mpi_tpu.models.fsi import (
    RigidFSICarry,
    RodFSICarry,
    MultiBodyFSICarry,
    RodBody,
    DynamicRigidBody,
    FixedRigidBody,
    build_rigid_fsi_step,
    build_rod_fsi_step,
    build_multi_body_fsi_step,
    suggest_rigid_forcing_window,
    suggest_rod_forcing_window,
    init_rigid_fsi_carry,
    init_rod_fsi_carry,
    init_multi_body_fsi_carry,
    build_flow_only_step,
    init_flow_only_carry,
    scan_steps,
)
from sopht_mpi_tpu.models.elastica import (
    AnalyticalLinearDamper,
    BaseSystemCollection,
    CosseratRod,
    EndpointForces,
    FlowForces,
    GeneralConstraint,
    GravityForces,
    OneEndFixedBC,
    PositionVerlet,
    extend_stepper_interface,
)
