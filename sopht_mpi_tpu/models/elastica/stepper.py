"""Position-Verlet time stepping and the system-collection API.

Mirrors the PyElastica surface the reference drives
(/root/reference/examples/2d_examples/FlowPastRodCase/flow_past_rod.py:
42-46 ``class FlowPastRodSimulator(ea.BaseSystemCollection, ea.Constraints,
ea.Forcing, ea.Damping)``, :185-189 ``ea.PositionVerlet`` +
``ea.extend_stepper_interface``, :276-284 substepped ``do_step``), with a
functional JAX core: the whole per-rod step (both kinematic half steps,
the dynamic update, constraints, pure forcings, damping) is ONE compiled
function; host-dependent forcings (the FSI ``FlowForces``) enter as traced
force/torque buffers refreshed between sub-steps, exactly like the
reference loop refreshes the interactor.

Stepping scheme (PyElastica's PositionVerlet):
    1. kinematic half step:  x += dt/2 v ; Q <- exp(-dt/2 w^) Q ;
       constrain values
    2. dynamic step: accelerations at the half-step configuration
       (internal + external forcing), v += dt dv/dt, w += dt dw/dt;
       constrain rates; dampen rates
    3. kinematic half step again; constrain values
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from sopht_mpi_tpu.models.elastica.rod import (
    CosseratRod,
    compute_accelerations,
    kinematic_step,
)


class PositionVerlet:
    """Marker class for API parity with ``ea.PositionVerlet``."""


def make_rod_step_fn(params, constraints, pure_forcings, dampers):
    """Build the pure one-step function for a rod.

    Returns ``step(state, time, dt, host_forces, host_torques) -> state``
    where the host buffers carry forcing contributions computed outside
    jit (zero arrays when there are none).
    """

    def constrain_values(state):
        for bc in constraints:
            state = bc.constrain_values(state)
        return state

    def constrain_rates(state):
        for bc in constraints:
            state = bc.constrain_rates(state)
        return state

    def step(state, time, dt, host_forces, host_torques):
        half_dt = 0.5 * dt
        # stage 1: kinematic half step
        state = kinematic_step(state, half_dt)
        state = constrain_values(state)
        # stage 2: dynamic step at the half-step configuration
        forces = host_forces
        torques = host_torques
        for forcing in pure_forcings:
            f, t = forcing.compute(state, params, time + half_dt)
            forces = forces + f
            torques = torques + t
        dvdt, dwdt = compute_accelerations(state, params, forces, torques)
        state = state._replace(
            velocity=state.velocity + dt * dvdt,
            omega=state.omega + dt * dwdt,
        )
        state = constrain_rates(state)
        for damper in dampers:
            state = damper.dampen_rates(state, params)
        # stage 3: kinematic half step
        state = kinematic_step(state, half_dt)
        state = constrain_values(state)
        return state

    return step


class BaseSystemCollection:
    """Rod system collection with the reference's builder API::

        sim = BaseSystemCollection()
        sim.append(rod)
        sim.constrain(rod).using(OneEndFixedBC, ...)
        sim.add_forcing_to(rod).using(GravityForces, acc_gravity=...)
        sim.dampen(rod).using(AnalyticalLinearDamper, ...)
        sim.finalize()

    Multiple-inheritance mixins (``ea.Constraints`` etc.) are collapsed
    into one class: the builder methods are always available.
    """

    def __init__(self):
        self._systems: list[CosseratRod] = []
        self._constraints: dict[int, list] = {}
        self._forcings: dict[int, list] = {}
        self._dampers: dict[int, list] = {}
        self._finalized = False

    def append(self, system):
        self._systems.append(system)

    def _builder(self, registry, system):
        idx = self._systems.index(system)

        class _Using:
            def using(self, cls, *args, **kwargs):
                registry.setdefault(idx, []).append((cls, args, kwargs))
                return self

        return _Using()

    def constrain(self, system):
        return self._builder(self._constraints, system)

    def add_forcing_to(self, system):
        return self._builder(self._forcings, system)

    def dampen(self, system):
        return self._builder(self._dampers, system)

    def finalize(self):
        """Instantiate constraints/forcings/dampers and compile one step
        function per rod. ``OneEndFixedBC``-style constraints capture the
        *current* (initial) constrained values, matching PyElastica's
        finalize semantics."""
        from sopht_mpi_tpu.models.elastica.forcing import (
            GeneralConstraint,
            OneEndFixedBC,
        )

        self._step_fns = []
        self._host_forcings = []
        for idx, rod in enumerate(self._systems):
            constraints = []
            for cls, args, kwargs in self._constraints.get(idx, []):
                if cls in (OneEndFixedBC, GeneralConstraint):
                    # capture the current (initial) constrained values,
                    # matching PyElastica's finalize semantics
                    kw = dict(kwargs)
                    node_idx = kw.pop("constrained_position_idx", (0,))[0]
                    elem_idx = kw.pop("constrained_director_idx", (0,))[0]
                    constraints.append(
                        cls(
                            rod.state.position[:, node_idx],
                            rod.state.director[:, :, elem_idx],
                            node_idx=node_idx,
                            elem_idx=elem_idx,
                            **kw,
                        )
                    )
                else:
                    constraints.append(cls(*args, **kwargs))
            forcings = [
                cls(*args, **kwargs)
                for cls, args, kwargs in self._forcings.get(idx, [])
            ]
            dampers = [
                cls(*args, **kwargs)
                for cls, args, kwargs in self._dampers.get(idx, [])
            ]
            pure = [f for f in forcings if not getattr(f, "requires_host", False)]
            host = [f for f in forcings if getattr(f, "requires_host", False)]
            step = make_rod_step_fn(rod.params, constraints, pure, dampers)
            self._step_fns.append(jax.jit(step))
            self._host_forcings.append(host)
        self._finalized = True

    # -- stepping -------------------------------------------------------------

    def step(self, time: float, dt: float) -> float:
        """One position-Verlet step for every system in the collection."""
        assert self._finalized, "call finalize() before stepping"
        for idx, rod in enumerate(self._systems):
            hf = jnp.zeros_like(rod.external_forces)
            ht = jnp.zeros_like(rod.external_torques)
            for forcing in self._host_forcings[idx]:
                f, t = forcing.compute_host(rod, time)
                hf = hf + f
                ht = ht + t
            dtype = rod.state.position.dtype
            rod.state = self._step_fns[idx](
                rod.state, dtype.type(time), dtype.type(dt), hf, ht
            )
        return time + dt

    def run_steps(self, time: float, dt: float, n_steps: int) -> float:
        """Advance ``n_steps`` with a single on-device ``lax.scan``
        (only valid when no host-dependent forcings are registered)."""
        assert self._finalized, "call finalize() before stepping"
        for idx, rod in enumerate(self._systems):
            if self._host_forcings[idx]:
                raise ValueError(
                    "run_steps requires all forcings to be jit-pure"
                )
            rod.state = _scan_steps(
                self._step_fns[idx].__wrapped__,
                rod.state,
                rod.state.position.dtype.type(time),
                rod.state.position.dtype.type(dt),
                n_steps,
                jnp.zeros_like(rod.external_forces),
                jnp.zeros_like(rod.external_torques),
            )
        return time + n_steps * dt


@functools.partial(jax.jit, static_argnums=(0, 4))
def _scan_steps(step_fn, state, time, dt, n_steps, zero_f, zero_t):
    def body(carry, _):
        state, t = carry
        state = step_fn(state, t, dt, zero_f, zero_t)
        return (state, t + dt), None

    (state, _), _ = jax.lax.scan(body, (state, time), None, length=n_steps)
    return state


def extend_stepper_interface(timestepper, system_collection):
    """API parity with ``ea.extend_stepper_interface`` (flow_past_rod.py:
    186-188): returns ``(do_step, stages_and_updates)`` where
    ``do_step(timestepper, stages_and_updates, sim, time, dt) -> time``."""

    def do_step(_timestepper, _stages, collection, time, dt):
        return collection.step(time, dt)

    return do_step, None
