"""Rigid bodies (JAX counterpart of the PyElastica rigid bodies the
reference consumes: ``elastica.Cylinder``, ``elastica.Sphere``; see
/root/reference/examples/2d_examples/FlowPastCylinderCase/
flow_past_cylinder.py:34-43, 3d .../flow_past_sphere_case.py).

State is a small pytree; the reference examples use fixed (or externally
prescribed) rigid bodies, so kinematics - position, velocity, angular
velocity - are what the forcing grids consume. ``body_flow_forces`` /
``body_flow_torques`` computed by the interactor can drive user-side
dynamics if desired.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class RigidBodyState(NamedTuple):
    """Rigid body kinematic state (pytree).

    position/velocity/angular velocity are in the global frame, shape (3,)
    (2D bodies use the x-y components and z rotation).
    ``director`` is the rotation matrix body->global, shape (3, 3).
    """

    position: jax.Array
    velocity: jax.Array
    omega: jax.Array
    director: jax.Array

    @staticmethod
    def create(position, velocity=None, omega=None, director=None, dtype=None):
        position = jnp.asarray(position, dtype=dtype)
        dtype = position.dtype
        if position.shape[0] == 2:
            position = jnp.concatenate([position, jnp.zeros(1, dtype)])
        return RigidBodyState(
            position=position,
            velocity=(
                jnp.zeros(3, dtype) if velocity is None
                else jnp.asarray(velocity, dtype)
            ),
            omega=(
                jnp.zeros(3, dtype) if omega is None
                else jnp.asarray(omega, dtype)
            ),
            director=(
                jnp.eye(3, dtype=dtype) if director is None
                else jnp.asarray(director, dtype)
            ),
        )


class Cylinder:
    """2D circular cylinder (axis out of plane).

    Mirrors the usage of ``elastica.Cylinder`` in the reference 2D examples
    (flow_past_cylinder.py:34-43)."""

    def __init__(self, center, radius, dtype=jnp.float32):
        self.radius = float(radius)
        self.state = RigidBodyState.create(np.asarray(center), dtype=dtype)

    n_elems = 1


class Sphere:
    """Rigid sphere (reference 3D flow-past-sphere case)."""

    def __init__(self, center, radius, dtype=jnp.float32):
        self.radius = float(radius)
        self.state = RigidBodyState.create(np.asarray(center), dtype=dtype)

    n_elems = 1
