"""Feature specification: the regression basis as *data*, not code.

The reference configures features by pasting literal OpenCL expressions into
the kernels through a ``-D FEATURE_BUFFERS=...`` build option
(opencl/bmfr.cpp:65-77, expanded at opencl/bmfr.cl:448-453 and :727-729) and
infers the count by counting commas (opencl/bmfr.cpp:195-199).

Here a feature is a named function ``(normals[3,H,W], positions[3,H,W]) ->
f32[H,W]``. The standard multi-order basis is registered below; users add
custom features with :func:`register_feature`. Both the accumulation stage
(feature build for the fit, opencl/bmfr.cl:447-453) and the weighted-sum
reconstruction (opencl/bmfr.cl:724-729) evaluate the same registry, which is
what keeps the two sides consistent by construction.
"""

from __future__ import annotations

import jax.numpy as jnp

FEATURE_REGISTRY = {}


def register_feature(name: str, fn):
    """Register a feature ``fn(normals, positions) -> [H, W]`` under a name."""
    FEATURE_REGISTRY[name] = fn
    return fn


def _reg(name):
    def deco(fn):
        return register_feature(name, fn)

    return deco


@_reg("const")
def _const(n, p):
    return jnp.ones_like(n[0])


@_reg("normal_x")
def _nx(n, p):
    return n[0]


@_reg("normal_y")
def _ny(n, p):
    return n[1]


@_reg("normal_z")
def _nz(n, p):
    return n[2]


@_reg("world_position_x")
def _px(n, p):
    return p[0]


@_reg("world_position_y")
def _py(n, p):
    return p[1]


@_reg("world_position_z")
def _pz(n, p):
    return p[2]


@_reg("world_position_x2")
def _px2(n, p):
    return p[0] * p[0]


@_reg("world_position_y2")
def _py2(n, p):
    return p[1] * p[1]


@_reg("world_position_z2")
def _pz2(n, p):
    return p[2] * p[2]


def evaluate_features(names, normals, positions):
    """Evaluate named features -> ``f32[len(names), H, W]``.

    ``normals`` and ``positions`` are channels-first ``[3, H, W]``.
    """
    planes = [FEATURE_REGISTRY[name](normals, positions) for name in names]
    return jnp.stack(planes)
