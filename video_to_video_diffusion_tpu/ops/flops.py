"""Exact analytic model-FLOP counting by walking a function's jaxpr.

Why not XLA's `compiled.cost_analysis()['flops']`: on the TPU backend it
reports the *post-optimization* flop count of the lowered executable, which
undercounts convolutions that XLA rewrites (measured ~9x low on the UNet
forward vs the closed-form conv count — see docs/RESULTS.md, MFU section).
MFU's numerator is conventionally *model* FLOPs (2 x MACs of the math the
model defines), so we count the traced primitives directly:

  conv_general_dilated: 2 * prod(out_shape) * (C_in / feature_groups)
                          * prod(kernel_spatial)
  dot_general:          2 * prod(out_shape) * prod(contracted_dims)

Everything elementwise (norms, activations, sampler arithmetic) is ignored,
matching the standard MFU convention. Control-flow sub-jaxprs are walked
recursively; a `scan` body is multiplied by its trip count — which is also
what makes this counter correct for the DDIM sampling scan where XLA's cost
analysis counts the body once regardless of length.

No reference counterpart (the reference never measures FLOPs); TPU-native
perf accounting per VERDICT r1 item 5.
"""

from __future__ import annotations

import math
from typing import Any

import jax


def _prod(xs) -> float:
    out = 1.0
    for x in xs:
        out *= float(x)
    return out


def _conv_flops(eqn) -> float:
    out_shape = eqn.outvars[0].aval.shape
    kernel_shape = eqn.invars[1].aval.shape
    dn = eqn.params["dimension_numbers"]
    # rhs_spec: (out_ch_dim, in_ch_dim, *spatial_dims)
    rhs_spec = dn.rhs_spec
    c_in = kernel_shape[rhs_spec[1]]  # per-group input channels already
    k_spatial = _prod(kernel_shape[d] for d in rhs_spec[2:])
    # Transposed convs arrive as lhs-dilated convs: only ~1/prod(dilation)
    # of the kernel taps hit real (non-inserted-zero) input, so the dense
    # formula overcounts by that factor (exact up to edge effects).
    lhs_dil = _prod(eqn.params.get("lhs_dilation") or (1,))
    # batch/feature_group_count: prod(out) covers batch; kernel c_in is
    # already per-group.
    return 2.0 * _prod(out_shape) * float(c_in) * k_spatial / lhs_dil


def _dot_flops(eqn) -> float:
    (lhs_contract, _), _ = eqn.params["dimension_numbers"]
    lhs_shape = eqn.invars[0].aval.shape
    contracted = _prod(lhs_shape[d] for d in lhs_contract)
    return 2.0 * _prod(eqn.outvars[0].aval.shape) * contracted


def _jaxpr_flops(jaxpr) -> float:
    total = 0.0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "conv_general_dilated":
            total += _conv_flops(eqn)
        elif name == "dot_general":
            total += _dot_flops(eqn)
        elif name == "scan":
            total += float(eqn.params["length"]) * _jaxpr_flops(
                eqn.params["jaxpr"].jaxpr
            )
        elif name == "while":
            raise ValueError(
                "flop count of a while loop is shape-undecidable; restructure "
                "as lax.scan or count the body manually"
            )
        elif name == "cond":
            # conservative: the most expensive branch
            total += max(
                (_jaxpr_flops(b.jaxpr) for b in eqn.params["branches"]),
                default=0.0,
            )
        else:
            # generic recursion into pjit / remat / custom_vjp / named_call
            for p in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
                sub = eqn.params.get(p) if eqn.params else None
                if sub is not None:
                    total += _jaxpr_flops(getattr(sub, "jaxpr", sub))
                    break
    return total


def count_flops(fn, *args: Any, **kwargs: Any) -> float:
    """Model FLOPs (2 x MACs of convs + dots) of one `fn(*args)` call.

    Pure abstract tracing — no compile, no device execution; args may be
    `jax.ShapeDtypeStruct`s. `fn` may be jitted (the pjit eqn is recursed).
    """
    jaxpr = jax.make_jaxpr(fn)(*args, **kwargs)
    flops = _jaxpr_flops(jaxpr.jaxpr)
    if not math.isfinite(flops):
        raise ValueError("non-finite flop count")
    return flops
