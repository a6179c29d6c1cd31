"""Model complexity reporting: params + FLOPs (thop-equivalent).

The reference profiles models with ``thop`` (ref /root/reference/baseline/
WiSPPN/wisppn.py:927-950, cross_dataset_test/HPE-Li/comlexity.py) and
prints params/GFLOPs.  Here the FLOPs come from XLA's own cost analysis of
the compiled forward — more truthful than operator-table counting, since
it reflects what actually executes.

Note thop counts MACs and calls them FLOPs; XLA counts FLOPs (2x MACs for
matmul/conv).  ``macs = flops / 2`` is reported for apples-to-apples
comparison with the reference README's numbers.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def count_params(params) -> int:
    return int(sum(np.size(p) for p in jax.tree.leaves(params)))


def xla_flops(fn: Callable, *args) -> Optional[float]:
    """Total FLOPs of the compiled ``fn(*args)`` per call, or None if the
    backend does not report a cost analysis."""
    compiled = jax.jit(fn).lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0] if ca else {}
    flops = (ca or {}).get("flops")
    return float(flops) if flops else None


def profile_model(model, sample_x, *, seed: int = 0,
                  variables=None) -> Dict[str, Any]:
    """Params + per-sample FLOPs/MACs for a flax pose model."""
    if variables is None:
        variables = jax.jit(functools.partial(model.init, train=False))(
            {"params": jax.random.key(seed)}, sample_x)
    flops = xla_flops(
        lambda v, x: model.apply(v, x, train=False), variables, sample_x)
    batch = sample_x.shape[0]
    out = {
        "params": count_params(variables["params"]),
        "params_m": count_params(variables["params"]) / 1e6,
    }
    if flops is not None:
        out.update({
            "flops_per_sample": flops / batch,
            "gflops_per_sample": flops / batch / 1e9,
            "gmacs_per_sample": flops / batch / 2e9,   # thop-style
        })
    return out
