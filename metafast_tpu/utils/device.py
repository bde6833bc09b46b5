"""Size-aware device routing: small work runs on the host CPU backend.

On a tunneled single-chip TPU every dispatch, executable load, and host
round-trip costs 10-1000ms, which dwarfs the compute of small arrays.
The TPU-idiomatic split: keep the big streaming k-mer work on the TPU,
run small graph/table work on the local CPU backend (always compiled
locally, microsecond dispatch).  On real multi-chip deployments the
threshold only reroutes work that is latency-bound anyway.

metafast_tpu/__init__ extends JAX_PLATFORMS=axon to "axon,cpu" so the
CPU backend exists alongside the TPU plugin.
"""

from __future__ import annotations

import contextlib

import jax

# below this many elements the work is dispatch-latency-bound on TPU
SMALL_ELEMENTS = 1 << 22


def cpu_device():
    # local_devices, not devices: under jax.distributed the global list
    # starts with process 0's devices, which other processes cannot
    # address — committing work there poisons downstream fetches
    try:
        return jax.local_devices(backend="cpu")[0]
    except Exception:
        return None


@jax.jit
def _probe_one(x):
    import jax.numpy as jnp
    return jnp.sum(x.ravel()[-8:].astype(jnp.int32))


def force_sync(*arrays) -> int:
    """Force full materialization of device arrays.

    jax.block_until_ready returns early on the tunneled axon backend
    (dispatch acknowledgement, not completion); fetching a scalar that
    depends on the data is the reliable barrier.  The probe jit lives at
    module level: a per-call wrapper would retrace and re-load an
    executable on every sync (~0.4s each on the tunneled backend).
    All probes are dispatched before any is fetched, so N arrays cost
    one round-trip latency, not N.
    """
    probes = [_probe_one(x) for x in arrays]
    return sum(int(p) for p in probes)


def small_scope(n_elements: int):
    """Context manager: route jit dispatches to CPU when the problem is
    small and the default backend is not already CPU."""
    if n_elements < SMALL_ELEMENTS:
        try:
            default = jax.devices()[0].platform
        except Exception:
            return contextlib.nullcontext()
        if default != "cpu":
            d = cpu_device()
            if d is not None:
                return jax.default_device(d)
    return contextlib.nullcontext()
