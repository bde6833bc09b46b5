"""metafast-tpu: a TPU-native metagenome comparison engine.

Reference-free comparison of shotgun metagenomic samples: canonical k-mer
counting, de Bruijn graph construction, connected-component feature
extraction, and Bray-Curtis distance matrices — built for TPU hardware with
JAX/XLA (32-bit pair k-mer representation, sort + segment-reduce counting,
pointer-jumping contig assembly, label-propagation connected components).

Functionally equivalent to the MetaFast toolkit (ctlab/metafast) but
architected for SPMD execution over device meshes rather than shared-memory
Java threads.
"""

import os as _os

__version__ = "0.1.0"

# Persistent XLA compilation cache: the counting pipeline uses a bounded
# family of power-of-two shape signatures; caching them makes every process
# after the first start hot (a single large-sort compile can cost minutes
# on TPU).  Respect an explicit user setting.
# The kernel environment pins JAX_PLATFORMS=axon (TPU plugin only);
# extend it so the local CPU backend coexists — small graph/table work is
# routed there (utils/device.py) while streaming k-mer work stays on TPU.
if _os.environ.get("JAX_PLATFORMS") == "axon":
    try:
        import jax as _jax

        # respect an explicit in-process override (e.g. tests force cpu)
        if _jax.config.jax_platforms in (None, "axon"):
            _jax.config.update("jax_platforms", "axon,cpu")
    except Exception:  # pragma: no cover
        pass

if "JAX_COMPILATION_CACHE_DIR" not in _os.environ:
    try:
        import jax as _jax

        _jax.config.update(
            "jax_compilation_cache_dir",
            _os.path.expanduser("~/.cache/metafast_tpu/xla"))
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - cache is a pure optimization
        pass
