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

__version__ = "0.1.0"
