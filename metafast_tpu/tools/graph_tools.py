"""comp2graph: components -> de Bruijn unitig graph in GFA format.

Parity: src/tools/ComponentsToGraph.java.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from .. import api
from ..graph.gfa import component_gfa
from ..io import binfmt
from .framework import ExecutionFailed, Param, Tool, register


@register
class ComponentsToGraphTool(Tool):
    NAME = "comp2graph"
    DESCRIPTION = ("Transforms components in binary format to de Bruijn "
                   "graph in GFA format")
    PARAMS = [
        Param("k", int, "k", mandatory=True, description="k-mer size"),
        Param("components-file", Path, "cf", mandatory=True,
              description="binary components file"),
        Param("k-mers", Path, "i", multiple=True,
              description="k-mer files for graph coverage"),
        Param("coverage", bool, "cov", default=False,
              description="coverage = total occurrences instead of number "
                          "of samples (only with -i)"),
        Param("graph-file", Path,
              default=lambda t: (t.workdir or Path(".")) /
              "components-graph.gfa",
              description="file to write the graph to"),
    ]

    def run_impl(self):
        k = self.get("k")
        if not (1 <= k <= 31):
            raise ExecutionFailed("The size of k-mer must be in [1, 31].")
        comps = binfmt.read_components_bin(str(self.get("components-file")))
        self.info(f"{len(comps)} components loaded")

        cov_keys = cov_vals = None
        if self.get("k-mers"):
            files = [str(f) for f in self.get("k-mers")]
            if self.get("coverage"):
                cov_keys, cov_vals = api.load_kmers_bin(files, 0)
            else:
                # number of samples containing the k-mer
                cov_keys, _ = api.load_kmers_bin(files, 0)
                cov_vals = np.zeros(len(cov_keys), dtype=np.int64)
                for f in files:
                    fk, _fc = binfmt.read_kmers_bin(f)
                    idx = np.searchsorted(cov_keys, np.unique(fk))
                    cov_vals[idx] += 1

        out = self.get("graph-file")
        out.parent.mkdir(parents=True, exist_ok=True)
        with open(out, "w") as fh:
            for icomp, (kmers, _w) in enumerate(comps):
                if cov_keys is not None:
                    idx = np.searchsorted(cov_keys, kmers)
                    idx = np.clip(idx, 0, max(len(cov_keys) - 1, 0))
                    hit = (cov_keys[idx] == kmers) if len(cov_keys) else \
                        np.zeros(len(kmers), dtype=bool)
                    weights = np.where(hit, cov_vals[idx], 0)
                else:
                    weights = np.ones(len(kmers), dtype=np.int64)
                fh.write(component_gfa(kmers, weights, k, icomp))
        self.info("Graph components saved to GFA format!")
        self.set_output("graph-file", str(out))
