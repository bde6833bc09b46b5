"""k-mer set algebra tools: unique-kmers, unique-kmers-multi, kmers-filter,
kmer-counter-posneg.

Parity: src/tools/UniqueKmersFinder.java,
UniqueKmersMultipleSamplesFinder.java, KmersFilter.java,
KmersCounterPositiveNegative.java.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from .. import api
from ..io import binfmt, textfmt
from .framework import ExecutionFailed, Param, Tool, register
from .pipeline1 import KmerCounterManyTool


def _workdir_sub(name):
    return lambda tool: (tool.workdir or Path(".")) / name


def _check_k(k):
    if not (1 <= k <= 31):
        raise ExecutionFailed("The size of k-mer must be in [1, 31].")


@register
class UniqueKmersTool(Tool):
    NAME = "unique-kmers"
    DESCRIPTION = ("Output k-mers present in one group of samples and missing "
                   "in the other")
    PARAMS = [
        Param("k", int, "k", mandatory=True, description="k-mer size"),
        Param("k-mers", Path, "i", mandatory=True, multiple=True,
              description="input k-mer files (binary format)"),
        Param("filter-kmers", Path, mandatory=True, multiple=True,
              description="k-mer files used for filtering"),
        Param("maximal-bad-frequency", int, "b", default=1,
              description="maximal frequency for an erroneous k-mer"),
        Param("output-dir", Path, default=_workdir_sub("kmers")),
        Param("stats-dir", Path, default=_workdir_sub("stats")),
    ]

    def run_impl(self):
        _check_k(self.get("k"))
        b = self.get("maximal-bad-frequency")
        keys, counts = api.load_kmers_bin(
            [str(f) for f in self.get("k-mers")], b)

        # zero out keys present (> b) in any filter file
        # (UniqueKmersFinder.java:91-106)
        kill = np.zeros(len(keys), dtype=bool)
        for f in self.get("filter-kmers"):
            fk, fc = binfmt.read_kmers_bin(str(f))
            fk = fk[fc > b]
            kill |= np.isin(keys, fk)
        counts = np.where(kill, 0, counts)

        out_dir = self.get("output-dir")
        st_dir = self.get("stats-dir")
        out_dir.mkdir(parents=True, exist_ok=True)
        st_dir.mkdir(parents=True, exist_ok=True)
        good = counts > b
        out_file = out_dir / "filtered.kmers.bin"
        binfmt.write_kmers_bin(str(out_file), keys[good], counts[good])
        textfmt.write_stat_txt(str(st_dir / "filtered.stat.txt"), counts)
        self.info(f"{len(keys)} k-mers found, {int(good.sum())} of them is "
                  f"good (present in one dataset and missing in other)")
        self.set_output("resulting-kmers-file", str(out_file))


@register
class UniqueKmersMultiTool(Tool):
    NAME = "unique-kmers-multi"
    DESCRIPTION = ("Output k-mers unique to a group of samples (present in "
                   "[min..max] samples, absent from the filter group)")
    PARAMS = [
        Param("k", int, "k", mandatory=True, description="k-mer size"),
        Param("k-mers", Path, "i", mandatory=True, multiple=True,
              description="input k-mer files (binary format)"),
        Param("filter-kmers", Path, mandatory=True, multiple=True,
              description="k-mer files used for filtering"),
        Param("min-samples", int, default=1,
              description="minimal number of samples k-mer to be present in"),
        Param("max-samples", int, default=1,
              description="maximal number of samples k-mer to be present in"),
        Param("maximal-bad-frequency", int, "b", default=1,
              description="maximal frequency for an erroneous k-mer"),
        Param("output-dir", Path, default=_workdir_sub("kmers")),
        Param("stats-dir", Path, default=_workdir_sub("stats")),
    ]

    def run_impl(self):
        _check_k(self.get("k"))
        b = self.get("maximal-bad-frequency")
        if self.get("min-samples") > self.get("max-samples"):
            raise ExecutionFailed("--min-samples cannot be greater than "
                                  "--max-samples")

        # per-sample accumulation with Java short wrap-around on the sum
        # (UniqueKmersMultipleSamplesFinder.java:102-120: put((short)(a+v)))
        sum_map: dict = {}
        cnt_map: dict = {}
        all_keys = []
        for f in self.get("k-mers"):
            fk, fc = binfmt.read_kmers_bin(str(f))
            keep = fc > b
            all_keys.append(fk[keep])
        keys = np.unique(np.concatenate(all_keys)) if all_keys else \
            np.empty(0, dtype=np.int64)
        sums = np.zeros(len(keys), dtype=np.int64)
        cnts = np.zeros(len(keys), dtype=np.int64)
        for f in self.get("k-mers"):
            fk, fc = binfmt.read_kmers_bin(str(f))
            keep = fc > b
            fk, fc = fk[keep], fc[keep]
            idx = np.searchsorted(keys, fk)
            sums[idx] += fc
            cnts[idx] += 1
        sums16 = sums.astype(np.int16)   # Java short cast semantics

        killed = np.zeros(len(keys), dtype=bool)
        for f in self.get("filter-kmers"):
            fk, fc = binfmt.read_kmers_bin(str(f))
            fk = fk[fc > b]
            hit = np.isin(keys, fk) & (sums16 > b) & ~killed
            killed |= hit
        sums16 = np.where(killed, 0, sums16)

        out_dir = self.get("output-dir")
        out_dir.mkdir(parents=True, exist_ok=True)
        self.get("stats-dir").mkdir(parents=True, exist_ok=True)

        out_files = []
        for i in range(self.get("min-samples"), self.get("max-samples") + 1):
            # value > b and sample count > i-1  (filterAndPrintKmers,
            # src/io/IOUtils.java:101-123)
            good = (sums16 > b) & (cnts > i - 1)
            out_file = out_dir / f"filtered_{i}.kmers.bin"
            binfmt.write_kmers_bin(str(out_file), keys[good], sums16[good])
            c = int(good.sum())
            self.info(f"{len(keys)} k-mers found, {c} of them is good "
                      f"(>= {i} samples)")
            out_files.append(str(out_file))
            if c == 0:
                self.info(f"No good k-mers found. Stop at maxSamples={i}")
                break
        self.set_output("resulting-kmers-files", out_files)
        self.set_output(
            "resulting-kmers-file",
            str(out_dir / f"filtered_{self.get('min-samples')}.kmers.bin"))


@register
class KmersFilterTool(Tool):
    NAME = "kmers-filter"
    DESCRIPTION = "Filter k-mers, leaving only k-mers from the filter set"
    PARAMS = [
        Param("k", int, "k", mandatory=True, description="k-mer size"),
        Param("k-mers", Path, "i", mandatory=True, multiple=True,
              description="input k-mer files (binary format)"),
        Param("filter-kmers", Path, mandatory=True, multiple=True,
              description="k-mer files used for filtering"),
        Param("maximal-bad-frequency", int, "b", default=1,
              description="maximal frequency for an erroneous k-mer"),
        Param("max-thresh", int, default=0,
              description="maximal frequency for a k-mer in the filter "
                          "files to be assumed not found"),
        Param("output-dir", Path, default=_workdir_sub("kmers")),
        Param("stats-dir", Path, default=_workdir_sub("stats")),
    ]

    def run_impl(self):
        _check_k(self.get("k"))
        b = self.get("maximal-bad-frequency")
        filt_keys, filt_counts = api.load_kmers_bin(
            [str(f) for f in self.get("filter-kmers")], b)
        thr = self.get("max-thresh") * len(self.get("filter-kmers"))

        out_dir = self.get("output-dir")
        out_dir.mkdir(parents=True, exist_ok=True)
        out_files = []
        for f in self.get("k-mers"):
            keys, counts = api.load_kmers_bin([str(f)], b)
            idx = np.searchsorted(filt_keys, keys)
            idx = np.clip(idx, 0, max(len(filt_keys) - 1, 0))
            if len(filt_keys):
                fv = np.where(filt_keys[idx] == keys, filt_counts[idx], 0)
            else:
                fv = np.zeros(len(keys), dtype=np.int64)
            good = (counts > b) & (fv > thr)
            name = Path(f).name.replace(".kmers.bin", "")
            out_file = out_dir / f"{name}.kmers.bin"
            binfmt.write_kmers_bin(str(out_file), keys[good], counts[good])
            self.info(f"{len(keys)} k-mers found, {int(good.sum())} of them "
                      f"survived after filtering")
            out_files.append(str(out_file))
        self.set_output("resulting-kmers-files", out_files)
        self.set_output("resulting-kmers-file",
                        out_files[0] if out_files else None)


@register
class KmerCounterPosNegTool(Tool):
    NAME = "kmer-counter-posneg"
    DESCRIPTION = ("Count k-mers in positive and negative groups of read "
                   "files")
    PARAMS = [
        Param("k", int, "k", mandatory=True, description="k-mer size"),
        Param("positiveReads", Path, "pos", mandatory=True, multiple=True,
              description="list of reads files from positive group"),
        Param("negativeReads", Path, "neg", mandatory=True, multiple=True,
              description="list of reads files from negative group"),
        Param("maximal-bad-frequency", int, "b", default=1,
              description="maximal frequency for an erroneous k-mer"),
        Param("output-dir", Path, default=_workdir_sub("kmers_posneg")),
    ]

    def run_impl(self):
        if not self.get("positiveReads") or not self.get("negativeReads"):
            raise ExecutionFailed("No libraries to process!")
        self._sub = {}
        for label, files in (("pos", self.get("positiveReads")),
                             ("neg", self.get("negativeReads"))):
            c = KmerCounterManyTool()
            c.set("k", self.get("k"))
            c.set("reads", files)
            c.set("maximal-bad-frequency", self.get("maximal-bad-frequency"))
            c.set("output-dir", self.workdir / label / "kmers")
            c.set("stats-dir", self.workdir / label / "stats")
            self.add_step(c)
            self._sub[label] = c

    def run(self, ctx, workdir=None):
        super().run(ctx, workdir)
        self.set_output("resulting-pos-kmers-files",
                        self._sub["pos"].outputs["resulting-kmers-files"])
        self.set_output("resulting-neg-kmers-files",
                        self._sub["neg"].outputs["resulting-kmers-files"])
