"""Sample-count tools: kmers-samples-counter, kmers-grouped-counter,
kmers-per-sample, kmers-multiple-filters.

Parity: src/tools/KmersSamplesCounter.java, KmersGroupedSamplesCounter.java,
KmersPerSampleCounter.java, KmersMultipleFilters.java.
"""

from __future__ import annotations

from collections import Counter
from pathlib import Path

import numpy as np

from .. import api
from ..io import binfmt, textfmt
from ..stats import presence as pres
from ..utils.kmers import kmers_strings
from .framework import ExecutionFailed, Param, Tool, register


def _workdir_sub(name):
    return lambda tool: (tool.workdir or Path(".")) / name


def _check_k(k):
    if not (1 <= k <= 31):
        raise ExecutionFailed("The size of k-mer must be in [1, 31].")


def _samples_count(keys: np.ndarray, files, b: int) -> np.ndarray:
    """#files in which each (sorted) key appears with count > b."""
    out = np.zeros(len(keys), dtype=np.int64)
    for f in files:
        fk, fc = binfmt.read_kmers_bin(str(f))
        fk = np.unique(fk[fc > b])
        idx = np.searchsorted(keys, fk)
        ok = idx < len(keys)
        idx = idx[ok]
        hit = keys[idx] == fk[ok]
        out[idx[hit]] += 1
    return out


@register
class KmersSamplesCounterTool(Tool):
    NAME = "kmers-samples-counter"
    DESCRIPTION = "Count number of samples containing each k-mer"
    PARAMS = [
        Param("k", int, "k", mandatory=True, description="k-mer size"),
        Param("k-mers", Path, "i", mandatory=True, multiple=True,
              description="input k-mer files (one per sample)"),
        Param("maximal-bad-frequency", int, "b", default=1,
              description="maximal frequency for an erroneous k-mer"),
        Param("output-dir", Path, default=_workdir_sub("kmers")),
        Param("stats-dir", Path, default=_workdir_sub("stats")),
    ]

    def run_impl(self):
        _check_k(self.get("k"))
        b = self.get("maximal-bad-frequency")
        files = self.get("k-mers")
        keys, _ = api.load_kmers_bin([str(f) for f in files], b)
        counts = _samples_count(keys, files, b)

        out_dir = self.get("output-dir")
        st_dir = self.get("stats-dir")
        out_dir.mkdir(parents=True, exist_ok=True)
        st_dir.mkdir(parents=True, exist_ok=True)
        out_file = out_dir / "n_samples.kmers.bin"
        good = counts > 0
        binfmt.write_kmers_bin(str(out_file), keys[good],
                               counts[good].astype(np.int16))
        textfmt.write_stat_txt(str(st_dir / "n_samples.stat.txt"), counts)
        self.info(f"{len(keys)} k-mers found, {int(good.sum())} good")
        self.set_output("resulting-kmers-file", str(out_file))


@register
class KmersGroupedCounterTool(Tool):
    NAME = "kmers-grouped-counter"
    DESCRIPTION = "Count per-group sample presence for each k-mer (3 groups)"
    PARAMS = [
        Param("k", int, "k", mandatory=True, description="k-mer size"),
        Param("kmers-file", Path, mandatory=True, multiple=True,
              description="k-mer files defining the key universe"),
        Param("cd-kmers", Path, mandatory=True, multiple=True,
              description="group 1 sample k-mer files"),
        Param("uc-kmers", Path, mandatory=True, multiple=True,
              description="group 2 sample k-mer files"),
        Param("nonibd-kmers", Path, mandatory=True, multiple=True,
              description="group 3 sample k-mer files"),
        Param("maximal-bad-frequency", int, "b", default=1,
              description="maximal frequency for an erroneous k-mer"),
        Param("output-dir", Path, default=_workdir_sub("kmers")),
        Param("stats-dir", Path, default=_workdir_sub("stats")),
    ]

    def run_impl(self):
        k = self.get("k")
        _check_k(k)
        b = self.get("maximal-bad-frequency")
        keys, _ = api.load_kmers_bin(
            [str(f) for f in self.get("kmers-file")], 0)
        cd = _samples_count(keys, self.get("cd-kmers"), b)
        uc = _samples_count(keys, self.get("uc-kmers"), b)
        ni = _samples_count(keys, self.get("nonibd-kmers"), b)

        out_dir = self.get("output-dir")
        out_dir.mkdir(parents=True, exist_ok=True)
        out_file = out_dir / "kmers.groups.txt"
        with open(out_file, "w") as fh:
            fh.write("Kmer\tcd_count\tuc_count\tnonibd_count\n")
            for s, a, bb, c in zip(kmers_strings(keys, k), cd, uc, ni):
                fh.write(f"{s}\t{a}\t{bb}\t{c}\n")
        self.info(f"K-mers printed to {out_file}")
        self.set_output("output-file", str(out_file))


@register
class KmersPerSampleCounterTool(Tool):
    NAME = "kmers-per-sample"
    DESCRIPTION = ("Table of per-sample abundances of k-mers present in "
                   "enough samples")
    PARAMS = [
        Param("k", int, "k", mandatory=True, description="k-mer size"),
        Param("k-mers", Path, "i", mandatory=True, multiple=True,
              description="input k-mer files (one per sample)"),
        Param("percent-present", int, "perc", default=20,
              description="output only k-mers present in at least this "
                          "percent of samples"),
        Param("output-dir", Path, default=_workdir_sub("kmers")),
    ]

    def run_impl(self):
        k = self.get("k")
        _check_k(k)
        files = self.get("k-mers")
        tables = pres.load_sample_tables(files, 0)
        all_keys = pres.union_keys(tables)
        (n_present,) = pres.group_presence_counts(tables, all_keys,
                                                  [len(files)])
        thresh = len(files) * self.get("percent-present") // 100
        sel = n_present >= thresh
        keys = all_keys[sel]

        out_dir = self.get("output-dir")
        out_dir.mkdir(parents=True, exist_ok=True)
        out_file = out_dir / f"selected_kmers_{self.get('percent-present')}.txt"
        counts = pres.count_matrix(tables, keys)
        with open(out_file, "w") as fh:
            fh.write("".join("\t" + s for s in kmers_strings(keys, k)) + "\n")
            for j, f in enumerate(files):
                name = Path(f).name.replace(".kmers.bin", "")
                fh.write(name
                         + "".join(f"\t{int(v)}" for v in counts[:, j])
                         + "\n")
        self.info(f"K-mers printed to {out_file}")
        self.set_output("output-file", str(out_file))


@register
class KmersMultipleFiltersTool(Tool):
    NAME = "kmers-multiple-filters"
    DESCRIPTION = "Compare sample k-mers against 3 weighted filter sets"
    PARAMS = [
        Param("k", int, "k", mandatory=True, description="k-mer size"),
        Param("k-mers", Path, "i", mandatory=True, multiple=True,
              description="input k-mer files"),
        Param("cd-filter-kmers", Path, mandatory=True, multiple=True),
        Param("uc-filter-kmers", Path, mandatory=True, multiple=True),
        Param("nonibd-filter-kmers", Path, mandatory=True, multiple=True),
        Param("maximal-bad-frequency", int, "b", default=1,
              description="maximal frequency for an erroneous k-mer"),
        Param("output-dir", Path, default=_workdir_sub("kmers")),
        Param("stats-dir", Path, default=_workdir_sub("stats")),
    ]

    def run_impl(self):
        k = self.get("k")
        _check_k(k)
        b = self.get("maximal-bad-frequency")
        filters = []
        for name in ("cd-filter-kmers", "uc-filter-kmers",
                     "nonibd-filter-kmers"):
            fk, fc = api.load_kmers_bin([str(f) for f in self.get(name)], 0)
            filters.append((fk, fc))

        out_dir = self.get("output-dir")
        st_dir = self.get("stats-dir")
        out_dir.mkdir(parents=True, exist_ok=True)
        st_dir.mkdir(parents=True, exist_ok=True)

        out_files = []
        for f in self.get("k-mers"):
            keys, counts = api.load_kmers_bin([str(f)], b)
            vals = []
            for fk, fc in filters:
                idx = np.searchsorted(fk, keys)
                idx = np.clip(idx, 0, max(len(fk) - 1, 0))
                hit = fk[idx] == keys if len(fk) else \
                    np.zeros(len(keys), dtype=bool)
                vals.append(np.where(hit, fc[idx], 0))
            cd, uc, ni = vals
            # stat over (cd, uc, nonibd) triples of all passing k-mers
            triples = Counter(zip(cd.tolist(), uc.tolist(), ni.tolist()))
            good = (cd > 0) | (uc > 0) | (ni > 0)

            name = Path(f).name.replace(".kmers.bin", "")
            out_file = out_dir / f"{name}.kmers.bin"
            st_file = st_dir / f"{name}.stat.txt"
            binfmt.write_kmers_bin(str(out_file), keys[good], counts[good])
            with open(st_file, "w") as fh:
                fh.write("# cd k-mer samples\tuc k-mer samples\t"
                         "nonIBD k-mer samples\tnumber of such k-mers\n")
                for t in sorted(triples):
                    fh.write(f"{t[0]}\t{t[1]}\t{t[2]}\t{triples[t]}\n")
                fh.write("\n")
            self.info(f"{len(keys)} k-mers found, {int(good.sum())} survived "
                      f"after filtering")
            out_files.append(str(out_file))
        self.set_output("resulting-kmers-files", out_files)
