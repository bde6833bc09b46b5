"""Statistical k-mer selection tools.

Parity: src/tools/StatsKmersFinder.java (stats-kmers),
StatsKmers3GroupsFinder.java (stats-kmers-3),
BitSetStatsKmers3GroupsFinder.java (bitset-stats-kmers-3 — same semantics,
different map backend in the reference).
"""

from __future__ import annotations

import math
from pathlib import Path

import numpy as np

from ..io import binfmt, textfmt
from ..stats import presence as pres
from ..stats.tests import (chi2_invcdf_df1, chi2_invcdf_df2, chisq3_reference,
                           chisq_reference, mannwhitney_p_rows)
from .framework import ExecutionFailed, Param, Tool, register


def _workdir_sub(name):
    return lambda tool: (tool.workdir or Path(".")) / name


def _load_group_tables(files, b):
    """Presence tables (count > b) and frequency tables (all records)."""
    pres_tabs = pres.load_sample_tables(files, b)
    freq_tabs = pres.load_sample_tables(files, 0)
    totals = np.array([t[1].sum() for t in freq_tabs], dtype=np.float64)
    return pres_tabs, freq_tabs, totals


def _write_group_file(path, keys, means):
    """{key, (short) mean} records (StatsKmersFinder.java:259-268)."""
    vals = np.asarray(means, dtype=np.int64).astype(np.int16)
    binfmt.write_kmers_bin(str(path), keys, vals)


@register
class StatsKmersTool(Tool):
    NAME = "stats-kmers"
    DESCRIPTION = ("Output k-mers statistically significant to each of two "
                   "groups of samples based on chi-squared & Mann-Whitney test")
    PARAMS = [
        Param("a-kmers", Path, "A", mandatory=True, multiple=True,
              description="list of input k-mer files for group A"),
        Param("b-kmers", Path, "B", mandatory=True, multiple=True,
              description="list of input k-mer files for group B"),
        Param("p-value-chi2", float, "pchi2", default=0.05,
              description="p-value for chi-squared test"),
        Param("p-value-mw", float, "pmw", default=0.05,
              description="p-value for Mann-Whitney test"),
        Param("maximal-bad-frequency", int, "b", default=0,
              description="maximal frequency for an erroneous k-mer"),
        Param("output-dir", Path, default=_workdir_sub("kmers"),
              description="Output directory"),
    ]

    def run_impl(self):
        a_files = self.get("a-kmers")
        b_files = self.get("b-kmers")
        SA, SB = len(a_files), len(b_files)
        total = SA + SB
        b = self.get("maximal-bad-frequency")

        a_pres, a_freq, a_tot = _load_group_tables(a_files, b)
        b_pres, b_freq, b_tot = _load_group_tables(b_files, b)
        keys = pres.union_keys(a_pres + b_pres)
        P = pres.presence_matrix(a_pres + b_pres, keys)
        n1A = P[:, :SA].sum(axis=1)
        n1B = P[:, SA:].sum(axis=1)
        n = len(keys)

        scarce = (n1A + n1B) <= math.ceil(total * 0.05)
        in_all = (n1A + n1B) == total
        eligible = ~scarce & ~in_all

        crit = chi2_invcdf_df1(1.0 - self.get("p-value-chi2"))
        passed = chisq_reference(SA - n1A, n1A, SB - n1B, n1B, crit)
        chi_keys = keys[eligible & passed]

        out_dir = self.get("output-dir")
        out_dir.mkdir(parents=True, exist_ok=True)
        f_chi = out_dir / "filtered_chisquared.kmers.bin"
        binfmt.write_kmers_bin(str(f_chi), chi_keys,
                               np.ones(len(chi_keys), dtype=np.int16))
        textfmt.write_stat_txt(str(out_dir / "filtered_chisquared.stat.txt"),
                               np.ones(len(chi_keys), dtype=np.int32))
        self.info(f"{len(chi_keys)} k-mers survived the chi-squared test "
                  f"(of {n}; {int(scarce.sum())} scarce, "
                  f"{int(in_all.sum())} in all samples)")

        # depth-normalized frequencies over the surviving keys
        # (StatsKmersFinder.java:222-247)
        mean_sum = float(np.concatenate([a_tot, b_tot]).sum()) / total
        A = pres.count_matrix(a_freq, keys)[eligible & passed].astype(np.float64)
        B = pres.count_matrix(b_freq, keys)[eligible & passed].astype(np.float64)
        A = A * mean_sum / a_tot[None, :]
        B = B * mean_sum / b_tot[None, :]

        pmw = self.get("p-value-mw")
        if pmw > 0 and len(chi_keys):
            pvals = mannwhitney_p_rows(A, B)
            keep = pvals < pmw
        else:
            keep = np.ones(len(chi_keys), dtype=bool)

        meanA = A.mean(axis=1)
        meanB = B.mean(axis=1)
        to_a = keep & (meanA > meanB)
        to_b = keep & ~(meanA > meanB)

        fA = out_dir / "filtered_groupA.kmers.bin"
        fB = out_dir / "filtered_groupB.kmers.bin"
        _write_group_file(fA, chi_keys[to_a], meanA[to_a])
        _write_group_file(fB, chi_keys[to_b], meanB[to_b])
        self.info(f"Total group A k-mers = {int(to_a.sum())}")
        self.info(f"Total group B k-mers = {int(to_b.sum())}")
        self.set_output("resulting-kmers-file", [str(fA)])
        self.set_output("filtered-chisquared", str(f_chi))
        self.set_output("group-a-file", str(fA))
        self.set_output("group-b-file", str(fB))


class _StatsKmers3Base(Tool):
    PARAMS = [
        Param("a-kmers", Path, "A", mandatory=True, multiple=True,
              description="list of input k-mer files for group A"),
        Param("b-kmers", Path, "B", mandatory=True, multiple=True,
              description="list of input k-mer files for group B"),
        Param("c-kmers", Path, "C", mandatory=True, multiple=True,
              description="list of input k-mer files for group C"),
        Param("p-value-chi2", float, "pchi2", default=0.05,
              description="p-value for chi-squared test"),
        Param("p-value-mw", float, "pmw", default=0.05,
              description="p-value for Mann-Whitney test"),
        Param("maximal-bad-frequency", int, "b", default=0,
              description="maximal frequency for an erroneous k-mer"),
        Param("output-dir", Path, default=_workdir_sub("kmers"),
              description="Output directory"),
    ]

    def run_impl(self):
        groups = [self.get("a-kmers"), self.get("b-kmers"),
                  self.get("c-kmers")]
        sizes = [len(g) for g in groups]
        total = sum(sizes)
        b = self.get("maximal-bad-frequency")

        pres_tabs, freq_tabs, tots = [], [], []
        for g in groups:
            p_, f_, t_ = _load_group_tables(g, b)
            pres_tabs.append(p_)
            freq_tabs.append(f_)
            tots.append(t_)

        keys = pres.union_keys([t for g in pres_tabs for t in g])
        P = pres.presence_matrix([t for g in pres_tabs for t in g], keys)
        o = np.cumsum([0] + sizes)
        n1 = [P[:, o[i]:o[i + 1]].sum(axis=1) for i in range(3)]

        present_total = n1[0] + n1[1] + n1[2]
        scarce = present_total <= math.ceil(total * 0.05)
        in_all = present_total == total
        eligible = ~scarce & ~in_all

        crit = chi2_invcdf_df2(1.0 - self.get("p-value-chi2"))
        passed = chisq3_reference(
            sizes[0] - n1[0], n1[0], sizes[1] - n1[1], n1[1],
            sizes[2] - n1[2], n1[2], crit)
        sel = eligible & passed
        chi_keys = keys[sel]

        out_dir = self.get("output-dir")
        out_dir.mkdir(parents=True, exist_ok=True)
        f_chi = out_dir / "filtered_chisquared.kmers.bin"
        binfmt.write_kmers_bin(str(f_chi), chi_keys,
                               np.ones(len(chi_keys), dtype=np.int16))
        textfmt.write_stat_txt(str(out_dir / "filtered_chisquared.stat.txt"),
                               np.ones(len(chi_keys), dtype=np.int32))
        self.info(f"{len(chi_keys)} k-mers survived the chi-squared test")

        mean_sum = float(np.concatenate(tots).sum()) / total
        mats = []
        for gi in range(3):
            M = pres.count_matrix(freq_tabs[gi], keys)[sel].astype(np.float64)
            mats.append(M * mean_sum / tots[gi][None, :])
        A, B, C = mats

        pmw = self.get("p-value-mw")
        if pmw > 0 and len(chi_keys):
            keep = ((mannwhitney_p_rows(A, B) < pmw)
                    | (mannwhitney_p_rows(B, C) < pmw)
                    | (mannwhitney_p_rows(A, C) < pmw))
        else:
            keep = np.ones(len(chi_keys), dtype=bool)

        mA, mB, mC = A.mean(axis=1), B.mean(axis=1), C.mean(axis=1)
        to_a = keep & (mA > mB) & (mA > mC)
        to_b = keep & ~to_a & (mB > mA) & (mB > mC)
        to_c = keep & ~to_a & ~to_b

        names = ["filtered_groupA.kmers.bin", "filtered_groupB.kmers.bin",
                 "filtered_groupC.kmers.bin"]
        outs = []
        for mask, mean, fname, label in ((to_a, mA, names[0], "A"),
                                         (to_b, mB, names[1], "B"),
                                         (to_c, mC, names[2], "C")):
            fp = out_dir / fname
            _write_group_file(fp, chi_keys[mask], mean[mask])
            self.info(f"Total group {label} k-mers = {int(mask.sum())}")
            outs.append(str(fp))
        self.set_output("resulting-kmers-files", outs)
        self.set_output("filtered-chisquared", str(f_chi))


@register
class StatsKmers3Tool(_StatsKmers3Base):
    NAME = "stats-kmers-3"
    DESCRIPTION = ("Output k-mers statistically significant to each of three "
                   "groups of samples based on chi-squared & Mann-Whitney test")


@register
class BitSetStatsKmers3Tool(_StatsKmers3Base):
    NAME = "bitset-stats-kmers-3"
    DESCRIPTION = ("3-group stats k-mers (BitSet-backed variant in the "
                   "reference; identical semantics here)")
