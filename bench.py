"""Benchmark: canonical k-mer counting throughput, device-only + end-to-end.

Workload: a deterministic synthetic metagenomic sample -- reads drawn from
a 5 Mbp genome at ~20x coverage (the realistic unique/total profile; a
uniform-random read set would make every k-mer unique, which no
assembler-grade workload does).  This is the reference's kmer-counter hot
loop (src/io/IOUtils.java:742-803).

Reported numbers:

  * value (primary) = DEVICE-ONLY k-mers/s: inputs pre-staged in HBM,
    timed from first extraction dispatch to the final counted table
    residing on device (stream Pallas extract + sort/RLE + binary-counter
    merges).  This is the chip's real capability.
  * end_to_end_kmers_per_s = file on disk -> sorted (keys, counts) on
    host, including parse, host->device, and device->host transfers.  On
    this rig the device link is a tunnel measured at tens of MB/s (vs
    >10 GB/s PCIe on a real TPU host), so e2e is link-bound; the measured
    link rates are reported so the gap is quantified, not implied.
  * vs_baseline = device-only rate / a MEASURED native baseline: the
    reference-style single-thread counter (rolling canonical k-mer loop +
    open-addressing hash table, native/fastparse.cpp count_kmers_baseline)
    run on this host's CPU.  Provenance is in the JSON; the Java toolkit
    parallelizes across cores, so a generous toolkit-class bound is
    baseline x cores (also reported).

Prints ONE JSON line.
"""

import ctypes
import json
import os
import sys
import tempfile
import time

import numpy as np

K = 31
GENOME_LEN = 5_000_000
READ_LEN = 150
COVERAGE = 20
N_READS = GENOME_LEN * COVERAGE // READ_LEN    # ~667K reads, ~80M kmers


def make_fasta(path: str) -> int:
    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    genome = bases[rng.integers(0, 4, GENOME_LEN)]
    starts = rng.integers(0, GENOME_LEN - READ_LEN, N_READS)
    idx = starts[:, None] + np.arange(READ_LEN)[None, :]
    reads = genome[idx]
    with open(path, "wb") as fh:
        for i in range(N_READS):
            fh.write(b">r%d\n" % i)
            fh.write(reads[i].tobytes())
            fh.write(b"\n")
    return N_READS * (READ_LEN - K + 1)


def native_baseline(codes, lengths) -> float:
    """Measured single-thread reference-style counter: k-mers/s.

    Median of 3 runs — this number sets vs_baseline, and a single run
    wobbles ~20% with host noise on the 2-vCPU rig."""
    from metafast_tpu.native import load_library

    lib = load_library()
    if lib is None:
        return 0.0
    log2 = 24                                  # 16M slots for ~5M uniques
    table = np.zeros(1 << log2, dtype=np.uint64)
    counts = np.zeros(1 << log2, dtype=np.uint16)
    uniq = ctypes.c_int64(0)

    def run():
        table[:] = 0
        counts[:] = 0
        t0 = time.perf_counter()
        total = lib.count_kmers_baseline(
            codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(lengths), K,
            table.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            log2, ctypes.byref(uniq))
        return total / (time.perf_counter() - t0)

    return sorted(run() for _ in range(3))[1]


def main():
    import jax
    import jax.numpy as jnp

    from metafast_tpu import api
    from metafast_tpu.io import native_reads
    from metafast_tpu.ops.count import KmerCounter, _sort_pair
    from metafast_tpu.utils.device import force_sync

    with tempfile.TemporaryDirectory() as td:
        fasta = os.path.join(td, "bench.fasta")
        n_kmers = make_fasta(fasta)

        codes, lengths, _ = native_reads.parse_file(fasta)

        # ---- measured native baseline (single thread, this host) ----
        base_rate = native_baseline(codes, lengths)

        # ---- device-only: pre-staged slabs -> counted table on device ----
        # compact 3-stream layout (r5): ~1.07 sorted slots per k-mer
        # instead of ~1.26 — the sort is the bound (PERF.md section 3)
        from metafast_tpu.ops.stream_extract import (build_stream3,
                                                     stream3_extract)

        slab_codes = 1 << 27
        offs = np.concatenate([[0], np.cumsum(lengths.astype(np.int64))])
        slabs = []
        r0 = 0
        while r0 < len(lengths):
            r1 = int(np.searchsorted(offs, offs[r0] + slab_codes,
                                     side="right")) - 1
            r1 = min(max(r1, r0 + 1), len(lengths))
            w0_, w1_, w2_, vm_, _ = build_stream3(
                codes[offs[r0]:offs[r1]], lengths[r0:r1], K)
            slabs.append(([jax.device_put(x)
                           for x in (w0_, w1_, w2_, vm_)], lengths[r0:r1]))
            r0 = r1
        force_sync(*[b for s in slabs for b in s[0]])
        h2d_bytes = sum(b.nbytes for s in slabs for b in s[0])

        def device_only():
            counter = KmerCounter(K)
            for bufs, ls in slabs:
                counter.add_stream3_device(*bufs, ls)
            hi, lo, cnt = counter.finish_device()
            force_sync(hi, lo, cnt)
            return hi, lo, cnt

        table = device_only()                  # compile warm-up
        # median of 5: the tunneled rig wobbles +-10% run to run, and the
        # driver records a single bench invocation
        times = [_timed(device_only) for _ in range(5)]
        t_dev = sorted(times)[2]
        dev_rate = n_kmers / t_dev

        # ---- per-stage device breakdown of the counting path ----
        bufs0 = slabs[0][0]
        t_ext = _timed_median(
            lambda: force_sync(*stream3_extract(*bufs0, K)), 3)
        hi0, lo0 = stream3_extract(*bufs0, K)
        hi0, lo0 = hi0.reshape(-1), lo0.reshape(-1)
        n_slots = hi0.shape[0]
        force_sync(hi0, lo0)
        t_sort = _timed_median(
            lambda: force_sync(*_sort_pair(hi0, lo0)), 3)
        t_rle = max(t_dev - t_ext - t_sort, 0.0)

        stages = {
            "extract_ms": round(t_ext * 1e3, 1),
            "extract_keys_per_s": round(n_slots / t_ext, 1),
            "sort_ms": round(t_sort * 1e3, 1),
            "sort_keys_per_s": round(n_slots / t_sort, 1),
            "rle_merge_rest_ms": round(t_rle * 1e3, 1),
            "sorted_slots": int(n_slots),
        }

        # ---- non-counting device stages ----
        graph_ok = True
        try:
            stages.update(_bench_graph_stages(table))
        except Exception as e:          # never lose the headline metric
            import traceback
            traceback.print_exc()       # fail LOUDLY on stderr
            graph_ok = False
            stages["graph_stages_error"] = f"{type(e).__name__}: {e}"[:300]

        # ---- end-to-end: file -> host (keys, counts), incl. transfers ----
        api.count_reads_files([fasta], K)      # warm-up
        times = [_timed(lambda: api.count_reads_files([fasta], K))
                 for _ in range(3)]
        t_e2e = sorted(times)[1]
        e2e_rate = n_kmers / t_e2e

        # ---- link rate (quantifies the tunnel) ----
        blob = np.zeros(1 << 24, dtype=np.uint32)         # 64 MB
        t0 = time.perf_counter()
        dev_blob = jax.device_put(blob)
        force_sync(dev_blob)
        h2d_mbps = blob.nbytes / (time.perf_counter() - t0) / 1e6
        t0 = time.perf_counter()
        np.asarray(dev_blob)
        d2h_mbps = blob.nbytes / (time.perf_counter() - t0) / 1e6

    cores = os.cpu_count() or 1
    print(json.dumps({
        "metric": "device_kmer_count_throughput_detail",
        "value": round(dev_rate, 1),
        "unit": "kmers/s",
        "vs_baseline": round(dev_rate / base_rate, 3) if base_rate else None,
        "end_to_end_kmers_per_s": round(e2e_rate, 1),
        "baseline_kmers_per_s": round(base_rate, 1),
        "baseline_provenance": (
            "measured on this host: single-thread C++ rolling-canonical "
            "open-addressing counter (reference hot-loop equivalent, "
            "native/fastparse.cpp count_kmers_baseline); toolkit-class "
            "multithreaded bound = baseline x host cores"),
        "vs_baseline_x_cores": (
            round(dev_rate / (base_rate * cores), 3) if base_rate else None),
        "host_cores": cores,
        "device_link_h2d_mbps": round(h2d_mbps, 1),
        "device_link_d2h_mbps": round(d2h_mbps, 1),
        "graph_stages_ok": graph_ok,
        "sol_analysis": {
            "summary": (
                "counting is bound by the chip's comparison-sort rate, "
                "not HBM: the 2-array u32 sort moves ~%.0fM keys/s; every "
                "measured irregular-movement primitive on this chip "
                "(gather ~50M/s, scatter-add ~82M/s, searchsorted ~5M/s; "
                "scratch/micro*.py, PERF.md section 1) is far slower, so "
                "a radix/hash-table reformulation has no faster primitive "
                "to stand on" % (n_slots / t_sort / 1e6)),
            "passes": (
                "per chunk: extract 1 HBM pass (%.0fms), sort (%.0fms, "
                "VPU-bound at an effective ~111G pair-stages/s), "
                "RLE/compaction ~4 passes + 1 overlapped host sync "
                "(%.0fms)" % (t_ext * 1e3, t_sort * 1e3, t_rle * 1e3)),
            "next_lever": (
                "MEASURED OUT: hand Pallas bitonic 5x slower per stage "
                "than XLA's sort (r3, PERF.md section 2); batch-major "
                "extraction that skips invalid slots nets zero (r4, "
                "section 3).  The device-only rate equals the per-stage "
                "sum (extract+sort+RLE) and sits at ~75% of the "
                "physical sort bound (~210M k-mers/s at this read "
                "length); remaining scaling is horizontal: each mesh "
                "device sorts its own hash shard (8-device dryrun + "
                "2-process x 4-device test)"),
        },
        "link_note": (
            "single-chip TPU behind a tunnel; e2e is link-bound "
            "(staged input %.0f MB). On a production TPU host (PCIe/DMA "
            ">10 GB/s) e2e converges to the device-only rate."
            % (h2d_bytes / 1e6)),
        "stages": stages,
    }))
    # compact headline LAST: the driver parses the final ~2000 chars of
    # output, and the r3/r4 BENCH_*.json came back `parsed: null` because
    # the detail line's leading fields fell outside that window
    print(json.dumps({
        "metric": "device_kmer_count_throughput",
        "value": round(dev_rate, 1),
        "unit": "kmers/s",
        "vs_baseline": round(dev_rate / base_rate, 3) if base_rate else None,
        "vs_baseline_x_cores": (
            round(dev_rate / (base_rate * cores), 3) if base_rate else None),
        "baseline_kmers_per_s": round(base_rate, 1),
        "graph_stages_ok": graph_ok,
        "contig_chain_nodes_per_s": stages.get("contig_chain_nodes_per_s"),
        "components_nodes_per_s": stages.get(
            "components_labelprop_nodes_per_s"),
        "contig_vs_native_x": stages.get("contig_vs_native_x"),
        "components_vs_native_x": stages.get("components_vs_native_x"),
    }))


def _timed_median(f, n=3):
    f()
    return sorted(_timed(f) for _ in range(n))[n // 2]


def _retry(fn, tries=3, wait=10.0):
    """Run fn; on a transient TPU runtime failure (compile-helper kill,
    worker restart) wait and retry — completed compiles persist in the
    compilation cache, so each retry resumes further along."""
    for attempt in range(tries):
        try:
            return fn()
        except Exception:
            if attempt == tries - 1:
                raise
            import traceback
            traceback.print_exc()
            time.sleep(wait * (attempt + 1))


def _bench_graph_stages(table):
    """Device rates for the non-counting * paths: contig chain structure
    (SequencesFinders equivalent, reference
    src/algo/SequencesFinders.java:13-31), component label propagation
    (ComponentsBuilder equivalent, src/algo/ComponentsBuilder.java:58-99),
    and the feature segment-sum (FeaturesCalculatorMain equivalent)."""
    import jax
    import jax.numpy as jnp

    from metafast_tpu.core import bitpack as bp
    from metafast_tpu.graph.components import adjacency, connected_labels
    from metafast_tpu.graph.contigs import chain_structure
    from metafast_tpu.utils.device import force_sync
    from metafast_tpu import api

    hi, lo, cnt = table
    out = {}

    # full live table, padded to the {2^k, 3*2^(k-1)} bucket the real
    # pipeline uses (graph stages scale with PADDED size; the r4 bench
    # padded ~5M live keys to 2^23 and timed 40% dead rows), capped at
    # 2^23 (VERDICT r3 #1: >= 2^23 capacity, no cap at 2^22).  If
    # sliced, re-pad the tail with SENTINEL so the table honors
    # chain_structure's documented contract (r3 advisor).
    from metafast_tpu.graph.contigs import _table_bucket

    n_live_graph = int(np.asarray(jnp.sum(cnt > 0)))
    M = min(_table_bucket(n_live_graph + 16), int(hi.shape[0]), 1 << 23)
    ghi = jax.lax.slice_in_dim(hi, 0, M)
    glo = jax.lax.slice_in_dim(lo, 0, M)
    if M < int(hi.shape[0]):
        tail = jnp.full((16,), bp.SENTINEL, jnp.uint32)
        ghi = jnp.concatenate([jax.lax.slice_in_dim(ghi, 0, M - 16), tail])
        glo = jnp.concatenate([jax.lax.slice_in_dim(glo, 0, M - 16), tail])

    def contigs():
        r = chain_structure(ghi, glo, K)
        force_sync(*[v for v in r.values()
                     if hasattr(v, "shape") and v.ndim])
        return r

    _retry(contigs)                       # pre-warm all piece compiles
    t = _timed_median(contigs, 3)
    out["contig_chain_ms"] = round(t * 1e3, 1)
    out["contig_chain_nodes_per_s"] = round(M / t, 1)
    out["contig_chain_nodes"] = M

    # components over the SAME table (the bench genome is one near-chain
    # component — worst case on purpose).  Times the real TPU path:
    # chain-walk segment contraction (graph/components.py
    # walk_connected_labels), table -> labels, everything included.
    from metafast_tpu.graph.components import walk_connected_labels

    def comps():
        return walk_connected_labels(ghi, glo, K)

    _retry(comps)                         # pre-warm
    t = _timed_median(comps, 3)
    out["components_labelprop_ms"] = round(t * 1e3, 1)
    out["components_labelprop_nodes_per_s"] = round(M / t, 1)
    out["components_labelprop_nodes"] = M

    # native single-thread baselines on the same table (the reference's
    # contig walk and BFS probe loops, fastparse.cpp) — these anchor
    # vs_native for both graph stages (VERDICT r4 missing #3)
    keys = np.asarray(hi).astype(np.uint64)
    keysl = np.asarray(lo).astype(np.uint64)
    cnts = np.asarray(cnt)
    live = cnts > 0
    keys64 = ((keys[live] << np.uint64(32)) | keysl[live]).astype(np.int64)
    cnts = cnts[live].astype(np.int32)

    from metafast_tpu.native import load_library
    lib = load_library()
    if lib is not None:
        import ctypes
        bkeys = keys64.astype(np.uint64)
        n_live = len(bkeys)
        log2 = max(12, int(np.ceil(np.log2(max(n_live, 2)))) + 1)
        pk = bkeys.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))
        pc = cnts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))

        def walk():
            a, b = ctypes.c_int64(0), ctypes.c_int64(0)
            lib.contig_walk_baseline(pk, pc, n_live, K, 0, log2,
                                     ctypes.byref(a), ctypes.byref(b))

        def bfs():
            a = ctypes.c_int64(0)
            lib.bfs_components_baseline(pk, pc, n_live, K, log2,
                                        ctypes.byref(a))

        t_nw = _timed_median(walk, 2)
        t_nb = _timed_median(bfs, 2)
        out["native_contig_walk_ms"] = round(t_nw * 1e3, 1)
        out["native_bfs_components_ms"] = round(t_nb * 1e3, 1)
        # same numerator (live keys), so the ratio is wall-clock honest
        tpu_contig_s = out["contig_chain_ms"] / 1e3
        tpu_comp_s = out["components_labelprop_ms"] / 1e3
        out["contig_vs_native_x"] = round(t_nw / tpu_contig_s, 2)
        out["components_vs_native_x"] = round(t_nb / tpu_comp_s, 2)
    rng = np.random.default_rng(0)
    n_comp = 5000
    sizes = rng.integers(100, 3000, n_comp)
    sizes = (sizes * (len(keys64) / sizes.sum())).astype(np.int64)
    starts = np.concatenate([[0], np.cumsum(sizes)])[:-1]

    class _C:
        __slots__ = ("kmers",)

        def __init__(self, kmers):
            self.kmers = kmers

    comps_list = [_C(keys64[s:s + z]) for s, z in zip(starts, sizes)]

    from metafast_tpu.pipeline.matrix import feature_vectors

    def feats():
        return feature_vectors(comps_list, keys64, cnts)

    t = _timed_median(feats, 3)
    nk = int(sizes.sum())
    out["features_segsum_ms"] = round(t * 1e3, 1)
    out["features_segsum_keys_per_s"] = round(nk / t, 1)
    out["features_components"] = n_comp
    return out


def _timed(f) -> float:
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


def stress(n_samples: int = 8):
    """CAMI-scale multi-sample pipeline on the default backend (config #2).

    S samples (default 8 — VERDICT r4 #5 asked for S > 3) sharing a
    1 Mbp backbone within 2.5 Mbp genomes at 12x coverage (~19M k-mers
    each): full matrix pipeline (count -> contigs -> components ->
    features -> Bray-Curtis) plus the presence/stats tier (bit-packed
    membership + per-key cardinalities over the union key set).  Prints
    ONE JSON line with the per-stage and per-sample split so stage
    scaling in S is visible.
    """
    import resource

    from metafast_tpu.pipeline import matrix_pipeline

    GEN, SHARE, COV = 2_500_000, 1_000_000, 12
    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    backbone = bases[rng.integers(0, 4, SHARE)]
    with tempfile.TemporaryDirectory() as td:
        files = []
        for s in range(n_samples):
            genome = np.concatenate(
                [backbone, bases[rng.integers(0, 4, GEN - SHARE)]])
            n_reads = GEN * COV // READ_LEN
            starts = rng.integers(0, GEN - READ_LEN, n_reads)
            reads = genome[starts[:, None] + np.arange(READ_LEN)[None, :]]
            fp = os.path.join(td, f"stress_{s}.fa")
            with open(fp, "wb") as fh:
                for i in range(n_reads):
                    fh.write(b">r%d\n" % i)
                    fh.write(reads[i].tobytes())
                    fh.write(b"\n")
            files.append(fp)
        n_kmers = n_samples * (GEN * COV // READ_LEN) * (READ_LEN - K + 1)
        t0 = time.perf_counter()
        # matrix_pipeline emits each progress event at the END of its
        # stage, and stages run strictly sequentially (no overlap), so
        # the (previous event time, this event time) interval IS this
        # stage's (start, end) — attribution below is exact, not
        # approximate.  One caveat: the "components" interval also
        # contains the global contig recount, matching the reference's
        # component-cutter step which likewise includes the recount
        # (src/tools/ComponentCutterMain.java:78-86).
        marks = []        # (stage, sample, end_time) per pipeline event

        def progress(stage, name, info):
            marks.append((stage, name, round(time.perf_counter() - t0, 1)))

        res = matrix_pipeline(files, k=K, b=1, l=100, b1=1000, b2=10000,
                              progress=progress)
        dt_matrix = time.perf_counter() - t0

        # presence/stats tier over the union key set (stats/presence.py)
        from metafast_tpu.stats.presence import PackedPresence

        t1 = time.perf_counter()
        union = np.unique(np.concatenate(
            [t[0] for t in res.sample_tables]))
        pp = PackedPresence.from_tables(res.sample_tables, union)
        card = pp.cardinality()
        card_a = pp.cardinality(0, n_samples // 2)
        dt_presence = time.perf_counter() - t1
        dt = time.perf_counter() - t0
    peak_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1048576
    off = res.matrix[np.triu_indices(n_samples, 1)]
    # per-stage split from the event timeline (count+contigs interleave
    # per sample; components is one event; the rest is features+matrix)
    stage_s = {}
    per_sample = {"count": [], "contigs": []}
    prev = 0.0
    for stage, name, at in marks:
        stage_s[stage] = stage_s.get(stage, 0.0) + (at - prev)
        if stage in per_sample:
            per_sample[stage].append(round(at - prev, 1))
        prev = at
    stage_s["features_matrix"] = round(dt_matrix - prev, 1)
    stage_s["presence_stats"] = round(dt_presence, 1)
    print(json.dumps({
        "metric": "cami_scale_matrix_pipeline_throughput",
        "value": round(n_kmers / dt, 1),
        "unit": "kmers/s",
        "vs_baseline": None,
        "n_samples": n_samples,
        "wall_s": round(dt, 1),
        "total_kmers": n_kmers,
        "peak_host_rss_gb": round(peak_gb, 2),
        "n_components": len(res.components),
        "union_keys": int(len(union)),
        "cardinality_mean": round(float(card.mean()), 2),
        "cardinality_groupA_mean": round(float(card_a.mean()), 2),
        "uniques_per_sample": [len(t[0]) for t in res.sample_tables],
        "offdiag_min_max": [round(float(off.min()), 4),
                            round(float(off.max()), 4)],
        "stage_seconds": {k: round(v, 1) for k, v in stage_s.items()},
        # per-sample splits expose any superlinear-in-S stage
        "per_sample_seconds": per_sample,
    }))


if __name__ == "__main__":
    if "--stress" in sys.argv:
        ns = 8
        for a in sys.argv:
            if a.startswith("--samples="):
                ns = int(a.split("=", 1)[1])
        stress(ns)
    else:
        main()
