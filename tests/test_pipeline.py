"""Golden end-to-end test: full default pipeline vs the reference's
published matrix (test_data/meta_test_matrix.txt, README.md:88-99)."""

import numpy as np
import pytest

from metafast_tpu.pipeline import matrix_pipeline

GOLDEN = {
    (0, 1): 0.5691162409506898,
    (0, 2): 0.2981399448537721,
    (1, 2): 0.8448331091037222,
}


@pytest.fixture(scope="module")
def result(ref_data):
    files = [str(ref_data / f"meta_test_{i}.fa") for i in (1, 2, 3)]
    return matrix_pipeline(files, k=31, b=1, l=100, b1=1000, b2=10000)


def test_golden_matrix(result):
    for (i, j), v in GOLDEN.items():
        assert result.matrix[i, j] == pytest.approx(v, abs=1e-12)
        assert result.matrix[j, i] == pytest.approx(v, abs=1e-12)
    assert np.all(np.diag(result.matrix) == 0.0)


def test_components_shape(result):
    # locked-in intermediate state for the fixture (validated against the
    # golden matrix end to end; sizes are order-free facts of the graph)
    assert sorted(c.size for c in result.components) == [2088, 3020, 5713, 6240]


def test_sample_names(result):
    assert result.names == ["meta_test_1", "meta_test_2", "meta_test_3"]


def test_vectors_positive(result):
    assert result.vectors.shape == (3, 4)
    assert (result.vectors.sum(axis=1) > 0).all()
    assert (result.breadth >= 0).all() and (result.breadth <= 1).all()


def test_oracle_agrees(ref_data):
    """The slow NumPy oracle and the JAX path produce identical matrices."""
    from metafast_tpu.oracle import reference as o

    files = [str(ref_data / f"meta_test_{i}.fa") for i in (1, 2, 3)]
    K, B, L, B1, B2 = 31, 1, 100, 1000, 10000

    def read_fasta(path):
        reads, cur = [], []
        for line in open(path):
            line = line.strip()
            if line.startswith(">"):
                if cur:
                    reads.append("".join(cur))
                    cur = []
            else:
                cur.append(line)
        if cur:
            reads.append("".join(cur))
        return reads

    samples = [o.count_reads(read_fasta(f), K) for f in files]
    contigs = []
    for counts in samples:
        filt = o.filter_counts(counts, B)
        contigs.extend(s[0] for s in o.build_contigs(filt, K, L))
    graph = o.count_reads(contigs, K, min_len=L)
    comps = o.split_components(graph, K, B1, B2)
    vecs = np.array([
        o.feature_vector(comps, o.filter_counts(c, B))[0] for c in samples
    ], dtype=np.float64)
    for (i, j), v in GOLDEN.items():
        assert o.bray_curtis(vecs[i], vecs[j]) == pytest.approx(v, abs=1e-12)
