"""Graph-topology golden tests.

Fixtures in ``tests/fixtures/reference_adjacency.npz`` were generated once by
executing the reference's ``Graph``/``adjGraph`` classes
(``Fall_2_Spatial_Temporal_SR/Model/graph.py``,
``Multimodal_Fall3/model/musa_model.py:201-322``) and dumping the resulting
``.A`` arrays; our vectorized rebuild must match bit-for-bit (both are float64
numpy with the same arithmetic).
"""

import os

import numpy as np
import pytest

from fall_multimodal_tpu.graphs import (
    LAYOUTS,
    binary_adjacency,
    build_adjacency,
    embgcn_static_adjacency,
    hop_distance,
    normalize_digraph,
    normalize_undigraph,
)

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures", "reference_adjacency.npz")


@pytest.fixture(scope="module")
def golden():
    return np.load(FIXTURES)


@pytest.mark.parametrize("layout", ["coco_cut", "coco_mmpose"])
@pytest.mark.parametrize("strategy", ["uniform", "distance", "spatial"])
def test_gen2_layouts_match_reference(golden, layout, strategy):
    ours = build_adjacency(layout=layout, strategy=strategy)
    theirs = golden[f"{layout}__{strategy}"]
    np.testing.assert_allclose(ours, theirs, rtol=0, atol=1e-12)


@pytest.mark.parametrize("layout", ["openpose", "ntu-rgb+d", "ntu_edge", "coco_cut"])
@pytest.mark.parametrize("strategy", ["uniform", "spatial"])
def test_gen3_layouts_match_reference(golden, layout, strategy):
    ours = build_adjacency(layout=layout, strategy=strategy)
    theirs = golden[f"gen3_{layout}__{strategy}"]
    np.testing.assert_allclose(ours, theirs, rtol=0, atol=1e-12)


@pytest.mark.parametrize(
    "strategy,key", [("spatial", "gen3_coco_cut__spatial__hop2"), ("distance", "gen3_coco_cut__distance__hop2")]
)
def test_max_hop_2(golden, strategy, key):
    ours = build_adjacency(layout="coco_cut", strategy=strategy, max_hop=2)
    np.testing.assert_allclose(ours, golden[key], rtol=0, atol=1e-12)


def test_partition_counts():
    assert build_adjacency("coco_cut", "uniform").shape == (1, 14, 14)
    assert build_adjacency("coco_cut", "distance").shape == (2, 14, 14)
    assert build_adjacency("coco_cut", "spatial").shape == (3, 14, 14)
    assert build_adjacency("coco_cut", "spatial", max_hop=2).shape == (5, 14, 14)


def test_uniform_partition_is_column_normalized():
    a = build_adjacency("coco_cut", "uniform")[0]
    np.testing.assert_allclose(a.sum(axis=0), np.ones(14), atol=1e-12)


def test_spatial_partitions_sum_to_uniform():
    # The spatial partitions tile the support of the normalized adjacency.
    spatial = build_adjacency("coco_cut", "spatial").sum(axis=0)
    uniform = build_adjacency("coco_cut", "uniform")[0]
    np.testing.assert_allclose(spatial, uniform, atol=1e-12)


def test_hop_distance_symmetry_and_diagonal():
    lay = LAYOUTS["coco_cut"]
    h = hop_distance(lay.num_node, lay.edges, max_hop=3)
    np.testing.assert_allclose(h, h.T)
    np.testing.assert_allclose(np.diag(h), np.zeros(14))


def test_normalizers():
    rng = np.random.default_rng(0)
    a = (rng.random((6, 6)) > 0.5).astype(float)
    d = normalize_digraph(a)
    cols = a.sum(axis=0)
    np.testing.assert_allclose(d.sum(axis=0)[cols > 0], 1.0)
    u = normalize_undigraph(a)
    assert u.shape == (6, 6)
    # isolated-node columns stay zero in both
    a2 = a.copy()
    a2[:, 0] = 0
    assert normalize_digraph(a2)[:, 0].sum() == 0
    assert normalize_undigraph(a2)[:, 0].sum() == 0


def test_binary_adjacency_contains_self_loops():
    b = binary_adjacency("coco_cut")
    assert np.all(np.diag(b) == 1)
    assert b.shape == (14, 14)


def test_embgcn_static_adjacency_rows_softmaxed():
    rng = np.random.default_rng(1)
    adj = rng.random((14, 14))
    s = embgcn_static_adjacency(adj)
    np.testing.assert_allclose(s.sum(axis=1), np.ones(14), atol=1e-12)
    assert np.all(s > 0)
