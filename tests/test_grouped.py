"""Hand-computed fixtures for the grouped sequential kernels (W2/W3/T4) —
the SURVEY.md §5 layer-2 tests (e.g. the 3-box NMS case, 2-person limb
graph)."""

from __future__ import annotations

import pandas as pd

from iii_aibigdata_capstone_spark.operators.grouped import (
    connected_components,
    greedy_match,
    iou_1d,
    nms_greedy,
)


def test_iou_1d():
    assert iou_1d(0, 10, 5, 15) == 5 / 15
    assert iou_1d(0, 10, 10, 20) == 0.0
    assert iou_1d(0, 10, 0, 10) == 1.0
    assert iou_1d(0, 10, 20, 30) == 0.0


def test_nms_three_boxes():
    # box 1 best; box 2 overlaps it heavily (suppressed); box 3 is clear.
    g = pd.DataFrame(
        {
            "box_id": [1, 2, 3],
            "lo": [0.0, 2.0, 50.0],
            "hi": [10.0, 12.0, 60.0],
            "prob": [0.9, 0.8, 0.7],
        }
    )
    out = nms_greedy(g, iou_threshold=0.3)
    assert sorted(out["box_id"]) == [1, 3]


def test_nms_chain_not_transitive():
    # A(0.9) suppresses B; C overlaps B but not A -> C survives. Greedy
    # (non-transitive) semantics — a window-rank approximation would kill C.
    g = pd.DataFrame(
        {
            "box_id": [1, 2, 3],
            "lo": [0.0, 6.0, 12.0],
            "hi": [10.0, 16.0, 22.0],
            "prob": [0.9, 0.8, 0.7],
        }
    )
    out = nms_greedy(g, iou_threshold=0.2)
    assert sorted(out["box_id"]) == [1, 3]


def test_nms_tiebreak_deterministic():
    g = pd.DataFrame(
        {
            "box_id": [2, 1],
            "lo": [0.0, 1.0],
            "hi": [10.0, 11.0],
            "prob": [0.5, 0.5],
        }
    )
    out = nms_greedy(g, iou_threshold=0.3)
    assert list(out["box_id"]) == [1]  # equal prob -> smaller id wins


def test_greedy_match_no_peak_reuse():
    # best pair (1,10); next best (1,11) shares peak 1 -> skipped; (2,11) ok.
    g = pd.DataFrame(
        {
            "a": [1, 1, 2],
            "b": [10, 11, 11],
            "score": [0.9, 0.8, 0.7],
        }
    )
    out = greedy_match(g)
    assert sorted(zip(out["a"], out["b"])) == [(1, 10), (2, 11)]


def test_greedy_match_stops_at_min_cardinality():
    # |A|=2, |B|=1 -> at most 1 match even though 2 disjoint-in-A pairs exist.
    g = pd.DataFrame({"a": [1, 2], "b": [10, 10], "score": [0.9, 0.8]})
    out = greedy_match(g)
    assert len(out) == 1
    assert (out.iloc[0]["a"], out.iloc[0]["b"]) == (1, 10)


def test_connected_components_two_persons_merge():
    # edges: 1-2, 2-3 (person A), 5-6 (person B); then 3-5 merges A and B.
    g = pd.DataFrame({"a": [1, 2, 5], "b": [2, 3, 6]})
    out = connected_components(g).set_index("node")["component"].to_dict()
    assert out == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5}

    g2 = pd.DataFrame({"a": [1, 2, 5, 3], "b": [2, 3, 6, 5]})
    out2 = connected_components(g2).set_index("node")["component"].to_dict()
    assert out2 == {1: 1, 2: 1, 3: 1, 5: 1, 6: 1}
