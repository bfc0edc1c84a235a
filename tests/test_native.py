"""Native C++ host runtime: MATPOWER parsing + COO planning, checked against
the pure-Python fallbacks (differential testing, both directions)."""

import numpy as np
import pytest

from examodels_tpu.native import (
    coo_compress_plan,
    native_available,
    parse_matpower_text,
    segment_bounds,
)

CASE_TEXT = """
function mpc = case3
mpc.version = '2';
mpc.baseMVA = 100;
mpc.bus = [
1 3 0    0    0 0 1 1.0 0 345 1 1.1 0.9;
2 1 300 98.6  0 0 1 1.0 0 345 1 1.1 0.9; % trailing comment
3 1 300, 98.6, 0, 0, 1, 1.0, 0, 345, 1, 1.1, 0.9
];
mpc.gen = [
1 0 0 300 -300 1.0 100 1 600 0;
3 0 0 300 -300 1.0 100 1 520 0
];
mpc.branch = [
1 2 0.01 0.1 0.02 250 0 0 0    0 1 -30 30;
2 3 0.01 0.1 0.02 250 0 0 0.98 3 1 -30 30
];
mpc.gencost = [
2 0 0 3 0.01 30 0;
2 0 0 3 0.02 25 0
];
"""


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
def test_native_matpower_parse():
    d = parse_matpower_text(CASE_TEXT)
    assert d["baseMVA"] == 100.0
    assert d["bus"].shape == (3, 13)
    assert d["gen"].shape == (2, 10)
    assert d["branch"].shape == (2, 13)
    assert d["gencost"].shape == (2, 7)
    assert d["bus"][1, 2] == 300.0
    assert d["branch"][1, 8] == 0.98
    # comment-only and ragged rows handled
    assert d["bus"][2, 3] == 98.6


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
def test_native_parse_matches_python_parser(tmp_path):
    from examodels_tpu.models.opf import parse_matpower

    p = tmp_path / "case3.m"
    p.write_text(CASE_TEXT)
    d_native = parse_matpower(str(p))

    import os

    os.environ["EXAMODELS_TPU_NO_NATIVE"] = "1"
    try:
        # force the regex fallback through a fresh call path
        import examodels_tpu.native as nat

        old_lib, old_tried = nat._LIB, nat._TRIED
        nat._LIB, nat._TRIED = None, True
        try:
            d_py = parse_matpower(str(p))
        finally:
            nat._LIB, nat._TRIED = old_lib, old_tried
    finally:
        del os.environ["EXAMODELS_TPU_NO_NATIVE"]

    for part in ("bus", "gen", "branch", "arc"):
        a, b = getattr(d_native, part), getattr(d_py, part)
        assert sorted(a.keys()) == sorted(b.keys())
        for k in a:
            np.testing.assert_allclose(a[k], b[k], err_msg=f"{part}.{k}")
    np.testing.assert_array_equal(d_native.ref_buses, d_py.ref_buses)


def test_coo_compress_plan_matches_numpy():
    rng = np.random.default_rng(0)
    rows = rng.integers(0, 50, 500)
    cols = rng.integers(0, 50, 500)
    perm, seg, ur, uc = coo_compress_plan(rows, cols)
    # dense reconstruction equals scatter-add of the raw COO
    vals = rng.standard_normal(500)
    dense = np.zeros((50, 50))
    np.add.at(dense, (rows, cols), vals)
    comp = np.zeros(len(ur))
    np.add.at(comp, seg, vals[perm])
    np.testing.assert_allclose(dense[ur, uc], comp)
    # unique + sorted coordinates
    key = ur.astype(np.int64) * 50 + uc
    assert (np.diff(key) > 0).all()


def test_segment_bounds_matches_searchsorted():
    t = np.sort(np.random.default_rng(1).integers(0, 20, 100))
    b = segment_bounds(t, 20)
    np.testing.assert_array_equal(b, np.searchsorted(t, np.arange(21)))
    assert b[0] == 0 and b[-1] == 100
