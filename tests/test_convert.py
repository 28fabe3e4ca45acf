"""TSPLIB / CVRPLib converters (reference data/tsp/convert.py, SURVEY §2.1
#23, and the CVRPLib reader semantics of HGS InstanceCVRPLIB, §2.2 N6)."""
import numpy as np

from deepaco_tpu.utils.convert import (
    convert_file,
    normalize_coords,
    parse_cvrplib,
    parse_tsplib,
)

TSPLIB = """NAME : toy5
TYPE : TSP
DIMENSION : 5
EDGE_WEIGHT_TYPE : EUC_2D
NODE_COORD_SECTION
1 0.0 0.0
2 10.0 0.0
3 10.0 10.0
4 0.0 10.0
5 5.0 5.0
EOF
"""

CVRPLIB = """NAME : toy-n5-k2
COMMENT : test
TYPE : CVRP
DIMENSION : 5
EDGE_WEIGHT_TYPE : EUC_2D
CAPACITY : 30
NODE_COORD_SECTION
1 50 50
2 10 20
3 90 80
4 40 10
5 60 90
DEMAND_SECTION
1 0
2 7
3 11
4 4
5 9
DEPOT_SECTION
1
-1
EOF
"""


def test_parse_tsplib_coords():
    coords = parse_tsplib(TSPLIB)
    assert coords.shape == (5, 2)
    np.testing.assert_allclose(coords[4], [5.0, 5.0])
    np.testing.assert_allclose(coords[1], [10.0, 0.0])


def test_normalize_unit_square():
    coords = normalize_coords(parse_tsplib(TSPLIB))
    assert coords.min() >= 0.0 and coords.max() <= 1.0 + 1e-7
    # aspect ratio preserved: one shared scale, not per-axis
    np.testing.assert_allclose(coords[2], [1.0, 1.0])
    np.testing.assert_allclose(coords[4], [0.5, 0.5])


def test_convert_file_roundtrip(tmp_path):
    src = tmp_path / "toy.tsp"
    src.write_text(TSPLIB)
    out = tmp_path / "toy.npy"
    coords = convert_file(str(src), str(out))
    np.testing.assert_array_equal(np.load(out), coords)


def test_parse_cvrplib_depot_first():
    inst = parse_cvrplib(CVRPLIB)
    assert inst["capacity"] == 30.0
    assert inst["coords"].shape == (5, 2)
    np.testing.assert_allclose(inst["coords"][0], [50.0, 50.0])  # depot
    assert inst["demands"][0] == 0.0
    np.testing.assert_allclose(inst["demands"], [0, 7, 11, 4, 9])


def test_parse_cvrplib_nonfirst_depot_remap():
    # depot declared as node 3: it must be moved to index 0
    text = CVRPLIB.replace("DEPOT_SECTION\n1\n", "DEPOT_SECTION\n3\n")
    inst = parse_cvrplib(text)
    np.testing.assert_allclose(inst["coords"][0], [90.0, 80.0])
    assert inst["demands"][0] == 11.0
    # remaining nodes keep ascending id order
    np.testing.assert_allclose(inst["demands"][1:], [0, 7, 4, 9])
