"""RCPSP anytime evaluation driver (reference rcpsp/test.ipynb protocol):
classic and neural paths, horizon padding, chunking, curve monotonicity."""
import numpy as np
import pytest

from deepaco_tpu.core.rcpsp import check_schedule, load_psplib
from deepaco_tpu.eval.rcpsp import evaluate_rcpsp

ARCHIVE = "/root/reference/data/rcpsp/psplib.tar.gz"


@pytest.fixture(scope="module")
def j30():
    return load_psplib(ARCHIVE, "j30rcp", limit=3)


def test_classic_curves_monotone_and_feasible(j30):
    means, curves = evaluate_rcpsp(j30, None, n_ants=8, t_values=(1, 3, 5),
                                   seed=0, b_chunk=2)
    assert curves.shape == (3, 5)
    assert np.all(np.diff(curves, axis=1) <= 0)     # best-so-far decreases
    assert np.all(np.isfinite(curves))
    # makespans are integral start times (SSGS decodes on an int timeline)
    assert np.allclose(curves, np.round(curves))
    assert means.shape == (3,)


def test_neural_checkpoint_path(j30):
    from deepaco_tpu.models.torch_compat import load_reference_checkpoint

    v = load_reference_checkpoint(
        "/root/reference/pretrained/rcpsp/rcpsp30-5.pt")
    means, curves = evaluate_rcpsp(j30, v, n_ants=8, t_values=(1, 3),
                                   seed=0, b_chunk=3)
    assert np.all(np.isfinite(curves)) and curves.shape == (3, 3)


def test_chunk_padding_is_sliced_off(j30):
    """Partial final chunk (b=3, chunk=2) pads with a repeated instance;
    the padded block must produce the same real row as an explicitly
    duplicated batch (identical stacked inputs + identical block key)."""
    _, padded = evaluate_rcpsp(j30, None, n_ants=6, t_values=(1, 2),
                               seed=3, b_chunk=2)
    _, explicit = evaluate_rcpsp(j30 + [j30[2]], None, n_ants=6,
                                 t_values=(1, 2), seed=3, b_chunk=2)
    assert padded.shape == (3, 2) and explicit.shape == (4, 2)
    np.testing.assert_allclose(padded, explicit[:3])
