"""Native C++ components vs their Python references (builds the library if
needed; skips if no compiler)."""

import numpy as np
import pytest

from osufusion_tpu import native
from osufusion_tpu.osu import Beatmap, bezier_math
from osufusion_tpu.osu.difficulty import calculate_star_rating
from tests.helpers import write_synthetic_map


@pytest.fixture(scope="module", autouse=True)
def ensure_built():
    if not native.available() and not native.build():
        pytest.skip("no C++ toolchain available to build the native library")


def test_native_star_rating_matches_python(tmp_path):
    bm = Beatmap(write_synthetic_map(tmp_path))
    py = calculate_star_rating(bm)
    cc = native.calculate_star_rating(bm)
    assert cc == pytest.approx(py, rel=1e-9)


def test_native_bezier_evaluate_matches_python():
    rng = np.random.default_rng(0)
    nodes = rng.uniform(0, 500, (5, 2))
    ts = np.linspace(0, 1, 33)
    py = bezier_math.evaluate(nodes, ts)
    cc = native.bezier_evaluate(nodes, ts)
    np.testing.assert_allclose(cc, py, rtol=1e-10)


def test_native_bezier_length_matches_python():
    rng = np.random.default_rng(1)
    for n in (2, 3, 4, 8):
        nodes = rng.uniform(0, 500, (n, 2))
        py = bezier_math.curve_length(nodes)
        cc = native.bezier_curve_length(nodes)
        assert cc == pytest.approx(py, rel=1e-10)


def test_native_is_faster_than_python(tmp_path):
    """The point of the native path: per-segment SR in the input pipeline."""
    import time

    bm = Beatmap(write_synthetic_map(tmp_path))
    t0 = time.perf_counter()
    for _ in range(50):
        native.calculate_star_rating(bm)
    native_t = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(50):
        calculate_star_rating(bm)
    python_t = time.perf_counter() - t0
    # allow noise but the native path should not be slower
    assert native_t < python_t * 1.5
