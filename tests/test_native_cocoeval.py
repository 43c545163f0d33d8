"""Native (C++) vs numpy COCO matcher equivalence on random data."""

import numpy as np
import pytest

import faster_orefsdet_tpu.evaluation.coco_eval as ce
from faster_orefsdet_tpu.evaluation.coco_eval import GTImage, _evaluate_image


@pytest.mark.skipif(ce._NATIVE is None, reason="native/libcocoeval.so not built")
def test_native_matches_python(rng):
    for trial in range(5):
        d, g = int(rng.integers(1, 30)), int(rng.integers(0, 15))
        dt = np.sort(rng.uniform(0, 100, (d, 2, 2)), axis=1).reshape(d, 4)[:, [0, 2, 1, 3]]
        gt = np.sort(rng.uniform(0, 100, (g, 2, 2)), axis=1).reshape(g, 4)[:, [0, 2, 1, 3]] if g else np.zeros((0, 4))
        scores = rng.uniform(0, 1, d)
        crowd = rng.uniform(size=g) < 0.2
        areas = (gt[:, 2] - gt[:, 0]) * (gt[:, 3] - gt[:, 1]) if g else np.zeros(0)
        gti = GTImage(1, gt, crowd, areas)
        arng = (0.0, 1e10) if trial % 2 == 0 else (100.0, 3000.0)

        native = ce._NATIVE
        try:
            s1, m1, i1, n1 = _evaluate_image(dt, scores, gti, arng, 100)
            ce._NATIVE = None
            s2, m2, i2, n2 = _evaluate_image(dt, scores, gti, arng, 100)
        finally:
            ce._NATIVE = native
        np.testing.assert_array_equal(m1, m2)
        np.testing.assert_array_equal(i1, i2)
        assert n1 == n2
        np.testing.assert_allclose(s1, s2)
