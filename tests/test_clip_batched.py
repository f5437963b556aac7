"""Direct property tests: the batched Sutherland-Hodgman clipper is
bit-identical to the scalar one on random rings, and dp4_mask on random
quads (wider coverage than the pipeline-level fast==slow tests)."""

import numpy as np

from cloudtile_ray.geo.simplify import douglas_peucker_mask
from cloudtile_ray.stages.polygons import (
    clip_ring_to_box,
    clip_rings_batched,
    dp4_mask,
)


def test_batched_clip_equals_scalar():
    rng = np.random.default_rng(5)
    m = 2000
    P = rng.uniform(-80, 4176, (m, 4, 2))
    # include rings fully inside, fully outside, and degenerate (repeated pts)
    P[:200] = rng.uniform(100, 300, (200, 4, 2))
    P[200:250] = rng.uniform(5000, 6000, (50, 4, 2))
    P[250:260, 1] = P[250:260, 0]
    box = (-5.0, -5.0, 4101.0, 4101.0)
    out, cnts = clip_rings_batched(P, np.full(m, 4, dtype=np.int64), *box)
    for i in range(m):
        want = clip_ring_to_box(P[i], *box)
        got = out[i, : cnts[i]]
        assert got.shape == want.shape, i
        np.testing.assert_array_equal(got, want)  # bit-identical


def test_dp4_equals_scalar_wide():
    rng = np.random.default_rng(6)
    P = rng.uniform(0, 4096, (3000, 4, 2))
    P[:500] *= 1e-3
    P[500:600, 1] = P[500:600, 0]  # duplicate vertices
    for tol in (0.0001, 1.0, 50.0, 5000.0):
        got = dp4_mask(P, tol)
        for i in range(P.shape[0]):
            want = douglas_peucker_mask(P[i], tol)
            if want.sum() < 3:
                extra = np.argsort(~want, kind="stable")[:3]
                want[extra] = True
            assert (got[i] == want).all(), (i, tol)
