"""Golden tests of the NMI similarity gate against sklearn."""

import numpy as np
from sklearn.metrics import normalized_mutual_info_score

from microaligner_tpu.ops import mutual_info as MI


class TestNmi:
    def test_matches_sklearn_random(self, rng):
        a = rng.integers(0, 256, size=5000).astype(np.uint8)
        b = rng.integers(0, 256, size=5000).astype(np.uint8)
        assert abs(MI.nmi_u8(a, b) - normalized_mutual_info_score(a, b)) < 1e-5

    def test_matches_sklearn_correlated(self, rng):
        a = rng.integers(0, 256, size=5000).astype(np.uint8)
        noise = rng.integers(-6, 7, size=5000)
        b = np.clip(a.astype(int) + noise, 0, 255).astype(np.uint8)
        assert abs(MI.nmi_u8(a, b) - normalized_mutual_info_score(a, b)) < 1e-5

    def test_identical(self, rng):
        a = rng.integers(0, 256, size=1000).astype(np.uint8)
        assert abs(MI.nmi_u8(a, a) - 1.0) < 1e-6

    def test_constant_matches_sklearn(self):
        a = np.zeros(100, np.uint8)
        b = np.arange(100, dtype=np.uint8)
        ours = MI.nmi_u8(a, b)
        theirs = normalized_mutual_info_score(a, b)
        assert abs(ours - theirs) < 1e-6


class TestMiTiled:
    def test_small_image_whole(self, rng):
        # max(shape)/tile < 2 -> single whole NMI (similarity_scoring.py:35-36)
        a = rng.integers(0, 256, size=(50, 60)).astype(np.uint8)
        b = rng.integers(0, 256, size=(50, 60)).astype(np.uint8)
        ours = MI.mi_tiled(a, b, 1000)
        theirs = normalized_mutual_info_score(a.flatten(), b.flatten())
        assert abs(ours - theirs) < 1e-5

    def test_chunked_mean_matches_reference(self, rng):
        a = rng.integers(0, 256, size=(64, 70)).astype(np.uint8)
        b = rng.integers(0, 256, size=(64, 70)).astype(np.uint8)
        tile = 30
        ours = MI.mi_tiled(a, b, tile)
        # reference mi_tiled rebuilt with sklearn (similarity_scoring.py:37-50)
        indices = list(range(0, a.size, tile * tile))
        a_parts = np.array_split(a.flatten(), indices)
        b_parts = np.array_split(b.flatten(), indices)
        scores = [
            normalized_mutual_info_score(a_parts[i], b_parts[i])
            for i in range(len(a_parts))
            if a_parts[i].size != 0
        ]
        assert abs(ours - float(np.mean(scores))) < 1e-5

    def test_gate_direction(self, rng):
        ref = rng.integers(0, 256, size=(40, 40)).astype(np.uint8)
        noisy = np.clip(ref.astype(int) + rng.integers(-8, 9, ref.shape), 0, 255).astype(np.uint8)
        rand = rng.integers(0, 256, size=(40, 40)).astype(np.uint8)
        assert MI.check_if_higher_similarity(ref, noisy, rand, 1000) == [True]
        assert MI.check_if_higher_similarity(ref, rand, noisy, 1000) == [False]


def test_mi_tiled_traced_matches_host(rng):
    """The fused-gate traced NMI must equal the host chunked version."""
    import jax
    import jax.numpy as jnp

    from microaligner_tpu.ops.mutual_info import mi_tiled, mi_tiled_traced

    a = (rng.random((260, 300)) * 255).astype("uint8")
    b = (rng.random((260, 300)) * 255).astype("uint8")
    want = mi_tiled(a, b, 100)
    got = float(jax.jit(lambda x, y: mi_tiled_traced(x, y, 100))(
        jnp.asarray(a), jnp.asarray(b)))
    assert abs(got - want) < 1e-6
    # whole-image gating branch
    want2 = mi_tiled(a, b, 1000)
    got2 = float(jax.jit(lambda x, y: mi_tiled_traced(x, y, 1000))(
        jnp.asarray(a), jnp.asarray(b)))
    assert abs(got2 - want2) < 1e-6
