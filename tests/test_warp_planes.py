"""Multi-plane shared-flow apply == N independent per-plane applies.

The z-stack/multi-channel apply (reference __main__.py:288-302) warps every
plane of a cycle with the same flow; ``warp_planes_tiled`` computes the
flow-derived bilinear weights once per band instead of once per plane.  Its
results must match the single-plane production path bit-for-bit semantics
(same banded halo contract, same round/clip)."""

import jax.numpy as jnp
import numpy as np
import pytest

from microaligner_tpu.optflow.warper import warp_planes_tiled, warp_tiled_dtype
from microaligner_tpu.pipeline.runner import _apply_flow_plane, _apply_flow_planes
from microaligner_tpu.tiles import TileGrid


@pytest.fixture(scope="module")
def stack_and_flow():
    rng = np.random.default_rng(11)
    planes = rng.integers(0, 65535, (3, 260, 300)).astype(np.uint16)
    ys, xs = np.mgrid[0:260, 0:300].astype(np.float32)
    flow = np.stack(
        [2.0 * np.sin(ys / 17), 1.5 * np.cos(xs / 23)], axis=-1
    ).astype(np.float32)
    return planes, flow


def test_multi_matches_per_plane_f32(stack_and_flow):
    planes, flow = stack_and_flow
    grid = TileGrid.for_image((260, 300), 120, 20)
    multi = np.asarray(
        warp_planes_tiled(jnp.asarray(planes), jnp.asarray(flow), grid, "float32")
    )
    for i in range(planes.shape[0]):
        single = np.asarray(
            warp_tiled_dtype(jnp.asarray(planes[i]), jnp.asarray(flow), grid, "float32")
        )
        np.testing.assert_allclose(multi[i], single, atol=1e-4)


def test_apply_flow_planes_matches_plane_u16(stack_and_flow):
    planes, flow = stack_and_flow
    grid = TileGrid.for_image((260, 300), 120, 20)
    multi = np.asarray(
        _apply_flow_planes(jnp.asarray(planes), jnp.asarray(flow), grid, "uint16")
    )
    assert multi.dtype == np.uint16
    for i in range(planes.shape[0]):
        single = np.asarray(
            _apply_flow_plane(jnp.asarray(planes[i]), jnp.asarray(flow), grid, "uint16")
        )
        # identical banded path and round/clip; bilinear weight order may
        # differ by one fused FMA -> allow 1 lsb on the u16 grid
        assert np.max(np.abs(multi[i].astype(np.int32) - single.astype(np.int32))) <= 1


def test_multi_large_displacement_exact_fallback(stack_and_flow):
    planes, _ = stack_and_flow
    grid = TileGrid.for_image((260, 300), 120, 20)
    rng = np.random.default_rng(5)
    # displacements beyond the static band force the exact-gather branch
    flow = rng.uniform(-11, 11, (260, 300, 2)).astype(np.float32)
    multi = np.asarray(
        warp_planes_tiled(jnp.asarray(planes), jnp.asarray(flow), grid, "float32")
    )
    for i in range(planes.shape[0]):
        single = np.asarray(
            warp_tiled_dtype(jnp.asarray(planes[i]), jnp.asarray(flow), grid, "float32")
        )
        np.testing.assert_allclose(multi[i], single, atol=1e-3)
