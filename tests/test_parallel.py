"""Multi-device tests on the virtual 8-device CPU mesh: shard_map tile
parallelism, the fused register step, and the driver dry-run hooks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from microaligner_tpu.parallel.mesh import get_tile_mesh, sharded_tile_map
from microaligner_tpu.parallel.step import make_sharded_register_step
from microaligner_tpu.tiles import TileGrid


@pytest.fixture(scope="module")
def mesh8():
    assert jax.device_count() >= 8, "conftest should provide 8 CPU devices"
    return get_tile_mesh(jax.devices()[:8])


class TestShardedTileMap:
    def test_matches_vmap(self, mesh8, rng):
        tiles = jnp.asarray(rng.random((11, 32, 32)), jnp.float32)  # 11 % 8 != 0
        fn = lambda t: t * 2.0 + 1.0
        out = sharded_tile_map(fn, mesh8)(tiles)
        np.testing.assert_allclose(np.asarray(out), np.asarray(tiles) * 2 + 1, rtol=1e-6)

    def test_single_device_degenerates(self, rng):
        mesh1 = get_tile_mesh(jax.devices()[:1])
        tiles = jnp.asarray(rng.random((3, 16, 16)), jnp.float32)
        out = sharded_tile_map(lambda t: t + 1.0, mesh1)(tiles)
        np.testing.assert_allclose(np.asarray(out), np.asarray(tiles) + 1)


class TestShardedRegisterStep:
    def test_step_on_8_devices(self, mesh8, rng):
        tile = 32
        grid = TileGrid.for_image((tile * 4, tile * 2), tile, 8)
        step = make_sharded_register_step(mesh8, grid, win_size=9, num_iter=1)
        ref = jnp.asarray(rng.random((tile * 4, tile * 2)) * 255, jnp.float32)
        mov = jnp.asarray(rng.random((tile * 4, tile * 2)) * 255, jnp.float32)
        warped, flow, hist = step(ref, mov)
        assert warped.shape == ref.shape
        assert flow.shape == ref.shape + (2,)
        # psum'd joint histogram counts every interior pixel once
        assert abs(float(jnp.sum(hist)) - grid.height * grid.width) < 1e-3

    def test_step_matches_single_device(self, mesh8, rng):
        tile = 32
        grid = TileGrid.for_image((tile * 4, tile * 2), tile, 8)
        ref = jnp.asarray(rng.random((tile * 4, tile * 2)) * 255, jnp.float32)
        mov = jnp.asarray(rng.random((tile * 4, tile * 2)) * 255, jnp.float32)
        step8 = make_sharded_register_step(mesh8, grid, win_size=9, num_iter=1)
        step1 = make_sharded_register_step(get_tile_mesh(jax.devices()[:1]), grid, 9, 1)
        w8, f8, h8 = step8(ref, mov)
        w1, f1, h1 = step1(ref, mov)
        np.testing.assert_allclose(np.asarray(f8), np.asarray(f1), atol=1e-4)
        np.testing.assert_allclose(np.asarray(w8), np.asarray(w1), atol=1e-2)
        # histograms bin clipped float warps to integers: a ~1e-6 flow rounding
        # difference between device layouts can move a pixel across a bin edge,
        # so require equal totals and only a few boundary-crossing counts
        h8 = np.asarray(h8)
        h1 = np.asarray(h1)
        assert h8.sum() == h1.sum()
        assert np.abs(h8 - h1).sum() <= 8


class TestGraftEntry:
    def test_dryrun_multichip(self):
        import __graft_entry__ as g

        g.dryrun_multichip(8)

    def test_entry_compiles(self):
        import __graft_entry__ as g

        fn, args = g.entry()
        out = fn(*args)
        jax.block_until_ready(out)


class TestStreamApply:
    def test_order_and_content(self, rng):
        from microaligner_tpu.pipeline.apply import stream_apply

        planes = [(i, rng.random((8, 8)).astype(np.float32)) for i in range(7)]
        got = {}
        stream_apply(
            iter(planes),
            lambda p: jnp.asarray(p) * 3.0,
            lambda k, v: got.__setitem__(k, v),
        )
        assert set(got) == set(range(7))
        for k, p in planes:
            np.testing.assert_allclose(got[k], p * 3.0, rtol=1e-6)

    def test_writer_error_propagates(self, rng):
        from microaligner_tpu.pipeline.apply import stream_apply

        def bad_write(k, v):
            raise RuntimeError("disk full")

        with pytest.raises(RuntimeError, match="disk full"):
            stream_apply(
                iter([(0, np.zeros((4, 4), np.float32))] * 3),
                lambda p: jnp.asarray(p),
                bad_write,
            )

    def test_reader_error_propagates(self):
        from microaligner_tpu.pipeline.apply import stream_apply

        def planes():
            yield (0, np.zeros((4, 4), np.float32))
            raise ValueError("decode failed")

        got = {}
        with pytest.raises(ValueError, match="decode failed"):
            stream_apply(planes(), lambda p: jnp.asarray(p), got.__setitem__)
        assert 0 in got  # planes before the failure were still written

    def test_writer_hang_raises(self):
        import threading

        from microaligner_tpu.pipeline.apply import stream_apply

        release = threading.Event()
        with pytest.raises(RuntimeError, match="made no progress"):
            stream_apply(
                iter([(0, np.zeros((4, 4), np.float32))]),
                lambda p: jnp.asarray(p),
                lambda k, v: release.wait(30),  # hung sink, well past the join timeout
                join_timeout_s=0.5,
            )
        release.set()


class TestCompatTiling:
    def test_reference_shaped_api(self, rng):
        from microaligner_tpu.tiles import split_image_into_tiles_of_size, stitch_image

        img = rng.integers(0, 255, (70, 90)).astype(np.uint8)
        tiles, info = split_image_into_tiles_of_size(img, 40, 40, 10)
        assert info["ntiles"] == {"x": 3, "y": 2}
        assert len(tiles) == 6
        back = stitch_image(tiles, info)
        np.testing.assert_array_equal(back, img)
