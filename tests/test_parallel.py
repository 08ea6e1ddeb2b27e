"""Sharded multi-chip paths on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax


@pytest.fixture(scope="module")
def mesh8():
    from sprintz_tpu.parallel import shard

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return shard.make_mesh(8)


def test_dp_roundtrip(rng, mesh8):
    from sprintz_tpu.parallel import shard

    D = 16
    rows = (np.cumsum(rng.integers(-3, 4, (8 * 8 * 32, D)), axis=0) % 256
            ).astype(np.int32)
    decoded, nbytes = shard.training_step(mesh8, rows, elem_sz=1, codec="delta")
    np.testing.assert_array_equal(
        np.asarray(decoded).astype(np.uint8), rows.astype(np.uint8))
    assert int(nbytes) > 0


def test_dp_offsets_are_exclusive_scan(rng, mesh8):
    from sprintz_tpu.parallel import shard

    rows = rng.integers(0, 256, (8 * 8 * 4, 8)).astype(np.int32)
    dense, widths, hdr, sizes, offsets = shard.dp_encode(
        mesh8, rows, elem_sz=1, codec="delta")
    sizes = np.asarray(sizes).reshape(-1)
    offsets = np.asarray(offsets).reshape(-1)
    np.testing.assert_array_equal(
        offsets, np.concatenate([[0], np.cumsum(sizes)[:-1]]))


def test_graft_entry_dryrun():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert all(np.asarray(o) is not None for o in out)
    ge.dryrun_multichip(min(8, len(jax.devices())))


def test_dp_compress_byte_exact(rng, mesh8):
    from sprintz_tpu import encoder
    from sprintz_tpu.parallel import shard

    for D, n_rows in [(16, 4096), (9, 2000)]:
        x = np.where(rng.random((n_rows, D)) < 0.1,
                     rng.integers(0, 60, (n_rows, D)), 0).astype(np.uint8)
        flat = x.reshape(-1)
        multi = shard.dp_compress(mesh8, flat, D, codec="delta")
        assert multi == encoder.compress(flat, D, codec="delta")
