"""CLI round-trips (sprintz_tpu.__main__): container + raw modes."""

import numpy as np
import pytest

from sprintz_tpu.__main__ import main
from sprintz_tpu import api


@pytest.fixture
def raw_file(tmp_path, rng):
    data = (np.cumsum(rng.integers(-5, 6, (3000, 8)), axis=0) % 256
            ).astype(np.uint8)
    p = tmp_path / "raw.bin"
    data.tofile(p)
    return p, data


@pytest.mark.parametrize("codec", ["delta", "xff"])
@pytest.mark.parametrize("entropy", ["none", "huffman"])
def test_cli_roundtrip_container(tmp_path, raw_file, codec, entropy):
    raw, data = raw_file
    spz = tmp_path / "out.spz"
    out = tmp_path / "rt.bin"
    assert main(["compress", str(raw), str(spz), "--ndims", "8",
                 "--codec", codec, "--entropy", entropy]) == 0
    assert spz.read_bytes()[:5] == b"SPZT1"
    # container decode needs NO flags: codec/dtype/entropy ride the header
    assert main(["decompress", str(spz), str(out)]) == 0
    assert np.array_equal(np.fromfile(out, np.uint8),
                          data.reshape(-1))
    assert main(["info", str(spz)]) == 0


def test_cli_raw_stream_is_reference_exact(tmp_path, raw_file):
    raw, data = raw_file
    spz = tmp_path / "out.raw.spz"
    assert main(["compress", str(raw), str(spz), "--ndims", "8",
                 "--raw"]) == 0
    assert spz.read_bytes() == api.compress(data, ndims=8)
    out = tmp_path / "rt.bin"
    assert main(["decompress", str(spz), str(out), "--raw"]) == 0
    assert np.array_equal(np.fromfile(out, np.uint8), data.reshape(-1))


def test_cli_query_matches_numpy(tmp_path, raw_file, capsys):
    raw, data = raw_file
    spz = tmp_path / "out.spz"
    main(["compress", str(raw), str(spz), "--ndims", "8"])
    assert main(["query", str(spz), "--op", "sum"]) == 0
    got = eval(capsys.readouterr().out.strip())
    assert got == data.sum(axis=0, dtype=np.int64).tolist()


def test_cli_u16(tmp_path, rng):
    data = (np.cumsum(rng.integers(-300, 301, (2000, 4)), axis=0)
            % (1 << 16)).astype(np.uint16)
    raw = tmp_path / "raw16.bin"
    data.tofile(raw)
    spz = tmp_path / "o.spz"
    out = tmp_path / "rt.bin"
    assert main(["compress", str(raw), str(spz), "--ndims", "4",
                 "--dtype", "u16", "--codec", "xff"]) == 0
    assert main(["decompress", str(spz), str(out)]) == 0
    assert np.array_equal(np.fromfile(out, np.uint16), data.reshape(-1))


def test_cli_rejects_misaligned_ndims(tmp_path, raw_file):
    raw, _ = raw_file
    assert main(["compress", str(raw), str(tmp_path / "x"),
                 "--ndims", "7"]) == 2
