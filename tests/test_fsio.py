"""Unit tests for the seekable filesystem abstraction (sources/fsio.py)."""

import os

import pytest

from osm_pbf_convert_spark.sources import fsio


def test_local_and_file_scheme_resolve(tmp_path):
    p = tmp_path / "x.bin"
    p.write_bytes(b"0123456789")
    for form in (str(p), "file://" + str(p)):
        assert fsio.file_size(form) == 10
        with fsio.open_seekable(form) as f:
            f.seek(4)
            assert f.read(3) == b"456"
        assert fsio.is_local(form)


def test_mock_scheme_is_not_local(tmp_path):
    p = tmp_path / "y.bin"
    p.write_bytes(b"abc")
    uri = fsio.mock_uri(str(p))
    assert not fsio.is_local(uri)
    with pytest.raises(ValueError):
        fsio.local_path(uri)
    assert fsio.file_size(uri) == 3
    with fsio.open_seekable(uri) as f:
        f.seek(1)
        assert f.read(2) == b"bc"


def test_mock_scheme_output_and_makedirs(tmp_path):
    out = fsio.mock_uri(str(tmp_path / "a" / "b" / "z.bin"))
    fsio.makedirs(fsio.mock_uri(str(tmp_path / "a" / "b")))
    with fsio.open_output(out) as f:
        f.write(b"payload")
    assert (tmp_path / "a" / "b" / "z.bin").read_bytes() == b"payload"


def test_expand_glob_local_and_remote(tmp_path):
    for name in ("k1.dat", "k2.dat", "skip.txt"):
        (tmp_path / name).write_bytes(b"x")
    local = fsio.expand_glob(str(tmp_path / "k*.dat"))
    assert [os.path.basename(p) for p in local] == ["k1.dat", "k2.dat"]
    remote = fsio.expand_glob(fsio.mock_uri(str(tmp_path)) + "/k*.dat")
    assert [p.rsplit("/", 1)[-1] for p in remote] == ["k1.dat", "k2.dat"]
    assert all(p.startswith("mock:///") for p in remote)
    # a concrete (non-magic) path expands to itself, even if absent
    assert fsio.expand_glob(str(tmp_path / "k1.dat")) == [str(tmp_path / "k1.dat")]


def test_missing_file_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        fsio.file_size(str(tmp_path / "absent.bin"))
    with pytest.raises(FileNotFoundError):
        fsio.file_size(fsio.mock_uri(str(tmp_path / "absent.bin")))


def test_unknown_scheme_raises():
    with pytest.raises(Exception):
        fsio.resolve("weirdfs-o3x://bucket/key")
