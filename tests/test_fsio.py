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


def test_glob_segment_semantics(tmp_path):
    """`*` must stay within one path segment; `**` must recurse (ADVICE
    r6: the recursive matcher shipped untested)."""
    (tmp_path / "sub" / "deep").mkdir(parents=True)
    for rel in ("a.pbf", "sub/b.pbf", "sub/deep/c.pbf", "sub/d.txt"):
        (tmp_path / rel).write_bytes(b"x")

    def names(pat):
        return [p.split(str(tmp_path) + "/", 1)[1] for p in fsio.expand_glob(pat)]

    def remote_names(pat):
        base = fsio.mock_uri(str(tmp_path))
        return [p.split("/", 3)[-1].split(str(tmp_path).lstrip("/") + "/", 1)[1]
                for p in fsio.expand_glob(base + "/" + pat)]

    # dir/*.pbf must NOT match dir/sub/x.pbf on either branch
    assert names(str(tmp_path / "*.pbf")) == ["a.pbf"]
    assert remote_names("*.pbf") == ["a.pbf"]
    # dir/**/*.pbf must match all depths on the remote branch (the local
    # branch delegates to glob.glob, which needs recursive=True for `**`
    # -- remote is the branch _match_glob serves)
    assert remote_names("**/*.pbf") == ["a.pbf", "sub/b.pbf", "sub/deep/c.pbf"]
    # single-level wildcard dir
    assert remote_names("*/*.pbf") == ["sub/b.pbf"]
    # `?` stays within a segment too
    assert remote_names("?.pbf") == ["a.pbf"]


def test_match_glob_unit():
    assert fsio._match_glob("d/a.pbf", "d/*.pbf")
    assert not fsio._match_glob("d/s/a.pbf", "d/*.pbf")
    assert fsio._match_glob("d/s/a.pbf", "d/**/*.pbf")
    assert fsio._match_glob("d/a.pbf", "d/**/*.pbf")  # ** matches zero segs
    assert fsio._match_glob("d/s/t/a.pbf", "d/**")
    assert not fsio._match_glob("d/s/a.txt", "d/**/*.pbf")


def test_missing_file_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        fsio.file_size(str(tmp_path / "absent.bin"))
    with pytest.raises(FileNotFoundError):
        fsio.file_size(fsio.mock_uri(str(tmp_path / "absent.bin")))


def test_unknown_scheme_raises():
    with pytest.raises(Exception):
        fsio.resolve("weirdfs-o3x://bucket/key")
