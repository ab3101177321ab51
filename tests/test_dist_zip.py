"""The committed --py-files artifact must match the package tree: a stale
dist/ zip ships old code to executors (bit us once in round 2 before
e9c3534). This is the CI gate the judge asked for -- if it fails, run
tools/build_pyfiles.sh and commit the zip."""

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ZIP = os.path.join(REPO, "dist", "osm_pbf_convert_spark.zip")
PKG = os.path.join(REPO, "osm_pbf_convert_spark")


def _tree_files():
    out = {}
    for root, _, files in os.walk(PKG):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                rel = os.path.relpath(p, REPO)
                out[rel] = open(p, "rb").read()
    return out


def test_zip_matches_package_tree():
    assert os.path.exists(ZIP), "dist zip missing -- run tools/build_pyfiles.sh"
    tree = _tree_files()
    with zipfile.ZipFile(ZIP) as z:
        names = set(z.namelist())
        assert names == set(tree), (
            f"zip/tree drift: only-in-zip={sorted(names - set(tree))}, "
            f"only-in-tree={sorted(set(tree) - names)} -- run tools/build_pyfiles.sh"
        )
        for name, content in tree.items():
            assert z.read(name) == content, f"stale zip entry {name} -- run tools/build_pyfiles.sh"
