"""UID database: build + classify vs reference goldens."""

import io
import os

import numpy as np
import pytest

DATA = os.path.join(os.path.dirname(__file__), "golden", "data")

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(DATA, "kraken_uid.out")), reason="golden fixture missing"
)


def test_uid_build_matches_reference(tmp_path):
    from krakenuniq_tpu.build.uid_build import build_uid_database
    from krakenuniq_tpu.formats import read_kdb, read_index
    from krakenuniq_tpu.formats.seqmap import read_seqid2taxid

    hdr, keys, _ = read_kdb(os.path.join(DATA, "database.kdb"))
    _, nt, offsets = read_index(os.path.join(DATA, "database.idx"))
    build_uid_database(
        [os.path.join(DATA, "library.fna")],
        read_seqid2taxid(os.path.join(DATA, "seqid2taxid.map")),
        keys,
        hdr.k,
        nt,
        offsets,
        tmp_path,
    )
    _, got_keys, got_vals = read_kdb(tmp_path / "uid_database.kdb")
    _, ref_keys, ref_vals = read_kdb(os.path.join(DATA, "uid_database.kdb"))
    np.testing.assert_array_equal(got_keys, ref_keys)
    np.testing.assert_array_equal(got_vals, ref_vals)
    got_map = open(tmp_path / "uid_to_taxid.map", "rb").read()
    ref_map = open(os.path.join(DATA, "uid_to_taxid.map"), "rb").read()
    assert got_map == ref_map


def test_uid_classify_matches_reference():
    from krakenuniq_tpu.classify import Classifier, ClassifyOptions

    c = Classifier(
        [DATA], ClassifyOptions(print_progress=False), uid_database=True
    )
    out = io.StringIO()
    c.run([os.path.join(DATA, "reads.fa")], kraken_fh=out)
    got = out.getvalue()
    want = open(os.path.join(DATA, "kraken_uid.out")).read()
    g, w = got.splitlines(), want.splitlines()
    assert len(g) == len(w)
    bad = [(a, b) for a, b in zip(g, w) if a != b]
    assert not bad, bad[:3]
