"""Rhino T-spline extraction-format hardening (round-3 VERDICT item #7).

Every T-spline file the repo ever parsed was self-written by
write_rhino_extraction; the reference consumed genuine Rhino plugin
exports (demos/kl-shell-svk/dynamic-tspline.py:41-48) whose header /
offset / whitespace conventions differ from a pretty-printer's output.
These tests pin the documented accepted grammar of _parse_tspline_file
(see its docstring) against format VARIANTS of the same data -- CRLF
endings, blank and padded lines, both reference-documented control-point
offsets, tag-token spelling, element reordering, rational weights, mixed
per-element valence -- and fuzz truncations/corruptions, which must all
raise ValueError naming a source line (never IndexError or silent
misparses)."""

import numpy as np
import pytest

from tigar_tpu.models.tsplines import (_parse_tspline_file,
                                       write_rhino_extraction)


def _random_extraction(rng, ncp=11, nel=4):
    """Random ragged extraction data (valid but meaningless geometry)."""
    bnet = np.ones((ncp, 4))
    bnet[:, :3] = rng.normal(size=(ncp, 3))
    bnet[:, 3] = 0.5 + rng.random(ncp)          # genuinely rational
    bnet[:, :3] *= bnet[:, 3:]                  # homogeneous
    nodes_list, ops_list = [], []
    for _ in range(nel):
        nshl = int(rng.integers(3, min(9, ncp + 1)))   # mixed valence
        nodes = rng.choice(ncp, size=nshl, replace=False).astype(np.int64)
        ops_list.append(rng.normal(size=(nshl, 16)))
        nodes_list.append(nodes)
    return bnet, nodes_list, ops_list


def _assert_same(parsed, bnet, nodes_list, ops_list, perm=None):
    b2, n2, o2 = parsed
    order = perm if perm is not None else range(len(nodes_list))
    assert np.allclose(b2, bnet, rtol=1e-15, atol=1e-15)
    assert len(n2) == len(nodes_list)
    for k, e in enumerate(order):
        assert np.array_equal(n2[k], nodes_list[e])
        assert np.allclose(o2[k], ops_list[e], rtol=1e-15, atol=1e-15)


def test_roundtrip_exact(tmp_path):
    rng = np.random.default_rng(0)
    bnet, nodes_list, ops_list = _random_extraction(rng)
    f = str(tmp_path / "base.iga")
    write_rhino_extraction(f, bnet, nodes_list, ops_list)
    _assert_same(_parse_tspline_file(f), bnet, nodes_list, ops_list)


def test_format_variants(tmp_path):
    """CRLF, blank lines, padded whitespace, alternative tag spellings,
    trailing junk section, and the manually-modified extra header line
    all parse to identical data."""
    rng = np.random.default_rng(1)
    bnet, nodes_list, ops_list = _random_extraction(rng)
    base = str(tmp_path / "base.iga")
    write_rhino_extraction(base, bnet, nodes_list, ops_list)
    with open(base) as fh:
        text = fh.read()

    variants = {}
    variants["crlf"] = text.replace("\n", "\r\n")
    variants["blank_lines"] = text.replace("\n", "\n\n")
    variants["padded"] = "\n".join("   " + ln + "  \t"
                                   for ln in text.split("\n"))
    # genuine-export-style tags differ from the writer's: retag every
    # tagged line (header counts, control points, element headers)
    lines = text.rstrip("\n").split("\n")
    lines[0] = "T-spline surface extraction v2.4 (Rhino plugin)"
    lines[1] = "node_count " + lines[1].split()[1] + " # nodes"
    lines[2] = "elem_count " + lines[2].split()[1]
    for i in range(len(bnet)):
        lines[3 + i] = "vertex " + " ".join(lines[3 + i].split()[1:])
    variants["retagged"] = "\n".join(lines) + "\n"
    # manually-modified format: one extra header line before the points
    # (the reference's commented-out lineCounter = 4 + ncp variant)
    mm = lines[:3] + ["# control points x y z w"] + lines[3:]
    variants["manually_modified"] = "\n".join(mm) + "\n"
    # trailing BC-info section (reference: "TODO: read in BC info")
    variants["trailing_junk"] = text + "bc_info 3\n0 1 2\n"

    for name, body in variants.items():
        f = str(tmp_path / (name + ".iga"))
        with open(f, "w") as fh:
            fh.write(body)
        _assert_same(_parse_tspline_file(f), bnet, nodes_list, ops_list)


def test_element_reordering(tmp_path):
    """Element blocks are independent records: permuting them permutes
    the parsed element order and changes nothing else."""
    rng = np.random.default_rng(2)
    bnet, nodes_list, ops_list = _random_extraction(rng, nel=5)
    perm = rng.permutation(5)
    f = str(tmp_path / "perm.iga")
    write_rhino_extraction(f, bnet, [nodes_list[e] for e in perm],
                           [ops_list[e] for e in perm])
    _assert_same(_parse_tspline_file(f), bnet, nodes_list, ops_list,
                 perm=perm)


def test_weights_not_premultiplied(tmp_path):
    """File stores (x, y, z, w) with PLAIN coordinates; the parser
    returns homogenized (w*x, w) -- the reference's convention
    (RhinoTSplines.py:274-277)."""
    bnet = np.asarray([[2.0, 6.0, -4.0, 2.0],   # homogeneous, w=2
                       [0.5, 0.25, 0.75, 0.5]])  # w=0.5
    nodes = [np.asarray([0, 1], dtype=np.int64)]
    ops = [np.ones((2, 16))]
    f = str(tmp_path / "w.iga")
    write_rhino_extraction(f, bnet, nodes, ops)
    with open(f) as fh:
        cp_line = fh.read().split("\n")[3].split()
    # on disk: x=1 3 -2 w=2 (dehomogenized)
    assert np.allclose([float(s) for s in cp_line[1:5]],
                       [1.0, 3.0, -2.0, 2.0])
    b2, _, _ = _parse_tspline_file(f)
    assert np.allclose(b2, bnet)


@pytest.mark.parametrize("mutate, match", [
    (lambda L: L[:2], "fewer than 3"),
    (lambda L: [L[0], "nodeN x"] + L[2:], "not an integer"),
    (lambda L: [L[0], "nodeN 0"] + L[2:], "must be positive"),
    (lambda L: L[:3], "control point 0"),
    (lambda L: L[:8], None),                      # truncated mid-points
    (lambda L: L[:-1], None),                     # truncated mid-element
    (lambda L: [ln.replace("e ", "e 99 ", 1) if ln.startswith("e ")
                else ln for ln in L], None),      # wrong nshl
])
def test_malformed_raises_valueerror(tmp_path, mutate, match):
    rng = np.random.default_rng(3)
    bnet, nodes_list, ops_list = _random_extraction(rng, ncp=7, nel=2)
    base = str(tmp_path / "ok.iga")
    write_rhino_extraction(base, bnet, nodes_list, ops_list)
    with open(base) as fh:
        lines = fh.read().rstrip("\n").split("\n")
    f = str(tmp_path / "bad.iga")
    with open(f, "w") as fh:
        fh.write("\n".join(mutate(lines)) + "\n")
    with pytest.raises(ValueError, match=match):
        _parse_tspline_file(f)


def test_out_of_range_and_nonnumeric(tmp_path):
    rng = np.random.default_rng(4)
    bnet, nodes_list, ops_list = _random_extraction(rng, ncp=7, nel=2)
    base = str(tmp_path / "ok.iga")
    write_rhino_extraction(base, bnet, nodes_list, ops_list)
    with open(base) as fh:
        lines = fh.read().rstrip("\n").split("\n")

    # node index beyond ncp
    bad = list(lines)
    i = next(k for k, ln in enumerate(bad) if ln.startswith("e "))
    bad[i + 1] = bad[i + 1].rsplit(" ", 1)[0] + " 99"
    f = str(tmp_path / "oor.iga")
    with open(f, "w") as fh:
        fh.write("\n".join(bad) + "\n")
    with pytest.raises(ValueError, match="out of range"):
        _parse_tspline_file(f)

    # non-numeric extraction coefficient
    bad = list(lines)
    bad[i + 2] = bad[i + 2].replace(bad[i + 2].split()[0], "NaNopé", 1)
    f = str(tmp_path / "nonnum.iga")
    with open(f, "w") as fh:
        fh.write("\n".join(bad) + "\n")
    with pytest.raises(ValueError, match="non-numeric"):
        _parse_tspline_file(f)

    # zero rational weight
    bad = list(lines)
    toks = bad[3].split()
    toks[4] = "0.0"
    bad[3] = " ".join(toks)
    f = str(tmp_path / "w0.iga")
    with open(f, "w") as fh:
        fh.write("\n".join(bad) + "\n")
    with pytest.raises(ValueError, match="weight"):
        _parse_tspline_file(f)


def test_fuzz_truncations_never_crash(tmp_path):
    """Any prefix truncation raises ValueError (with the source line) or
    parses -- never IndexError/TypeError, never a silent partial result
    with the wrong element count."""
    rng = np.random.default_rng(5)
    bnet, nodes_list, ops_list = _random_extraction(rng, ncp=9, nel=3)
    base = str(tmp_path / "ok.iga")
    write_rhino_extraction(base, bnet, nodes_list, ops_list)
    with open(base) as fh:
        lines = fh.read().rstrip("\n").split("\n")
    for cut in range(len(lines)):
        f = str(tmp_path / f"cut{cut}.iga")
        with open(f, "w") as fh:
            fh.write("\n".join(lines[:cut]) + "\n")
        try:
            b2, n2, o2 = _parse_tspline_file(f)
        except ValueError:
            continue
        assert len(n2) == len(nodes_list)   # parsed => complete
