"""End-to-end builder download->extract->parse->save chains, offline.

Round-3 VERDICT: the six builders' download paths had never been exercised
(no egress). These tests stand up a LOCAL http.server serving minimal
fixture archives with the exact layouts the real sources use (figshare
tar.gz / zips, zenodo zips — reference ``qm9.py:82-107``,
``pt_graphene.py:24``, ``mp2018.py:22``), point the builder URLs at it, and
run every ``process_*`` end to end, asserting the saved ``.npy`` records.

The ptgp chain additionally pins the FALLBACK behavior for the
pt_graphene.zip-vs-fullerene.zip naming divergence (the reference's ptgp
builder downloads ``fullerene.zip``): the server 404s the first candidate
and the builder must fall through to the next.
"""

import io
import json
import os
import tarfile
import threading
import zipfile
from http.server import SimpleHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import pytest

from scann_tpu.data.builders import mp2018, qm9, qm9_std_jctc, trajectories
from scann_tpu.data.builders.common import HARTREE_TO_EV

from test_builders import CIF_P1

# --- fixture payloads --------------------------------------------------------

QM9_XYZ = (
    "3\n"
    "gdb {i}\t1\t2\t3\t4\t5\t{homo}\t0.1\t0.3\t30\t0.02\t-40\t-40\t-40\t-40\t6\n"
    "O\t0.0\t0.0\t0.0\t-0.5\n"
    "H\t0.96\t0.0\t0.0\t0.25\n"
    "H\t-0.24\t0.93\t0.0\t0.25\n"
)

# uncharacterized list format: 9 header lines, data rows, 1 trailer line
# (the parser reads lines[9:-1] and takes the first int per row,
# reference qm9.py:57-74)
UNCHARACTERIZED = "".join(f"header {i}\n" for i in range(9)) + \
    "3   some   reason\n" + "trailer\n"

TRAJ_XYZ_PTGP = (
    "2\n-200.5 -199.0\nPt 0 0 0\nPt 1.4 0 0\n"
    "2\n-200.7 -199.0\nPt 0 0 0\nPt 1.5 0 0\n"
)
TRAJ_XYZ_FULLERENE = (
    "2\n-5.5 -3.2 -100.0\nC 0 0 0\nC 1.4 0 0\n"
)
TRAJ_XYZ_SMFE = (
    '2\nLattice="8.5 0 0 0 8.5 0 0 0 4.8" Properties=species:S:1:pos:R:3 '
    'energy="-1.234"\nFe 0 0 0\nSm 4.2 4.2 2.4\n'
)


def _zip_bytes(members: dict) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        for name, text in members.items():
            z.writestr(name, text)
    return buf.getvalue()


def _targz_bytes(members: dict) -> bytes:
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:gz") as tar:
        for name, text in members.items():
            data = text.encode()
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))
    return buf.getvalue()


@pytest.fixture(scope="module")
def fixture_server(tmp_path_factory):
    """Local HTTP server over a directory of fixture archives; yields
    (base_url, docroot)."""
    root = tmp_path_factory.mktemp("archives")

    # QM9: tar.gz of 4 xyz files, 1 of which is uncharacterized (id 3)
    files = {f"dsgdb9nsd_{i:06d}.xyz": QM9_XYZ.format(i=i, homo=-0.26 - 0.01 * i)
             for i in range(1, 5)}
    (root / "gdb9.tar.gz").write_bytes(_targz_bytes(files))
    (root / "uncharacterized.txt").write_text(UNCHARACTERIZED)

    # QM9-std-JCTC: zip with qm9_std_jctc.json
    std_entries = [{
        "id": f"mol-{i}",
        "atoms": {"elements": ["O", "H", "H"],
                  "coords": [[0.5, 0.5, 0.5], [0.55, 0.5, 0.5],
                             [0.49, 0.55, 0.5]],
                  "lattice_mat": [[20.0, 0, 0], [0, 20.0, 0], [0, 0, 20.0]]},
        "mu": 1.8, "alpha": 1.5, "HOMO": -7.2 - i, "LUMO": 0.5, "gap": 7.7,
        "R2": 20.0, "ZPVE": 0.5, "U0": -2000.0, "U": -2000.0,
        "H": -2000.0, "Cv": 6.0, "G": -2000.0, "omega1": 3500.0,
    } for i in range(3)]
    (root / "qm9_std.zip").write_bytes(
        _zip_bytes({"qm9_std_jctc.json": json.dumps(std_entries)}))

    # MP2018: zip with mp.2018.6.1.json of CIF entries (one 1-atom cell
    # that must be skipped, reference mp2018.py:40)
    cif_1atom = (
        "data_x\n_cell_length_a 4.0\n_cell_length_b 4.0\n_cell_length_c 4.0\n"
        "_cell_angle_alpha 90\n_cell_angle_beta 90\n_cell_angle_gamma 90\n"
        "loop_\n _atom_site_type_symbol\n _atom_site_fract_x\n"
        " _atom_site_fract_y\n _atom_site_fract_z\n Fe 0.0 0.0 0.0\n")
    mp_entries = [
        {"structure": CIF_P1, "material_id": "mp-22862",
         "formation_energy_per_atom": -2.127, "band_gap": 4.7},
        {"structure": cif_1atom, "material_id": "mp-unary",
         "formation_energy_per_atom": 0.0, "band_gap": 0.0},
        {"structure": CIF_P1, "material_id": "mp-2",
         "formation_energy_per_atom": -1.5, "band_gap": 2.0},
    ]
    (root / "mp.zip").write_bytes(
        _zip_bytes({"mp.2018.6.1.json": json.dumps(mp_entries)}))

    # trajectory zips: one dir level for fullerene/ptgp ("*/*.xyz"),
    # two for smfe ("*/*/*.xyz")
    (root / "fullerene.zip").write_bytes(
        _zip_bytes({"fullerene/traj.xyz": TRAJ_XYZ_FULLERENE}))
    (root / "ptgp_alt.zip").write_bytes(
        _zip_bytes({"ptgp/pt.xyz": TRAJ_XYZ_PTGP}))
    (root / "smfe12.zip").write_bytes(
        _zip_bytes({"smfe/sub/frames.xyz": TRAJ_XYZ_SMFE}))
    # deliberately NO pt_graphene.zip: the ptgp chain must 404 its first
    # candidate and fall back to fullerene.zip

    class Handler(SimpleHTTPRequestHandler):
        def __init__(self, *a, **kw):
            super().__init__(*a, directory=str(root), **kw)

        def log_message(self, *a):  # keep test output clean
            pass

    server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{server.server_port}", root
    finally:
        server.shutdown()


def _load(path):
    return list(np.load(path, allow_pickle=True))


def test_qm9_chain(fixture_server, tmp_path, monkeypatch):
    base, _ = fixture_server
    monkeypatch.setattr(qm9, "GDB9_URL", f"{base}/gdb9.tar.gz")
    monkeypatch.setattr(qm9, "UNCHARACTERIZED_URL", f"{base}/uncharacterized.txt")
    monkeypatch.setattr(qm9, "EXPECTED_COUNT", 3)  # 4 files - 1 uncharacterized
    out = qm9.process_qm9(str(tmp_path))
    recs = _load(out)
    assert len(recs) == 3
    # id 3 (0-based idx 2) was uncharacterized -> dropped
    assert sorted(r["id"] for r in recs) == [0, 1, 3]
    assert all(r["Atoms"] == ["O", "H", "H"] for r in recs)
    by_id = {r["id"]: r for r in recs}
    assert by_id[0]["Properties"]["homo"] == pytest.approx(-0.27 * HARTREE_TO_EV)
    assert "Features" in recs[0]


def test_qm9_std_chain(fixture_server, tmp_path, monkeypatch):
    base, _ = fixture_server
    monkeypatch.setattr(qm9_std_jctc, "QM9_STD_URL", f"{base}/qm9_std.zip")
    recs = _load(qm9_std_jctc.process_qm9_std_jctc(str(tmp_path)))
    assert len(recs) == 3
    assert recs[0]["Properties"]["homo"] == -7.2
    np.testing.assert_allclose(recs[0]["Coords"][0], [10.0, 10.0, 10.0])


def test_mp2018_chain(fixture_server, tmp_path, monkeypatch):
    base, _ = fixture_server
    monkeypatch.setattr(mp2018, "MP2018_URL", f"{base}/mp.zip")
    recs = _load(mp2018.process_mp2018(str(tmp_path)))
    assert len(recs) == 2  # the 1-atom cell is skipped
    assert {r["id"] for r in recs} == {"mp-22862", "mp-2"}
    assert all(r["Cartesian"] is False and len(r["Atoms"]) == 8 for r in recs)


def test_fullerene_chain(fixture_server, tmp_path, monkeypatch):
    base, _ = fixture_server
    monkeypatch.setattr(trajectories, "FULLERENE_URL", f"{base}/fullerene.zip")
    recs = _load(trajectories.process_fullerene(str(tmp_path)))
    assert len(recs) == 1
    assert recs[0]["Atoms"] == ["C", "C"]
    assert recs[0]["Properties"] == {"homo": -5.5, "lumo": -3.2,
                                     "total_energy": -100.0}
    assert "Features" in recs[0]


def test_ptgp_chain_direct(fixture_server, tmp_path, monkeypatch):
    """The happy path: the dataset-named zip exists and is used first."""
    base, _ = fixture_server
    monkeypatch.setattr(trajectories, "PTGP_URLS", [f"{base}/ptgp_alt.zip",
                                                    f"{base}/fullerene.zip"])
    recs = _load(trajectories.process_ptgp(str(tmp_path)))
    assert len(recs) == 2  # two frames in the multi-frame file
    assert recs[0]["Atoms"] == ["Pt", "Pt"]
    assert recs[0]["Properties"]["Ref_energy"] == -199.0


def test_ptgp_chain_falls_back_and_accepts_ptgp_content(
        fixture_server, tmp_path, monkeypatch):
    """pt_graphene.zip 404s -> the builder falls back to fullerene.zip
    (the URL the reference's ptgp builder actually uses,
    pt_graphene.py:24). When that archive actually contains
    Pt/graphene-format frames (2-token comments, Pt species), the
    fallback succeeds."""
    base, root = fixture_server
    (root / "fullerene_ptgp_content.zip").write_bytes(
        _zip_bytes({"ptgp/pt.xyz": TRAJ_XYZ_PTGP}))
    monkeypatch.setattr(trajectories, "PTGP_URLS",
                        [f"{base}/pt_graphene.zip",          # 404s
                         f"{base}/fullerene_ptgp_content.zip"])
    recs = _load(trajectories.process_ptgp(str(tmp_path)))
    assert len(recs) == 2
    assert recs[0]["Properties"]["Ref_energy"] == -199.0


def test_ptgp_chain_rejects_fullerene_content(fixture_server, tmp_path,
                                              monkeypatch):
    """If the fallback archive contains fullerene-format frames (3-token
    comments: homo lumo total_energy), the builder must raise loudly —
    a silent 2-token prefix read would record homo as total_energy and
    lumo as Ref_energy, fabricating wrong training targets (round-4
    advisor finding)."""
    base, _ = fixture_server
    monkeypatch.setattr(trajectories, "PTGP_URLS",
                        [f"{base}/pt_graphene.zip",   # 404s
                         f"{base}/fullerene.zip"])    # fullerene content
    with pytest.raises(ValueError, match="expected exactly 2 comment tokens"):
        trajectories.process_ptgp(str(tmp_path))


def test_ptgp_record_rejects_3_token_comment():
    with pytest.raises(ValueError, match="exactly 2 comment tokens"):
        trajectories.ptgp_record(
            0, "-5.5 -3.2 -100.0", ["C"], np.zeros((1, 3), np.float32))


def test_ptgp_validate_requires_pt():
    """An archive of 2-token frames with no Pt anywhere is still not the
    Pt/graphene dataset — the archive-level check rejects it."""
    rec = trajectories.ptgp_record(
        0, "-5.5 -3.2", ["C", "C"],
        np.zeros((2, 3), np.float32))
    with pytest.raises(RuntimeError, match="none contain Pt"):
        trajectories._validate_ptgp_records([rec])
    # and passes when Pt is present
    ok = trajectories.ptgp_record(
        1, "-200.5 -199.0", ["Pt"], np.zeros((1, 3), np.float32))
    trajectories._validate_ptgp_records([rec, ok])


def test_ptgp_chain_all_urls_fail(fixture_server, tmp_path, monkeypatch):
    base, _ = fixture_server
    monkeypatch.setattr(trajectories, "PTGP_URLS",
                        [f"{base}/missing1.zip", f"{base}/missing2.zip"])
    with pytest.raises(RuntimeError, match="all 2 candidate URLs"):
        trajectories.process_ptgp(str(tmp_path))


def test_smfe_chain(fixture_server, tmp_path, monkeypatch):
    base, _ = fixture_server
    monkeypatch.setattr(trajectories, "SMFE_URL", f"{base}/smfe12.zip")
    recs = _load(trajectories.process_smfe(str(tmp_path)))
    assert len(recs) == 1
    assert recs[0]["Lattice"].shape == (3, 3)
    assert recs[0]["Properties"]["e_f"] == pytest.approx(-1.234)
    assert "Cartesian" not in recs[0]


def test_fullerene_record_rejects_short_comment():
    """A 2-value (ptgp-format) comment cannot silently parse with the
    3-value fullerene schema — it must raise, not fabricate a target."""
    with pytest.raises((IndexError, ValueError)):
        trajectories.fullerene_record(
            0, "-200.5 -199.0", ["Pt"], np.zeros((1, 3), np.float32))
