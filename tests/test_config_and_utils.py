"""Config system, CLI runner, and utility tests."""

import json
import os

import numpy as np

from evcont_tpu.config import RunConfig, DMRGScheduleConfig


def test_config_roundtrip(tmp_path):
    cfg = RunConfig()
    cfg.molecule.atoms = [("H", (0.0, 0.0, 0.0)), ("H", (0.0, 0.0, 1.5))]
    cfg.molecule.basis = "sto-3g"
    cfg.md.steps = 7
    cfg.learn.data_addition = "energy"
    path = tmp_path / "cfg.json"
    cfg.to_json(str(path))
    cfg2 = RunConfig.from_json(str(path))
    assert cfg2.md.steps == 7
    assert cfg2.learn.data_addition == "energy"
    mol = cfg2.build_molecule()
    assert mol.natm == 2
    backend = cfg2.build_backend()
    assert backend.ntrain == 0


def test_dmrg_schedule_matches_reference_ladder():
    # ceil/round(1.8^6..15): 34 ... 6747 (converge_dmrg.py:15)
    dims = DMRGScheduleConfig().bond_dims()
    assert dims[0] == 34
    assert dims[-1] == 6747
    assert len(dims) == 10


def test_cli_runner(tmp_path):
    from evcont_tpu.run import main
    cfg = {
        "molecule": {"atoms": [["H", [0, 0, 0]], ["H", [0, 0, 1.5]],
                               ["H", [0, 0, 3.0]]],
                     "basis": "sto-3g", "charge": 1, "unit": "Bohr"},
        "solver": {"backend": "fci"},
        "md": {"steps": 4, "dt": 5.0},
        "learn": {"convergence_thresh": 0.005},
        "workdir": str(tmp_path / "out"),
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    main([str(cfg_path)])
    assert os.path.exists(tmp_path / "out" / "run_config.json")
    assert os.path.exists(tmp_path / "out" / "overlap.npy")
    assert os.path.exists(tmp_path / "out" / "traj_EVCont_0.npy")


def test_phase_timer():
    from evcont_tpu.utils.profiling import PhaseTimer
    t = PhaseTimer()
    with t("a"):
        pass
    with t("a"):
        pass
    with t("b"):
        pass
    d = t.as_dict()
    assert d["a"]["calls"] == 2
    assert d["b"]["calls"] == 1
    assert "a" in t.report()


def test_zmatrix_converter():
    from evcont_tpu.utils.zmatrix import zmatrix_to_cartesian
    # water-like: O, H at 1.8 bohr, H at 1.8 bohr with 104 deg angle
    xyz = zmatrix_to_cartesian([(), (0, 1.8), (0, 1.8, 1, 104.0)])
    r1 = np.linalg.norm(xyz[1] - xyz[0])
    r2 = np.linalg.norm(xyz[2] - xyz[0])
    v1, v2 = xyz[1] - xyz[0], xyz[2] - xyz[0]
    ang = np.degrees(np.arccos(v1 @ v2 / r1 / r2))
    assert abs(r1 - 1.8) < 1e-12
    assert abs(r2 - 1.8) < 1e-12
    assert abs(ang - 104.0) < 1e-9
