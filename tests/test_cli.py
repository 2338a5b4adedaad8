"""CLI smoke tests (small sizes, CPU)."""

import json
import os

import numpy as np
import pytest

from quantized_spectrum_cartography_tpu.cli import main


def test_simulate_writes_npz(tmp_path, capsys):
    out = os.path.join(str(tmp_path), "maps.npz")
    main(["simulate", "--out", out, "--batch", "2"])
    data = np.load(out)
    assert data["T"].shape == (2, 64, 51, 51)
    assert data["S"].shape == (2, 2, 51, 51)
    assert data["C"].shape == (2, 2, 64)


def test_recover_lowrank_json(tmp_path, capsys):
    out = os.path.join(str(tmp_path), "res.npz")
    main(["recover", "--solver", "lowrank", "--iters", "3", "--out", out])
    line = capsys.readouterr().out.strip().splitlines()[-1]
    res = json.loads(line)
    assert res["solver"] == "lowrank"
    assert np.isfinite(res["final_cost"])
    saved = np.load(out)
    assert saved["T_hat"].shape == (64, 51, 51)


def test_config_file_loading(tmp_path):
    from quantized_spectrum_cartography_tpu.config import load_config_file

    ini = tmp_path / "run.ini"
    ini.write_text(
        "[general]\nseed = 7\n"
        "[physics]\ngrid_size = 31\npsd_basis = s\n"
        "[solver]\nmax_iters = 100\nprojection_method = svd\n"
        "nonneg_slf = true\n"
        "[quantizer]\nboundaries = -25.0 -12.0 -9.0 -7.0 0.0\n"
        "noise_std = 5.0\n")
    cfg = load_config_file(str(ini))
    assert cfg.seed == 7
    assert cfg.physics.grid_size == 31 and cfg.physics.psd_basis == "s"
    assert cfg.solver.max_iters == 100 and cfg.solver.nonneg_slf is True
    assert cfg.quantizer.num_bins == 4

    js = tmp_path / "run.json"
    js.write_text('{"seed": 3, "solver": {"max_iters": 42}}')
    cfg2 = load_config_file(str(js))
    assert cfg2.seed == 3 and cfg2.solver.max_iters == 42

    bad = tmp_path / "bad.ini"
    bad.write_text("[solver]\nnot_a_field = 1\n")
    with pytest.raises(ValueError):
        load_config_file(str(bad))


def test_cli_recover_with_config(tmp_path, capsys):
    ini = tmp_path / "run.ini"
    ini.write_text(
        "[general]\nseed = 1\n"
        "[solver]\nmax_iters = 5\ns_inner_iters = 2\nc_inner_iters = 2\n"
        "lr_s = 0.001\nlr_c = 0.001\n")
    main(["recover", "--solver", "lowrank", "--config", str(ini)])
    line = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(line)
    assert rec["iters"] == 5


def test_cli_report(tmp_path, capsys):
    out = os.path.join(str(tmp_path), "res.npz")
    main(["recover", "--solver", "lowrank", "--iters", "3", "--out", out])
    capsys.readouterr()
    rep = os.path.join(str(tmp_path), "rep")
    main(["report", "--recovery", out, "--out-dir", rep,
          "--bands", "0", "8", "--dpi", "60"])
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(res["written"]) == 6
    for path in res["written"]:
        assert os.path.getsize(path) > 1000


def test_cli_conditions(capsys):
    main(["conditions", "--methods", "tps", "--examples", "1"])
    out = json.loads(capsys.readouterr().out)
    (label, per_method), = out.items()
    assert label.startswith("f=0.05")
    stats = per_method["tps"]
    assert 0.0 <= stats["miss_prob"] <= 1.0
    assert stats["valid"] == 1


def test_cli_conditions_unknown_method():
    import pytest
    with pytest.raises(SystemExit):
        main(["conditions", "--methods", "dowjons"])  # needs --vae-checkpoint
