"""CLI smoke tests (small sizes, CPU)."""

import json
import os

import numpy as np

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
