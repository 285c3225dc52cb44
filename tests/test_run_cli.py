"""End-to-end run driver: config -> run -> output/restart -> resume."""

import json
import os

import numpy as np
import pytest

from extpom_tpu.io import zarrstore as zio
from extpom_tpu.run import main


@pytest.mark.skipif(not zio.HAVE_TS, reason="tensorstore unavailable")
def test_run_and_resume(tmp_path, capsys):
    conf = {
        "run_name": "sm",
        "case": "seamount",
        "case_args": {"im": 17, "jm": 17, "kb": 7},
        "config": {"days": 0.011, "prtd1": 0.005, "write_rst": 0.01,
                   "dtype": "float64"},
        "out_dir": str(tmp_path / "out"),
    }
    cpath = tmp_path / "conf.json"
    cpath.write_text(json.dumps(conf))
    assert main([str(cpath)]) == 0
    outs = sorted(os.listdir(tmp_path / "out"))
    assert any(o.startswith("sm.rst.") for o in outs)
    assert any(o.startswith("sm.0") for o in outs)
    text = capsys.readouterr().out
    assert "CFL advisory" in text and "saver" in text
    # the CLI drives whole print/restart intervals through the scanned
    # segment fast path (one dispatch per interval, pom.f:16-22 analogue)
    assert "scanned segments" in text

    # resume from the restart and extend the run
    rst = next(o for o in outs if o.startswith("sm.rst."))
    conf["nread_rst"] = 1
    conf["read_rst_path"] = str(tmp_path / "out" / rst)
    conf["config"]["days"] = 0.02
    cpath.write_text(json.dumps(conf))
    assert main([str(cpath)]) == 0

    # grid dataset round-trip through the file-driven path
    from extpom_tpu.cases.seamount import seamount_case
    cfg, grid, ics = seamount_case(im=17, jm=17, kb=7, dtype="float64")
    zio.write_grid(str(tmp_path / "grid"), grid)
    zio.write_initial_ts(str(tmp_path / "init"), ics["tb"], ics["sb"],
                         ics["tclim"], ics["sclim"])
    conf2 = {
        "run_name": "ds",
        "grid": str(tmp_path / "grid"),
        "init": str(tmp_path / "init"),
        "config": {"im": 17, "jm": 17, "kb": 7, "days": 0.005,
                   "dtype": "float64"},
        "out_dir": str(tmp_path / "out2"),
    }
    cpath.write_text(json.dumps(conf2))
    assert main([str(cpath)]) == 0
