"""Lumerical .lsf -> Python converter: the emitted script must build a
valid Simulation for the common command subset (the reference CLI's
convert is deprecated and defers to an external tool; ours works —
reference: tidy3d web/cli/app.py:120-129)."""

import numpy as np
import pytest

import tidy3d_tpu as td
from tidy3d_tpu.web.lsf_converter import convert_lsf_to_python, parse_lsf

LSF = """
# silicon waveguide with a dipole excitation
newproject;
addfdtd;
set("x", 0); set("y", 0); set("z", 0);
set("x span", 4e-6); set("y span", 3e-6); set("z span", 2e-6);
set("simulation time", 2e-13);

addrect;
set("name", "wg");
set("x", 0); set("x span", 4e-6);
set("y", 0); set("y span", 0.5e-6);
set("z", 0); set("z span", 0.22e-6);
set("index", 3.47);

addsphere;
set("name", "ball");
set("x", 1e-6); set("y", 0.8e-6); set("z", 0);
set("radius", 0.3e-6);
set("index", 1.5);

adddipole;
set("x", -1e-6); set("y", 0); set("z", 0);
set("wavelength start", 1.5e-6);
set("wavelength stop", 1.6e-6);

addpower;
set("name", "T");
set("x", 1.5e-6);
set("x span", 0); set("y span", 2e-6); set("z span", 1e-6);

save("project.fsp");
"""


def test_parse_objects_and_props():
    objs = parse_lsf(LSF)
    kinds = [o.kind for o in objs]
    assert kinds == ["addfdtd", "addrect", "addsphere", "adddipole",
                     "addpower"]
    wg = objs[1]
    assert wg.name == "wg"
    assert wg.props["index"] == pytest.approx(3.47)
    assert wg.props["y span"] == pytest.approx(0.5e-6)


def test_emitted_script_builds_simulation(tmp_path, monkeypatch):
    script = convert_lsf_to_python(LSF)
    # don't actually run the solver when exec-ing the emitted script
    import tidy3d_tpu.web as web

    captured = {}

    def fake_run(sim, task_name="x", **kwargs):
        captured["sim"] = sim
        return None

    monkeypatch.setattr(web, "run", fake_run)
    exec(compile(script, "converted.py", "exec"), {})  # noqa: S102
    sim = captured["sim"]
    assert isinstance(sim, td.Simulation)
    assert sim.size == pytest.approx((4.0, 3.0, 2.0))
    assert sim.run_time == pytest.approx(2e-13)
    assert len(sim.structures) == 2
    assert sim.structures[0].medium.permittivity == pytest.approx(
        3.47**2, rel=1e-6)
    assert isinstance(sim.structures[1].geometry, td.Sphere)
    assert len(sim.sources) == 1
    lam0 = 299792458.0 / sim.sources[0].source_time.freq0
    assert lam0 == pytest.approx(1.548e-6, rel=0.02)
    assert len(sim.monitors) == 1
    assert sim.monitors[0].name == "T"


def test_cli_convert_writes_file(tmp_path):
    from tidy3d_tpu.web.cli import main

    lsf_path = str(tmp_path / "a.lsf")
    out_path = str(tmp_path / "a.py")
    with open(lsf_path, "w") as f:
        f.write(LSF)
    rc = main(["convert", lsf_path, out_path])
    assert rc == 0
    text = open(out_path).read()
    assert "td.Simulation(" in text


def test_unknown_commands_warn_not_raise():
    objs = parse_lsf("addweirdthing;\nset(\"x\", 1e-6);\naddrect;")
    assert [o.kind for o in objs] == ["addrect"]


def test_setnamed_and_select():
    text = (
        'addrect; set("name", "a"); set("index", 2.0);\n'
        'addrect; set("name", "b"); set("index", 3.0);\n'
        'select("a"); set("index", 2.5);\n'
        'setnamed("b", "x span", 1e-6);\n'
    )
    objs = parse_lsf(text)
    assert objs[0].props["index"] == pytest.approx(2.5)
    assert objs[1].props["x span"] == pytest.approx(1e-6)
