"""Schema-migration chain: a genuinely old (v1.3-era) serialized
simulation loads through the Updater into the current schema
(reference behavior: updater.py:207-345 chain + the load-time
warn-and-update at base_sim/simulation.py:107)."""

import json
import os

import tidy3d_tpu as td
from tidy3d_tpu.updater import Updater
from tidy3d_tpu.version import SCHEMA_VERSION

SAMPLE = os.path.join(os.path.dirname(__file__), "..", "sims",
                      "simulation_v1_3.json")


def test_updater_chain_dict():
    up = Updater.from_file(SAMPLE)
    new_dict = up.update_to_current()
    assert new_dict["version"] == SCHEMA_VERSION
    # pml_layers -> boundary_spec
    assert "pml_layers" not in new_dict
    assert new_dict["boundary_spec"]["x"]["plus"]["type"] == "PML"
    # grid_size dropped
    assert "grid_size" not in new_dict
    # PolySlab derived fields dropped
    geo = new_dict["structures"][0]["geometry"]
    assert "length" not in geo and "center" not in geo
    # ModeFieldMonitor renamed
    assert new_dict["monitors"][0]["type"] == "ModeSolverMonitor"
    assert "sort_by" not in new_dict["monitors"][0]["mode_spec"]


def test_old_file_loads_as_simulation():
    with open(SAMPLE, encoding="utf-8") as f:
        old = json.load(f)
    sim = td.Simulation.parse_obj(old) if hasattr(td.Simulation, "parse_obj") \
        else td.Simulation(**Updater(sim_dict=old).update_to_current())
    assert isinstance(sim, td.Simulation)
    assert sim.monitors[0].type == "ModeSolverMonitor"
