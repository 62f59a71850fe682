"""The committed scaling artifact (SCALING_r03.json, tools/scaling_bench.py)
must parse and meet the BASELINE.md bar: >= 90% efficiency going 1 -> 2
devices on the cylinder rotational-flow diagram (fixed-total-work
sharding-overhead definition; see the scaling_bench module docstring)."""
import json
import os

import pytest

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "SCALING_r03.json")


@pytest.fixture(scope="module")
def artifact():
    if not os.path.exists(ART):
        pytest.skip("SCALING_r03.json not committed yet")
    return json.load(open(ART))


def test_artifact_schema(artifact):
    assert artifact["case"] == "cylinder_twisted_photospheric"
    assert {"devices", "wall_s", "sharding_efficiency"} <= set(
        artifact["results"][0])
    ns = [r["devices"] for r in artifact["results"]]
    assert ns == sorted(ns) and ns[0] == 1


def test_efficiency_1_to_2(artifact):
    two = [r for r in artifact["results"] if r["devices"] == 2]
    assert two, "no 2-device row"
    assert two[0]["sharding_efficiency"] >= 0.9


def test_rows_balanced(artifact):
    for r in artifact["results"]:
        mx, mn = r["rows_per_device_max_min"]
        assert mx - mn <= 1, f"imbalanced shards at n={r['devices']}"
