"""Vendored benchmark data == the reference's, and the repo is
self-contained without the reference checkout.

The eval protocol's data contracts (bench2drive220 routes, parked-vehicle
tables, published CSVs, xosc examples) are vendored under
gabril_carla_tpu/data/benchmark/ (VERDICT r4 item 4). These tests pin:

1. the compiled routes220.json.gz reproduces parse_routes_xml's raw-route
   schema EXACTLY (per-field equality over all 220 routes);
2. the parked npz equals a live parse of the reference's coordinate file;
3. WorldSpecs built from the vendored table are bitwise-identical to ones
   built from the reference XML;
4. every resolver returns a vendored file even when the reference root is
   absent (simulated by pointing the module at a nonexistent dir).
"""

import numpy as np
import pytest

from gabril_carla_tpu.data import vendored
from gabril_carla_tpu.env.world import (load_benchmark_specs,
                                        load_parked_tables, parse_routes,
                                        parse_routes_xml)

HAVE_REF = vendored.REF_ROUTES_XML.exists()


def test_vendored_files_exist():
    assert (vendored.BENCHMARK_DIR / "routes220.json.gz").exists()
    assert (vendored.BENCHMARK_DIR / "parked_vehicles.npz").exists()
    for n in ("Original", "Confounded", "table3", "table4"):
        assert (vendored.BENCHMARK_DIR / "published" / f"{n}.csv").exists()
    for n in vendored.XOSC_EXAMPLES:
        assert (vendored.BENCHMARK_DIR / "xosc" / n).exists()


@pytest.mark.skipif(not HAVE_REF, reason="reference checkout absent")
def test_routes_json_equals_xml_parse():
    ours = vendored.load_routes_json(vendored.BENCHMARK_DIR / "routes220.json.gz")
    ref = parse_routes_xml(str(vendored.REF_ROUTES_XML))
    assert set(ours) == set(ref) and len(ref) == 220
    for rid in ref:
        a, b = ours[rid], ref[rid]
        assert a["town"] == b["town"]
        np.testing.assert_array_equal(a["waypoints"], b["waypoints"])
        assert a["weather"] == list(map(float, b["weather"]))
        assert [list(w) for w in a["weather_keys"]] == [list(w) for w in b["weather_keys"]]
        assert len(a["scenarios"]) == len(b["scenarios"])
        for sa, sb in zip(a["scenarios"], b["scenarios"]):
            assert set(sa) == set(sb), (rid, sa, sb)
            for k in sb:
                va, vb = sa[k], sb[k]
                if isinstance(vb, tuple):
                    assert tuple(va) == vb, (rid, k)
                else:
                    assert va == vb, (rid, k)


@pytest.mark.skipif(not HAVE_REF, reason="reference checkout absent")
def test_parked_npz_equals_live_parse():
    ours = vendored.load_parked_npz(vendored.BENCHMARK_DIR / "parked_vehicles.npz")
    ref = load_parked_tables(str(vendored.REF_PARKED_PY))
    assert set(ours) == set(ref)
    for t in ref:
        np.testing.assert_array_equal(ours[t], ref[t])


@pytest.mark.skipif(not HAVE_REF, reason="reference checkout absent")
def test_world_specs_bitwise_identical():
    import jax

    ids = [3100, 24211]
    a = load_benchmark_specs(str(vendored.BENCHMARK_DIR / "routes220.json.gz"), ids)
    b = load_benchmark_specs(str(vendored.REF_ROUTES_XML), ids,
                             parked_tables_path=str(vendored.REF_PARKED_PY))
    for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_resolvers_survive_missing_reference(monkeypatch, tmp_path):
    gone = tmp_path / "nonexistent"
    monkeypatch.setattr(vendored, "REFERENCE_ROOT", gone)
    monkeypatch.setattr(vendored, "REF_ROUTES_XML", gone / "r.xml")
    monkeypatch.setattr(vendored, "REF_PARKED_PY", gone / "p.py")
    monkeypatch.setattr(vendored, "REF_PUBLISHED", gone / "pub")
    monkeypatch.setattr(vendored, "REF_XOSC", gone / "x")
    assert vendored.routes_path().exists()
    assert vendored.parked_tables_path() is not None and vendored.parked_tables_path().exists()
    assert vendored.published_csv("Original").exists()
    assert vendored.xosc_example("CyclistCrossing.xosc").exists()
    # and the full spec pipeline runs off vendored data alone
    spec = load_benchmark_specs(None, [3100])
    assert float(np.asarray(spec.route_len)[0]) > 10.0
    # parse_routes dispatches the vendored format
    routes = parse_routes(str(vendored.routes_path()), [3100])
    assert 3100 in routes
