"""The scaling hunt's trust gate: a measurement only counts as 'done'
when every embedded leg probe showed deliverable capacity — efficiency
alone can be inflated by a steal epoch that hits only the small leg."""

import importlib
import sys


def _probes_ok():
    sys.modules.pop("scripts.scaling_watch", None)
    # import the module's function without running its watch loop
    import ast
    import types

    src = open("scripts/scaling_watch.py").read()
    tree = ast.parse(src)
    fns = [n for n in tree.body if isinstance(n, ast.FunctionDef)
           and n.name == "probes_ok"]
    assert fns, "probes_ok missing from scaling_watch.py"
    mod = types.ModuleType("pw")
    exec(compile(ast.Module(body=fns, type_ignores=[]), "<pw>", "exec"),
         mod.__dict__)
    return mod.probes_ok


def test_probes_ok_requires_all_legs_quiet():
    ok = _probes_ok()
    good = {"parallel_capacity_frac": 0.9}
    bad = {"parallel_capacity_frac": 0.3}
    assert ok({"exec2_leg_probe": good, "exec8_leg_probe": good})
    # one poisoned leg invalidates the window even if the other is quiet
    assert not ok({"exec2_leg_probe": bad, "exec8_leg_probe": good})
    assert not ok({"host_probes": [good, bad, good]})
    assert ok({"host_probes": [good, good]})
    # no probes at all -> untrusted
    assert not ok({})
    assert not ok({"host_probes": []})


def test_probes_ok_prefers_cpu_frac_over_dram_capped_frac():
    """The idle-host signature at width 32 is cpu_capacity_frac ~0.9
    with parallel_capacity_frac ~0.48 (the 1 MiB probe saturates this
    box's DRAM by itself) — such a window IS quiet and must be
    trusted; and a genuinely stolen window (cpu frac low) must not be
    rescued by a coincidentally-ok 1 MiB frac."""
    ok = _probes_ok()
    idle32 = {"parallel_capacity_frac": 0.48, "cpu_capacity_frac": 0.9}
    stolen = {"parallel_capacity_frac": 0.65, "cpu_capacity_frac": 0.3}
    assert ok({"host_probes": [idle32, idle32]})
    assert not ok({"host_probes": [idle32, stolen]})
