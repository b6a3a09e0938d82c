"""Reference public-name coverage sweep.

Every public top-level function/class in the reference's ``magmap/``
tree must have a counterpart somewhere in this tree (full TPU-first
implementation or documented facade). Skips when the reference checkout
is absent.
"""

import ast
import pathlib

import pytest

REF_ROOT = pathlib.Path("/root/reference/magmap")
OUR_ROOT = pathlib.Path(__file__).resolve().parent.parent / \
    "magellanmapper_tpu"


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

    ours = set()
    srcs = []
    for p in OUR_ROOT.rglob("*.py"):
        src = p.read_text()
        srcs.append(src)
        try:
            tree = ast.parse(src)
        except SyntaxError:
            continue
        for n in tree.body:
            if isinstance(n, (ast.FunctionDef, ast.ClassDef)):
                ours.add(n.name)
            elif isinstance(n, ast.Assign):
                for t in n.targets:
                    if isinstance(t, ast.Name):
                        ours.add(t.id)
    src_all = "\n".join(srcs)

    missing = []
    for mod, names in sorted(ref_names.items()):
        for name in sorted(names):
            if (name in ours or f"def {name}" in src_all
                    or f"class {name}" in src_all
                    or f"{name} =" in src_all or f"{name}=" in src_all):
                continue
            missing.append(f"{mod}.{name}")
    assert not missing, missing
