"""CLI flag-parity audit: every flag accepted by a reference task script must
be accepted by the corresponding shim (VERDICT r2 Missing #5).

Reference flags are extracted by AST walk over each script's source (imports
would require open_clip, absent here); our accepted flags are captured by
intercepting ``parse_args`` on the shim's parser. Extra flags on our side are
allowed (TPU-native additions are additive by design, tasks/common.py docstring).
"""

import argparse
import ast
import pathlib

import pytest

REF_MODELS = pathlib.Path("/root/reference/src/models")

# reference scripts with no CLI (data modules / prompt tables)
SKIP = {"__init__.py", "prompt.py", "zero_shot_prompt.py"}


def _ref_scripts():
    if not REF_MODELS.exists():
        return []
    out = []
    for fam_dir in sorted(REF_MODELS.iterdir()):
        if not fam_dir.is_dir():
            continue
        for f in sorted(fam_dir.glob("*.py")):
            if f.name not in SKIP:
                out.append((fam_dir.name, f.stem, f))
    return out


def _ast_flags(path: pathlib.Path) -> set:
    """All '--flag' names passed to add_argument in the file."""
    tree = ast.parse(path.read_text())
    flags = set()
    for node in ast.walk(tree):
        if (isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr == "add_argument"):
            for a in node.args:
                if isinstance(a, ast.Constant) and isinstance(a.value, str) \
                        and a.value.startswith("--"):
                    flags.add(a.value.lstrip("-").replace("-", "_"))
    return flags


class _Captured(Exception):
    def __init__(self, parser):
        self.parser = parser


def _our_flags(family: str, task: str, monkeypatch) -> set:
    import importlib

    mod = importlib.import_module(f"nextgen_uia_tpu.tasks.{family}.{task}")

    def grab(self, *a, **kw):
        raise _Captured(self)

    monkeypatch.setattr(argparse.ArgumentParser, "parse_args", grab)
    try:
        mod.main([])
    except _Captured as c:
        return {s.lstrip("-").replace("-", "_")
                for act in c.parser._actions for s in act.option_strings
                if s.startswith("--")}
    raise AssertionError(f"{family}.{task} never built an ArgumentParser")


@pytest.mark.skipif(not REF_MODELS.exists(), reason="reference tree absent")
@pytest.mark.parametrize("family,task,path", [
    pytest.param(f, t, p, id=f"{f}.{t}") for f, t, p in _ref_scripts()])
def test_reference_flags_accepted(family, task, path, monkeypatch):
    ref = _ast_flags(path)
    ours = _our_flags(family, task, monkeypatch)
    missing = ref - ours - {"help"}
    assert not missing, (
        f"reference {family}/{task}.py flags not accepted by the shim: "
        f"{sorted(missing)}")


def test_finetune_resolves_ckpt_compat_flag(monkeypatch, tmp_path):
    """--ckpt <npz> must reach build_clip_model as backbone_ckpt in the
    finetune driver too (it has its own setup path that previously skipped
    apply_compat_flags — round-3 review fix)."""
    from nextgen_uia_tpu.tasks import clip_finetune as F

    captured = {}

    class _Stop(Exception):
        pass

    def fake_build(args, family, adapter=None, rng=None):
        captured["backbone_ckpt"] = args.backbone_ckpt
        raise _Stop

    monkeypatch.setattr(F, "build_clip_model", fake_build)
    monkeypatch.chdir(tmp_path)
    with pytest.raises(_Stop):
        F.finetune_main("biomedclip", [
            "--exp", "t", "--dataset", "busi", "--method", "mona",
            "--debug_tiny", "--ckpt", "weights.npz"])
    assert captured["backbone_ckpt"] == "weights.npz"
