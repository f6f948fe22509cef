"""Codestyle gate: the custom checker must report zero findings
(reference parity: scripts/codestyle/ pre-commit runners, SURVEY.md §2.6)."""

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_codestyle_clean(capsys):
    spec = importlib.util.spec_from_file_location(
        "codestyle_check", os.path.join(REPO, "scripts", "codestyle", "check.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    rc = mod.main(["check.py"])
    out = capsys.readouterr().out
    assert rc == 0, "codestyle findings:\n" + out
