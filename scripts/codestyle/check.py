"""Minimal codestyle gate (stands in for the reference's scripts/codestyle/
pre-commit runners — clang-format/cpplint there, AST checks here; no external
lint tools are available in this image).

Checks, per Python file:
  - syntax (compile())
  - unused imports (AST; __init__.py re-exports and __future__ exempt)
  - tabs in indentation, trailing whitespace, CRLF line endings
  - file ends with exactly one newline

Usage: python scripts/codestyle/check.py [paths...]   (default: repo dirs)
Exit code 1 if any finding; tests/test_codestyle.py keeps the suite green.
"""

from __future__ import annotations

import ast
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
DEFAULT_DIRS = ["cuda_pt_tpu", "scripts", "tests", "bench.py", "__graft_entry__.py"]


def _iter_py(paths):
    for p in paths:
        full = os.path.join(REPO, p)
        if os.path.isfile(full) and full.endswith(".py"):
            yield full
        elif os.path.isdir(full):
            for root, _dirs, files in os.walk(full):
                for f in sorted(files):
                    if f.endswith(".py"):
                        yield os.path.join(root, f)


class _ImportUse(ast.NodeVisitor):
    def __init__(self):
        self.imports: dict[str, int] = {}  # bound name -> lineno
        self.used: set[str] = set()

    def visit_Import(self, node):
        for a in node.names:
            name = a.asname or a.name.split(".")[0]
            self.imports[name] = node.lineno

    def visit_ImportFrom(self, node):
        if node.module == "__future__":
            return
        for a in node.names:
            if a.name == "*":
                continue
            self.imports[a.asname or a.name] = node.lineno

    def visit_Name(self, node):
        self.used.add(node.id)

    def visit_Attribute(self, node):
        self.generic_visit(node)


def check_file(path: str) -> list[str]:
    rel = os.path.relpath(path, REPO)
    out = []
    with open(path, "rb") as f:
        raw = f.read()
    if b"\r\n" in raw:
        out.append(f"{rel}: CRLF line endings")
    text = raw.decode("utf-8", errors="replace")
    lines = text.split("\n")
    for i, ln in enumerate(lines, 1):
        if ln != ln.rstrip():
            out.append(f"{rel}:{i}: trailing whitespace")
        stripped = ln[: len(ln) - len(ln.lstrip())]
        if "\t" in stripped:
            out.append(f"{rel}:{i}: tab in indentation")
    if text and not text.endswith("\n"):
        out.append(f"{rel}: missing final newline")
    if text.endswith("\n\n\n"):
        out.append(f"{rel}: multiple trailing blank lines")

    try:
        tree = ast.parse(text, filename=rel)
    except SyntaxError as e:
        out.append(f"{rel}:{e.lineno}: syntax error: {e.msg}")
        return out

    if not os.path.basename(path) == "__init__.py":
        v = _ImportUse()
        v.visit(tree)
        # names referenced anywhere (incl. strings in __all__ / docstring
        # doctests are NOT counted — keep imports real)
        for name, lineno in sorted(v.imports.items(), key=lambda kv: kv[1]):
            if name not in v.used and not name.startswith("_"):
                out.append(f"{rel}:{lineno}: unused import '{name}'")
    return out


def main(argv):
    paths = argv[1:] or DEFAULT_DIRS
    findings = []
    n = 0
    for f in _iter_py(paths):
        n += 1
        findings += check_file(f)
    for msg in findings:
        print(msg)
    print(f"[codestyle] {n} files, {len(findings)} findings")
    return 1 if findings else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
