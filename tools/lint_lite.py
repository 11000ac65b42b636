#!/usr/bin/env python
"""Dependency-free lint gate (this image ships no ruff/pyflakes).

Covers the highest-signal subset of the ruff rules CI runs
(`.github/workflows/ci.yml` — the reference repo lints with ruff+black,
`/root/reference/.github/workflows/pylint.yml:24-27`):

- E9 syntax / indentation errors (ast.parse)
- F401 unused module-level imports (``__init__.py`` exempt, re-export files)
- F811 duplicate top-level definitions
- F632 `is` comparison with str/int/tuple literals

Honors ``# noqa`` (bare or with codes) on the offending line.

Usage: python tools/lint_lite.py [paths...]   (default: repo tree)
Exit 1 on any finding.
"""

from __future__ import annotations

import ast
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
DEFAULT_PATHS = [REPO / "avatar_tpu", REPO / "tests", REPO / "tools",
                 REPO / "bench.py", REPO / "__graft_entry__.py"]


def _noqa_lines(src: str) -> dict[int, set[str] | None]:
    """line -> None (bare noqa, silence all) or set of codes."""
    out: dict[int, set[str] | None] = {}
    for i, line in enumerate(src.splitlines(), 1):
        if "# noqa" not in line:
            continue
        tail = line.split("# noqa", 1)[1].strip()
        if tail.startswith(":"):
            out[i] = {c.strip() for c in tail[1:].replace(",", " ").split()}
        else:
            out[i] = None
    return out


def _walk_scope_names(tree: ast.AST) -> set[str]:
    """Every identifier used anywhere (loads, attribute roots, strings in
    __all__, decorators, annotations)."""
    used: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            pass  # root captured by its Name child
    # __all__ re-exports count as uses
    for node in ast.walk(tree):
        if (isinstance(node, ast.Assign)
                and any(isinstance(t, ast.Name) and t.id == "__all__"
                        for t in node.targets)):
            for c in ast.walk(node.value):
                if isinstance(c, ast.Constant) and isinstance(c.value, str):
                    used.add(c.value)
    return used


def check_file(path: Path) -> list[str]:
    src = path.read_text()
    findings: list[str] = []
    try:
        tree = ast.parse(src, filename=str(path))
    except SyntaxError as e:
        return [f"{path}:{e.lineno}: E999 {e.msg}"]
    noqa = _noqa_lines(src)

    def flag(lineno: int, code: str, msg: str) -> None:
        if lineno in noqa and (noqa[lineno] is None or code in noqa[lineno]):
            return
        findings.append(f"{path}:{lineno}: {code} {msg}")

    used = _walk_scope_names(tree)

    # F401 unused module-level imports (skip __init__.py / conftest re-exports)
    if path.name not in ("__init__.py", "conftest.py"):
        for node in tree.body:
            if isinstance(node, ast.Import):
                for a in node.names:
                    name = (a.asname or a.name).split(".")[0]
                    if name not in used:
                        flag(node.lineno, "F401",
                             f"'{a.name}' imported but unused")
            elif isinstance(node, ast.ImportFrom):
                if node.module == "__future__":
                    continue
                for a in node.names:
                    name = a.asname or a.name
                    if name != "*" and name not in used:
                        flag(node.lineno, "F401",
                             f"'{name}' imported but unused")

    # F811 duplicate top-level def/class names
    seen: dict[str, int] = {}
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                             ast.ClassDef)):
            if node.name in seen:
                flag(node.lineno, "F811",
                     f"redefinition of '{node.name}' from line "
                     f"{seen[node.name]}")
            seen[node.name] = node.lineno

    # F632 `is` comparisons with literals
    for node in ast.walk(tree):
        if isinstance(node, ast.Compare):
            for op, cmp_ in zip(node.ops, node.comparators):
                if (isinstance(op, (ast.Is, ast.IsNot))
                        and isinstance(cmp_, ast.Constant)
                        and isinstance(cmp_.value, (str, int, tuple))
                        and not isinstance(cmp_.value, bool)):
                    flag(node.lineno, "F632",
                         "use == to compare with literals")
    return findings


def main(argv: list[str]) -> int:
    paths = [Path(p) for p in argv] if argv else DEFAULT_PATHS
    files: list[Path] = []
    for p in paths:
        files.extend(sorted(p.rglob("*.py")) if p.is_dir() else [p])
    all_findings: list[str] = []
    for f in files:
        all_findings.extend(check_file(f))
    for line in all_findings:
        print(line)
    print(f"lint_lite: {len(files)} files, {len(all_findings)} findings")
    return 1 if all_findings else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
